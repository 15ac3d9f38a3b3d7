"""Distributed quality classification: logistic regression over doc
statistics — the learned quality-filter pass of large-scale pipelines
(the CCNet / GPT-3 "looks like the reference corpus" classifier;
north-star extension per BASELINE.json, no reference analog).

Scale design — the bounded-driver-state discipline of kmeans_fit
(operators/cluster.py) and PCA (operators/projection.py):

- training state is the weight vector, O(d) on the driver, broadcast
  into each pass inside the Arrow mapper's closure;
- one ``mapInPandas`` pass per iteration emits PER-PARTITION gradient
  partials (each partition collapses to d+2 numbers); the driver sums
  and takes a plain gradient step — full-batch GD, so the fit is a
  deterministic function of the data multiset (no minibatch order
  sensitivity, no rand() init: weights start at zero);
- SCORING is pure codegen: sigmoid(w·x + b) built from column
  arithmetic — no UDF, no Python in the hot path; the 100 TB scoring
  pass is a narrow projection Catalyst pushes into the scan.

Features are standardized inside fit (mean/std from one aggregate
pass, folded INTO the returned weights), so callers score raw
features — the learned transform travels with the model, the way a
production quality filter ships one artifact.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logistic_fit(
    df: DataFrame,
    feature_cols: "list[str]",
    label_col: str,
    iters: int = 50,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> np.ndarray:
    """Fit logistic regression by full-batch gradient descent; returns
    weights in RAW feature space as ``[w_1..w_d, b]`` (standardization
    folded in). One distributed pass per iteration, O(d) driver state.
    """
    d = len(feature_cols)

    # materialize the (d+1)-column feature matrix ONCE (r14, guide §5):
    # every GD iteration is a full pass, and without this each of the
    # ``iters`` jobs re-evaluated the caller's feature pipeline from the
    # raw text (tokenize + doc stats × 50 for the quality classifier).
    # The checkpointed table is d+1 doubles per row — the standard
    # iterative-ML materialization; weights are bit-identical since the
    # casts are unchanged.
    feat = df.select(
        *[F.col(c).cast("double").alias(f"f{i}") for i, c in enumerate(feature_cols)],
        F.col(label_col).cast("double").alias("y"),
    ).localCheckpoint()

    def _bad(c: str) -> "F.Column":
        v = F.col(c)
        return F.sum(F.when(v.isNull() | F.isnan(v), 1).otherwise(0))

    # one bounded aggregate for the standardizer (3d+2 numbers); the
    # null/NaN counters make a dirty feature column a loud ValueError —
    # without them NaNs flow through the mean/variance sums and the
    # per-partition gradients, and the "fitted" weights are silently NaN
    stats = feat.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col(f"f{i}")).alias(f"s{i}") for i in range(d)],
        *[
            F.sum(F.col(f"f{i}") * F.col(f"f{i}")).alias(f"q{i}")
            for i in range(d)
        ],
        *[_bad(f"f{i}").alias(f"bad{i}") for i in range(d)],
        _bad("y").alias("bad_y"),
    ).first()
    n = float(stats["n"])
    if n == 0:
        raise ValueError("logistic_fit: empty input")
    dirty = [c for i, c in enumerate(feature_cols) if stats[f"bad{i}"]]
    if stats["bad_y"]:
        dirty.append(label_col)
    if dirty:
        raise ValueError(
            f"logistic_fit: null/NaN values in column(s) {dirty} — clean or "
            "impute them before fitting (they would silently NaN the weights)"
        )
    mu = np.array([stats[f"s{i}"] / n for i in range(d)])
    var = np.array([stats[f"q{i}"] / n for i in range(d)]) - mu * mu
    sd = np.sqrt(np.maximum(var, 1e-12))
    sd[sd == 0] = 1.0
    w = np.zeros(d + 1)  # standardized-space weights + intercept

    for _ in range(iters):
        wc = w.copy()

        def partials(batches: "Iterator") -> "Iterator":
            import pandas as pd

            g = np.zeros(d + 1)
            m = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                x = (pdf[[f"f{i}" for i in range(d)]].to_numpy() - mu) / sd
                y = pdf["y"].to_numpy()
                z = x @ wc[:d] + wc[d]
                p = 1.0 / (1.0 + np.exp(-z))
                r = p - y
                g[:d] += x.T @ r
                g[d] += r.sum()
                m += len(pdf)
            if m:
                yield pd.DataFrame({"i": [0], "m": [m], "g": [g.tolist()]})

        rows = feat.mapInPandas(partials, schema="i long, m long, g array<double>").collect()
        grad = np.zeros(d + 1)
        m_tot = 0
        for r in rows:
            grad += np.array(r["g"])
            m_tot += r["m"]
        grad /= m_tot
        grad[:d] += l2 * w[:d]
        w -= lr * grad

    # fold standardization into raw-space weights: w_raw = w_std / sd,
    # b_raw = b - Σ w_std·mu/sd
    out = np.empty(d + 1)
    out[:d] = w[:d] / sd
    out[d] = w[d] - float((w[:d] * mu / sd).sum())
    return out


def logistic_score(
    df: DataFrame,
    weights: np.ndarray,
    feature_cols: "list[str]",
    out_col: str = "score",
) -> DataFrame:
    """Append ``sigmoid(w·x + b)`` as ``out_col`` — a pure codegen
    column expression (exp/arithmetic), zero Python per row."""
    w = np.asarray(weights, dtype=np.float64)
    z = F.lit(float(w[len(feature_cols)]))
    for i, c in enumerate(feature_cols):
        z = z + F.col(c).cast("double") * float(w[i])
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
