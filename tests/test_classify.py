"""Distributed logistic-regression quality classifier: NumPy-model
equality for the fit (same full-batch GD, standardization folded in),
codegen-only scoring, and separation on a planted two-class corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _numpy_fit(x, y, iters, lr, l2):
    d = x.shape[1]
    mu = x.mean(axis=0)
    sd = np.sqrt(np.maximum(x.var(axis=0), 1e-12))
    sd[sd == 0] = 1.0
    xs = (x - mu) / sd
    w = np.zeros(d + 1)
    for _ in range(iters):
        z = xs @ w[:d] + w[d]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        g = np.concatenate([xs.T @ r, [r.sum()]]) / len(y)
        g[:d] += l2 * w[:d]
        w -= lr * g
    out = np.empty(d + 1)
    out[:d] = w[:d] / sd
    out[d] = w[d] - float((w[:d] * mu / sd).sum())
    return out


def test_logistic_fit_matches_numpy_model(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(400, 3))
    true_w = np.array([2.0, -1.0, 0.5])
    y = (1.0 / (1.0 + np.exp(-(x @ true_w))) > rng.uniform(size=400)).astype(float)
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(x, y)]
    df = spark.createDataFrame(rows, "fa double, fb double, fc double, y double")

    from vectorsearch_spark.operators.classify import logistic_fit

    got = logistic_fit(df, ["fa", "fb", "fc"], "y", iters=30, lr=1.0, l2=1e-4)
    exp = _numpy_fit(x, y, iters=30, lr=1.0, l2=1e-4)
    # partial-sum order across partitions perturbs low bits only
    assert np.allclose(got, exp, rtol=1e-6, atol=1e-9)
    # the fit points the right way
    assert got[0] > 0 and got[1] < 0


def test_logistic_score_is_codegen_and_separates(spark):
    """Scoring is a pure column expression (no Python eval node in the
    executed plan) and ranks a planted separable corpus correctly."""
    from vectorsearch_spark.operators.classify import logistic_fit, logistic_score

    rows = []
    for i in range(200):
        rows.append((i, 10.0 + (i % 5), 0.9, 1.0))     # class 1: long, low punct
        rows.append((1000 + i, 2.0 + (i % 3), 0.1, 0.0))
    df = spark.createDataFrame(rows, "doc_id long, flen double, fstop double, y double")
    w = logistic_fit(df, ["flen", "fstop"], "y", iters=40, lr=1.0)
    scored = logistic_score(df, w, ["flen", "fstop"], out_col="q")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = scored.select("doc_id", "y", "q").collect()
    pos = [r["q"] for r in got if r["y"] == 1.0]
    neg = [r["q"] for r in got if r["y"] == 0.0]
    assert min(pos) > max(neg)
    # scores equal the closed-form sigmoid on the raw features
    import math

    for r in got[:20]:
        feats = [r2 for r2 in rows if r2[0] == r["doc_id"]][0]
        z = w[0] * feats[1] + w[1] * feats[2] + w[2]
        assert r["q"] == pytest.approx(1.0 / (1.0 + math.exp(-z)), rel=1e-12)


def test_logistic_fit_empty_and_degenerate(spark):
    from vectorsearch_spark.operators.classify import logistic_fit

    empty = spark.createDataFrame([], "fa double, y double")
    with pytest.raises(ValueError, match="empty"):
        logistic_fit(empty, ["fa"], "y", iters=1)
    # constant feature: sd guard keeps the fit finite
    const = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 0.0), (1.0, 1.0)], "fa double, y double"
    )
    w = logistic_fit(const, ["fa"], "y", iters=5)
    assert np.all(np.isfinite(w))


def test_logistic_fit_raises_on_null_and_nan_features(spark):
    """Dirty feature/label values must be a loud ValueError, not NaN
    weights: nulls/NaNs would flow through the standardizer sums and
    the per-partition gradients silently."""
    from vectorsearch_spark.operators.classify import logistic_fit

    with_null = spark.createDataFrame(
        [(1.0, 2.0, 1.0), (None, 1.0, 0.0), (0.5, 3.0, 1.0)],
        "fa double, fb double, y double",
    )
    with pytest.raises(ValueError, match=r"null/NaN.*\['fa'\]"):
        logistic_fit(with_null, ["fa", "fb"], "y", iters=1)

    with_nan = spark.createDataFrame(
        [(1.0, 2.0, 1.0), (float("nan"), 1.0, 0.0), (0.5, 3.0, 1.0)],
        "fa double, fb double, y double",
    )
    with pytest.raises(ValueError, match="fa"):
        logistic_fit(with_nan, ["fa", "fb"], "y", iters=1)

    bad_label = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (0.5, 0.0)], "fa double, y double"
    )
    with pytest.raises(ValueError, match="y"):
        logistic_fit(bad_label, ["fa"], "y", iters=1)
