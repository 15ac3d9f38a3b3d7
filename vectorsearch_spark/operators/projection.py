"""Dimensionality reduction for embedding pipelines: exact distributed
PCA (the preprocessing step before PQ/IVF indexing — decorrelating and
truncating embeddings shrinks the index and usually IMPROVES PQ
quality, since subspace quantizers assume roughly isotropic input; see
the OPQ literature).

Scale design — the d×d sufficient-statistics pattern:

- one Arrow ``mapInPandas`` pass emits PER-PARTITION partial
  statistics (count, per-dim sum, d×d Gramian X'X as a flat array) —
  each partition collapses to d² + d + 1 numbers regardless of rows;
- the ≤ #partitions partial rows are collected and summed driver-side
  with NumPy (O(#partitions · d²) — KB-to-MB, the bounded
  codebook-collect contract), and the d×d covariance
  eigendecomposition runs on the driver (d ≤ a few thousand);
- the k×d component matrix broadcasts back inside a second Arrow pass
  that projects every vector (one GEMM per batch).

Exactness: covariance from (ΣX'X, Σx, n) is algebraically identical to
centering first — no approximation; the test asserts equality with a
single-machine NumPy PCA on the same rows. Sign convention: each
component is flipped so its largest-|loading| coordinate is positive
(eigenvector sign is otherwise arbitrary — this pins determinism).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame


def _partial_stats(dim: int, vec_col: str):
    # ONE partial row per PARTITION (the mapper folds its batches
    # locally) — the driver sums ≤ #partitions tiny rows with NumPy.
    # The alternative, a Spark aggregate of d²+d per-element sums, is
    # 4000+ expressions for d=64: Catalyst planning/codegen dominated
    # the query (measured 42 s → 4 s for the sf0.01 projection).
    def mapper(batches: "Iterator") -> "Iterator":
        import pandas as pd

        n, s, g = 0, np.zeros(dim), np.zeros((dim, dim))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += len(x)
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return mapper


def pca_cov(df: DataFrame, vec_col: str = "embedding", dim: int | None = None):
    """The distributed HALF of PCA: d×d sufficient statistics (one
    Arrow pass, one partial row per partition) merged driver-side into
    (cov d×d, mean d-vector, n). Everything after this — the
    eigensolve — is O(d³) driver NumPy, so this function is the part
    whose correctness is distribution-dependent (and what the
    ``embedding_pca_cov`` oracle twin pins against SQL)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    parts = df.select(vec_col).mapInPandas(
        _partial_stats(dim, vec_col), schema="n long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("empty input")
    n = sum(r["n"] for r in parts)
    mean = np.sum([r["s"] for r in parts], axis=0) / n
    gram = np.sum(
        [np.array(r["g"]).reshape(dim, dim) for r in parts], axis=0
    )
    return gram / n - np.outer(mean, mean), mean, n


def fit_pca(df: DataFrame, k: int, vec_col: str = "embedding", dim: int | None = None):
    """Fit PCA on ``df[vec_col]``; returns (components k×d ndarray,
    mean d-vector, explained_variance k-vector). One data pass."""
    cov, mean, _ = pca_cov(df, vec_col=vec_col, dim=dim)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k×d
    # deterministic sign: largest-|loading| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean, evals[order]


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pca",
    dim: int | None = None,
) -> DataFrame:
    """Project ``vec_col`` onto the top-k principal components fit on
    the same DataFrame; appends ``out_col`` (array<double>, length k).
    Two passes over the data (fit + project), one GEMM per Arrow batch.
    """
    comps, mean, _ = fit_pca(df, k, vec_col=vec_col, dim=dim)
    ct, mu = comps.T.copy(), mean.copy()
    cols = list(df.columns)

    def mapper(batches: "Iterator") -> "Iterator":
        for pdf in batches:
            if len(pdf):
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                proj = (x - mu) @ ct
                pdf = pdf.copy()
                pdf[out_col] = list(map(list, proj))
            else:
                pdf = pdf.copy()
                pdf[out_col] = []
            yield pdf

    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return df.mapInPandas(mapper, schema=f"{in_schema}, {out_col} array<double>")


def sq8_min_max(df: DataFrame, vec_col: str = "embedding") -> "tuple[list, list]":
    """Per-dimension (min, max) over the corpus — the SQ8 trainer state
    (FAISS ScalarQuantizer analog; public technique). posexplode +
    per-dim min/max: MAP-SIDE COMBINE collapses each partition to d
    rows before the shuffle, so the pass is linear with O(d) driver
    state (the codebook-collect contract)."""
    from pyspark.sql import functions as F

    rows = (
        df.select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("i")
        .collect()
    )
    return [r["mn"] for r in rows], [r["mx"] for r in rows]


def sq8_roundtrip_error(
    df: DataFrame,
    mins: "list[float]",
    maxs: "list[float]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Quantize each vector to uint8 codes against per-dim (min, max)
    and report the round-trip error — entirely CODEGEN column
    expressions (zip_with/transform over literal min/range arrays; no
    UDF, no Python): code = round((x−min)/range·255) clamped, x̂ =
    min + code/255·range. Returns (id, max_abs_err, mean_abs_err)
    rounded to 6 decimals; the per-dim error bound is range/510 for
    in-range inputs, asserted in tests.

    At 100 TB: SQ8 is the 4× cheaper, lower-accuracy sibling of PQ —
    the encode is a narrow projection Catalyst pushes to the scan, the
    trainer state is O(d), and the codes column (d bytes/vector) is
    what an index layout would persist.
    """
    from pyspark.sql import functions as F


    from vectorsearch_spark.functions.litarrays import lit_double_array

    minarr = lit_double_array([float(v) for v in mins])
    rngarr = lit_double_array(
        [float(mx - mn) if mx > mn else 1.0 for mn, mx in zip(mins, maxs)]
    )
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    norm = F.zip_with(
        F.zip_with(x, minarr, lambda v, mn: v - mn),
        rngarr,
        lambda y, r: y / r,
    )
    codes = F.transform(
        norm,
        lambda y: F.least(
            F.lit(255.0), F.greatest(F.lit(0.0), F.round(y * 255))
        ),
    )
    xhat = F.zip_with(
        F.zip_with(codes, rngarr, lambda c, r: c / F.lit(255.0) * r),
        minarr,
        lambda y, mn: y + mn,
    )
    # zip_with null-pads when a vector's length differs from the
    # trained dimension d; dropping the pads makes both stats cover
    # exactly the dims where vector AND trainer are defined — the same
    # min(len, d) span the DuckDB oracle's dim-stat join covers
    err = F.filter(
        F.zip_with(x, xhat, lambda a, b: F.abs(a - b)), lambda e: e.isNotNull()
    )
    return df.select(
        F.col(id_col),
        F.round(F.array_max(err), 6).alias("max_abs_err"),
        F.round(
            F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e)
            / F.greatest(F.size(err), F.lit(1)),
            6,
        ).alias("mean_abs_err"),
    )
