"""Distributed Lloyd's k-means vs an exact single-machine NumPy
reference with identical init/update/tiebreak rules."""

from __future__ import annotations

import numpy as np

from vectorsearch_spark.operators.cluster import kmeans_assign, kmeans_fit


def _np_kmeans(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    cents = x[:k].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        idx = d2.argmin(axis=1)
        for c in range(k):
            m = idx == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return cents


def _blobs(n=300, d=6, k=4, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=8.0, size=(k, d))
    x = centers[rng.integers(0, k, n)] + rng.normal(size=(n, d))
    return x


def test_kmeans_fit_matches_numpy(spark):
    x = _blobs()
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    ).repartition(6)
    got = kmeans_fit(df, k=4, iters=5)
    exp = _np_kmeans(x, 4, 5)
    assert np.allclose(got, exp, atol=1e-9)


def test_kmeans_assign_and_inertia_decreases(spark):
    x = _blobs(seed=12)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    )
    inertias = []
    for iters in (1, 3, 8):
        cents = kmeans_fit(df, k=4, iters=iters)
        out = kmeans_assign(df, cents)
        inertias.append(
            sum(r["cluster_dist"] for r in out.select("cluster_dist").collect())
        )
        assert out.columns == ["vec_id", "embedding", "cluster", "cluster_dist"]
    assert inertias[0] >= inertias[1] >= inertias[2]
    # assignments match the NumPy model at the final centroids
    cents = kmeans_fit(df, k=4, iters=8)
    got = {
        r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()
    }
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    exp = d2.argmin(axis=1)
    assert all(got[i] == exp[i] for i in range(len(x)))


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 with the third init centroid FAR from all data: it never
    # captures a point and must stay fixed instead of going NaN
    x = np.vstack([np.zeros((10, 2)), np.ones((10, 2)) * 5])
    far = np.array([[100.0, 100.0]])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)], "vec_id long, embedding array<double>"
    )
    init = np.vstack([x[0], x[10], far[0]])
    cents = kmeans_fit(df, k=3, iters=4, init=init)
    assert np.allclose(cents[2], far[0])
    assert not np.isnan(cents).any()


def test_diversity_sample_composition(spark):
    """The curation composition: cluster -> per-cluster deterministic
    quota -> a diversity-balanced sample. Every cluster contributes at
    most `quota` rows, and the selection is rerun-stable."""
    from vectorsearch_spark.operators.cluster import kmeans_assign, kmeans_fit
    from vectorsearch_spark.operators.curate import stratified_quota

    x = _blobs(n=400, k=4, seed=21)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    )
    cents = kmeans_fit(df, k=4, iters=5)
    clustered = kmeans_assign(df, cents).select("vec_id", "cluster")
    sample = stratified_quota(clustered, "cluster", quota=25, id_col="vec_id")
    rows = sample.collect()
    per = {}
    for r in rows:
        per[r["cluster"]] = per.get(r["cluster"], 0) + 1
    assert all(v <= 25 for v in per.values())
    assert len(per) == 4
    again = {
        (r["vec_id"], r["cluster"])
        for r in stratified_quota(clustered, "cluster", quota=25, id_col="vec_id").collect()
    }
    assert again == {(r["vec_id"], r["cluster"]) for r in rows}
