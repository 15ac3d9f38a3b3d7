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


def test_semantic_dedup_drops_near_duplicates(spark):
    """Inject near-duplicate vectors (same direction, tiny noise) into
    blobs: semantic_dedup must keep the min-id representative of each
    duplicate family and all singletons, matching a per-cluster greedy
    Python model."""
    from vectorsearch_spark.operators.cluster import (
        kmeans_assign,
        kmeans_fit,
        semantic_dedup,
    )

    rng = np.random.default_rng(33)
    base = _blobs(n=60, d=6, k=3, seed=33)
    dups = base[:10] * 1.001 + rng.normal(scale=1e-4, size=(10, 6))
    x = np.vstack([base, dups])  # ids 60..69 duplicate ids 0..9
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    )
    kept = {r["vec_id"] for r in semantic_dedup(df, k=3, threshold=0.999).collect()}
    # python model: same clustering, same greedy min-id keeper
    cents = kmeans_fit(df, k=3, iters=5)
    cl = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()}
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    exp = set()
    for c in set(cl.values()):
        ids = sorted(i for i in cl if cl[i] == c)
        keep = []
        for i in ids:
            if all(float(xn[i] @ xn[j]) < 0.999 for j in keep):
                keep.append(i)
        exp |= set(keep)
    assert kept == exp
    # the duplicate family collapsed: of each (i, i+60) pair sharing a
    # cluster, only the lower id survives
    for i in range(10):
        if cl[i] == cl[i + 60]:
            assert i in kept and (i + 60) not in kept


def test_semantic_dedup_max_cluster_cap_strict(spark):
    import pytest as _pytest

    from vectorsearch_spark.operators.cluster import semantic_dedup

    x = _blobs(n=50, d=4, k=2, seed=40)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="max_cluster"):
        semantic_dedup(df, k=1, max_cluster=10, strict=True).collect()


def test_semantic_dedup_splits_oversized_cluster(spark):
    """Default (graceful) path: k=1 forces one 70-row cluster over a
    max_cluster=25 cap; the recursive re-cluster must (a) produce only
    final clusters within the cap, (b) cover every id exactly once at
    threshold=2.0 (no dedup), and (c) at a real threshold match the
    greedy min-id model applied per FINAL cluster (the clustering is
    deterministic, so two calls see identical partitions)."""
    from vectorsearch_spark.operators.cluster import semantic_dedup

    rng = np.random.default_rng(44)
    base = _blobs(n=60, d=6, k=3, seed=44)
    dups = base[:10] * 1.001 + rng.normal(scale=1e-4, size=(10, 6))
    x = np.vstack([base, dups])
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    )
    # threshold > 1: nothing dedups -> exposes the full final clustering
    full = semantic_dedup(df, k=1, threshold=2.0, max_cluster=25).collect()
    members: dict[int, list[int]] = {}
    for r in full:
        members.setdefault(r["cluster"], []).append(r["vec_id"])
    assert sorted(i for ids in members.values() for i in ids) == list(range(70))
    assert all(len(ids) <= 25 for ids in members.values()), {
        c: len(ids) for c, ids in members.items()
    }
    assert len(members) >= 3  # 70 rows / cap 25 needs >= 3 clusters

    kept = {r["vec_id"] for r in semantic_dedup(df, k=1, threshold=0.999, max_cluster=25).collect()}
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    exp = set()
    for ids in members.values():
        keep: list[int] = []
        for i in sorted(ids):
            if all(float(xn[i] @ xn[j]) < 0.999 for j in keep):
                keep.append(i)
        exp |= set(keep)
    assert kept == exp


def test_semantic_dedup_identical_vectors_refuse_split(spark):
    """>max_cluster copies of ONE point cannot be split geometrically:
    the graceful path must fail loudly (pointing at exact dedup), not
    loop or silently run the quadratic pass."""
    import pytest as _pytest

    from vectorsearch_spark.operators.cluster import semantic_dedup

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(30)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="refused to split|identical"):
        semantic_dedup(df, k=1, max_cluster=10).collect()


def test_greedy_cos_dedup_chunked_equals_naive():
    """The chunked greedy kernel ≡ the naive full-matrix greedy for
    every chunk size, including chunks that split a duplicate group
    across the boundary — drops only ever affect LATER rows, so
    ascending chunk order cannot change the outcome."""
    import numpy as np

    from vectorsearch_spark.operators.cluster import _greedy_cos_dedup

    rng = np.random.default_rng(5)
    x = rng.normal(size=(300, 8))
    # plant duplicate chains straddling typical chunk boundaries
    for a, b in [(0, 150), (149, 151), (10, 11), (10, 299), (200, 201)]:
        x[b] = x[a] * (1 + 1e-9)
    xn = x / np.linalg.norm(x, axis=1)[:, None]

    def naive(xn, thr):
        cos = xn @ xn.T
        keep = np.ones(len(xn), dtype=bool)
        for i in range(len(xn)):
            if keep[i]:
                keep[i + 1 :][cos[i, i + 1 :] >= thr] = False
        return keep

    for thr in (0.999, 0.9):
        expected = naive(xn, thr)
        for chunk in (1, 7, 150, 151, 300, 4096):
            got = _greedy_cos_dedup(xn, thr, chunk=chunk)
            assert np.array_equal(got, expected), (thr, chunk)
    # the planted dups are actually dropped at the tight threshold
    keep = _greedy_cos_dedup(xn, 0.999)
    assert not keep[150] and not keep[151] and not keep[11] and not keep[299]
    assert keep[0] and keep[10]
