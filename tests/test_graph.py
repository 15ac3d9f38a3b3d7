"""Graph-builder unit tests on tiny hand-checked geometry — mirrors
graph/GraphBuilderTest.java + GraphBuilderPruningTest.java."""

from __future__ import annotations

import numpy as np

from vectorsearch_spark.operators.graph import (
    build_graph,
    knn_graph,
    medoid,
    robust_prune,
    vamana_graph,
)


def test_knn_graph_collinear():
    # points on a line at 0, 1, 2, 10 → nearest neighbors are obvious
    x = np.array([[0.0], [1.0], [2.0], [10.0]])
    adj = knn_graph(x, degree=2)
    assert adj[0].tolist() == [1, 2]
    assert adj[1].tolist() == [0, 2]
    assert adj[2].tolist() == [1, 0]
    assert adj[3].tolist() == [2, 1]


def test_knn_graph_edge_cases():
    assert knn_graph(np.zeros((0, 2)), 4) == []
    assert knn_graph(np.array([[1.0, 1.0]]), 4)[0].tolist() == []
    two = knn_graph(np.array([[0.0], [1.0]]), 4)
    assert two[0].tolist() == [1] and two[1].tolist() == [0]


def test_medoid_center_point():
    x = np.array([[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, 5.0]])
    # mean is (0, 1.25); nearest point is the origin
    assert medoid(x) == 0


def test_robust_prune_drops_dominated():
    # node at origin; candidate 2 sits right next to kept candidate 1,
    # so d²(2,1)=0.01 ≤ α·d²(2,node)=1.2·1.21 → pruned (reference
    # semantics: prune u if d²(u,p) ≤ α·d²(u,node))
    x = np.array([[0.0], [1.0], [1.1], [5.0]])
    cand = np.array([1, 2, 3])
    cand_sq = np.array([1.0, 1.1**2, 25.0])
    kept = robust_prune(cand, cand_sq, degree=3, alpha=1.2, x=x)
    assert 1 in kept and 2 not in kept


def test_robust_prune_larger_alpha_prunes_more():
    # node 0; kept 1 at (1,0); candidate at (-3,0): d²(u,node)=9,
    # d²(u,kept)=16 → pruned iff 16 ≤ α·9, i.e. α ≥ 1.78
    x = np.array([[0.0, 0.0], [1.0, 0.0], [-3.0, 0.0]])
    cand = np.array([1, 2])
    cand_sq = np.array([1.0, 9.0])
    keep12 = robust_prune(cand, cand_sq, 3, alpha=1.2, x=x)
    keep1 = robust_prune(cand, cand_sq, 3, alpha=2.0, x=x)
    assert keep12.tolist() == [1, 2]
    assert keep1.tolist() == [1]


def _reachable(adj, start):
    seen, stack = {start}, [start]
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if int(v) not in seen:
                seen.add(int(v))
                stack.append(int(v))
    return seen


def test_vamana_degree_bound_and_connectivity():
    rng = np.random.default_rng(42)
    x = rng.normal(size=(120, 8))
    adj = vamana_graph(x, degree=8, l_build=24, alpha=1.2, seed=42)
    assert all(len(a) <= 8 for a in adj)
    reached = _reachable(adj, medoid(x))
    assert len(reached) >= int(0.95 * len(x))  # search can reach ~everything


def test_vamana_deterministic():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(60, 4))
    a = vamana_graph(x, 6, 16, 1.2, seed=42)
    b = vamana_graph(x, 6, 16, 1.2, seed=42)
    assert all(np.array_equal(p, q) for p, q in zip(a, b))


def test_build_graph_dispatch():
    x = np.random.default_rng(6).normal(size=(30, 4))
    brute = build_graph(x, degree=4, l_build=8, alpha=1.0, seed=42)
    assert [a.tolist() for a in brute] == [a.tolist() for a in knn_graph(x, 4)]
    vam = build_graph(x, degree=4, l_build=8, alpha=1.3, seed=42)
    assert all(len(a) <= 4 for a in vam)


def test_pagerank_matches_numpy_power_iteration(spark):
    """pagerank ≡ NumPy power iteration with the identical update rule
    on a handcrafted graph (star + chain + isolated pair): exact
    formula parity, ranks sum to 1, hub outranks leaves."""
    import numpy as np

    from vectorsearch_spark.operators.centrality import pagerank

    pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (5, 6), (1, 2)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=12).collect()}

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        r = (1 - 0.85) / n + 0.85 * (adj.T @ (r / deg))
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[0] > got[4] and got[0] > got[5]  # hub beats leaf/isolated


def test_pagerank_empty_and_single_edge(spark):
    from vectorsearch_spark.operators.centrality import pagerank

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert pagerank(empty).collect() == []
    one = spark.createDataFrame([(7, 9)], "doc_a long, doc_b long")
    got = {r["node"]: r["rank"] for r in pagerank(one, iters=5).collect()}
    assert abs(got[7] - 0.5) < 1e-12 and abs(got[9] - 0.5) < 1e-12


# --- co-occurrence + triangle counting (operators/centrality.py) ---


def test_cooccurrence_support_and_cap(spark):
    from vectorsearch_spark.operators.centrality import cooccurrence_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # dup line item: support counts baskets
        (4, "x"), (4, "y"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in cooccurrence_pairs(df, "basket", "item", min_support=2).collect()
    }
    assert got == {("a", "b"): 3}
    # cap drops basket 1 (size 3): (a,b) support falls to 2
    capped = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in cooccurrence_pairs(
            df, "basket", "item", min_support=2, max_basket=2
        ).collect()
    }
    assert capped == {("a", "b"): 2}


def _py_triangles(edges):
    import itertools

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            n += 1
    return n


def test_triangle_count_matches_model(spark):
    import random

    from vectorsearch_spark.operators.centrality import triangle_count

    rng = random.Random(7)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(150)}
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "item_a long, item_b long"
    )
    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == _py_triangles(edges)


def test_triangle_count_handles_skew_hub(spark):
    """A star (hub connected to everything) has no triangles unless
    spokes interconnect; orientation must not blow up or miscount."""
    from vectorsearch_spark.operators.centrality import triangle_count

    star = [(0, i) for i in range(1, 200)]
    ring = [(i, i + 1) for i in range(1, 199)]
    df = spark.createDataFrame(star + ring, "item_a long, item_b long")
    # every ring edge closes a triangle with the hub: 198 triangles
    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == 198
