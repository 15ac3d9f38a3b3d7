"""Graph centrality for corpus curation: PageRank over a document
link/similarity graph (published technique for web-corpus quality
weighting — rank mass concentrates on well-connected boilerplate/hub
content, informing sampling weights; no reference analog, the
reference has no graph-analytics surface).

Scale design — the same iterative-DataFrame discipline as
``operators/dedup.py duplicate_clusters``:

- the graph is symmetrized once (undirected input pairs → both
  directions) and degrees computed with one groupBy;
- each round is contribs = edges ⋈ ranks (shuffle keyed on the SAME
  node id both rounds, so the exchange is reusable) → groupBy(dst)
  map-side-combinable sum → the rank update expression;
- lineage is truncated per round with ``localCheckpoint`` (eager) —
  without it the plan doubles per iteration and Catalyst analysis
  itself becomes the bottleneck;
- driver state is O(1): the node count and the loop counter. No
  collect of ranks, ever.

Fixed iteration count (the curation use-case wants a deterministic,
oracle-checkable result, not adaptive convergence); symmetrized graphs
have no dangling nodes (every node that exists has degree ≥ 1), so the
classic dangling-mass redistribution term vanishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """PageRank over an UNDIRECTED pair list (e.g. near-duplicate or
    citation pairs): returns (node, rank), ranks summing to 1.

    rank⁰ = 1/n; rankⁱ⁺¹(v) = (1-d)/n + d·Σ_{u→v} rankⁱ(u)/deg(u),
    over the symmetrized edge set with duplicate pairs collapsed.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"))
    n = nodes.count()
    if n == 0:
        return pairs.sparkSession.createDataFrame([], "node long, rank double")
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iters):
        contribs = (
            edges.join(
                ranks.join(deg, ranks["node"] == deg["src"]).select(
                    F.col("node").alias("c_src"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ),
                F.col("src") == F.col("c_src"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("inbound"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("inbound", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return ranks


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int | None = 10_000,
) -> DataFrame:
    """Market-basket co-occurrence: item pairs appearing in the same
    basket, with ``support`` = number of shared baskets, filtered to
    ``support >= min_support``. Returns (item_a, item_b, support) with
    ``item_a < item_b``. The classic item-item graph behind
    recommendation candidates and substitution analysis.

    Scale: the self-join is keyed by basket — per-basket fan-out is
    ``s·(s−1)/2`` for basket size s, so one pathological basket (a
    crawler's 10⁶-item "order") is quadratic; ``max_basket`` drops
    larger baskets first (one map-side-combinable size count), the
    same explicit-cap contract as the dedup hot-band caps — a dropped
    basket only removes support counts it would have contributed
    (documented lower-bound semantics). Items are deduped per basket
    so support counts BASKETS, not line items.
    """
    b = df.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")).distinct()
    if max_basket is not None:
        sizes = b.groupBy("__b").agg(F.count("*").alias("__sz"))
        b = b.join(sizes.where(F.col("__sz") <= max_basket), "__b")
    l = b.select("__b", F.col("__i").alias("item_a"))
    r = b.select("__b", F.col("__i").alias("item_b"))
    return (
        l.join(r, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )


def triangle_count(
    edges: DataFrame, id_a: str = "item_a", id_b: str = "item_b"
) -> DataFrame:
    """EXACT global triangle count of an undirected graph — the
    clustering-coefficient numerator (community structure / spam-ring
    detection over similarity and co-occurrence graphs).

    Scale design — degree orientation (the MapReduce-era standard):
    orient every edge from its (degree, id)-smaller endpoint to the
    larger, so each triangle is counted exactly once as a wedge
    u→v, u→w with v→w; the wedge join fans out per node as
    out-degree², and orientation bounds every out-degree by O(√|E|)
    regardless of raw degree skew — a celebrity node of degree 10⁶
    contributes wedges only through its (rare) higher-degree
    neighbors, not 10¹² pairs. Three shuffles total (degrees, wedge
    join, closing semi join); output is ONE row (n_triangles).
    """
    # lazy checkpoints: `e` feeds degrees + the oriented build, and
    # `oriented` feeds the wedge join twice plus both closing
    # directions — without barriers Catalyst re-expands the WHOLE
    # upstream edge pipeline per reference (measured: 116 exchanges /
    # 10 sort-merge joins for the co-purchase query vs 7 exchanges
    # with barriers; at scale that is 4+ recomputes of candidate
    # generation). Each materializes once, on first use.
    e = (
        edges.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    # orient: u -> v iff (deg(u), u) < (deg(v), v)
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint(eager=False)
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = w1.join(w2, "u").where(F.col("v1") < F.col("v2"))
    closing = oriented.select(
        F.col("u").alias("c1"), F.col("v").alias("c2")
    ).unionByName(
        oriented.select(F.col("v").alias("c1"), F.col("u").alias("c2"))
    )
    closed = wedges.join(
        closing,
        (F.col("v1") == F.col("c1")) & (F.col("v2") == F.col("c2")),
        "left_semi",
    )
    return closed.agg(F.count("*").cast("long").alias("n_triangles"))
