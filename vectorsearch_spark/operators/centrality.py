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
