"""Bounded-state frequency sketching: PROVABLY-EXACT distributed top-k
heavy hitters without shuffling the full item cardinality.

The scale problem: ``groupBy(item).count()`` + top-k is correct but its
shuffle tracks every DISTINCT item — at 100 TB of text that is billions
of token keys moving between executors to answer a 20-row question.
The classic two-phase answer (Misra–Gries 1982; mergeable-summary form
per Agarwal et al., PODS 2012 "Mergeable Summaries"):

1. one ``mapInPandas`` pass builds a ``capacity``-counter Misra–Gries
   summary PER PARTITION (bounded executor state, ≤ capacity+1 output
   rows per partition — the "+1" is the partition-size marker row);
2. the union of summary item sets is a PROVABLE superset of every item
   with global frequency > N/(capacity+1): if f_p(x) ≤ N_p/(cap+1) in
   every partition p, summing gives f(x) ≤ N/(cap+1) (pigeonhole), and
   MG guarantees an item above its partition's bound survives that
   partition's summary;
3. a second pass exact-counts ONLY the candidates (broadcast semi
   join — the shuffle now tracks ≤ |candidates| keys, not the vocab);
4. the result is CERTIFIED: if the k-th exact count > N/(capacity+1),
   no non-candidate can outrank it, so the top-k is exact — otherwise
   this module raises instead of returning a silently-approximate
   answer.

Driver/broadcast state is bounded by partitions × capacity summary
rows (32 × 4096 here; at 1000 executors size ``capacity`` accordingly
or coalesce summaries through an intermediate aggregation — the
documented contract, same stance as the IVF centroid collect).

No reference analog (the reference is a vector index); this is the
training-data-pipeline tier: vocabulary heavy hitters feed tokenizer
audits, stop-lists, and skew guards for token-keyed shuffles.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, add: dict, capacity: int) -> dict:
    """Merge weighted counts into a Misra–Gries summary of at most
    ``capacity`` counters (the mergeable-summaries MERGE: add, then
    subtract the (capacity+1)-th largest value from everything and
    drop non-positives — total decrement stays ≤ N/(capacity+1))."""
    for item, cnt in add.items():
        counters[item] = counters.get(item, 0) + int(cnt)
    if len(counters) > capacity:
        vals = sorted(counters.values(), reverse=True)
        v = vals[capacity]
        counters = {i: c - v for i, c in counters.items() if c > v}
    return counters


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Exact global top-``k`` most frequent values of ``col`` via
    Misra–Gries candidate generation + exact verification (module doc
    for the guarantee). Returns (item, cnt, rank) ordered by
    (cnt DESC, item) — deterministic under count ties.

    Raises ValueError when exactness is not certifiable (the k-th
    candidate count ≤ N/(capacity+1)): raise ``capacity`` — a silent
    maybe-wrong top-k is worse than a loud re-run.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")
    if capacity < k:
        raise ValueError("capacity must be ≥ k")
    spark = df.sparkSession
    items = df.select(F.col(col).cast("string").alias("item")).where(
        F.col("item").isNotNull()
    )

    cap = int(capacity)

    def summaries(batches: "Iterator") -> "Iterator":
        import pandas as pd

        counters: dict = {}
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf["item"].value_counts()
            n += int(vc.sum())
            counters = _mg_fold(counters, vc.to_dict(), cap)
        out = list(counters.items()) + [(None, n)]
        yield pd.DataFrame(out, columns=["item", "est"])

    summ = items.mapInPandas(summaries, "item string, est long").collect()
    total = sum(r["est"] for r in summ if r["item"] is None)
    if total == 0:
        raise ValueError("heavy_hitters: empty input")
    cands = sorted({r["item"] for r in summ if r["item"] is not None})
    bound = total / (cap + 1)
    if not cands:
        # near-uniform data: every counter cancelled in every partition
        # — nothing is certifiably frequent at this capacity
        raise ValueError(
            "heavy_hitters: no candidate exceeded the exactness bound "
            f"N/(capacity+1) = {bound:.1f}; raise capacity"
        )

    cand_df = spark.createDataFrame([(c,) for c in cands], "item string")
    top = (
        items.join(F.broadcast(cand_df), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("item"))
        .limit(int(k))
        .collect()
    )
    # certificate: every non-candidate has true count ≤ bound, so the
    # result is exact iff the k-th kept count beats the bound (when
    # fewer than k candidates exist, only a sub-1 bound — i.e. the
    # summaries never decremented and are exhaustive — certifies)
    kth = float(top[-1]["cnt"]) if len(top) >= k else None
    if (kth is not None and kth <= bound) or (kth is None and bound >= 1.0):
        raise ValueError(
            f"heavy_hitters: k-th count {kth} ≤ exactness bound "
            f"N/(capacity+1) = {bound:.1f} — a non-candidate could outrank "
            "it; raise capacity"
        )
    return spark.createDataFrame(
        [(r["item"], int(r["cnt"]), i + 1) for i, r in enumerate(top)],
        "item string, cnt long, rank long",
    )
