"""Corpus-level clustering: exact distributed Lloyd's k-means over an
embedding column — the curation workhorse behind semantic
deduplication, diversity-aware sampling (quota per cluster), and topic
bucketing of web-scale corpora.

Scale design — the same bounded-driver-state discipline as PCA
(operators/projection.py) and the PQ codebooks (operators/pq.py):

- centroids are O(k·d) driver state (the codebook contract), broadcast
  into each pass inside the Arrow mapper's closure;
- one ``mapInPandas`` pass per iteration emits PER-PARTITION partial
  (cluster → count, vector sum) statistics — each partition collapses
  to ≤ k·(d+1) numbers; the driver sums partials and updates centroids
  (one NumPy GEMM per batch for the assignment distances);
- an empty cluster keeps its previous centroid (the standard Lloyd
  fallback, deterministic);
- init is the first k vectors in ``id_col`` order (deterministic,
  rerun/engine-stable — ``rand()`` inits re-deal under retries), or a
  caller-supplied array.

The final assignment pass reuses the same mapper, emitting
(id, cluster, dist). Ties break to the LOWEST cluster index
(NumPy argmin), mirrored by the reference model test.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame


def _assign(x: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # ||x - c||² = ||x||² - 2 x·c + ||c||²; argmin ignores ||x||²
    d2 = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    idx = d2.argmin(axis=1)
    dist = d2[np.arange(len(x)), idx] + (x * x).sum(axis=1)
    return idx, np.maximum(dist, 0.0)


def _greedy_cos_dedup(
    xn: np.ndarray, threshold: float, chunk: int = 2048
) -> np.ndarray:
    """Greedy min-id cosine dedup over UNIT-NORMALIZED rows: scanning
    ids ascending, a kept row drops every later row with cosine ≥
    threshold. Returns the keep mask.

    Memory contract: the similarity matrix is computed in row CHUNKS
    (chunk × n doubles at a time), never n × n — at the max_cluster=50k
    cap a full matrix is 20 GB per task, the chunked form ≤ chunk·n·8
    bytes (~0.8 GB at 2048×50k) with identical results (drops only ever
    affect LATER rows, so ascending chunk order preserves the greedy
    semantics exactly).
    """
    n = len(xn)
    keep = np.ones(n, dtype=bool)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        block = xn[s:e] @ xn[s:].T  # rows s..e vs all LATER rows (and selves)
        for i in range(s, e):
            if keep[i]:
                dup = block[i - s, i - s + 1 :] >= threshold
                keep[i + 1 :][dup] = False
    return keep


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Fit k centroids (k×d ndarray); one distributed pass per
    iteration, O(k·d) driver state."""
    if init is None:
        first = df.orderBy(id_col).select(vec_col).limit(k).collect()
        if len(first) < k:
            raise ValueError(f"need >= {k} rows to init {k} clusters")
        cents = np.array([r[0] for r in first], dtype=np.float64)
    else:
        cents = np.asarray(init, dtype=np.float64).copy()
    d = cents.shape[1]

    # one materialization feeds all ``iters`` passes (r14, guide §5):
    # without it every iteration re-ran the caller's upstream plan
    # (parquet scan at minimum); centroids are bit-identical
    vecs = df.select(vec_col).localCheckpoint()

    for _ in range(iters):
        c = cents.copy()

        def partials(batches: "Iterator") -> "Iterator":
            import pandas as pd

            cnt = np.zeros(len(c))
            sums = np.zeros_like(c)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                idx, _ = _assign(x, c)
                np.add.at(cnt, idx, 1)
                np.add.at(sums, idx, x)
            nz = np.nonzero(cnt)[0]
            if len(nz):
                yield pd.DataFrame(
                    {
                        "cl": nz.astype("int64"),
                        "n": cnt[nz].astype("int64"),
                        "s": [sums[i].tolist() for i in nz],
                    }
                )

        rows = vecs.mapInPandas(
            partials, schema="cl long, n long, s array<double>"
        ).collect()
        cnt = np.zeros(k)
        sums = np.zeros((k, d))
        for r in rows:
            cnt[r["cl"]] += r["n"]
            sums[r["cl"]] += np.array(r["s"])
        upd = cnt > 0
        cents[upd] = sums[upd] / cnt[upd, None]  # empty: keep previous
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Assign every row to its nearest centroid; appends
    (out_col int, {out_col}_dist double — squared L2)."""
    cents = np.asarray(centroids, dtype=np.float64)

    def mapper(batches: "Iterator") -> "Iterator":
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                idx, dist = _assign(x, cents)
                pdf[out_col] = idx.astype("int32")
                pdf[f"{out_col}_dist"] = dist
            else:
                pdf[out_col] = np.array([], dtype="int32")
                pdf[f"{out_col}_dist"] = np.array([], dtype="float64")
            yield pdf

    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return df.mapInPandas(
        mapper, schema=f"{in_schema}, {out_col} int, {out_col}_dist double"
    )


def semantic_dedup(
    df: DataFrame,
    k: int,
    threshold: float = 0.95,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 50_000,
    strict: bool = False,
    max_split_depth: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): k-means partitions the corpus, then exact
    pairwise cosine runs ONLY within each cluster — near-duplicate
    semantics with the all-pairs cost k× reduced (and in practice far
    more, since near-dups co-locate). Returns one row per KEPT id with
    its cluster; dropped rows are those with cosine ≥ ``threshold`` to
    a kept lower-id row in the same cluster (min-id keeper, the
    dedup_exact convention).

    Scale: the within-cluster pass is ``applyInPandas`` keyed by
    cluster — quadratic IN THE CLUSTER, which is the documented
    contract (pick k so clusters stay ~10³-10⁴). Clusters larger than
    ``max_cluster`` are recursively RE-CLUSTERED (k' = max(2,
    ⌈n/max_cluster⌉) sub-centroids via the same ``kmeans_fit``, labels
    relabelled to fresh ids) until every final cluster fits — an
    oversized cluster costs one extra fit over just its rows, never an
    O(n²) GEMM. ``strict=True`` restores the hard-fail instead (the
    explicit-bound stance of the dedup hot-band caps: no silent extra
    work). The split loop raises if a cluster refuses to split
    (geometrically identical points — run exact dedup first) or
    ``max_split_depth`` is hit. The graceful path costs one O(k)
    cluster-size aggregate + a lazy localCheckpoint of the assignment
    (which the dedup pass would otherwise recompute from lineage);
    strict mode keeps the original zero-extra-job plan.
    Pairs that cross clusters are NOT examined (the SemDeDup recall
    tradeoff; raise k for finer partitions at lower recall risk); note
    sub-splitting an oversized cluster widens that tradeoff to pairs
    crossing its children.
    """
    import math

    cents = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    clustered = kmeans_assign(df, cents, vec_col=vec_col).select(
        id_col, vec_col, "cluster"
    )

    if not strict:
        from pyspark.sql import functions as F

        clustered = clustered.localCheckpoint(eager=False)
        sizes = {
            r["cluster"]: r["n"]
            for r in clustered.groupBy("cluster").agg(F.count("*").alias("n")).collect()
        }
        next_label = max(sizes, default=0) + 1
        over_ids = [c for c, n in sizes.items() if n > max_cluster]
        # pending items carry their own (already filtered) sub-DataFrame
        # so multiple oversized clusters split independently
        pending = [
            (clustered.where(F.col("cluster") == c).drop("cluster"), sizes[c], 0)
            for c in over_ids
        ]
        parts = [clustered] if not pending else [
            clustered.where(~F.col("cluster").isin(over_ids))
        ]
        while pending:
            sub, n, depth = pending.pop()
            if depth >= max_split_depth:
                raise ValueError(
                    f"cluster of {n} rows still exceeds max_cluster="
                    f"{max_cluster} after {max_split_depth} recursive "
                    "splits; corpus likely contains >max_cluster "
                    "identical vectors — run exact dedup first"
                )
            k2 = max(2, math.ceil(n / max_cluster))
            sub_cents = kmeans_fit(
                sub, k=k2, iters=iters, vec_col=vec_col, id_col=id_col
            )
            assigned = (
                kmeans_assign(sub, sub_cents, vec_col=vec_col)
                .select(
                    id_col,
                    vec_col,
                    (F.col("cluster") + F.lit(next_label)).cast("int").alias("cluster"),
                )
                .localCheckpoint(eager=False)
            )
            next_label += k2
            child_sizes = {
                r["cluster"]: r["n"]
                for r in assigned.groupBy("cluster")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if max(child_sizes.values()) >= n:
                raise ValueError(
                    f"cluster of {n} rows refused to split (all rows at "
                    "one centroid — identical vectors); run exact dedup "
                    "first or raise max_cluster"
                )
            still_ids = [cc for cc, nn in child_sizes.items() if nn > max_cluster]
            parts.append(
                assigned.where(~F.col("cluster").isin(still_ids))
                if still_ids
                else assigned
            )
            pending.extend(
                (
                    assigned.where(F.col("cluster") == cc).drop("cluster"),
                    child_sizes[cc],
                    depth + 1,
                )
                for cc in still_ids
            )
        from functools import reduce

        clustered = reduce(lambda a, b: a.unionByName(b), parts)

    def dedup_cluster(pdf):
        import pandas as pd

        if len(pdf) > max_cluster:
            raise ValueError(
                f"cluster of {len(pdf)} rows exceeds max_cluster={max_cluster}; "
                "raise k or the cap"
                + ("" if strict else " (split-invariant violated — bug)")
            )
        pdf = pdf.sort_values(id_col, ignore_index=True)
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        xn = x / norms[:, None]
        # chunked greedy: never materializes the n×n cosine matrix
        # (20 GB per task at the 50k cap) — see _greedy_cos_dedup
        keep = _greedy_cos_dedup(xn, threshold)
        out = pdf.loc[keep, [id_col, "cluster"]]
        return out

    # Explicit-count repartition: the cluster shuffle is small in BYTES
    # but quadratic in CPU per group, so AQE's size-based coalescing
    # would fold all clusters into one partition and serialize the
    # O(n²) passes in a single Python worker (the index/build.py:128
    # lesson). REPARTITION_BY_NUM is AQE-exempt and satisfies
    # applyInPandas's distribution, so exactly one exchange remains.
    sc = clustered.sparkSession.sparkContext
    return (
        clustered.repartition(2 * sc.defaultParallelism, "cluster")
        .groupBy("cluster")
        .applyInPandas(dedup_cluster, schema=f"{id_col} long, cluster int")
    )
