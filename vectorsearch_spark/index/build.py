"""Segment build job: PQ codebook + codes + neighbor graph + seal
(S7/A1/C10/G1-G3/M6 in SURVEY §2).

Reference semantics: ``tasks/SegmentBuildService.java:72-141`` — only
PENDING/WRITING segments are built; scan the segment's vectors, train
PQ (iters=5, seeded), encode every row, build the neighbor graph
(brute kNN when alpha<=1.0 else Vamana), persist artifacts, then seal
(PENDING/WRITING → SEALED) with a zero-codebook fallback for empty
segments (``SegmentBuildService.java:346-392``).

Spark shape: one ``applyInPandas`` group per segment for training and
graph build (a segment is bounded by max_segment_size → one executor
task, the same one-segment-per-worker contract as the reference), and
one Arrow-batched ``mapInPandas`` pass for encoding with the trained
codebooks broadcast. All segments build in parallel across the
cluster in a single job.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vectorsearch_spark.config import PENDING, SEALED, WRITING, Metric
from vectorsearch_spark.functions.distances import normalize
from vectorsearch_spark.index.catalog import VectorIndex
from vectorsearch_spark.operators.graph import build_graph
from vectorsearch_spark.operators.pq import encode, train_codebook

CODEBOOK_SCHEMA = "seg_id int, m int, k int, sub_dim int, centroids array<double>"
CODES_SCHEMA = "seg_id int, vec_id int, codes binary"
ADJ_SCHEMA = "seg_id int, vec_id int, neighbor_ids array<int>"


def _dynamic_overwrite(index: VectorIndex, df, path: str) -> None:
    """Replace only the seg_id partitions present in df (rebuilds are
    idempotent; untouched segments keep their files)."""
    spark = index.spark
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy("seg_id").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _write_codebooks(index: VectorIndex, cb_df, seg_ids: list[int]) -> None:
    """Codebooks are partitioned by seg_id like the other artifact
    tables, so an idempotent rebuild is one dynamic partition overwrite
    (no staged read-modify-write of the whole table)."""
    _dynamic_overwrite(index, cb_df, index.codebooks_path)


def _train_fn(m: int, k: int, iters: int, seed: int):
    def train(pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(pdf["seg_id"].iloc[0])
        x = np.stack(pdf["embedding"].to_numpy())
        cb = train_codebook(x, m, k, iters, seed)
        return pd.DataFrame(
            {
                "seg_id": [seg_id],
                "m": [m],
                "k": [k],
                "sub_dim": [cb.shape[2]],
                "centroids": [cb.ravel().tolist()],
            }
        )

    return train


def _encode_fn(codebooks):
    """``codebooks``: {seg_id: ndarray} dict or a Spark Broadcast of one
    (broadcast → one copy per executor, not per task)."""
    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb_map = codebooks.value if hasattr(codebooks, "value") else codebooks
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for seg_id, grp in pdf.groupby("seg_id"):
                cb = cb_map[int(seg_id)]
                x = np.stack(grp["embedding"].to_numpy())
                codes = encode(x, cb)
                out.append(
                    pd.DataFrame(
                        {
                            "seg_id": np.full(len(grp), seg_id, dtype=np.int32),
                            "vec_id": grp["vec_id"].to_numpy(dtype=np.int32),
                            "codes": [c.tobytes() for c in codes],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return enc


def _graph_fn(degree: int, l_build: int, alpha: float, seed: int):
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(pdf["seg_id"].iloc[0])
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        x = np.stack(pdf["embedding"].to_numpy())
        vec_ids = pdf["vec_id"].to_numpy(dtype=np.int32)
        # graph neighbors are positional within the sorted group; map back
        # to vec_ids (dense 0..n-1 normally, but vacuum can leave holes)
        adj = build_graph(x, degree, l_build, alpha, seed)
        return pd.DataFrame(
            {
                "seg_id": np.full(len(pdf), seg_id, dtype=np.int32),
                "vec_id": vec_ids,
                "neighbor_ids": [vec_ids[a].tolist() for a in adj],
            }
        )

    return build


def build_segments(index: VectorIndex, seg_ids: list[int] | None = None) -> list[int]:
    """Build + seal every buildable (PENDING/WRITING) segment; returns
    the seg_ids sealed. Explicit seg_ids must still be buildable
    (SegmentBuildService.java:88-99 ignores other states)."""
    cfg = index.config
    buildable = set(index.registered_seg_ids((PENDING, WRITING)))
    targets = sorted(buildable if seg_ids is None else buildable & set(seg_ids))
    if not targets:
        return []

    emb = F.col("embedding")
    if cfg.metric == Metric.COSINE:
        # Cosine metric: train/encode/graph on UNIT vectors, so the
        # L2²-LUT candidate ranking is exactly monotone in cosine
        # distance (‖v̂−q̂‖² = 2−2·cos) — the build-side analog of the
        # reference's normalize-on-read (fdb/FdbVectorIndex.java:
        # 1006-1013). Raw embeddings in the vectors table are untouched;
        # the exact re-rank still scores the true metric on them.
        emb = normalize(emb).cast("array<float>")
    vec = (
        index.vectors(states=(PENDING, WRITING))
        .filter(F.col("seg_id").isin(targets) & ~F.col("deleted"))
        .select("seg_id", "vec_id", emb.alias("embedding"))
    )
    vec = vec.persist()
    present = [r["seg_id"] for r in vec.select("seg_id").distinct().collect()]

    if present:
        # 1) train codebooks (one task per segment); replace any prior
        #    rows for these segs so rebuild is idempotent
        #    (tasks/SegmentBuildServiceIdempotentTest.java behavior)
        cb_df = (
            vec.groupBy("seg_id")
            .applyInPandas(
                _train_fn(cfg.pq_m, cfg.pq_k, cfg.pq_iters, cfg.seed), CODEBOOK_SCHEMA
            )
            .persist()
        )
        cbs = {
            int(r["seg_id"]): np.array(r["centroids"], dtype=np.float64).reshape(
                r["m"], r["k"], r["sub_dim"]
            )
            for r in cb_df.collect()
        }
        _write_codebooks(index, cb_df, present)

        # 2) encode all rows (Arrow batches; codebooks as a broadcast
        #    variable — one copy per executor, O(#segments × m·k·sub_dim))
        cbs_bc = index.spark.sparkContext.broadcast(cbs)
        codes = vec.mapInPandas(_encode_fn(cbs_bc), CODES_SCHEMA)
        _dynamic_overwrite(index, codes, index.codes_path)

        # 3) neighbor graph (one task per segment)
        adj = vec.groupBy("seg_id").applyInPandas(
            _graph_fn(cfg.graph_degree, cfg.graph_build_breadth, cfg.graph_alpha, cfg.seed),
            ADJ_SCHEMA,
        )
        _dynamic_overwrite(index, adj, index.adjacency_path)

    vec.unpersist()
    # 4) seal — empty segments seal too (zero-codebook fallback,
    #    SegmentBuildService.java:346-392: guarantees state transition)
    index.update_segment_states({sid: {"state": SEALED} for sid in targets})
    return targets
