"""Segmented vector-index catalog: on-disk layout, metadata, and the
public API facade (the Spark re-expression of ``api/VectorIndex.java``).

Layout under one root path (SURVEY §1.4 mapping of FdbDirectories):

    <root>/meta/        single-row parquet: config JSON + next_gid
    <root>/segments/    parquet registry: (seg_id, state, count,
                        deleted_count, created_at_ms, last_vacuum_at_ms)
    <root>/vectors/     parquet partitioned by seg_id:
                        (gid, vec_id, embedding, deleted, payload)
    <root>/codebooks/   parquet: (seg_id, m, k, sub_dim, centroids flat)
    <root>/codes/       parquet partitioned by seg_id: (vec_id, codes)
    <root>/adjacency/   parquet partitioned by seg_id: (vec_id, neighbor_ids)

The `segments` registry is the source of truth for visibility: readers
always semi-join against registered seg_ids, so a WRITING destination's
files are invisible until the registry swap (the Spark analog of
``fdb/FdbVectorIndex.java:646-649`` + the compaction swap at
``tasks/MaintenanceService.java:391-414``). gid→(seg_id, vec_id) needs
no side tables — they are columns of the vectors table, so resolveIds
(``fdb/FdbVectorIndex.java:500-525``) is a projection/semi-join.

Driver state is O(#segments) only (registry + next_gid); all row data
stays distributed. At 100 TB, size ``max_segment_size`` so one segment
build fits one executor task (same constraint the reference has:
one segment per build worker).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectorsearch_spark.config import (
    ACTIVE,
    COMPACTING,
    PENDING,
    SEALED,
    SEARCHABLE_SEALED,
    WRITING,
    IndexConfig,
)

SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("seg_id", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("deleted_count", T.LongType(), False),
        T.StructField("created_at_ms", T.LongType(), False),
        T.StructField("last_vacuum_at_ms", T.LongType(), True),
    ]
)

VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("gid", T.LongType(), False),
        T.StructField("seg_id", T.IntegerType(), False),
        T.StructField("vec_id", T.IntegerType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


@dataclass(frozen=True)
class SearchParams:
    """Per-query knobs (api/SearchParams.java:15-43)."""

    ef: int | None = None          # candidate pool for sealed path; None → auto
    per_seg_limit: int | None = None  # None → max(k, k*oversample) (SearchParams.java:73-82)
    mode: str = "AUTO"             # AUTO | BRUTE (force exact scan everywhere)
    normalize_on_read: bool = False


class VectorIndex:
    """Facade over the segmented tables; all methods are batch jobs."""

    def __init__(self, spark: SparkSession, path: str, config: IndexConfig):
        self.spark = spark
        self.path = path.rstrip("/")
        self.config = config

    # -- paths ---------------------------------------------------------
    @property
    def meta_path(self) -> str:
        return f"{self.path}/meta"

    @property
    def segments_path(self) -> str:
        return f"{self.path}/segments"

    @property
    def vectors_path(self) -> str:
        return f"{self.path}/vectors"

    @property
    def codebooks_path(self) -> str:
        return f"{self.path}/codebooks"

    @property
    def codes_path(self) -> str:
        return f"{self.path}/codes"

    @property
    def adjacency_path(self) -> str:
        return f"{self.path}/adjacency"

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create(cls, spark: SparkSession, path: str, config: IndexConfig) -> "VectorIndex":
        idx = cls(spark, path, config)
        idx._write_meta(next_gid=0, max_seg_id=-1)
        spark.createDataFrame([], SEGMENTS_SCHEMA).write.mode("overwrite").parquet(
            idx.segments_path
        )
        return idx

    @classmethod
    def open(
        cls, spark: SparkSession, path: str, config: IndexConfig | None = None
    ) -> "VectorIndex":
        """Open an existing index; like fdb/FdbVectorStore.java:124-166 a
        mismatched requested config raises."""
        row = spark.read.parquet(f"{path.rstrip('/')}/meta").collect()[0]
        stored = IndexConfig.from_json(row["config_json"])
        if config is not None:
            stored.validate_same(config)
        return cls(spark, path, stored)

    def _write_meta(self, next_gid: int, max_seg_id: int) -> None:
        """next_gid / max_seg_id are the monotonic counters of the
        reference (FdbDirectories.java:87-88): gids are never reused and
        neither are seg_ids (compaction destinations get fresh ids)."""
        df = self.spark.createDataFrame(
            [(self.config.to_json(), int(next_gid), int(max_seg_id))],
            "config_json string, next_gid long, max_seg_id int",
        )
        df.coalesce(1).write.mode("overwrite").parquet(self.meta_path)

    def _meta(self):
        return self.spark.read.parquet(self.meta_path).collect()[0]

    @property
    def next_gid(self) -> int:
        return self._meta()["next_gid"]

    @property
    def max_seg_id(self) -> int:
        return self._meta()["max_seg_id"]

    # -- registry ------------------------------------------------------
    def segments(self) -> DataFrame:
        return self.spark.read.schema(SEGMENTS_SCHEMA).parquet(self.segments_path)

    def _overwrite_segments(self, rows: list) -> None:
        df = self.spark.createDataFrame(rows, SEGMENTS_SCHEMA)
        # write-then-swap through a staging subdir is unnecessary locally;
        # registry is tiny and rewritten atomically enough by overwrite
        df.coalesce(1).write.mode("overwrite").parquet(self.segments_path)

    def _segment_rows(self) -> list:
        return [r.asDict() for r in self.segments().collect()]

    def update_segment_states(self, updates: dict[int, dict]) -> None:
        """Apply per-seg_id field updates to the registry; a seg mapped to
        None is dropped (compaction source clear)."""
        rows = []
        for r in self._segment_rows():
            if r["seg_id"] in updates:
                u = updates[r["seg_id"]]
                if u is None:
                    continue
                r.update(u)
            rows.append(tuple(r[f.name] for f in SEGMENTS_SCHEMA.fields))
        new_ids = set(updates) - {r["seg_id"] for r in self._segment_rows()}
        for sid in sorted(new_ids):
            u = updates[sid]
            if u is None:
                continue
            rows.append(
                (
                    sid,
                    u.get("state", WRITING),
                    u.get("count", 0),
                    u.get("deleted_count", 0),
                    u.get("created_at_ms", int(time.time() * 1000)),
                    u.get("last_vacuum_at_ms"),
                )
            )
        self._overwrite_segments(rows)

    def registered_seg_ids(self, states: tuple[str, ...] | None = None) -> list[int]:
        df = self.segments()
        if states:
            df = df.filter(F.col("state").isin(list(states)))
        return [r["seg_id"] for r in df.select("seg_id").collect()]

    # -- tables (visibility-filtered) ----------------------------------
    def vectors(self, states: tuple[str, ...] | None = None) -> DataFrame:
        """Vector rows of registered segments (WRITING excluded unless
        asked for) — partition pruning via seg_id IN (...)."""
        df = self.spark.read.schema(VECTORS_SCHEMA).parquet(self.vectors_path)
        visible = self.registered_seg_ids(states)
        return df.filter(F.col("seg_id").isin(visible))

    def codes(self, seg_ids: list[int]) -> DataFrame:
        df = self.spark.read.parquet(self.codes_path)
        return df.filter(F.col("seg_id").isin(seg_ids))

    def adjacency(self, seg_ids: list[int]) -> DataFrame:
        df = self.spark.read.parquet(self.adjacency_path)
        return df.filter(F.col("seg_id").isin(seg_ids))

    def codebooks(self, seg_ids: list[int] | None = None) -> DataFrame:
        df = self.spark.read.parquet(self.codebooks_path)
        if seg_ids is not None:
            df = df.filter(F.col("seg_id").isin(seg_ids))
        return df

    def resolve_ids(self, gids: list[int]) -> DataFrame:
        """gid → (seg_id, vec_id); missing gids absent from the result
        (fdb/FdbVectorIndex.java:500-525 returns -1 — callers here
        detect absence instead)."""
        return (
            self.vectors()
            .filter(F.col("gid").isin([int(g) for g in gids]))
            .select("gid", "seg_id", "vec_id", "deleted")
        )

    # -- operations (implemented in sibling modules) -------------------
    def add(
        self,
        df: DataFrame,
        embedding_col: str = "embedding",
        payload_col: str | None = None,
        order_col: str | None = None,
    ) -> int:
        from vectorsearch_spark.index.ingest import add_vectors

        return add_vectors(self, df, embedding_col, payload_col, order_col)

    def build(self, seg_ids: list[int] | None = None) -> list[int]:
        from vectorsearch_spark.index.build import build_segments

        return build_segments(self, seg_ids)

    def search(
        self, queries: DataFrame, k: int = 10, params: SearchParams | None = None
    ) -> DataFrame:
        from vectorsearch_spark.index.search import search

        return search(self, queries, k, params or SearchParams())

    def delete(self, gids: list[int]) -> int:
        from vectorsearch_spark.index.maintenance import delete_gids

        return delete_gids(self, gids)

    def vacuum(self, seg_id: int, force: bool = False, min_deleted_ratio: float = 0.25) -> bool:
        from vectorsearch_spark.index.maintenance import vacuum_segment

        return vacuum_segment(self, seg_id, force, min_deleted_ratio)

    def plan_compaction(self, max_batch: int | None = None) -> list[int]:
        from vectorsearch_spark.index.maintenance import find_compaction_candidates

        return find_compaction_candidates(self, max_batch)

    def compact(self, seg_ids: list[int]) -> int:
        from vectorsearch_spark.index.maintenance import compact_segments

        return compact_segments(self, seg_ids)

    def gc(self) -> list[int]:
        from vectorsearch_spark.index.maintenance import gc

        return gc(self)

    # -- stats ---------------------------------------------------------
    def deleted_ratio(self) -> DataFrame:
        """del/(live+del) per segment (fdb/FdbVectorIndex.java:580-582)."""
        s = self.segments()
        return s.select(
            "seg_id",
            "state",
            (
                F.col("deleted_count")
                / F.when(F.col("count") + F.col("deleted_count") == 0, F.lit(1)).otherwise(
                    F.col("count") + F.col("deleted_count")
                )
            ).alias("deleted_ratio"),
        )
