"""Segmented vector-index catalog: on-disk layout, metadata, and the
public API facade (the Spark re-expression of ``api/VectorIndex.java``).

Layout under one root path (SURVEY §1.4 mapping of FdbDirectories):

    <root>/meta.json      config JSON + next_gid/max_seg_id counters
    <root>/segments.json  registry: (seg_id, state, count,
                          deleted_count, created_at_ms, last_vacuum_at_ms)
    <root>/vectors/       parquet partitioned by seg_id:
                          (gid, vec_id, embedding, deleted, payload)
    <root>/codebooks/     parquet: (seg_id, m, k, sub_dim, centroids flat)
    <root>/codes/         parquet partitioned by seg_id: (vec_id, codes)
    <root>/adjacency/     parquet partitioned by seg_id: (vec_id, neighbor_ids)

Metadata is a driver-side JSON log, NOT a Spark table: the registry is
O(#segments) — thousands of rows at 100 TB — so running distributed
jobs to touch it is pure overhead (it cost ~2/3 of index-build wall
time as tiny parquet jobs). Writes go through atomic temp+rename, the
same single-writer transaction-log shape Delta Lake uses for its
`_delta_log` JSON; on object storage this slot would be a metastore or
a conditional-put log. Row data (vectors/codes/adjacency) stays in
distributed parquet.

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

import json
import os
import tempfile
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

# On-disk layout version, stamped into meta.json at create and checked
# at open. v2: unified artifacts table (codebooks/codes/adjacency as a
# tagged union partitioned by (seg_id, kind)) replacing three separate
# tables — pre-v2 indexes must rebuild.
LAYOUT_VERSION = 2

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


PQ_SEED_ONLY = "PQ_SEED_ONLY"
RANDOM_PIVOTS = "RANDOM_PIVOTS"


@dataclass(frozen=True)
class SearchParams:
    """Per-query knobs (api/SearchParams.java:15-43).

    Full surface parity with the reference's SearchParams: ef
    (candidate pool), beam (beamWidth), max_iters (maxIters), min_hops
    (minHops), max_explore (maxExplore), pivots + seed_strategy
    (SearchParams.java:39-42, seeding at fdb/FdbVectorIndex.java:801-812),
    per_seg_limit (perSegmentLimitMultiplier resolved to an absolute
    cap), normalize_on_read. Batch adaptations are documented at the
    point of use in index/search.py.
    """

    ef: int | None = None          # candidate pool for sealed path; None → auto
    per_seg_limit: int | None = None  # None → max(k, k*oversample) (SearchParams.java:73-82)
    # AUTO | BRUTE (exact everywhere) | GRAPH (best-first traversal) |
    # BEAM (deprecated in the reference — WARN-once parity,
    # fdb/FdbVectorIndex.java:369-372 — but still served: a migrating
    # user's mode=BEAM queries keep working)
    mode: str = "AUTO"
    normalize_on_read: bool = False
    beam: int | None = None        # GRAPH seed beam width; None → max(k, ef // 4)
    max_iters: int = 6             # GRAPH frontier-expansion rounds (maxIters)
    # minHops surface parity ONLY — no batch effect: the loop exits early
    # only when a round finds NO new node, and an empty frontier makes
    # further hops no-ops, so a minimum-hop floor cannot change results
    min_hops: int = 0
    max_explore: int | None = None  # cap on scored nodes per (query, segment) (maxExplore)
    pivots: int = 8                # entry points per segment for RANDOM_PIVOTS
    seed_strategy: str = PQ_SEED_ONLY  # PQ_SEED_ONLY | RANDOM_PIVOTS
    # BEAM: pick the next frontier from newly∪frontier (True, the
    # reference default) or newly alone (SearchParams.java:25,45)
    refine_frontier: bool = True


class VectorIndex:
    """Facade over the segmented tables; all methods are batch jobs."""

    def __init__(self, spark: SparkSession, path: str, config: IndexConfig):
        self.spark = spark
        self.path = path.rstrip("/")
        self.config = config
        self._meta_cache: dict | None = None
        self._segments_cache: list[dict] | None = None
        # driver-side codebook cache (analog of the reference's
        # SegmentCaches, cache/SegmentCaches.java:210-270): avoids a
        # Spark job per search to re-collect unchanged codebooks.
        # Invalidated wholesale on ANY registry mutation (build, seal,
        # compact, vacuum, delete all route through
        # update_segment_states). Bounded O(#segments × m·k·sub_dim).
        self._codebook_np_cache: dict[int, "object"] = {}
        # OPQ rotations ride the same cache lifecycle (None = plain PQ)
        self._rotation_np_cache: dict[int, "object"] = {}

    # -- paths ---------------------------------------------------------
    @property
    def meta_path(self) -> str:
        return f"{self.path}/meta.json"

    @property
    def segments_path(self) -> str:
        return f"{self.path}/segments.json"

    @property
    def vectors_path(self) -> str:
        return f"{self.path}/vectors"

    @property
    def artifacts_path(self) -> str:
        """Unified build-artifact table (codebooks + PQ codes +
        adjacency as a tagged union), partitioned by (seg_id, kind):
        ONE write job per build instead of three (measured ~0.3 s of
        scheduling floor each), one partition-dir delete covers a
        segment's full artifact set for vacuum/compaction GC, and
        reads stay pruned — kind is a partition column (dir-level
        pruning per artifact family) and parquet's columnar layout
        means a codes scan never touches the adjacency/centroid
        columns."""
        return f"{self.path}/artifacts"

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create(cls, spark: SparkSession, path: str, config: IndexConfig) -> "VectorIndex":
        idx = cls(spark, path, config)
        # a create starts from NOTHING: never seed carried-through keys
        # from a stale meta.json at the same path
        idx._meta_cache = {}
        idx._write_meta(
            next_gid=0,
            max_seg_id=-1,
            active_seg_id=None,
            active_fill=0,
            layout=LAYOUT_VERSION,
        )
        idx._overwrite_segments([])
        return idx

    @classmethod
    def create_or_open(
        cls, spark: SparkSession, path: str, config: IndexConfig
    ) -> "VectorIndex":
        """The reference's main entry point (api/VectorIndex.java:43-49
        createOrOpen): open the index at ``path`` if its meta exists —
        validating the requested config against the stored one — else
        create it."""
        if os.path.exists(f"{path.rstrip('/')}/meta.json"):
            return cls.open(spark, path, config)
        return cls.create(spark, path, config)

    @classmethod
    def open(
        cls, spark: SparkSession, path: str, config: IndexConfig | None = None
    ) -> "VectorIndex":
        """Open an existing index; like fdb/FdbVectorStore.java:124-166 a
        mismatched requested config raises."""
        with open(f"{path.rstrip('/')}/meta.json") as f:
            meta = json.load(f)
        if meta.get("layout", 1) != LAYOUT_VERSION:
            raise ValueError(
                f"index at {path} has on-disk layout "
                f"v{meta.get('layout', 1)}, this build reads "
                f"v{LAYOUT_VERSION} — rebuild the index"
            )
        stored = IndexConfig.from_json(meta["config_json"])
        if config is not None:
            stored.validate_same(config)
        idx = cls(spark, path, stored)
        idx._meta_cache = meta
        return idx

    @staticmethod
    def _atomic_write_json(path: str, obj) -> None:
        """Marker/metadata publish through the state-FS seam
        (vectorsearch_spark.fsio — atomic co-located replace)."""
        from vectorsearch_spark.fsio import get_state_fs, write_file_atomic

        get_state_fs().makedirs(os.path.dirname(path))
        write_file_atomic(
            os.path.dirname(path), os.path.basename(path), json.dumps(obj)
        )

    _KEEP = object()  # sentinel: "preserve the stored value"

    def _write_meta(
        self,
        next_gid: int,
        max_seg_id: int,
        has_payload: bool | None = None,
        active_seg_id: "int | None" = _KEEP,
        active_fill: int = _KEEP,
        **extra,
    ) -> None:
        """next_gid / max_seg_id are the monotonic counters of the
        reference (FdbDirectories.java:87-88): gids are never reused and
        neither are seg_ids — BOTH ingest rotation and compaction
        destinations allocate from the same max_seg_id counter, so the
        two can never collide (the reference's single maxSegmentId).
        ``active_seg_id``/``active_fill`` track the segment currently
        accepting writes and its fill high-water mark (never decremented
        by delete/vacuum, so appended vec_ids never collide with holes).
        ``has_payload`` is sticky-true once any batch ingested payloads —
        it lets search skip the payload-attach join entirely for
        payload-free indexes. Unknown keys already in the meta (and any
        ``extra`` kwargs, e.g. streaming epoch bookkeeping) are carried
        through — seeded from the meta FILE (not just the cache), so a
        fresh handle that writes before reading never drops stored keys."""
        try:
            prev = self._meta()
        except FileNotFoundError:  # create(): no meta yet
            prev = {}
        if has_payload is None:
            has_payload = bool(prev.get("has_payload", False))
        meta = dict(prev)
        meta.update(
            {
                "config_json": self.config.to_json(),
                "next_gid": int(next_gid),
                "max_seg_id": int(max_seg_id),
                "has_payload": bool(has_payload),
            }
        )
        if active_seg_id is not self._KEEP:
            meta["active_seg_id"] = None if active_seg_id is None else int(active_seg_id)
        if active_fill is not self._KEEP:
            meta["active_fill"] = int(active_fill)
        meta.update(extra)
        self._atomic_write_json(self.meta_path, meta)
        self._meta_cache = meta

    def _meta(self) -> dict:
        if self._meta_cache is None:
            with open(self.meta_path) as f:
                self._meta_cache = json.load(f)
        return self._meta_cache

    @property
    def next_gid(self) -> int:
        return self._meta()["next_gid"]

    @property
    def max_seg_id(self) -> int:
        return self._meta()["max_seg_id"]

    @property
    def has_payload(self) -> bool:
        # default True for metas predating the flag: always-attach is safe
        return bool(self._meta().get("has_payload", True))

    @property
    def active_seg_id(self) -> int | None:
        """Segment currently accepting writes; None → the next ingest
        allocates a fresh segment from max_seg_id (metas predating the
        field also resolve to None — safe, never collides)."""
        return self._meta().get("active_seg_id")

    @property
    def active_fill(self) -> int:
        """Rows ever written to the active segment (fill high-water mark;
        monotone — delete/vacuum never lower it, so appended vec_ids are
        always fresh)."""
        return int(self._meta().get("active_fill", 0) or 0)

    # -- registry ------------------------------------------------------
    def segments(self) -> DataFrame:
        rows = [
            tuple(r[f.name] for f in SEGMENTS_SCHEMA.fields) for r in self._segment_rows()
        ]
        return self.spark.createDataFrame(rows, SEGMENTS_SCHEMA)

    def _overwrite_segments(self, rows: list[dict]) -> None:
        self._atomic_write_json(self.segments_path, rows)
        self._segments_cache = [dict(r) for r in rows]
        # the actual mutation choke point — EVERY registry write (incl.
        # streaming crash recovery's snapshot restore) invalidates the
        # codebook cache here, not just update_segment_states
        self._codebook_np_cache.clear()
        self._rotation_np_cache.clear()

    def _segment_rows(self) -> list[dict]:
        if self._segments_cache is None:
            with open(self.segments_path) as f:
                self._segments_cache = json.load(f)
        return [dict(r) for r in self._segments_cache]

    def update_segment_states(self, updates: dict[int, dict]) -> None:
        """Apply per-seg_id field updates to the registry; a seg mapped to
        None is dropped (compaction source clear)."""
        existing = self._segment_rows()
        rows = []
        for r in existing:
            if r["seg_id"] in updates:
                u = updates[r["seg_id"]]
                if u is None:
                    continue
                r.update(u)
            rows.append(r)
        new_ids = set(updates) - {r["seg_id"] for r in existing}
        for sid in sorted(new_ids):
            u = updates[sid]
            if u is None:
                continue
            rows.append(
                {
                    "seg_id": sid,
                    "state": u.get("state", WRITING),
                    "count": u.get("count", 0),
                    "deleted_count": u.get("deleted_count", 0),
                    "created_at_ms": u.get("created_at_ms", int(time.time() * 1000)),
                    "last_vacuum_at_ms": u.get("last_vacuum_at_ms"),
                }
            )
        self._overwrite_segments(sorted(rows, key=lambda r: r["seg_id"]))

    def registered_seg_ids(self, states: tuple[str, ...] | None = None) -> list[int]:
        return [
            r["seg_id"]
            for r in self._segment_rows()
            if states is None or r["state"] in states
        ]

    # -- tables (visibility-filtered) ----------------------------------
    def vectors(self, states: tuple[str, ...] | None = None) -> DataFrame:
        """Vector rows of registered segments (WRITING excluded unless
        asked for) — partition pruning via seg_id IN (...)."""
        df = self.spark.read.schema(VECTORS_SCHEMA).parquet(self.vectors_path)
        visible = self.registered_seg_ids(states)
        return df.filter(F.col("seg_id").isin(visible))

    def _artifacts(self) -> DataFrame:
        from vectorsearch_spark.index.build import ARTIFACTS_SCHEMA

        return self.spark.read.schema(ARTIFACTS_SCHEMA).parquet(self.artifacts_path)

    def codes(self, seg_ids: list[int]) -> DataFrame:
        return (
            self._artifacts()
            .filter((F.col("kind") == "code") & F.col("seg_id").isin(seg_ids))
            .select("seg_id", "vec_id", "codes")
        )

    def adjacency(self, seg_ids: list[int]) -> DataFrame:
        return (
            self._artifacts()
            .filter((F.col("kind") == "adj") & F.col("seg_id").isin(seg_ids))
            .select("seg_id", "vec_id", "neighbor_ids")
        )

    def codebooks(self, seg_ids: list[int] | None = None) -> DataFrame:
        df = self._artifacts().filter(F.col("kind") == "cb")
        if seg_ids is not None:
            df = df.filter(F.col("seg_id").isin(seg_ids))
        return df.select("seg_id", "m", "k", "sub_dim", "centroids", "rotation")

    def codebooks_np(self, seg_ids: list[int]) -> dict[int, "object"]:
        """{seg_id: (m, k, sub_dim) float64 ndarray} for the given
        segments, served from the driver cache; only missing segments
        cost a (filtered) collect."""
        import numpy as np

        missing = [s for s in seg_ids if s not in self._codebook_np_cache]
        if missing:
            for r in self.codebooks(missing).collect():
                sid = int(r["seg_id"])
                self._codebook_np_cache[sid] = np.array(
                    r["centroids"], dtype=np.float64
                ).reshape(r["m"], r["k"], r["sub_dim"])
                d = r["m"] * r["sub_dim"]
                self._rotation_np_cache[sid] = (
                    np.array(r["rotation"], dtype=np.float64).reshape(d, d)
                    if r["rotation"] is not None
                    else None
                )
        return {
            s: self._codebook_np_cache[s]
            for s in seg_ids
            if s in self._codebook_np_cache
        }

    def rotations_np(self, seg_ids: list[int]) -> dict[int, "object"]:
        """{seg_id: (d, d) OPQ rotation or None} — populated by the
        same collect (and cache lifecycle) as ``codebooks_np``."""
        self.codebooks_np(seg_ids)
        return {
            s: self._rotation_np_cache.get(s)
            for s in seg_ids
            if s in self._codebook_np_cache
        }

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
        meta_extra: dict | None = None,
    ) -> int:
        """``meta_extra`` keys ride the add's final meta write — one
        atomic rename commits both (streaming uses this to mark an epoch
        applied in the same transaction as its rows)."""
        from vectorsearch_spark.index.ingest import add_vectors

        return add_vectors(self, df, embedding_col, payload_col, order_col, meta_extra)

    def build(self, seg_ids: list[int] | None = None, seal: bool = True) -> list[int]:
        from vectorsearch_spark.index.build import build_segments

        return build_segments(self, seg_ids, seal=seal)

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        params: SearchParams | None = None,
        filter_gids: DataFrame | None = None,
    ) -> DataFrame:
        from vectorsearch_spark.index.search import search

        return search(
            self, queries, k, params or SearchParams(), filter_gids=filter_gids
        )

    def search_join(
        self,
        queries: DataFrame,
        k: int = 10,
        params: SearchParams | None = None,
        filter_gids: DataFrame | None = None,
    ) -> DataFrame:
        """Exhaustive-exact search with a DataFrame query side (never
        collected) — for query batches beyond driver comfort."""
        from vectorsearch_spark.index.search import search_join

        return search_join(
            self, queries, k, params or SearchParams(), filter_gids=filter_gids
        )

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

    def recover(self) -> dict:
        """Writer-restart crash recovery (see maintenance.recover):
        restores interrupted partition swaps, rolls back WRITING /
        COMPACTING registry leftovers, GCs orphaned dirs. Single-writer
        contract — call before issuing new maintenance ops."""
        from vectorsearch_spark.index.maintenance import recover

        return recover(self)

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
