"""Incremental aggregate maintenance: keep a grouped rollup current by
merging per-batch partial states instead of rescanning the base table
(materialized-view maintenance, the production shape for "nightly base
+ hourly delta" pipelines; north-star extension per BASELINE.json).

The algebra: ``count/sum/min/max`` are commutative-monoid aggregates,
so a rollup STATE (n, total, vmin, vmax) per group merges associatively
— ``state(base ∪ delta) = merge(state(base), state(delta))`` — and
derived values (avg) are finalized from the merged state. The merge
shuffles only STATE ROWS (O(|groups|), not O(|rows|)): at 100 TB the
delta pass reads one increment and the merge re-aggregates two
group-sized tables. This is exactly Spark's own partial-aggregation
contract (map-side combine) lifted to cross-batch persistence.

Append-only by construction: min/max are NOT retractable monoids — a
deletion/update in the base requires re-aggregating the affected
groups (the documented limitation of every min/max materialized view;
count/sum alone would admit retraction via negative weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "total", "vmin", "vmax")


def epoch_already_applied(marker: str, epoch_id: int, state_desc: str) -> bool:
    """True iff ``epoch_id`` is the already-committed last epoch (a
    foreachBatch replay — skip it). Raises on epoch REGRESSION: a fresh
    checkpoint dir restarts epoch ids at 0, and treating those as
    replays would silently drop every batch against existing state
    (checkpoint and state lifetimes are coupled — fail loudly)."""
    import json
    import os

    if not os.path.exists(marker):
        return False
    with open(marker) as fh:
        last = json.load(fh)["epoch"]
    if last == epoch_id:
        return True
    if epoch_id < last:
        raise ValueError(
            f"epoch regression: batch epoch {epoch_id} < committed epoch "
            f"{last} at {state_desc} — the stream checkpoint was reset "
            "against existing state; clear the state dir or restore the "
            "original checkpoint dir"
        )
    return False


def prior_epochs(root: str, epoch_id: int) -> "list[int]":
    """Epoch ids already written under ``root`` (epoch=N dirs) that are
    strictly older than ``epoch_id`` — the shared state-read preamble of
    every fold (read the max of these, never ``epoch_id`` itself: a
    crashed attempt's partial dir for the CURRENT epoch must not feed
    its own replay)."""
    import os

    if not os.path.isdir(root):
        return []
    return [
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("epoch=") and int(d.split("=", 1)[1]) < epoch_id
    ]


def commit_epoch(state_path: str, epoch_id: int) -> None:
    """Marker-commits-last: atomically publish ``epoch_id`` as the
    committed epoch via tempfile + ``os.replace`` — the final step of
    every fold's exactly-once protocol (state dirs written first; a
    crash before this leaves the previous marker, so readers and
    replays never see the partial epoch)."""
    import json
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=state_path, prefix="._epoch_tmp_")
    with os.fdopen(fd, "w") as fh:
        json.dump({"epoch": int(epoch_id)}, fh)
    os.replace(tmp, os.path.join(state_path, "_last_epoch.json"))


def committed_epoch(state_path: str, reader: str) -> int:
    """The committed epoch id for external readers — raises with the
    reader's name when no fold has ever committed. Readers must load
    ONLY this epoch's dirs (the crash-window contract applies to
    external reads, not just replays)."""
    import json
    import os

    marker = os.path.join(state_path, "_last_epoch.json")
    if not os.path.exists(marker):
        raise ValueError(f"{reader}: no committed epoch at {state_path}")
    with open(marker) as fh:
        return int(json.load(fh)["epoch"])


class EpochBucketedState:
    """The 100 TB layout for a streaming fold's keyed state (r12): one
    EXTERNAL parquet table per state substore, PARTITIONED BY ``epoch``
    and CLUSTERED BY the state's join/aggregation key into a fixed
    bucket count, living at ``{state_path}/{name}_bucketed``.

    Why: the folds' per-batch state reads are keyed — an anti-join on
    canonical url (URL frontier), an anti+semi join on chunk_text
    (passage dedup), a groupBy-sum on line key (line dedup). Over plain
    per-epoch parquet dirs each of those re-EXCHANGES the entire state
    at every fold; over this layout the bucketed scan already satisfies
    the join/aggregation distribution requirement, so the state is
    scanned but never shuffled and the per-fold exchange is O(batch).
    Size ``buckets`` to the cluster (a bucket is one task's state
    slice).

    Exactly-once mechanics match the plain layout one-for-one:
      * reads filter ``epoch < epoch_id`` (partition pruning), so a
        crashed attempt's partial CURRENT partition is invisible to
        its own replay;
      * writes are static-partition ``INSERT OVERWRITE`` — idempotent
        per-epoch rewrite, exactly like the dirs' mode=overwrite;
      * the fold's marker still commits last (this class never touches
        the marker).
    The catalog entry is re-derivable: the data dir is the durable
    artifact, and a fresh session (in-memory catalog) re-registers the
    same DDL and recovers partitions, so bucketed state survives
    restarts exactly like the plain dirs do.
    """

    def __init__(
        self,
        spark,
        state_path: str,
        name: str,
        schema_ddl: str,
        key: str,
        buckets: int,
    ) -> None:
        import hashlib
        import os

        self.spark = spark
        self.name = name
        self.schema_ddl = schema_ddl  # data columns only, no epoch
        self.key = key
        self.buckets = int(buckets)
        self.loc = os.path.join(state_path, f"{name}_bucketed")
        digest = hashlib.md5(self.loc.encode()).hexdigest()[:12]
        self.table = f"fold_state_{name}_{digest}"
        self.cols = [
            c.strip().split()[0].strip("`") for c in schema_ddl.split(",")
        ]

    def _ensure(self) -> bool:
        """Register (or recover) the table; False if no state exists yet."""
        import os

        if self.spark.catalog.tableExists(self.table):
            return True
        if not os.path.isdir(self.loc):
            return False
        cols = ", ".join(
            f"`{c.strip().split()[0].strip('`')}` {' '.join(c.strip().split()[1:])}"
            for c in self.schema_ddl.split(",")
        )
        self.spark.sql(
            f"CREATE TABLE {self.table} ({cols}, epoch INT) USING PARQUET"
            f" PARTITIONED BY (epoch) CLUSTERED BY (`{self.key}`)"
            f" SORTED BY (`{self.key}`) INTO {self.buckets} BUCKETS"
            f" LOCATION '{self.loc}'"
        )
        self.spark.sql(f"MSCK REPAIR TABLE {self.table}")
        return True

    def read_before(self, epoch_id: int) -> "DataFrame | None":
        """State rows of epochs strictly before ``epoch_id`` as a
        bucketed scan (None when no state exists yet)."""
        if not self._ensure():
            return None
        return (
            self.spark.table(self.table)
            .where(F.col("epoch") < int(epoch_id))
            .select(*self.cols)
        )

    def write_epoch(self, df: DataFrame, epoch_id: int) -> None:
        """Idempotently (re)write ``epoch_id``'s rows."""
        if not self._ensure():
            (
                df.select(*self.cols)
                .withColumn("epoch", F.lit(int(epoch_id)).cast("int"))
                .write.partitionBy("epoch")
                .bucketBy(self.buckets, self.key)
                .sortBy(self.key)
                .option("path", self.loc)
                .format("parquet")
                .saveAsTable(self.table)
            )
            return
        v = f"__{self.table}_e{int(epoch_id)}"
        df.select(*self.cols).createOrReplaceTempView(v)
        cols = ", ".join(f"`{c}`" for c in self.cols)
        self.spark.sql(
            f"INSERT OVERWRITE TABLE {self.table}"
            f" PARTITION (epoch={int(epoch_id)}) SELECT {cols} FROM {v}"
        )
        self.spark.catalog.dropTempView(v)

    def compact_epochs(self, upto_epoch: int) -> None:
        """LSM-style maintenance: merge every epoch ≤ ``upto_epoch``
        into partition ``upto_epoch`` (distinct rows) and remove the
        older partitions, bounding partition/file counts as folds
        accumulate. Call BETWEEN folds.

        SET-SEMANTICS STATE ONLY (membership rows — url frontier,
        surviving chunks): every step keeps the row SET of
        ``epoch ≤ upto`` reads invariant, so a crash at ANY point (or
        an MSCK recovery resurrecting a not-yet-deleted dir) leaves
        readers correct — duplicates across partitions cannot change
        an anti/semi join. Do NOT compact additive state (the line
        fold's keycounts): duplicate count rows would double-sum.

        Order of operations (each idempotent, re-entrant on crash):
        1. INSERT OVERWRITE partition ``upto`` with the distinct union
           of epochs ≤ upto (detached via localCheckpoint — Spark
           forbids overwriting a table being read);
        2. per older epoch: DROP PARTITION from the catalog FIRST,
           then delete the dir (never the reverse — a catalog entry
           pointing at a deleted dir breaks scans; an orphan dir
           without a catalog entry is invisible until an MSCK, and
           set-safe even then).
        """
        import os
        import shutil

        if not self._ensure():
            return
        upto = int(upto_epoch)
        merged = (
            self.spark.table(self.table)
            .where(F.col("epoch") <= upto)
            .select(*self.cols)
            .distinct()
            .localCheckpoint()
        )
        v = f"__{self.table}_compact_{upto}"
        merged.createOrReplaceTempView(v)
        cols = ", ".join(f"`{c}`" for c in self.cols)
        self.spark.sql(
            f"INSERT OVERWRITE TABLE {self.table}"
            f" PARTITION (epoch={upto}) SELECT {cols} FROM {v}"
        )
        self.spark.catalog.dropTempView(v)
        # older partitions: disk is the source of truth for what still
        # needs cleanup (re-entrancy after a crash mid-loop)
        for d in sorted(os.listdir(self.loc)):
            if not d.startswith("epoch="):
                continue
            e = int(d.split("=", 1)[1])
            if e >= upto:
                continue
            self.spark.sql(
                f"ALTER TABLE {self.table} DROP IF EXISTS PARTITION (epoch={e})"
            )
            shutil.rmtree(os.path.join(self.loc, d), ignore_errors=True)


def rollup_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate a batch into mergeable per-group state:
    (keys…, n_rows, total, vmin, vmax) over ``value_col`` (NULL values
    count toward no measure, like SQL aggregates)."""
    return df.groupBy(*keys).agg(
        F.count(F.col(value_col)).alias("n_rows"),
        F.sum(F.col(value_col)).alias("total"),
        F.min(F.col(value_col)).alias("vmin"),
        F.max(F.col(value_col)).alias("vmax"),
    )


def merge_rollup_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge any number of state tables: union (by name) + one re-agg
    combining the monoids — groups present in only some states pass
    through, shared groups combine."""
    if not states:
        raise ValueError("need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize_rollup(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the user-facing aggregate view from a state table —
    avg from (total, n_rows); groups whose measures were all NULL keep
    NULL aggregates (n_rows = 0)."""
    return state.select(
        *keys,
        F.col("n_rows"),
        F.col("total"),
        F.col("vmin"),
        F.col("vmax"),
        F.when(F.col("n_rows") > 0, F.col("total") / F.col("n_rows")).alias("avg"),
    )


def distinct_state(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Mergeable distinct-count state per group: an HLL sketch of
    ``col`` (Datasketches binary). Unlike count_distinct, the state
    merges across batches WITHOUT the raw values — register-wise max is
    associative and EXACT: sketch(A ∪ B) = merge(sketch(A), sketch(B))
    at equal lgK, so incremental maintenance loses nothing over a
    rescan (the estimate itself stays a ±~1.6% HLL estimate)."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(F.col(col)).alias("hll"))


def merge_distinct_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Union + hll_union_agg — same monoid-merge shape as
    ``merge_rollup_states``, shuffling O(|groups|) sketches."""
    if not states:
        raise ValueError("need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(F.hll_union_agg(F.col("hll")).alias("hll"))


def finalize_distinct(state: DataFrame, keys: list[str]) -> DataFrame:
    """(keys…, n_distinct_est) from the sketch state."""
    return state.select(
        *keys, F.hll_sketch_estimate(F.col("hll")).alias("n_distinct_est")
    )


def maintain_rollup_stream(
    events: DataFrame,
    state_path: str,
    keys: list[str],
    value_col: str,
    checkpoint: str,
):
    """Keep a PERSISTENT rollup-state table current from a stream:
    every micro-batch folds into the parquet state at ``state_path``
    via ``merge_rollup_states`` (monoid merge — O(|groups| + |batch
    groups|) per batch, never a rescan of history). Returns the
    StreamingQuery; read the live view any time with
    ``finalize_rollup(spark.read.parquet(state_path), keys)``.

    Exactly-once: foreachBatch can replay a batch after a crash, and
    a blind re-merge would double-count it. The state write is staged
    (tmp dir + atomic rename) and the LAST APPLIED batch id rides a
    marker file inside the state dir — a replayed epoch is detected
    and skipped, the same intent/guard discipline as the streaming
    index ingest (streaming/ingest.py).
    """
    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        fold_rollup_batch(batch_df, epoch_id, state_path, keys, value_col)

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def fold_rollup_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_path: str,
    keys: list[str],
    value_col: str,
) -> None:
    """One micro-batch fold (the foreachBatch body, exposed for direct
    crash-injection testing): staged write + atomic rename with the
    applied-epoch marker riding inside the renamed dir."""
    import json
    import os
    import shutil

    spark = batch_df.sparkSession
    old = state_path + ".old"
    # crash recovery: a crash between the two renames leaves no
    # live state but a complete .old — restore it before anything
    if not os.path.exists(state_path) and os.path.exists(old):
        os.rename(old, state_path)
    marker = os.path.join(state_path, "_last_epoch.json")
    if epoch_already_applied(marker, epoch_id, state_path):
        return  # replayed epoch: already folded in
    delta = rollup_state(batch_df, keys, value_col)
    if os.path.exists(os.path.join(state_path, "_SUCCESS")):
        prev = spark.read.parquet(state_path)
        merged = merge_rollup_states([prev, delta], keys)
    else:
        merged = delta
    tmp = state_path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    # the applied-epoch marker rides INSIDE the renamed dir, so
    # state content and marker swap in the same atomic rename — a
    # crash can never pair new state with an old marker (which a
    # replay would double-merge)
    with open(os.path.join(tmp, "_last_epoch.json"), "w") as fh:
        json.dump({"epoch": int(epoch_id)}, fh)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(tmp, state_path)
    shutil.rmtree(old, ignore_errors=True)


# ---------------------------------------------------------------------------
# Incremental SCD2 dimension maintenance from a streaming changelog
# ---------------------------------------------------------------------------

def fold_scd2_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_path: str,
    on: str,
    ts: str = "ts",
    tiebreak: "str | None" = None,
) -> None:
    """One micro-batch fold of a changelog into a persistent SCD2
    dimension (the foreachBatch body, exposed for crash-injection
    tests).

    The state dir holds BOTH the accumulated raw changelog
    (``changelog/epoch=<id>/`` — one APPEND-ONLY dir per applied
    micro-batch, so a fold writes O(batch), never a history rewrite)
    and the materialized dimension (``dim/``). Keeping the raw history
    is what makes the fold EXACT under arbitrarily late, out-of-order
    rows: a collapsed dimension alone is lossy (a no-op update dropped
    by collapse can become a real version once a late row lands
    between it and its predecessor), so each fold recomputes
    ``changelog_to_scd2`` over the FULL history of only the TOUCHED
    keys — O(batch keys × their history) — and splices it with the
    untouched keys' existing dimension rows. The dimension rewrite
    itself is O(dimension) per fold; a huge dimension would partition
    ``dim/`` by key bucket and rewrite touched buckets only (the
    merge_upsert shape) without changing these semantics.

    Exactly-once: the applied-epoch marker rides inside the staged
    ``dim`` dir, swapped by the same atomic rename as the content (a
    replayed foreachBatch epoch is detected and skipped BEFORE any
    write; a crash after the changelog-epoch write but before the dim
    swap replays into an idempotent overwrite of the same epoch dir);
    a crash between the two renames restores from ``.old`` — the
    ``fold_rollup_batch`` discipline.
    """
    import json
    import os
    import shutil

    spark = batch_df.sparkSession
    from vectorsearch_spark.operators.events import changelog_to_scd2

    dim_path = os.path.join(state_path, "dim")
    old = dim_path + ".old"
    if not os.path.exists(dim_path) and os.path.exists(old):
        os.rename(old, dim_path)
    marker = os.path.join(dim_path, "_last_epoch.json")
    if epoch_already_applied(marker, epoch_id, dim_path):
        return  # replayed epoch: already folded in
    batch = batch_df.localCheckpoint()  # stream sources are single-pass
    clog_root = os.path.join(state_path, "changelog")
    epoch_dir = os.path.join(clog_root, f"epoch={int(epoch_id)}")
    batch.write.mode("overwrite").parquet(epoch_dir)  # idempotent on replay
    have_dim = os.path.exists(os.path.join(dim_path, "_SUCCESS"))
    touched = batch.select(on).distinct()
    full_clog = spark.read.schema(batch.schema).parquet(f"{clog_root}/epoch=*")
    if have_dim:
        hist = full_clog.join(F.broadcast(touched), on, "left_semi")
        scd_new = changelog_to_scd2(hist, on, ts=ts, tiebreak=tiebreak)
        prev = spark.read.parquet(dim_path)
        untouched = prev.join(F.broadcast(touched), on, "left_anti")
        scd_out = untouched.unionByName(scd_new.select(*prev.columns))
    else:
        scd_out = changelog_to_scd2(full_clog, on, ts=ts, tiebreak=tiebreak)
    tmp = dim_path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    scd_out.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_last_epoch.json"), "w") as fh:
        json.dump({"epoch": int(epoch_id)}, fh)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dim_path):
        os.rename(dim_path, old)
    os.rename(tmp, dim_path)
    shutil.rmtree(old, ignore_errors=True)


def stream_scd2_maintain(
    changelog: DataFrame,
    state_path: str,
    on: str,
    checkpoint: str,
    ts: str = "ts",
    tiebreak: "str | None" = None,
):
    """Keep a persistent SCD2 dimension current from a streaming
    changelog (see ``fold_scd2_batch``). Returns the StreamingQuery;
    read the live dimension any time from ``{state_path}/dim``."""
    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        fold_scd2_batch(batch_df, epoch_id, state_path, on, ts=ts, tiebreak=tiebreak)

    return (
        changelog.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
