"""Keyed MERGE into a partitioned parquet table: upsert and delete
with partition-scoped rewrites — the lakehouse MERGE primitive
(Delta/Iceberg ``MERGE INTO``) re-expressed on plain parquet for the
incremental-corpus workflows a training-data pipeline runs (refresh
changed documents, retract takedowns) without a table format.

Scale contract:
- Only TOUCHED partitions rewrite: the partitions where updated keys
  currently live (rows may MOVE partitions when their partition value
  changes — both old and new locations are touched) plus the
  partitions the update rows land in.  Everything else's files are
  untouched bytes on disk (asserted by the layout test).
- The touched-partition list is an O(#partitions) driver collect —
  metadata, not data (same bound as the index registry reads).
- Survivors are computed with a LEFT ANTI join against the updated
  key set — broadcast when small, AQE otherwise — scanning only the
  touched partitions (partition pruning on the isin filter).
- The rewrite is a staged write + per-partition rename swap
  (vectorsearch_spark/staging.py — parquet cannot overwrite a path it
  is reading, and the rename swap avoids re-encoding the staged copy
  through a second write job).  Atomicity is per-partition with a
  crash-recovery protocol (hidden ``.swap_old_*`` backups restored or
  dropped by ``staging.recover_partial_swaps``; crash-injection tests
  in tests/test_merge.py); re-running the SAME merge after a crash
  converges, because upsert/delete by key are idempotent.  Writes are
  single-writer by construction — a table format (Delta/Iceberg)
  upgrades this to a transactional commit with concurrent writers
  without changing this operator's plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorsearch_spark.staging import staged_partition_rewrite


def _overwrite_touched(
    spark: SparkSession,
    table_path: str,
    rows: DataFrame,
    partition_col: str,
    touched: list,
) -> None:
    """Swap ``rows``'s partitions into the table; ``touched``
    partitions for which the staged write produced ZERO survivor rows
    get their directories dropped (a partitioned write emits nothing
    for an empty group, so stale files would silently resurrect its
    rows on the next read)."""
    staged_partition_rewrite(
        spark, rows, table_path, partition_col, drop_missing=touched
    )


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_col: str,
    partition_col: str,
) -> int:
    """Upsert ``updates`` into the table at ``table_path``: rows whose
    ``key_col`` exists are replaced (following the row to its NEW
    partition when the partition value changed), new keys insert.
    ``updates`` must carry the full table schema.  Returns the number
    of partitions rewritten."""
    target = spark.read.parquet(table_path)
    upd_keys = updates.select(key_col).distinct()
    new_parts = updates.select(partition_col).distinct()
    old_parts = (
        target.join(upd_keys, key_col, "left_semi").select(partition_col).distinct()
    )
    touched = [
        r[0] for r in new_parts.unionByName(old_parts).distinct().collect()
    ]
    if not touched:
        return 0
    keep = target.where(F.col(partition_col).isin(touched)).join(
        upd_keys, key_col, "left_anti"
    )
    out = keep.unionByName(updates.select(*target.columns))
    _overwrite_touched(spark, table_path, out, partition_col, touched)
    return len(touched)


def merge_delete(
    spark: SparkSession,
    table_path: str,
    keys: DataFrame,
    key_col: str,
    partition_col: str,
) -> int:
    """Delete every row whose ``key_col`` appears in ``keys`` —
    partition-scoped: only partitions containing doomed keys rewrite.
    Returns the number of partitions rewritten."""
    target = spark.read.parquet(table_path)
    del_keys = keys.select(key_col).distinct()
    touched = [
        r[0]
        for r in target.join(del_keys, key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not touched:
        return 0
    keep = target.where(F.col(partition_col).isin(touched)).join(
        del_keys, key_col, "left_anti"
    )
    _overwrite_touched(spark, table_path, keep, partition_col, touched)
    return len(touched)
