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
- The rewrite stages to a side directory first, then
  dynamic-partition-overwrites the table — parquet cannot overwrite a
  path it is reading (the index compaction's staged pattern,
  index/maintenance.py:49-68).  Atomicity is per-partition, the same
  contract as the reference's per-segment swaps; a table format
  (Delta/Iceberg) upgrades this to a transactional commit without
  changing this operator's plan shape.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop_delete(spark: SparkSession, path: str) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def _overwrite_touched(
    spark: SparkSession,
    table_path: str,
    rows: DataFrame,
    partition_col: str,
    touched: list,
) -> None:
    """Dynamic-partition-overwrite ``rows`` into the table, then drop
    the directories of ``touched`` partitions that ended up with ZERO
    survivor rows — dynamic overwrite writes nothing for an empty
    group, so a fully-emptied partition's stale files would silently
    resurrect its rows on the next read."""
    staging = f"{table_path}/_merge_staging_{int(time.time() * 1000)}"
    rows.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    # explicit schema: a fully-emptied rewrite stages zero files and
    # schema inference would fail on the bare directory
    staged = spark.read.schema(rows.schema).parquet(staging)
    nonempty = {r[0] for r in staged.select(partition_col).distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        staged.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        _hadoop_delete(spark, staging)
    for value in touched:
        if value not in nonempty:
            _hadoop_delete(spark, f"{table_path}/{partition_col}={value}")


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
