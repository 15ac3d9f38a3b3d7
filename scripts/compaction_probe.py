"""Additive-compaction benefit probe (r13): measure what
``EpochBucketedState.compact_epochs`` buys a long-lived fold.

A streaming line-dedup fold accumulates one keycounts partition per
micro-batch; every fold then re-aggregates the WHOLE history of
per-epoch count increments (sum over epochs) to get prior totals. The
aggregation is already exchange-free over the bucketed scan — what
grows without compaction is the SCAN: files (epochs × buckets),
row-groups, and duplicate per-epoch rows per key. LSM-merging epochs
into one summed partition bounds all three while the marker-gated swap
keeps every crash window safe (operators/incremental.py).

This probe builds a keycounts state of E epochs × R rows (keys
overlapping across epochs, zipf-ish), times the fold-side prior-count
read (groupBy key, sum) before compaction, compacts, re-times it, and
reports walls, rows scanned, and file counts — the measured counterpart
of the "bounded partition/file count" claim.

Usage: python scripts/compaction_probe.py [epochs] [rows_per_epoch]
Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_spark.operators.incremental import EpochBucketedState
from vectorsearch_spark.session import get_spark


def _files(root: str) -> int:
    n = 0
    for _, _, fs in os.walk(root):
        n += sum(1 for f in fs if f.endswith(".parquet"))
    return n


def _timed_read(st: EpochBucketedState, upto: int, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        (
            st.read_before(upto)
            .groupBy("__key")
            .agg(F.sum("__nd_b").alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        best = min(best, time.time() - t)
    return best


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("compaction_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    base = "/tmp/compaction_probe_state"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    st = EpochBucketedState(
        spark, base, "kc", "`__key` STRING, `__nd_b` BIGINT", "__key", 16,
        sum_cols=["__nd_b"],
    )
    spark.sql(f"DROP TABLE IF EXISTS {st.table}")
    spark.sql(f"DROP TABLE IF EXISTS {st._stage_names()[0]}")

    # keys overlap across epochs: id-space slides by rows/2 per epoch,
    # so every key appears in ~2 epochs (the boilerplate-line shape —
    # history MUST be summed, not unioned)
    for e in range(epochs):
        lo = e * rows // 2
        df = spark.range(lo, lo + rows).select(
            F.concat(F.lit("line_"), F.col("id")).alias("__key"),
            (F.col("id") % 3 + 1).cast("long").alias("__nd_b"),
        )
        st.write_epoch(df, e)

    pre_files = _files(st.loc)
    pre_rows = st.read_before(epochs + 1).count()
    pre_s = _timed_read(st, epochs + 1)

    t0 = time.time()
    st.compact_epochs(epochs - 1)
    compact_s = time.time() - t0

    post_files = _files(st.loc)
    post_rows = st.read_before(epochs + 1).count()
    post_s = _timed_read(st, epochs + 1)

    out = {
        "epochs": epochs,
        "rows_per_epoch": rows,
        "pre": {"files": pre_files, "state_rows": pre_rows,
                "fold_read_s": round(pre_s, 3)},
        "compact_s": round(compact_s, 3),
        "post": {"files": post_files, "state_rows": post_rows,
                 "fold_read_s": round(post_s, 3)},
        "read_speedup": round(pre_s / post_s, 2) if post_s > 0 else None,
    }

    # r13 VERDICT #6: the clustered write (REPARTITION onto the bucket
    # key before the bucketed INSERT, commit 27cda58) costs one extra
    # exchange per fold — measured at sf0.1 as +1 s on the line fold.
    # Record what it costs AND buys at 10x batch: write_epoch wall and
    # files-per-epoch with clustering on (production) vs off (the
    # pre-27cda58 direct write), on the same 10x batch.
    big = rows * 10
    df10 = spark.range(big).select(
        F.concat(F.lit("line_"), F.col("id")).alias("__key"),
        (F.col("id") % 3 + 1).cast("long").alias("__nd_b"),
    )
    df10.localCheckpoint()  # materialize the source once

    def _write_files(e: int) -> int:
        return _files(os.path.join(st.loc, f"epoch={e}"))

    t0 = time.time()
    st.write_epoch(df10, epochs + 10)
    clustered_s = time.time() - t0
    clustered_files = _write_files(epochs + 10)

    # the unclustered variant: same INSERT OVERWRITE, no repartition —
    # Spark's bucketed write then emits one file per (task x bucket)
    v = f"__{st.table}_probe_unclustered"
    df10.createOrReplaceTempView(v)
    t0 = time.time()
    spark.sql(
        f"INSERT OVERWRITE TABLE {st.table}"
        f" PARTITION (epoch={epochs + 11})"
        f" SELECT `__key`, `__nd_b` FROM {v}"
    )
    unclustered_s = time.time() - t0
    unclustered_files = _write_files(epochs + 11)
    spark.catalog.dropTempView(v)

    out["write_epoch_10x"] = {
        "batch_rows": big,
        "clustered": {"wall_s": round(clustered_s, 3),
                      "files": clustered_files},
        "unclustered": {"wall_s": round(unclustered_s, 3),
                        "files": unclustered_files},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
