"""Frontier-state scale probe: per-fold cost vs STATE size, plain
layout vs bucketed layout (operators/urls.py fold_url_dedup_batch
``state_buckets``).

The claim under test (the 100 TB story of the bucketed layout): a
fold's anti-join must not RE-SHUFFLE the accepted-url state — with
bucketed state the only exchange is the batch side, so the per-fold
shuffle volume is O(batch) and stays flat as state grows; the plain
layout's state side is exchanged in full at every fold, so its shuffle
volume grows with the state. Wall time on one host understates the
difference (a local "shuffle" is a memory/disk copy, not a network
transfer), which is why this probe reports SHUFFLE WRITE BYTES for the
timed fold alongside wall — bytes are the quantity that becomes
network at cluster scale.

Usage: python scripts/frontier_probe.py [small_state_rows] [factor]
(defaults 2_000_000 and 10; batch is fixed at 100_000 rows). Prints
one JSON line per (mode, state_size) with wall seconds and shuffle
write bytes of the timed fold, and a summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _urls(spark, n: int, start: int = 0):
    # pre-canonical urls (no dups with each other); ids = url index
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("http://h"), (F.col("id") % 9973).cast("string"),
            F.lit(".example.com/p/"), F.col("id").cast("string"),
        ).alias("url"),
    )


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes across all stages so far, via the UI
    REST API (the one externally-supported route to stage metrics)."""
    import json as _json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        data = _json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages")
        )
        return int(sum(s.get("shuffleWriteBytes", 0) for s in data))
    except Exception:
        return -1


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    batch_n = 100_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "true")  # REST metrics source
        .config("spark.ui.port", "4047")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from vectorsearch_spark.operators.urls import (
        _frontier_table,
        fold_url_dedup_batch,
    )

    results = []
    for mode, buckets in (("plain", None), ("bucketed", 32)):
        for tag, state_n in (("1x", small), (f"{factor}x", small * factor)):
            state = os.path.join(
                tempfile.gettempdir(), f"frontier_probe_{mode}_{tag}"
            )
            shutil.rmtree(state, ignore_errors=True)
            spark.sql(f"DROP TABLE IF EXISTS {_frontier_table(state)}")
            os.makedirs(state, exist_ok=True)
            # epoch 0 builds the state (untimed)
            fold_url_dedup_batch(
                _urls(spark, state_n), 0, state, state_buckets=buckets
            )
            # timed: ONE fold of a fixed-size batch (half dup vs state)
            batch = _urls(spark, batch_n, start=state_n - batch_n // 2)
            b0 = _shuffle_write_bytes(spark)
            t0 = time.time()
            fold_url_dedup_batch(batch, 1, state, state_buckets=buckets)
            wall = time.time() - t0
            sw = _shuffle_write_bytes(spark)
            rec = {
                "mode": mode,
                "state_rows": state_n,
                "batch_rows": batch_n,
                "fold_sec": round(wall, 2),
                "shuffle_write_bytes": (sw - b0) if sw >= 0 and b0 >= 0 else None,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
            shutil.rmtree(state, ignore_errors=True)
            spark.sql(f"DROP TABLE IF EXISTS {_frontier_table(state)}")

    by = {(r["mode"], r["state_rows"]) for r in results}
    assert len(by) == 4
    g = {(r["mode"], r["state_rows"] == small): r for r in results}
    summary = {
        "plain_shuffle_growth": (
            None
            if g[("plain", False)]["shuffle_write_bytes"] is None
            else round(
                g[("plain", False)]["shuffle_write_bytes"]
                / max(g[("plain", True)]["shuffle_write_bytes"], 1),
                2,
            )
        ),
        "bucketed_shuffle_growth": (
            None
            if g[("bucketed", False)]["shuffle_write_bytes"] is None
            else round(
                g[("bucketed", False)]["shuffle_write_bytes"]
                / max(g[("bucketed", True)]["shuffle_write_bytes"], 1),
                2,
            )
        ),
        "plain_wall_growth": round(
            g[("plain", False)]["fold_sec"] / max(g[("plain", True)]["fold_sec"], 1e-9), 2
        ),
        "bucketed_wall_growth": round(
            g[("bucketed", False)]["fold_sec"]
            / max(g[("bucketed", True)]["fold_sec"], 1e-9),
            2,
        ),
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
