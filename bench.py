"""Benchmark harness: runs the headline workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectorsearch_spark import workload
from vectorsearch_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_hourly_rollup",
    "top_customers_per_nation",
    "knn_l2_batch",
    "knn_cosine_batch",
]

# Heavier end-to-end jobs (index build + sealed search) are appended by
# name when implemented; each callable takes (spark, sf_dir) and its
# result is fully materialized.
EXTRA: dict = {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("vectorsearch_spark_bench", cpus=cpus)

    # warm up the JVM + parquet footers so per-query timings measure the work
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    registry = dict(workload.queries())
    registry.update(EXTRA)
    timings: dict[str, float] = {}
    for name in HEADLINE + list(EXTRA):
        fn = registry[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "workload_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
