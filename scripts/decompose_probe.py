"""Where does a registry entry's time actually go? Splits one entry's
wall time into (a) fn() construction — driver-side collects, training,
plan building; (b) the action, and reports Spark job counts for each
phase via the status tracker. Usage:
python scripts/decompose_probe.py name [--reps 3]"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import importlib.util

    from vectorsearch_spark import workload
    from vectorsearch_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_MEDIA_DOCS", "1250")
    spark = get_spark("vs_decompose", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    registry = dict(workload.queries())
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    registry.update({k: v for k, v in bench.EXTRA.items() if v is not None})
    tracker = spark.sparkContext.statusTracker()

    for name in args.names.split(","):
        fn = registry[name.strip()]
        fn(spark, args.sf).collect()  # warm
        for _ in range(args.reps):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            ids0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = fn(spark, args.sf)
            t1 = time.time()
            ids1 = set(tracker.getJobIdsForGroup(None) or [])
            df.collect()
            t2 = time.time()
            ids2 = set(tracker.getJobIdsForGroup(None) or [])
            print(
                f"{name}: construct={t1-t0:.3f}s ({len(ids1-ids0)} jobs) "
                f"action={t2-t1:.3f}s ({len(ids2-ids1)} jobs)",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
