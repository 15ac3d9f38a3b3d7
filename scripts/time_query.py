"""Standalone per-entry measurement for the optimization loop:
`python scripts/time_query.py name1,name2 [--reps N] [--explain DIR]`
runs each named registry/bench entry on a fresh local[32] session with
one untimed warm rep, reports median/min of N timed reps (the bench's
own methodology, minus suite-position effects), and optionally writes
`<DIR>/<name>.txt` with the df.explain("formatted") output so plan
claims are recorded, not remembered.

The timed action is the bench's `df.collect()` so numbers stay
comparable with BENCH_DETAIL.json; pass --noop to time the
noop-sink action instead (guide §1.4) when the collect itself is the
suspected cost.
"""

import argparse
import importlib.util
import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated entry names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for plan files")
    ap.add_argument("--suffix", default="", help="plan filename suffix (_before/_after)")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from vectorsearch_spark import workload
    from vectorsearch_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    os.environ.setdefault("SPARK_GRAFT_MEDIA_DOCS", "1250")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("vs_time_query", cpus=cpus)
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    registry = dict(workload.queries())
    registry.update({k: v for k, v in bench.EXTRA.items() if v is not None})

    def action(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    for name in args.names.split(","):
        name = name.strip()
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"time_query:{name}")
        action(fn(spark, args.sf))  # warm rep, untimed
        samples = []
        for _ in range(args.reps):
            t0 = time.time()
            action(fn(spark, args.sf))
            samples.append(time.time() - t0)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        print(
            f"{name}: median={statistics.median(samples):.3f}s "
            f"min={min(samples):.3f}s samples={[round(s, 3) for s in samples]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
