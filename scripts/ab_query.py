"""Interleaved A/B timing, robust to this host's bursty throttling.

`python scripts/ab_query.py name1,name2 --rounds 3` alternates
OLD (CreateArray-per-element literals) and NEW (single-Literal numpy
arrays) implementations of ``functions.litarrays`` WITHIN one session,
so a host-speed swing hits both arms of the comparison, and reports
per-arm medians. The OLD arm monkeypatches the helper back to the
element-wise form in every module that imported it.

This only A/Bs the wave-1 literal change; for other optimizations use
time_query.py back-to-back (same minutes) instead.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def old_lit_double_array(values):
    return F.array(*[F.lit(float(x)) for x in values])


def old_lit_int_array(values):
    return F.array(*[F.lit(int(x)) for x in values])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from vectorsearch_spark import workload
    from vectorsearch_spark.functions import litarrays
    from vectorsearch_spark.operators import knn, similarity
    from vectorsearch_spark.session import get_spark

    new_d, new_i = litarrays.lit_double_array, litarrays.lit_int_array

    def set_impl(new: bool) -> None:
        d = new_d if new else old_lit_double_array
        i = new_i if new else old_lit_int_array
        for mod in (similarity, knn):
            if hasattr(mod, "lit_double_array"):
                mod.lit_double_array = d
            if hasattr(mod, "lit_int_array"):
                mod.lit_int_array = i

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_GRAFT_MEDIA_DOCS", "1250")
    spark = get_spark("vs_ab", cpus=cpus)
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    registry = dict(workload.queries())

    for name in args.names.split(","):
        fn = registry[name.strip()]
        # one warm rep per arm so codegen caches are populated for both
        for new in (False, True):
            set_impl(new)
            fn(spark, args.sf).collect()
        res = {"old": [], "new": []}
        for _ in range(args.rounds):
            for new in (False, True):
                set_impl(new)
                t0 = time.time()
                fn(spark, args.sf).collect()
                res["new" if new else "old"].append(time.time() - t0)
        om, nm = statistics.median(res["old"]), statistics.median(res["new"])
        print(
            f"{name}: old={om:.3f}s new={nm:.3f}s ({om/nm:.2f}x) "
            f"old_samples={[round(s,2) for s in res['old']]} "
            f"new_samples={[round(s,2) for s in res['new']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
