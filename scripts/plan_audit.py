"""Registry-wide physical-plan audit: plan every workload query at the
given SF (no execution beyond what a query function itself performs to
PLAN — e.g. index builds) and count the join strategies in the physical
plan. Flags: any CartesianProduct; > 2 BroadcastNestedLoopJoin or > 4
SortMergeJoin per query (the intended-SMJ ceiling from the round-4
audit). One JSON line per flagged query, a summary table at the end.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_spark import workload
from vectorsearch_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    totals = {"CartesianProduct": 0, "SortMergeJoin": 0,
              "BroadcastNestedLoopJoin": 0, "BroadcastHashJoin": 0}
    flagged = []
    errors = []
    for name, fn in workload.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            errors.append((name, repr(e)[:120]))
            continue
        counts = {k: len(re.findall(rf"\b{k}\b", plan)) for k in totals}
        for k, v in counts.items():
            totals[k] += v
        if counts["CartesianProduct"] or counts["BroadcastNestedLoopJoin"] > 2 \
                or counts["SortMergeJoin"] > 4:
            flagged.append({"query": name, **counts})
            print(json.dumps(flagged[-1]))
    print(json.dumps({"totals": totals, "n_flagged": len(flagged),
                      "n_errors": len(errors)}))
    for name, err in errors:
        print(f"ERROR {name}: {err}")


if __name__ == "__main__":
    main()
