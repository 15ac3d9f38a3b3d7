"""Exact-value compare of workload queries against their DuckDB oracles,
mirroring the driver's hash gate (columns sorted by name, rows sorted,
values compared EXACTLY after the query's own rounding).

Usage: python scripts/check_exact.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle import _normalize, duck_con
from vectorsearch_spark import workload
from vectorsearch_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(workload.oracle_sql())
    spark = get_spark("check_exact", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duck_con(sf_dir)
    qs, oracles = workload.queries(), workload.oracle_sql()
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        got = _normalize(qs[name](spark, sf_dir).toPandas())
        exp = _normalize(con.sql(oracles[name]).df())
        status = "OK"
        if len(got) != len(exp):
            status = f"ROWS {len(got)} != {len(exp)}"
        elif list(got.columns) != list(exp.columns):
            status = f"SCHEMA {list(got.columns)} != {list(exp.columns)}"
        else:
            for c in got.columns:
                gv, ev = got[c].tolist(), exp[c].tolist()

                def _ne(g, e):
                    # Byte-level compare, mirroring the driver's hash:
                    # −0.0 != +0.0 here even though they compare == .
                    if isinstance(g, float) and isinstance(e, float):
                        return struct.pack("<d", g) != struct.pack("<d", e)
                    return g != e and not (g != g and e != e)

                bad = [
                    (i, g, e) for i, (g, e) in enumerate(zip(gv, ev)) if _ne(g, e)
                ]
                if bad:
                    i, g, e = bad[0]
                    status = f"VALUE col={c} row={i}: {g!r} != {e!r} ({len(bad)} diffs)"
                    break
        print(f"{name}: {status}")
        if status != "OK":
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} exact-match; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
