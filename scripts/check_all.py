"""Full driver-contract sweep: run EVERY registry query against its
DuckDB oracle at sf0.01 (the same normalize/compare the external
driver applies), printing one line per query and a final summary.
Usage: python scripts/check_all.py [start] [end]"""

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, osql = mod.queries(), mod.oracle_sql()
    bad = []
    for i, (name, fn) in enumerate(qs.items()):
        if not (start <= i < end):
            continue
        t0 = time.time()
        try:
            got = norm(fn(spark, SF).toPandas())
            if name not in osql:
                print(f"{i:3d} {name}: rows-only rows={len(got)} ({time.time()-t0:.1f}s)", flush=True)
                continue
            exp = norm(con.sql(osql[name]).df())
            ok = (
                got.shape == exp.shape
                and list(got.columns) == list(exp.columns)
                and got.equals(exp)
            )
            print(f"{i:3d} {name}: rows={len(got)} match={ok} ({time.time()-t0:.1f}s)", flush=True)
            if not ok:
                bad.append(name)
        except Exception as e:
            print(f"{i:3d} {name}: ERROR {type(e).__name__}: {e}", flush=True)
            bad.append(name)
    print("FAILED:" if bad else "ALL GREEN", bad, flush=True)


if __name__ == "__main__":
    main()
