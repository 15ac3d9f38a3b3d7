"""Run NAMED registry entries vs their oracles (same
normalize/compare as scripts/check_all.py). Usage:
python scripts/check_names.py name1 name2 ..."""
import importlib.util
import os
import sys
import time

sys.path.insert(0, "/root/repo")
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
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
    names = sys.argv[1:]
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
    for name in names:
        t0 = time.time()
        try:
            got = norm(qs[name](spark, SF).toPandas())
            if name not in osql:
                print(f"{name}: rows-only rows={len(got)} ({time.time()-t0:.1f}s)", flush=True)
                continue
            exp = norm(con.sql(osql[name]).df())
            ok = (
                got.shape == exp.shape
                and list(got.columns) == list(exp.columns)
                and got.equals(exp)
            )
            print(f"{name}: rows={len(got)} match={ok} ({time.time()-t0:.1f}s)", flush=True)
            if not ok:
                bad.append(name)
                if got.shape != exp.shape:
                    print(f"  shape got={got.shape} exp={exp.shape}")
                elif list(got.columns) != list(exp.columns):
                    print(f"  cols got={list(got.columns)} exp={list(exp.columns)}")
                else:
                    neq = (got != exp) & ~(got.isna() & exp.isna())
                    rows = neq.any(axis=1)
                    print("  first diffs:")
                    print(got[rows].head(3))
                    print(exp[rows].head(3))
        except Exception as e:
            import traceback
            traceback.print_exc()
            bad.append(name)
    print("FAILED:" if bad else "ALL GREEN", bad, flush=True)


if __name__ == "__main__":
    main()
