"""Local mirror of the driver's DuckDB-oracle compare: row count, schema
shape, and order-insensitive value equality (columns sorted by name,
rows sorted), with small float tolerance."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB defaults to every host core; unbounded it thrashes against
    # the Spark session's 16 threads during the parity module (r13:
    # dedup_embedding_radius's all-pairs oracle read 8s solo vs 39s
    # in-suite from exactly this contention). 8 threads is plenty for
    # sf0.001 oracles and leaves Spark its headroom.
    con.sql("SET threads TO 8")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(con.sql(sql).df())
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            if isinstance(g, float) or isinstance(e, float):
                g, e = float(g), float(e)
                if math.isnan(g) and math.isnan(e):
                    continue
                assert math.isclose(g, e, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}: col {c} row {i}: {g} != {e}"
                )
            else:
                assert g == e, f"{name}: col {c} row {i}: {g!r} != {e!r}"
