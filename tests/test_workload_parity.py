"""Every queries() entry must hash-match its oracle_sql() — the local
mirror of the driver's t2 correctness gate (run here at sf0.001)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches, duck_con
from vectorsearch_spark import workload


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(workload.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, con, name):
    oracles = workload.oracle_sql()
    df = workload.queries()[name](spark, sf_dir)
    if name not in oracles:
        # rows-only contract (approximate operators): non-empty + stable schema
        assert df.count() > 0, f"{name}: rows-only query returned no rows"
        return
    assert_matches(df, con, oracles[name], name)


def test_hll_sketch_within_tolerance_of_exact(spark, sf_dir):
    """HLL sketch distinct counts (hll_sketch_agg/hll_sketch_estimate —
    Spark 3.5+ DataSketches surface) vs the oracle-checked exact
    counts: ≤5% relative error per event_type. Sketch bytes are
    engine-specific so the sketch itself can't hash-compare; this gate
    plus the exact twin (events_distinct_users) covers the operator."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.workload import _events, events_distinct_users

    ev = _events(spark, sf_dir)
    approx = {
        r["event_type"]: r["n_approx"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n_approx")
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in events_distinct_users(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)


def test_q19_disjunctive_pushdown_reaches_scans(spark, sf_dir):
    """Regression guard for the Q19 shape: the per-table implications
    of the OR-of-ANDs must appear as data filters on BOTH scans (the
    quantity-range union on lineitem, the brand/size disjunction on
    part) — losing them silently reverts to scanning everything."""
    from vectorsearch_spark.workload import q19_discount_revenue

    plan = (
        q19_discount_revenue(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    li_scan = next(l for l in scans if "lineitem" in l)
    part_scan = next(l for l in scans if "part.parquet" in l)
    assert "l_quantity" in li_scan
    assert "p_brand" in part_scan and "p_size" in part_scan


def test_q21_shared_late_plan_reused_at_runtime(spark):
    """The q21 semi+anti stack derives both its driving side and its
    anti build from ONE `late` subplan; at runtime AQE must reuse the
    shared exchange instead of recomputing it (sf0.01 — at sf0.001 the
    result is empty and AQE collapses stages to EmptyRelation before
    any reuse can appear)."""
    from vectorsearch_spark.workload import q21_suppliers_kept_waiting

    df = q21_suppliers_kept_waiting(spark, "/root/testdata/sf0.01")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_approx_percentile_within_tolerance_of_exact(spark, sf_dir):
    """approx_percentile (map-combinable sketch — the documented scale
    path for price_percentiles) vs the oracle-checked exact sort-based
    percentiles: ≤1% relative error per (group, quantile). The sketch
    is engine-specific so it cannot hash-compare; this gate plus the
    exact twin covers the operator (the HLL pattern)."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.workload import _t, price_percentiles

    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in price_percentiles(spark, sf_dir).collect()
    }
    li = _t(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: r["qs"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], 10000
            ).alias("qs")
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, es in exact.items():
        for q, e, a in zip([0.5, 0.9, 0.99], es, approx[flag]):
            assert abs(a - e) <= 0.01 * abs(e) + 1e-9, (flag, q, a, e)


def test_variant_cast_semantics_pinned_cross_engine(spark):
    """The EVENTS_VARIANT_SQL oracle hand-mirrors Spark's
    try_variant_get(v, '$.k', 'int') cast per JSON type. Pin that
    mapping over an adversarial corpus (JSON null, missing key,
    truncating double, quoted integral/decimal/garbage strings,
    booleans, int32 overflow) so either engine drifting breaks HERE,
    not silently in the hash gate once real data exercises a case."""
    import duckdb
    from pyspark.sql import functions as F

    corpus = [
        '{"k": 5}', '{"k": -7}', '{"k": 5.7}', '{"k": -5.7}', '{"k": 5.0}',
        '{"k": "5"}', '{"k": "-12"}', '{"k": "5.7"}', '{"k": "abc"}',
        '{"k": null}', '{}', '{"k": true}', '{"k": false}',
        '{"k": 2147483648}', '{"k": 2147483647}', 'not json', None,
    ]
    df = spark.createDataFrame([(p,) for p in corpus], "props string")
    got = [
        r["k"]
        for r in df.select(
            F.try_variant_get(F.try_parse_json("props"), "$.k", "int").alias("k")
        ).collect()
    ]

    con = duckdb.connect()
    case = """
      CASE json_type(props, '$.k')
        WHEN 'UBIGINT' THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
        WHEN 'BIGINT'  THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
        WHEN 'DOUBLE'  THEN TRY_CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS INTEGER)
        WHEN 'VARCHAR' THEN CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
                                 THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END
        WHEN 'BOOLEAN' THEN CASE WHEN json_extract_string(props, '$.k') = 'true' THEN 1 ELSE 0 END
      END
    """
    exp = [
        con.execute(
            f"SELECT {case} FROM (SELECT TRY_CAST(? AS JSON) AS props)", [p]
        ).fetchone()[0]
        for p in corpus
    ]
    assert got == exp, list(zip(corpus, got, exp))
