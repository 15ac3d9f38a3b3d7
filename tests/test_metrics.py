"""Observability tests — mirrors the reference's metric assertions
(api/VectorIndexTest.java:624-665: run an operation, assert the named
counters moved)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_spark.metrics import Metrics, get_metrics


def test_observe_records_query_counters(spark, sf_dir):
    m = Metrics()
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = m.observe("orders_by_status", df)
    assert len(rows) > 0
    snap = m.snapshot()
    assert snap["queries_total"] == 1
    assert snap["orders_by_status.rows_out"] == len(rows)
    assert snap["orders_by_status.wall_ms"] >= 0
    # the scan really read the table, and the groupBy really shuffled
    assert snap.get("orders_by_status.scan_rows", 0) > 0
    assert snap.get("orders_by_status.scan_bytes", 0) > 0
    assert snap.get("orders_by_status.shuffle_count", 0) >= 1
    assert "orders_by_status.harvest_errors" not in snap


def test_observe_accumulates_across_queries(spark, sf_dir):
    m = Metrics()
    df = spark.read.parquet(f"{sf_dir}/region.parquet").select("r_regionkey")
    m.observe("q", df)
    m.observe("q", df)
    assert m.get("queries_total") == 2
    assert m.get("q.rows_out") == 2 * df.count()


def test_session_registry_attached(spark):
    reg = get_metrics(spark)
    assert isinstance(reg, Metrics)
    assert get_metrics(spark) is reg  # stable per session
