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


def test_phase_timers_cover_build_vacuum_compact(spark, tmp_path_factory):
    """Per-phase maintenance histograms (the util/Metrics.java:20-45
    analog): a full build → delete → vacuum → compact lifecycle must
    record a wall_ms + calls pair for every phase, so a regression
    like r5's index_build slowdown localizes to a phase in-round."""
    import numpy as np

    from vectorsearch_spark.config import IndexConfig
    from vectorsearch_spark.index import VectorIndex

    path = str(tmp_path_factory.mktemp("phm")) + "/idx"
    rng = np.random.default_rng(3)
    rows = [(i, [float(v) for v in rng.normal(size=8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cfg = IndexConfig(
        name="phm", dimension=8, max_segment_size=20, pq_m=4, pq_k=4,
        graph_degree=4, graph_build_breadth=8, oversample=2, seed=1,
    )
    reg = get_metrics(spark)
    reg.reset()
    idx = VectorIndex.create(spark, path, cfg)
    idx.add(df, order_col="vec_id")
    idx.build()
    idx.delete(list(range(0, 15)))
    idx.vacuum(0, force=True)
    idx.compact(sorted(idx.registered_seg_ids(("SEALED",)))[:2])
    snap = reg.snapshot()
    for ph in (
        "index.build.write",
        "index.build.seal",
        "index.vacuum.vectors_rewrite",
        "index.vacuum.artifacts_rewrite",
        "index.compact.copy",
        "index.compact.rebuild",
        "index.compact.swap",
    ):
        assert snap.get(f"{ph}.calls", 0) >= 1, f"missing phase {ph}: {snap}"
        assert f"{ph}.wall_ms" in snap, f"missing timer {ph}"
