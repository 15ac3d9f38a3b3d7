"""Z-order clustering: z-value model correctness and the actual
data-skipping payoff (row-group pruning reads fewer rows from a
z-clustered layout than from an unclustered one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.layout import (
    cluster_by_zorder,
    compute_bounds,
    zorder_value,
)


def _py_quant(v: float, lo: float, hi: float, bits: int) -> int:
    n = (1 << bits) - 1
    import math

    s = int(math.floor((v - lo) / (hi - lo) * (n + 1)))
    return max(0, min(s, n))


def _py_z(vals: dict[str, float], bounds: dict[str, tuple[float, float]], bits: int) -> int:
    names = list(bounds)
    q = {c: _py_quant(vals[c], *bounds[c], bits=bits) for c in names}
    z = 0
    for i in range(bits):
        for j, c in enumerate(names):
            z |= ((q[c] >> i) & 1) << (i * len(names) + j)
    return z


def test_zorder_value_matches_python_model(spark):
    bounds = {"x": (0.0, 100.0), "y": (-50.0, 50.0)}
    rows = [
        (i, float(i % 101), float((i * 7) % 101 - 50)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r["id"]: r["z"]
        for r in df.select("id", zorder_value(bounds, bits=8).alias("z")).collect()
    }
    for i, x, y in rows:
        assert got[i] == _py_z({"x": x, "y": y}, bounds, 8), (i, x, y)


def test_zorder_locality_beats_single_sort(spark):
    """A square query-rectangle must touch FEWER range-partitions of the
    z-layout than of a layout sorted on x alone (the single-sort layout
    slices the square across ~all partitions on the unsorted axis)."""
    rows = [(i, float(i % 256), float((i * 97) % 256)) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    bounds = {"x": (0.0, 256.0), "y": (0.0, 256.0)}
    zdf = (
        df.withColumn("__z", zorder_value(bounds, bits=8))
        .repartitionByRange(16, "__z")
        .withColumn("pid", F.spark_partition_id())
    )
    xdf = df.repartitionByRange(16, "x").withColumn("pid", F.spark_partition_id())
    rect = (F.col("x") >= 32) & (F.col("x") < 64) & (F.col("y") >= 32) & (F.col("y") < 64)
    z_parts = zdf.where(rect).select("pid").distinct().count()
    x_parts = xdf.where(rect).select("pid").distinct().count()
    assert z_parts < x_parts, (z_parts, x_parts)


def test_zorder_rowgroup_skipping_payoff(spark, tmp_path):
    """End-to-end skipping: write the SAME rows z-clustered and
    id-ordered with small row groups; a rectangle predicate must read
    (scan-node numOutputRows) far fewer rows from the z-layout."""
    from vectorsearch_spark.metrics import get_metrics

    n = 200_000
    rows = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.col("id") * 48271, F.lit(65536))).cast("double").alias("x"),
        (F.pmod(F.col("id") * 16807, F.lit(65536))).cast("double").alias("y"),
    )
    bounds = {"x": (0.0, 65536.0), "y": (0.0, 65536.0)}
    zpath, ipath = str(tmp_path / "z"), str(tmp_path / "i")
    spark.conf.set("spark.hadoop.parquet.block.size", str(64 * 1024))
    try:
        cluster_by_zorder(rows, bounds, bits=12, num_partitions=4).write.parquet(zpath)
        rows.repartitionByRange(4, "id").sortWithinPartitions("id").write.parquet(ipath)
    finally:
        spark.conf.unset("spark.hadoop.parquet.block.size")
    rect = "x >= 1000 and x < 5000 and y >= 1000 and y < 5000"
    m = get_metrics(spark)
    m.reset()
    m.observe("zread", spark.read.parquet(zpath).where(rect))
    m.observe("iread", spark.read.parquet(ipath).where(rect))
    snap = m.snapshot()
    z_rows, i_rows = snap["zread.scan_rows"], snap["iread.scan_rows"]
    assert snap["zread.rows_out"] == snap["iread.rows_out"] > 0
    # the id-ordered layout reads essentially everything; z-layout skips
    assert z_rows < i_rows / 2, (z_rows, i_rows)


def test_compute_bounds_and_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 5.0, -3.0), (2, 10.0, 7.0), (3, 0.0, 1.0)], "id long, x double, y double"
    )
    b = compute_bounds(df, ["x", "y"])
    assert b == {"x": (0.0, 10.0), "y": (-3.0, 7.0)}
    out = cluster_by_zorder(df, ["x", "y"], bits=4)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    assert out.columns == ["id", "x", "y"]


def test_bucketed_join_plans_zero_shuffle_exchanges(spark, sf_dir):
    """Two tables bucketed by the same key into the same bucket count
    join bucket-to-bucket: the executed JOIN subtree must contain NO
    shuffle exchange (the one-time-layout-cost-vs-per-query-shuffle
    trade the operator exists for)."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.layout import bucketed_join, write_bucketed

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("okey"), "l_quantity")
    )
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("okey"), "o_orderpriority")
    )
    write_bucketed(li, "tbkt_li", "okey", 4, sort_by=["okey"])
    write_bucketed(od, "tbkt_od", "okey", 4, sort_by=["okey"])
    try:
        j = bucketed_join(spark, "tbkt_li", "tbkt_od", "okey")
        n = j.count()
        assert n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # matches the plain join exactly
        plain = li.join(od, "okey")
        assert n == plain.count()
        assert j.groupBy().agg(F.sum("l_quantity")).first()[0] == \
            plain.groupBy().agg(F.sum("l_quantity")).first()[0]
    finally:
        spark.sql("DROP TABLE IF EXISTS tbkt_li")
        spark.sql("DROP TABLE IF EXISTS tbkt_od")


def test_write_bucketed_scrubs_catalog_location_not_convention(spark, tmp_path):
    """A pre-existing table at a CUSTOM location (external / non-default
    layout): write_bucketed must ask the catalog for the real location
    and scrub THAT — not blindly derive {wh}/{tbl} — so the custom dir
    leaves no leftovers and unrelated convention-path data survives
    (ADVICE r6)."""
    import os

    from vectorsearch_spark.operators.layout import write_bucketed

    custom = tmp_path / "custom_loc"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df.write.mode("overwrite").parquet(str(custom))
    spark.sql("DROP TABLE IF EXISTS tbkt_custom")
    spark.sql(
        f"CREATE TABLE tbkt_custom (k long, v string) USING parquet "
        f"LOCATION '{custom}'"
    )
    assert spark.table("tbkt_custom").count() == 2
    try:
        write_bucketed(df, "tbkt_custom", "k", 2)
        # the rewritten table reads back, bucketed
        assert spark.table("tbkt_custom").count() == 2
        # old custom-location leftovers were cleaned via the catalog path
        assert not os.path.exists(str(custom)) or not any(
            f.endswith(".parquet") for f in os.listdir(str(custom))
        ), "custom LOCATION left stale files behind"
    finally:
        spark.sql("DROP TABLE IF EXISTS tbkt_custom")
