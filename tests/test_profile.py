"""Table-profiling operator: correctness of per-column stats and the
one-pass plan contract."""

from __future__ import annotations

from vectorsearch_spark.operators.profile import profile_table


def _rows_by_col(rows):
    return {r["column"]: r for r in rows}


def test_profile_stats_and_null_column(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (3, "a", None), (4, None, None)],
        "id long, s string, z string",
    )
    p = _rows_by_col(profile_table(df).collect())
    assert p["id"]["n_rows"] == 4 and p["id"]["n_null"] == 0
    assert p["id"]["n_distinct"] == 4
    assert p["id"]["min_value"] == "1" and p["id"]["max_value"] == "4"
    assert p["s"]["n_null"] == 1 and p["s"]["n_distinct"] == 2
    assert p["s"]["min_value"] == "a" and p["s"]["max_value"] == "b"
    # all-NULL column: zero distincts, NULL min/max
    assert p["z"]["n_null"] == 4 and p["z"]["n_distinct"] == 0
    assert p["z"]["min_value"] is None and p["z"]["max_value"] is None


def test_profile_is_one_pass(spark):
    """No per-column UNION of scans: the plan contains exactly one scan
    of the input and no Union node."""
    df = spark.createDataFrame(
        [(i, str(i % 3), float(i)) for i in range(100)],
        "a long, b string, c double",
    )
    prof = profile_table(df)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1
    p = _rows_by_col(prof.collect())
    assert p["c"]["n_distinct"] == 100


def test_profile_approx_mode_close(spark):
    df = spark.range(0, 5000).selectExpr("id", "CAST(id % 701 AS STRING) AS s")
    p = _rows_by_col(
        profile_table(df, exact_distinct=False).collect()
    )
    assert abs(p["s"]["n_distinct"] - 701) / 701 < 0.05
    assert abs(p["id"]["n_distinct"] - 5000) / 5000 < 0.05


# --- incremental rollup maintenance (operators/incremental.py) ---


def test_incremental_rollup_merge_equals_full_recompute(spark):
    from vectorsearch_spark.operators.incremental import (
        finalize_rollup,
        merge_rollup_states,
        rollup_state,
    )

    rows = [(i % 5, float(i) if i % 7 else None, i) for i in range(200)]
    df = spark.createDataFrame(rows, "g long, v double, seq long")
    keys = ["g"]
    # three arbitrary batches, including one batch that misses group 4
    b1 = df.where("seq < 80")
    b2 = df.where("seq >= 80 and seq < 81")
    b3 = df.where("seq >= 81")
    merged = finalize_rollup(
        merge_rollup_states(
            [rollup_state(b, keys, "v") for b in (b1, b2, b3)], keys
        ),
        keys,
    )
    full = finalize_rollup(rollup_state(df, keys, "v"), keys)
    key = lambda r: r["g"]
    got = sorted(merged.collect(), key=key)
    exp = sorted(full.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_incremental_rollup_all_null_group(spark):
    from vectorsearch_spark.operators.incremental import (
        finalize_rollup,
        merge_rollup_states,
        rollup_state,
    )

    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 3.0)], "g long, v double"
    )
    out = {
        r["g"]: r
        for r in finalize_rollup(
            merge_rollup_states([rollup_state(df, ["g"], "v")], ["g"]), ["g"]
        ).collect()
    }
    assert out[1]["n_rows"] == 0 and out[1]["avg"] is None
    assert out[1]["total"] is None and out[1]["vmin"] is None
    assert out[2]["n_rows"] == 1 and out[2]["avg"] == 3.0


def test_incremental_merge_shuffles_state_not_rows(spark):
    """The merge plan's final aggregate reads the two state tables, not
    the raw batches: both inputs to the top HashAggregate are aggregates
    themselves (partial states), proving O(|groups|) merge input."""
    from vectorsearch_spark.operators.incremental import (
        merge_rollup_states,
        rollup_state,
    )

    df = spark.createDataFrame([(i % 3, float(i)) for i in range(100)], "g long, v double")
    s1 = rollup_state(df.where("v < 50"), ["g"], "v")
    s2 = rollup_state(df.where("v >= 50"), ["g"], "v")
    merged = merge_rollup_states([s1, s2], ["g"])
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    # the union children are Aggregates (states), not raw relations
    assert plan.count("Aggregate") >= 3, plan


def test_incremental_distinct_merge_identical_to_single_pass(spark):
    """HLL register merge is exact: merging per-batch sketches must give
    the IDENTICAL estimate as one sketch over all rows — and land within
    5% of the true distinct count."""
    from vectorsearch_spark.operators.incremental import (
        distinct_state,
        finalize_distinct,
        merge_distinct_states,
    )

    df = spark.range(0, 30000).selectExpr(
        "id % 4 AS g", "CAST(id % 1777 AS STRING) AS v", "id"
    )
    keys = ["g"]
    batches = [df.where(f"id % 3 = {i}") for i in range(3)]
    merged = {
        r["g"]: r["n_distinct_est"]
        for r in finalize_distinct(
            merge_distinct_states(
                [distinct_state(b, keys, "v") for b in batches], keys
            ),
            keys,
        ).collect()
    }
    single = {
        r["g"]: r["n_distinct_est"]
        for r in finalize_distinct(distinct_state(df, keys, "v"), keys).collect()
    }
    assert merged == single
    for g, est in merged.items():
        true = df.where(f"g = {g}").select("v").distinct().count()
        assert abs(est - true) / true < 0.05, (g, est, true)
