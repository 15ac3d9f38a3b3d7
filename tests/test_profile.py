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


def test_validate_rules_single_pass_and_null_semantics(spark):
    """Rules evaluate in ONE aggregate job; NULL predicate results
    count as violations (an unevaluable check did not pass)."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.profile import validate_rules

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -1.0, None), (3, None, "c"), (4, 5.0, "d")],
        "id long, amount double, tag string",
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["pass_rate"])
        for r in validate_rules(
            df,
            {
                "amount_pos": F.col("amount") > 0,      # NULL amount -> violation
                "tag_present": F.col("tag").isNotNull(),
                "id_unique_ish": F.col("id") <= 4,
            },
        ).collect()
    }
    assert out["amount_pos"] == (4, 2, 0.5)
    assert out["tag_present"] == (4, 1, 0.75)
    assert out["id_unique_ish"] == (4, 0, 1.0)
    # plan shape: one aggregate, no per-rule scan loop
    plan = validate_rules(df, {"a": F.col("id") > 0})._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate_rules(df, {})


def test_psi_drift_model_and_empty_side(spark):
    """PSI terms vs a NumPy model; identical distributions give ~0;
    an empty side degrades to the eps floor (finite, maximal) instead
    of a divide-by-zero."""
    import numpy as np

    from vectorsearch_spark.operators.profile import psi_drift

    rng = np.random.default_rng(13)
    a = rng.uniform(0, 100, 3000)
    b = np.concatenate([rng.uniform(0, 100, 1500), rng.uniform(50, 100, 1500)])
    dfa = spark.createDataFrame([(float(x),) for x in a], "v double")
    dfb = spark.createDataFrame([(float(x),) for x in b], "v double")
    rows = psi_drift(dfa, dfb, "v", 0.0, 100.0, bins=5).collect()
    assert [r["bin"] for r in rows] == [0, 1, 2, 3, 4]

    def model(x, y):
        eps = 1e-6
        ca = np.histogram(np.clip(x, 0, 99.999), bins=5, range=(0, 100))[0]
        cb = np.histogram(np.clip(y, 0, 99.999), bins=5, range=(0, 100))[0]
        pa, pb = ca / ca.sum() + eps, cb / cb.sum() + eps
        return (pa - pb) * np.log(pa / pb)

    exp = model(a, b)
    for r, e in zip(rows, exp):
        assert abs(r["psi_term"] - e) < 1e-5, (r, e)
    assert sum(r["psi_term"] for r in rows) > 0.1  # drift injected

    same = psi_drift(dfa, dfa, "v", 0.0, 100.0, bins=5).collect()
    assert all(abs(r["psi_term"]) < 1e-9 for r in same)

    empty = spark.createDataFrame([], "v double")
    er = psi_drift(dfa, empty, "v", 0.0, 100.0, bins=5).collect()
    assert all(r["n_b"] == 0 for r in er)
    assert all(np.isfinite(r["psi_term"]) for r in er)


def test_exact_quantiles_matches_sorted_model(spark):
    """Histogram-selection quantiles ≡ rank ceil(p·n) of the fully
    sorted group, incl. a constant-value group, p=1.0 (max), ties, and
    null exclusion."""
    import math
    import random
    from collections import defaultdict

    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.profile import exact_quantiles

    random.seed(11)
    rows = [(i, f"t{i % 4}", round(random.gauss(50, 20), 3)) for i in range(4000)]
    rows += [(100000 + i, "flat", 7.0) for i in range(9)]
    rows += [(200000 + i, "t0", 50.0) for i in range(100)]  # tie block
    rows += [(300000, "t1", None)]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(16)
    probs = [0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in exact_quantiles(df, "v", probs, "g", bins=32).collect()
    }
    vals = defaultdict(list)
    for _, g, v in rows:
        if v is not None:
            vals[g].append(v)
    assert len(got) == len(vals) * len(probs)
    for g, vs in vals.items():
        vs.sort()
        for p in probs:
            r = max(1, math.ceil(p * len(vs)))
            assert got[(g, p)] == vs[r - 1], (g, p)

    import pytest

    with pytest.raises(ValueError, match="probs"):
        exact_quantiles(df, "v", [0.5, 1.5], "g")


def test_exact_quantiles_nan_scores_and_typed_empty_schema(spark):
    """NaN values must not poison min/max or inflate counts, and the
    empty-input result must carry the INPUT's group column type, not a
    hardcoded string (ADVICE r8)."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.profile import exact_quantiles

    rows = [(i, 7, float(i)) for i in range(50)]
    dirty = rows + [(100, 7, float("nan")), (101, 7, None)]
    df = spark.createDataFrame(dirty, "id long, g int, v double").repartition(4)
    probs = [0.5, 1.0]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in exact_quantiles(df, "v", probs, "g", bins=8).collect()
    }
    vals = defaultdict(list)
    for _, g, v in rows:
        vals[g].append(v)
    for g, vs in vals.items():
        vs.sort()
        for p in probs:
            r = max(1, math.ceil(p * len(vs)))
            assert got[(g, p)] == vs[r - 1], (g, p)

    # int group col, empty input → group column stays IntegerType, so
    # unions with the non-empty path's schema work
    empty = spark.createDataFrame([], "id long, g int, v double")
    out = exact_quantiles(empty, "v", [0.5], "g")
    assert out.count() == 0
    assert out.schema["g"].dataType.simpleString() == "int"
    nonempty_schema = exact_quantiles(df, "v", [0.5], "g").schema
    assert [f.dataType for f in out.schema] == [f.dataType for f in nonempty_schema]
