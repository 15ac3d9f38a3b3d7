"""Bloom-filter semi-join pruning: exactness, pruning power, and
plan shape (the probe must run below any exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.joins import bloom_semi_join


def _fact_and_keys(spark):
    fact = spark.range(0, 20000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.createDataFrame(
        [(i * 13 % 997,) for i in range(40)] + [(None,)], "k long"
    )
    return fact, keys


def test_bloom_semi_join_exact_matches_plain_semi(spark):
    fact, keys = _fact_and_keys(spark)
    got = bloom_semi_join(fact, keys, on="k", m_bits=1 << 14).collect()
    exp = fact.join(keys.dropna(), "k", "left_semi").collect()
    assert sorted((r["k"], r["payload"]) for r in got) == sorted(
        (r["k"], r["payload"]) for r in exp
    )


def test_bloom_probe_has_no_false_negatives_and_prunes(spark):
    fact, keys = _fact_and_keys(spark)
    approx = bloom_semi_join(fact, keys, on="k", m_bits=1 << 14, exact=False)
    approx_keys = {r["k"] for r in approx.select("k").distinct().collect()}
    true_keys = {r["k"] for r in keys.dropna().collect()}
    # no false negatives: every true key survives the probe
    assert true_keys <= approx_keys
    # real pruning: the probe kills the overwhelming majority of the
    # 997 distinct fact keys (40 true keys; FP rate at this sizing ~0)
    assert len(approx_keys) < 100


def test_bloom_probe_is_below_any_exchange(spark):
    """The whole point: the Bloom filter must run on the fact scan side
    BEFORE a shuffle. With exact=False there must be NO exchange of the
    fact at all (literal bitmap + narrow filter only)."""
    fact, keys = _fact_and_keys(spark)
    approx = bloom_semi_join(fact, keys, on="k", m_bits=1 << 14, exact=False)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_bloom_tiny_bitmap_degrades_to_semi_join_result(spark):
    """An undersized bitmap (everything collides) must still be exact
    when exact=True — the semi join absorbs the FP flood."""
    fact, keys = _fact_and_keys(spark)
    got = bloom_semi_join(fact, keys, on="k", m_bits=64, k=2).collect()
    exp = fact.join(keys.dropna(), "k", "left_semi").collect()
    assert sorted((r["k"], r["payload"]) for r in got) == sorted(
        (r["k"], r["payload"]) for r in exp
    )


# --- salted_join (skew-hardened equi join) ---


def test_salted_join_matches_plain_join_under_skew(spark):
    from vectorsearch_spark.operators.joins import salted_join

    # one key holds ~50% of left rows
    left = spark.createDataFrame(
        [(i if i % 2 else 7, i) for i in range(2000)], "k long, payload long"
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 2000, 3)], "k long, attr string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in salted_join(left, right, "k", how=how, salt=8).collect()
        )
        exp = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in left.join(right, "k", how).collect()
        )
        assert got == exp, how


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in multiple shuffle partitions:
    the join key includes __salt (visible in the plan's partitioning)."""
    from vectorsearch_spark.operators.joins import salted_join

    left = spark.createDataFrame([(7, i) for i in range(100)], "k long, p long")
    right = spark.createDataFrame([(7, "x")], "k long, attr string")
    out = salted_join(left, right, "k", salt=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert sorted(r["p"] for r in out.collect()) == list(range(100))


def test_salted_join_rejects_outer(spark):
    from vectorsearch_spark.operators.joins import salted_join

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_bloom_semi_join_empty_key_set(spark):
    fact, _ = _fact_and_keys(spark)
    empty = spark.createDataFrame([], "k long")
    assert bloom_semi_join(fact, empty, on="k").count() == 0
    assert bloom_semi_join(fact, empty, on="k", exact=False).count() == 0


def test_bloom_semi_join_null_fact_keys(spark):
    fact = spark.createDataFrame([(None, 1), (2, 2)], "k long, payload long")
    keys = spark.createDataFrame([(2,)], "k long")
    got = bloom_semi_join(fact, keys, on="k").collect()
    assert [(r["k"], r["payload"]) for r in got] == [(2, 2)]
