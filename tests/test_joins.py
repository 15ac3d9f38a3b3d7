"""Bloom-filter semi-join pruning: exactness, pruning power, and
plan shape (the probe must run below any exchange)."""

from __future__ import annotations

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
