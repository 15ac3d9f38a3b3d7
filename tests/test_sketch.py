"""Misra–Gries heavy hitters: exactness vs a full groupBy count when
the certificate holds (with capacity < vocabulary, so the summaries
really prune), a loud ValueError when it cannot hold, and the fold's
undercount bound."""

import pytest
from pyspark.sql import functions as F


def _skewed_df(spark):
    """Zipf-ish corpus: head item i (0..9) appears 2^(10-i) times,
    plus 300 singleton tail items — vocab 310, total 2346."""
    rows = []
    for i in range(10):
        rows += [(f"head{i}",)] * (1 << (10 - i))
    rows += [(f"tail{j:03d}",) for j in range(300)]
    return spark.createDataFrame(rows, "item string").repartition(8)


def test_heavy_hitters_exact_while_summaries_prune(spark):
    from vectorsearch_spark.operators.sketch import heavy_hitters

    df = _skewed_df(spark)
    # capacity 64 << 310 vocab: per-partition summaries must prune,
    # yet head counts far exceed N/(cap+1) = 2346/65 ≈ 36
    got = [tuple(r) for r in heavy_hitters(df, "item", k=5, capacity=64).collect()]
    exact = (
        df.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("item"))
        .limit(5)
        .collect()
    )
    assert got == [(r["item"], r["cnt"], i + 1) for i, r in enumerate(exact)]


def test_heavy_hitters_raises_when_not_certifiable(spark):
    from vectorsearch_spark.operators.sketch import heavy_hitters

    # uniform: every item appears 4 times, capacity tiny — the k-th
    # count can never beat N/(capacity+1), must raise, never return an
    # unverifiable top-k
    rows = [(f"u{j:03d}",) for j in range(200) for _ in range(4)]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    with pytest.raises(ValueError, match="exactness bound"):
        heavy_hitters(df, "item", k=5, capacity=8)
    # ample capacity certifies the same data fine
    got = heavy_hitters(df, "item", k=5, capacity=1024).collect()
    assert [r["cnt"] for r in got] == [4] * 5
    assert [r["item"] for r in got] == [f"u{j:03d}" for j in range(5)]


def test_heavy_hitters_tie_order_and_validation(spark):
    from vectorsearch_spark.operators.sketch import heavy_hitters

    rows = [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 5
    df = spark.createDataFrame(rows, "item string")
    got = [tuple(r) for r in heavy_hitters(df, "item", k=3, capacity=16).collect()]
    assert got == [("c", 5, 1), ("a", 3, 2), ("b", 3, 3)]  # ties by item asc
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "item", k=0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "item", k=8, capacity=4)
    empty = spark.createDataFrame([], "item string")
    with pytest.raises(ValueError, match="empty"):
        heavy_hitters(empty, "item", k=1, capacity=8)


def test_mg_fold_undercount_bound():
    """The mergeable-summaries fold: estimates only UNDERCOUNT, by at
    most total/(capacity+1)."""
    import random

    from vectorsearch_spark.operators.sketch import _mg_fold

    rng = random.Random(7)
    truth: dict = {}
    counters: dict = {}
    cap = 16
    total = 0
    for _ in range(50):
        batch: dict = {}
        for _ in range(40):
            item = f"i{rng.randrange(60)}"
            batch[item] = batch.get(item, 0) + 1
            truth[item] = truth.get(item, 0) + 1
            total += 1
        counters = _mg_fold(counters, batch, cap)
    assert len(counters) <= cap
    for item, est in counters.items():
        assert est <= truth[item]
        assert truth[item] - est <= total / (cap + 1)
