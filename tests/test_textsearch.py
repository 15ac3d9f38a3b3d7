"""BM25 + RRF fusion: known-value checks against hand-computed scores
(the oracle parity check runs in test_workload_parity via
text_search_bm25 / hybrid_search_rrf)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.textsearch import (
    bm25_topk,
    query_terms,
    rrf_fuse,
)


def test_query_terms_dedupe_and_grammar():
    assert query_terms("Apple banana, APPLE 42!") == [
        "apple",
        "banana",
        ",",
        "42",
        "!",
    ]
    assert query_terms("   ") == []


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry apple"),
        ],
        "doc_id long, text string",
    )


def test_bm25_hand_computed(spark, tiny_docs):
    """N=3, avgdl=3, df(apple)=2 → idf=ln(1.6); d1 tf=2 dl=3 →
    2·2.2/3.2; d3 tf=1 dl=4 → 2.2/2.5; d2 excluded (score 0)."""
    got = [(r["doc_id"], r["bm25"]) for r in bm25_topk(tiny_docs, "apple").collect()]
    idf = math.log(1.6)
    exp = [
        (1, round(idf * 2 * 2.2 / 3.2, 4)),
        (3, round(idf * 2.2 / 2.5, 4)),
    ]
    assert got == exp


def test_bm25_multi_term_and_k_cut(spark, tiny_docs):
    """Two-term query sums per-term contributions; k=1 keeps only the
    top document."""
    full = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(tiny_docs, "apple cherry").collect()
    }
    assert set(full) == {1, 2, 3}
    # cherry-heavy d3 must outscore the cherry-light d2
    assert full[3] > full[2]
    top1 = bm25_topk(tiny_docs, "apple cherry", k=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == max(full, key=full.get)


def test_bm25_empty_query_and_no_hits(spark, tiny_docs):
    assert bm25_topk(tiny_docs, "").count() == 0
    assert bm25_topk(tiny_docs, "zzz qqq").count() == 0


def test_bm25_single_tokenizer_pass_per_scan(spark, tiny_docs):
    """The fold computes every tf and dl from ONE tokens() reference:
    the physical plan must evaluate the tokenizer regex once per scan
    (stats pass + scoring pass = 2), not once per query term."""
    plan = bm25_topk(tiny_docs, "apple banana cherry durian elderberry")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all") <= 2, plan


def test_rrf_fusion_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, 1), (2, 2)], "doc_id long, text_rank int"
    )
    right = spark.createDataFrame(
        [(2, 1), (3, 2)], "doc_id long, vec_rank int"
    )
    got = [
        (r["doc_id"], r["rrf_score"], r["text_rank"], r["vec_rank"])
        for r in rrf_fuse(left, right).collect()
    ]
    exp = [
        (2, round(1 / 62 + 1 / 61, 6), 2, 1),
        (1, round(1 / 61, 6), 1, None),
        (3, round(1 / 62, 6), None, 2),
    ]
    assert got == exp


def test_rrf_fusion_k_cut_deterministic(spark):
    """Equal fused scores cut by doc_id: two docs absent from the left
    list with the same right rank cannot exist, but two docs with
    symmetric (l,r) = (1,2)/(2,1) tie exactly — the lower doc_id wins
    the k=1 cut."""
    left = spark.createDataFrame([(7, 1), (3, 2)], "doc_id long, text_rank int")
    right = spark.createDataFrame([(7, 2), (3, 1)], "doc_id long, vec_rank int")
    rows = rrf_fuse(left, right, k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 3
