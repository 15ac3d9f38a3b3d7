"""Distributed BPE merge learning (Sennrich-style tokenizer training)
— the vocabulary-building pass of an LLM data pipeline, run on the
corpus the model will train on.

Scale design — the corpus is touched ONCE:

- one tokenizer pass builds the WORD-FREQUENCY table (distinct word →
  count); every merge round operates on that vocab table (10⁵-10⁷
  rows at web scale), never re-reading documents;
- a round is: explode adjacent symbol pairs weighted by word count →
  one map-side-combinable aggregate → collect the single argmax row
  (O(1) driver state per round, deterministic tiebreak count desc /
  pair asc) → apply the merge to symbol arrays with a codegen
  ``aggregate`` fold (leftmost, non-overlapping);
- per-round ``localCheckpoint`` truncates lineage, the same iterative
  discipline as pagerank/duplicate_clusters — without it the plan
  doubles per round.

Merge semantics (mirrored exactly by the pure-Python reference model
in tests): pair counts are adjacent-overlapping (the zip count), the
merge application is a left-to-right fold that never re-merges its own
output within the same round ("aaa" + merge(a,a) → ["aa", "a"]).
Ties break deterministically, so the learned merge TABLE is a pure
function of the corpus — rerun-stable, like every other curation pass
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_vocab(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from vectorsearch_spark.functions.text import tokens
    from vectorsearch_spark.operators.text import fan_out

    words = (
        fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    return words.select(F.split("w", "").alias("sym"), "cnt")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("sym") - 2, F.lit(-1))),
            lambda i: F.struct(
                F.element_at(F.col("sym"), i + 1).alias("a"),
                F.element_at(F.col("sym"), i + 2).alias("b"),
            ),
        )
    )
    return (
        vocab.where(F.size("sym") >= 2)
        .select(pairs.alias("p"), "cnt")
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    sym = F.col("sym")
    merged = F.aggregate(
        sym,
        F.array().cast("array<string>"),
        # leftmost non-overlapping by construction: a merge replaces the
        # tail with a+b, which is strictly longer than `a`, so a fresh
        # merge product can never satisfy the `last == a` test for the
        # same rule in the same round ("aaa" + merge(a,a) -> [aa, a]).
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.select(merged.alias("sym"), "cnt")


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns
    [(round, left, right, pair_count), …] — the merge table a
    tokenizer ships. Stops early when no pair occurs twice."""
    vocab = _word_vocab(df, id_col, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < 2:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["pair_count"])
        merges.append((r, a, b, c))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return merges


def apply_bpe_merges(
    df: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ENCODE with a learned merge table — the tokenizer-application
    half of the BPE story (learn_bpe_merges ships the table; this is
    what the pipeline then runs over every document).

    Returns (id_col, w, toks array<string>): one row per word
    occurrence with its BPE symbol sequence. Alphabetic words are
    encoded by applying the rules in LEARNED ORDER, each as the same
    leftmost-non-overlapping fold the learner used (semantics mirrored
    by the pure-Python model test); non-alphabetic tokens pass through
    as a single symbol.

    Scale: encoding runs per DISTINCT word (the dictionary), not per
    occurrence — an Arrow pass over the vocab table costs
    O(|vocab| · n_merges · word_len) regardless of corpus size, and
    the result joins back onto the token stream by word (Spark/AQE
    picks broadcast for small vocabularies). The merge table itself is
    driver state by contract (it IS the tokenizer artifact, 10⁴-10⁵
    rules), shipped to executors inside the mapper closure.
    """
    from vectorsearch_spark.functions.text import tokens
    from vectorsearch_spark.operators.text import fan_out

    rules = [(a, b) for _, a, b, _ in merges]

    toks = (
        fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    )
    alpha = F.col("w").rlike("^[a-z]+$")
    vocab = toks.where(alpha).select("w").distinct()

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for w in pdf["w"]:
                sym = list(w)
                for a, b in rules:
                    nxt: list[str] = []
                    for s in sym:
                        if nxt and nxt[-1] == a and s == b:
                            nxt[-1] = a + b
                        else:
                            nxt.append(s)
                    sym = nxt
                out.append((w, sym))
            yield pd.DataFrame(out, columns=["w", "toks"])

    encoded = vocab.mapInPandas(enc, "w string, toks array<string>")
    return (
        toks.join(encoded, "w", "left")
        .select(
            F.col(id_col),
            "w",
            F.coalesce(F.col("toks"), F.array(F.col("w"))).alias("toks"),
        )
    )
