"""Distributed unigram-LM tokenizer training (the SentencePiece
unigram model — Kudo 2018, arXiv:1804.10959) and encoding: the EM
sibling of the BPE learner (operators/bpe.py), completing the two
tokenizer-training families LLM pipelines actually ship.

Scale design — the corpus is touched ONCE, EM never re-reads it:

- one tokenizer pass builds the WORD-FREQUENCY table (distinct word →
  count), the same dictionary-sized working set as BPE (10⁵-10⁷ rows
  at web scale vs 10¹¹ word occurrences);
- candidate seeding explodes each word's substrings (≤ max_piece_len)
  weighted by word count — one map-side-combinable aggregate, top-N by
  (count DESC, piece ASC) via TakeOrdered, never a global sort;
- an EM round is: one Arrow ``mapInPandas`` pass over the word table
  (piece log-probs broadcast in the closure — the vocabulary IS the
  tokenizer artifact, O(vocab) driver state by contract, the
  apply_bpe_merges stance) emitting per-partition piece-count
  partials, one bounded groupBy-sum (≤ |vocab| rows), and a driver
  M-step re-normalizing log-probs;
- pruning keeps every single character (any string stays segmentable)
  and the top multi-char pieces by E-step count — the simplified,
  DETERMINISTIC pruning criterion (count rather than the paper's
  likelihood-loss ranking; ties break piece-ascending), so the learned
  vocabulary is a pure function of the corpus, rerun- and
  engine-stable like the BPE merge table.

Viterbi tie-break (mirrored exactly by the pure-Python reference model
in tests): positions scan left to right, split points ascending, and a
candidate must STRICTLY beat the incumbent — so ties keep the smallest
split point (the longest-piece-first segmentation).
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG = -1e18


def viterbi_segment(
    word: str, logp: "dict[str, float]", max_piece_len: int
) -> "list[str]":
    """Best segmentation of ``word`` under piece log-probs: maximizes
    Σ logp(piece); ties keep the smallest split point. Assumes every
    single character is in ``logp`` (the trainer guarantees it);
    unseen characters fall back to one piece per char."""
    n = len(word)
    best = [_NEG] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] <= _NEG / 2:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if best[n] <= _NEG / 2:
        return list(word)
    out: "list[str]" = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _word_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(w, cnt) over alphabetic words — the bpe._word_vocab corpus
    contract (lowercased ``tokens`` pass, ^[a-z]+$ filter)."""
    from vectorsearch_spark.functions.text import tokens
    from vectorsearch_spark.operators.text import fan_out

    return (
        fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _estep_counts(
    words: DataFrame, logp: "dict[str, float]", max_piece_len: int
) -> "dict[str, int]":
    """One E-step: Viterbi-segment every distinct word (weighted by its
    corpus count) and return global piece counts. One Arrow pass +
    one bounded aggregate; the result is ≤ |vocab| rows."""
    lp = dict(logp)
    mpl = int(max_piece_len)

    def mapper(batches: "Iterator") -> "Iterator":
        import pandas as pd

        acc: "dict[str, int]" = {}
        for pdf in batches:
            for w, c in zip(pdf["w"], pdf["cnt"]):
                for piece in viterbi_segment(w, lp, mpl):
                    acc[piece] = acc.get(piece, 0) + int(c)
        if acc:
            yield pd.DataFrame(list(acc.items()), columns=["piece", "c"])

    rows = (
        words.mapInPandas(mapper, "piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in rows}


def _mstep(counts: "dict[str, int]", chars: "list[str]") -> "dict[str, float]":
    """Re-normalize to log-probs; zero-count characters get a half-count
    floor so every string stays segmentable."""
    total = sum(counts.values())
    if total == 0:
        raise ValueError("unigram_train: E-step produced no pieces")
    logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    floor = math.log(0.5 / total)
    for ch in chars:
        if ch not in logp:
            logp[ch] = floor
    return logp


def unigram_train(
    df: DataFrame,
    vocab_size: int = 512,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    prune_frac: float = 0.75,
    min_count: int = 2,
    em_iters: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "list[tuple[str, float]]":
    """Learn a ``vocab_size``-piece unigram tokenizer. Returns
    [(piece, logp), …] ordered by (final E-step count DESC, piece ASC)
    — the shippable vocabulary artifact.

    Seeds with every single character plus the top
    ``seed_factor·vocab_size`` substrings (length ≥ 2, corpus count ≥
    ``min_count``); alternates EM with count-based pruning (keep
    ``prune_frac`` of multi-char pieces, never below the target) until
    the vocabulary fits, then runs ``em_iters`` clean EM rounds.
    Deterministic throughout — see the module doc.
    """
    if vocab_size < 2:
        raise ValueError("vocab_size must be ≥ 2")
    if not 0.0 < float(prune_frac) < 1.0:
        raise ValueError("prune_frac must be in (0, 1) — at 1.0 pruning "
                         "keeps everything and the shrink loop cannot terminate")
    words = _word_freqs(df, id_col, text_col).localCheckpoint()
    # ONE aggregate answers emptiness + character set + char counts
    # (r14: was three jobs — limit(1).count, distinct chars collect,
    # char-count collect; every word has ≥1 character, so empty
    # char_counts ⟺ empty words, and the distinct chars are exactly
    # the aggregate's keys)
    char_counts = {
        r["ch"]: int(r["c"])
        for r in words.select(
            F.explode(F.split("w", "")).alias("ch"), F.col("cnt")
        )
        .where(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    }
    if not char_counts:
        raise ValueError("unigram_train: no alphabetic words in the corpus")

    chars = sorted(char_counts)
    if int(vocab_size) <= len(chars):
        # every character must stay in the vocabulary (segmentability),
        # so a target at or below the char count is unreachable and the
        # shrink loop would never terminate
        raise ValueError(
            f"vocab_size {vocab_size} ≤ distinct character count "
            f"{len(chars)} — raise vocab_size above the character set"
        )

    # substring candidates: one start-position explode, lengths unrolled
    # as an inner transform — one map-side-combinable aggregate total
    n_seed = int(seed_factor) * int(vocab_size)
    cand = (
        words.select(
            "w",
            "cnt",
            F.explode(
                F.sequence(F.lit(1), F.length("w"))
            ).alias("st"),
        )
        .select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(2),
                        F.least(
                            F.lit(int(max_piece_len)),
                            F.length("w") - F.col("st") + 1,
                        ),
                    ),
                    lambda ln: F.col("w").substr(F.col("st"), ln),
                )
            ).alias("piece"),
        )
        # sequence(2, hi) with hi < 2 DESCENDS ([2, 1]) and substr
        # truncates at the word edge — both would smuggle 1-char pieces
        # (with partial counts) past the char seeding; drop them here
        .where(F.length("piece") >= 2)
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
        .where(F.col("c") >= int(min_count))
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(n_seed)
        .collect()
    )
    counts: "dict[str, int]" = {r["piece"]: int(r["c"]) for r in cand}
    # chars enter with their corpus counts so initial probs are sane
    # (already aggregated above — the same (ch, Σcnt) rows)
    for ch, c in char_counts.items():
        counts.setdefault(ch, c)
    logp = _mstep(counts, chars)

    def prune(cnts: "dict[str, int]") -> "dict[str, int]":
        multi = sorted(
            ((p, c) for p, c in cnts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        target_multi = max(int(vocab_size) - len(chars), 0)
        keep_n = max(int(math.ceil(len(multi) * float(prune_frac))), target_multi)
        keep_n = min(keep_n, len(multi))
        kept = dict(multi[:keep_n])
        for ch in chars:
            kept[ch] = cnts.get(ch, 0)
        return kept

    def final_trim(cnts: "dict[str, int]") -> "dict[str, int]":
        multi = sorted(
            ((p, c) for p, c in cnts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[: max(int(vocab_size) - len(chars), 0)]
        out = dict(multi)
        for ch in chars:
            # chars re-enter at zero (the M-step floor re-seeds them) —
            # the historical trim semantics the model tests pin down
            out[ch] = out.get(ch, 0)
        return out

    # shrink to size
    while len(logp) > int(vocab_size):
        prev_size = len(logp)
        counts = _estep_counts(words, logp, max_piece_len)
        counts = prune(counts)
        if len(counts) >= prev_size and len(counts) > int(vocab_size):
            # pruning hit a fixed point (ceil(n·frac) == n at small n):
            # trim straight to the target instead of looping the same
            # distributed E-step forever
            counts = final_trim(counts)
        elif len(counts) <= int(vocab_size):
            counts = final_trim(counts)
        logp = _mstep(counts, chars)

    for _ in range(int(em_iters)):
        counts = _estep_counts(words, logp, max_piece_len)
        logp = _mstep(counts, chars)

    final = _estep_counts(words, logp, max_piece_len)
    order = sorted(logp, key=lambda p: (-final.get(p, 0), p))
    return [(p, logp[p]) for p in order]


def unigram_encode(
    df: DataFrame,
    vocab: "list[tuple[str, float]]",
    max_piece_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned unigram vocabulary. Returns
    (id_col, n_words, n_pieces, pieces_hash) per document —
    pieces_hash is md5 of the space-joined pieces in word order (the
    compact witness contract of passage_dedup).

    Scale: Viterbi runs per DISTINCT word (dictionary-sized Arrow
    pass, the apply_bpe_merges shape); occurrences join back by word
    and re-aggregate by document. Non-alphabetic tokens pass through
    as single pieces.
    """
    from vectorsearch_spark.functions.text import tokens
    from vectorsearch_spark.operators.text import fan_out

    lp = {p: float(v) for p, v in vocab}
    mpl = int(max_piece_len)

    # Materialize the token table once (guide §5): both the
    # distinct-words Viterbi pass and the occurrence join consume it,
    # and without the checkpoint each branch re-ran the regex tokenize
    # over the full corpus (two tokenize passes per encode).
    toks = (
        fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "w"))
        .localCheckpoint(eager=False)
    )
    alpha = F.col("w").rlike("^[a-z]+$")
    words = toks.where(alpha).select("w").distinct()

    def enc(batches: "Iterator") -> "Iterator":
        import pandas as pd

        for pdf in batches:
            out = [
                (w, viterbi_segment(w, lp, mpl)) for w in pdf["w"]
            ]
            if out:
                yield pd.DataFrame(out, columns=["w", "pieces"])

    encoded = words.mapInPandas(enc, "w string, pieces array<string>")
    joined = toks.join(encoded, "w", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce(F.col("pieces"), F.array(F.col("w"))).alias("pieces"),
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.size("pieces")).cast("long").alias("n_pieces"),
        F.md5(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "pieces"))
                        ),
                        lambda s: s["pieces"],
                    )
                ),
            )
        ).alias("pieces_hash"),
    )
