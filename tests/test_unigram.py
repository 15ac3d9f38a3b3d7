"""Distributed unigram-LM tokenizer (SentencePiece-style EM) vs an
exact pure-Python reference implementing the identical spec — same
word extraction, substring seeding, count-based pruning, EM loop and
ordering. The Viterbi kernel itself is unit-tested by hand; the model
test targets the DISTRIBUTED plumbing (word-freq table, seed
aggregate, Arrow E-step partials) by re-deriving everything locally
over Python dicts."""

from __future__ import annotations

import math
import re
from collections import Counter

from vectorsearch_spark.operators.unigram import (
    unigram_encode,
    unigram_train,
    viterbi_segment,
)

TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _py_words(texts):
    words: Counter = Counter()
    for t in texts:
        for w in re.findall(TOKEN_RE, t.lower()):
            if re.fullmatch("[a-z]+", w):
                words[w] += 1
    return words


def _py_mstep(counts, chars):
    total = sum(counts.values())
    logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    floor = math.log(0.5 / total)
    for ch in chars:
        logp.setdefault(ch, floor)
    return logp


def _py_estep(words, logp, mpl):
    acc: Counter = Counter()
    for w, c in words.items():
        for piece in viterbi_segment(w, logp, mpl):
            acc[piece] += c
    return dict(acc)


def _py_unigram(
    texts, vocab_size, max_piece_len=8, seed_factor=4, prune_frac=0.75,
    min_count=2, em_iters=2,
):
    words = _py_words(texts)
    chars = sorted({ch for w in words for ch in w})
    sub: Counter = Counter()
    for w, c in words.items():
        for st in range(len(w)):
            for ln in range(2, max_piece_len + 1):
                if st + ln <= len(w):
                    sub[w[st : st + ln]] += c
    cand = sorted(
        ((p, c) for p, c in sub.items() if c >= min_count),
        key=lambda pc: (-pc[1], pc[0]),
    )[: seed_factor * vocab_size]
    counts = dict(cand)
    char_counts: Counter = Counter()
    for w, c in words.items():
        for ch in w:
            char_counts[ch] += c
    for ch, c in char_counts.items():
        counts.setdefault(ch, c)
    logp = _py_mstep(counts, chars)

    def prune(cnts):
        multi = sorted(
            ((p, c) for p, c in cnts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        target_multi = max(vocab_size - len(chars), 0)
        keep_n = min(max(int(math.ceil(len(multi) * prune_frac)), target_multi), len(multi))
        kept = dict(multi[:keep_n])
        for ch in chars:
            kept[ch] = cnts.get(ch, 0)
        return kept

    def final_trim(cnts):
        multi = sorted(
            ((p, c) for p, c in cnts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[: max(vocab_size - len(chars), 0)]
        out = dict(multi)
        for ch in chars:
            out[ch] = out.get(ch, 0)
        return out

    while len(logp) > vocab_size:
        prev_size = len(logp)
        counts = _py_estep(words, logp, max_piece_len)
        counts = prune(counts)
        if len(counts) >= prev_size and len(counts) > vocab_size:
            counts = final_trim(counts)  # pruning fixed point
        elif len(counts) <= vocab_size:
            counts = final_trim(counts)
        logp = _py_mstep(counts, chars)
    for _ in range(em_iters):
        counts = _py_estep(words, logp, max_piece_len)
        logp = _py_mstep(counts, chars)
    final = _py_estep(words, logp, max_piece_len)
    order = sorted(logp, key=lambda p: (-final.get(p, 0), p))
    return [(p, logp[p]) for p in order]


def test_viterbi_segment_by_hand():
    logp = {"a": -3.0, "b": -3.0, "ab": -2.0, "abc": -1.5, "c": -3.0}
    assert viterbi_segment("abc", logp, 3) == ["abc"]
    assert viterbi_segment("abab", logp, 3) == ["ab", "ab"]
    # tie between [ab,c] (-5.0) and [abc] (-1.5): abc wins outright
    assert viterbi_segment("abcab", logp, 3) == ["abc", "ab"]
    # unseen chars fall back to per-char pieces
    assert viterbi_segment("xyz", logp, 3) == ["x", "y", "z"]
    # tie-break: equal-score splits keep the SMALLEST split point at
    # every position, i.e. the LAST piece is as long as possible
    tie = {"a": -1.0, "aa": -2.0}
    assert viterbi_segment("aaa", tie, 2) == ["a", "aa"]


def test_unigram_train_matches_python_model(spark):
    texts = [
        "the internationalization of the international internet",
        "internal international internet nation nationalization",
        "the nation the internet the internal antinational",
        "rationalization irrational rational nationalities 42 + x",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = unigram_train(df, vocab_size=48, max_piece_len=6, em_iters=2)
    exp = _py_unigram(texts, vocab_size=48, max_piece_len=6, em_iters=2)
    assert [p for p, _ in got] == [p for p, _ in exp]
    for (pg, lg), (pe, le) in zip(got, exp):
        assert lg == le, (pg, lg, le)  # integer counts → identical floats
    # deterministic across runs
    again = unigram_train(df, vocab_size=48, max_piece_len=6, em_iters=2)
    assert again == got


def test_unigram_encode_witnesses_and_covers(spark):
    texts = ["the international internet", "nation the x9 internet"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = unigram_train(df, vocab_size=32, max_piece_len=6, em_iters=1)
    out = {r["doc_id"]: r for r in unigram_encode(df, vocab, max_piece_len=6).collect()}
    # every word segments: pieces reassemble to the word, so n_pieces ≥ n_words
    assert out[0]["n_words"] == 3 and out[1]["n_words"] == 5  # "x9" -> x, 9
    assert out[0]["n_pieces"] >= out[0]["n_words"]
    # model-side witness: segment each token in order and hash
    import hashlib

    lp = dict(vocab)
    for i, t in enumerate(texts):
        pieces = []
        for w in re.findall(TOKEN_RE, t.lower()):
            if re.fullmatch("[a-z]+", w):
                pieces.extend(viterbi_segment(w, lp, 6))
            else:
                pieces.append(w)
        assert out[i]["pieces_hash"] == hashlib.md5(" ".join(pieces).encode()).hexdigest()
        assert out[i]["n_pieces"] == len(pieces)


def test_unigram_train_rejects_unreachable_configs(spark):
    """The shrink loop must terminate on every valid input: prune_frac
    outside (0,1) and vocab_size at or below the char count are
    unreachable targets and must raise up front; a pruning fixed point
    (ceil(n·frac) == n at small n) must trim to target instead of
    looping distributed E-steps forever (ADVICE r8)."""
    import pytest

    from vectorsearch_spark.operators.unigram import unigram_train

    docs = spark.createDataFrame(
        [(0, "abc abd abe abc abd"), (1, "abc abf abg abc")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="prune_frac"):
        unigram_train(docs, vocab_size=8, prune_frac=1.0)
    with pytest.raises(ValueError, match="prune_frac"):
        unigram_train(docs, vocab_size=8, prune_frac=0.0)
    # distinct chars: a b c d e f g = 7 ≥ vocab_size
    with pytest.raises(ValueError, match="character"):
        unigram_train(docs, vocab_size=7, prune_frac=0.5)
    # fixed-point config: vocab_size = chars+1 (target_multi=1) with
    # prune_frac=0.75 can pin len(multi)=2 forever without the guard;
    # must terminate and return exactly vocab_size pieces
    vocab = unigram_train(
        docs, vocab_size=8, max_piece_len=3, seed_factor=1,
        prune_frac=0.75, min_count=1, em_iters=1,
    )
    assert len(vocab) == 8
    pieces = {p for p, _ in vocab}
    assert {"a", "b", "c", "d", "e", "f", "g"} <= pieces
