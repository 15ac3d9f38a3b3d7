"""Distributed BPE merge learning vs an exact pure-Python reference
implementing the identical spec (zip pair counts, leftmost
non-overlapping fold merge, count-desc/pair-asc tiebreak)."""

from __future__ import annotations

import re
from collections import Counter

from vectorsearch_spark.operators.bpe import learn_bpe_merges

TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _py_bpe(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        for w in re.findall(TOKEN_RE, t.lower()):
            if re.fullmatch("[a-z]+", w):
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for r in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((r, a, b, c))
        new_vocab = {}
        for sym, cnt in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lower lowest newer newest wider widest",
        "low low low lower lower newest newest newest newest",
        "aaa aaaa ababab the the the theory thesis",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = learn_bpe_merges(df, n_merges=12)
    exp = _py_bpe(texts, 12)
    assert got == exp
    # the 'th'/'the' family must surface early given the corpus bias
    learned_tokens = {a + b for _, a, b, _ in got}
    assert "th" in learned_tokens or "he" in learned_tokens


def test_bpe_early_stop_on_exhausted_pairs(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    got = learn_bpe_merges(df, n_merges=10)
    # every pair occurs once (< 2): nothing learnable
    assert got == []


def test_bpe_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(i, "banana bandana ban bananas") for i in range(3)],
        "doc_id long, text string",
    )
    assert learn_bpe_merges(df, 6) == learn_bpe_merges(df, 6)


def test_bpe_apply_matches_python_model(spark):
    """apply_bpe_merges (the encode half): per-word symbol sequences
    must equal the Python model applying the learned rules in order
    with the same leftmost-non-overlapping fold; non-alphabetic tokens
    pass through as single symbols."""
    from vectorsearch_spark.operators.bpe import apply_bpe_merges

    texts = [
        "the cat catches the caterpillar",
        "a banana and a bandana in the cabana",
        "low lower lowest slow slower 42 !!",
        "the the the banana cat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, n_merges=10)
    got = sorted(
        (r["doc_id"], r["w"], tuple(r["toks"]))
        for r in apply_bpe_merges(df, merges).collect()
    )

    rules = [(a, b) for _, a, b, _ in merges]

    def enc(w: str) -> tuple:
        if not re.fullmatch("[a-z]+", w):
            return (w,)
        sym = list(w)
        for a, b in rules:
            nxt = []
            for s in sym:
                if nxt and nxt[-1] == a and s == b:
                    nxt[-1] = a + b
                else:
                    nxt.append(s)
            sym = nxt
        return tuple(sym)

    exp = sorted(
        (i, w, enc(w))
        for i, t in enumerate(texts)
        for w in re.findall(TOKEN_RE, t.lower())
    )
    assert got == exp
    # concatenation invariant: encoding never loses characters
    for _, w, toks in got:
        assert "".join(toks) == w
