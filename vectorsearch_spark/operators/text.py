"""Text-analysis operators for large-scale training-data pipelines:
document stats / quality scoring, token counting, language ID, and
document fingerprinting (north-star extensions per BASELINE.json; no
reference analog — the reference's only text-adjacent surface is the
opaque payload column, vectorsearch.proto:123-125).

All operators tokenize ONCE per document: the token/piece array
materializes in a projection below a repartition barrier and crosses
the exchange as data, because Catalyst collapses projections and does
not hoist the tokenizer regex out of HOF lambdas — every reference
re-runs it otherwise (measured 5× the single-pass cost for doc_stats
at the 100× probe corpus). The one doc-keyed linear shuffle is the
price; everything above it is codegen'd attribute arithmetic, and no
Python appears in the row path except the explicitly-marked Arrow
passes (winnowing, repetition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectorsearch_spark.functions.text import STOPWORDS, TOKEN_RE, tokens

# tiny embedded lexicons for the n-gram/stopword language heuristic;
# deterministic and mirrored literally into the SQL oracle
LANG_LEXICONS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "en": ["the", "and", "is", "of", "to", "a", "in", "that", "for", "with"],
    "es": ["el", "la", "los", "las", "es", "y", "de", "que", "un", "una"],
    "fr": ["le", "la", "les", "est", "et", "de", "que", "un", "une", "pour"],
    "zh": ["de5", "shi4", "bu4", "le5", "wo3", "ni3", "ta1", "men5", "zai4", "you3"],
}


_INFER_GEN_RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def exclude_generate_filter_inference(spark) -> None:
    """Disable ``InferFiltersFromGenerate`` on this session (idempotent,
    runtime-settable). The rule infers ``size(child) > 0`` from every
    explode() and predicate-pushdown then sinks that filter below the
    repartition — INLINING the generator's entire child expression
    (tokenize + shingle here) into the narrow scan stage's filter, where
    it re-runs per row at file parallelism. Measured: 8 of 10 seconds of
    the minhash pipeline at sf0.1. The inferred filter buys nothing for
    text pipelines (every non-null doc yields ≥1 shingle/token), so the
    operators that explode expensive arrays turn the rule off.

    SESSION-SCOPED MUTATION (deliberate, permanent): this alters
    ``excludedRules`` for every query subsequently planned on the
    session, not just the calling operator — acceptable because the
    rule is pure optimization (excluding it never changes results) and
    re-adding it between queries would re-open the same perf trap for
    the next text pipeline. Callers sharing a session with non-text
    workloads that WANT generate-filter inference should plan those on
    a separate session (Spark: ``spark.newSession()`` shares the
    context but isolates conf)."""
    key = "spark.sql.optimizer.excludedRules"
    try:
        cur = spark.conf.get(key, None) or ""
    except Exception:
        cur = ""
    if _INFER_GEN_RULE not in cur:
        spark.conf.set(key, ",".join([c for c in (cur, _INFER_GEN_RULE) if c]))


def fan_out(df: DataFrame, key_col: str, width: int | None = None) -> DataFrame:
    """Spread a NARROW source (few parquet files) to cluster parallelism
    before a CPU-bound stage; no-op when the input is already ≥
    defaultParallelism wide — at 100 TB (thousands of input splits)
    this adds NO shuffle, while on small-file corpora it stops a
    regex/hash stage from running 3-way parallel on a 32-core cluster.

    The width probe is pure metadata and conf-neutral: for file
    sources, ``df.inputFiles()`` (driver-side file-index listing — no
    job, no AQE interaction; an earlier ``df.rdd`` probe had to toggle
    ``spark.sql.adaptive.enabled`` session-wide, which raced against
    concurrently-planned queries). File count caps scan width — big
    splittable files only divide further, so ≥ par files never
    repartitions; fewer files than cores repartitions (worst case: a
    shuffle that AQE-coalesces, on inputs small enough to have few
    files). Non-file sources (createDataFrame, views over exchanges)
    have no metadata-only width — they're treated as narrow unless the
    caller passes an explicit ``width`` hint."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if width is None:
        files = df.inputFiles()
        width = len(files) if files else 1
    if width < par:
        return df.repartition(par, F.col(key_col))
    return df


def doc_stats_cols(text_col: str, toks: Column | None = None) -> list[Column]:
    """Stat/quality columns for a text column: lengths, token counts,
    ratios, and a composite quality score in [0, 1].

    ``toks``: pass a MATERIALIZED token-array column (an attribute on
    the far side of an exchange) to make the five token references
    free; left to default, each reference re-evaluates the tokenizer
    regex (Catalyst collapses projections and does not hoist the
    common subexpression out of the HOF lambdas — measured 5× the
    single-pass cost on the 100× probe corpus, see ``doc_stats``)."""
    if toks is None:
        toks = tokens(text_col)
    n_chars = F.length(F.col(text_col)).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    punct_chars = F.length(
        F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
    ).cast("long")
    punct_ratio = punct_chars / F.greatest(n_chars, F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    stopword_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    avg_token_len = (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
        / F.greatest(n_tokens, F.lit(1))
    )
    distinct_ratio = n_distinct / F.greatest(n_tokens, F.lit(1))
    # quality: long enough, lexically diverse, not punctuation soup, some
    # stopwords (fluent prose has them)
    quality = (
        0.25 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.25 * distinct_ratio
        + 0.25 * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
        + 0.25 * F.least(stopword_ratio * 5, F.lit(1.0))
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(avg_token_len, 4).alias("avg_token_len"),
        F.round(stopword_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality_score"),
    ]


def doc_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Tokenize-once plan: the token array materializes in a projection
    below a repartition barrier and crosses the exchange as DATA, so
    the five token-derived stats upstream reference an attribute, not
    the regex (the dedup.py:87-93 pattern).  Measured on the 100×
    probe corpus (500 k docs): 20.3 s inline → 5.0 s barrier'd; the
    shuffle carries ≈ text-sized token arrays — linear, and the regex
    is 5× the cost of moving its output."""
    spark = df.sparkSession
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        tokens(text_col).alias("__toks"),
    ).repartition(spark.sparkContext.defaultParallelism, F.col(id_col))
    return base.select(
        F.col(id_col), *doc_stats_cols(text_col, toks=F.col("__toks"))
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Lexicon-hit language ID: score = count of tokens in each
    language's lexicon; predict the argmax (ties → language code asc,
    zero hits → 'und').  Tokenize-once barrier: the |langs| score
    expressions reference a materialized token array on the far side
    of a repartition exchange (see ``doc_stats``)."""
    base = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    toks = F.col("__toks")
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(lex))).alias(f"score_{lang}")
        for lang, lex in sorted(LANG_LEXICONS.items())
    ]
    scored = base.select(F.col(id_col), *scores)
    langs = sorted(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for la in langs:  # first (alphabetical) language hitting the max wins
        pred = pred.when(F.col(f"score_{la}") == best, F.lit(la))
    return scored.select(
        id_col,
        *[F.col(f"score_{la}").cast("long").alias(f"score_{la}") for la in langs],
        pred.alias("pred_lang"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact content fingerprint: md5 of the whitespace-normalized,
    lowercased text — the key for exact dedup."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    hash_bits: int = 20,
    base: int = 31,
) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): token hashes → rolling k-gram Horner hashes → per-window
    minima → distinct fingerprint set, one output row per (doc,
    fingerprint).

    Implemented as an Arrow-batched ``mapInPandas`` pass — deliberately
    NOT pure column expressions: a sliding window over an array inside a
    higher-order-function lambda re-evaluates the (md5-hashed) token
    array per window position because Catalyst does not hoist
    loop-invariant subexpressions out of lambdas, turning a linear
    algorithm quadratic. The NumPy form hashes each token once and takes
    vectorized rolling minima. Still a narrow single pass, no shuffle.

    Hash values are bounded (token hash < 2^hash_bits, small Horner
    base) so the int64 arithmetic is overflow-free and byte-identical
    in the DuckDB oracle. Docs with fewer than ``k`` tokens emit no
    fingerprints.
    """
    import hashlib
    import re as _re
    from typing import Iterator

    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    import numpy as np

    mask_mod = 1 << hash_bits
    token_re = _re.compile(TOKEN_RE)

    def mapper(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ids_out, fps_out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = token_re.findall((text or "").lower())
                if len(toks) < k:
                    continue
                th = np.array(
                    [
                        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % mask_mod
                        for t in toks
                    ],
                    dtype=np.int64,
                )
                n_k = len(th) - k + 1
                kh = np.zeros(n_k, dtype=np.int64)
                for j in range(k):
                    kh = kh * base + th[j : j + n_k]
                if n_k >= window:
                    mins = sliding_window_view(kh, window).min(axis=1)
                else:
                    mins = kh.min(keepdims=True)
                fp = np.unique(mins)
                ids_out.append(np.full(len(fp), did, dtype=np.int64))
                fps_out.append(fp)
            if ids_out:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids_out),
                        "fingerprint": np.concatenate(fps_out),
                    }
                )

    return fan_out(df.select(id_col, text_col), id_col).mapInPandas(
        mapper, f"{id_col} long, fingerprint long"
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """SimHash fingerprints: per bit j, set iff at least half the distinct
    token hashes have bit j set. Token hash = first 15 hex chars of md5
    (60 bits, fits a signed long).

    Shaped for scale: explode distinct tokens so each token is hashed
    exactly ONCE, then one groupBy(doc_id) computes all ``bits`` majority
    votes as map-side-combinable sums — a single shuffle keyed by doc,
    no per-bit re-hashing. Docs with zero tokens produce no fingerprint
    (they cannot be near-dups; exact dedup handles empty texts).
    """
    exclude_generate_filter_inference(df.sparkSession)
    hashed = fan_out(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")),
        "doc_id",
    ).select(
        "doc_id",
        F.explode(F.array_distinct(tokens("_text"))).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    # F.expr-text construction (r14): the per-bit DSL loop built ~900
    # Column objects = ~900 py4j round-trips per call (several seconds
    # of driver time before any job); the SQL strings below textually
    # mirror the old DSL trees (same casts, same bit masks, same
    # left-assoc sum), so fingerprints are bit-identical.
    aggs = [F.expr("count(1) AS n")] + [
        F.expr(f"sum(CAST(((h & {1 << j}) != 0) AS INT)) AS b{j}")
        for j in range(bits)
    ]
    fp = "CAST(0 AS BIGINT)" + "".join(
        f" + (CASE WHEN b{j} * 2 >= n THEN CAST({1 << j} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    return (
        hashed.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.expr(fp).alias("simhash"))
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance of two long fingerprints: popcount(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


# BPE-ish pre-tokenization pieces: contraction suffixes, letter runs,
# ≤3-digit runs (BPE-style number chunking), single other glyphs —
# alternatives are disambiguated by first character so Java regex
# (Spark) and RE2 (DuckDB) pick identical matches.
BPE_PIECE_RE = "'[a-z]{1,2}|[a-z]+|[0-9]{1,3}|[^a-z0-9\\s]"


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token-count estimators per document (the sizing pass every
    LLM-training pipeline runs before sampling/packing):

    - ``n_ws_tokens``      — whitespace-split word count;
    - ``n_pieces``         — BPE-ish pre-tokenization pieces
      (``BPE_PIECE_RE`` over lowercased text);
    - ``n_subword_est``    — subword estimate: 1 per piece plus an extra
      split per 4 characters beyond the first for alphabetic runs
      (long/rare words fragment under BPE; digits/punct are already
      chunked by the regex).

    Tokenize-once: ``n_pieces`` and ``n_subword_est`` both reference
    the piece array, so it materializes below a repartition barrier
    (see ``doc_stats``) and the two consumers read the attribute —
    inline, the piece regex ran twice (measured 10.1 s → 4.8 s on the
    100× probe corpus).
    """
    t = F.trim(F.col(text_col))
    ws = F.when(F.length(t) == 0, F.lit(0).cast("long")).otherwise(
        F.size(F.split(t, r"\s+")).cast("long")
    )
    base = df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
        ).alias("__pieces"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    pieces = F.col("__pieces")
    sub_est = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + 1
        + F.when(
            p.rlike("^[a-z]"), F.floor((F.length(p) - 1) / 4).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return base.select(
        F.col(id_col),
        F.col("n_ws_tokens"),
        F.size(pieces).cast("long").alias("n_pieces"),
        sub_est.alias("n_subword_est"),
    )


def ngram_lm_counts(
    df: DataFrame,
    n: int = 3,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-GLOBAL n-gram counts with threshold pruning — the
    count-collection pass of KenLM-style n-gram LM estimation (and the
    vocabulary/statistics input to contamination checks and heuristic
    LMs like ``lm_perplexity``). Returns (ngram, n_occurrences) for
    every ``n``-gram of BPE pieces occurring ≥ ``min_count`` times.

    Scale: one tokenize pass; the slide is ``explode(sequence)`` +
    ``slice`` over a barrier-materialized token array (no HOF-lambda
    array indexing — the doc_ngram_diversity r5 lesson), all in one
    codegen stage. The count is a groupBy with MAP-SIDE COMBINE:
    boilerplate-heavy corpora collapse their repeats partition-locally
    before the shuffle, so shuffle volume tracks the DISTINCT-gram
    count per partition, not token count; ``min_count`` prunes the
    long singleton tail after the merge (KenLM's adjusted-count
    pruning analog).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    base = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
        ).alias("__p"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    pos = F.col("pos")
    return (
        base.where(F.size("__p") >= n)
        .select(
            F.explode(F.sequence(F.lit(0), F.size("__p") - n)).alias("pos"),
            F.col("__p"),
        )
        .select(F.concat_ws(" ", F.slice("__p", pos + 1, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def source_overlap(
    df: DataFrame,
    n: int = 8,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, the
    number of DISTINCT ``n``-grams occurring in both — the profiling
    pass behind mixing decisions (two sources sharing most of their
    n-grams are near-mirrors; budgeting both double-counts) and
    leakage checks between "independent" crawls.

    Returns (src_a, src_b, n_shared_ngrams) with src_a < src_b.

    Scale: one tokenize pass → (ngram, source) DISTINCT (an aggregate
    with map-side combine: within-source repeats collapse before the
    shuffle) → a gram-keyed self-join whose per-key group is bounded
    by |sources| (≤ |sources|²/2 pair rows per gram, NOT document
    fan-out) → a |sources|²-row count. Output is bounded by the
    source-pair count regardless of corpus size.
    """
    base = df.select(
        F.col(source_col).alias("src"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
        ).alias("__p"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    pos = F.col("pos")
    grams = (
        base.where(F.size("__p") >= n)
        .select(
            "src",
            F.explode(F.sequence(F.lit(0), F.size("__p") - n)).alias("pos"),
            F.col("__p"),
        )
        .select("src", F.concat_ws(" ", F.slice("__p", pos + 1, n)).alias("ngram"))
        .distinct()
    )
    a = grams.select(F.col("src").alias("src_a"), "ngram")
    b = grams.select(F.col("src").alias("src_b"), "ngram")
    return (
        a.join(b, "ngram")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_ngrams"))
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals: for each n in ``ns``, the total
    n-gram count and the fraction held by the single most frequent
    n-gram (high top-fraction = boilerplate / degenerate repetition —
    a standard pretraining quality filter).

    Arrow-batched ``mapInPandas`` narrow pass — same justification as
    ``winnow_fingerprints``: the pure-Catalyst formulation (array_sort
    + an F.aggregate run-length fold) runs as INTERPRETED lambdas with
    per-element struct allocation and re-evaluates the tokenize+n-gram
    child per reference (measured 21.8 s for 5 000 docs at sf0.1 vs
    <1 s here); the explode→groupBy(doc, gram) alternative shuffles
    every n-gram of the corpus. This pass tokenizes each doc once in
    NumPy and takes np.unique counts — no shuffle, no per-row JVM↔Py
    chatter beyond the Arrow batches. The mapper emits INTEGER counts
    only; the ratio is computed and rounded in Catalyst so rounding
    semantics stay engine-portable (Python's banker's rounding differs
    from Spark/DuckDB HALF_UP on exact dyadic ties like 1/32).

    Docs with fewer than n tokens get ``n_{n}grams = 0`` and a null
    fraction.
    """
    import re as _re
    from typing import Iterator

    import numpy as np
    import pandas as pd

    token_re = _re.compile(TOKEN_RE)
    ns = tuple(ns)
    raw_cols = [id_col, "n_tokens"] + [
        c for n in ns for c in (f"n_{n}grams", f"_best_{n}")
    ]
    schema = ", ".join(f"`{c}` long" for c in raw_cols)

    def mapper(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = token_re.findall((text or "").lower())
                rec = [did, len(toks)]
                for n in ns:
                    if len(toks) >= n:
                        grams = [
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        ]
                        _, counts = np.unique(grams, return_counts=True)
                        rec += [len(grams), int(counts.max())]
                    else:
                        rec += [0, 0]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=raw_cols)

    counted = fan_out(df.select(id_col, text_col), id_col).mapInPandas(
        mapper, schema
    )
    out_cols = [F.col(id_col), F.col("n_tokens")]
    for n in ns:
        total = F.col(f"n_{n}grams")
        out_cols += [
            total,
            F.when(total > 0, F.round(F.col(f"_best_{n}") / total, 4)).alias(
                f"top_{n}gram_frac"
            ),
        ]
    return counted.select(*out_cols)


# PII patterns: a conservative regex subset interpreted identically by
# Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
# repetition, \b word boundaries; no lookaround, no backrefs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def pii_scan(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII detection + redaction: per-doc counts of emails / phone
    numbers / IPv4 literals, a has_pii flag, and the redacted text's
    length + md5 (the digest makes redaction itself oracle-checkable
    without shipping full redacted bodies around).

    Redaction order matters and is fixed (email → phone → IP) so an
    address like ``a@1.2.3.4`` (no alpha TLD: not an email) degrades
    deterministically. Pure codegen narrow projection — regexp_count /
    regexp_replace inline into WholeStageCodegen; no shuffle.
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PHONE_RE))
    n_ipv4 = F.regexp_count(t, F.lit(IPV4_RE))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return df.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ipv4.cast("long").alias("n_ipv4"),
        ((n_emails + n_phones + n_ipv4) > 0).alias("has_pii"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Unigram-LM quality score (the CCNet-style filter): train a
    Laplace-smoothed unigram model on the corpus itself, then score
    every document by mean negative log-likelihood (nats/token) —
    boilerplate and in-domain text scores low, gibberish and off-corpus
    noise scores high. Returns (doc_id, n_tokens, nll, ppl).

    P(t) = (count(t) + α) / (N + α·(V+1)); unseen tokens share the α
    mass (can't occur when scoring the training corpus itself, but the
    model is reusable against other corpora — the +1 in V reserves it).

    Scale: ONE tokenizer pass behind the explode; token counts are a
    map-side-combinable aggregate; the vocabulary (V ≈ 10⁵-10⁷ rows,
    counts only, never text) joins back to the exploded tokens by token
    — Spark broadcasts it when small and shuffle-joins otherwise, both
    correct; the per-doc score is one more doc-keyed aggregate. No
    driver collect of the model.
    """
    from vectorsearch_spark.functions.text import tokens as toks_fn

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), toks_fn(text_col).alias("__toks"))
        .repartition(parallelism, F.col(id_col))
    )
    exploded = tok.select(F.col(id_col), F.explode("__toks").alias("__t"))
    counts = exploded.groupBy("__t").agg(F.count("*").alias("__c"))
    totals = counts.agg(
        F.sum("__c").alias("__N"), F.count("*").alias("__V")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "__t",
        (
            -F.log(
                (F.col("__c") + F.lit(alpha))
                / (F.col("__N") + F.lit(alpha) * (F.col("__V") + 1))
            )
        ).alias("__nll_t"),
    )
    scored = exploded.join(model, "__t")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("__nll_t").alias("__nll"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round("__nll", 6).alias("nll"),
            F.round(F.exp("__nll"), 4).alias("ppl"),
        )
    )


# explicit character maps shared by normalize_text and its SQL oracle —
# keep BOTH sides byte-for-byte consistent (curly quotes, dashes, and
# unicode spaces are the characters CCNet/Gopher-style normalizers fold
# before tokenization)
NORMALIZE_QUOTE_MAP = {
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‟": '"',
}
NORMALIZE_DASH_MAP = {"–": "-", "—": "-", "−": "-"}
NORMALIZE_SPACE_CHARS = (
    "\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
)


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """Pre-tokenization text normalization — the standard first pass of
    a web-corpus pipeline (CCNet §3.1 / Gopher-style cleanup) and the
    reason two byte-different crawls of the same page dedup together:

    1. Unicode NFC composition (``unicodedata.normalize`` — combining
       sequences fold to precomposed forms, so "é" == "e\\u0301");
    2. typographic quotes/dashes folded to ASCII (explicit maps above);
    3. unicode space separators folded to ' ' (the explicit
       ``NORMALIZE_SPACE_CHARS`` list — NOT Python's unicode-aware
       ``\\s``, whose definition differs from RE2/DuckDB and would make
       the contract engine-dependent);
    4. ASCII whitespace runs collapsed to single spaces, ends trimmed;
    5. optional lowercasing (AFTER NFC, so case folding sees composed
       forms).

    Returns (id_col, text_norm, n_chars). One narrow Arrow
    ``mapInPandas`` pass — Python is unavoidable for NFC (Spark has no
    built-in), but it is one vectorized pandas ``str`` chain per batch,
    no shuffle, no collect. Deterministic per input; every step has an
    exact DuckDB mirror (nfc_normalize + replace chain + regexp), which
    is what oracles the entry.
    """
    import re
    import unicodedata

    import pandas as pd

    trans = {ord(k): v for k, v in {**NORMALIZE_QUOTE_MAP, **NORMALIZE_DASH_MAP}.items()}
    trans.update({ord(ch): " " for ch in NORMALIZE_SPACE_CHARS})
    ws = re.compile(r"[ \t\n\r\f\v]+")  # ASCII-only: engine-portable
    _ascii_ws = " \t\n\r\f\v"

    def mapper(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            s = pdf[text_col].map(
                lambda x: None
                if x is None
                else ws.sub(
                    " ", unicodedata.normalize("NFC", x).translate(trans)
                ).strip(_ascii_ws)
            )
            if lowercase:
                s = s.str.lower()
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "text_norm": s,
                    # NULL in → NULL out (matches SQL length(NULL)),
                    # not 0 — engine-parity over invented defaults
                    "n_chars": pd.Series(
                        [None if x is None else len(x) for x in s], dtype="object"
                    ),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        mapper, schema=f"{id_col} long, text_norm string, n_chars long"
    )


# the eight Gopher "must contain ≥2 of these" stop words (Rae et al.
# 2021, Appendix A1.1 — public); mirrored literally into the SQL oracle
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, Appendix A1.1 — the
    public filter set every later web pipeline starts from): per-doc
    metrics, one boolean flag per rule, and the composite ``keep``.

    Rules, verbatim from the paper (defaults are the paper's):
      word count in [50, 100 000]; mean word length in [3, 10];
      symbol-to-word ratio ('#' and '…') ≤ 0.1; < 90 % of lines
      bullet-started; ≤ 30 % of lines ellipsis-ended; ≥ 80 % of words
      contain an alphabetic character; ≥ 2 of the eight stop words
      present.

    Definitions this implementation (and its SQL oracle) pins down
    where the paper is loose — both engines apply EXACTLY these:
      * words = text split on ASCII whitespace runs, empties dropped;
      * lines = text split on '\\n', whitespace-only lines dropped;
      * bullet-started = ltrimmed line begins with '•', '*' or '-';
      * ellipsis-ended = rtrimmed line ends with '…' or '...';
      * stop-word hit = case-folded word, stripped of non-alpha
        edge characters, equal to one of GOPHER_STOPWORDS (distinct
        membership — repeats count once, as in the paper).

    Plan shape: the word/line arrays materialize ONCE below a
    repartition barrier (the doc_stats tokenize-once pattern — Catalyst
    re-evaluates HOF lambda subtrees otherwise), then every rule is
    codegen'd attribute arithmetic above it. No UDF, no Python, one
    linear doc-keyed shuffle: scan-rate at any corpus size.
    """
    spark = df.sparkSession
    base = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), r"[ \t\n\r\f\v]+"), lambda w: w != ""
        ).alias("__words"),
        F.filter(
            F.split(F.col(text_col), "\n"),
            lambda l: F.trim(l) != "",
        ).alias("__lines"),
    ).repartition(spark.sparkContext.defaultParallelism, F.col(id_col))

    metrics, flags = gopher_quality_exprs(
        F.col("__words"),
        F.col("__lines"),
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_ratio=max_symbol_ratio,
        max_bullet_frac=max_bullet_frac,
        max_ellipsis_frac=max_ellipsis_frac,
        min_alpha_word_frac=min_alpha_word_frac,
        min_stop_hits=min_stop_hits,
    )
    keep = None
    for k in flags:
        keep = flags[k] if keep is None else (keep & flags[k])
    return base.select(
        F.col(id_col),
        *[v.alias(k) for k, v in metrics.items()],
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"),
    )


def gopher_quality_exprs(
    words: Column,
    lines: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> tuple[dict[str, Column], dict[str, Column]]:
    """The column-expression CORE of ``gopher_quality`` — (metrics,
    flags) dicts over already-materialized word/line arrays, shared by
    the standalone operator and the fused ``pipeline_web_curation``
    funnel (one definition, one oracle mirror; the funnel can't drift
    from the operator). Flags test the ROUNDED metric expressions so
    the keep decision is reproducible from the emitted columns and
    engine-portable. Callers must put the arrays behind a
    materialization barrier (repartition/exchange) — HOF lambda
    subtrees re-evaluate per reference otherwise."""
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    w1 = F.greatest(n_words, F.lit(1))
    l1 = F.greatest(n_lines, F.lit(1))
    mean_word_len = (
        F.aggregate(words, F.lit(0.0), lambda acc, w: acc + F.length(w)) / w1
    )
    symbol_ratio = (
        F.aggregate(
            words,
            F.lit(0.0),
            lambda acc, w: acc
            + F.length(w)
            - F.length(F.translate(w, "#…", "")),
        )
        / w1
    )
    bullet_frac = F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[•*-]"))) / l1
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(…|\.\.\.)$"))) / l1
    )
    alpha_frac = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / w1
    folded = F.array_distinct(
        F.transform(
            words,
            lambda w: F.regexp_replace(F.lower(w), r"^[^a-z]+|[^a-z]+$", ""),
        )
    )
    stop_hits = F.size(
        F.array_intersect(folded, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    ).cast("long")

    metrics = {
        "n_words": n_words,
        "mean_word_len": F.round(mean_word_len, 4),
        "symbol_ratio": F.round(symbol_ratio, 4),
        "bullet_frac": F.round(bullet_frac, 4),
        "ellipsis_frac": F.round(ellipsis_frac, 4),
        "alpha_word_frac": F.round(alpha_frac, 4),
        "stop_hits": stop_hits,
    }
    flags = {
        "f_word_count": (metrics["n_words"] >= min_words)
        & (metrics["n_words"] <= max_words),
        "f_mean_word_len": (metrics["mean_word_len"] >= min_mean_word_len)
        & (metrics["mean_word_len"] <= max_mean_word_len),
        "f_symbol_ratio": metrics["symbol_ratio"] <= max_symbol_ratio,
        "f_bullet": metrics["bullet_frac"] <= max_bullet_frac,
        "f_ellipsis": metrics["ellipsis_frac"] <= max_ellipsis_frac,
        "f_alpha_words": metrics["alpha_word_frac"] >= min_alpha_word_frac,
        "f_stop_words": metrics["stop_hits"] >= min_stop_hits,
    }
    return metrics, flags


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2 — the public filter
    set behind the C4 corpus): line-level retention + document-level
    rejection, returning the CLEANED text alongside the decision.

    Line rules (a line survives iff ALL hold):
      * ends in a terminal punctuation mark — '.', '!', '?' or '"'
        (after rtrim);
      * has ≥ ``min_line_words`` whitespace words;
      * does not contain the word "javascript" (case-insensitive —
        the boilerplate tell).

    Document rules (flags + composite ``keep``):
      * ≥ ``min_sentences`` surviving lines (C4 counts sentences; this
        implementation pins sentence := surviving line);
      * no "lorem ipsum" anywhere (case-insensitive);
      * no '{' anywhere (code tell).

    Output: (id, text_clean = surviving lines joined with '\\n',
    n_lines, n_kept_lines, f_min_sentences, f_no_lorem, f_no_brace,
    keep). Same plan shape as ``gopher_quality``: the line array
    materializes once below a repartition barrier; every rule above it
    is codegen'd HOF/attribute arithmetic — no UDF, no Python, one
    linear doc-keyed shuffle.
    """
    spark = df.sparkSession
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        F.filter(
            F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != ""
        ).alias("__lines"),
    ).repartition(spark.sparkContext.defaultParallelism, F.col(id_col))

    cols = c4_clean_exprs(
        F.col(text_col),
        F.col("__lines"),
        min_line_words=min_line_words,
        min_sentences=min_sentences,
    )
    return base.select(
        F.col(id_col), *[v.alias(k) for k, v in cols.items()]
    )


def c4_clean_exprs(
    text: Column,
    lines: Column,
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> dict[str, Column]:
    """The column-expression CORE of ``c4_clean`` — every output column
    (text_clean, counts, flags, keep) over the raw text and an
    already-materialized line array; shared by the standalone operator
    and the fused ``pipeline_web_curation`` funnel. Callers must put
    the line array behind a materialization barrier."""

    def line_ok(l: Column) -> Column:
        words = F.filter(F.split(l, r"[ \t\r\f\v]+"), lambda w: w != "")
        return (
            F.rtrim(l).rlike(r'[.!?"]$')
            & (F.size(words) >= min_line_words)
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    f_min_sentences = F.size(kept) >= min_sentences
    f_no_lorem = ~F.lower(text).contains("lorem ipsum")
    f_no_brace = ~text.contains("{")
    return {
        "text_clean": F.array_join(kept, "\n"),
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "f_min_sentences": f_min_sentences,
        "f_no_lorem": f_no_lorem,
        "f_no_brace": f_no_brace,
        "keep": f_min_sentences & f_no_lorem & f_no_brace,
    }


# Gopher A1.2 thresholds (Rae et al. 2021, Table A1) — mirrored into
# the SQL oracle and the flag columns
GOPHER_REP_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher repetition-removal rules (Rae et al. 2021 Appendix A1.2 —
    the OTHER half of the Gopher filter; ``gopher_quality`` is A1.1):
    within-document duplicate-line / duplicate-paragraph fractions (by
    occurrence and by character mass), most-frequent-n-gram character
    fractions (n = 2, 3, 4), and duplicated-n-gram character fractions
    (n = 5…10), each with its paper threshold as a flag plus the
    composite ``keep``.

    Pinned definitions (the paper is loose; BOTH engines apply exactly
    these):
      * lines = '\\n' segments, space-only-trimmed (ASCII 0x20 — the
        exact semantics of Spark ``F.trim`` and DuckDB ``trim()``;
        tab/CR edges count as content) for comparison and char
        counts, segments empty after that trim dropped; paragraphs =
        '\\n\\n' segments, same treatment;
      * an occurrence is "duplicate" if its (trimmed) text appears ≥ 2
        times in the doc; occurrence fraction counts every occurrence,
        char fraction weights by trimmed length over the total trimmed
        length of all segments;
      * words = lowercased ASCII-whitespace split; an n-gram's text is
        its words joined by single spaces; total char mass =
        length(words joined by single spaces);
      * top-n-gram char fraction = max over grams of
        occurrences·length(gram) / total char mass (the max of the
        product — no tie-break needed);
      * dup-n-gram char fraction = Σ over ALL occurrences of grams
        occurring ≥ 2 of length(gram) / total char mass; overlapping
        occurrences are NOT deduplicated (the common reimplementation
        simplification, pinned);
      * empty denominators give fraction 0.0 (greatest(denom, 1)).

    Note: the top-n-gram rules use the most frequent gram at ANY count
    (count 1 included, as in the public reimplementations), so a very
    short document can exceed the 16-20 % thresholds with a single
    occurrence — by design, A1.1's 50-word minimum (``gopher_quality``)
    screens those documents before this filter is consulted.

    Plan shape: the counting is one Arrow ``mapInPandas`` pass emitting
    INTEGER numerators/denominators only (the ``repetition_stats``
    lesson: the pure-Catalyst nested-HOF form is O(G²) interpreted
    lambdas and re-evaluates the tokenizer per reference — measured
    20× slower); every fraction, rounding, and flag is computed in
    Catalyst so ratio semantics stay engine-portable. No shuffle.
    """
    import re as _re
    from collections import Counter
    from typing import Iterator

    import pandas as pd

    int_cols = [
        "n_lines", "dup_line_occ", "line_chars", "dup_line_chars",
        "n_paras", "dup_para_occ", "para_chars", "dup_para_chars",
        "word_chars",
        "top2_prod", "top3_prod", "top4_prod",
        "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars",
        "dup9_chars", "dup10_chars",
    ]
    schema = f"`{id_col}` long, " + ", ".join(f"`{c}` long" for c in int_cols)
    ws = _re.compile(r"[ \t\n\r\f\v]+")

    def _seg_stats(segs: list[str]) -> tuple[int, int, int, int]:
        cnt = Counter(segs)
        total_chars = sum(len(s) for s in segs)
        dup_occ = sum(c for c in cnt.values() if c > 1)
        dup_chars = sum(len(s) * c for s, c in cnt.items() if c > 1)
        return len(segs), dup_occ, total_chars, dup_chars

    def mapper(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                # space-ONLY trim — pinned to match Spark F.trim and
                # DuckDB trim() defaults (both strip 0x20 only); a
                # '\t'/'\r'-edged line is content, a '\t'-only line is
                # a real (non-dropped) line, in ALL THREE engines
                lines = [s.strip(" ") for s in t.split("\n") if s.strip(" ")]
                paras = [s.strip(" ") for s in t.split("\n\n") if s.strip(" ")]
                words = [w for w in ws.split(t.lower()) if w]
                word_chars = len(" ".join(words))
                rec = [
                    int(did),
                    *_seg_stats(lines),
                    *_seg_stats(paras),
                    word_chars,
                ]
                for n in (2, 3, 4):
                    grams = [
                        " ".join(words[i : i + n])
                        for i in range(len(words) - n + 1)
                    ]
                    cnt = Counter(grams)
                    rec.append(
                        max((c * len(g) for g, c in cnt.items()), default=0)
                    )
                for n in range(5, 11):
                    grams = [
                        " ".join(words[i : i + n])
                        for i in range(len(words) - n + 1)
                    ]
                    cnt = Counter(grams)
                    rec.append(
                        sum(len(g) * c for g, c in cnt.items() if c > 1)
                    )
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[id_col] + int_cols)

    counted = fan_out(df.select(id_col, text_col), id_col).mapInPandas(
        mapper, schema
    )

    def frac(num: str, den: str) -> Column:
        return F.round(F.col(num) / F.greatest(F.col(den), F.lit(1)), 4)

    metrics = {
        "dup_line_frac": frac("dup_line_occ", "n_lines"),
        "dup_para_frac": frac("dup_para_occ", "n_paras"),
        "dup_line_char_frac": frac("dup_line_chars", "line_chars"),
        "dup_para_char_frac": frac("dup_para_chars", "para_chars"),
        "top_2gram_char_frac": frac("top2_prod", "word_chars"),
        "top_3gram_char_frac": frac("top3_prod", "word_chars"),
        "top_4gram_char_frac": frac("top4_prod", "word_chars"),
        "dup_5gram_char_frac": frac("dup5_chars", "word_chars"),
        "dup_6gram_char_frac": frac("dup6_chars", "word_chars"),
        "dup_7gram_char_frac": frac("dup7_chars", "word_chars"),
        "dup_8gram_char_frac": frac("dup8_chars", "word_chars"),
        "dup_9gram_char_frac": frac("dup9_chars", "word_chars"),
        "dup_10gram_char_frac": frac("dup10_chars", "word_chars"),
    }
    m = counted.select(
        F.col(id_col), *[v.alias(k) for k, v in metrics.items()]
    )
    out = m.select(
        "*",
        *[
            (F.col(k) <= thr).alias("f_" + k)
            for k, thr in GOPHER_REP_THRESHOLDS.items()
        ],
    )
    keep = None
    for k in GOPHER_REP_THRESHOLDS:
        c = F.col("f_" + k)
        keep = c if keep is None else (keep & c)
    return out.select("*", keep.alias("keep"))


def fineweb_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_punct_frac: float = 0.12,
    max_short_line_frac: float = 0.67,
    short_line_chars: int = 30,
    max_dup_line_char_frac: float = 0.10,
) -> DataFrame:
    """FineWeb's three custom quality filters (Penedo et al. 2024 §3.6
    — the filters FineWeb adds AFTER Gopher + C4, derived from their
    ablations; public): a document is kept iff

      * ≥ ``min_line_punct_frac`` of its lines end in terminal
        punctuation ('.', '!', '?' or '"' — the C4 terminal set);
      * ≤ ``max_short_line_frac`` of its lines are shorter than
        ``short_line_chars`` characters;
      * ≤ ``max_dup_line_char_frac`` of its line character mass is in
        duplicated lines (same pinned definition as
        ``gopher_repetition``: space-only-trimmed segments — ``F.trim``
        here, ``str.strip(' ')`` in the Arrow mapper there, DuckDB
        ``trim()`` in the oracles, all three 0x20-only — every
        occurrence of a ≥2-count line counts).

    Pure codegen: the trimmed-line array materializes once below a
    repartition barrier; all three metrics are HOF arithmetic above it
    (the duplicate scan is the nested-filter O(L²) form — lines per doc
    are few, unlike the n-grams that forced ``gopher_repetition``'s
    Arrow pass). No UDF, no Python, one linear doc-keyed shuffle.
    """
    spark = df.sparkSession
    base = df.select(
        F.col(id_col),
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("__lines"),
    ).repartition(spark.sparkContext.defaultParallelism, F.col(id_col))

    metrics, flags = fineweb_quality_exprs(
        F.col("__lines"),
        min_line_punct_frac=min_line_punct_frac,
        max_short_line_frac=max_short_line_frac,
        short_line_chars=short_line_chars,
        max_dup_line_char_frac=max_dup_line_char_frac,
    )
    keep = None
    for k in flags:
        keep = flags[k] if keep is None else (keep & flags[k])
    return base.select(
        F.col(id_col),
        *[v.alias(k) for k, v in metrics.items()],
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"),
    )


def fineweb_quality_exprs(
    lines: Column,
    min_line_punct_frac: float = 0.12,
    max_short_line_frac: float = 0.67,
    short_line_chars: int = 30,
    max_dup_line_char_frac: float = 0.10,
) -> tuple[dict[str, Column], dict[str, Column]]:
    """The column-expression CORE of ``fineweb_quality`` — (metrics,
    flags) dicts over an already-materialized TRIMMED-line array;
    shared by the standalone operator and the fused
    ``pipeline_web_curation`` funnel. Callers must put the array behind
    a materialization barrier."""
    n_lines = F.size(lines).cast("long")
    l1 = F.greatest(n_lines, F.lit(1))
    punct_frac = F.size(F.filter(lines, lambda l: l.rlike(r'[.!?"]$'))) / l1
    short_frac = (
        F.size(F.filter(lines, lambda l: F.length(l) < short_line_chars)) / l1
    )
    total_chars = F.aggregate(lines, F.lit(0.0), lambda acc, l: acc + F.length(l))
    dup_chars = F.aggregate(
        lines,
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(
            F.size(F.filter(lines, lambda y: y == x)) > 1, F.length(x)
        ).otherwise(F.lit(0)),
    )
    dup_frac = dup_chars / F.greatest(total_chars, F.lit(1.0))

    metrics = {
        "n_lines": n_lines,
        "line_punct_frac": F.round(punct_frac, 4),
        "short_line_frac": F.round(short_frac, 4),
        "dup_line_char_frac": F.round(dup_frac, 4),
    }
    flags = {
        "f_line_punct": metrics["line_punct_frac"] >= min_line_punct_frac,
        "f_short_lines": metrics["short_line_frac"] <= max_short_line_frac,
        "f_dup_line_chars": metrics["dup_line_char_frac"] <= max_dup_line_char_frac,
    }
    return metrics, flags
