"""Corpus curation operators: deterministic sampling and token-budget
shard packing — the selection/packing passes a large-scale training-data
pipeline runs after dedup + quality scoring (north-star extensions per
BASELINE.json; no reference analog).

Scale design:

- ``curate_sample``: pure codegen narrow filter. Selection is
  HASH-determined (md5 of the doc id against a per-language rate), not
  ``rand()``-based — reruns, retries, and engines all agree on the kept
  set, which is what makes the pass auditable and the oracle exact.
- ``pack_token_shards``: assigns docs (ordered by id) to contiguous
  shards of ≤ ``budget`` tokens using a GLOBAL prefix sum computed in
  two partition-parallel passes (per-partition subtotals → broadcast
  offsets → within-partition cumsum), the same shape as dense-gid
  assignment (index/ingest.py with_dense_ids) — a naive
  ``Window.orderBy(...)`` with no partition key would funnel the whole
  table through ONE task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# selection granularity for hash-rate comparisons: md5-derived uniform
# integer in [0, 1e6) — mirrored literally in the DuckDB oracle
_RATE_MOD = 1_000_000


def hash_rate_col(id_col: str) -> F.Column:
    """Deterministic uniform [0, 1e6) selector: first 15 hex chars of
    md5(doc_id) mod 1e6 (portable: Spark conv/md5 ≡ DuckDB)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % _RATE_MOD
    )


def curate_sample(
    df: DataFrame,
    rates_by_lang: dict[str, float],
    min_quality: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    default_rate: float = 0.0,
) -> DataFrame:
    """Quality-gated, per-language deterministic sampling: keep a doc
    iff ``quality_score >= min_quality`` AND its hash selector falls
    under its language's rate. Languages absent from ``rates_by_lang``
    get ``default_rate``. Returns (doc_id, pred_lang, quality_score) of
    the kept docs — ONE tokenizer pass, rerun-stable."""
    from vectorsearch_spark.functions.text import tokens
    from vectorsearch_spark.operators.text import LANG_LEXICONS, doc_stats_cols

    # Tokenize-once barrier (the dedup.py:87-93 / doc_stats pattern):
    # quality stats reference the token array 5× and the per-language
    # lexicon scores |langs|× more; inline, every reference re-runs
    # the tokenizer regex (Catalyst does not hoist the common
    # subexpression out of HOF lambdas — 69.9 s inline vs 5.8 s for
    # barrier + checkpoint on the 100× probe corpus, 500 k docs). The
    # array materializes below a repartition and crosses the exchange
    # as data; one linear shuffle buys |refs|−1 regex passes.
    langs = sorted(LANG_LEXICONS)
    tok_base = df.select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    toks = F.col("__toks")
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(LANG_LEXICONS[la]))).alias(f"_s_{la}")
        for la in langs
    ]
    # Lazy localCheckpoint = a HARD plan barrier on the post-stats rows
    # (id + a dozen numbers per doc). Exchanges and nondeterministic
    # dummy columns do NOT stop Catalyst here: the keep-filters push
    # through repartitions, column pruning deletes unused
    # nondeterministic members, and the pushed predicates substitute
    # the quality/argmax trees all the way into the scan, re-running
    # the tokenizer once per referenced score tree (measured 50-70 s
    # vs 5.8 s at the 100× probe corpus, 500 k docs). Lineage truncation is the
    # one boundary nothing crosses; the stored footprint is the narrow
    # stats row, not text. (A persisted per-doc stats table is the
    # equivalent contract at petabyte scale.)
    base = tok_base.select(
        F.col(id_col), *doc_stats_cols(text_col, toks=toks), *scores
    ).localCheckpoint(eager=False)
    best = F.greatest(*[F.col(f"_s_{la}") for la in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for la in langs:
        pred = pred.when(F.col(f"_s_{la}") == best, F.lit(la))
    # INTEGER thresholds: the oracle truncates with int(), and an
    # integer-vs-fractional-double comparison diverges on boundary hash
    # values whenever r*1e6 is not exactly representable (~1% of
    # 6-decimal rates) — int(round(·)) on both sides is exact
    rate = F.lit(int(round(float(default_rate) * _RATE_MOD)))
    for code, r in sorted(rates_by_lang.items()):
        rate = F.when(
            F.col("pred_lang") == code, F.lit(int(round(float(r) * _RATE_MOD)))
        ).otherwise(rate)
    return (
        base.select(F.col(id_col), pred.alias("pred_lang"), "quality_score")
        .filter(F.col("quality_score") >= min_quality)
        .filter(hash_rate_col(id_col) < rate)
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic dataset splitting: every row gets a split label
    ('train'/'val'/'test'/...) by its hash selector falling into
    cumulative weight bands — the split is a PURE FUNCTION of the id
    (rerun-stable, engine-agnostic, join-free), unlike randomSplit()
    whose assignment changes with partitioning and seed plumbing.
    Weights are normalized; band edges use the same integer-threshold
    exactness contract as ``curate_sample``. Adds a ``split`` column.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    sel = hash_rate_col(id_col)
    acc = 0.0
    expr = None
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += float(wgt) / total
        edge = int(round(acc * _RATE_MOD))
        expr = (
            F.when(sel < edge, F.lit(name))
            if expr is None
            else expr.when(sel < edge, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def _global_token_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    count_col: str | None,
) -> DataFrame:
    """(id, n_tokens, off) where ``off`` is the EXCLUSIVE prefix sum of
    token counts in ``id_col`` order — the shared core of
    ``pack_token_shards`` and ``pack_sequences``.

    Two-phase global prefix sum (NO single-task global window): range-
    partition by id, count subtotals per partition (tiny driver
    collect, O(#partitions)), broadcast the running offsets back, then
    a WITHIN-partition cumsum window finishes the job — every stage is
    partition-parallel. Result is checkpointed (callers fan out from
    it)."""
    from vectorsearch_spark.operators.text import token_counts

    if count_col is None:
        t = token_counts(df, id_col, text_col).select(
            id_col, F.col("n_subword_est").alias("n_tokens")
        )
    else:
        t = df.select(F.col(id_col), F.col(count_col).cast("long").alias("n_tokens"))
    t = (
        t.repartitionByRange(id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()  # two passes must see identical partitioning
    )
    subtotals = {
        r["_pid"]: r["s"]
        for r in t.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    out = (
        t.join(off_df, "_pid")
        .withColumn("_cum_incl", F.sum("n_tokens").over(w) + F.col("_off"))
        .select(
            id_col,
            "n_tokens",
            (F.col("_cum_incl") - F.col("n_tokens")).alias("off"),
        )
    )
    # materialize before unpersisting the two-pass handle
    out = out.localCheckpoint()
    t.unpersist()
    return out


def pack_token_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
) -> DataFrame:
    """Pack documents (in ``id_col`` order) into contiguous shards of at
    most ``budget`` tokens: shard_id = floor(exclusive_prefix_sum /
    budget). Deterministic; a doc larger than the budget still gets its
    own shard slot (its start offset defines it).

    Returns (doc_id, n_tokens, shard_id). ``count_col`` may name a
    pre-computed token-count column; otherwise ``n_subword_est`` from
    ``token_counts`` is used. Prefix-sum plumbing (and its
    no-single-task-window scale story) in ``_global_token_offsets``.
    """
    offs = _global_token_offsets(df, id_col, text_col, count_col)
    return offs.select(
        id_col,
        "n_tokens",
        F.floor(F.col("off") / F.lit(int(budget))).cast("long").alias("shard_id"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
) -> DataFrame:
    """GPT-style pretraining sequence packing: concatenate every
    document's tokens in ``id_col`` order into ONE stream and cut it
    into fixed ``seq_len`` examples — documents SPLIT across example
    boundaries (zero padding waste, the standard causal-LM packing;
    ``pack_token_shards`` is the doc-ALIGNED sibling that never splits
    a document).

    Returns one row per (example, document) segment:
    (example_id, doc_id, start_tok, n_tok) — start_tok is the offset
    WITHIN the document; segments of one example concatenate (in
    doc_id order) to exactly ``seq_len`` tokens except the final
    partial example. Zero-token docs contribute nothing.

    Scale: the global offset is the two-phase partition-parallel
    prefix sum of ``_global_token_offsets``; each doc then fans out to
    its ⌈n/seq_len⌉+1 touched examples with one codegen
    explode(sequence) — no shuffle beyond the prefix sum's range
    partition, and the result is already example-clustered for a
    downstream example-keyed write."""
    if seq_len < 1:
        raise ValueError("seq_len must be ≥ 1")
    L = int(seq_len)
    offs = _global_token_offsets(df, id_col, text_col, count_col).where(
        F.col("n_tokens") > 0
    )
    end = F.col("off") + F.col("n_tokens")  # exclusive
    ex = F.col("ex")
    return (
        offs.select(
            id_col,
            "n_tokens",
            "off",
            F.explode(
                F.sequence(F.floor(F.col("off") / L), F.floor((end - 1) / L))
            ).alias("ex"),
        )
        .select(
            ex.cast("long").alias("example_id"),
            F.col(id_col),
            (F.greatest(ex * L, F.col("off")) - F.col("off")).cast("long").alias("start_tok"),
            (
                F.least((ex + 1) * L, end) - F.greatest(ex * L, F.col("off"))
            ).cast("long").alias("n_tok"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-length training-sequence chunking: split each document's
    token stream into chunks of ``chunk_tokens`` pieces starting every
    ``stride`` tokens (``stride < chunk_tokens`` ⇒ overlapping context
    windows, the standard LLM-pretraining shape; default = no overlap).

    Chunk starts are ``0, stride, 2·stride, …`` and generation stops
    once a chunk reaches the end of the document:
    ``n_chunks = 1 + ceil(max(n − chunk_tokens, 0) / stride)`` — every
    token is covered, no fully-redundant tail chunk, and an empty
    document yields zero chunks. The last chunk may be shorter.
    ``stride > chunk_tokens`` is allowed and means SAMPLING, not
    coverage: tokens between chunk end and the next start are skipped
    (a cheap way to subsample long documents at a fixed context
    length); the every-token-covered invariant only holds for
    ``stride <= chunk_tokens``. In sampling mode chunk starts are
    additionally bounded by the document end (``start < n``), so the
    chunk count is ``min(1 + ceil(max(n − chunk_tokens, 0) / stride),
    1 + floor((n − 1) / stride))`` — without the second bound a doc
    with n=10, chunk=8, stride=16 would emit a phantom chunk_idx 1 at
    start_tok 16 with negative n_tokens and empty text.

    Returns (doc_id, chunk_idx, start_tok, n_tokens, chunk_text) where
    ``start_tok`` is the 0-based token offset and ``chunk_text`` the
    space-joined pieces (tokenization = ``BPE_PIECE_RE``, the
    ``token_counts`` pre-tokenizer).

    Scale: tokenize-once barrier (the piece array is referenced by the
    count arithmetic AND every emitted chunk — inline, Catalyst re-runs
    the regex per reference), then ``explode(sequence(...))`` +
    ``slice`` — all codegen, no shuffle beyond the barrier repartition,
    output rows ≈ input tokens / stride. The explode fan-out is
    per-document and bounded by document length; one pathological
    book-length doc produces len/stride rows, not a hot partition.
    """
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    if stride is None:
        stride = chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    base = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
        ).alias("__p"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    n = F.size("__p")
    # integer ceil-div, capped so every chunk start falls inside the doc
    # (the cap only binds when stride > chunk_tokens); identical
    # arithmetic is mirrored in the oracle
    n_chunks = F.least(
        F.lit(1)
        + F.floor(
            (F.greatest(n - chunk_tokens, F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("int"),
        F.lit(1) + F.floor((n - 1) / F.lit(stride)).cast("int"),
    )
    start = F.col("chunk_idx") * stride
    return (
        base.where(n > 0)
        .select(
            F.col(id_col),
            F.col("__p"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.cast("long").alias("start_tok"),
            F.least(F.lit(chunk_tokens), F.size("__p") - start)
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice("__p", start + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
        )
    )


def passage_dedup(
    df: DataFrame,
    chunk_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-global passage-level deduplication (the C4/RefinedWeb
    "remove repeated spans across documents" pass, at chunk
    granularity): split every document into NON-overlapping
    ``chunk_tokens``-token chunks (``chunk_documents`` with stride =
    chunk), keep only the globally FIRST occurrence of each distinct
    chunk text (ordered by (doc_id, chunk_idx) — deterministic
    min-position keeper), and reassemble each document from its
    surviving chunks in order.

    Returns (doc_id, n_chunks, n_kept, kept_hash) where ``kept_hash``
    is md5 of the space-joined surviving chunk text — a compact,
    engine-portable witness of the reassembled document (returning
    full deduped text at 100 TB would make the RESULT the bottleneck;
    callers wanting text swap the final select).

    Scale: one chunking pass (tokenize-once barrier inside
    chunk_documents), ONE shuffle keyed by chunk_text for the
    keep-first window (the text travels anyway for reassembly, and
    keying on the text itself — not a hash of it — makes a hash
    collision marking a unique chunk as duplicate impossible) —
    linear in chunks; boilerplate-heavy corpora
    concentrate identical chunks onto hot hash keys, but each group
    reduces to a single row_number pass over its occurrences (the skew
    is the duplicates themselves — exactly the rows being removed),
    and the reassembly groupBy is doc-keyed (naturally balanced).
    """
    chunks = chunk_documents(
        df, chunk_tokens=chunk_tokens, stride=chunk_tokens,
        id_col=id_col, text_col=text_col,
    )
    w = Window.partitionBy("chunk_text").orderBy(id_col, "chunk_idx")
    kept = chunks.withColumn("__rn", F.row_number().over(w))
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((F.col("__rn") == 1).cast("long")).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("__rn") == 1,
                                    F.struct("chunk_idx", "chunk_text"),
                                )
                            )
                        ),
                        lambda s: s["chunk_text"],
                    ),
                )
            ).alias("kept_hash"),
        )
    )


def line_dedup(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line-level boilerplate removal (the RefinedWeb / CCNet line
    dedup pass — Penedo et al. 2023, arXiv:2306.01116 §3.4): a line
    whose trimmed text occurs in ≥ ``min_docs`` DISTINCT documents is
    boilerplate (nav menus, cookie banners, footers) and is dropped
    from EVERY document — unlike ``passage_dedup``'s keep-first, no
    occurrence survives, because boilerplate is noise in all its
    copies, not content owned by its first author. Blank lines are
    never boilerplate (structure, not content).

    The granularity between the corpus's other two text-dedup passes:
    ``passage_dedup`` is chunk-aligned (64 tokens), ``repeated_spans``
    is arbitrary-offset n-gram; this one follows author-drawn line
    boundaries — the unit web boilerplate actually repeats at.

    Returns (doc_id, n_lines, n_kept, n_boiler, kept_hash) — kept_hash
    is md5 of the surviving lines re-joined with newlines, the compact
    result contract of ``passage_dedup`` (full rewritten text at
    100 TB would make the RESULT the bottleneck).

    Scale: one split/explode pass; the document-frequency count is
    (line, doc) DISTINCT then a line-keyed count — both with map-side
    partial aggregation, shuffle tracks distinct lines, not
    occurrences. The mark join is line-keyed with a ≤1-row-per-key
    build side; its skew IS the boilerplate being removed (a line in
    10⁶ docs puts 10⁶ probe rows on one key — AQE skew-join splits
    it, and each probe row only reads one boolean). Keying on the
    trimmed text, not a hash: a collision could never false-drop a
    unique line (the ``passage_dedup`` stance). Reassembly groups on
    the doc id — naturally balanced.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be ≥ 2")
    lines = _line_rows(df, id_col, text_col)
    boiler = (
        _line_doc_counts(lines, id_col)
        .where(F.col("__nd") >= int(min_docs))
        .select("__key", F.lit(True).alias("__boiler"))
    )
    return _line_report(lines.join(boiler, "__key", "left"), id_col)


def _line_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line, __key trimmed-line) — the line explosion both
    ``line_dedup`` and the streaming fold
    (``dedup.fold_line_dedup_batch``) compile from; batch/streaming
    parity depends on identical splitting and keying."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("__key", F.trim(F.col("line")))


def _line_doc_counts(lines: DataFrame, id_col: str) -> DataFrame:
    """(key, __nd distinct-doc count) over non-blank keys — map-side
    combinable both stages; blank lines are never boilerplate."""
    return (
        lines.where(F.col("__key") != "")
        .select("__key", id_col)
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__nd"))
    )


def _line_report(marked: DataFrame, id_col: str) -> DataFrame:
    """Per-doc line-dedup result from marked rows (id, pos, line,
    __boiler nullable): (id, n_lines, n_kept, n_boiler, kept_hash)."""
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("__boiler").isNull().cast("long")).alias("n_kept"),
        F.sum(F.col("__boiler").isNotNull().cast("long")).alias("n_boiler"),
        F.md5(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            )
        ).alias("kept_hash"),
    )


def select_top_fraction(
    df: DataFrame,
    frac: float,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    bins: int = 1024,
) -> DataFrame:
    """EXACTLY the per-group top ``frac`` of rows by (``score_col``
    DESC, ``id_col`` ASC) — the per-source quality-percentile cut of
    production curation recipes ("keep each source's best 20%"), with
    keep-count ceil(frac · n_group).

    The naive form is one window over ``group_col`` — but source
    cardinality is small, so at 100 TB that sorts multi-TB partitions.
    This is a distributed SELECTION instead (exact, same result):

    1. one bounded aggregate per group: count + score min/max
       (|groups| driver rows — the temperature_budget_mix contract);
    2. one histogram aggregate over ``bins`` equal-width score bins
       (|groups|·bins driver rows); walking each group's histogram
       from the top finds the CUTOFF BIN b*: everything in higher
       bins is kept outright, everything lower is dropped — no sort
       touches them;
    3. only the border bin (expected n/bins of the group) pays the
       exact (score DESC, id ASC) window for the remaining slots.

    Ties across the full group resolve identically to the naive
    window because ties share a bin and are ranked there. Returns the
    kept rows (all input columns). Degenerate groups (constant score
    → one bin) fall back to the full window for that group only.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError("frac must be in (0, 1]")
    import math

    spark = df.sparkSession
    sc_d = F.col(score_col).cast("double")
    # null/NaN scores are unrankable: NaN poisons the group's max (so
    # every bin index casts to null) and null inflates __n so the keep
    # target over-counts — exclude them up front so "top frac" means
    # top frac OF THE RANKABLE ROWS, exactly the window semantics
    df = df.where(sc_d.isNotNull() & ~F.isnan(sc_d))
    stats = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(sc_d).alias("__lo"),
            F.max(sc_d).alias("__hi"),
        )
        .collect()
    )
    if not stats:
        return df
    span = {
        r[group_col]: (int(r["__n"]), float(r["__lo"]), float(r["__hi"]))
        for r in stats
    }
    stats_df = spark.createDataFrame(
        [(g, float(lo), float(hi)) for g, (n, lo, hi) in span.items()],
        [group_col, "__lo", "__hi"],
    )
    # bin index identical in both passes: pure function of (row, stats)
    width = (F.col("__hi") - F.col("__lo")) / float(bins)
    bin_col = F.when(width <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(score_col).cast("double") - F.col("__lo")) / width),
            F.lit(bins - 1),
        )
    ).cast("int")
    binned = df.join(F.broadcast(stats_df), group_col).withColumn("__bin", bin_col)

    hist = {
        (r[group_col], r["__bin"]): r["__c"]
        for r in binned.groupBy(group_col, "__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    }
    cuts = []
    for g, (n, _lo, _hi) in span.items():
        target = math.ceil(frac * n)
        kept_above = 0
        bstar = 0
        for b in range(bins - 1, -1, -1):
            c = hist.get((g, b), 0)
            if kept_above + c >= target:
                bstar = b
                break
            kept_above += c
        cuts.append((g, bstar, target - kept_above))
    cut_df = spark.createDataFrame(cuts, [group_col, "__bstar", "__take"])
    marked = binned.join(F.broadcast(cut_df), group_col)
    kept_hi = marked.filter(F.col("__bin") > F.col("__bstar"))
    border = marked.filter(F.col("__bin") == F.col("__bstar"))
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).cast("double").desc(), F.col(id_col).asc()
    )
    border_kept = (
        border.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__take"))
        .drop("__rn")
    )
    return kept_hi.unionByName(border_kept).select(*df.columns)


def _tokenized_base(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __p token array) behind a checkpoint barrier. The barrier
    matters: __p is referenced by the gram slide AND the final token
    count; un-checkpointed, Catalyst substitutes the regex into both
    subtrees (the doc_ngram_diversity r5 lesson)."""
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    return (
        df.select(
            F.col(id_col),
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
            ).alias("__p"),
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
        .localCheckpoint(eager=False)
    )


def _gram_slide(base: DataFrame, span_tokens: int, id_col: str) -> DataFrame:
    """Slide a ``span_tokens`` window one token at a time: (id, pos,
    __h md5-of-gram-text). explode(sequence) + slice in one codegen
    stage — gram TEXT never leaves the stage, only 128-bit keys."""
    if span_tokens < 2:
        raise ValueError("span_tokens must be ≥ 2")
    pos = F.col("pos")
    return (
        base.where(F.size("__p") >= span_tokens)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), F.size("__p") - span_tokens)
            ).alias("pos"),
            F.col("__p"),
        )
        .select(
            F.col(id_col),
            pos,
            F.md5(F.concat_ws(" ", F.slice("__p", pos + 1, span_tokens))).alias("__h"),
        )
    )


def _mark_occurrences(grams: DataFrame, id_col: str) -> DataFrame:
    """Rank every gram occurrence within its hash group: adds ``__rn``
    (global (id, pos) order within the hash) and ``__cnt`` (group
    size). A duplicate occurrence is ``__cnt > 1 AND __rn > 1`` — the
    globally-first occurrence is kept. One window shuffle keyed by the
    128-bit md5 (collision odds documented in ``repeated_spans``)."""
    w = Window.partitionBy("__h").orderBy(id_col, "pos")
    return grams.select(
        F.col(id_col),
        "pos",
        "__h",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("__h").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__cnt"),
    )


def _merge_intervals(dup: DataFrame, id_col: str) -> DataFrame:
    """Classic SQL interval merge over (id, s, e): a row starts a new
    span iff its start exceeds the running max end of all earlier
    intervals in the doc. Windows on the doc id — naturally balanced."""
    wd = Window.partitionBy(id_col).orderBy("s")
    prev_end = F.max("e").over(wd.rowsBetween(Window.unboundedPreceding, -1))
    return (
        dup.withColumn(
            "__new", (prev_end.isNull() | (F.col("s") > prev_end)).cast("long")
        )
        .withColumn("__grp", F.sum("__new").over(wd))
        .groupBy(id_col, "__grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .drop("__grp")
    )


def _span_report(base: DataFrame, intervals: DataFrame, id_col: str) -> DataFrame:
    """Final per-doc span map: (id, n_tokens, dup_spans, dup_tokens,
    dup_ratio) — the shared output contract of ``repeated_spans`` and
    the streaming fold (``dedup.fold_repeated_spans_batch``)."""
    counts = base.select(F.col(id_col), F.size("__p").cast("long").alias("n_tokens"))
    merged = intervals.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("dup_spans"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("dup_tokens"),
    )
    return counts.join(merged, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest("n_tokens", F.lit(1)),
            6,
        ).alias("dup_ratio"),
    )


def _span_base_and_intervals(
    df: DataFrame, span_tokens: int, id_col: str, text_col: str
) -> "tuple[DataFrame, DataFrame]":
    """Shared core of ``repeated_spans``/``cut_repeated_spans``:
    returns (base, intervals) — base = (id, __p token array) behind a
    checkpoint barrier; intervals = (id, s, e) MERGED duplicate spans
    (all-but-first occurrences of every repeated ``span_tokens``-gram,
    consecutive marks coalesced). See ``repeated_spans`` for the
    algorithm, semantics, and scale notes. Composed from the same
    tokenize/slide/mark/merge stages the streaming fold reuses
    (``dedup.fold_repeated_spans_batch``) — batch/streaming parity
    depends on byte-identical tokenization+hashing, so both paths
    compile from these single definitions."""
    if span_tokens < 2:
        raise ValueError("span_tokens must be ≥ 2")
    base = _tokenized_base(df, id_col, text_col)
    grams = _gram_slide(base, span_tokens, id_col)
    dup = (
        _mark_occurrences(grams, id_col)
        .where((F.col("__cnt") > 1) & (F.col("__rn") > 1))
        .select(
            F.col(id_col),
            F.col("pos").cast("long").alias("s"),
            (F.col("pos") + span_tokens).cast("long").alias("e"),
        )
    )
    return base, _merge_intervals(dup, id_col)


def repeated_spans(
    df: DataFrame,
    span_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-SPAN detection at arbitrary token boundaries —
    the "Deduplicating Training Data Makes Language Models Better"
    (Lee et al. 2022, arXiv:2107.06499) ExactSubstr pass, re-expressed
    for Spark: instead of a corpus-global suffix array (inherently
    sequential to build), slide a ``span_tokens`` window one token at a
    time and mark every window whose text occurs anywhere else in the
    corpus, keeping only the globally-first occurrence (ordered by
    (doc_id, pos)). Consecutive marked positions merge into maximal
    intervals, so any repeated substring of length ≥ ``span_tokens``
    is recovered as ONE span, at n-gram granularity (the edges may
    overhang by < span_tokens — the standard approximation; a doc
    repeating a token forever marks everything past the first window,
    including positions overlapping the kept first occurrence).

    Differs from ``passage_dedup``: that pass is chunk-ALIGNED (a
    duplicated paragraph straddling a 64-token boundary is missed);
    this one catches repeats at ANY offset, the reason Lee et al.
    found ~2× more duplicate text than chunk-level methods.

    Returns (doc_id, n_tokens, dup_spans, dup_tokens, dup_ratio) per
    document — the span map, not rewritten text (at 100 TB the result
    must stay narrow; cutting is a ``slice``-by-intervals follow-up).

    Scale: one tokenize-once barrier; the slide is
    ``explode(sequence)`` + ``slice`` in a single codegen stage — the
    span TEXT never shuffles, only (doc_id, pos, md5) rows, O(tokens)
    × 48 bytes. One window shuffle keyed by the 128-bit md5 (collision
    marking a unique span duplicate: p ≈ n²/2¹²⁹ — the same documented
    stance as the near-dup LSH miss probability; keying on text would
    ship span_tokens× the corpus). Duplicate-heavy keys ARE the
    duplicates being removed (each group is one row_number pass); the
    interval merge windows on doc_id — naturally balanced.
    """
    base, intervals = _span_base_and_intervals(df, span_tokens, id_col, text_col)
    return _span_report(base, intervals, id_col)


def cut_repeated_spans(
    df: DataFrame,
    span_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the ``repeated_spans`` span map: REWRITE each document by
    cutting every duplicated span (all-but-first occurrences), the
    second half of the Lee et al. ExactSubstr pass. A whole-copy doc
    collapses to (at most) its first window's overhang; unique docs
    pass through byte-identical.

    Returns (doc_id, n_tokens, n_kept_tokens, kept_hash) — kept_hash =
    md5 of the space-joined surviving tokens in order, the same
    compact engine-portable witness shape as ``passage_dedup`` (callers
    wanting rewritten text swap the final select; shipping 100 TB of
    text through the RESULT would make the result the bottleneck).

    Scale: everything in ``repeated_spans`` plus ONE doc-keyed join of
    the merged intervals (collected to an array per doc — bounded by
    intervals, not tokens) back onto the token arrays, then a codegen
    filter-by-coverage over (token, index) pairs. The per-token
    coverage test is O(intervals) per token with both arrays
    MATERIALIZED attributes (no HOF re-evaluation of the tokenizer —
    the r5 lesson); merged intervals per doc are few by construction.
    """
    base, intervals = _span_base_and_intervals(df, span_tokens, id_col, text_col)
    iv = intervals.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("__iv")
    )
    joined = base.join(iv, id_col, "left").select(
        F.col(id_col),
        F.col("__p"),
        F.coalesce("__iv", F.array()).alias("__iv"),
    )
    # (token, 0-based index) pairs; keep those no interval covers
    kept = F.filter(
        F.transform(
            "__p",
            lambda tok, i: F.struct(
                tok.alias("t"),
                F.exists(
                    "__iv", lambda v: (v["s"] <= i) & (i < v["e"])
                ).alias("c"),
            ),
        ),
        lambda s: ~s["c"],
    )
    return joined.select(
        F.col(id_col),
        F.size("__p").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept_tokens"),
        F.md5(F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))).alias(
            "kept_hash"
        ),
    )


def token_budget_mix(
    df: DataFrame,
    budgets: "dict[str, int]",
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    margin: float = 4.0,
    totals: "dict[str, int] | None" = None,
) -> DataFrame:
    """Data-mixing sampler: select documents per SOURCE until that
    source's TOKEN budget is met — the pass that turns raw corpora +
    a mixing recipe ("30 B tokens web, 5 B code, …") into the actual
    training set. Selection order is the deterministic md5 hash
    selector (``hash_rate_col``), so the sample is stable across
    reruns and adding a source never changes another source's picks.
    A document is kept iff the tokens of all earlier-hash docs of its
    source are still under budget (the first overshooting doc is
    included — guarantees progress past book-length docs); sources
    absent from ``budgets`` are dropped.

    Returns (doc_id, source, n_tokens, cum_tokens) for kept docs,
    ``cum_tokens`` the inclusive running total within the source.

    Scale: the naive form is a per-source global sort + running sum —
    a total order over 100 TB. Instead: (1) one aggregate computes
    per-source token totals (|sources| rows to the driver — the same
    bounded-collect contract as k-means centroids); (2) only docs with
    selector < margin·budget/total are candidates (a pushed-down scan
    filter — the expected candidate prefix is ``margin×`` the budget,
    NOT the corpus); (3) the exact cumulative cut runs on that
    bounded candidate set. Exactness: candidates are a hash-PREFIX
    superset of the final pick by construction; if a source's
    candidate tokens fall short of budget while its corpus total does
    not, the margin was too small and the op RAISES rather than
    silently under-filling (retry with a larger margin).
    """
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    spark = df.sparkSession
    sized = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_tokens"),
        hash_rate_col(id_col).alias("__sel"),
    ).filter(F.col("source").isin(list(budgets)))
    if totals is None:
        # callers that already sized the corpus (temperature_budget_mix)
        # pass totals in — the aggregate below is a full tokenize pass
        totals = {
            r["source"]: r["t"]
            for r in sized.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        }
    cutoff = {
        s: (
            _RATE_MOD
            if totals.get(s, 0) <= budgets[s]
            else min(_RATE_MOD, int(margin * budgets[s] / totals[s] * _RATE_MOD) + 1)
        )
        for s in budgets
    }
    rate = F.lit(_RATE_MOD)
    for s, c in sorted(cutoff.items()):
        rate = F.when(F.col("source") == s, F.lit(c)).otherwise(rate)
    cand = sized.filter(F.col("__sel") < rate)
    # margin check: each still-capped source's candidate prefix must
    # cover its budget (bounded collect again — |sources| rows)
    cand_tot = {
        r["source"]: r["t"]
        for r in cand.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for s, c in cutoff.items():
        if c < _RATE_MOD and cand_tot.get(s, 0) < budgets[s]:
            raise ValueError(
                f"token_budget_mix: margin={margin} too small for source "
                f"{s!r} (candidate tokens {cand_tot.get(s, 0)} < budget "
                f"{budgets[s]}); retry with a larger margin"
            )
    budget = F.lit(0).cast("long")
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col("source") == s, F.lit(int(b))).otherwise(budget)
    w = (
        Window.partitionBy("source")
        .orderBy("__sel", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cand.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(id_col, "source", "n_tokens", "cum_tokens")
    )


def temperature_budget_mix(
    df: DataFrame,
    alpha: float,
    total_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    margin: float = 4.0,
) -> DataFrame:
    """Temperature-based data mixing (the multilingual α-sampling of
    mBERT/XLM-R, Conneau et al. 2020, arXiv:1911.02116): per-source
    budgets ∝ size^α normalized to ``total_tokens`` — α = 1 keeps the
    natural distribution, α → 0 flattens toward uniform, upweighting
    low-resource sources. The derived budgets feed
    ``token_budget_mix`` (deterministic hash-order selection), so the
    whole pass stays rerun/engine-stable and oracle-checkable.

    Returns ``token_budget_mix``'s (doc_id, source, n_tokens,
    cum_tokens) for the selected docs.

    Scale: ONE extra bounded aggregate (|sources| rows collected — the
    codebook contract) computes sizes; everything else is
    ``token_budget_mix``'s margin-prefiltered plan. Budgets exceeding
    a source's actual size just keep the whole source (the documented
    token_budget_mix behavior), which is exactly α-sampling's
    oversample-the-tail effect.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    sizes = {
        r["source"]: r["t"]
        for r in df.select(
            F.col(source_col).alias("source"),
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
                )
            ).alias("n"),
        )
        .groupBy("source")
        .agg(F.sum("n").alias("t"))
        .collect()
        if r["t"] and r["t"] > 0
    }
    if not sizes:
        raise ValueError("temperature_budget_mix: no non-empty sources")
    import math

    # summed in sorted-source order so RERUNS are deterministic; the
    # SQL oracle's unordered sum can differ in the last ulp — budget
    # divergence needs round(p·T) to sit within that ulp of a .5
    # boundary (~1e-9 absolute), accepted like the other float oracles
    denom = sum(float(t) ** alpha for _, t in sorted(sizes.items()))
    # floor(x+0.5) = round-half-UP, matching DuckDB's round(); Python's
    # built-in round() is banker's (half-to-even) and would disagree on
    # exact .5 boundaries
    budgets = {
        s: max(1, int(math.floor(float(t) ** alpha / denom * total_tokens + 0.5)))
        for s, t in sizes.items()
    }
    return token_budget_mix(
        df,
        budgets,
        source_col=source_col,
        id_col=id_col,
        text_col=text_col,
        margin=margin,
        totals=sizes,  # already computed: skip a second tokenize pass
    )


def stratified_quota(
    df: DataFrame,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
    oversample: float = 4.0,
) -> DataFrame:
    """Deterministic stratified QUOTA sampling: for each group keep the
    ``quota`` rows with the smallest hash selector — the balanced
    training-mix rebalance pass (cap every language/source/domain at N
    examples).  The kept set is a pure function of the ids (rerun-,
    retry-, and engine-stable), unlike ``df.sampleBy`` which is
    rate-based and seed/partitioning-dependent.

    EXACT two-phase plan (no full-table sort): a per-group count (one
    map-combinable agg, |groups| rows, broadcast back) sets a per-group
    hash threshold keeping ~``oversample * quota`` expected rows; a
    narrow codegen prefilter drops everything else; the exact
    ``row_number`` rank then sorts only survivors.  The selector
    (60-bit md5 prefix) is MONOTONE in the rank order, so the prefilter
    keeps a prefix of the order — any group whose survivor count still
    reaches ``quota`` is provably exact, and the rare under-sampled
    group (hash fluctuation beats the oversample margin) is rescued by
    ranking that group's full rows instead, so exactness never depends
    on the margin.  Threshold arithmetic is double-precision: boundary
    fuzz only perturbs survivor-set SIZE, never the final ranked
    answer.  At 100 TB the naive one-window form shuffles and sorts the
    whole table; this shuffles ~oversample·quota·|groups| rows, at the
    price of extra column-pruned scans (counts, prefilter, rescue) —
    the right trade for file sources.
    """
    hexsel = F.substring(F.md5(F.col(id_col).cast("string")), 1, 15)
    hsel = F.conv(hexsel, 16, 10).cast("long")
    hmax = float(16**15)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    thr = F.least(
        F.lit(1.0), F.lit(float(oversample) * float(quota)) / F.col("__c")
    ) * F.lit(hmax)
    surv = (
        df.join(F.broadcast(counts), group_col)
        .filter((F.col("__c") <= F.lit(int(quota))) | (hsel < thr))
        .drop("__c")
    )
    # under-sampled groups — anchored on ``counts``, NOT on the survivor
    # aggregate: a group whose prefilter kept ZERO rows is absent from
    # the survivor side entirely and would silently vanish from the
    # output if the shortfall scan started there. A group is short when
    # its survivors fall below what it owes (quota, or its full size
    # for groups smaller than the quota — for which nothing was
    # dropped, so they can never actually land here).
    short = (
        counts.join(
            surv.groupBy(group_col).agg(F.count(F.lit(1)).alias("__s")),
            group_col,
            "left",
        )
        .filter(
            F.coalesce(F.col("__s"), F.lit(0))
            < F.least(F.lit(int(quota)), F.col("__c"))
        )
        .select(group_col)
    )
    ok = surv.join(F.broadcast(short), group_col, "left_anti")
    rescue = df.join(F.broadcast(short), group_col, "left_semi")
    cand = ok.unionByName(rescue)
    w = Window.partitionBy(group_col).orderBy(hexsel.asc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank_in_group", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_group") <= F.lit(int(quota)))
    )


def importance_sample(
    df: DataFrame,
    target_sources: "list[str]",
    k: int,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR — Xie et al.
    2023, arXiv:2302.03169): pick the ``k`` raw documents that look
    most like a TARGET distribution (here: the docs whose source is in
    ``target_sources``), under hashed bag-of-tokens unigram LMs with
    add-one smoothing. Per doc the log importance weight is
    Σ_tokens log(p_target(bucket)/p_raw(bucket)); selection is DSIR's
    Gumbel-top-k (sampling without replacement ∝ weight), with the
    Gumbel noise derived from md5(doc_id) — deterministic, rerun- and
    engine-stable, unlike rand()-seeded draws.

    Returns the k selected rows as (doc_id, source, logw, key), key =
    logw + gumbel rounded to 6 decimals (the selection rank order).

    Scale: tokens are hashed straight to ``n_buckets`` counts per doc
    (one tokenize pass; the (doc, bucket, count) frame is checkpointed
    and reused, so text is read once). Both LMs are bounded
    aggregates — ≤ n_buckets rows each — broadcast back onto the
    per-doc counts; the scoring join is a BroadcastHashJoin, the
    per-doc sum a doc-keyed agg, and the final top-k a
    TakeOrderedAndProject (no global sort shuffle). Nothing in the
    plan grows with corpus size except the two linear passes.
    """
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    spark = df.sparkSession
    toks_ = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % n_buckets
    )
    per_doc = (
        df.select(
            F.col(id_col), F.col(source_col).alias("source"),
            F.explode(toks_).alias("tok"),
        )
        .select(F.col(id_col), "source", bucket.alias("b"))
        .groupBy(id_col, "source", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tgt = per_doc.filter(F.col("source").isin(list(target_sources)))
    tgt_counts = tgt.groupBy("b").agg(F.sum("c").alias("ct"))
    raw_counts = per_doc.groupBy("b").agg(F.sum("c").alias("cr"))
    # Bounded 1-row driver reads (same contract as temperature_budget_mix'
    # sizing aggregate). Collecting tot_t up front turns "target matched
    # no rows" (e.g. a typo'd source name) into a loud ValueError — left
    # in the plan it sums to NULL, every log-ratio and Gumbel key goes
    # NULL, and orderBy silently returns the first k docs by id.
    tt = tgt.agg(F.sum("c")).collect()[0][0]
    if not tt:
        raise ValueError(
            f"importance_sample: target_sources {list(target_sources)!r} "
            "matched no tokens in the corpus"
        )
    tr = per_doc.agg(F.sum("c")).collect()[0][0]
    # smoothed log-ratio per bucket present in the corpus (absent
    # buckets have no tokens to score); ≤ n_buckets rows, broadcast
    ratio = (
        raw_counts.join(tgt_counts, "b", "left")
        .select(
            "b",
            (
                F.log((F.coalesce("ct", F.lit(0)) + 1) / F.lit(float(tt + n_buckets)))
                - F.log((F.col("cr") + 1) / F.lit(float(tr + n_buckets)))
            ).alias("lr"),
        )
    )
    u = (hash_rate_col(id_col) + 0.5) / _RATE_MOD
    gumbel = -F.log(-F.log(u))
    return (
        per_doc.join(F.broadcast(ratio), "b")
        .groupBy(id_col, "source")
        .agg(F.sum(F.col("c") * F.col("lr")).alias("__lw"))
        .select(
            F.col(id_col),
            "source",
            F.round("__lw", 6).alias("logw"),
            F.round(F.col("__lw") + gumbel, 6).alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col(id_col))
        .limit(int(k))
    )


def span_corruption_pairs(
    df: DataFrame,
    mask_rate: float = 0.15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683
    §3.1.4): mask a deterministic ~``mask_rate`` of each document's
    tokens, merge adjacent masks into spans, and emit the denoising
    pair — inputs with each span replaced by a ``<extra_id_k>``
    sentinel, targets as the sentinel-prefixed masked spans. The mask
    decision is the md5 hash selector over (doc_id, pos), so the
    corruption is a pure function of (data, rate): reruns, retries,
    and engines produce byte-identical pairs (a ``rand()`` mask
    re-deals under retries and can never be oracle-checked).

    Returns (doc_id, n_tokens, n_masked, n_spans, input_hash,
    target_hash) — md5 witnesses of the space-joined pair text (the
    compact result contract of ``passage_dedup``/``cut_repeated_spans``;
    callers wanting text swap the final aggregation).

    Scale: one tokenize pass → explode positions → per-doc windows
    (span starts = masked positions whose predecessor is unmasked;
    span ids = running sum) → one doc-keyed aggregation rebuilding
    both strings ordered by position. Everything shuffles on doc_id —
    linear, naturally balanced, no HOF-lambda array indexing.
    """
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    if not 0.0 < mask_rate < 1.0:
        raise ValueError("mask_rate must be in (0, 1)")
    thr = int(round(mask_rate * _RATE_MOD))
    base = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
        ).alias("__p"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    toks = base.select(
        F.col(id_col),
        F.posexplode("__p").alias("pos", "tok"),
    )
    sel = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|"), F.col("pos").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % _RATE_MOD
    )
    wd = Window.partitionBy(id_col).orderBy("pos")
    marked = toks.withColumn("__m", (sel < thr).cast("int"))
    # span starts: masked with an unmasked (or absent) predecessor;
    # span id = running count of starts among masked rows
    prev_m = F.lag("__m", 1, 0).over(wd)
    spans = marked.withColumn(
        "__start", ((F.col("__m") == 1) & (prev_m == 0)).cast("int")
    ).withColumn(
        "__span",
        F.sum("__start").over(wd.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    sent = F.concat(F.lit("<extra_id_"), F.col("__span").cast("string"), F.lit(">"))
    # inputs: unmasked tokens verbatim; ONE sentinel at each span start
    in_piece = F.when(F.col("__m") == 0, F.col("tok")).when(
        F.col("__start") == 1, sent
    )
    # targets: masked tokens, sentinel-prefixed at span starts
    tgt_piece = F.when(
        (F.col("__m") == 1) & (F.col("__start") == 1),
        F.concat(sent, F.lit(" "), F.col("tok")),
    ).when(F.col("__m") == 1, F.col("tok"))
    agg = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("__m").cast("long").alias("n_masked"),
        F.sum("__start").cast("long").alias("n_spans"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                in_piece.isNotNull(),
                                F.struct(F.col("pos"), in_piece.alias("t")),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            )
        ).alias("input_hash"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                tgt_piece.isNotNull(),
                                F.struct(F.col("pos"), tgt_piece.alias("t")),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            )
        ).alias("target_hash"),
    )
    # empty docs still appear, with md5('') witnesses
    ids = base.select(F.col(id_col))
    return (
        ids.join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_masked", F.lit(0)).cast("long").alias("n_masked"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("input_hash", F.md5(F.lit(""))).alias("input_hash"),
            F.coalesce("target_hash", F.md5(F.lit(""))).alias("target_hash"),
        )
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022,
    arXiv:2207.14255): split each document's token stream at two
    deterministic hash-drawn points into (prefix, middle, suffix) and
    emit the PSM reordering ``<PRE> prefix <SUF> suffix <MID> middle``
    — the data transform behind infilling-capable code/text models.
    Split points are md5-derived from (doc_id), so the transform is a
    pure function of the data (rerun/engine-stable, oracle-checkable).

    Returns (doc_id, n_tokens, split_a, split_b, psm_hash) with
    0 ≤ split_a ≤ split_b ≤ n_tokens and psm_hash = md5 of the
    space-joined PSM token stream (sentinels included) — the compact
    witness contract.

    Scale: a pure per-row codegen projection — tokenize-once barrier,
    two hash draws, three ``slice``s and a ``concat``; no explode, no
    shuffle beyond the barrier repartition. The cheapest possible
    shape for a 100 TB transform pass.
    """
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    base = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_PIECE_RE), F.lit(0)
        ).alias("__p"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
    n = F.size("__p")

    def draw(tag: str, mod: F.Column) -> F.Column:
        h = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(id_col).cast("string"), F.lit(tag))), 1, 15
                ),
                16, 10,
            ).cast("long")
        )
        return h % mod

    a = draw("|fim_a", n + 1)
    b = a + draw("|fim_b", n - a + 1)
    split = base.select(
        F.col(id_col),
        F.col("__p"),
        a.cast("int").alias("__a"),
        b.cast("int").alias("__b"),
    )
    psm = F.concat(
        F.array(F.lit("<PRE>")),
        F.expr("slice(__p, 1, __a)"),
        F.array(F.lit("<SUF>")),
        F.expr("slice(__p, __b + 1, size(__p) - __b)"),
        F.array(F.lit("<MID>")),
        F.expr("slice(__p, __a + 1, __b - __a)"),
    )
    return split.select(
        F.col(id_col),
        F.size("__p").cast("long").alias("n_tokens"),
        F.col("__a").cast("long").alias("split_a"),
        F.col("__b").cast("long").alias("split_b"),
        F.md5(F.concat_ws(" ", psm)).alias("psm_hash"),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training shuffle: permute the corpus by a
    seeded hash and deal it into ``n_shards`` shards with a stable
    within-shard order — the final pass before writing training data,
    where sample order must be (a) effectively random w.r.t. every
    upstream key (source, time, quality band), (b) reproducible from
    (seed, ids) alone across reruns/engines (``orderBy(rand())``
    re-deals under retries), and (c) resumable (shard, pos) addressing.

    Returns (doc_id, shard_id, pos_in_shard).

    Scale: no global sort — ONE shuffle keyed by shard_id and a
    within-shard row_number. Training sharding uses n_shards in the
    thousands (shard ≈ file), so the window parallelism is the shard
    count, and hash-dealing keeps shard sizes balanced to O(√) noise.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    hexsel = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    hsel = F.conv(F.substring(hexsel, 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("shard_id").orderBy("__hex", id_col)
    return (
        df.select(
            F.col(id_col),
            (hsel % n_shards).alias("shard_id"),
            hexsel.alias("__hex"),
        )
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .select(id_col, "shard_id", "pos_in_shard")
    )


def write_packed_shards(
    df: DataFrame,
    path: str,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
) -> int:
    """The SINK half of shard packing: compute ``pack_token_shards``
    assignments, then physically write one parquet directory partition
    per shard — the layout a training-data loader consumes (read shard
    k = read one partition; shards are token-budget-balanced by
    construction).

    ``repartition(shard_id)`` before ``partitionBy`` makes each shard's
    rows land in ONE task → one file per shard (the dynamic-partition
    small-files trap: without it every task writes a sliver of every
    shard, producing tasks×shards files). Shard count is data-dependent
    and unbounded, so this stays a hash repartition — at 10⁵ shards
    that is still one shuffle + one file per shard.

    Returns the number of shards written."""
    packed = pack_token_shards(df, budget, id_col, text_col, count_col)
    out = (
        df.join(packed.select(id_col, "n_tokens", "shard_id"), id_col)
        .repartition(F.col("shard_id"))
    )
    out.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    spark = df.sparkSession
    return spark.read.parquet(path).select("shard_id").distinct().count()


def length_bucket_batches(
    df: DataFrame,
    batch_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    min_cap: int = 16,
) -> DataFrame:
    """Length-bucketed BATCHING — the padding-minimization pass for
    workloads that cannot concatenate examples (inference, encoder
    scoring, reward models; ``pack_sequences`` is the causal-LM sibling
    that splits documents instead of padding them): every document is
    assigned the power-of-two bucket cap covering its token count
    (floored at ``min_cap``), padded to that cap, and batched WITHIN
    its bucket in ``id_col`` order with
    ``batch_size = max(1, batch_tokens // cap)`` — so each batch is a
    rectangle of ≈ ``batch_tokens`` padded tokens and the per-batch
    padding waste is bounded by the bucket's 2× spread.

    Returns (id, n_tokens, bucket_cap, batch_in_bucket, pad_tokens).
    Zero-token docs contribute nothing (the ``pack_sequences``
    convention). The cap uses the INTEGER bit-length of n−1
    (``conv`` to base 2), not ``log2``: float log of an exact power of
    two can land at 5.999… and mis-bucket a boundary count — integer
    string length is exact in every engine.

    Scale: the within-bucket rank is the two-phase partition-parallel
    prefix scheme of ``_global_token_offsets`` keyed by (partition,
    bucket) — the driver collect is O(#partitions × #buckets) tiny
    rows (buckets are log-many by construction) and the only window is
    WITHIN a partition; no single-task global sort ever happens.
    """
    from vectorsearch_spark.operators.text import token_counts

    if int(batch_tokens) < 1:
        raise ValueError("batch_tokens must be ≥ 1")
    if int(min_cap) < 1:
        raise ValueError("min_cap must be ≥ 1")
    B = int(batch_tokens)
    if count_col is None:
        t = token_counts(df, id_col, text_col).select(
            id_col, F.col("n_subword_est").alias("n_tokens")
        )
    else:
        t = df.select(F.col(id_col), F.col(count_col).cast("long").alias("n_tokens"))
    t = t.where(F.col("n_tokens") > 0)
    # 2^bitlen via pow: exact for integer exponents (no log2 float
    # rounding — shiftleft's shift amount must be a Python literal)
    bitlen = F.length(F.conv((F.col("n_tokens") - 1).cast("string"), 10, 2))
    cap = F.when(
        F.col("n_tokens") <= min_cap, F.lit(int(min_cap)).cast("long")
    ).otherwise(F.pow(F.lit(2.0), bitlen.cast("double")).cast("long"))
    t = (
        t.withColumn("bucket_cap", cap)
        .repartitionByRange(id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()  # two passes must see identical partitioning
    )
    counts = t.groupBy("_pid", "bucket_cap").count().collect()
    run: dict[int, int] = {}
    offs = []
    for row in sorted(counts, key=lambda r: (int(r["bucket_cap"]), int(r["_pid"]))):
        c = int(row["bucket_cap"])
        offs.append((int(row["_pid"]), c, run.get(c, 0)))
        run[c] = run.get(c, 0) + int(row["count"])
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(offs, "_pid int, bucket_cap long, _off long")
    )
    w = Window.partitionBy("_pid", "bucket_cap").orderBy(id_col)
    bsz = F.greatest(F.lit(1).cast("long"), (F.lit(B) / F.col("bucket_cap")).cast("long"))
    out = (
        t.join(off_df, ["_pid", "bucket_cap"])
        .withColumn("_rn0", F.row_number().over(w) - 1 + F.col("_off"))
        .select(
            F.col(id_col),
            "n_tokens",
            "bucket_cap",
            F.floor(F.col("_rn0") / bsz).cast("long").alias("batch_in_bucket"),
            (F.col("bucket_cap") - F.col("n_tokens")).cast("long").alias("pad_tokens"),
        )
    )
    out = out.localCheckpoint()
    t.unpersist()
    return out
