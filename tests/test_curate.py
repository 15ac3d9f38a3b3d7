"""Curation operator tests: deterministic hash sampling and token-budget
shard packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.curate import curate_sample, pack_token_shards


def test_pack_token_shards_invariants(spark):
    rows = [(i, "word " * (10 * (i % 7 + 1))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 300
    out = pack_token_shards(df, budget=budget).collect()
    assert len(out) == 200
    by_id = sorted(out, key=lambda r: r["doc_id"])
    # shards are contiguous and non-decreasing in doc order
    shards = [r["shard_id"] for r in by_id]
    assert shards == sorted(shards)
    assert shards[0] == 0
    # start-offset definition: a shard's docs START inside its budget
    # window, so total(shard) < budget + max_doc_tokens
    totals: dict[int, int] = {}
    for r in by_id:
        totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["n_tokens"]
    max_doc = max(r["n_tokens"] for r in by_id)
    for sid, tot in totals.items():
        assert tot < budget + max_doc
    # every shard except possibly the last crosses its budget boundary
    for sid in sorted(totals)[:-1]:
        assert totals[sid] + max_doc >= budget


def test_pack_token_shards_partitioning_invariant(spark):
    """Same shard assignment no matter how the input is partitioned —
    the two-phase prefix sum is globally consistent."""
    rows = [(i, "alpha beta gamma " * (i % 5 + 1)) for i in range(120)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
    ra = sorted(map(tuple, pack_token_shards(a, budget=100).collect()))
    rb = sorted(map(tuple, pack_token_shards(b, budget=100).collect()))
    assert ra == rb


def test_pack_token_shards_oversized_doc(spark):
    df = spark.createDataFrame(
        [(0, "w " * 50), (1, "x " * 500), (2, "y " * 50)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["shard_id"] for r in pack_token_shards(df, budget=100).collect()}
    # doc 1 exceeds the budget alone; doc 2 starts past it in a new shard
    assert out[0] == 0
    assert out[1] >= out[0]
    assert out[2] > out[1]


def test_curate_sample_deterministic_and_gated(spark):
    rows = [
        (i, "the quick brown fox is happy with the state of things " * 3)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept1 = {r["doc_id"] for r in curate_sample(df, {"en": 0.5}).collect()}
    kept2 = {r["doc_id"] for r in curate_sample(df, {"en": 0.5}).collect()}
    assert kept1 == kept2  # rerun-stable (hash-based, not rand())
    assert 0 < len(kept1) < 100  # the rate actually thins
    none = curate_sample(df, {"en": 0.0}).collect()
    assert none == []  # zero rate, default 0
    all_en = {r["doc_id"] for r in curate_sample(df, {"en": 1.0}).collect()}
    assert all_en == set(range(100))  # rate 1.0 keeps everything
    # quality gate dominates: impossible threshold keeps nothing
    assert curate_sample(df, {"en": 1.0}, min_quality=1.01).collect() == []


def test_write_packed_shards_layout(spark, tmp_path):
    """Sink e2e: one parquet partition directory per shard, every doc
    present exactly once, per-shard token sums within budget (except
    oversized single docs), and one data file per shard (the
    repartition-before-partitionBy contract)."""
    import glob
    import os

    from vectorsearch_spark.operators.curate import write_packed_shards

    docs = spark.createDataFrame(
        [(i, "word " * (5 + (i * 7) % 40)) for i in range(60)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "shards")
    n_shards = write_packed_shards(docs, path, budget=120)
    assert n_shards >= 2

    back = spark.read.parquet(path)
    assert back.count() == 60
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == list(range(60))
    # budget contract: shard_id = floor(start_offset / budget), so a
    # shard's docs all START inside its budget window — the sum may
    # overrun by at most the straddling last doc
    from pyspark.sql import functions as F
    for r in back.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("mx")
    ).collect():
        assert r["s"] - r["mx"] < 120, (r["shard_id"], r["s"], r["mx"])
    # one data file per shard directory
    for d in glob.glob(os.path.join(path, "shard_id=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d


def _quota_model(rows, quota):
    """Per-row Python model: per group, the `quota` ids with the smallest
    (md5-prefix, id) key, with their 1-based ranks."""
    import hashlib
    from collections import defaultdict

    by_g = defaultdict(list)
    for gid, g in rows:
        key = hashlib.md5(str(gid).encode()).hexdigest()[:15]
        by_g[g].append((key, gid))
    out = set()
    for g, items in by_g.items():
        items.sort()
        for rank, (_, gid) in enumerate(items[:quota], start=1):
            out.add((g, gid, rank))
    return out


def test_stratified_quota_exact_vs_model(spark):
    from vectorsearch_spark.operators.curate import stratified_quota

    # skewed groups: 'hot' has 400 rows, 'mid' 40, 'tiny' 5 (< quota)
    rows = (
        [(i, "hot") for i in range(400)]
        + [(1000 + i, "mid") for i in range(40)]
        + [(2000 + i, "tiny") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = {
        (r["grp"], r["doc_id"], r["rank_in_group"])
        for r in stratified_quota(df, "grp", quota=20, id_col="doc_id").collect()
    }
    assert got == _quota_model(rows, 20)


def test_stratified_quota_rescue_path(spark):
    """oversample < 1 starves the prefilter on purpose: survivors < quota
    forces the rescue branch, which must still produce the exact answer."""
    from vectorsearch_spark.operators.curate import stratified_quota

    rows = [(i, "g") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = {
        (r["grp"], r["doc_id"], r["rank_in_group"])
        for r in stratified_quota(
            df, "grp", quota=50, id_col="doc_id", oversample=0.01
        ).collect()
    }
    assert got == _quota_model(rows, 50)


def _chunk_model(n: int, chunk: int, stride: int) -> list[tuple[int, int, int]]:
    """(chunk_idx, start, length) for a doc of n tokens — INDEPENDENT
    rule, not the operator's closed-form count: walk starts while they
    fall inside the doc, stop once a chunk has reached the end (so no
    fully-redundant tail, and no phantom past-the-end chunk when
    stride > chunk)."""
    out: list[tuple[int, int, int]] = []
    start = 0
    while start < n:
        out.append((len(out), start, min(chunk, n - start)))
        if start + chunk >= n:
            break
        start += stride
    return out


def test_chunk_documents_coverage_and_edges(spark):
    from vectorsearch_spark.operators.curate import chunk_documents

    rows = [
        (0, ""),                      # empty -> no chunks
        (1, "one"),                   # shorter than chunk -> 1 chunk
        (2, " ".join(f"w{i}" for i in range(10))),   # exact multiples
        (3, " ".join(f"w{i}" for i in range(23))),   # ragged tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=8, stride=5).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc
    # token counts per doc under the piece tokenizer: w7 -> ['w', '7']
    n_toks = {1: 1, 2: 20, 3: 46}
    for doc, n in n_toks.items():
        got = sorted(
            (r["chunk_idx"], r["start_tok"], r["n_tokens"]) for r in by_doc[doc]
        )
        assert got == _chunk_model(n, 8, 5), f"doc {doc}"
        # overlap-coverage invariant: chunks tile [0, n) with no gap
        covered = set()
        for _, s, ln in got:
            covered |= set(range(s, s + ln))
        assert covered == set(range(n)), f"doc {doc} gap"
    # chunk_text round-trips the token stream on the no-overlap path
    nol = chunk_documents(df.where("doc_id = 3"), chunk_tokens=8).collect()
    joined = " ".join(r["chunk_text"] for r in sorted(nol, key=lambda r: r["chunk_idx"]))
    assert joined.split(" ") == [t for i in range(23) for t in (f"w", str(i))]


def test_chunk_documents_rejects_bad_params(spark):
    from vectorsearch_spark.operators.curate import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, stride=-1)


def test_chunk_documents_sampling_stride(spark):
    """stride > chunk: gaps are the documented sampling semantics."""
    from vectorsearch_spark.operators.curate import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(20)))], "doc_id long, text string"
    )
    # 20 words -> 40 pieces under BPE_PIECE_RE ("tok"+digits split)
    out = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=8, stride=16).collect()
    )
    assert out == [(0, 0, 8), (1, 16, 8), (2, 32, 8)]


def test_passage_dedup_keeps_first_occurrence_and_reassembles(spark):
    """Global passage dedup: whole-copy docs collapse entirely, a doc
    repeating another doc's passage loses exactly that chunk, and the
    kept_hash witnesses the reassembled text (md5 of the space-joined
    surviving chunks in order)."""
    import hashlib

    from vectorsearch_spark.operators.curate import passage_dedup

    # 4-token chunks; words are single BPE pieces
    d0 = "alpha beta gamma delta epsilon zeta eta theta"          # 2 chunks
    d1 = d0                                                        # full copy
    d2 = "alpha beta gamma delta iota kappa lam mu"                # chunk0 dups d0's chunk0
    rows = [(0, d0), (1, d1), (2, d2)]
    out = {
        r["doc_id"]: r
        for r in passage_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            chunk_tokens=4,
        ).collect()
    }
    assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 0
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[0]["kept_hash"] == md5(d0)
    assert out[1]["kept_hash"] == md5("")
    assert out[2]["kept_hash"] == md5("iota kappa lam mu")


def test_token_budget_mix_exactness_and_margin_guard(spark):
    """The margin-prefiltered mixing sampler: equals the naive
    full-sort cumulative cut, keeps everything when a source's corpus
    fits its budget, drops unbudgeted sources, and RAISES (not
    silently under-fills) when the margin prefix cannot cover a
    budget."""
    import hashlib

    import pytest

    from vectorsearch_spark.operators.curate import token_budget_mix

    rows = [
        (i, "src_a" if i % 2 == 0 else "src_b", "tok " * (5 + i % 7))
        for i in range(40)
    ] + [(100 + i, "src_zzz", "unbudgeted text") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_mix(df, {"src_a": 60, "src_b": 10_000}).collect()
    # naive model: hash order, cumulative cut (first overshoot kept)
    sel = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1_000_000
    toks = {i: 5 + i % 7 for i in range(40)}
    kept_model = {}
    for src, budget in (("src_a", 60), ("src_b", 10_000)):
        ids = sorted(
            (i for i in range(40) if (i % 2 == 0) == (src == "src_a")),
            key=lambda i: (sel(i), i),
        )
        cum = 0
        for i in ids:
            if cum < budget:
                cum += toks[i]
                kept_model[i] = (src, cum)
    got = {r["doc_id"]: (r["source"], r["cum_tokens"]) for r in out}
    assert got == kept_model
    assert all(src != "src_zzz" for src, _ in got.values())
    # src_b fits entirely -> all 20 docs kept
    assert sum(1 for s, _ in got.values() if s == "src_b") == 20
    with pytest.raises(ValueError, match="margin.*too small"):
        token_budget_mix(df, {"src_a": 60}, margin=0.01)


def test_passage_dedup_global_invariants(spark):
    """Corpus-level invariants on randomized docs: Σ n_kept == number
    of DISTINCT chunk texts in the corpus (each survives exactly
    once), and per-doc n_chunks equals chunk_documents' count."""
    import random

    from vectorsearch_spark.operators.curate import chunk_documents, passage_dedup

    rng = random.Random(5)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 17))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=4, stride=4).collect()
    n_by_doc = {}
    texts = set()
    for r in chunks:
        n_by_doc[r["doc_id"]] = n_by_doc.get(r["doc_id"], 0) + 1
        texts.add(r["chunk_text"])
    out = passage_dedup(df, chunk_tokens=4).collect()
    assert {r["doc_id"]: r["n_chunks"] for r in out} == n_by_doc
    assert sum(r["n_kept"] for r in out) == len(texts)


def test_repeated_spans_unaligned_copy_and_self_repeat(spark):
    """Duplicated-span detection at arbitrary offsets: an unaligned
    copied run is recovered as ONE merged span with the exact token
    count, a self-repeating doc marks everything past the first
    window, unique docs and docs shorter than the window report zero."""
    from vectorsearch_spark.operators.curate import repeated_spans

    words = [f"w{i}" for i in range(60)]          # each -> 2 BPE pieces
    d1 = " ".join(words)                          # 120 tokens, original
    d2 = "unique lead tokens here " + " ".join(words[7:45]) + " trailing bits"
    d3 = " ".join(f"zq{i}" for i in range(30))    # unique
    d4 = " ".join(["rep"] * 50)                   # period-1 self repeat
    d5 = "short doc"                              # < span_tokens
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4), (5, d5)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repeated_spans(df, span_tokens=20).collect()}
    # doc 1 is the globally-first occurrence: nothing marked
    assert out[1]["dup_spans"] == 0 and out[1]["dup_tokens"] == 0
    # doc 2: the 38-word (76-token) copied run -> one span of 76 tokens
    assert out[2]["dup_spans"] == 1 and out[2]["dup_tokens"] == 76
    assert out[2]["dup_ratio"] == round(76 / out[2]["n_tokens"], 6)
    assert out[3]["dup_spans"] == 0
    # doc 4: windows at pos 1..30 all duplicate pos 0 -> [1, 50)
    assert out[4]["dup_spans"] == 1 and out[4]["dup_tokens"] == 49
    assert out[5]["n_tokens"] == 2 and out[5]["dup_spans"] == 0


def test_repeated_spans_matches_python_model(spark):
    """Seeded random corpus with injected cross-doc and within-doc
    repeats: the Spark op equals a direct Python reference (dict of
    gram -> first (doc, pos), then interval merge) row for row."""
    import random
    import re

    from vectorsearch_spark.operators.curate import repeated_spans
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(40)]
    docs = {}
    for d in range(30):
        docs[d] = [rng.choice(vocab) for _ in range(rng.randint(3, 80))]
    # inject: doc 30 embeds a run of doc 3; doc 31 = full copy of doc 5
    docs[30] = [rng.choice(vocab) for _ in range(9)] + docs[3][2:40] + ["x"]
    docs[31] = list(docs[5])
    rows = [(d, " ".join(t)) for d, t in sorted(docs.items())]
    span = 8
    pat = re.compile(BPE_PIECE_RE)
    toks = {d: pat.findall(t.lower()) for d, t in rows}
    first: dict = {}
    occs: dict = {}
    for d in sorted(toks):
        p = toks[d]
        for i in range(len(p) - span + 1):
            g = " ".join(p[i : i + span])
            occs.setdefault(g, []).append((d, i))
    exp = {d: [] for d in toks}
    for g, os_ in occs.items():
        if len(os_) > 1:
            for d, i in os_[1:]:
                exp[d].append((i, i + span))
    model = {}
    for d, iv in exp.items():
        iv.sort()
        merged = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        model[d] = (
            len(toks[d]),
            len(merged),
            sum(e - s for s, e in merged),
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"])
        for r in repeated_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            span_tokens=span,
        ).collect()
    }
    assert got == model


def test_importance_sample_matches_python_model_and_prefers_target(spark):
    """DSIR selection: the Spark op equals a direct Python reference
    (hashed-unigram LMs, add-one smoothing, deterministic Gumbel keys)
    and ranks target-styled docs above off-distribution ones."""
    import hashlib
    import math
    import re

    from vectorsearch_spark.operators.curate import importance_sample
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    B = 64
    # two disjoint vocabularies: "science" (target) vs "spam"
    sci = "quantum electron lattice spectrum boson fermion orbit decay"
    spam = "buy cheap now click winner prize offer deal"
    rows = []
    for i in range(10):
        rows.append((i, sci + f" sample {i}", "wiki"))          # target
    for i in range(10, 20):
        rows.append((i, sci + f" note {i}", "web"))             # raw, sci-like
    for i in range(20, 30):
        rows.append((i, spam + f" blast {i}", "web"))           # raw, spam
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = importance_sample(df, ["wiki"], k=12, n_buckets=B).collect()

    pat = re.compile(BPE_PIECE_RE)
    md5i = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    pd_counts, tgt, raw = {}, {}, {}
    for d, t, src in rows:
        cc = {}
        for tok in pat.findall(t.lower()):
            b = md5i(tok) % B
            cc[b] = cc.get(b, 0) + 1
        pd_counts[d] = (src, cc)
        for b, c in cc.items():
            raw[b] = raw.get(b, 0) + c
            if src == "wiki":
                tgt[b] = tgt.get(b, 0) + c
    tt, tr = sum(tgt.values()), sum(raw.values())
    keys = {}
    for d, (src, cc) in pd_counts.items():
        lw = sum(
            c * (math.log((tgt.get(b, 0) + 1) / (tt + B))
                 - math.log((raw[b] + 1) / (tr + B)))
            for b, c in cc.items()
        )
        u = (md5i(str(d)) % 1_000_000 + 0.5) / 1_000_000
        keys[d] = (round(lw, 6), round(lw + -math.log(-math.log(u)), 6))
    exp = sorted(keys.items(), key=lambda kv: (-kv[1][1], kv[0]))[:12]
    assert [(r["doc_id"], r["logw"], r["key"]) for r in out] == [
        (d, lw, ky) for d, (lw, ky) in exp
    ]
    # distribution preference: every selected doc is sci-styled
    assert all(r["doc_id"] < 20 for r in out)


def test_line_dedup_drops_boilerplate_everywhere(spark):
    """RefinedWeb line dedup: a line in ≥ min_docs distinct docs is
    dropped from EVERY doc (no keep-first), blank lines always
    survive, within-doc repeats alone are not boilerplate, and
    kept_hash witnesses the rewritten text."""
    import hashlib

    from vectorsearch_spark.operators.curate import line_dedup

    df = spark.createDataFrame(
        [
            (1, "nav menu\nunique alpha\n\nnav menu\nfooter"),
            (2, "nav menu\nunique beta\nfooter"),
            (3, "solo line\nsolo line"),  # repeats only within one doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_docs=2).collect()}
    # "nav menu" (docs 1,2) and "footer" (docs 1,2) are boilerplate
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["n_boiler"]) == (5, 2, 3)
    assert out[1]["kept_hash"] == hashlib.md5("unique alpha\n".encode()).hexdigest()
    assert (out[2]["n_lines"], out[2]["n_kept"], out[2]["n_boiler"]) == (3, 1, 2)
    # doc 3: same line twice but only ONE distinct doc — both kept
    assert (out[3]["n_kept"], out[3]["n_boiler"]) == (2, 0)
    assert out[3]["kept_hash"] == hashlib.md5("solo line\nsolo line".encode()).hexdigest()

    import pytest

    with pytest.raises(ValueError, match="min_docs"):
        line_dedup(df, min_docs=1)


def test_pack_sequences_matches_stream_model(spark):
    """Fixed-length packing ≡ cutting the concatenated token stream:
    every non-final example sums to exactly seq_len, segments tile each
    doc without gaps, zero-token docs vanish, and the result equals a
    direct Python model over the same counts."""
    from vectorsearch_spark.operators.curate import pack_sequences

    rows = [(1, 5), (2, 2), (3, 0), (4, 7), (5, 300), (6, 1)]
    df = spark.createDataFrame(
        [(i, "", n) for i, n in rows], "doc_id long, text string, n long"
    )
    L = 16
    got = sorted(
        tuple(r)
        for r in pack_sequences(df, L, count_col="n").collect()
    )
    # python model
    exp, off = [], 0
    for i, n in rows:
        if n == 0:
            continue
        for ex in range(off // L, (off + n - 1) // L + 1):
            s = max(ex * L, off)
            e = min((ex + 1) * L, off + n)
            exp.append((ex, i, s - off, e - s))
        off += n
    assert got == sorted(exp)
    total = sum(n for _, n in rows)
    sums = {}
    for ex, _, _, nt in got:
        sums[ex] = sums.get(ex, 0) + nt
    full, last = divmod(total, L)
    for ex in range(full):
        assert sums[ex] == L
    if last:
        assert sums[full] == last

    import pytest

    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, 0, count_col="n")


def test_select_top_fraction_equals_naive_window(spark):
    """Histogram-pruned selection ≡ the naive per-group window cut,
    including heavy score ties across the border bin, constant-score
    groups, and frac=1.0 (everything kept)."""
    import random

    from pyspark.sql import Window

    from vectorsearch_spark.operators.curate import select_top_fraction

    random.seed(3)
    rows = [(i, f"s{i % 5}", round(random.uniform(0, 1), 2)) for i in range(2000)]
    rows += [(10000 + i, "s1", 0.5) for i in range(300)]  # tie block
    rows += [(20000 + i, "flat", 1.0) for i in range(10)]  # constant group
    df = spark.createDataFrame(
        rows, "doc_id long, source string, score double"
    ).repartition(16)
    for frac in (0.2, 1.0):
        got = sorted(
            tuple(r)
            for r in select_top_fraction(
                df, frac, "score", "source", "doc_id", bins=16
            ).collect()
        )
        w = Window.partitionBy("source").orderBy(
            F.col("score").desc(), F.col("doc_id")
        )
        exp = sorted(
            tuple(r)
            for r in df.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("source")))
            .filter(F.col("rn") <= F.ceil(frac * F.col("n")))
            .drop("rn", "n")
            .collect()
        )
        assert got == exp, f"frac={frac}"

    import pytest

    with pytest.raises(ValueError, match="frac"):
        select_top_fraction(df, 0.0, "score")


def test_importance_sample_empty_target_raises(spark):
    """A target filter matching no rows (e.g. a typo'd source name)
    must raise — left in the plan it NULLs every log-ratio and the
    orderBy silently returns the first k docs by id."""
    import pytest

    from vectorsearch_spark.operators.curate import importance_sample

    df = spark.createDataFrame(
        [(1, "alpha beta", "web"), (2, "gamma delta", "web")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="matched no tokens"):
        importance_sample(df, ["wiki_typo"], k=1)


def test_shuffle_shards_is_deterministic_partition(spark):
    """Seeded shuffle-sharding: every row lands in exactly one shard,
    pos_in_shard is contiguous from 1, the deal is identical across
    reruns, and a different seed yields a different permutation."""
    from vectorsearch_spark.operators.curate import shuffle_shards

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = shuffle_shards(df, n_shards=8, seed=0).collect()
    b = shuffle_shards(df, n_shards=8, seed=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(r["doc_id"] for r in a) == list(range(500))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard_id"], []).append(r["pos_in_shard"])
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    c = shuffle_shards(df, n_shards=8, seed=1).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_cut_repeated_spans_rewrites_and_passthrough(spark):
    """Span-cut application: survivors are exactly the tokens outside
    the merged duplicate intervals (n_kept = n_tokens - dup_tokens),
    whole-copy docs collapse, unique docs pass through with the exact
    original token-stream hash."""
    import hashlib
    import re

    from vectorsearch_spark.operators.curate import (
        cut_repeated_spans,
        repeated_spans,
    )
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    words = [f"w{i}" for i in range(60)]
    d1 = " ".join(words)
    d2 = "unique lead tokens here " + " ".join(words[7:45]) + " trailing bits"
    d3 = " ".join(f"zq{i}" for i in range(30))
    d4 = d1  # whole copy
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4)], "doc_id long, text string"
    )
    cut = {r["doc_id"]: r for r in cut_repeated_spans(df, span_tokens=20).collect()}
    spans = {r["doc_id"]: r for r in repeated_spans(df, span_tokens=20).collect()}
    for d in (1, 2, 3, 4):
        assert (
            cut[d]["n_kept_tokens"]
            == cut[d]["n_tokens"] - spans[d]["dup_tokens"]
        )
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    pat = re.compile(BPE_PIECE_RE)
    assert cut[1]["kept_hash"] == md5(" ".join(pat.findall(d1.lower())))
    assert cut[3]["kept_hash"] == md5(" ".join(pat.findall(d3.lower())))
    assert cut[4]["n_kept_tokens"] == 0 and cut[4]["kept_hash"] == md5("")
    # doc2 survivors: tokens outside the covered range, in order — the
    # 4-token lead ("unique lead tokens here"), then the copied run
    # (2 pieces per wN word) is cut, then the 2-token tail
    toks2 = pat.findall(d2.lower())
    iv_start = 4
    iv_end = iv_start + spans[2]["dup_tokens"]
    survivors = toks2[:iv_start] + toks2[iv_end:]
    assert cut[2]["n_kept_tokens"] == len(survivors)
    assert cut[2]["kept_hash"] == md5(" ".join(survivors))


def test_span_corruption_matches_python_model(spark):
    """T5 span corruption: deterministic hash mask equals the direct
    Python model (spans, sentinel numbering, input/target hashes);
    empty docs emit md5('') witnesses; the masked fraction tracks the
    rate on a large doc."""
    import hashlib
    import re

    from vectorsearch_spark.operators.curate import span_corruption_pairs
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, ""),
        (3, "single"),
        (4, " ".join(f"tok{i}" for i in range(600))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption_pairs(df, mask_rate=0.3).collect()}

    pat = re.compile(BPE_PIECE_RE)
    MOD = 1_000_000
    md5i = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()

    for d, t in docs:
        p = pat.findall(t.lower())
        m = [md5i(f"{d}|{i}") % MOD < round(0.3 * MOD) for i in range(len(p))]
        inp, tgt, span = [], [], -1
        for i, (tok, mm) in enumerate(zip(p, m)):
            if mm:
                if i == 0 or not m[i - 1]:
                    span += 1
                    inp.append(f"<extra_id_{span}>")
                    tgt.append(f"<extra_id_{span}> {tok}")
                else:
                    tgt.append(tok)
            else:
                inp.append(tok)
        r = out[d]
        assert (
            r["n_tokens"], r["n_masked"], r["n_spans"],
            r["input_hash"], r["target_hash"],
        ) == (len(p), sum(m), span + 1, md5(" ".join(inp)), md5(" ".join(tgt)))
    big = out[4]
    assert abs(big["n_masked"] / big["n_tokens"] - 0.3) < 0.05


def test_fim_transform_matches_python_model(spark):
    """FIM: deterministic split points and PSM hashes equal the Python
    model; empty docs yield the sentinel-only stream; invariants
    0 <= a <= b <= n hold."""
    import hashlib
    import re

    from vectorsearch_spark.operators.curate import fim_transform
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    docs = [(i, " ".join(f"w{j}" for j in range(i % 9))) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fim_transform(df).collect()}
    pat = re.compile(BPE_PIECE_RE)
    md5i = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    for d, t in docs:
        p = pat.findall(t.lower())
        n = len(p)
        a = md5i(f"{d}|fim_a") % (n + 1)
        b = a + md5i(f"{d}|fim_b") % (n - a + 1)
        psm = ["<PRE>"] + p[:a] + ["<SUF>"] + p[b:] + ["<MID>"] + p[a:b]
        r = out[d]
        assert 0 <= r["split_a"] <= r["split_b"] <= r["n_tokens"]
        assert (r["n_tokens"], r["split_a"], r["split_b"], r["psm_hash"]) == (
            n, a, b, md5(" ".join(psm))
        )


def test_temperature_budget_mix_model_and_flattening(spark):
    """α-sampling: budgets follow size^α normalized to the target
    (Python model equality on the selected set), α=1 reproduces the
    natural proportions, α=0 splits the target uniformly, and
    low-resource sources gain share as α drops."""
    import hashlib
    import re

    from vectorsearch_spark.operators.curate import (
        temperature_budget_mix,
        token_budget_mix,
    )
    from vectorsearch_spark.operators.text import BPE_PIECE_RE

    rows = []
    i = 0
    for src, n_docs, words in [("big", 60, 30), ("mid", 20, 20), ("small", 5, 10)]:
        for _ in range(n_docs):
            rows.append((i, " ".join(f"w{j}" for j in range(words)), src))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pat = re.compile(BPE_PIECE_RE)
    sizes = {}
    for _, t, s in rows:
        sizes[s] = sizes.get(s, 0) + len(pat.findall(t.lower()))

    def budgets(alpha, total):
        import math

        den = sum(float(t) ** alpha for _, t in sorted(sizes.items()))
        return {
            s: max(1, int(math.floor(float(t) ** alpha / den * total + 0.5)))
            for s, t in sizes.items()
        }

    for alpha in (0.0, 0.5, 1.0):
        got = sorted(
            map(tuple, temperature_budget_mix(df, alpha, 1500).collect())
        )
        exp = sorted(
            map(tuple, token_budget_mix(df, budgets(alpha, 1500)).collect())
        )
        assert got == exp, alpha
    b1, b0 = budgets(1.0, 1500), budgets(0.0, 1500)
    assert b0["small"] == b0["big"]            # α=0: uniform
    assert b1["small"] < b0["small"]           # flattening lifts the tail
    assert b1["big"] > b0["big"]
    total1 = sum(b1.values())
    assert abs(b1["big"] / total1 - sizes["big"] / sum(sizes.values())) < 0.01


def test_select_top_fraction_nan_and_null_scores_excluded(spark):
    """NaN poisons the group max (every bin index casts null) and null
    inflates the target count — both must be excluded so the keep set
    is exactly the top frac of the RANKABLE rows (ADVICE r8)."""
    from pyspark.sql import Window

    from vectorsearch_spark.operators.curate import select_top_fraction

    rows = [(i, "s0", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    dirty = df.unionByName(
        spark.createDataFrame(
            [(1000, "s0", float("nan")), (1001, "s0", None)],
            "doc_id long, source string, score double",
        )
    ).repartition(8)
    got = sorted(
        tuple(r)
        for r in select_top_fraction(
            dirty, 0.2, "score", "source", "doc_id", bins=16
        ).collect()
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id"))
    exp = sorted(
        tuple(r)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)  # ceil(0.2 * 100) over rankable rows
        .drop("rn")
        .collect()
    )
    assert got == exp


def test_length_bucket_batches_known_values(spark):
    """Handcrafted bucketing/batching math: power-of-two caps with the
    min_cap floor, exact boundary counts (16/17/32/33), within-bucket
    id-order batch splitting at batch_size = max(1, B // cap), the
    cap > batch_tokens degenerate (batch_size 1), zero-token drop,
    and pad accounting."""
    from vectorsearch_spark.operators.curate import length_bucket_batches

    rows = [
        (1, 3),     # <= min_cap → cap 16
        (2, 16),    # boundary: exactly min_cap → cap 16
        (3, 17),    # first past the floor → cap 32
        (4, 32),    # exact power of two → cap 32 (log2 float trap)
        (5, 33),    # → cap 64
        (6, 0),     # zero-token: dropped
        (7, 20),    # cap 32
        (8, 5000),  # cap 8192 > batch_tokens → batch_size 1
        (9, 6000),  # cap 8192 → its own batch
        (10, 16),   # third 16-cap doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = {
        r["doc_id"]: (r["bucket_cap"], r["batch_in_bucket"], r["pad_tokens"])
        for r in length_bucket_batches(
            df, batch_tokens=64, count_col="n"
        ).collect()
    }
    assert 6 not in out and len(out) == 9
    # cap-16 bucket: batch_size = 64 // 16 = 4 → docs 1,2,10 in batch 0
    assert out[1] == (16, 0, 13)
    assert out[2] == (16, 0, 0)
    assert out[10] == (16, 0, 0)
    # cap-32 bucket: batch_size = 2 → id order (3,4),(7)
    assert out[3] == (32, 0, 15)
    assert out[4] == (32, 0, 0)
    assert out[7] == (32, 1, 12)
    # cap-64: doc 5 alone, batch_size 1
    assert out[5] == (64, 0, 31)
    # cap 8192 > B: batch_size clamps to 1 → one doc per batch, id order
    assert out[8] == (8192, 0, 3192)
    assert out[9] == (8192, 1, 2192)


def test_length_bucket_batches_bpe_counts_cap_edges(spark):
    """Tokenizer-true bucketing: real apply_bpe_merges counts feed
    length_bucket_batches(count_col=...), with documents engineered so
    the REAL token counts land exactly on power-of-two cap edges
    (16→16, 17→32, 32→32, 33→64) — the float-log2 mis-bucketing case
    the integer bit-length exists for, now exercised with actual
    tokenizer output instead of the estimator."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.bpe import apply_bpe_merges
    from vectorsearch_spark.operators.curate import length_bucket_batches

    merges = [(0, "t", "h", 0), (1, "th", "e", 0), (2, "i", "n", 0)]
    # per-word counts under this table: 'the'->1, 'thin'->2 (th+in),
    # 'a'->1, 'xy'->2; '7'->1 (non-alpha passes through whole)
    docs = [
        (1, "the " * 16),            # 16 tokens -> cap 16
        (2, "the " * 16 + "a"),      # 17 -> cap 32
        (3, "thin " * 16),           # 32 -> cap 32
        (4, "thin " * 16 + "7"),     # 33 -> cap 64
        (5, "xy"),                   # 2 -> min_cap floor 16
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    enc = apply_bpe_merges(df, merges)
    counts = enc.groupBy("doc_id").agg(
        F.sum(F.size("toks")).cast("long").alias("n_bpe")
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bucket_cap"], r["pad_tokens"])
        for r in length_bucket_batches(
            counts, batch_tokens=64, count_col="n_bpe"
        ).collect()
    }
    assert got == {
        1: (16, 16, 0),
        2: (17, 32, 15),
        3: (32, 32, 0),
        4: (33, 64, 31),
        5: (2, 16, 14),
    }
    # within-bucket batching: cap 16 holds batch_size 64//16 = 4 -> docs
    # 1 and 5 share batch 0; cap 32 holds 2 -> docs 2 and 3 share batch 0
    batches = {
        r["doc_id"]: (r["bucket_cap"], r["batch_in_bucket"])
        for r in length_bucket_batches(
            counts, batch_tokens=64, count_col="n_bpe"
        ).collect()
    }
    assert batches[1] == (16, 0) and batches[5] == (16, 0)
    assert batches[2] == (32, 0) and batches[3] == (32, 0)
    assert batches[4] == (64, 0)
