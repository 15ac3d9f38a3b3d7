"""Property-based tests (hypothesis) — the Spark analog of the
reference's randomized integration tests (SURVEY §5): invariants that
must hold for ARBITRARY inputs, checked against trivial Python oracles.

Examples are capped low: each example spins Spark jobs, so we trade
example count for generator breadth (wide value ranges, adversarial
shapes)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=5),
    start=st.integers(min_value=0, max_value=10**12),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_dense_ids_dense_and_order_preserving(spark, sizes, start, nparts):
    """with_dense_ids: gids are exactly start..start+n-1 with no holes
    or duplicates, and with order_col they follow that order globally —
    for arbitrary row counts, partitionings, and 64-bit-range starts."""
    from vectorsearch_spark.index.ingest import with_dense_ids

    rows = [(i,) for i in range(sum(sizes))]
    df = spark.createDataFrame(rows, "row_id long").repartition(nparts)
    out, n, handle = with_dense_ids(df, start, order_col="row_id")
    got = {r["row_id"]: r["gid"] for r in out.collect()}
    handle.unpersist()
    assert n == len(rows)
    assert sorted(got.values()) == list(range(start, start + n))
    # order preservation: gid - start == row_id rank
    for rid, gid in got.items():
        assert gid == start + rid


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_duplicate_clusters_matches_union_find(spark, edges):
    """Connected components equal a driver-side union-find for arbitrary
    small graphs (self-loops and duplicate/reversed edges included)."""
    from vectorsearch_spark.operators.dedup import duplicate_clusters

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    assert got == expected
    # keeper flag consistency
    for r in duplicate_clusters(pairs).collect():
        assert r["is_keeper"] == (r["doc_id"] == r["cluster_id"])


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_knn_expr_distance_nonnegative_and_symmetric_top1(spark, vecs):
    """Catalyst cosine distance is clamped ≥ 0 for arbitrary float
    vectors (incl. zero vectors), and a self-query's top-1 is itself
    when vectors are distinct."""
    from vectorsearch_spark.config import Metric
    from vectorsearch_spark.operators.knn import knn_join_expr

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = df.select(F.col("vec_id").alias("query_id"), "embedding")
    rows = knn_join_expr(df, q, k=3, metric=Metric.COSINE, id_col="vec_id").collect()
    import math

    for r in rows:
        assert r["distance"] >= 0.0
        assert math.copysign(1.0, r["distance"]) == 1.0


@settings(**_SETTINGS)
@given(
    data=st.data(),
    m=st.sampled_from([2, 4]),
    k=st.sampled_from([4, 16]),
)
def test_pq_lut_distance_equals_explicit(spark, data, m, k):
    """For arbitrary float data: (a) the LUT asymmetric distance equals
    the explicitly computed L2² between the query and each row's
    RECONSTRUCTION, and (b) encode assigns every subvector to its
    nearest centroid."""
    import numpy as np

    from vectorsearch_spark.operators.pq import (
        approx_distances,
        build_lut,
        encode,
        train_codebook,
    )

    n = data.draw(st.integers(min_value=k, max_value=40))
    dim = m * data.draw(st.sampled_from([2, 4]))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    x = rng.randn(n, dim)
    q = rng.randn(dim)

    cb = train_codebook(x, m, k, iters=3, seed=7)
    codes = encode(x, cb)
    lut = build_lut(cb, q)
    got = approx_distances(codes, lut)

    sub = dim // m
    recon = np.stack(
        [
            np.concatenate([cb[j, codes[i, j]] for j in range(m)])
            for i in range(n)
        ]
    )
    expect = ((recon - q) ** 2).sum(axis=1)
    assert np.allclose(got, expect, atol=1e-9)
    # encode optimality: each chosen centroid is the argmin for its subvector
    for i in range(min(n, 5)):
        for j in range(m):
            d = ((cb[j] - x[i, j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
            assert d[codes[i, j]] <= d.min() + 1e-12


@settings(**_SETTINGS)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 60)),  # (user, ts-sec)
        min_size=0, max_size=25,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 60),
            st.one_of(st.none(), st.integers(0, 5)),  # nullable payload
        ),
        min_size=0, max_size=25,
    ),
    slice_seconds=st.sampled_from([None, 7]),  # default and time-sliced plans
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_join_matches_python_model(spark, lefts, rights, slice_seconds, direction):
    """asof_join ≡ the trivial per-row model: for each left row, the
    right row of the same key with max (ts, id) among ts <= left.ts
    (backward) / nearest ts ≥ left.ts with max id at equal ts
    (forward) — for arbitrary keys, duplicate timestamps, empty sides,
    and NULLable payload columns (the matched row's value must be
    attached even when it is NULL — it must not un-hide an older
    non-null value)."""
    from datetime import datetime

    from vectorsearch_spark.operators.events import asof_join

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, 0).replace(minute=s // 60, second=s % 60)

    lrows = [(i, u, ts(s)) for i, (u, s) in enumerate(lefts)]
    rrows = [(1000 + i, u, ts(s), v) for i, (u, s, v) in enumerate(rights)]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp") \
        if lrows else spark.range(0).selectExpr(
            "id AS event_id", "id AS user_id", "CAST(NULL AS timestamp) AS ts")
    right = spark.createDataFrame(
        rrows, "event_id long, user_id long, ts timestamp, val long") \
        if rrows else spark.range(0).selectExpr(
            "id AS event_id", "id AS user_id", "CAST(NULL AS timestamp) AS ts",
            "CAST(NULL AS long) AS val")

    got = {
        r.event_id: (r.asof_event_id, r.asof_val)
        for r in asof_join(
            left, right, on="user_id", payload=["event_id", "val"],
            tiebreak="event_id", how="left", slice_seconds=slice_seconds,
            direction=direction,
        ).collect()
    }
    for lid, lu, lts in lrows:
        if direction == "backward":
            cands = [(rts, rid, rv) for rid, ru, rts, rv in rrows
                     if ru == lu and rts <= lts]
        else:
            cands = [(rts, rid, rv) for rid, ru, rts, rv in rrows
                     if ru == lu and rts >= lts]
        want = (None, None)
        if cands:
            if direction == "backward":
                _, rid, rv = max(cands, key=lambda t: (t[0], t[1]))
            else:
                _, rid, rv = min(cands, key=lambda t: (t[0], -t[1]))
            want = (rid, rv)
        assert got[lid] == want, (lid, got[lid], want)


@settings(**_SETTINGS)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=0, max_size=20,
    ),
    intervals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(1, 20)),
        min_size=0, max_size=10,
    ),
    bins=st.sampled_from([None, 1, 5, 3600, "auto"]),
)
def test_interval_join_matches_python_model(spark, lefts, intervals, bins):
    """interval_join (both plans) ≡ the trivial nested-loop model:
    every (left, interval) pair of the same key with start <= ts < end
    — including overlapping intervals (multi-match) and empty sides."""
    from datetime import datetime

    from vectorsearch_spark.operators.events import interval_join

    def ts(s):
        return datetime(2024, 1, 1, 0, 0, 0).replace(minute=s // 60, second=s % 60)

    lrows = [(i, u, ts(s)) for i, (u, s) in enumerate(lefts)]
    rrows = [(100 + i, u, ts(s), ts(s + d)) for i, (u, s, d) in enumerate(intervals)]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp") \
        if lrows else spark.range(0).selectExpr(
            "id AS event_id", "id AS user_id", "CAST(NULL AS timestamp) AS ts")
    right = spark.createDataFrame(
        rrows, "iv_id long, user_id long, start timestamp, end timestamp"
    ) if rrows else spark.range(0).selectExpr(
        "id AS iv_id", "id AS user_id",
        "CAST(NULL AS timestamp) AS start", "CAST(NULL AS timestamp) AS end")

    got = {
        (r.event_id, r.iv_id)
        for r in interval_join(
            left, right, on="user_id", bin_seconds=bins
        ).collect()
    }
    want = {
        (lid, rid)
        for lid, lu, lts in lrows
        for rid, ru, rs, re_ in rrows
        if ru == lu and rs <= lts < re_
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["bmp", "ppm"]),
)
def test_codec_roundtrip_property(w, h, seed, fmt):
    """encode→decode identity for ALL image shapes — including 1×N and
    N×1 degenerates and every BMP row-padding residue — through the
    magic-dispatching decoder."""
    import numpy as np

    from vectorsearch_spark.functions.codecs import (
        decode_media,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_bmp(img) if fmt == "bmp" else encode_ppm(img)
    out = decode_media(data)
    assert out.dtype == np.uint8 and out.shape == (h, w, 3)
    assert np.array_equal(out, img)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["apple", "banana", "cherry", "dog", "egg"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    ),
    query=st.lists(
        st.sampled_from(["apple", "banana", "cherry", "zebra"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_bm25_matches_python_model(spark, docs, query):
    """bm25_topk vs a per-document pure-Python Okapi BM25 (idf =
    ln(1 + (N-df+0.5)/(df+0.5)), k1=1.2, b=0.75, round 4, ranked by
    (rounded score desc, doc_id), zero-score docs excluded)."""
    import math

    from vectorsearch_spark.operators.textsearch import bm25_topk

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    n = len(docs)
    avgdl = sum(len(w) for w in docs) / n
    model = []
    for i, words in enumerate(docs):
        score = 0.0
        for t in query:
            tf = float(words.count(t))
            dfreq = sum(1 for w in docs if t in w)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            if avgdl > 0:
                denom = tf + 1.2 * (0.25 + 0.75 * len(words) / avgdl)
            else:
                denom = tf + 1.2 * 0.25
            score += idf * (tf * 2.2) / denom if denom else 0.0
        score = round(score, 4)
        if score > 0:
            model.append((i, score))
    model.sort(key=lambda p: (-p[1], p[0]))
    model = model[:10]

    got = [
        (r["doc_id"], r["bm25"])
        for r in bm25_topk(df, " ".join(query), k=10).collect()
    ]
    assert got == model


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # key
            st.integers(min_value=0, max_value=30),  # ts offset (sec)
            st.sampled_from(["A", "B", None]),       # attr (nullable)
        ),
        min_size=0,
        max_size=25,
    ),
    collapse=st.booleans(),
)
def test_scd2_matches_python_model(spark, events, collapse):
    """changelog_to_scd2 vs a trivial per-key Python model, for
    arbitrary keys, duplicate timestamps (tiebreak = seq), NULL attrs,
    and both collapse modes."""
    import datetime as dt

    from vectorsearch_spark.operators.events import changelog_to_scd2

    base = dt.datetime(2024, 1, 1)
    rows = [
        (seq, k, base + dt.timedelta(seconds=off), a)
        for seq, (k, off, a) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "seq long, k long, ts timestamp, attr string")
    import datetime as _dt

    _far = _dt.datetime(2100, 1, 1)
    got = sorted(
        (r["k"], r["attr"] or "", r["valid_from"], r["valid_to"] or _far, r["is_current"])
        for r in changelog_to_scd2(
            df, on="k", ts="ts", attrs=["attr"], tiebreak="seq", collapse=collapse
        ).collect()
    )
    # model
    exp = []
    bykey: dict = {}
    for seq, k, ts, a in rows:
        bykey.setdefault(k, []).append((ts, seq, a))
    for k, evs in bykey.items():
        evs.sort()
        kept = []
        for ts, seq, a in evs:
            if collapse and kept and kept[-1][2] == a:
                continue
            kept.append((ts, seq, a))
        for i, (ts, seq, a) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            exp.append((k, a or "", ts, nxt or _far, nxt is None))
    assert got == sorted(exp)


@settings(**_SETTINGS)
@given(
    fact_keys=st.lists(st.integers(min_value=-5, max_value=50), min_size=0, max_size=40),
    key_set=st.sets(st.integers(min_value=-5, max_value=50), max_size=15),
    m_bits=st.sampled_from([64, 256, 1 << 14]),
    k=st.integers(min_value=1, max_value=6),
)
def test_bloom_semi_join_always_equals_semi_join(spark, fact_keys, key_set, m_bits, k):
    """bloom_semi_join(exact=True) ≡ plain left-semi for ARBITRARY key
    sets, including degenerate bitmaps where everything collides."""
    from vectorsearch_spark.operators.joins import bloom_semi_join

    fact = spark.createDataFrame(
        [(v, i) for i, v in enumerate(fact_keys)] or [(None, 0)],
        "k long, payload long",
    )
    keys = spark.createDataFrame([(v,) for v in key_set] or [(None,)], "k long")
    got = sorted(
        (r["k"], r["payload"])
        for r in bloom_semi_join(fact, keys, on="k", m_bits=m_bits, k=k).collect()
    )
    exp = sorted(
        (r["k"], r["payload"]) for r in fact.join(keys.dropna(), "k", "left_semi").collect()
    )
    assert got == exp


@settings(**_SETTINGS)
@given(
    n_words=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=15),
)
def test_chunking_matches_model_for_arbitrary_params(spark, n_words, chunk, stride):
    from vectorsearch_spark.operators.curate import chunk_documents

    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    )
    # piece count under BPE_PIECE_RE: "w12" -> ["w", "12"]
    n = 2 * n_words
    if n == 0:
        assert out == []
        return
    # independent walk model (not the operator's closed form): emit
    # starts while inside the doc, stop once a chunk reaches the end —
    # stride > chunk must never yield a past-the-end phantom chunk
    exp = []
    start = 0
    while start < n:
        exp.append((len(exp), start, min(chunk, n - start)))
        if start + chunk >= n:
            break
        start += stride
    assert out == exp
    assert all(ln > 0 and s < n for _, s, ln in out)
    if stride <= chunk:  # coverage invariant only below sampling mode
        covered = set()
        for _, s, ln in out:
            covered |= set(range(s, s + ln))
        assert covered == set(range(n))


@settings(**_SETTINGS)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
    budget_a=st.integers(min_value=1, max_value=200),
    budget_b=st.integers(min_value=1, max_value=200),
    margin=st.sampled_from([2.0, 4.0, 8.0]),
)
def test_token_budget_mix_always_equals_naive_model(
    spark, lens, budget_a, budget_b, margin
):
    """Property: the margin-prefiltered sampler is EXACTLY the naive
    full-sort cumulative cut for every corpus/budget/margin where the
    margin suffices — and when the margin prefix cannot cover a budget
    it raises instead of silently under-filling. Randomized doc sizes,
    two sources, budgets spanning fits-entirely through tiny."""
    import hashlib

    from vectorsearch_spark.operators.curate import token_budget_mix

    rows = [
        (i, "src_a" if i % 2 == 0 else "src_b", "tok " * lens[i])
        for i in range(len(lens))
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = {"src_a": budget_a, "src_b": budget_b}

    sel = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1_000_000
    model = {}
    for src, budget in budgets.items():
        ids = sorted(
            (i for i in range(len(lens)) if (i % 2 == 0) == (src == "src_a")),
            key=lambda i: (sel(i), i),
        )
        cum = 0
        for i in ids:
            if lens[i] == 0:
                # zero-token doc: never consumes budget; kept iff the
                # budget is not already exhausted (cum < budget)
                if cum < budget:
                    model[i] = (src, cum)
                continue
            if cum < budget:
                cum += lens[i]
                model[i] = (src, cum)
    try:
        out = token_budget_mix(df, budgets, margin=margin).collect()
    except ValueError as e:
        assert "margin" in str(e)
        return  # legitimate margin shortfall: raising IS the contract
    got = {r["doc_id"]: (r["source"], r["cum_tokens"]) for r in out}
    assert got == model


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    span=st.integers(min_value=2, max_value=5),
)
def test_repeated_spans_matches_interval_model(spark, docs, span):
    """repeated_spans equals the direct Python reference (gram ->
    global first occurrence, mark the rest, merge intervals) for
    ARBITRARY tiny-alphabet corpora — small alphabets maximize
    accidental repeats, self-overlaps, and cross-doc collisions."""
    from vectorsearch_spark.operators.curate import repeated_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    toks = {i: t for i, (_, txt) in enumerate(rows) for t in [txt.split()] }
    occs: dict = {}
    for d in sorted(toks):
        p = toks[d]
        for i in range(len(p) - span + 1):
            occs.setdefault(" ".join(p[i : i + span]), []).append((d, i))
    model = {}
    for d, p in toks.items():
        iv = sorted(
            (i, i + span)
            for g, os_ in occs.items()
            for dd, i in os_[1:]
            if dd == d and len(os_) > 1
        )
        merged: list = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        model[d] = (len(p), len(merged), sum(e - s for s, e in merged))
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"])
        for r in repeated_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            span_tokens=span,
        ).collect()
    }
    assert got == model


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=1, max_value=4),
    mc=st.integers(min_value=1, max_value=3),
)
def test_ngram_lm_counts_matches_counter(spark, docs, n, mc):
    """ngram_lm_counts equals a Python Counter with threshold pruning
    for arbitrary tiny-alphabet corpora and any (n, min_count)."""
    from collections import Counter

    from vectorsearch_spark.operators.text import ngram_lm_counts

    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    model = Counter()
    for _, txt in rows:
        p = txt.split()
        for i in range(len(p) - n + 1):
            model[" ".join(p[i : i + n])] += 1
    exp = {g: c for g, c in model.items() if c >= mc}
    got = {
        r["ngram"]: r["n_occurrences"]
        for r in ngram_lm_counts(
            spark.createDataFrame(rows, "doc_id long, text string"),
            n=n,
            min_count=mc,
        ).collect()
    }
    assert got == exp


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcd"), min_size=0, max_size=15),
            st.sampled_from(["s1", "s2", "s3"]),
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=1, max_value=3),
)
def test_source_overlap_matches_set_intersections(spark, docs, n):
    """source_overlap equals pairwise distinct-gram set intersections
    for arbitrary corpora/source assignments."""
    from itertools import combinations

    from vectorsearch_spark.operators.text import source_overlap

    rows = [(i, " ".join(t), s) for i, (t, s) in enumerate(docs)]
    grams: dict = {}
    for _, txt, s in rows:
        p = txt.split()
        grams.setdefault(s, set()).update(
            " ".join(p[i : i + n]) for i in range(len(p) - n + 1)
        )
    exp = {
        (a, b): len(grams[a] & grams[b])
        for a, b in combinations(sorted(grams), 2)
        if grams[a] & grams[b]
    }
    got = {
        (r["src_a"], r["src_b"]): r["n_shared_ngrams"]
        for r in source_overlap(
            spark.createDataFrame(rows, "doc_id long, text string, source string"),
            n=n,
        ).collect()
    }
    assert got == exp


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["nav", "foot", "ad", "x1", "x2", "x3", "", " body "]),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(min_value=2, max_value=4),
)
def test_line_dedup_matches_python_model(spark, docs, min_docs):
    """line_dedup for arbitrary tiny corpora (repeated, blank, and
    whitespace-only lines): boilerplate = trimmed line in ≥ min_docs
    DISTINCT docs, dropped everywhere; blanks always kept; kept_hash is
    md5 of the survivors re-joined."""
    import hashlib

    from vectorsearch_spark.operators.curate import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_dedup(df, min_docs=min_docs).collect()}

    key_docs: dict = {}
    for i, t in rows:
        for ln in t.split("\n"):
            k = ln.strip()
            if k:
                key_docs.setdefault(k, set()).add(i)
    boiler = {k for k, ds in key_docs.items() if len(ds) >= min_docs}
    for i, t in rows:
        lines = t.split("\n")
        kept = [ln for ln in lines if ln.strip() == "" or ln.strip() not in boiler]
        r = got[i]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        assert r["n_boiler"] == len(lines) - len(kept)
        assert r["kept_hash"] == hashlib.md5("\n".join(kept).encode()).hexdigest()


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=40),
    k=st.integers(min_value=1, max_value=5),
    nparts=st.integers(min_value=1, max_value=6),
)
def test_heavy_hitters_exact_or_loud(spark, counts, k, nparts):
    """heavy_hitters either returns EXACTLY the groupBy-count top-k
    (count desc, item asc) or raises the certification ValueError —
    never a silently wrong list — for arbitrary multisets, capacities
    that force pruning, and partitionings."""
    import pytest

    from vectorsearch_spark.operators.sketch import heavy_hitters

    rows = [(f"i{j:02d}",) for j, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "item string").repartition(nparts)
    exact = sorted(
        ((c, f"i{j:02d}") for j, c in enumerate(counts)),
        key=lambda t: (-t[0], t[1]),
    )[:k]
    try:
        got = [
            (r["cnt"], r["item"])
            for r in heavy_hitters(df, "item", k=k, capacity=max(k, 8)).collect()
        ]
    except ValueError as e:
        assert "exactness bound" in str(e) or "capacity" in str(e)
        return
    assert got == exact


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=80,
    ),
    ngroups=st.integers(min_value=1, max_value=3),
    bins=st.sampled_from([2, 7, 32]),
)
def test_exact_quantiles_matches_sorted_rank(spark, vals, ngroups, bins):
    """exact_quantiles equals rank ceil(p·n) of the sorted group for
    arbitrary floats (duplicates, negatives, one-element groups) and
    tiny bin counts that force multi-rank border bins."""
    import math

    from vectorsearch_spark.operators.profile import exact_quantiles

    rows = [(i, f"g{i % ngroups}", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    probs = [0.1, 0.5, 1.0]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in exact_quantiles(df, "v", probs, "g", bins=bins).collect()
    }
    groups: dict = {}
    for _, g, v in rows:
        groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        vs.sort()
        for p in probs:
            r = max(1, math.ceil(p * len(vs)))
            assert got[(g, p)] == vs[r - 1], (g, p)
