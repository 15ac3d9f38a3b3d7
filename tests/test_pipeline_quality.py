"""Handcrafted-value tests for the round-3 pipeline-quality operators:
repetition metrics, PII scan/redaction, and benchmark contamination.
(Corpus-scale oracle parity runs via test_workload_parity.)"""

from __future__ import annotations

import hashlib

from vectorsearch_spark.operators.dedup import benchmark_overlap
from vectorsearch_spark.operators.text import pii_scan, repetition_stats


def test_repetition_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # bigrams: aa aa ab → best 2/3
            (2, "x y x y x"),        # bigrams: xy yx xy yx → best 2/4
            (3, "one two"),          # no trigrams
            (4, ""),                 # no tokens at all
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].n_tokens == 4
    assert got[1].n_2grams == 3 and got[1].top_2gram_frac == 0.6667
    assert got[1].n_3grams == 2 and got[1].top_3gram_frac == 0.5
    assert got[2].n_2grams == 4 and got[2].top_2gram_frac == 0.5
    assert got[3].n_2grams == 1 and got[3].top_2gram_frac == 1.0
    assert got[3].n_3grams == 0 and got[3].top_3gram_frac is None
    assert got[4].n_tokens == 0 and got[4].n_2grams == 0
    assert got[4].top_2gram_frac is None


def test_pii_scan_counts_and_redaction(spark):
    text = "mail bob@corp.io or b.c@x.co, call +1-555-867-5309, ip 10.0.3.25 end"
    df = spark.createDataFrame([(1, text), (2, "clean prose only")],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scan(df).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ipv4) == (2, 1, 1)
    assert got[1].has_pii is True
    expected = "mail <EMAIL> or <EMAIL>, call <PHONE>, ip <IP> end"
    assert got[1].redacted_len == len(expected)
    assert got[1].redacted_md5 == hashlib.md5(expected.encode()).hexdigest()
    assert got[2].has_pii is False
    assert got[2].redacted_md5 == hashlib.md5(b"clean prose only").hexdigest()


def test_pii_ip_like_email_degrades_deterministically(spark):
    # no alpha TLD → not an email; the embedded IPv4 is still caught
    df = spark.createDataFrame([(1, "ping a@1.2.3.4 now")], "doc_id long, text string")
    r = pii_scan(df).collect()[0]
    assert r.n_emails == 0 and r.n_ipv4 == 1
    expected = "ping a@<IP> now"
    assert r.redacted_md5 == hashlib.md5(expected.encode()).hexdigest()


def test_benchmark_overlap_flags_copies(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # verbatim copy
            (3, "completely different words about spark plans here"),
        ],
        "doc_id long, text string",
    )
    bench = corpus.where("doc_id = 1")
    got = {r.doc_id: r for r in benchmark_overlap(corpus, bench).collect()}
    assert got[1].contamination == 1.0 and got[1].flagged is True
    assert got[2].contamination == 1.0 and got[2].flagged is True
    assert got[3].n_overlap == 0 and got[3].flagged is False
    assert got[3].contamination == 0.0


def test_benchmark_overlap_is_broadcast_no_corpus_shuffle(spark):
    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3}") for i in range(20)],
        "doc_id long, text string",
    )
    bench = corpus.where("doc_id < 2")
    plan = (
        benchmark_overlap(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the bench-gram set must come in as a broadcast hash table (built
    # once per task); the exploded corpus grams must never sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_lm_counts_model_and_pruning(spark):
    """Corpus trigram counts: equals a direct Python count, prunes
    below min_count, and unigram mode (n=1) counts every piece."""
    import re
    from collections import Counter

    from vectorsearch_spark.operators.text import BPE_PIECE_RE, ngram_lm_counts

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "a dog ran fast"),
        (4, "xy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pat = re.compile(BPE_PIECE_RE)
    model = Counter()
    for _, t in rows:
        p = pat.findall(t.lower())
        for i in range(len(p) - 2):
            model[" ".join(p[i : i + 3])] += 1
    got = {
        r["ngram"]: r["n_occurrences"]
        for r in ngram_lm_counts(df, n=3, min_count=2).collect()
    }
    assert got == {g: c for g, c in model.items() if c >= 2}
    assert "the cat sat" in got and got["the cat sat"] == 2
    uni = {
        r["ngram"]: r["n_occurrences"]
        for r in ngram_lm_counts(df, n=1, min_count=1).collect()
    }
    flat = Counter()
    for _, t in rows:
        flat.update(pat.findall(t.lower()))
    assert uni == dict(flat)


def test_source_overlap_counts_distinct_shared_ngrams(spark):
    """Overlap matrix equals a direct Python set-intersection model:
    within-source repeats collapse (DISTINCT grams), pairs are
    ordered src_a < src_b, disjoint sources are absent."""
    import re
    from itertools import combinations

    from vectorsearch_spark.operators.text import BPE_PIECE_RE, source_overlap

    rows = [
        (1, "alpha beta gamma delta epsilon", "s1"),
        (2, "alpha beta gamma delta zeta", "s2"),       # shares a 4-gram run
        (3, "alpha beta gamma delta epsilon", "s2"),    # repeat within s2
        (4, "totally different words entirely here", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    n = 3
    pat = re.compile(BPE_PIECE_RE)
    grams = {}
    for _, t, s in rows:
        p = pat.findall(t.lower())
        grams.setdefault(s, set()).update(
            " ".join(p[i : i + n]) for i in range(len(p) - n + 1)
        )
    model = {
        (a, b): len(grams[a] & grams[b])
        for a, b in combinations(sorted(grams), 2)
        if grams[a] & grams[b]
    }
    got = {
        (r["src_a"], r["src_b"]): r["n_shared_ngrams"]
        for r in source_overlap(df, n=n).collect()
    }
    assert got == model
    assert ("s1", "s2") in got and not any("s3" in k for k in got)


def test_normalize_text_known_values(spark):
    """normalize_text: NFC composition, quote/dash folding, unicode
    space folding, ASCII collapse+trim, optional lowercase, NULL
    passthrough — handcrafted expectations per rule."""
    from vectorsearch_spark.operators.text import normalize_text

    rows = [
        (1, "Cafe\u0301 time"),             # NFC composes e+U+0301 -> é
        (2, "“quoted” ‘x’"),   # curly quotes → ascii
        (3, "a — b – c − d"),       # em/en/minus dashes → -
        (4, "a b c　d"),             # nbsp/em/ideographic spaces
        (5, "  too\t\tmany\n\nspaces  "),          # collapse + trim
        (6, None),                                  # NULL passthrough
        (7, ""),                                    # empty stays empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_norm"], r["n_chars"])
           for r in normalize_text(df).collect()}
    assert got[1] == ("Café time", 9)
    assert got[2] == ('"quoted" \'x\'', 12)
    assert got[3] == ("a - b - c - d", 13)
    assert got[4] == ("a b c d", 7)
    assert got[5] == ("too many spaces", 15)
    assert got[6] == (None, None)  # NULL in → NULL out (SQL length(NULL))
    assert got[7] == ("", 0)
    low = {r["doc_id"]: r["text_norm"]
           for r in normalize_text(df, lowercase=True).collect()}
    assert low[1] == "café time"


def _py_gopher(text: str) -> dict:
    """Independent pure-Python model of the Gopher rules (same pinned
    definitions as the operator docstring; no Spark, no shared code)."""
    import re

    words = [w for w in re.split(r"[ \t\n\r\f\v]+", text) if w]
    lines = [l for l in text.split("\n") if l.strip()]
    n_words, n_lines = len(words), len(lines)
    w1, l1 = max(n_words, 1), max(n_lines, 1)
    mean_len = round(sum(len(w) for w in words) / w1, 4)
    symbol = round(sum(w.count("#") + w.count("…") for w in words) / w1, 4)
    bullet = round(sum(bool(re.match(r"^[•*-]", l.lstrip())) for l in lines) / l1, 4)
    ellip = round(
        sum(bool(re.search(r"(…|\.\.\.)$", l.rstrip())) for l in lines) / l1, 4
    )
    alpha = round(sum(bool(re.search("[A-Za-z]", w)) for w in words) / w1, 4)
    folded = {re.sub(r"^[^a-z]+|[^a-z]+$", "", w.lower()) for w in words}
    stops = len(folded & {"the", "be", "to", "of", "and", "that", "have", "with"})
    return dict(
        n_words=n_words, mean_word_len=mean_len, symbol_ratio=symbol,
        bullet_frac=bullet, ellipsis_frac=ellip, alpha_word_frac=alpha,
        stop_hits=stops,
    )


def test_gopher_quality_matches_python_model(spark):
    from vectorsearch_spark.operators.text import gopher_quality

    texts = [
        "the quick brown fox and that fox have gone to be with friends " * 5,
        "• a\n• b\n• c\nonly bullets here",
        "ends with dots...\nends with ellipsis…\nplain",
        "### #tags# everywhere # " * 10,
        "12345 67890 !!! ???",
        "the of and to be that have with",
        "x",
        "   \n  \n",
        "word " * 200000,  # > 100k words: f_word_count upper bound
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    for i, t in enumerate(texts):
        exp = _py_gopher(t)
        for k, v in exp.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
        # flags recompute from the emitted (rounded) metrics
        assert got[i]["f_word_count"] == (50 <= exp["n_words"] <= 100_000)
        assert got[i]["f_mean_word_len"] == (3.0 <= exp["mean_word_len"] <= 10.0)
        assert got[i]["f_symbol_ratio"] == (exp["symbol_ratio"] <= 0.1)
        assert got[i]["f_bullet"] == (exp["bullet_frac"] <= 0.9)
        assert got[i]["f_ellipsis"] == (exp["ellipsis_frac"] <= 0.3)
        assert got[i]["f_alpha_words"] == (exp["alpha_word_frac"] >= 0.8)
        assert got[i]["f_stop_words"] == (exp["stop_hits"] >= 2)
        assert got[i]["keep"] == all(
            got[i][f] for f in got[i] if f.startswith("f_")
        )


def test_gopher_quality_paper_thresholds_keep_good_prose(spark):
    from vectorsearch_spark.operators.text import gopher_quality

    good = (
        "the morning train was late and that meant we have to be quick "
        "with our plans of the day " * 3
    )
    df = spark.createDataFrame([(1, good)], ["doc_id", "text"])
    row = gopher_quality(df).collect()[0]
    assert row["keep"] is True, row.asDict()


def test_c4_clean_matches_python_model(spark):
    """c4_clean vs an independent pure-Python model of the same pinned
    C4 §2.2 definitions (terminal punct, ≥5 words, no 'javascript'
    line; ≥3 sentences, no 'lorem ipsum', no '{' doc)."""
    import re

    from vectorsearch_spark.operators.text import c4_clean

    texts = [
        "This is a good first sentence here.\nAnd a second full sentence too!\n"
        "Is this a third proper sentence?\nshort no punct\nbullet item",
        "Accept cookies to continue browsing now.\nEnable javascript to view this site.\n"
        "One more complete and useful sentence here.\nAnother complete and useful sentence follows.",
        "Contains lorem ipsum dolor sit amet filler.\nA perfectly fine sentence right here.\n"
        "Another perfectly fine sentence right here.\nA third perfectly fine sentence here.",
        'function() { return 1; }\nA first real sentence is right here.\n'
        "A second real sentence is right here.\nA third real sentence is right here.",
        'He said "this quoted line should survive fine."\nToo short.\n'
        "Ends with a question mark after five words?\nEnds with an exclamation over five words!",
        "",
        "no newline no punct",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}
    for i, t in enumerate(texts):
        lines = [l for l in t.split("\n") if l.strip()]
        keep_line = lambda l: (
            bool(re.search(r'[.!?"]$', l.rstrip()))
            and len([w for w in re.split(r"[ \t\r\f\v]+", l) if w]) >= 5
            and "javascript" not in l.lower()
        )
        kept = [l for l in lines if keep_line(l)]
        assert got[i]["n_lines"] == len(lines), i
        assert got[i]["n_kept_lines"] == len(kept), i
        assert got[i]["text_clean"] == "\n".join(kept), i
        f_sent = len(kept) >= 3
        f_lorem = "lorem ipsum" not in t.lower()
        f_brace = "{" not in t
        assert got[i]["f_min_sentences"] == f_sent, i
        assert got[i]["f_no_lorem"] == f_lorem, i
        assert got[i]["f_no_brace"] == f_brace, i
        assert got[i]["keep"] == (f_sent and f_lorem and f_brace), i
    # spot semantics: doc 0 keeps 3 lines -> keep; doc 1 drops the
    # javascript line; docs 2/3 rejected at doc level
    assert got[0]["keep"] is True
    assert "javascript" not in got[1]["text_clean"].lower()
    assert got[2]["keep"] is False and got[3]["keep"] is False


def test_gopher_repetition_matches_python_model(spark):
    """gopher_repetition vs an independent Python model of the pinned
    A1.2 definitions — crafted docs hitting each rule family."""
    from vectorsearch_spark.operators.text import (
        GOPHER_REP_THRESHOLDS,
        gopher_repetition,
    )

    texts = [
        # duplicate lines: 'same line' x3 of 4 lines
        "same line here\nsame line here\nsame line here\nunique closer line",
        # duplicate paragraphs
        "para one text\n\npara one text\n\ndifferent paragraph",
        # heavy top-2gram: 'aa bb' repeated
        "aa bb " * 30 + "tail",
        # duplicated 6-gram phrase x3 inside filler
        ("the exact same six word phrase " * 3) + "plus unique filler words",
        # clean prose — long enough that a count-1 n-gram cannot cover
        # >16% of the chars (the A1.1 50-word floor screens shorter docs)
        " ".join(f"w{i}token" for i in range(60)),
        "",
        "one",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}

    import re
    from collections import Counter

    for i, t in enumerate(texts):
        def seg(parts):
            s = [x.strip() for x in parts if x.strip()]
            c = Counter(s)
            return (len(s), sum(v for v in c.values() if v > 1),
                    sum(len(x) for x in s),
                    sum(len(k) * v for k, v in c.items() if v > 1))
        nl, dlo, lc, dlc = seg(t.split("\n"))
        np_, dpo, pc, dpc = seg(t.split("\n\n"))
        words = [w for w in re.split(r"[ \t\n\r\f\v]+", t.lower()) if w]
        wc = len(" ".join(words))
        exp = {
            "dup_line_frac": round(dlo / max(nl, 1), 4),
            "dup_para_frac": round(dpo / max(np_, 1), 4),
            "dup_line_char_frac": round(dlc / max(lc, 1), 4),
            "dup_para_char_frac": round(dpc / max(pc, 1), 4),
        }
        for n in (2, 3, 4):
            grams = Counter(" ".join(words[j:j+n]) for j in range(len(words)-n+1))
            top = max((c * len(g) for g, c in grams.items()), default=0)
            exp[f"top_{n}gram_char_frac"] = round(top / max(wc, 1), 4)
        for n in range(5, 11):
            grams = Counter(" ".join(words[j:j+n]) for j in range(len(words)-n+1))
            dup = sum(len(g) * c for g, c in grams.items() if c > 1)
            exp[f"dup_{n}gram_char_frac"] = round(dup / max(wc, 1), 4)
        for k, v in exp.items():
            assert abs(got[i][k] - v) < 5e-5, (i, k, got[i][k], v)
            assert got[i]["f_" + k] == (v <= GOPHER_REP_THRESHOLDS[k]), (i, k)
        assert got[i]["keep"] == all(
            got[i][c] for c in got[i] if c.startswith("f_")
        ), i
    # semantics spot checks
    assert got[0]["f_dup_line_frac"] is False     # 3/4 duplicate lines
    assert got[1]["f_dup_para_frac"] is False     # 2/3 duplicate paras
    assert got[2]["f_top_2gram_char_frac"] is False
    assert got[3]["f_dup_6gram_char_frac"] is False
    assert got[4]["keep"] is True


def test_fineweb_quality_matches_python_model(spark):
    """fineweb_quality (Penedo et al. 2024 §3.6) vs an independent
    Python model of the three pinned line metrics."""
    from vectorsearch_spark.operators.text import fineweb_quality

    texts = [
        # unpunctuated short lines -> fails punct AND short-line rules
        "nav\nhome\nabout us\ncontact\nblog\nshop",
        # one long duplicated line x2 of 3 -> fails dup-line-chars
        ("this exact long line repeats itself verbatim across the page."
         "\nthis exact long line repeats itself verbatim across the page."
         "\nshort tail."),
        # healthy prose: long punctuated distinct lines
        ("The first sentence of this document is long and ends properly."
         "\nThe second sentence is also long and ends with a question?"
         "\nA third distinct line closes the document with a period."),
        "",
        "single unpunctuated line that is quite long but has no terminal mark",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in fineweb_quality(df).collect()}

    import re
    from collections import Counter

    for i, t in enumerate(texts):
        lines = [l.strip() for l in t.split("\n") if l.strip()]
        l1 = max(len(lines), 1)
        punct = round(sum(bool(re.search(r'[.!?"]$', l)) for l in lines) / l1, 4)
        short = round(sum(len(l) < 30 for l in lines) / l1, 4)
        cnt = Counter(lines)
        tot = sum(len(l) for l in lines)
        dup = round(sum(len(l) for l in lines if cnt[l] > 1) / max(tot, 1), 4)
        assert got[i]["n_lines"] == len(lines), i
        assert abs(got[i]["line_punct_frac"] - punct) < 5e-5, i
        assert abs(got[i]["short_line_frac"] - short) < 5e-5, i
        assert abs(got[i]["dup_line_char_frac"] - dup) < 5e-5, i
        assert got[i]["f_line_punct"] == (punct >= 0.12), i
        assert got[i]["f_short_lines"] == (short <= 0.67), i
        assert got[i]["f_dup_line_chars"] == (dup <= 0.10), i
        assert got[i]["keep"] == all(
            got[i][k] for k in ("f_line_punct", "f_short_lines", "f_dup_line_chars")
        ), i
    assert got[0]["keep"] is False and got[1]["keep"] is False
    assert got[2]["keep"] is True
