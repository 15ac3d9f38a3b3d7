"""URL canonicalization / URL dedup / per-host cap (operators/urls.py).

Model checks use a pure-Python canonicalizer built on urllib.parse
(stdlib) — an INDEPENDENT implementation of the same RFC 3986 §6
rules, so a shared regex bug can't self-confirm.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.urls import (
    TRACKING_PARAM_RE,
    canonicalize_url,
    host_cap,
    is_absolute_url,
    url_dedup,
    url_host,
)

import re


def _py_pct(s: str) -> str:
    """Model of RFC 3986 §6.2.2.2 — regex-scan based, independent of
    the engine's split-on-'%' formulation."""

    def fix(m: "re.Match[str]") -> str:
        h = m.group(1)
        ch = chr(int(h, 16))
        if ch.isascii() and (ch.isalnum() or ch in "-._~"):
            return ch
        return "%" + h.upper()

    return re.sub(r"%([0-9A-Fa-f]{2})", fix, s)


def _py_dot(path: str) -> str:
    """Model of RFC 3986 §6.2.2.3 — the LITERAL two-buffer algorithm
    from the RFC pseudocode, independent of the engine's stack fold."""
    inp, out = path, ""
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            out = out[: out.rfind("/")] if "/" in out else ""
        elif inp == "/..":
            inp = "/"
            out = out[: out.rfind("/")] if "/" in out else ""
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i == -1:
                out, inp = out + inp, ""
            else:
                out, inp = out + inp[:i], inp[i:]
    return out


def _py_canon(url: str, strip_www: bool = False) -> str:
    """Independent stdlib-based model of the canonicalization rules."""
    if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", url):
        return url
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    if strip_www and netloc.startswith("www."):
        netloc = netloc[4:]
    path = _py_dot(_py_pct(parts.path)) or "/"
    kept = sorted(
        p
        for p in _py_pct(parts.query).split("&")
        if p and not re.match(TRACKING_PARAM_RE, p)
    )
    q = ("?" + "&".join(kept)) if kept else ""
    return f"{scheme}://{netloc}{path}{q}"


CASES = [
    "HTTP://WWW.Example.COM:80/A/b?utm_source=x&b=2&a=1#frag",
    "https://example.com:443/",
    "https://example.com",
    "http://example.com/path/?z=1&y=2&z=0",
    "http://example.com/?utm_campaign=spring&utm_medium=email",
    "http://example.com/?fbclid=abc123",
    "http://example.com/?gclid=1&real=2&msclkid=3&mc_eid=4&igshid=5",
    "HTTPS://API.Example.org:8443/v1?b=2&a=1",
    "ftp://Files.Example.net/pub",
    "http://example.com/a%20b?q=hello%20world",
    "http://example.com/##double",
    "not a url at all",
    "relative/path?utm_source=x",
    "http://example.com/?&&a=1&&",
    "http://example.com/?utm_",
    # r12: dot segments + percent-encoding normalization
    "http://example.com/a/./b",
    "http://example.com/a/../b",
    "http://example.com/a/b/..",
    "http://example.com/../../a",
    "http://example.com/%7Euser/x",
    "http://example.com/a%2Fb?q=%2f%41",
    "http://example.com/%2e%2e/a",
]


@pytest.mark.parametrize("strip_www", [False, True])
def test_canonicalize_matches_stdlib_model(spark, strip_www):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)], ["i", "url"])
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url("url", strip_www=strip_www).alias("c")
        ).collect()
    }
    for i, u in enumerate(CASES):
        assert got[i] == _py_canon(u, strip_www=strip_www), (u, got[i])


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)], ["i", "url"])
    once = df.select("i", canonicalize_url("url").alias("url"))
    twice = once.select("i", canonicalize_url("url").alias("url"))
    assert sorted(once.collect()) == sorted(twice.collect())


def test_is_absolute_and_host(spark):
    df = spark.createDataFrame(
        [
            (0, "HTTP://WWW.Example.COM:80/x"),
            (1, "https://sub.domain.org/y"),
            (2, "nope"),
            (3, "http://x.net:8080/p"),        # ANY port strips from host
            (4, "http://[::1]:8080/p"),        # bracketed IPv6 + port
            (5, "https://[2001:DB8::1]/p"),    # bracketed IPv6, no port
        ],
        ["i", "url"],
    )
    rows = {
        r["i"]: (r["abs"], r["h"], r["hw"])
        for r in df.select(
            "i",
            is_absolute_url("url").alias("abs"),
            url_host("url").alias("h"),
            url_host("url", strip_www=True).alias("hw"),
        ).collect()
    }
    assert rows[0] == (True, "www.example.com", "example.com")
    assert rows[1] == (True, "sub.domain.org", "sub.domain.org")
    assert rows[2][0] is False
    assert rows[3][1] == "x.net"
    assert rows[4][1] == "[::1]"
    assert rows[5][1] == "[2001:db8::1]"


def test_url_dedup_min_id_keeper(spark):
    df = spark.createDataFrame(
        [
            (5, "HTTP://WWW.E.COM:80/a?utm_source=x&b=2&a=1"),
            (3, "http://e.com/a?a=1&b=2"),
            (9, "http://e.com/a?b=2&a=1#frag"),
            (7, "http://other.com/"),
        ],
        ["doc_id", "url"],
    )
    out = {r["url"]: (r["keeper_doc_id"], r["n_fetches"]) for r in url_dedup(df).collect()}
    assert out == {
        "http://e.com/a?a=1&b=2": (3, 3),
        "http://other.com/": (7, 1),
    }


def test_host_cap_matches_naive_model(spark):
    # 3 hosts; one "mega" host with 200 rows so the pre-truncate phase
    # actually drops rows before the final rank
    rows = []
    for i in range(200):
        rows.append((i, "mega.com", float(i % 17)))
    for i in range(200, 210):
        rows.append((i, "small.org", float(i)))
    rows.append((999, "single.net", 1.0))
    df = spark.createDataFrame(rows, ["doc_id", "host", "score"])
    cap = 5
    got = {
        (r["host"], r["doc_id"], r["host_rank"])
        for r in host_cap(df, cap=cap, priority_col="score").collect()
    }
    # naive model: sort by (-score, doc_id) within host, take cap
    expect = set()
    by_host: dict[str, list[tuple[float, int]]] = {}
    for doc_id, host, score in rows:
        by_host.setdefault(host, []).append((score, doc_id))
    for host, hs in by_host.items():
        hs.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, doc_id) in enumerate(hs[:cap], start=1):
            expect.add((host, doc_id, rank))
    assert got == expect


def test_host_cap_no_priority_keeps_lowest_ids(spark):
    df = spark.createDataFrame(
        [(i, "h") for i in range(50)], ["doc_id", "host"]
    )
    kept = sorted(r["doc_id"] for r in host_cap(df, cap=3).collect())
    assert kept == [0, 1, 2]


def test_host_cap_pre_truncate_is_superset_invariant(spark):
    # adversarial: every row in the mega host has the SAME priority, so
    # ties break purely on doc_id — a wrong salt/pre-truncate order
    # would surface here as a changed kept set
    df = spark.createDataFrame(
        [(i, "h", 1.0) for i in range(500)], ["doc_id", "host", "score"]
    )
    kept = sorted(r["doc_id"] for r in host_cap(df, cap=7, priority_col="score").collect())
    assert kept == list(range(7))


def test_canonicalize_is_single_projection_no_shuffle(spark):
    df = spark.createDataFrame([(1, "http://a.com/?b=1&a=2")], ["i", "url"])
    plan = (
        df.select(canonicalize_url("url").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_fold_url_dedup_batches_replay_and_crash(spark, tmp_path_factory):
    """Streaming URL-frontier dedup: canonical-equal fetches across
    batches drop against persisted state; within-batch keeps the
    min-id; a replayed epoch is a no-op; a crash BEFORE the marker
    commit replays into identical state."""
    import os

    from vectorsearch_spark.operators.urls import fold_url_dedup_batch

    schema = "doc_id long, url string"
    b1 = [
        (1, "http://a.com/x?b=2&a=1"),
        (2, "HTTP://WWW.A.COM:80/x?a=1&b=2&utm_source=z"),  # canon-dup of 1 -> drop (2 > 1)
        (3, "https://b.org/"),
    ]
    b2 = [
        (10, "http://a.com/x?a=1&b=2#frag"),  # canon-dup of accepted 1 -> drop
        (11, "https://c.net/fresh"),
    ]
    b3 = [
        (20, "https://B.ORG:443/"),  # canon-dup of accepted 3 -> drop
        (21, "https://d.io/new"),
    ]
    state = str(tmp_path_factory.mktemp("url_state")) + "/st"
    os.makedirs(state, exist_ok=True)

    for i, rows in enumerate([b1, b2, b3]):
        fold_url_dedup_batch(spark.createDataFrame(rows, schema), i, state)

    acc = {
        r["doc_id"]: r["canonical_url"]
        for r in spark.read.parquet(f"{state}/accepted").collect()
    }
    assert sorted(acc) == [1, 3, 11, 21]
    assert acc[1] == "http://a.com/x?a=1&b=2"
    assert acc[3] == "https://b.org/"

    # replay of an applied epoch: no-op (identical state)
    fold_url_dedup_batch(spark.createDataFrame(b3, schema), 2, state)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(f"{state}/accepted").collect()
    ) == [1, 3, 11, 21]

    # crash injection: write a partial epoch=3 dir WITHOUT the marker
    # commit, then replay epoch 3 — the partial dirs must be invisible
    # to the replay (no self-collision) and the final state correct
    b4 = [(30, "https://e.gov/a"), (31, "https://E.GOV/a")]
    spark.createDataFrame(
        [(30, "https://e.gov/a", "https://e.gov/a")],
        "doc_id long, url string, canonical_url string",
    ).write.mode("overwrite").parquet(f"{state}/accepted/epoch=3")
    spark.createDataFrame([("https://e.gov/a",)], "_curl string").write.mode(
        "overwrite"
    ).parquet(f"{state}/urls/epoch=3")
    fold_url_dedup_batch(spark.createDataFrame(b4, schema), 3, state)
    acc2 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{state}/accepted").collect()
    )
    assert acc2 == [1, 3, 11, 21, 30]


def test_fold_url_dedup_bucketed_state(spark, tmp_path_factory):
    """state_buckets mode: same fold semantics over the bucketed
    frontier table — replay no-op, crash-partial partition invisible
    to its replay, catalog-loss recovery via the external location,
    and the SCALE claim plan-asserted: the per-fold anti-join plans
    with exactly ONE exchange (the batch side) — the state side is a
    bucketed scan that is never re-shuffled."""
    import os
    import re

    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.urls import (
        _frontier_table,
        canonicalize_url,
        fold_url_dedup_batch,
        read_accepted,
    )

    schema = "doc_id long, url string"
    b1 = [
        (1, "http://a.com/x?b=2&a=1"),
        (2, "HTTP://WWW.A.COM:80/x?a=1&b=2&utm_source=z"),  # dup of 1
        (3, "https://b.org/"),
    ]
    b2 = [
        (10, "http://a.com/x?a=1&b=2#frag"),  # dup of accepted 1
        (11, "https://c.net/fresh"),
    ]
    state = str(tmp_path_factory.mktemp("url_state_b")) + "/st"
    os.makedirs(state, exist_ok=True)
    tbl = _frontier_table(state)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    fold_url_dedup_batch(spark.createDataFrame(b1, schema), 0, state, state_buckets=4)
    fold_url_dedup_batch(spark.createDataFrame(b2, schema), 1, state, state_buckets=4)
    assert sorted(
        r["doc_id"] for r in read_accepted(spark, state).collect()
    ) == [1, 3, 11]

    # plan: the state-side of the fold's anti-join is a bucketed scan
    # with NO exchange; the only exchange hashes the (tiny) batch side
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = spark.createDataFrame(b2, schema).withColumn(
            "_curl", canonicalize_url("url", strip_www=True)
        )
        seen = spark.table(tbl).where(F.col("epoch") < 2).select("_curl")
        plan = (
            batch.join(seen, "_curl", "left_anti")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    # replay of an applied epoch: no-op
    fold_url_dedup_batch(spark.createDataFrame(b2, schema), 1, state, state_buckets=4)
    assert sorted(
        r["doc_id"] for r in read_accepted(spark, state).collect()
    ) == [1, 3, 11]

    # crash injection: a partial epoch=2 state partition + accepted dir
    # WITHOUT the marker commit must be invisible to epoch 2's replay
    b3 = [(20, "https://e.gov/a"), (21, "https://E.GOV/a")]
    spark.createDataFrame([("https://e.gov/a",)], "_curl string").createOrReplaceTempView(
        "__crash_partial"
    )
    spark.sql(
        f"INSERT OVERWRITE TABLE {tbl} PARTITION (epoch=2)"
        " SELECT _curl FROM __crash_partial"
    )
    spark.createDataFrame(
        [(99, "https://e.gov/a", "https://e.gov/a")],
        "doc_id long, url string, canonical_url string",
    ).write.mode("overwrite").parquet(f"{state}/accepted/epoch=2")
    fold_url_dedup_batch(spark.createDataFrame(b3, schema), 2, state, state_buckets=4)
    assert sorted(
        r["doc_id"] for r in read_accepted(spark, state).collect()
    ) == [1, 3, 11, 20]

    # catalog loss: the table entry dies with a session restart, the
    # EXTERNAL data dir does not — the next fold re-registers from the
    # location and the accepted set keeps deduping against it
    spark.sql(f"DROP TABLE {tbl}")
    b4 = [(30, "https://e.gov/a?utm_source=x"), (31, "https://f.ly/q")]  # 30 dup of 20
    fold_url_dedup_batch(spark.createDataFrame(b4, schema), 3, state, state_buckets=4)
    assert sorted(
        r["doc_id"] for r in read_accepted(spark, state).collect()
    ) == [1, 3, 11, 20, 31]
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_compact_url_frontier(spark, tmp_path_factory):
    """Frontier compaction: epochs <= upto merge into one partition,
    older partitions drop from catalog AND disk, dedup behaviour and
    the exchange-free bucketed plan survive, and a re-run (crash
    re-entrancy) is a no-op."""
    import os
    import re

    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.urls import (
        _frontier_table,
        canonicalize_url,
        compact_url_frontier,
        fold_url_dedup_batch,
        read_accepted,
    )

    schema = "doc_id long, url string"
    state = str(tmp_path_factory.mktemp("url_state_c")) + "/st"
    os.makedirs(state, exist_ok=True)
    tbl = _frontier_table(state)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    batches = [
        [(1, "http://a.com/1"), (2, "http://a.com/2")],
        [(10, "http://a.com/3")],
        [(20, "http://a.com/4")],
    ]
    for i, rows in enumerate(batches):
        fold_url_dedup_batch(
            spark.createDataFrame(rows, schema), i, state, state_buckets=4
        )
    assert spark.sql(f"SHOW PARTITIONS {tbl}").count() == 3

    for _ in range(2):  # second run = crash re-entrancy no-op
        compact_url_frontier(spark, state, 4, upto_epoch=2)
        parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {tbl}").collect()]
        assert parts == ["epoch=2"], parts
        dirs = sorted(
            d
            for d in os.listdir(f"{state}/urls_bucketed")
            if d.startswith("epoch=")
        )
        assert dirs == ["epoch=2"], dirs
        assert spark.table(tbl).count() == 4

    # dedup against the compacted state still works and stays bucketed
    fold_url_dedup_batch(
        spark.createDataFrame(
            [(30, "http://a.com/1"), (31, "http://a.com/5")], schema
        ),
        3,
        state,
        state_buckets=4,
    )
    assert sorted(r["doc_id"] for r in read_accepted(spark, state).collect()) == [
        1, 2, 10, 20, 31,
    ]
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = spark.createDataFrame(batches[0], schema).withColumn(
            "_curl", canonicalize_url("url", strip_www=True)
        )
        seen = spark.table(tbl).where(F.col("epoch") < 9).select("_curl")
        plan = (
            batch.join(seen, "_curl", "left_anti")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_read_accepted_honours_committed_epoch(spark, tmp_path_factory):
    """read_accepted must NOT surface a crashed fold's uncommitted
    partial accepted/ dir (the committed-epoch reader contract)."""
    import os

    from vectorsearch_spark.operators.urls import (
        fold_url_dedup_batch,
        read_accepted,
    )

    state = str(tmp_path_factory.mktemp("url_state_r")) + "/st"
    os.makedirs(state, exist_ok=True)
    fold_url_dedup_batch(
        spark.createDataFrame([(1, "http://a.com/")], "doc_id long, url string"),
        0,
        state,
    )
    # a partial epoch=1 accepted dir with NO marker commit
    spark.createDataFrame(
        [(9, "https://ghost.io/", "https://ghost.io/")],
        "doc_id long, url string, canonical_url string",
    ).write.mode("overwrite").parquet(f"{state}/accepted/epoch=1")
    assert sorted(r["doc_id"] for r in read_accepted(spark, state).collect()) == [1]


def test_stream_url_dedup_auto_compaction(spark, tmp_path_factory):
    """compact_every with bucketed state: a 4-epoch availableNow run
    (maxFilesPerTrigger=1) compacts at epochs 1 and 3, leaving ONE
    frontier partition; the accepted set still equals the batch
    operator's keeper set."""
    import os

    from vectorsearch_spark.operators.urls import (
        _frontier_table,
        read_accepted,
        stream_url_dedup,
        url_dedup,
    )

    tmp = tmp_path_factory.mktemp("url_stream_c")
    src, state, ckpt = str(tmp / "src"), str(tmp / "state"), str(tmp / "ckpt")
    os.makedirs(src, exist_ok=True)
    rows = [
        (1, "http://a.com/x?b=2&a=1"),
        (2, "HTTP://WWW.A.COM:80/x?a=1&b=2"),
        (3, "https://b.org/"),
        (4, "https://b.org:443/?utm_campaign=x"),
        (5, "https://c.net/z"),
        (6, "http://a.com/p/../x?a=1&b=2"),   # dot-segment dup of 1
        (7, "https://d.io/unique"),
        (8, "https://c.net/z#frag"),
    ]
    schema = "doc_id long, url string"
    tbl = _frontier_table(state)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # one file per 2 rows -> 4 micro-batches with maxFilesPerTrigger=1
    for i in range(4):
        spark.createDataFrame(rows[2 * i : 2 * i + 2], schema).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = stream_url_dedup(
        stream, state, ckpt, compact_every=2, state_buckets=4
    )
    q.awaitTermination(180)
    got = sorted(r["doc_id"] for r in read_accepted(spark, state).collect())
    exp = sorted(
        r["keeper_doc_id"]
        for r in url_dedup(spark.createDataFrame(rows, schema)).collect()
    )
    assert got == exp
    parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {tbl}").collect()]
    assert parts == ["epoch=3"], parts
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_stream_url_dedup_streaming_query(spark, tmp_path_factory):
    """End-to-end availableNow stream: the foreachBatch wiring feeds
    the same fold; accepted set equals the batch-operator result."""
    import os

    from vectorsearch_spark.operators.urls import stream_url_dedup, url_dedup

    tmp = tmp_path_factory.mktemp("url_stream")
    src, state, ckpt = str(tmp / "src"), str(tmp / "state"), str(tmp / "ckpt")
    rows = [
        (1, "http://a.com/x?b=2&a=1"),
        (2, "HTTP://WWW.A.COM:80/x?a=1&b=2"),
        (3, "https://b.org/"),
        (4, "https://b.org:443/?utm_campaign=x"),
        (5, "https://c.net/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, url string").parquet(src)
    q = stream_url_dedup(stream, state, ckpt)
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{state}/accepted").collect()
    )
    exp = sorted(
        r["keeper_doc_id"] for r in url_dedup(df).collect()
    )
    assert got == exp == [1, 3, 5]


def test_domain_suffixes_and_blocklist(spark):
    from vectorsearch_spark.operators.urls import blocklist_filter, domain_suffixes

    df = spark.createDataFrame(
        [
            (1, "a.b.example.com"),
            (2, "example.com"),
            (3, "safe.org"),
            (4, "notexample.com"),   # suffix match is per-LABEL, not substring
            (5, "sub.bad.net"),
            (6, None),               # NULL host: kept
        ],
        "doc_id long, host string",
    )
    sfx = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", domain_suffixes("host").alias("s")).collect()
    }
    assert sfx[1] == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert sfx[2] == ["example.com", "com"]
    assert sfx[6] is None

    bl = spark.createDataFrame([("example.com",), ("bad.net",)], ["domain"])
    kept = sorted(r["doc_id"] for r in blocklist_filter(df, bl).collect())
    assert kept == [3, 4, 6]


def test_blocklist_filter_is_broadcast_no_corpus_shuffle(spark):
    from vectorsearch_spark.operators.urls import blocklist_filter

    df = spark.createDataFrame(
        [(i, f"h{i}.example{i % 5}.org") for i in range(100)],
        "doc_id long, host string",
    )
    bl = spark.createDataFrame([("example0.org",)], ["domain"])
    plan = (
        blocklist_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_canonicalize_fuzz_vs_stdlib_model(spark):
    """600 seeded adversarial URLs (random case, ports, tracking
    params, fragments with '?' inside, empty segments, multi-'?'
    queries, and — r12 — dot segments, percent escapes of unreserved /
    reserved / invalid forms, and '%2e' escapes that decode INTO dot
    segments) — Spark canonicalize_url must equal the independent
    urllib-based model (which implements §6.2.2.3 as the RFC's literal
    two-buffer algorithm, not the engine's stack fold) on every one.
    This is the test that caught the fragment-'?' bug (a '?' after '#'
    is fragment, not query)."""
    import random

    rnd = random.Random(1234)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "www.Example.com", "a.b.C.org", "X.net:80",
             "x.net:443", "x.net:8080", "WWW.E.com:80"]
    paths = ["", "/", "/A/b", "/p%20q", "/a/../b", "//double", "/trail/",
             # r12: dot segments (nested, rooted, trailing, empty-seg
             # interactions) and percent escapes (unreserved, reserved,
             # lowercase hex, invalid, '%2e' decoding into a dot seg)
             "/a/./b", "/a/../../b", "/..", "/.", "/a/b/../c/./d",
             "/a//../b", "/trail/..", "/trail/.", "/..a/../b", "/a/...",
             "/%7Euser/x", "/a%2Fb/../c", "/%2e%2e/a", "/a/%2E./b",
             "/%41%6b/x", "/%zz/%4", "/x%", "/%2E", "/a/.././../b"]
    params = ["a=1", "b=2", "utm_source=x", "utm_medium=y", "fbclid=z",
              "gclid=1", "z=", "=v", "", "k=v=w", "q=a?b", "msclkid=7",
              "mc_eid=8", "igshid=9", "dup=1", "dup=1",
              "q=%7E", "r=%2F%2f", "s=%zz", "t=%41", "u%6b=1"]
    frags = ["", "#f", "#f?notquery=1", "##", "#a#b"]
    urls = []
    for _ in range(600):
        s = rnd.choice(schemes)
        h = rnd.choice(hosts)
        p = rnd.choice(paths)
        n = rnd.randint(0, 5)
        q = "&".join(rnd.choice(params) for _ in range(n))
        u = f"{s}://{h}{p}"
        if rnd.random() < 0.7 and q:
            u += "?" + q
        u += rnd.choice(frags)
        urls.append(u)
    # targeted edge cases
    urls += [
        "http://a.com/p#frag?x=1",      # '?' inside fragment: NOT a query
        "http://a.com/#?",              # same, empty both
        "http://a.com/?",               # empty query -> dropped
        "http://a.com/??a=1",           # query is '?a=1' (first ? wins)
        "http://a.com#f?utm_source=x",  # tracking text inside fragment
        "http://a.com/..",              # root pop at end
        "http://a.com/../",             # root pop, trailing slash
        "http://a.com/a/%2e%2e/b",      # escaped '..' decodes THEN pops
        "http://a.com/a/%2E/b",         # escaped '.' decodes then drops
        "http://a.com/%2f../x",         # '%2F..' is NOT a dot segment
        "http://a.com/x/%2e%2e",        # escaped trailing '..'
    ]
    for strip_www in (False, True):
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], ["i", "url"]
        )
        got = {
            r["i"]: r["c"]
            for r in df.select(
                "i", canonicalize_url("url", strip_www=strip_www).alias("c")
            ).collect()
        }
        for i, u in enumerate(urls):
            assert got[i] == _py_canon(u, strip_www=strip_www), (u, got[i])
