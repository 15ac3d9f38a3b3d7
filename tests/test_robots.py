"""robots.txt frontier filtering (operators/robots.py, RFC 9309):
group selection, wildcard/anchor matching, longest-match decisions —
model-level against the spec's own examples, then the Spark plan
against the model."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vectorsearch_spark.operators.robots import (
    _like_pattern,
    _pattern_matches,
    filter_by_robots,
    parse_robots,
    robots_allowed,
    robots_rules,
    url_path_query,
)

ROBOTS = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok$
Disallow: /*.zip$

User-agent: examplebot
User-agent: otherbot
Disallow: /only-for-example/
Allow: /

User-agent: greedy
Disallow: /
"""


def test_group_selection_rfc9309():
    # exact product-token group shadows the * group entirely
    rules = parse_robots(ROBOTS, "ExampleBot")
    assert ("/only-for-example/", False) in rules
    assert ("/", True) in rules
    assert ("/private/", False) not in rules  # * group not merged in
    # shared rule block applies to every listed user-agent
    assert parse_robots(ROBOTS, "otherbot") == rules
    # unknown agent falls back to *
    star = parse_robots(ROBOTS, "somebody")
    assert ("/private/", False) in star and ("/*.zip$", False) in star
    # empty Disallow is no rule at all
    assert parse_robots("User-agent: *\nDisallow:\n", "x") == []


@pytest.mark.parametrize(
    "pattern,path,match",
    [
        ("/", "/anything", True),
        ("/private/", "/private/a", True),
        ("/private/", "/privateer", False),
        ("/*.zip$", "/a/b/c.zip", True),
        ("/*.zip$", "/a.zip?x=1", False),  # $ anchors the very end
        ("/fish*.php", "/fishheads/catfish.php?p=1", True),
        ("/p/3$", "/p/3", True),
        ("/p/3$", "/p/30", False),
        ("/a*b*c", "/a-x-b-y-c-z", True),
        ("/a*b$", "/a-b-b", True),  # trailing seg matches at the END
    ],
)
def test_pattern_matching(pattern, path, match):
    assert _pattern_matches(pattern, path) is match


def test_longest_match_decision():
    rules = parse_robots(ROBOTS, "crawler")
    assert robots_allowed("/public", rules) is True  # no rule → allow
    assert robots_allowed("/private/x", rules) is False
    assert robots_allowed("/private/ok", rules) is True  # longer allow wins
    assert robots_allowed("/data/all.zip", rules) is False
    # tie → allow wins
    tie = [("/dir/", False), ("/dir/", True)]
    assert robots_allowed("/dir/x", tie) is True


def test_like_translation_matches_model():
    """The SQL LIKE translation and the Python matcher agree on every
    (pattern, path) pair the operator can see — the bridge that lets
    the Spark plan stay JVM-side."""
    pats = ["/", "/private/", "/private/ok$", "/*.zip$", "/fish*.php", "/p/3$"]
    paths = [
        "/", "/private/", "/private/ok", "/private/okay", "/x.zip",
        "/x.zip?d=1", "/fish/x.php", "/p/3", "/p/30", "/q?a=1",
    ]
    import duckdb

    con = duckdb.connect()
    for p in pats:
        like, plen = _like_pattern(p)
        assert plen == len(p)
        for path in paths:
            model = _pattern_matches(p, path)
            got = con.sql(
                "SELECT ? LIKE ?", params=[path, like]
            ).fetchone()[0]
            assert got == model, (p, path, like)


def test_filter_by_robots_spark_plan(spark):
    hosts = [
        ("a.com", ROBOTS),
        ("b.com", "User-agent: *\nDisallow: /\nAllow: /pub/\n"),
        # c.com has no robots row at all → everything allowed
    ]
    robots_df = spark.createDataFrame(hosts, "host string, robots_txt string")
    rules = robots_rules(robots_df, agent="crawler")
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/public"),
            (2, "http://a.com/private/x"),
            (3, "http://a.com/private/ok"),
            (4, "https://a.com/data/all.zip"),
            (5, "http://b.com/pub/x"),
            (6, "http://b.com/secret"),
            (7, "http://c.com/anything"),
            (8, "http://b.com"),  # empty path → '/'
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in filter_by_robots(urls, rules, keep="all").collect()
    }
    model = {1: True, 2: False, 3: True, 4: False, 5: True, 6: False,
             7: True, 8: False}
    assert got == model
    kept = sorted(
        r["doc_id"] for r in filter_by_robots(urls, rules).collect()
    )
    assert kept == [d for d, ok in sorted(model.items()) if ok]

    # plan shape: broadcast join, no shuffle of the frontier
    plan = filter_by_robots(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_url_path_query_extraction(spark):
    df = spark.createDataFrame(
        [("http://a.com/p/x?b=2#frag",), ("https://a.com",), ("http://a.com/?q=1",)],
        "url string",
    )
    got = [r[0] for r in df.select(url_path_query("url")).collect()]
    assert got == ["/p/x?b=2", "/", "/?q=1"]
