"""Sitemap ingestion (sources/sitemap.py) and politeness scheduling
(operators/robots.py politeness_schedule / parse_crawl_delay)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from vectorsearch_spark.operators.robots import (
    parse_crawl_delay,
    politeness_schedule,
)
from vectorsearch_spark.sources.sitemap import parse_sitemap, sitemap_urls

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.com/p/1</loc><lastmod>2024-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>http://a.com/p/2</loc></url>
  <url><priority>0.5</priority></url><!-- no loc: skipped -->
</urlset>"""

INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.com/sm1.xml</loc><lastmod>2024-02-03</lastmod></sitemap>
  <sitemap><loc>http://a.com/sm2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_and_index():
    rows = parse_sitemap(URLSET)
    assert [r["loc"] for r in rows] == ["http://a.com/p/1", "http://a.com/p/2"]
    assert rows[0] == {
        "kind": "url", "loc": "http://a.com/p/1", "lastmod": "2024-01-02",
        "changefreq": "daily", "priority": 0.8,
    }
    assert rows[1]["priority"] is None
    idx = parse_sitemap(INDEX)
    assert [(r["kind"], r["loc"]) for r in idx] == [
        ("sitemap", "http://a.com/sm1.xml"),
        ("sitemap", "http://a.com/sm2.xml.gz"),
    ]
    # gzip transparently; malformed XML and wrong roots yield []
    assert parse_sitemap(gzip.compress(URLSET))[0]["loc"] == "http://a.com/p/1"
    assert parse_sitemap(b"<urlset><url><loc>x</loc>") == []
    assert parse_sitemap(b"<rss></rss>") == []


def test_sitemap_urls_spark_surface(spark):
    df = spark.createDataFrame(
        [(0, URLSET), (1, INDEX), (2, None)], "file_id long, content binary"
    )
    got = sitemap_urls(df).collect()
    assert len(got) == 4
    kinds = {(r["file_id"], r["kind"]) for r in got}
    assert kinds == {(0, "url"), (1, "sitemap")}


def test_parse_crawl_delay_group_selection():
    txt = (
        "User-agent: fast\nCrawl-delay: 0.5\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
    )
    assert parse_crawl_delay(txt, "FAST") == 0.5
    assert parse_crawl_delay(txt, "other") == 10.0
    assert parse_crawl_delay("User-agent: *\nDisallow: /\n", "x") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n", "x") is None


def test_politeness_schedule(spark):
    urls = spark.createDataFrame(
        [
            (1, "http://a.com/z"),
            (2, "http://a.com/a"),
            (3, "http://a.com/m"),
            (4, "http://b.com/only"),
        ],
        "doc_id long, url string",
    )
    delays = spark.createDataFrame(
        [("a.com", 2.5)], "host string, crawl_delay_s double"
    )
    got = {
        r["doc_id"]: (r["fetch_seq"], r["fetch_offset_s"], r["fetch_worker"])
        for r in politeness_schedule(
            urls, default_delay_s=1.0, n_workers=8, delays=delays
        ).collect()
    }
    # a.com ordered by url: /a (2), /m (3), /z (1); delay 2.5 s
    assert got[2][:2] == (0, 0.0)
    assert got[3][:2] == (1, 2.5)
    assert got[1][:2] == (2, 5.0)
    # b.com: no delays row -> default 1.0
    assert got[4][:2] == (0, 0.0)
    # per-host-serial invariant: one worker per host
    assert got[1][2] == got[2][2] == got[3][2]
    assert 0 <= got[4][2] < 8


def test_politeness_single_shuffle_on_host(spark):
    urls = spark.createDataFrame(
        [(i, f"http://h{i % 5}.com/p{i}") for i in range(50)],
        "doc_id long, url string",
    )
    plan = (
        politeness_schedule(urls)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # the window's host partitioning
