"""WARC/1.x container ingestion (sources/warc.py, r13 VERDICT #5):
framing round-trips, gzip member handling, truncation/charset edges,
and the Spark explode surface."""

from __future__ import annotations

import gzip

import pytest

from vectorsearch_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    split_http_response,
    warc_records,
    write_warc_record,
)


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode() + b"\r\n"
        b"Server: x\r\n\r\n" + body
    )


def _recs():
    return [
        (
            {"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
            b"software: synthtest\r\n",
        ),
        (
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "http://ex.com/a",
                "WARC-Record-ID": "<urn:uuid:1>",
                "Content-Type": "application/http; msgtype=response",
            },
            _http(b"<html><body><p>hello</p></body></html>"),
        ),
        (
            {
                "WARC-Type": "request",
                "WARC-Target-URI": "http://ex.com/a",
                "Content-Type": "application/http; msgtype=request",
            },
            b"GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n",
        ),
    ]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        data = build_warc(_recs(), gzip_per_record=gz)
        got = list(iter_warc_records(data))
        assert [r["warc_type"] for r in got] == ["warcinfo", "response", "request"]
        assert got[1]["target_uri"] == "http://ex.com/a"
        assert got[1]["record_id"] == "<urn:uuid:1>"
        assert got[1]["block"] == _recs()[1][1]
        assert all(not r["truncated"] for r in got)


def test_whole_file_gzip():
    data = gzip.compress(build_warc(_recs()))
    assert [r["warc_type"] for r in iter_warc_records(data)] == [
        "warcinfo", "response", "request",
    ]


def test_truncated_block_flagged_and_terminal():
    data = build_warc(_recs())
    # cut inside the LAST record's block
    cut = data[: len(data) - len(_recs()[2][1]) // 2 - 4]
    got = list(iter_warc_records(cut))
    assert len(got) == 3
    assert [r["truncated"] for r in got] == [False, False, True]
    assert got[2]["block"] == _recs()[2][1][: len(got[2]["block"])]
    # garbage after a record boundary stops the parse cleanly
    assert [r["warc_type"] for r in iter_warc_records(data + b"not-a-warc")] == [
        "warcinfo", "response", "request",
    ]


def test_lf_only_and_folded_headers():
    rec = write_warc_record(
        {"WARC-Type": "response", "WARC-Target-URI": "http://e/x"}, b"BB"
    )
    lf_only = rec.replace(b"\r\n", b"\n")
    got = list(iter_warc_records(lf_only))
    assert got and got[0]["target_uri"] == "http://e/x"
    assert got[0]["block"] == b"BB"
    # folded continuation line joins the previous header's value
    folded = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://e/\r\n"
        b"   very-long-path\r\nContent-Length: 2\r\n\r\nBB\r\n\r\n"
    )
    got = list(iter_warc_records(folded))
    assert got[0]["target_uri"] == "http://e/ very-long-path"


def test_split_http_response_edges():
    status, hdrs, body = split_http_response(_http(b"abc"))
    assert status == 200 and hdrs["content-type"] == "text/html"
    assert body == b"abc"
    # LF-only envelope
    status, _, body = split_http_response(b"HTTP/1.0 404 NF\nX: y\n\nzz")
    assert status == 404 and body == b"zz"
    # no divider: hand the block through
    status, hdrs, body = split_http_response(b"raw bytes no http")
    assert status is None and hdrs == {} and body == b"raw bytes no http"


def test_warc_records_spark_surface(spark):
    files = [
        (0, build_warc(_recs())),
        (1, build_warc(_recs(), gzip_per_record=True)),
        (2, None),
    ]
    df = spark.createDataFrame(files, "file_id long, content binary")
    got = warc_records(df).collect()
    assert len(got) == 6  # 3 per non-null file
    by = {(r["file_id"], r["rec_idx"]): r for r in got}
    r = by[(1, 2)]
    assert r["warc_type"] == "response" and r["http_status"] == 200
    assert r["http_content_type"] == "text/html"
    # payload is the HTTP BODY, envelope stripped
    assert bytes(r["payload"]) == b"<html><body><p>hello</p></body></html>"
    # non-response records keep their raw block, no status
    assert by[(0, 1)]["http_status"] is None
    assert bytes(by[(0, 3)]["payload"]).startswith(b"GET /a HTTP/1.1")


def test_warc_to_html_extract_chain(spark):
    """The intended composition: WARC file bytes → response payloads →
    charset-sniffed block extraction, doc ids recovered from the
    target URI."""
    from pyspark.sql import functions as F

    from vectorsearch_spark.operators.html import html_extract_bytes

    page = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=iso-8859-1"></head>'
        "<body><h1>résumé 7</h1></body></html>"
    ).encode("latin-1")
    recs = [
        ({"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
         b"x: y\r\n"),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://ex.com/doc/7",
          "Content-Type": "application/http; msgtype=response"}, _http(page)),
    ]
    df = spark.createDataFrame(
        [(0, build_warc(recs))], "file_id long, content binary"
    )
    pages = (
        warc_records(df)
        .where((F.col("warc_type") == "response") & ~F.col("truncated"))
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("payload"),
        )
    )
    got = html_extract_bytes(pages).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == 7
    assert got[0]["text"] == "résumé 7"
    assert got[0]["charset"] == "iso8859-1"


def test_chunked_transfer_decoding():
    """RFC 9112 chunked bodies decode (WARC blocks are raw wire
    captures); malformed framing degrades to pass-through of the
    remainder, never an exception."""
    from vectorsearch_spark.sources.warc import decode_chunked

    chunked = b"4\r\nWiki\r\n5\r\npedia\r\nE;ext=1\r\n in\r\n\r\nchunks.\r\n0\r\n\r\n"
    assert decode_chunked(chunked) == b"Wikipedia in\r\n\r\nchunks."
    # LF-only framing
    assert decode_chunked(b"3\nabc\n0\n\n") == b"abc"
    # malformed size line: what decoded + raw remainder
    assert decode_chunked(b"4\r\nWiki\r\nZZ\r\nrest") == b"WikiZZ\r\nrest"
    # via the envelope splitter
    env = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/html\r\n\r\n"
        b"6\r\n<html>\r\n7\r\n</html>\r\n0\r\n\r\n"
    )
    status, hdrs, body = split_http_response(env)
    assert status == 200 and body == b"<html></html>"
