"""HTML text-extraction tests: block segmentation, skip-tag content,
entity decoding, link-density boilerplate gate (inclusive boundary),
malformed input, and the Spark plumbing (schema, NULL html, kept-block
numbering)."""

from __future__ import annotations

import pytest

from vectorsearch_spark.operators.html import extract_blocks, html_extract


def test_block_segmentation_and_boilerplate():
    html = (
        '<html><head><title>t</title><script>var x="<p>no</p>";</script>'
        "<style>.x{color:red}</style></head><body>"
        '<div class="nav"><a href="/">home</a> <a href="/s">about</a></div>'
        "<h1>doc 7 &amp; friends</h1><p>key  agg \n row</p>"
        '<p>see <a href="/n">next</a> for more about en</p>'
        "<!-- comment <p>hidden</p> -->"
        '<div class="footer"><a href="/c">contact</a></div></body></html>'
    )
    got = extract_blocks(html)
    assert [t for t, _ in got] == [
        "doc 7 & friends",           # entity decoded, nav dropped
        "key agg row",               # whitespace normalized
        "see next for more about en",  # mixed block kept
    ]
    assert got[0][1] == 0.0
    # mixed block: 4 link chars of 21 non-ws chars
    assert abs(got[2][1] - 4 / 21) < 1e-12


def test_link_density_boundary_inclusive():
    # exactly 0.5 → dropped (density < threshold keeps)
    assert extract_blocks("<p>half <a>link</a></p>") == []
    # just under → kept, anchor text inlined
    (text, d), = extract_blocks("<p>halfx <a>link</a></p>")
    assert text == "halfx link" and d == 4 / 9
    # custom threshold
    assert extract_blocks("<p>halfx <a>link</a></p>", threshold=0.4) == []


def test_br_nested_and_malformed():
    assert [t for t, _ in extract_blocks("<p>a<br>b<br/>c</p>")] == ["a", "b", "c"]
    assert [t for t, _ in extract_blocks("<div><div>inner</div>tail</div>")] == [
        "inner",
        "tail",
    ]
    # unclosed tags: parser still flushes trailing text on close()
    assert [t for t, _ in extract_blocks("<p>open<div>more")] == ["open", "more"]
    # tagless input is one block
    assert [t for t, _ in extract_blocks("plain text")] == ["plain text"]
    assert extract_blocks("") == []
    # numeric charrefs decode
    assert [t for t, _ in extract_blocks("<p>&#65;&amp;B</p>")] == ["A&B"]
    # unclosed <a> never lets link depth go negative later
    assert [t for t, _ in extract_blocks("<p></a>safe</p>")] == ["safe"]


def test_skip_tags_never_leak():
    html = (
        "<noscript>enable js</noscript><template><p>tpl</p></template>"
        "<p>real</p><script>document.write('<p>fake</p>')</script>"
    )
    assert [t for t, _ in extract_blocks(html)] == ["real"]


def test_html_extract_spark_plumbing(spark):
    rows = [
        (1, "<p>alpha</p><div class='nav'><a>x</a></div><p>beta</p>"),
        (2, None),
        (3, "<p><a>only links</a></p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = html_extract(df).collect()
    # kept-block numbering is per-doc and 1-based among KEPT blocks
    assert [(r["doc_id"], r["block_idx"], r["text"]) for r in got] == [
        (1, 1, "alpha"),
        (1, 2, "beta"),
    ]
    out = html_extract(df.where("doc_id < 0"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "block_idx", "text", "link_density"]
