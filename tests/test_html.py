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


def test_stale_skip_recovery():
    # unclosed <title>: RCDATA recovery — the body is NOT swallowed
    got = extract_blocks(
        "<html><head><title>never closed<body><p>body text</p></body></html>"
    )
    assert [t for t, _ in got] == ["body text"]
    # unclosed <template>: its content stays skipped, </body> clears the
    # stale state so trailing blocks survive
    got = extract_blocks(
        "<body><template><p>tpl</p><p>after</p></body><p>tail</p>"
    )
    assert [t for t, _ in got] == ["tail"]
    # stray close with no open is ignored; matching close pops nested opens
    got = extract_blocks("</script><p>a</p><template><title>x</template><p>b</p>")
    assert [t for t, _ in got] == ["a", "b"]
    # diagnostics: unclosed-at-EOF skip state is counted
    from vectorsearch_spark.operators.html import _BlockExtractor

    p = _BlockExtractor()
    p.feed("<body><style>.x{}<p>gone</p>")
    p.close()
    assert p.n_stale_skips >= 1 and p.blocks == []
    # well-formed docs report zero stale skips
    q = _BlockExtractor()
    q.feed("<title>t</title><p>x</p><script>s</script>")
    q.close()
    assert q.n_stale_skips == 0


def test_sniff_charset_precedence():
    from vectorsearch_spark.operators.html import decode_html_payload, sniff_charset

    assert sniff_charset(b'<meta charset="utf-8">') == "utf-8"
    # http-equiv content form; name normalization via codecs.lookup
    assert (
        sniff_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=ISO-8859-1">'
        )
        == "iso8859-1"
    )
    assert sniff_charset(b"\xef\xbb\xbfx") == "utf-8-sig"
    assert sniff_charset(b"\xff\xfea\x00") == "utf-16-le"
    assert sniff_charset(b"\xfe\xff\x00a") == "utf-16-be"
    # BOM beats a (stale) meta declaration
    assert sniff_charset(b'\xef\xbb\xbf<meta charset="latin-1">') == "utf-8-sig"
    # declared utf-16 is treated as utf-8 (WHATWG: the label is stale)
    assert sniff_charset(b'<meta charset="utf-16le">') == "utf-8"
    # unknown label / no meta fall back to the default
    assert sniff_charset(b'<meta charset="bogus">') == "utf-8"
    assert sniff_charset(b"no meta") == "utf-8"
    # meta outside the 1024-byte prescan window is NOT honored
    far = b"<html>" + b" " * 1100 + b'<meta charset="iso-8859-1">'
    assert sniff_charset(far) == "utf-8"
    # custom default is normalized too
    assert sniff_charset(b"x", default="LATIN-1") == "iso8859-1"

    # mojibake avoidance: the same latin-1 bytes decode correctly WITH
    # the declaration and degrade to replacement chars WITHOUT it
    page = (
        '<html><head><meta charset="iso-8859-1"></head>'
        "<body><p>résumé</p></body></html>"
    ).encode("latin-1")
    text, enc = decode_html_payload(page)
    assert enc == "iso8859-1" and "résumé" in text
    text2, enc2 = decode_html_payload(
        page.replace(b'<meta charset="iso-8859-1">', b"")
    )
    assert enc2 == "utf-8" and "�" in text2
    # utf-8-sig decode STRIPS the BOM (no U+FEFF in block text)
    text3, _ = decode_html_payload(b"\xef\xbb\xbf<p>hi</p>")
    assert extract_blocks(text3) == [("hi", 0.0)]


def test_html_extract_bytes_spark(spark):
    from vectorsearch_spark.operators.html import html_extract_bytes

    rows = [
        (1, '<meta charset="utf-8"><p>café one</p>'.encode("utf-8")),
        (
            2,
            '<meta http-equiv="Content-Type" content="text/html; '
            'charset=iso-8859-1"><p>café two</p>'.encode("latin-1"),
        ),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["block_idx"], r["text"], r["charset"])
        for r in html_extract_bytes(df).collect()
    }
    assert got == {
        1: (1, "café one", "utf-8"),
        2: (1, "café two", "iso8859-1"),
    }
    out = html_extract_bytes(df.where("doc_id < 0"))
    assert out.columns == ["doc_id", "block_idx", "text", "link_density", "charset"]
    assert out.count() == 0
