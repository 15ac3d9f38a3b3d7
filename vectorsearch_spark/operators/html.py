"""WET-style HTML text extraction — the standard pre-dedup pass of a
web-corpus pipeline (what CommonCrawl's WET files are to WARC): strip
markup/scripts/styles/comments, segment into render blocks, and drop
boilerplate blocks by link density (navigation bars and footers are
mostly anchor text; body prose is not — the classic content-extraction
heuristic of Kohlschütter et al., WSDM 2010 "Boilerplate Detection
Using Shallow Text Features" §4, reduced to its shallowest feature).

New scope beyond the reference (a vector index has no text-extraction
surface); this feeds the repo's existing dedup/quality/tokenizer tier
the way WET extraction feeds a real pretraining pipeline.

Implementation stance: pure-stdlib ``html.parser`` inside ONE Arrow
``mapInPandas`` pass (the functions/codecs.py seam pattern — parsing is
inherently imperative; everything around it stays narrow and
columnar). No per-row Python UDF, no join, no shuffle: documents in,
(doc, block) rows out, partition-parallel at any corpus size.

Determinism contract (what the SQL oracle mirrors):

- blocks are delimited by block-level tags (p/div/h1-6/li/br/...);
- script/style/template/title content never appears;
- character/entity references are decoded (``convert_charrefs``);
- block text is whitespace-normalized (``' '.join(text.split())``);
- link density = non-whitespace chars inside <a> / all non-whitespace
  chars, computed BEFORE normalization (normalization only removes
  whitespace, so the counts agree);
- a block is kept iff it has text and density < ``threshold``;
- ``block_idx`` numbers KEPT blocks per document, 1-based, in order.
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame

# tags that terminate the current text block when they open or close
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td
    th section article aside header footer nav main blockquote pre form
    figure figcaption address hr body html head br""".split()
)
# tags whose CONTENT is never text
_SKIP_TAGS = frozenset("script style template title noscript".split())


class _BlockExtractor(HTMLParser):
    """One pass over one document: collects (normalized_text,
    link_nws_chars, total_nws_chars) per non-empty block.

    Skip state is a per-tag STACK, not a bare counter: real-web input
    is frequently malformed, and a depth counter that never unwinds
    (unclosed ``<title>``/``<noscript>``/``<template>``) silently
    dropped every block after the bad tag. Recovery rules (counted in
    ``n_stale_skips`` so callers can audit):

    - ``title`` is RCDATA — no element can legally open inside it, so
      any start tag auto-closes a dangling title;
    - nothing skippable can span ``</body>``/``</html>`` — those end
      tags clear the stack;
    - a skip end tag pops up to its nearest matching open (implied end
      tags for anything opened inside), and a stray close is ignored;
    - EOF clears whatever is left (``script``/``style`` are CDATA in
      html.parser, so an unclosed one consumes to EOF regardless —
      the browser behavior).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self.n_stale_skips = 0
        self._parts: list[str] = []
        self._link_nws = 0
        self._total_nws = 0
        self._a_depth = 0
        self._skip_stack: list[str] = []

    def _flush(self) -> None:
        raw = "".join(self._parts)
        text = " ".join(raw.split())
        if text:
            self.blocks.append((text, self._link_nws, self._total_nws))
        self._parts = []
        self._link_nws = 0
        self._total_nws = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._skip_stack and self._skip_stack[-1] == "title":
            self._skip_stack.pop()
            self.n_stale_skips += 1
        if tag in _SKIP_TAGS:
            self._skip_stack.append(tag)
        elif tag == "a":
            self._a_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            for i in range(len(self._skip_stack) - 1, -1, -1):
                if self._skip_stack[i] == tag:
                    self.n_stale_skips += len(self._skip_stack) - i - 1
                    del self._skip_stack[i:]
                    break
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in ("body", "html") and self._skip_stack:
            self.n_stale_skips += len(self._skip_stack)
            self._skip_stack.clear()
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # self-closing (<br/>): boundary, but no skip/link depth change
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_stack or not data:
            return
        self._parts.append(data)
        nws = sum(1 for ch in data if not ch.isspace())
        self._total_nws += nws
        if self._a_depth:
            self._link_nws += nws

    def close(self) -> None:
        super().close()
        if self._skip_stack:
            self.n_stale_skips += len(self._skip_stack)
            self._skip_stack.clear()
        self._flush()


def extract_blocks(html: str, threshold: float = 0.5) -> list[tuple[str, float]]:
    """Pure-Python core: (normalized_text, link_density) per KEPT
    block, in document order. Separated from the Spark plumbing so the
    model tests pin it directly."""
    p = _BlockExtractor()
    p.feed(html)
    p.close()
    out = []
    for text, link_nws, total_nws in p.blocks:
        if total_nws == 0:
            continue
        density = link_nws / total_nws
        if density < threshold:
            out.append((text, density))
    return out


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Extract boilerplate-free text blocks from an HTML column.

    Returns (id_col, block_idx int — 1-based among kept blocks,
    text string, link_density double). Scale shape: one narrow
    ``mapInPandas`` pass — no shuffle, no collect; output rows are the
    kept blocks only. NULL html yields no rows (the codec convention).
    """
    import pandas as pd

    thr = float(threshold)

    def mapper(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, texts, dens = [], [], [], []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                if html is None:
                    continue
                for i, (text, density) in enumerate(extract_blocks(html, thr), 1):
                    ids.append(doc_id)
                    idxs.append(i)
                    texts.append(text)
                    dens.append(density)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "block_idx": pd.Series(idxs, dtype="int32"),
                    "text": pd.Series(texts, dtype="object"),
                    "link_density": pd.Series(dens, dtype="float64"),
                }
            )

    pruned = df.select(id_col, html_col)
    return pruned.mapInPandas(
        mapper,
        schema=f"{id_col} long, block_idx int, text string, link_density double",
    )


# ---------------------------------------------------------------------------
# Charset front-end: real WARC payloads are BYTES, and non-UTF-8 pages
# decoded as UTF-8 silently mojibake every downstream dedup/quality
# signal. This is the WHATWG "encoding sniffing" prescan reduced to its
# deterministic core: BOM first, then a <meta ... charset=...> scan of
# the first 1024 bytes, then a UTF-8-with-replacement fallback.
# ---------------------------------------------------------------------------

# matches both <meta charset="X"> and
# <meta http-equiv="content-type" content="text/html; charset=X">
# (the WHATWG prescan likewise keys on the charset= token)
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""",
    re.IGNORECASE,
)
_SNIFF_BYTES = 1024  # the WHATWG prescan window


def sniff_charset(payload: bytes, default: str = "utf-8") -> str:
    """Return the normalized codec name for an HTML byte payload.

    Precedence (WHATWG encoding sniffing, html.spec.whatwg.org
    §13.2.3.2, reduced to the offline-deterministic steps):

    1. byte-order mark: UTF-8 BOM → ``utf-8-sig`` (decodes AND strips
       the BOM), UTF-16 LE/BE BOMs → the matching UTF-16 codec;
    2. a ``charset=`` token inside a ``<meta>`` tag within the first
       1024 bytes (attribute or http-equiv content form). A declared
       UTF-16 is treated as UTF-8 per the spec (the page was
       transcoded; the label is stale);
    3. ``default`` (UTF-8) otherwise — also for labels the codec
       registry doesn't know.

    Names are normalized through ``codecs.lookup(...).name`` so equal
    encodings compare equal ('latin-1', 'ISO-8859-1' → 'iso8859-1').
    """
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if payload.startswith(b"\xff\xfe"):
        return "utf-16-le"
    if payload.startswith(b"\xfe\xff"):
        return "utf-16-be"
    m = _META_CHARSET_RE.search(payload[:_SNIFF_BYTES])
    if m:
        label = m.group(1).decode("ascii", "replace")
        try:
            name = codecs.lookup(label).name
        except LookupError:
            name = None
        if name is not None:
            if name.startswith("utf-16"):
                return codecs.lookup(default).name
            return name
    return codecs.lookup(default).name


def decode_html_payload(
    payload: bytes, default: str = "utf-8"
) -> tuple[str, str]:
    """(decoded_text, charset) for one HTML byte payload — sniff, then
    decode with ``errors='replace'`` (a wrong-but-declared charset
    degrades to replacement chars, never an exception)."""
    enc = sniff_charset(payload, default)
    return bytes(payload).decode(enc, errors="replace"), enc


def html_extract_bytes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    default_charset: str = "utf-8",
) -> DataFrame:
    """``html_extract`` over RAW BYTE payloads (the WARC shape):
    charset-sniff + decode + block extraction fused into the SAME
    single Arrow ``mapInPandas`` pass — bytes never shuffle, and the
    operator's headline use (CommonCrawl-style extraction) no longer
    needs user-side decoding that silently mangles non-UTF-8 pages.

    Returns (id_col, block_idx, text, link_density, charset) — the
    extra ``charset`` column records what the sniff chose per page.
    NULL payloads yield no rows (the codec convention).
    """
    import pandas as pd

    thr = float(threshold)
    dflt = str(default_charset)

    def mapper(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, texts, dens, encs = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                html, enc = decode_html_payload(bytes(payload), dflt)
                for i, (text, density) in enumerate(
                    extract_blocks(html, thr), 1
                ):
                    ids.append(doc_id)
                    idxs.append(i)
                    texts.append(text)
                    dens.append(density)
                    encs.append(enc)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "block_idx": pd.Series(idxs, dtype="int32"),
                    "text": pd.Series(texts, dtype="object"),
                    "link_density": pd.Series(dens, dtype="float64"),
                    "charset": pd.Series(encs, dtype="object"),
                }
            )

    pruned = df.select(id_col, payload_col)
    return pruned.mapInPandas(
        mapper,
        schema=(
            f"{id_col} long, block_idx int, text string, "
            "link_density double, charset string"
        ),
    )
