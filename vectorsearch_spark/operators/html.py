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
    link_nws_chars, total_nws_chars) per non-empty block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._parts: list[str] = []
        self._link_nws = 0
        self._total_nws = 0
        self._a_depth = 0
        self._skip_depth = 0

    def _flush(self) -> None:
        raw = "".join(self._parts)
        text = " ".join(raw.split())
        if text:
            self.blocks.append((text, self._link_nws, self._total_nws))
        self._parts = []
        self._link_nws = 0
        self._total_nws = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            self._a_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # self-closing (<br/>): boundary, but no skip/link depth change
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        self._parts.append(data)
        nws = sum(1 for ch in data if not ch.isspace())
        self._total_nws += nws
        if self._a_depth:
            self._link_nws += nws

    def close(self) -> None:
        super().close()
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
