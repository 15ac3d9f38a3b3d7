"""Sitemap ingestion (sitemaps.org XML protocol, the public spec):
the frontier-DISCOVERY side of the crawl pipeline — robots.txt points
at sitemaps, sitemaps enumerate URLs with change metadata, and the
frontier operators (canonicalize → robots filter → dedup fold →
politeness schedule) consume what they list.

Pure-stdlib parsing (xml.etree over defused-enough input: external
entities are never resolved by ElementTree's default parser, and
sitemap bodies are crawl payloads, not trusted config). Both document
shapes are handled in one pass:

* ``<urlset>``   → one row per ``<url>``: loc, lastmod, changefreq,
  priority (kind='url');
* ``<sitemapindex>`` → one row per ``<sitemap>``: loc, lastmod
  (kind='sitemap') — the caller fetches those and feeds the bytes
  back through, which is the correct DISTRIBUTED shape for the
  50k-URL/50 MB-per-file limits the protocol imposes: a sitemap tree
  is a small frontier of files, each parsed independently.

Gzip sitemaps (``sitemap.xml.gz``) decompress transparently. Malformed
XML yields zero rows for that file rather than failing the batch (the
decode-with-replacement stance — one broken host must not kill a
100 TB discovery pass).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

SITEMAP_URLS_SCHEMA = (
    "file_id long, kind string, loc string, lastmod string, "
    "changefreq string, priority double"
)


def _local(tag: str) -> str:
    """Element name without its XML namespace (sitemaps always declare
    the sitemaps.org namespace; some omit it — accept both)."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(data: bytes) -> "list[dict]":
    """Rows of {kind, loc, lastmod, changefreq, priority} from one
    sitemap document (urlset or sitemapindex, optionally gzipped).
    Entries without a <loc> are skipped per spec; malformed XML → []."""
    import gzip
    import xml.etree.ElementTree as ET

    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return []
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return []
    root_kind = _local(root.tag)
    if root_kind == "urlset":
        child_tag, kind = "url", "url"
    elif root_kind == "sitemapindex":
        child_tag, kind = "sitemap", "sitemap"
    else:
        return []
    out = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        fields = {_local(c.tag): (c.text or "").strip() for c in el}
        loc = fields.get("loc", "")
        if not loc:
            continue
        prio = None
        if fields.get("priority"):
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        out.append(
            {
                "kind": kind,
                "loc": loc,
                "lastmod": fields.get("lastmod") or None,
                "changefreq": fields.get("changefreq") or None,
                "priority": prio,
            }
        )
    return out


def sitemap_urls(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """Explode sitemap file bytes into one row per entry
    (``SITEMAP_URLS_SCHEMA``) in one Arrow pass — same per-file
    parallelism contract as ``warc.warc_records``."""
    import pandas as pd

    def mapper(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            fids, kinds, locs, mods, freqs, prios = [], [], [], [], [], []
            for fid, raw in zip(pdf[id_col], pdf[payload_col]):
                if raw is None:
                    continue
                for row in parse_sitemap(bytes(raw)):
                    fids.append(int(fid))
                    kinds.append(row["kind"])
                    locs.append(row["loc"])
                    mods.append(row["lastmod"])
                    freqs.append(row["changefreq"])
                    prios.append(row["priority"])
            yield pd.DataFrame(
                {
                    "file_id": pd.Series(fids, dtype="int64"),
                    "kind": pd.Series(kinds, dtype="object"),
                    "loc": pd.Series(locs, dtype="object"),
                    "lastmod": pd.Series(mods, dtype="object"),
                    "changefreq": pd.Series(freqs, dtype="object"),
                    "priority": pd.Series(prios, dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        mapper, schema=SITEMAP_URLS_SCHEMA
    )
