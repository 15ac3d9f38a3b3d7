"""WARC/1.x container ingestion (r13 VERDICT #5): the record framing a
web-scale text pipeline actually starts from — CommonCrawl ships
``.warc.gz`` files of warcinfo/request/response records, and everything
downstream (html_extract_bytes → quality → dedup) consumes the HTTP
response payloads inside them.

Pure-stdlib parser for the ISO 28500 framing (version line, named
headers, Content-Length-delimited block, double-CRLF separator),
liberal in what it accepts (LF-only line endings, folded header
continuations), strict in what it reports: a record whose block is cut
short by EOF — the normal end state of a partial fetch or a truncated
object-store range read — is YIELDED with ``truncated=True`` rather
than raised or silently dropped, so the pipeline decides (the registry
entry filters them; a recrawl queue would route them).

Gzip: CommonCrawl compresses each record as its own gzip MEMBER so
readers can split files on member boundaries; ``_gunzip_members``
decompresses any number of concatenated members (zlib loop), so both
whole-file gzip and per-record gzip land in the same byte-stream
parse.

Spark surface: ``warc_records`` explodes WARC file bytes into one row
per record in a single Arrow ``mapInPandas`` pass — container bytes
never shuffle, record payloads emerge as a binary column that chains
straight into ``html_extract_bytes`` (operators/html.py), and the scan
parallelism is per-FILE, the natural 100 TB unit (CommonCrawl segments
are ~1 GB; a listing of them partitions perfectly).
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# Writer (synthesis for tests/oracles; also the roundtrip witness)
# ---------------------------------------------------------------------------

def write_warc_record(headers: "dict[str, str]", block: bytes) -> bytes:
    """Serialize one WARC record: version line, headers (Content-Length
    computed from the block), blank line, block, record separator."""
    out = [b"WARC/1.0"]
    for k, v in headers.items():
        if k.lower() == "content-length":
            continue
        out.append(f"{k}: {v}".encode("utf-8"))
    out.append(f"Content-Length: {len(block)}".encode("ascii"))
    return _CRLF.join(out) + _CRLF * 2 + block + _CRLF * 2


def build_warc(
    records: "list[tuple[dict[str, str], bytes]]",
    gzip_per_record: bool = False,
) -> bytes:
    """A whole WARC file from (headers, block) pairs; with
    ``gzip_per_record`` each record becomes its own gzip member (the
    CommonCrawl layout)."""
    import gzip as _gz

    parts = [write_warc_record(h, b) for h, b in records]
    if gzip_per_record:
        return b"".join(_gz.compress(p) for p in parts)
    return b"".join(parts)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes) -> bytes:
    """Decompress any number of CONCATENATED gzip members (zlib with
    the gzip wrapper, looped on unused_data) — handles whole-file gzip
    and CommonCrawl's member-per-record layout alike."""
    out = []
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:  # member itself truncated: keep what decoded
            break
        data = d.unused_data
    return b"".join(out)


def _readline(data: bytes, pos: int) -> "tuple[bytes, int]":
    """One header/version line, tolerating LF-only endings; returns
    (line_without_terminator, next_pos)."""
    nl = data.find(b"\n", pos)
    if nl < 0:
        return data[pos:], len(data)
    line = data[pos:nl]
    if line.endswith(b"\r"):
        line = line[:-1]
    return line, nl + 1


def iter_warc_records(data: bytes) -> "Iterator[dict]":
    """Yield dicts per record: ``headers`` (original-cased keys in a
    case-insensitive lookup via lowercase duplicate map), ``warc_type``,
    ``target_uri``, ``record_id``, ``content_type``, ``block`` (bytes),
    ``offset``, ``truncated``. Parsing stops at the first unframeable
    byte run (garbage after the last separator); a block cut short by
    EOF yields its record with ``truncated=True``."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        offset = pos
        line, pos = _readline(data, pos)
        if not line.startswith(b"WARC/"):
            return  # unframeable: not a record boundary
        headers: "dict[str, str]" = {}
        last_key = None
        while pos < n:
            line, pos = _readline(data, pos)
            if line == b"":
                break
            if line[:1] in (b" ", b"\t") and last_key is not None:
                # folded continuation (RFC 822 style, allowed by ISO 28500)
                headers[last_key] += " " + line.strip().decode(
                    "utf-8", "replace"
                )
                continue
            if b":" not in line:
                continue  # tolerate junk header lines
            k, v = line.split(b":", 1)
            last_key = k.strip().decode("utf-8", "replace")
            headers[last_key] = v.strip().decode("utf-8", "replace")
        low = {k.lower(): v for k, v in headers.items()}
        try:
            length = int(low.get("content-length", "0"))
        except ValueError:
            length = 0
        block = data[pos : pos + length]
        truncated = len(block) < length
        pos += length
        yield {
            "offset": offset,
            "headers": headers,
            "warc_type": low.get("warc-type", ""),
            "target_uri": low.get("warc-target-uri", ""),
            "record_id": low.get("warc-record-id", ""),
            "content_type": low.get("content-type", ""),
            "block": block,
            "truncated": truncated,
        }
        if truncated:
            return


def decode_chunked(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked transfer decoding: ``size-hex CRLF data
    CRLF`` repeated, terminated by a zero-size chunk (trailers
    ignored). Crawlers DO archive chunked responses verbatim (the WARC
    block is the raw wire capture), and an undecoded body leaves
    ``3e8\\r\\n`` runs embedded in the HTML that poison every
    downstream text signal. Liberal on framing (LF-only tolerated);
    any malformed chunk header stops decoding and returns what decoded
    plus the undecodable remainder — never an exception, the
    decode-with-replacement stance of the charset front-end."""
    out, pos, n = [], 0, len(body)
    while pos < n:
        nl = body.find(b"\n", pos)
        if nl < 0:
            out.append(body[pos:])
            break
        line = body[pos:nl].strip()
        # chunk extensions (";...") are legal and ignored
        size_tok = line.split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            out.append(body[pos:])
            break
        pos = nl + 1
        if size == 0:
            break  # terminal chunk; trailers (if any) are ignored
        out.append(body[pos : pos + size])
        pos += size
        # consume the CRLF (or LF) after the chunk data
        if body[pos : pos + 2] == b"\r\n":
            pos += 2
        elif body[pos : pos + 1] == b"\n":
            pos += 1
    return b"".join(out)


def split_http_response(block: bytes) -> "tuple[int | None, dict, bytes]":
    """(status, lowercased headers, body) from an HTTP response block
    (the payload of a WARC response record whose Content-Type is
    ``application/http``). No divider → (None, {}, whole block): the
    block was not HTTP after all, hand it through untouched. A
    ``Transfer-Encoding: chunked`` body is decoded (``decode_chunked``)
    — WARC blocks are raw wire captures, so chunk framing would
    otherwise leak into the extracted text."""
    div = block.find(b"\r\n\r\n")
    sep = 4
    if div < 0:
        div = block.find(b"\n\n")
        sep = 2
    if div < 0:
        return None, {}, block
    head, body = block[:div], block[div + sep :]
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    hdrs: "dict[str, str]" = {}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            hdrs[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
                "latin-1", "replace"
            )
    if "chunked" in hdrs.get("transfer-encoding", "").lower():
        body = decode_chunked(body)
    return status, hdrs, body


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

WARC_RECORDS_SCHEMA = (
    "file_id long, rec_idx int, warc_type string, target_uri string, "
    "record_id string, content_type string, http_status int, "
    "http_content_type string, payload binary, truncated boolean"
)


def warc_records(
    df: DataFrame,
    payload_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """Explode WARC FILE bytes into one row per record (schema
    ``WARC_RECORDS_SCHEMA``) in one Arrow pass. For ``response``
    records whose WARC Content-Type is ``application/http*``, the HTTP
    envelope is split off here — ``payload`` is the response BODY and
    ``http_status``/``http_content_type`` surface the envelope — so
    downstream extraction (html_extract_bytes) chains directly; other
    record types carry their raw block. Column pruning keeps only
    (id, bytes) into the pass; parallelism is per input file."""
    import pandas as pd

    def mapper(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows: "dict[str, list]" = {
                k: []
                for k in (
                    "file_id", "rec_idx", "warc_type", "target_uri",
                    "record_id", "content_type", "http_status",
                    "http_content_type", "payload", "truncated",
                )
            }
            for fid, raw in zip(pdf[id_col], pdf[payload_col]):
                if raw is None:
                    continue
                for i, rec in enumerate(iter_warc_records(bytes(raw)), 1):
                    status, hh, body = None, {}, rec["block"]
                    if rec["warc_type"] == "response" and rec[
                        "content_type"
                    ].lower().startswith("application/http"):
                        status, hh, body = split_http_response(rec["block"])
                    rows["file_id"].append(int(fid))
                    rows["rec_idx"].append(i)
                    rows["warc_type"].append(rec["warc_type"])
                    rows["target_uri"].append(rec["target_uri"])
                    rows["record_id"].append(rec["record_id"])
                    rows["content_type"].append(rec["content_type"])
                    rows["http_status"].append(status)
                    rows["http_content_type"].append(hh.get("content-type"))
                    rows["payload"].append(body)
                    rows["truncated"].append(rec["truncated"])
            yield pd.DataFrame(
                {
                    "file_id": pd.Series(rows["file_id"], dtype="int64"),
                    "rec_idx": pd.Series(rows["rec_idx"], dtype="int32"),
                    "warc_type": pd.Series(rows["warc_type"], dtype="object"),
                    "target_uri": pd.Series(rows["target_uri"], dtype="object"),
                    "record_id": pd.Series(rows["record_id"], dtype="object"),
                    "content_type": pd.Series(rows["content_type"], dtype="object"),
                    "http_status": pd.Series(rows["http_status"], dtype="Int32"),
                    "http_content_type": pd.Series(
                        rows["http_content_type"], dtype="object"
                    ),
                    "payload": pd.Series(rows["payload"], dtype="object"),
                    "truncated": pd.Series(rows["truncated"], dtype="bool"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        mapper, schema=WARC_RECORDS_SCHEMA
    )
