"""Pure-stdlib media codecs: real (non-stub) implementations of two
published container formats for the multimodal operator seam
(operators/multimodal.py ``Decoder``), chosen because they are fully
specified without external libraries:

- BMP: Windows BITMAPINFOHEADER, 24-bit uncompressed (BGR pixel order,
  rows bottom-up unless height is negative, each row zero-padded to a
  4-byte boundary) — the classic uncompressed raster container.
- PPM: Netpbm "P6" binary RGB (ASCII header ``P6 <w> <h> <maxval>``
  with ``#`` comments, then a top-down RGB raster).
- PNG (RFC 2083): 8-bit truecolor (RGB) and truecolor+alpha (RGBA,
  alpha dropped on decode), non-interlaced; chunk CRCs verified, all
  five scanline filters (None/Sub/Up/Average/Paeth) unfiltered on
  decode, and the encoder can emit any fixed filter type (the deflate
  stream is stdlib ``zlib``).
- JPEG (ITU-T T.81 baseline sequential, functions/jpeg.py): JFIF,
  Huffman entropy coding with the Annex K tables, grayscale or YCbCr
  with 4:4:4 / 4:2:0 subsampling — ``decode_media`` dispatches on the
  FFD8 magic.

Both decode to ``(height, width, 3)`` uint8 RGB ndarrays — exactly the
``bytes -> np.ndarray`` signature the multimodal operators take — and
both have encoders so tests and workloads can build byte-exact
containers without any media library. ``decode_media`` sniffs the
magic and dispatches.

No reference analog (the reference's only binary surface is the opaque
payload column, vectorsearch.proto:123-125); this makes the multimodal
tier's decode step a working implementation rather than plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_BMP_HEADER_SIZE = 14
_DIB_HEADER_SIZE = 40
_BMP_PIXEL_OFFSET = _BMP_HEADER_SIZE + _DIB_HEADER_SIZE


def _bmp_row_size(width: int) -> int:
    return (3 * width + 3) // 4 * 4


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up
    rows, BGR, 4-byte row padding)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_bmp expects (h, w, 3), got {img.shape}")
    h, w, _ = img.shape
    row_size = _bmp_row_size(w)
    pad = row_size - 3 * w
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += img[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    size = _BMP_PIXEL_OFFSET + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_PIXEL_OFFSET)
    dib = struct.pack(
        "<IiiHHIIiiII",
        _DIB_HEADER_SIZE, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + dib + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB. Honors the
    pixel-data offset field, negative (top-down) heights, and row
    padding; rejects compressed or non-24bpp files."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file (missing 'BM' magic)")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    dib_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    if dib_size < _DIB_HEADER_SIZE:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp uncompressed supported (bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_size = _bmp_row_size(w)
    raster = np.frombuffer(data, dtype=np.uint8, count=h * row_size, offset=pixel_offset)
    rows = raster.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_ppm expects (h, w, 3), got {img.shape}")
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 RGB. Parses the ASCII
    header tokens with ``#`` comment support per the Netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (missing 'P6' magic)")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then the raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, row_filter: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → non-interlaced 8-bit truecolor PNG.

    ``row_filter`` fixes the per-scanline filter type (0-4) — filters
    1-4 exist so tests can exercise every decoder unfilter path; 0
    (None) is the fast default."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_png expects (h, w, 3), got {img.shape}")
    if row_filter not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {row_filter}")
    h, w, _ = img.shape
    ch = 3
    prev = np.zeros(w * ch, dtype=np.int32)
    lines = bytearray()
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        if row_filter == 0:
            filt = row
        elif row_filter == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int32), row[:-ch]])
            filt = (row - left) % 256
        elif row_filter == 2:  # Up
            filt = (row - prev) % 256
        elif row_filter == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int32), row[:-ch]])
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            filt = np.empty_like(row)
            for x in range(len(row)):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                filt[x] = (int(row[x]) - _paeth(a, b, c)) % 256
        lines.append(row_filter)
        lines += filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Non-interlaced 8-bit truecolor(+alpha) PNG → (h, w, 3) uint8 RGB
    (alpha channel dropped). Verifies chunk CRCs; unfilters all five
    scanline filter types. Row unfiltering is sequential by spec (Sub/
    Average/Paeth depend on the reconstructed left neighbor) — fine for
    the operator seam's thumbnail-scale media; a vectorized production
    path would live behind the same Decoder signature."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = len(_PNG_SIG), None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace})"
        )
    ch = 3 if color == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * stride]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=w * ch, offset=y * stride + 1
        ).astype(np.int32)
        if ftype == 0:
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) % 256
        elif ftype in (1, 3, 4):  # sequential left-dependent filters
            recon = np.empty_like(line)
            for x in range(len(line)):
                a = int(recon[x - ch]) if x >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + int(prev[x])) // 2
                else:
                    b = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    pred = _paeth(a, b, c)
                recon[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad scanline filter {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(h, w, ch)
    return np.ascontiguousarray(img[:, :, :3])


def decode_media(data: bytes) -> np.ndarray:
    """Magic-sniffing dispatch over the shipped codecs — the drop-in
    real ``Decoder`` for operators/multimodal.py."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xFF\xD8":
        from vectorsearch_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError(
        "unrecognized media container (expected BMP, P6 PPM, PNG, or JPEG)"
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio modality's real codec
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 PCM → RIFF/WAVE bytes (fmt chunk
    audio_format=1 PCM, 16-bit little-endian interleaved data chunk)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"encode_wav expects (n,) or (n, ch), got {s.shape}")
    n, ch = s.shape
    data = s.tobytes()  # row-major == interleaved
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → ((n, channels) int16 ndarray, sample_rate).
    Walks RIFF chunks (unknown chunks skipped, word-aligned), accepts
    only PCM 16-bit."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"WAV: only PCM 16-bit supported (fmt={audio_format}, bits={bits})")
    s = np.frombuffer(raw[: len(raw) // (2 * ch) * 2 * ch], dtype="<i2")
    return s.reshape(-1, ch), rate
