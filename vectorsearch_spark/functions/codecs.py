"""Pure-stdlib media codecs: real (non-stub) implementations of two
published container formats for the multimodal operator seam
(operators/multimodal.py ``Decoder``), chosen because they are fully
specified without external libraries:

- BMP: Windows BITMAPINFOHEADER, 24-bit uncompressed (BGR pixel order,
  rows bottom-up unless height is negative, each row zero-padded to a
  4-byte boundary) — the classic uncompressed raster container.
- PPM: Netpbm "P6" binary RGB (ASCII header ``P6 <w> <h> <maxval>``
  with ``#`` comments, then a top-down RGB raster).

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


def decode_media(data: bytes) -> np.ndarray:
    """Magic-sniffing dispatch over the shipped codecs — the drop-in
    real ``Decoder`` for operators/multimodal.py."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError("unrecognized media container (expected BMP or P6 PPM)")
