"""Multimodal-column operators for training-data pipelines: treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and run decode / feature-extraction / resize / frame-sample
as Arrow-batched ``mapInPandas`` stages (north-star extensions per
BASELINE.json; the reference's only binary surface is the opaque
``payload`` column, vectorsearch.proto:123-125).

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. For the codec step, REAL pure-stdlib
codecs ship in ``functions/codecs.py`` (24-bit BMP, binary PPM, PNG
with all five scanline filters) and ``functions/jpeg.py`` (baseline
sequential JPEG incl. 4:2:0, plus M-JPEG streams — ``decode_mjpeg``
plugs straight into ``sample_frames`` for a real video frame-sampling
path, exercised end-to-end by the ``mm_mjpeg_frames`` workload query);
``codecs.decode_media`` sniffs the magic. Formats those codecs don't
cover (audio, modern video containers) still need an external library:

- ``decoder=None`` (default) raises ``NotImplementedError`` naming the
  shipped codecs and the Pillow/ffmpeg plug-in point;
- tests exercise both the real codecs and a deterministic fake.

Scale design: every operator is a narrow ``mapInPandas`` pass — binary
blobs never shuffle; only the (small) extracted features do. Arrow
moves each batch across the Python boundary once; ``batch_rows`` bounds
executor memory for large blobs via
``spark.sql.execution.arrow.maxRecordsPerBatch``-style chunking done
inside the mapper.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (id, payload, media metadata) — the canonical multimodal row shape.
MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, width int, height int, "
    "n_frames int, sample_rate int"
)

FEATURE_SCHEMA = "media_id long, n_bytes long, feature array<float>"
RESIZE_SCHEMA = "media_id long, out_width int, out_height int, payload binary"
FRAME_SCHEMA = "media_id long, frame_idx int, payload binary"

Decoder = Callable[[bytes], np.ndarray]


def _require_decoder(decoder: Decoder | None, op: str) -> Decoder:
    if decoder is None:
        raise NotImplementedError(
            f"{op}: no decoder given. For BMP/PPM payloads pass the shipped "
            "pure-stdlib codec (functions/codecs.py decode_media); for other "
            "formats pass decoder=<callable bytes -> np.ndarray>, e.g. a "
            "Pillow/torchvision/ffmpeg-backed function."
        )
    return decoder


def attach_media_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type: str = "image",
) -> DataFrame:
    """Normalize an (id, binary) table to the canonical MEDIA_SCHEMA,
    deriving deterministic placeholder metadata from payload length
    (real readers would parse container headers here)."""
    n = F.length(F.col(payload_col)).cast("long")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.lit(media_type).alias("media_type"),
        (F.lit(64) + n % 64).cast("int").alias("width"),
        (F.lit(64) + (n / 64).cast("long") % 64).cast("int").alias("height"),
        (F.lit(1) + n % 30).cast("int").alias("n_frames"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )


def extract_features(
    media: DataFrame,
    decoder: Decoder | None = None,
    feature_dim: int = 8,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode each payload and emit a fixed-dim float feature vector
    (mean-pooled over the decoded array, chunked to ``feature_dim``).

    One narrow Arrow pass; output is (media_id, n_bytes, feature) — the
    blobs are dropped before anything shuffles.
    """
    dec = _require_decoder(decoder, "extract_features")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats, ids, sizes = [], [], []
                for mid, payload in zip(chunk["media_id"], chunk["payload"]):
                    arr = np.asarray(dec(bytes(payload)), dtype=np.float64).ravel()
                    pad = (-len(arr)) % feature_dim
                    if pad:
                        arr = np.pad(arr, (0, pad))
                    feats.append(arr.reshape(feature_dim, -1).mean(axis=1).astype(np.float32))
                    ids.append(mid)
                    sizes.append(len(payload))
                yield pd.DataFrame(
                    {"media_id": ids, "n_bytes": sizes, "feature": feats}
                )

    return media.select("media_id", "payload").mapInPandas(mapper, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    out_width: int,
    out_height: int,
    decoder: Decoder | None = None,
    encoder: Callable[[np.ndarray], bytes] | None = None,
) -> DataFrame:
    """Decode → nearest-neighbor resample to (out_width, out_height) →
    re-encode. Decoder/encoder are pluggable codec callables; the
    resample itself is real NumPy."""
    dec = _require_decoder(decoder, "resize_images")
    enc = encoder if encoder is not None else (lambda a: a.astype(np.uint8).tobytes())

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = np.atleast_2d(np.asarray(dec(bytes(payload))))
                ys = (np.arange(out_height) * img.shape[0] // out_height).clip(0, img.shape[0] - 1)
                xs = (np.arange(out_width) * img.shape[1] // out_width).clip(0, img.shape[1] - 1)
                out.append((mid, out_width, out_height, enc(img[np.ix_(ys, xs)])))
            yield pd.DataFrame(out, columns=["media_id", "out_width", "out_height", "payload"])

    return media.select("media_id", "payload").mapInPandas(mapper, RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_nth: int = 10,
    max_frames: int = 8,
    decoder: Decoder | None = None,
) -> DataFrame:
    """Video frame sampling: decode a (frames, ...) array, keep every
    ``every_nth`` frame up to ``max_frames``, one output row per frame.
    The fan-out is bounded (≤ max_frames per row) so the stage stays
    predictable at scale."""
    dec = _require_decoder(decoder, "sample_frames")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = np.asarray(dec(bytes(payload)))
                if frames.ndim < 2:
                    frames = frames[None, :]
                keep = list(range(0, frames.shape[0], every_nth))[:max_frames]
                for idx in keep:
                    rows.append((mid, idx, frames[idx].astype(np.uint8).tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "payload"])

    return media.select("media_id", "payload").mapInPandas(mapper, FRAME_SCHEMA)


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in codec for tests and the driver workload:
    interprets the byte string as a uint8 array reshaped to 2D."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if len(arr) == 0:
        return np.zeros((1, 1))
    w = int(np.sqrt(len(arr))) or 1
    return arr[: (len(arr) // w) * w].reshape(-1, w)


def extract_audio_features(
    media: DataFrame,
    decoder: "Callable[[bytes], tuple[np.ndarray, int]] | None" = None,
) -> DataFrame:
    """Audio feature extraction over WAV payloads: per clip — duration,
    RMS level, zero-crossing rate, and spectral centroid (magnitude-
    weighted mean frequency of the real FFT of channel 0) — the
    standard cheap audio-quality/content signals before an expensive
    model pass. Narrow Arrow pass, blobs never shuffle; features are
    deterministic floats (NumPy rfft), gated by an exact NumPy-model
    test rather than a SQL oracle (no tractable SQL form for the DFT).
    ``decoder`` returns (samples int16 (n, ch), sample_rate); default
    is the shipped RIFF/PCM codec."""
    if decoder is None:
        from vectorsearch_spark.functions.codecs import decode_wav as decoder

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = decoder(bytes(payload))
                c0 = s[:, 0].astype(np.float64)
                n = len(c0)
                dur = n / rate if rate else 0.0
                rms = float(np.sqrt((c0 ** 2).mean())) if n else 0.0
                zcr = float(((c0[:-1] * c0[1:]) < 0).mean()) if n > 1 else 0.0
                if n > 1:
                    mag = np.abs(np.fft.rfft(c0))
                    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                    tot = mag.sum()
                    centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                else:
                    centroid = 0.0
                rows.append((int(mid), n, round(dur, 6), round(rms, 4),
                             round(zcr, 6), round(centroid, 4)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "duration_s", "rms",
                         "zcr", "spectral_centroid"],
            )

    return media.select("media_id", "payload").mapInPandas(
        mapper,
        "media_id long, n_samples long, duration_s double, rms double, "
        "zcr double, spectral_centroid double",
    )


def audio_spectral_bins(
    media: DataFrame,
    n_fft: int = 8,
    decoder: "Callable[[bytes], tuple[np.ndarray, int]] | None" = None,
) -> DataFrame:
    """Degenerate-EXACT witness of the audio DFT path: the squared
    magnitudes of the DC, quarter-frequency and Nyquist bins of an
    ``n_fft``-point real FFT over the first ``n_fft`` channel-0
    samples (zero-padded if the clip is shorter).

    Runs the SAME ``np.fft.rfft`` kernel as ``extract_audio_features``
    — but at bins k ∈ {0, N/4, N/2} every twiddle factor is ±1 or 0,
    so with int16 samples the true bin values are INTEGERS:

        Re(X_0)   = Σ s_n                  Im(X_0)   = 0
        Re(X_N/4) = s_0 − s_2 + s_4 − …    Im(X_N/4) = −s_1 + s_3 − …
        Re(X_N/2) = Σ (−1)^n s_n           Im(X_N/2) = 0

    The FFT's float path lands within ~ε·N·|s| ≈ 1e-10 of those
    integers (pocketfft's near-exact ±1/±i twiddles), so rounding to
    long is exact — asserted per value, never silent — and the result
    is engine-reproducible, which is what lets the workload twin pin
    the whole decode→DFT chain against literal ±1 coefficient sums in
    SQL (the same degenerate-twin pattern that pinned k-means / OPQ /
    one-step LR). The full-spectrum features stay in
    ``extract_audio_features`` under their NumPy-model gate.

    Returns (media_id, bin, re, im, mag_sq) — three rows per clip, all
    longs. One narrow Arrow pass; blobs never shuffle. ``n_fft`` must
    be a positive multiple of 4 so all three witness bins exist.
    """
    n = int(n_fft)
    if n < 4 or n % 4:
        raise ValueError("n_fft must be a positive multiple of 4")
    if decoder is None:
        from vectorsearch_spark.functions.codecs import decode_wav as decoder

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, _rate = decoder(bytes(payload))
                c0 = s[: n, 0].astype(np.float64)
                if len(c0) < n:
                    c0 = np.pad(c0, (0, n - len(c0)))
                X = np.fft.rfft(c0)
                for k in (0, n // 4, n // 2):
                    re, im = X[k].real, X[k].imag
                    ri, ii = round(re), round(im)
                    if abs(re - ri) > 1e-6 or abs(im - ii) > 1e-6:
                        raise AssertionError(
                            f"quarter-frequency bin {k} not integer-exact: "
                            f"{X[k]} (non-int16 input?)"
                        )
                    rows.append(
                        (int(mid), k, int(ri), int(ii), int(ri) ** 2 + int(ii) ** 2)
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "bin", "re", "im", "mag_sq"]
            )

    return media.select("media_id", "payload").mapInPandas(
        mapper, "media_id long, bin long, re long, im long, mag_sq long"
    )


def image_dhash(
    media: DataFrame,
    decoder: Decoder | None = None,
    hash_size: int = 8,
) -> DataFrame:
    """Difference-hash (dHash) perceptual image fingerprint — the
    standard cheap image near-dup signature (Krawetz 2013, "Kind of
    Like That"): decode → integer ITU-601 luma
    ((299·R + 587·G + 114·B) // 1000) → nearest-neighbor resample to
    (hash_size+1) × hash_size (the SAME integer sampling as
    ``resize_images``: src = dst·in // out) → one bit per horizontal
    neighbor pair (right > left), row-major. Near-duplicate images
    (recompression, small crops/brightness shifts) land within a few
    Hamming bits; pair generation at corpus scale reuses the SimHash
    banding machinery (operators/dedup.py) over the emitted bits.

    Every step is integer arithmetic, so the fingerprint is
    bit-reproducible across engines — which is what lets the workload
    entry pin it against a DuckDB oracle recomputing the hash straight
    from the synthesized pixels. Returns (media_id, dhash — the
    hash_size² gradient bits as a '0'/'1' string, MSB-first row-major —
    and n_gradient_bits, the popcount).

    One narrow Arrow pass; blobs never shuffle.
    """
    dec = _require_decoder(decoder, "image_dhash")
    hs = int(hash_size)
    if hs < 1:
        raise ValueError("hash_size must be ≥ 1")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, pops = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = np.atleast_2d(np.asarray(dec(bytes(payload))))
                if img.ndim == 2:
                    img = np.stack([img, img, img], axis=-1)
                rgb = img.astype(np.int64)
                gray = (
                    299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]
                ) // 1000
                h, w = gray.shape
                ys = (np.arange(hs) * h // hs).clip(0, h - 1)
                xs = (np.arange(hs + 1) * w // (hs + 1)).clip(0, w - 1)
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, 1:] > g[:, :-1]).ravel()
                ids.append(mid)
                hashes.append("".join("1" if b else "0" for b in bits))
                pops.append(int(bits.sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="object"),
                    "n_gradient_bits": pd.Series(pops, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        mapper, "media_id long, dhash string, n_gradient_bits long"
    )


def audio_energy_hash(
    media: DataFrame,
    n_frames: int = 65,
    frame_len: int = 8,
    decoder: "Callable[[bytes], tuple[np.ndarray, int]] | None" = None,
) -> DataFrame:
    """Integer frame-energy difference hash — the AUDIO sibling of
    ``image_dhash``: decode → first ``n_frames · frame_len`` channel-0
    samples (zero-padded if shorter) → int64 frame energies
    e_i = Σ s² → one bit per neighbor pair (e_{i+1} > e_i), MSB-first.
    The energy-ORDER profile survives uniform gain changes exactly
    (energies scale together) and small additive noise up to
    near-ties, which is what makes it a near-dup signature rather than
    a checksum; corpus-scale pairing reuses the bit-string banding
    machinery (``dedup.bitstring_near_dup``), exactly like the image
    path.

    All-integer (int16 samples → int64 energies, no float anywhere),
    so the fingerprint is bit-reproducible across engines — the
    workload twin recomputes the whole chain from the synthesized
    samples in SQL. Returns (media_id, ehash — the (n_frames−1)
    gradient bits as a '0'/'1' string — and n_rising, the popcount).
    One narrow Arrow pass; blobs never shuffle.
    """
    nf, fl = int(n_frames), int(frame_len)
    if nf < 2 or fl < 1:
        raise ValueError("need n_frames ≥ 2 and frame_len ≥ 1")
    if decoder is None:
        from vectorsearch_spark.functions.codecs import decode_wav as decoder

    total = nf * fl

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, _rate = decoder(bytes(payload))
                c0 = s[:total, 0].astype(np.int64)
                if len(c0) < total:
                    c0 = np.pad(c0, (0, total - len(c0)))
                e = (c0 * c0).reshape(nf, fl).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.uint8)
                rows.append(
                    (int(mid), "".join("1" if b else "0" for b in bits), int(bits.sum()))
                )
            yield pd.DataFrame(rows, columns=["media_id", "ehash", "n_rising"])

    return media.select("media_id", "payload").mapInPandas(
        mapper, schema="media_id long, ehash string, n_rising long"
    )


def video_scene_cuts(
    media: DataFrame,
    decoder: Decoder | None = None,
    threshold: int = 0,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Luma-difference scene-cut detection over a video payload column
    — the first pass of every video curation pipeline (segmenting long
    videos into clips for frame sampling / clip dedup; the classic
    absolute-frame-difference detector, e.g. PySceneDetect's
    "threshold" mode, restricted here to the integer luma SUM so the
    decision is bit-reproducible across engines).

    Per frame: integer ITU-601 luma ((299R + 587G + 114B) // 1000,
    the image_dhash convention) summed over the raster; frame i > 0 is
    a CUT iff |luma_sum_i − luma_sum_{i−1}| > ``threshold``. Returns
    one row per frame: (id, frame_idx, luma_sum, is_cut int) — the
    per-clip grouping key is ``sum(is_cut) over (order by frame_idx)``
    downstream.

    One narrow Arrow pass; a video's frames stay inside their task and
    blobs never shuffle (the shared multimodal contract). ``decoder``
    maps payload bytes → (n_frames, h, w, 3) or (n_frames, h, w)
    arrays (``functions.jpeg.decode_mjpeg`` for M-JPEG).
    """
    dec = _require_decoder(decoder, "video_scene_cuts")
    thr = int(threshold)

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = np.asarray(dec(bytes(payload)))
                if frames.ndim == 3:  # grayscale: (nf, h, w)
                    frames = np.repeat(frames[..., None], 3, axis=-1)
                a = frames.astype(np.int64)
                luma = (
                    299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]
                ) // 1000
                sums = luma.reshape(luma.shape[0], -1).sum(axis=1)
                prev = None
                for fi, s in enumerate(sums):
                    cut = int(prev is not None and abs(int(s) - prev) > thr)
                    rows.append((int(mid), fi, int(s), cut))
                    prev = int(s)
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "luma_sum", "is_cut"]
            )

    return media.select(id_col, payload_col).mapInPandas(
        mapper,
        schema=f"{id_col} long, frame_idx long, luma_sum long, is_cut long",
    )


def video_luma_hash(
    media: DataFrame,
    decoder: Decoder | None = None,
    n_frames: int = 33,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-luma difference hash — the VIDEO sibling of ``image_dhash``
    and ``audio_energy_hash``, completing the near-dup modality set:
    decode → integer per-frame luma sums (the ``video_scene_cuts``
    convention) → first ``n_frames`` sums (zero-padded when the video
    is shorter, so the hash width is FIXED and bandable) → one bit per
    neighbor pair (s_{i+1} > s_i), MSB-first. The luma-ORDER profile
    survives uniform brightness shifts exactly (sums shift together
    until clipping) and re-encodes that preserve block means — the
    same exactness argument as the audio energy hash's gain
    invariance. Compose with ``dedup.bitstring_near_dup`` for corpus-
    scale pair generation (banded multi-index Hamming).

    Returns (id, vhash — ``n_frames − 1`` '0'/'1' bits — and
    n_rising, the popcount). One narrow Arrow pass; blobs never
    shuffle."""
    dec = _require_decoder(decoder, "video_luma_hash")
    nf = int(n_frames)
    if nf < 2:
        raise ValueError("n_frames must be ≥ 2")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = np.asarray(dec(bytes(payload)))
                if frames.ndim == 3:
                    frames = np.repeat(frames[..., None], 3, axis=-1)
                a = frames.astype(np.int64)
                luma = (
                    299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]
                ) // 1000
                sums = luma.reshape(luma.shape[0], -1).sum(axis=1)[:nf]
                if len(sums) < nf:
                    sums = np.pad(sums, (0, nf - len(sums)))
                bits = (sums[1:] > sums[:-1]).astype(np.uint8)
                rows.append(
                    (
                        int(mid),
                        "".join("1" if b else "0" for b in bits),
                        int(bits.sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col, "vhash", "n_rising"])

    return media.select(id_col, payload_col).mapInPandas(
        mapper, schema=f"{id_col} long, vhash string, n_rising long"
    )
