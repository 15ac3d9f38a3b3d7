"""Micro-benchmark of the pure-Python codec kernels feeding the mm_*
workload entries — no Spark, so numbers are comparable arm-to-arm when
run back-to-back. Reproduces the exact payload shapes the workload
builds (mm_video_neardup 33×(8,8) gray frames; mm_mjpeg_frames 3-6
mixed-mode frames; mm_jpeg_decode single images; mm BMP corpus) and
times encode / split / decode / hash separately.

Usage: python scripts/codec_probe.py [--rows 200] [--video-only]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_text(did: int) -> bytes:
    rng = np.random.default_rng(did)
    return bytes(rng.integers(32, 127, size=200, dtype=np.uint8))


def video_payload(did: int, jpeg) -> list:
    b = np.frombuffer(synth_text(did), dtype=np.uint8)
    NF = 33
    vals = b[np.arange(NF) % len(b)].astype(np.int64)
    out = []
    for vid, shift in ((did * 2, 0), (did * 2 + 1, 16)):
        if shift and did % 3 != 0:
            continue
        v = np.minimum(vals + shift, 255).astype(np.uint8)
        frames = [np.full((8, 8), x, dtype=np.uint8) for x in v]
        out.append(frames)
    return out


def mjpeg_frames_payload(did: int) -> tuple:
    b = np.frombuffer(synth_text(did), dtype=np.uint8)
    bw, bh = 1 + did % 3, 1 + did % 2
    nf = 3 + did % 4
    nb = bw * bh
    frames = []
    for f in range(nf):
        idx = (f * nb + np.arange(nb)) % len(b)
        vals = b[idx].reshape(bh, bw)
        gray = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        mode = did % 3
        frames.append(gray if mode == 0 else np.repeat(gray[..., None], 3, axis=2))
    sub = "4:2:0" if did % 3 == 2 else "4:4:4"
    return frames, sub


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200)
    ap.add_argument("--video-only", action="store_true")
    args = ap.parse_args()

    from vectorsearch_spark.functions import jpeg as J
    from vectorsearch_spark.functions import codecs as C

    R = args.rows

    # --- mm_video_neardup shape: 33 single-block gray frames ---
    t0 = time.time()
    vids = []
    for did in range(R):
        for frames in video_payload(did, J):
            vids.append(J.encode_mjpeg(frames, quant=1))
    t1 = time.time()
    print(f"video encode_mjpeg   {R} docs -> {len(vids)} vids: {t1-t0:6.3f}s")

    t0 = time.time()
    splits = [J.split_mjpeg(v) for v in vids]
    t1 = time.time()
    print(f"video split_mjpeg    {sum(len(s) for s in splits)} frames: {t1-t0:6.3f}s")

    t0 = time.time()
    dec = [J.decode_mjpeg(v) for v in vids]
    t1 = time.time()
    print(f"video decode_mjpeg   (incl split): {t1-t0:6.3f}s")

    t0 = time.time()
    for frames in dec:
        a = frames.astype(np.int64)
        luma = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
        sums = luma.reshape(luma.shape[0], -1).sum(axis=1)[:33]
        bits = (sums[1:] > sums[:-1]).astype(np.uint8)
        "".join("1" if b else "0" for b in bits)
    t1 = time.time()
    print(f"video luma_hash      : {t1-t0:6.3f}s")

    if args.video_only:
        return

    # --- mm_mjpeg_frames shape: 3-6 mixed-mode frames, bigger blocks ---
    t0 = time.time()
    streams = []
    for did in range(R):
        frames, sub = mjpeg_frames_payload(did)
        streams.append(J.encode_mjpeg(frames, quant=1, subsampling=sub))
    t1 = time.time()
    print(f"mjpeg encode (mixed) {R} docs: {t1-t0:6.3f}s")

    t0 = time.time()
    for s in streams:
        J.decode_mjpeg(s)
    t1 = time.time()
    print(f"mjpeg decode (mixed) : {t1-t0:6.3f}s")

    # --- mm_jpeg_decode shape: one image per doc, 3 modes ---
    t0 = time.time()
    outs = []
    for did in range(R):
        b = np.frombuffer(synth_text(did), dtype=np.uint8)
        bw, bh = 1 + did % 4, 1 + did % 3
        vals = b[np.arange(bw * bh) % len(b)].reshape(bh, bw)
        gray = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        mode = did % 3
        if mode == 0:
            outs.append(J.encode_jpeg(gray, quant=1))
        else:
            rgb = np.repeat(gray[..., None], 3, axis=2)
            outs.append(J.encode_jpeg(rgb, quant=1, subsampling="4:4:4" if mode == 1 else "4:2:0"))
    t1 = time.time()
    print(f"jpeg encode (single) {R} docs: {t1-t0:6.3f}s")

    t0 = time.time()
    for o in outs:
        C.decode_media(o)
    t1 = time.time()
    print(f"jpeg decode (single) : {t1-t0:6.3f}s")

    # --- BMP corpus (mm_image_neardup/dhash/resize) ---
    t0 = time.time()
    bmps = []
    for did in range(R):
        b = np.frombuffer(synth_text(did), dtype=np.uint8)
        w, h = 5 + did % 12, 4 + did % 9
        k = np.arange(w * h * 3)
        pix = b[k % len(b)]
        bmps.append(C.encode_bmp(pix.reshape(h, w, 3)))
    t1 = time.time()
    print(f"bmp encode           {R} docs: {t1-t0:6.3f}s")

    t0 = time.time()
    for o in bmps:
        C.decode_media(o)
    t1 = time.time()
    print(f"bmp decode           : {t1-t0:6.3f}s")


if __name__ == "__main__":
    main()
