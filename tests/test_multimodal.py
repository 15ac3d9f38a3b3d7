"""Multimodal plumbing tests: schema/batch shape of the mapInPandas
stages with a deterministic fake codec, NumPy oracles for features/
resize/frame-sampling, and the NotImplementedError stub gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorsearch_spark.operators.multimodal import (
    attach_media_metadata,
    extract_features,
    fake_decoder,
    resize_images,
    sample_frames,
)

PAYLOADS = [
    (1, bytes(range(100))),
    (2, b"abcdefgh" * 20),
    (3, b"x"),
    (4, b""),
]


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(PAYLOADS, "doc_id long, payload binary")
    return attach_media_metadata(df, id_col="doc_id", payload_col="payload")


def py_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    arr = fake_decoder(payload).ravel()
    pad = (-len(arr)) % dim
    if pad:
        arr = np.pad(arr, (0, pad))
    return arr.reshape(dim, -1).mean(axis=1).astype(np.float32)


def test_metadata_schema_and_determinism(media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert set(rows) == {1, 2, 3, 4}
    r = rows[1]
    assert r["media_type"] == "image"
    assert r["width"] == 64 + 100 % 64 and r["height"] == 64 + (100 // 64) % 64
    assert rows[4]["width"] == 64


def test_extract_features_matches_numpy(media):
    got = {r["media_id"]: r for r in extract_features(media, decoder=fake_decoder).collect()}
    for mid, payload in PAYLOADS:
        expect = py_feature(payload)
        assert got[mid]["n_bytes"] == len(payload)
        assert np.allclose(got[mid]["feature"], expect), mid


def test_extract_features_stub_raises_without_decoder(media):
    with pytest.raises(NotImplementedError, match="extract_features"):
        extract_features(media)


def test_resize_nearest_neighbor(media, spark):
    out = {r["media_id"]: r for r in resize_images(media, 4, 4, decoder=fake_decoder).collect()}
    for mid, payload in PAYLOADS:
        img = np.atleast_2d(fake_decoder(payload))
        ys = (np.arange(4) * img.shape[0] // 4).clip(0, img.shape[0] - 1)
        xs = (np.arange(4) * img.shape[1] // 4).clip(0, img.shape[1] - 1)
        expect = img[np.ix_(ys, xs)].astype(np.uint8).tobytes()
        assert bytes(out[mid]["payload"]) == expect, mid
        assert out[mid]["out_width"] == 4 and out[mid]["out_height"] == 4


def test_sample_frames_bounded_fanout(media):
    rows = sample_frames(media, every_nth=2, max_frames=3, decoder=fake_decoder).collect()
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, payload in PAYLOADS:
        frames = np.atleast_2d(fake_decoder(payload))
        keep = list(range(0, frames.shape[0], 2))[:3]
        got = sorted(by_media[mid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == keep
        for r in got:
            assert bytes(r["payload"]) == frames[r["frame_idx"]].astype(np.uint8).tobytes()
