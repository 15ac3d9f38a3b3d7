"""PQ kernel unit tests vs hand/NumPy oracles — mirrors
pq/PqTrainerTest.java + pq/PqEncoderTest.java."""

from __future__ import annotations

import numpy as np
import pytest

from vectorsearch_spark.operators.pq import (
    approx_distances,
    build_lut,
    decode,
    encode,
    train_codebook,
)


def test_encode_picks_nearest_centroid():
    # 1 subspace, 2 centroids at 0 and 10 → points near each get its code
    cb = np.array([[[0.0], [10.0]]])  # (m=1, k=2, sub=1)
    x = np.array([[0.2], [9.1], [4.9], [5.1]])
    codes = encode(x, cb)
    assert codes[:, 0].tolist() == [0, 1, 0, 1]


def test_encode_multi_subspace():
    cb = np.array([[[0.0], [10.0]], [[-5.0], [5.0]]])  # m=2, k=2, sub=1
    x = np.array([[9.0, -4.0], [1.0, 4.0]])
    codes = encode(x, cb)
    assert codes.tolist() == [[1, 0], [0, 1]]


def test_lut_approx_equals_distance_to_decoded():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(100, 8))
    cb = train_codebook(x, m=4, k=8, iters=5, seed=42)
    codes = encode(x, cb)
    q = rng.normal(size=8)
    lut = build_lut(cb, q)
    approx = approx_distances(codes, lut)
    recon = decode(codes, cb)
    exact_to_recon = np.sum((recon - q) ** 2, axis=1)
    assert np.allclose(approx, exact_to_recon, rtol=1e-10)


def test_train_deterministic_and_shaped():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    a = train_codebook(x, m=4, k=16, iters=5, seed=42)
    b = train_codebook(x, m=4, k=16, iters=5, seed=42)
    c = train_codebook(x, m=4, k=16, iters=5, seed=43)
    assert a.shape == (4, 16, 2)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_train_fewer_points_than_k_pads():
    x = np.random.default_rng(2).normal(size=(3, 4))
    cb = train_codebook(x, m=2, k=8, iters=3, seed=42)
    assert cb.shape == (2, 8, 2)
    codes = encode(x, cb)
    assert codes.max() < 8


def test_quantization_reduces_error_vs_random_codebook():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 16))
    trained = train_codebook(x, m=4, k=16, iters=5, seed=42)
    random_cb = rng.normal(size=trained.shape)
    err_t = np.sum((decode(encode(x, trained), trained) - x) ** 2)
    err_r = np.sum((decode(encode(x, random_cb), random_cb) - x) ** 2)
    assert err_t < err_r


def test_invalid_m_raises():
    with pytest.raises(ValueError):
        train_codebook(np.zeros((10, 7)), m=4, k=4, iters=1, seed=1)


def test_opq_rotation_orthogonal_and_deterministic():
    import numpy as np

    from vectorsearch_spark.operators.pq import opq_train

    rng = np.random.default_rng(3)
    x = rng.normal(size=(400, 16))
    r1, cb1 = opq_train(x, m=4, k=16, iters=4, seed=42)
    r2, cb2 = opq_train(x, m=4, k=16, iters=4, seed=42)
    assert np.allclose(r1 @ r1.T, np.eye(16), atol=1e-10)
    assert np.array_equal(r1, r2) and np.array_equal(cb1, cb2)


def test_opq_beats_plain_pq_on_correlated_data():
    """The OPQ claim itself: on anisotropic/correlated embeddings the
    learned rotation reduces PQ reconstruction error (R = I is in the
    feasible set, so a correct implementation can only do better)."""
    import numpy as np

    from vectorsearch_spark.operators.pq import (
        decode,
        encode,
        opq_train,
        train_codebook,
    )

    rng = np.random.default_rng(11)
    d = 16
    # heavy cross-dimension correlation: random full mixing + stretch
    mix = rng.normal(size=(d, d)) @ np.diag(np.linspace(3.0, 0.1, d))
    x = rng.normal(size=(600, d)) @ mix
    m, k = 4, 16
    cb_plain = train_codebook(x, m, k, iters=5, seed=42)
    err_plain = ((x - decode(encode(x, cb_plain), cb_plain)) ** 2).sum(axis=1).mean()
    r, cb = opq_train(x, m=m, k=k, iters=8, seed=42)
    xr = x @ r
    err_opq = ((xr - decode(encode(xr, cb), cb)) ** 2).sum(axis=1).mean()
    # rotation is norm-preserving, so the errors are directly comparable
    assert err_opq < err_plain * 0.9, (err_opq, err_plain)
