"""Distributed PCA vs single-machine NumPy on identical rows."""

from __future__ import annotations

import numpy as np

from vectorsearch_spark.operators.projection import fit_pca, pca_project


def _np_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = ((x - mean).T @ (x - mean)) / len(x)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean, evals[order]


def _data(n=400, d=12, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so ordering is unambiguous
    basis = rng.normal(size=(d, d))
    scales = np.linspace(4.0, 0.1, d)
    return rng.normal(size=(n, d)) * scales @ basis


def test_fit_pca_matches_numpy(spark):
    x = _data()
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    ).repartition(7)
    comps, mean, ev = fit_pca(df, k=5)
    ec, em, ee = _np_pca(x, 5)
    assert np.allclose(mean, em, atol=1e-9)
    assert np.allclose(ev, ee, atol=1e-9)
    assert np.allclose(comps, ec, atol=1e-8)
    # variance explained is in decreasing order
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))


def test_pca_project_matches_numpy_and_keeps_columns(spark):
    x = _data(n=200, d=8, seed=5)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    ).repartition(5)
    out = pca_project(df, k=3).collect()
    ec, em, _ = _np_pca(x, 3)
    exp = (x - em) @ ec.T
    got = {r["vec_id"]: np.array(r["pca"]) for r in out}
    assert set(got) == set(range(len(x)))
    for i in range(len(x)):
        assert np.allclose(got[i], exp[i], atol=1e-8), i
    assert out[0].asDict().keys() == {"vec_id", "embedding", "pca"}


def test_pca_reconstruction_error_decreases_with_k(spark):
    x = _data(n=300, d=10, seed=9)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))], "vec_id long, embedding array<double>"
    )
    errs = []
    for k in (2, 5, 10):
        comps, mean, _ = fit_pca(df, k=k)
        proj = (x - mean) @ comps.T
        recon = proj @ comps + mean
        errs.append(float(((x - recon) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-18  # k = d reconstructs exactly
