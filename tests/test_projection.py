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


def test_sq8_roundtrip_error_bound_and_model(spark):
    """SQ8: per-dim round-trip error is bounded by range/510 for
    in-range data, constant dims reconstruct exactly (range guard),
    and the codegen path equals a NumPy reference elementwise."""
    import numpy as np

    from vectorsearch_spark.operators.projection import (
        sq8_min_max,
        sq8_roundtrip_error,
    )

    rng = np.random.default_rng(5)
    x = rng.normal(size=(300, 8)).astype(np.float32)
    x[:, 3] = 2.5  # constant dimension
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mins, maxs = sq8_min_max(df)
    assert mins == [float(x[:, j].min()) for j in range(8)]
    assert maxs == [float(x[:, j].max()) for j in range(8)]
    out = {r["vec_id"]: r for r in sq8_roundtrip_error(df, mins, maxs).collect()}

    xd = x.astype(np.float64)
    mn = np.array(mins); mx = np.array(maxs)
    r = np.where(mx > mn, mx - mn, 1.0)
    codes = np.clip(np.round((xd - mn) / r * 255), 0, 255)
    xhat = mn + codes / 255.0 * r
    err = np.abs(xd - xhat)
    bound = r / 510.0 + 1e-12
    assert (err <= bound[None, :] + 1e-9).all()
    assert (err[:, 3] == 0).all()  # constant dim: exact
    for i in range(len(x)):
        assert out[i]["max_abs_err"] == round(float(err[i].max()), 6)
        assert out[i]["mean_abs_err"] == round(float(err[i].mean()), 6)
    # codegen check: no Python eval nodes in the plan
    plan = sq8_roundtrip_error(df, mins, maxs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
