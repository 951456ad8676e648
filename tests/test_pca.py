"""Distributed PCA: exact parity with a same-process numpy reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.pca import pca_fit, pca_project


def _data(n=400, d=12, seed=4):
    rng = np.random.default_rng(seed)
    # anisotropic: variance concentrated in a few directions
    basis = rng.normal(size=(d, d))
    scales = np.linspace(3.0, 0.1, d)
    X = rng.normal(size=(n, d)) * scales @ basis
    return X


def _ds(X, blocks=5):
    return rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                      "embedding": [r.astype(np.float32).tolist()
                                    for r in X]}),
        override_num_blocks=blocks)


def _np_reference(X, k):
    Xf = X.astype(np.float64)
    mean = Xf.mean(axis=0)
    cov = np.cov(Xf, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comp = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return mean, comp, evals[order]


def test_fit_matches_numpy_reference():
    X32 = _data().astype(np.float32)  # what actually goes through Arrow
    mean, comp, ev = pca_fit(_ds(X32), "embedding", k=4)
    rmean, rcomp, rev = _np_reference(X32, 4)
    np.testing.assert_allclose(mean, rmean, atol=1e-9)
    np.testing.assert_allclose(ev, rev, atol=1e-6)
    np.testing.assert_allclose(comp, rcomp, atol=1e-7)
    # block count must not change the fit (same-process BLAS)
    mean1, comp1, ev1 = pca_fit(_ds(X32, blocks=1), "embedding", k=4)
    np.testing.assert_allclose(comp, comp1, atol=1e-9)


def test_components_orthonormal_and_variance_ordered():
    mean, comp, ev = pca_fit(_ds(_data().astype(np.float32)),
                             "embedding", k=5)
    np.testing.assert_allclose(comp @ comp.T, np.eye(5), atol=1e-9)
    assert (np.diff(ev) <= 1e-12).all()


def test_projection_shape_and_values():
    X32 = _data(n=100, d=8).astype(np.float32)
    out = pca_project(_ds(X32, blocks=3), "embedding", k=3).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    P = np.stack(out["proj"].to_numpy())
    assert P.shape == (100, 3)
    rmean, rcomp, _ = _np_reference(X32, 3)
    expect = (X32.astype(np.float64) - rmean) @ rcomp.T
    np.testing.assert_allclose(P, expect.astype(np.float32), atol=1e-4)
