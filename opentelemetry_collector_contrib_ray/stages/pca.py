"""Distributed PCA over an embedding column — the dimensionality-reduction
step ahead of ANN indexing / near-dup at scale (project 64-d vectors to
the k dims carrying the variance; smaller index, faster matmuls).

Ray-Data-first, the moment-accumulation shape:

- **fit** — one streaming pass: each block emits its (n, Σx, ΣxᵀX)
  partials, d×d float64 each (d = vector dim, so a partial is a few KB —
  NOT proportional to rows); the driver adds blocks×(d²) numbers and runs
  one d×d ``eigh``. No materialization, no shuffle.
- **project** — the (mean, components) model broadcasts once via
  ``ray.put`` (zero-copy plasma read per task) and every batch is one
  centered matmul.

Determinism: eigenvectors are sign-fixed (largest-|coordinate| positive,
first-index tiebreak) so every run and every node computes the identical
projection. Float eigensolves differ across BLAS builds in the last ulps,
so the registered query is rows-only (NO_ORACLE); the companion test pins
the fit against a same-process numpy reference exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FIXED_DTYPE = np.float64


def _matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def pca_fit(ds, vec_col: str, k: int, center: bool = True):
    """Fit PCA: returns (mean (d,), components (k, d), explained_var (k,)).

    Components are rows, ordered by explained variance descending,
    sign-fixed for determinism.
    """
    import ray

    def partial(t: pa.Table) -> pa.Table:
        X = _matrix(t.column(vec_col)).astype(_FIXED_DTYPE)
        if X.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.list_(pa.float64())),
                             "sxx": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([X.sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "sxx": pa.array([(X.T @ X).reshape(-1).tolist()],
                            pa.list_(pa.float64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    tbls = [t for t in ray.get(parts.to_arrow_refs()) if len(t)]
    if not tbls:
        raise ValueError("pca_fit: empty dataset")
    t = pa.concat_tables(tbls)
    n = int(np.asarray(t.column("n")).sum())
    sx = np.add.reduce(
        [np.asarray(v.as_py()) for v in t.column("sx")])
    sxx_flat = np.add.reduce(
        [np.asarray(v.as_py()) for v in t.column("sxx")])
    d = len(sx)
    sxx = sxx_flat.reshape(d, d)
    mean = sx / n if center else np.zeros(d)
    cov = (sxx - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comp = evecs[:, order].T.copy()  # (k, d)
    # deterministic sign: largest-|coordinate| positive (ties -> first)
    for i in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return mean, comp, evals[order]


class ProjectPCA:
    """map_batches callable: append ``out_col`` = (x - mean) @ compᵀ as
    list<float>. Model read zero-copy from plasma once per task."""

    def __init__(self, model_ref, vec_col: str, out_col: str):
        self.model_ref = model_ref
        self.vec_col = vec_col
        self.out_col = out_col
        self._model = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._model is None:
            import ray

            self._model = ray.get(self.model_ref)
        mean, comp = self._model
        X = _matrix(t.column(self.vec_col)).astype(_FIXED_DTYPE)
        P = (X - mean) @ comp.T if X.size else X.reshape(0, comp.shape[0])
        k = comp.shape[0]
        offsets = np.arange(0, (len(P) + 1) * k, k, dtype=np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(P.reshape(-1).astype(np.float32), pa.float32()))
        return t.append_column(self.out_col, arr)


def pca_project(ds, vec_col: str, k: int, out_col: str = "proj",
                model=None, batch_size: int | None = 8192):
    """Fit (unless ``model`` given) then project — two streaming passes."""
    import ray

    if model is None:
        mean, comp, _ = pca_fit(ds, vec_col, k)
    else:
        mean, comp = model
    ref = ray.put((np.ascontiguousarray(mean),
                   np.ascontiguousarray(comp)))
    return ds.map_batches(ProjectPCA(ref, vec_col, out_col),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)
