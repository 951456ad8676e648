"""Spherical k-means document clustering — the SemDeDup building block.

Clusters an embedding column (``list<float>``) with cosine geometry:
normalize, assign to the max-dot-product centroid, re-normalize means
(Abbas et al. 2023, "SemDeDup" — cluster, then keep one representative per
cluster; reference parity: the OTel corpus has no clustering processor, so
this lives with the other beyond-reference training-data operators,
SURVEY.md "training-data" section).

Scale design (100 TB):

- **Fit** runs on a bounded DETERMINISTIC sample — the ``fit_sample`` rows
  with the smallest ``md5(id)`` (``sample_fixed_n``), so the centroids are
  identical under any partitioning / cluster size.  Fitting on a sample is
  the standard k-means-at-scale recipe (one Lloyd pass over 100 TB costs a
  full corpus read; 10 passes cost 10).
- **Refine** (optional, ``refine_iters``) then runs TRUE distributed Lloyd
  passes over the whole corpus: each pass is one ``map_batches`` producing
  per-block ``(cell, vec_sum, count)`` partials — bounded by blocks × k —
  merged on the driver (k × d floats), new centroids re-broadcast via
  ``ray.put``.  Each pass re-reads the input; callers stream, nothing
  materializes.
- **Assign** is one stateless vectorized pass (argmax over a broadcast
  k × d matrix); the centroid matrix ships once per task via ``ray.put``,
  never per batch.

Determinism note: the sample fit is bit-reproducible.  Refine partial sums
are merged in sorted ``(cell, content-hash)`` order so a fixed partitioning
reproduces exactly; across DIFFERENT partitionings float-sum order can
differ at the last ulp, which is why the registered query pins the sample
fit plus assignment (exactly reproducible) and the refine path is covered
by inertia-improvement tests instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _matrix, _normalize


def _fit_sample_matrix(ds, id_col: str, vec_col: str, n: int) -> np.ndarray:
    from .sample import sample_fixed_n

    sample = sample_fixed_n(ds.select_columns([id_col, vec_col]), id_col, n)
    if not isinstance(sample, pa.Table):  # empty-dataset fallback path
        sample = pa.Table.from_pylist(sample.take_all())
    if sample.num_rows == 0:
        raise ValueError("kmeans fit: empty input dataset")
    # sort by id so the sample ORDER is partitioning-independent too
    sample = sample.sort_by(id_col)
    return _normalize(_matrix(sample, vec_col))


def _lloyd(X: np.ndarray, k: int, n_iter: int, seed: int) -> np.ndarray:
    """Seeded spherical Lloyd on an in-memory sample (same recipe as
    similarity.IVFIndex.fit, shared cosine geometry)."""
    rng = np.random.default_rng(seed)
    init = rng.choice(len(X), size=min(k, len(X)), replace=False)
    C = X[init].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


class _LloydPartial:
    """Per-block partial for one distributed Lloyd pass: (cell, packed
    float64 vector sum, member count) per non-empty cell — blocks × k rows,
    never the corpus.  Sums travel as equal-width binary (list columns
    don't survive some join/merge paths; CLAUDE.md round-2 fact)."""

    def __init__(self, centroids_ref, vec_col: str):
        self._ref = centroids_ref
        self.vec_col = vec_col
        self.C = None  # resolved lazily IN the worker (zero-copy plasma get)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self.C is None:
            self.C = ray.get(self._ref)
        out_schema = pa.schema([("cell", pa.int32()), ("psum", pa.binary()),
                                ("pcnt", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        X = _normalize(_matrix(batch, self.vec_col))
        assign = np.argmax(X @ self.C.T, axis=1)
        cells, inverse = np.unique(assign, return_inverse=True)
        d = X.shape[1]
        sums = np.zeros((len(cells), d), dtype=np.float64)
        np.add.at(sums, inverse, X)
        cnts = np.bincount(inverse, minlength=len(cells)).astype(np.int64)
        return pa.table({
            "cell": pa.array(cells.astype(np.int32), pa.int32()),
            "psum": pa.array([s.tobytes() for s in sums], pa.binary()),
            "pcnt": pa.array(cnts, pa.int64()),
        })


def _refine_pass(ds, vec_col: str, C: np.ndarray) -> np.ndarray:
    import hashlib

    import ray

    ref = ray.put(C)
    partials = ds.map_batches(
        _LloydPartial(ref, vec_col), batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    tables = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    k, d = C.shape
    if not tables:
        return C
    merged = pa.concat_tables(tables)
    # deterministic merge order for a fixed partitioning: (cell, content md5)
    keys = [
        (merged.column("cell")[i].as_py(),
         hashlib.md5(merged.column("psum")[i].as_py()).digest())
        for i in range(merged.num_rows)
    ]
    order = sorted(range(merged.num_rows), key=lambda i: keys[i])
    sums = np.zeros((k, d), dtype=np.float64)
    cnts = np.zeros(k, dtype=np.int64)
    for i in order:
        c = keys[i][0]
        sums[c] += np.frombuffer(merged.column("psum")[i].as_py(),
                                 dtype=np.float64)
        cnts[c] += merged.column("pcnt")[i].as_py()
    new = C.copy()
    nz = cnts > 0
    new[nz] = sums[nz] / cnts[nz, None]
    return _normalize(new)


def kmeans_fit(ds, id_col: str, vec_col: str, k: int,
               fit_sample: int = 4096, n_iter: int = 10, seed: int = 42,
               refine_iters: int = 0) -> np.ndarray:
    """Fit spherical k-means centroids: deterministic sample Lloyd, then
    ``refine_iters`` full-corpus distributed passes.  Returns the k × d
    centroid matrix (unit rows)."""
    X = _fit_sample_matrix(ds, id_col, vec_col, fit_sample)
    C = _lloyd(X, k, n_iter, seed)
    for _ in range(refine_iters):
        C = _refine_pass(ds, vec_col, C)
    return C


class _Assign:
    def __init__(self, centroids_ref, vec_col: str, out: str,
                 sim_col: str | None):
        self._ref = centroids_ref
        self.vec_col = vec_col
        self.out = out
        self.sim_col = sim_col
        self.C = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self.C is None:
            self.C = ray.get(self._ref)
        if batch.num_rows == 0:
            t = batch.append_column(self.out, pa.array([], pa.int32()))
            if self.sim_col:
                t = t.append_column(self.sim_col, pa.array([], pa.float64()))
            return t
        X = _normalize(_matrix(batch, self.vec_col))
        sims = X @ self.C.T
        assign = np.argmax(sims, axis=1)
        t = batch.append_column(self.out,
                                pa.array(assign.astype(np.int32), pa.int32()))
        if self.sim_col:
            best = sims[np.arange(len(assign)), assign]
            t = t.append_column(self.sim_col, pa.array(best, pa.float64()))
        return t


def kmeans_assign(ds, id_col: str, vec_col: str, k: int,
                  out: str = "cluster", sim_col: str | None = None,
                  centroids: np.ndarray | None = None, **fit_kw):
    """Add a nearest-centroid ``out`` column (and optionally the cosine
    similarity to it): fit (or take) centroids, broadcast once, one
    stateless vectorized pass."""
    import ray

    C = centroids if centroids is not None else kmeans_fit(
        ds, id_col, vec_col, k, **fit_kw)
    ref = ray.put(C)
    return ds.map_batches(_Assign(ref, vec_col, out, sim_col),
                          batch_format="pyarrow", zero_copy_batch=True)


def semdedup_representatives(ds, id_col: str, vec_col: str, k: int,
                             sim_col: str = "centroid_sim", **fit_kw):
    """SemDeDup-style semantic dedup: cluster, keep ONE representative per
    cluster — the member FARTHEST from its centroid (Abbas et al. 2023 keep
    low-similarity items; ties break to least id).  Composition:
    ``kmeans_assign`` + distributed argmax ``best_per_group`` (partials
    bounded by blocks × k), so no near-dup pair graph is ever built."""
    from .aggregate import best_per_group

    assigned = kmeans_assign(ds, id_col, vec_col, k, out="cluster",
                             sim_col=sim_col, **fit_kw)
    # farthest-from-centroid == smallest sim -> argmax of negated sim
    reps = best_per_group(
        assigned.select_columns([id_col, "cluster", sim_col]),
        keys=["cluster"],
        order_by=[(sim_col, "ascending"), (id_col, "ascending")],
        count_name="cluster_size",
    )
    return reps
