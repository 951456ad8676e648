"""Online anomaly scoring — isolationforestprocessor analog.

Reference semantics (processor/isolationforestprocessor/
isolation_forest.go:15-95): an isolation forest model held in memory scores
each record; records are tagged with the score (or dropped above a
threshold).  This is the canonical STATEFUL MODEL SCORER shape: the model
loads once per worker, batches stream through it.

Ray-Data-first: the model is fit ONCE on the driver from a bounded sample,
shipped via ``ray.put``, and deserialized once per actor in ``__init__``
(``map_batches(Cls, concurrency=N)``); ``__call__`` scores whole batches
with vectorized numpy.  Deterministic: fixed seed, sample = first N rows in
id order.

The forest is a from-scratch numpy implementation (Liu et al. 2008 iForest,
public algorithm): random axis-parallel splits, path-length scoring
``s = 2^(-E[h]/c(n))``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _c(n: float) -> float:
    """Average BST unsuccessful-search path length (iForest normalizer)."""
    if n <= 1:
        return 0.0
    return 2.0 * (np.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n


class IsolationForest:
    """Array-based isolation forest: fit(X) once, path_length(X) vectorized."""

    def __init__(self, n_trees: int = 50, sample_size: int = 256, seed: int = 42):
        self.n_trees = n_trees
        self.sample_size = sample_size
        self.seed = seed
        self.trees: list[dict] = []
        self.expected_depth = 0.0

    def fit(self, X: np.ndarray) -> "IsolationForest":
        rng = np.random.default_rng(self.seed)
        n = min(self.sample_size, len(X))
        self.expected_depth = _c(n)
        max_depth = int(np.ceil(np.log2(max(n, 2))))
        for _ in range(self.n_trees):
            idx = rng.choice(len(X), size=n, replace=False)
            self.trees.append(self._build(X[idx], rng, 0, max_depth))
        return self

    def _build(self, X: np.ndarray, rng, depth: int, max_depth: int) -> dict:
        if depth >= max_depth or len(X) <= 1:
            return {"leaf": True, "n": len(X)}
        f = int(rng.integers(0, X.shape[1]))
        lo, hi = X[:, f].min(), X[:, f].max()
        if lo == hi:
            return {"leaf": True, "n": len(X)}
        split = float(rng.uniform(lo, hi))
        mask = X[:, f] < split
        return {
            "leaf": False, "f": f, "split": split,
            "l": self._build(X[mask], rng, depth + 1, max_depth),
            "r": self._build(X[~mask], rng, depth + 1, max_depth),
        }

    def _path(self, tree: dict, X: np.ndarray, depth: int, out: np.ndarray,
              idx: np.ndarray) -> None:
        if tree["leaf"]:
            out[idx] = depth + _c(tree["n"])
            return
        mask = X[idx, tree["f"]] < tree["split"]
        if mask.any():
            self._path(tree["l"], X, depth + 1, out, idx[mask])
        if (~mask).any():
            self._path(tree["r"], X, depth + 1, out, idx[~mask])

    def score(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score in (0, 1]; higher = more isolated."""
        acc = np.zeros(len(X))
        idx = np.arange(len(X))
        for tree in self.trees:
            out = np.empty(len(X))
            self._path(tree, X, 0, out, idx)
            acc += out
        mean_depth = acc / self.n_trees
        return np.power(2.0, -mean_depth / max(self.expected_depth, 1e-9))


class AnomalyScorer:
    """Actor-pool map_batches callable: model deserialized once per actor."""

    def __init__(self, model: "IsolationForest | ray.ObjectRef",
                 vec_col: str = "embedding", out: str = "anomaly_score"):
        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        self.model = model
        self.vec_col = vec_col
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        X = flat.reshape(len(col), len(flat) // len(col))
        scores = self.model.score(X)
        return batch.append_column(self.out, pa.array(scores, pa.float64()))


def score_anomalies(ds, vec_col: str = "embedding", fit_sample: int = 1024,
                    n_trees: int = 50, seed: int = 42, concurrency=(1, 8)):
    """Fit on a bounded deterministic sample, score the whole dataset."""
    sample = ds.limit(fit_sample).to_pandas()
    X = np.stack(sample[vec_col].to_numpy())
    model = IsolationForest(n_trees=n_trees, seed=seed).fit(X)
    ref = ray.put(model)
    return ds.map_batches(
        AnomalyScorer,
        fn_constructor_kwargs=dict(model=ref, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
