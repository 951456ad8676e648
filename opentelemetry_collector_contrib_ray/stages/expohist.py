"""Exponential-bucket histograms — the spanmetrics exponential flavor.

Reference: connector/spanmetricsconnector uses the auto-scaling base-2
exponential histogram (internal/metrics/metrics.go:37-75 wrapping the
lightstep expohisto structure; OTel data-model semantics: at scale s the
bucket index of v is the k with 2^(k/2^s) < v <= 2^((k+1)/2^s)).

Two layers:

- :func:`exponential_bucketize` + :func:`exp_histogram` — FIXED-scale
  bucketing over a Dataset, exactly reproducible by SQL: bucket edges are
  precomputed float64 boundaries and the per-row index is one
  ``np.searchsorted`` (upper-inclusive), so the DuckDB oracle built by
  :func:`bucket_case_sql` compares against the *identical* doubles —
  no log() in either engine, no float-rounding drift at bucket edges.
- :class:`ExponentialHistogram` — the mergeable auto-downscaling sketch
  (the 100-TB path: per-block partials merge associatively; when the
  bucket span exceeds ``max_size`` the scale drops and indices halve,
  exactly like the reference's expohisto).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bucket_boundaries(scale: int, idx_lo: int, idx_hi: int) -> np.ndarray:
    """Edges B[j] = 2^((idx_lo + j) / 2^scale) for j = 0 .. (idx_hi-idx_lo+1);
    bucket i covers (B[i - idx_lo], B[i - idx_lo + 1]]."""
    exps = np.arange(idx_lo, idx_hi + 2, dtype=np.float64) / float(1 << scale)
    return np.power(2.0, exps)


def exponential_bucketize(values: np.ndarray, boundaries: np.ndarray,
                          idx_lo: int) -> np.ndarray:
    """Bucket index per value; ``idx_lo - 1`` = underflow, ``idx_hi + 1`` =
    overflow (upper-inclusive edges, OTel convention)."""
    j = np.searchsorted(boundaries, values, side="left")
    return (idx_lo - 1) + j


def bucket_case_sql(value_expr: str, scale: int, idx_lo: int,
                    idx_hi: int) -> str:
    """A DuckDB CASE ladder computing the identical bucket index.

    Boundary literals are ``repr`` of the same float64 edges the engine
    searches — repr round-trips doubles exactly, so every comparison is
    bit-identical on both sides."""
    b = bucket_boundaries(scale, idx_lo, idx_hi)
    arms = [f"WHEN {value_expr} > {b[-1]!r} THEN {idx_hi + 1}"]
    for j in range(len(b) - 2, -1, -1):
        arms.append(f"WHEN {value_expr} > {b[j]!r} THEN {idx_lo + j}")
    joined = " ".join(arms)
    return f"CASE {joined} ELSE {idx_lo - 1} END"


def exp_histogram(ds, value_col: str, keys: list[str], scale: int,
                  idx_lo: int, idx_hi: int):
    """(keys..., bucket, row_count) — fixed-scale exponential histogram of a
    Dataset column; bucketize per batch, then the usual partial-then-merge
    count aggregation."""
    from .aggregate import count_sum

    bounds = bucket_boundaries(scale, idx_lo, idx_hi)

    def bucketize(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        idx = exponential_bucketize(v, bounds, idx_lo).astype(np.int32)
        return t.append_column("bucket", pa.array(idx, pa.int32()))

    keyed = ds.map_batches(bucketize, batch_format="pyarrow",
                           zero_copy_batch=True)
    return count_sum(keyed.select_columns(keys + ["bucket"]),
                     keys=keys + ["bucket"])


class ExponentialHistogram:
    """Mergeable auto-downscaling exponential histogram (scale path).

    Semantics of the reference's expohisto: start at ``scale``; when the
    occupied index span would exceed ``max_size`` buckets, halve resolution
    (scale -= 1, index -> index >> 1) until it fits. Counts are a dict so
    partials stay sparse; merge aligns scales downward. v <= 0 goes to the
    zero bucket (OTel zero-count)."""

    def __init__(self, scale: int = 4, max_size: int = 160):
        self.scale = scale
        self.max_size = max_size
        self.counts: dict[int, int] = {}
        self.zero_count = 0

    def _index(self, v: np.ndarray) -> np.ndarray:
        # ceil(log2(v) * 2^scale) - 1: upper-inclusive OTel mapping
        return (np.ceil(np.log2(v) * (1 << self.scale)) - 1).astype(np.int64)

    def add_values(self, values: np.ndarray) -> "ExponentialHistogram":
        v = np.asarray(values, dtype=np.float64)
        nonpos = v <= 0
        self.zero_count += int(nonpos.sum())
        pos = v[~nonpos]
        if len(pos):
            idx, cnt = np.unique(self._index(pos), return_counts=True)
            for i, c in zip(idx.tolist(), cnt.tolist()):
                self.counts[i] = self.counts.get(i, 0) + c
            self._maybe_downscale()
        return self

    def _maybe_downscale(self):
        while self.counts and (
            max(self.counts) - min(self.counts) + 1 > self.max_size
        ):
            self.scale -= 1
            merged: dict[int, int] = {}
            for i, c in self.counts.items():
                j = i >> 1
                merged[j] = merged.get(j, 0) + c
            self.counts = merged

    def merge(self, other: "ExponentialHistogram") -> "ExponentialHistogram":
        while self.scale > other.scale:
            self.scale -= 1
            merged: dict[int, int] = {}
            for i, c in self.counts.items():
                merged[i >> 1] = merged.get(i >> 1, 0) + c
            self.counts = merged
        o_counts, o_scale = dict(other.counts), other.scale
        while o_scale > self.scale:
            o_scale -= 1
            merged: dict[int, int] = {}
            for i, c in o_counts.items():
                merged[i >> 1] = merged.get(i >> 1, 0) + c
            o_counts = merged
        for i, c in o_counts.items():
            self.counts[i] = self.counts.get(i, 0) + c
        self.zero_count += other.zero_count
        self._maybe_downscale()
        return self

    @property
    def total(self) -> int:
        return self.zero_count + sum(self.counts.values())


def _sorted_cumulative(counts: dict[int, int]):
    idx = sorted(counts)
    cum = np.cumsum([counts[i] for i in idx])
    return idx, cum


def expohist_quantile(hist: "ExponentialHistogram", q: float) -> float:
    """Approximate q-quantile from the sketch: find the bucket holding rank
    ``max(ceil(q*n)-1, 0)`` (the quantile_disc rank convention) and return
    its upper edge 2^((i+1)/2^scale). Guarantee: the true quantile lies in
    (2^(i/2^s), 2^((i+1)/2^s)], so the RELATIVE error of the returned
    value is at most 2^(1/2^scale) - 1 (≈4.4% at scale 4) — the standard
    exponential-histogram bound; zero-bucket ranks return 0.0."""
    import math

    n = hist.total
    if n == 0:
        raise ValueError("empty histogram")
    rank = max(math.ceil(q * n) - 1, 0)
    if rank < hist.zero_count:
        return 0.0
    rank -= hist.zero_count
    idx, cum = _sorted_cumulative(hist.counts)
    j = int(np.searchsorted(cum, rank, side="right"))
    return float(2.0 ** ((idx[j] + 1) / (1 << hist.scale)))


def approx_quantiles(ds, value_col: str, qs: list[float],
                     scale: int = 4, max_size: int = 160) -> dict[str, float]:
    """Distributed approximate quantiles for UNBOUNDED-cardinality value
    columns — the sketch complement to the exact distinct-bounded
    ``stages.quantile.group_quantiles``: per-block
    :class:`ExponentialHistogram` partials (each a ≤``max_size``-bucket
    dict) merge associatively on the driver; driver traffic is
    blocks × max_size counters regardless of input size. Returns
    ``{"q50": v, ...}`` with relative error ≤ 2^(1/2^scale) - 1 for
    positive values."""

    def partial(t: pa.Table) -> pa.Table:
        h = ExponentialHistogram(scale=scale, max_size=max_size)
        h.add_values(t.column(value_col).to_numpy(zero_copy_only=False))
        items = sorted(h.counts.items())
        return pa.table({
            "scale": pa.array([h.scale] * (len(items) + 1), pa.int32()),
            "idx": pa.array([i for i, _ in items] + [0], pa.int64()),
            "cnt": pa.array([c for _, c in items] + [0], pa.int64()),
            "zero": pa.array([0] * len(items) + [h.zero_count], pa.int64()),
        })

    import ray

    tables = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    merged = ExponentialHistogram(scale=scale, max_size=max_size)
    for t in tables:
        # rebuild each block's sketch rows and merge (scales align down)
        part = ExponentialHistogram(scale=int(t.column("scale")[0].as_py()),
                                    max_size=max_size)
        idx = t.column("idx").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        keep = cnt > 0
        part.counts = dict(zip(idx[keep].tolist(), cnt[keep].tolist()))
        part.zero_count = int(t.column("zero").to_numpy(
            zero_copy_only=False).sum())
        merged.merge(part)
    return {f"q{int(round(q * 100))}": expohist_quantile(merged, q)
            for q in qs}
