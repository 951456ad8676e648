"""Mergeable sketches — the approximate scale path for wide aggregations.

HyperLogLog distinct-count (Flajolet et al. 2007, public algorithm):
per-block ``map_batches`` folds values into a register array (one sketch
row per key group per block), a tiny merge stage ORs registers together —
the sketch-merge pattern from the Ray guide ("sketches are designed to be
mergeable").  Deterministic: hashing is md5-based, no RNG.

Use when ``distinct_count``'s exact pair shuffle would exceed memory —
error ≈ 1.04/sqrt(2^p) (p=12 → ~1.6%).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_u64_many


class HLL:
    """Register-array HyperLogLog with numpy fold/merge."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p

    def empty(self) -> np.ndarray:
        return np.zeros(self.m, dtype=np.uint8)

    def fold(self, values, registers: np.ndarray | None = None) -> np.ndarray:
        """Fold an iterable of stringable values into a register array."""
        regs = registers if registers is not None else self.empty()
        h = md5_u64_many(str(v) for v in values)
        if len(h) == 0:
            return regs
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining bits, left-aligned
        # rank = leading zeros of rest + 1 (capped at 64-p+1)
        rank = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        # count leading zeros via float trick is lossy; use bit scan loop on u64
        r = rest[nz]
        lz = np.zeros(len(r), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = r.copy()
        top_clear = (cur & mask) == 0
        while top_clear.any():
            lz[top_clear] += 1
            cur[top_clear] = cur[top_clear] << np.uint64(1)
            top_clear = (cur & mask) == 0
        rank[nz] = lz + 1
        np.maximum.at(regs, idx, rank)
        return regs

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.maximum(a, b)

    def estimate(self, regs: np.ndarray) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int((regs == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # small-range correction
        return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate global COUNT(DISTINCT col) via per-block HLL + merge."""
    hll = HLL(p)

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll.fold(batch.column(col).to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    import ray

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = hll.empty()
    for t in ray.get(partials.materialize().to_arrow_refs()):
        for blob in t.column("regs").to_pylist():
            merged = hll.merge(merged, np.frombuffer(blob, dtype=np.uint8))
    return hll.estimate(merged)


class HeavyHittersSummary:
    """Mergeable truncated-count heavy-hitters summary (Misra-Gries /
    Mergeable Summaries family, Agarwal et al. 2012, public): per block the
    EXACT item counts are truncated to the top ``m`` items, and the dropped
    mass is summarized as the (m+1)-th count — the per-partial
    overcount bound. Merging sums counts for kept items and accumulates
    the bound. Guarantee: for every item,
    ``est ≤ true ≤ est + max_err`` — so any item with
    ``true > max_err`` is RETAINED (no false negatives among hitters
    heavier than the bound), with summary size ≤ blocks × m before the
    final truncation."""

    def __init__(self, m: int = 64):
        self.m = m
        self.counts: dict = {}
        self.max_err = 0

    def add_exact(self, items: dict) -> "HeavyHittersSummary":
        top = sorted(items.items(), key=lambda kv: (-kv[1], str(kv[0])))
        kept = top[: self.m]
        dropped = top[self.m:]
        bound = dropped[0][1] if dropped else 0
        for k, c in kept:
            self.counts[k] = self.counts.get(k, 0) + c
        self.max_err += bound
        return self

    def merge(self, other: "HeavyHittersSummary") -> "HeavyHittersSummary":
        for k, c in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + c
        self.max_err += other.max_err
        return self

    def top(self, k: int) -> list:
        """[(item, est_min, est_max)] — est_max = est_min + max_err."""
        items = sorted(self.counts.items(),
                       key=lambda kv: (-kv[1], str(kv[0])))[:k]
        return [(i, c, c + self.max_err) for i, c in items]


def heavy_hitters(ds, col: str, m: int = 64, k: int = 16):
    """Distributed approximate top-k for UNBOUNDED-cardinality columns —
    the sketch complement to the exact vocab-bounded
    ``tokenstats.token_frequency``: per-block exact counts truncate to a
    ≤m-item summary, driver merge accumulates error bounds. Returns
    [(item, est_min, est_max)]; any item whose true count exceeds the
    final max_err is guaranteed present."""
    import pyarrow.compute as pc

    import ray

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column(col))
        vals = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        order = np.argsort(-cnts, kind="stable")
        keep = order[: m + 1]  # top-m plus the bound witness
        return pa.table({
            "item": vals.take(pa.array(keep, pa.int64())),
            "cnt": pa.array(cnts[keep], pa.int64()),
        })

    tables = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    summary = HeavyHittersSummary(m=m)
    for t in tables:
        summary.add_exact(dict(zip(t.column("item").to_pylist(),
                                   t.column("cnt").to_pylist())))
    return summary.top(k)
