"""Deterministic hash sampling — probabilisticsamplerprocessor analog.

Reference semantics (processor/probabilisticsamplerprocessor/
logsprocessor.go:36-123 + pkg/sampling): sampling randomness is derived by
HASHING a stable record key (trace id / log record bytes), never an RNG, so
the decision is consistent across collectors and replays; the hash is
compared against a threshold derived from ``sampling_percentage``.

We key on a caller-chosen column and use ``md5_u64(key) % 10_000 <
percentage*100`` — reproducible by DuckDB ``md5_number_upper`` so the SQL
oracle can re-derive the exact sampled set (basis-point precision mirrors
the reference's 0.01% threshold granularity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_u64_col, md5_u64_many


class HashSampler:
    """map_batches callable keeping rows where md5(key) falls under percentage."""

    def __init__(self, key: str, percentage: float):
        if not 0 <= percentage <= 100:
            raise ValueError("percentage must be in [0, 100]")
        self.key = key
        self.threshold_bp = int(round(percentage * 100))  # basis points

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = md5_u64_col(batch.column(self.key))
        mask = pa.array((h % 10_000) < self.threshold_bp)
        return batch.filter(mask)


def sample_dataset(ds, key: str, percentage: float):
    return ds.map_batches(
        HashSampler(key, percentage), batch_format="pyarrow", zero_copy_batch=True
    )


def sampler_oracle_predicate(key_sql: str, percentage: float) -> str:
    """DuckDB predicate matching HashSampler's decision exactly."""
    bp = int(round(percentage * 100))
    return f"md5_number_upper(CAST({key_sql} AS VARCHAR)) % 10000 < {bp}"


class _HashTopNPartial:
    """Per-block partial: the n smallest (md5(key), key) pairs of the block
    — the fixed-size-sample analog of the k-NN per-block top-k."""

    def __init__(self, key: str, n: int):
        self.key = key
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = md5_u64_col(batch.column(self.key))
        n = min(self.n, len(h))
        # deterministic under hash ties: order by (hash, key)
        order = np.lexsort((batch.column(self.key).to_numpy(
            zero_copy_only=False), h))[:n]
        idx = pa.array(order.astype(np.int64))
        out = batch.take(idx)
        # keep the hash UNSIGNED: int64 view would rank values >= 2^63 first
        return out.append_column("_h", pa.array(h[order], pa.uint64()))


def sample_fixed_n(ds, key: str, n: int):
    """EXACTLY-n deterministic uniform sample: the n rows with the smallest
    md5(key) (hash-order top-N). Per-block partials keep blocks×n candidate
    rows; the driver merge touches only those — no global sort, no RNG;
    reruns and the SQL oracle (ORDER BY md5 LIMIT n) reproduce the exact
    row set at any scale."""
    import ray

    partials = ds.map_batches(
        _HashTopNPartial(key, n), batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    tables = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if not tables:
        return partials.drop_columns(["_h"])
    merged = pa.concat_tables(tables, promote_options="default")
    order = np.lexsort((
        merged.column(key).to_numpy(zero_copy_only=False),
        merged.column("_h").to_numpy(zero_copy_only=False),
    ))[:n]
    return merged.take(pa.array(order.astype(np.int64))).drop_columns(["_h"])


def sample_stratified_n(ds, group_col: str, key: str, n: int):
    """Exactly-n-per-group deterministic sample (stratified hash-order
    top-N): per-block partials keep n candidates per group present in the
    block, then a small groupby finishes each group's top-n — candidate
    volume is blocks×groups×n, never the input size."""
    import pandas as pd

    class _Partial:
        def __call__(self, batch: pa.Table) -> pa.Table:
            h = md5_u64_col(batch.column(key))
            df = pd.DataFrame({
                "_h": h,
                "_k": batch.column(key).to_numpy(zero_copy_only=False),
                "_i": np.arange(len(h)),
                "_g": batch.column(group_col).to_pylist(),
            })
            top = (df.sort_values(["_h", "_k"])
                     .groupby("_g", sort=False).head(n))
            out = batch.take(pa.array(top["_i"].to_numpy()))
            return out.append_column("_h", pa.array(top["_h"].to_numpy(),
                                                    pa.uint64()))

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(["_h", key], kind="mergesort")
                     .head(n).drop(columns=["_h"]))

    partials = ds.map_batches(_Partial(), batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(group_col).map_groups(finish,
                                                  batch_format="pandas")


def sample_mixture(ds, group_col: str, key: str, rates: dict[str, float],
                   default_rate: float = 0.0):
    """Domain-mixture sampling: each group kept at its own rate (the LLM
    data-mixing weights op) — deterministic md5 threshold per row, rate
    looked up per group, one vectorized pass, no shuffle."""
    bp = {g: int(round(r * 100)) for g, r in rates.items()}
    default_bp = int(round(default_rate * 100))

    def keep(batch: pa.Table) -> pa.Table:
        h = md5_u64_col(batch.column(key)) % np.uint64(10_000)
        groups = batch.column(group_col).to_pylist()
        thresholds = np.fromiter(
            (bp.get(g, default_bp) for g in groups), dtype=np.uint64,
            count=len(groups),
        )
        return batch.filter(pa.array(h < thresholds))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(ds, key: str, splits: dict[str, float],
               out_col: str = "split"):
    """Deterministic train/val/test assignment — every real training-data
    pipeline's final fan-out. Each row's split is chosen by
    ``md5(key) % 10000`` against cumulative basis-point boundaries in the
    given (ordered) ``splits`` dict; fractions must sum to 1. Stable
    across runs, partitionings and cluster sizes (no RNG), and
    SQL-reproducible via ``md5_number_upper`` CASE arithmetic — the same
    parity contract as the samplers.
    """
    bp = [int(round(f * 10_000)) for f in splits.values()]
    if sum(bp) != 10_000:
        raise ValueError(f"split fractions must sum to 1 (got {splits})")
    bounds = np.cumsum(bp).astype(np.uint64)  # upper bounds, last = 10000
    names = np.array(list(splits.keys()), dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        h = md5_u64_col(batch.column(key)) % np.uint64(10_000)
        idx = np.searchsorted(bounds, h, side="right")
        return batch.append_column(
            out_col, pa.array(names[idx].tolist(), pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def hash_split_oracle_case(key_sql: str, splits: dict[str, float],
                           out_col: str = "split") -> str:
    """DuckDB CASE expression matching :func:`hash_split` exactly."""
    bp = [int(round(f * 10_000)) for f in splits.values()]
    bounds = np.cumsum(bp)
    h = f"md5_number_upper(CAST({key_sql} AS VARCHAR)) % 10000"
    arms = "".join(
        f" WHEN {h} < {int(b)} THEN '{name}'"
        for name, b in zip(splits.keys(), bounds)
    )
    return f"CASE{arms} END AS {out_col}"


def token_budget_sample(ds, group_col: str, key: str, tok_col: str,
                        budget: int, cum_col: str = "cum_tok"):
    """Per-group TOKEN-BUDGET subset — the data-mixing op stated in token
    space rather than row space: take documents in deterministic md5(key)
    order until each group's running token total would exceed ``budget``
    (a doc is kept iff the running sum INCLUDING it is <= budget).

    Mixture weights for pre-training corpora are token budgets ("50 B
    tokens of web, 5 B of code"), not row counts — :func:`sample_mixture`
    keeps a per-group fraction of rows; this keeps a per-group token
    quota. Deterministic (md5 hash order, key tiebreak), rerun- and
    oracle-stable (SQL: SUM() OVER (PARTITION BY group ORDER BY md5, key
    ROWS UNBOUNDED PRECEDING) <= budget).

    Scale shape: one vectorized hash pass adds the order column; the
    running sum is the skew-PROOF sorted-scan cumulative machinery
    (window.delta_to_cumulative_sorted: sort + block-local segment scan +
    O(blocks) driver carry) — task size bounded by block under any group
    skew; the filter is block-local. No per-group tasks anywhere.
    """
    from .window import delta_to_cumulative_sorted

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_h", pa.array(md5_u64_col(batch.column(key)), pa.uint64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    cum = delta_to_cumulative_sorted(
        hashed, key_cols=[group_col], order_cols=["_h", key],
        value_col=tok_col, out_col=cum_col, as_cents=False)

    def within(batch: pa.Table) -> pa.Table:
        keep = pa.compute.less_equal(batch.column(cum_col), budget)
        return batch.filter(keep).drop_columns(["_h"])

    return cum.map_batches(within, batch_format="pyarrow",
                           zero_copy_batch=True)


# --- reference-EXACT FNV hash-seed mode --------------------------------------

_FNV_OFFSET = 2166136261
_FNV_PRIME = 16777619
_U32 = 0xFFFFFFFF
_NUM_HASH_BUCKETS = 0x4000  # 2^14
_BUCKET_MASK = _NUM_HASH_BUCKETS - 1


def fnv1a32(data: bytes, seed: int = 0) -> int:
    """The reference's ``computeHash`` exactly (probabilisticsampler
    fnvhasher.go:12-18): FNV-1a over 4 little-endian seed bytes followed
    by the value bytes."""
    h = _FNV_OFFSET
    for b in seed.to_bytes(4, "little") + data:
        h = ((h ^ b) * _FNV_PRIME) & _U32
    return h


def fnv_scaled_rate(percentage: float) -> int:
    """``uint32(pct * percentageScaleFactor)`` with the reference's exact
    arithmetic (sampler_mode.go:432-436: 2^14/100 scale, truncation
    toward zero; percents > 100 clamp to 100)."""
    pct = min(float(percentage), 100.0)
    return int(pct * (_NUM_HASH_BUCKETS / 100.0))


class FnvHashSampler:
    """Bit-exact hash-seed-mode sampler (probabilisticsamplerprocessor):
    keep rows where ``fnv1a32(seed_le4 ++ bytes(key)) & 0x3FFF <
    uint32(pct * 2^14/100)`` — the SAME rows the Go collector keeps for
    the same inputs (sampler_mode.go randomnessFromBytes + hashingSampler;
    parity pinned in tests/test_fnv_sampler.py).

    FNV is a sequential byte chain (not vectorizable); the per-unique-key
    vocabulary trick (CLAUDE.md r2) bounds the Python loop by DISTINCT
    keys per batch, gathered back via dictionary codes."""

    def __init__(self, key: str, percentage: float, hash_seed: int = 0):
        if percentage < 0:
            raise ValueError("percentage must be >= 0")
        self.key = key
        self.scaled = fnv_scaled_rate(percentage)
        self.seed = int(hash_seed) & _U32

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.scaled == 0:  # neverSampler (sampler_mode.go:438-440)
            return batch.slice(0, 0)
        col = batch.column(self.key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc

        denc = pc.cast(col, pa.string()).dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        keep_u = np.fromiter(
            ((fnv1a32(((s or "").encode("utf-8")), self.seed)
              & _BUCKET_MASK) < self.scaled
             for s in denc.dictionary.to_pylist()),
            dtype=bool, count=len(denc.dictionary))
        codes = denc.indices.to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(keep_u[codes]))


def sample_dataset_fnv(ds, key: str, percentage: float, hash_seed: int = 0):
    """Reference-exact hash-seed sampling over a key column (the md5
    variant above stays the SQL-oracle-checkable default; this one is the
    wire-compatible mode for parity with a running collector fleet)."""
    return ds.map_batches(
        FnvHashSampler(key, percentage, hash_seed),
        batch_format="pyarrow", zero_copy_batch=True)
