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

import pyarrow as pa

from ..functions.hashing import md5_u64_many


class HashSampler:
    """map_batches callable keeping rows where md5(key) falls under percentage."""

    def __init__(self, key: str, percentage: float):
        if not 0 <= percentage <= 100:
            raise ValueError("percentage must be in [0, 100]")
        self.key = key
        self.threshold_bp = int(round(percentage * 100))  # basis points

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).cast(pa.string()).to_pylist()
        h = md5_u64_many(keys)
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
