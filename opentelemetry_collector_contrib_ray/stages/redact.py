"""Redaction — redactionprocessor analog.

Reference semantics (processor/redactionprocessor/processor.go:31-44,
89-167): an allow-list of attribute keys (others deleted), a list of
blocked-value regexes — any value matching one is replaced by a fixed mask
— and summary attributes recording how many keys were masked/deleted.

Vectorized: one ``match_substring_regex`` mask + ``if_else`` per (column,
pattern); the per-row ``redacted_cnt`` summary is a sum of the masks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MASK = "****"


class Redact:
    def __init__(
        self,
        allowed_keys: list[str] | None = None,
        blocked_patterns: list[str] = (),
        mask: str = MASK,
        summary: bool = True,
    ):
        self.allowed_keys = allowed_keys
        self.blocked_patterns = list(blocked_patterns)
        self.mask = mask
        self.summary = summary

    def __call__(self, batch: pa.Table) -> pa.Table:
        deleted_cnt = 0
        if self.allowed_keys is not None:
            keep = [c for c in batch.column_names if c in self.allowed_keys]
            deleted_cnt = batch.num_columns - len(keep)
            batch = batch.select(keep)

        redacted = np.zeros(batch.num_rows, dtype=np.int64)
        for i, name in enumerate(batch.column_names):
            col = batch.column(i)
            if not pa.types.is_string(col.type):
                continue
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            hit = None
            for pat in self.blocked_patterns:
                m = pc.fill_null(pc.match_substring_regex(col, pat), False)
                hit = m if hit is None else pc.or_(hit, m)
            if hit is None:
                continue
            masked = pc.if_else(hit, pa.scalar(self.mask, pa.string()), col)
            batch = batch.set_column(i, name, masked)
            redacted += hit.to_numpy(zero_copy_only=False).astype(np.int64)

        if self.summary:
            batch = batch.append_column("redacted_cnt", pa.array(redacted))
            if self.allowed_keys is not None:
                # reference emits BOTH masked and deleted summary attributes
                # (processor/redactionprocessor/processor.go:142-167); columns
                # are our attribute analog, so the count is per-row constant
                batch = batch.append_column(
                    "redaction_deleted_cnt",
                    pa.array(
                        np.full(batch.num_rows, deleted_cnt, dtype=np.int64)
                    ),
                )
        return batch
