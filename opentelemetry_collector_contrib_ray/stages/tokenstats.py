"""Token-level statistics over the ``tokens`` payload column.

The training-data pipeline's vocabulary-frequency op: a distributed
bincount. Per block, one ``np.bincount`` over the zero-copy flattened
token values (bounded by vocab size, not row count); the partial emits
only its NONZERO (token, count) pairs, so the groupby-sum shuffle carries
at most |vocab| rows per block regardless of how many billions of tokens
the block held. Top-k finishes with a sort+limit over |vocab| rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _TokenFreqPartial:
    def __init__(self, tokens_col: str, vocab_size: int):
        self.tokens_col = tokens_col
        self.vocab_size = vocab_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        counts = np.bincount(flat, minlength=self.vocab_size)
        nz = np.nonzero(counts)[0]
        return pa.table({
            "token": pa.array(nz.astype(np.int32), pa.int32()),
            "cnt": pa.array(counts[nz].astype(np.int64), pa.int64()),
        })


def token_frequency(ds, tokens_col: str = "tokens",
                    vocab_size: int = 65536, top_k: int | None = None):
    """(token, n) global token frequencies; optionally only the top_k by
    count (ties broken by token id ascending, deterministic)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _TokenFreqPartial(tokens_col, vocab_size),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    totals = partials.groupby("token").aggregate(Sum("cnt", alias_name="n"))
    if top_k is None:
        return totals
    # sort API takes parallel key/descending lists; token ascending breaks
    # count ties deterministically
    return totals.sort(["n", "token"], descending=[True, False]).limit(top_k)
