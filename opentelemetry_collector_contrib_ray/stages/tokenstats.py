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


class SequencePack:
    """Greedy sequence packing: documents' token lists packed into
    fixed-length training examples (the classic pre-training batching op).

    Per batch: docs are packed first-fit-in-order into examples of at most
    ``max_len`` tokens; docs longer than ``max_len`` are CHUNKED first.
    Emits (example tokens list<int32>, n_tok, n_docs) rows, where n_docs
    counts the documents whose LAST token lands in that example (a
    middle-chunk-only example reports 0; sums to the input doc count). Packing is
    block-local by design — examples never span blocks, so the op is
    embarrassingly parallel and deterministic given block contents; global
    packing efficiency is traded for zero shuffle (standard practice).
    Token conservation is exact: sum(n_tok) in == sum over examples.
    """

    def __init__(self, tokens_col: str = "tokens", max_len: int = 2048):
        if max_len <= 0:
            raise ValueError("max_len must be positive")
        self.tokens_col = tokens_col
        self.max_len = max_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))

        out_tokens: list[np.ndarray] = []
        out_docs: list[int] = []
        cur: list[np.ndarray] = []
        cur_len = 0
        cur_docs = 0

        def flush():
            nonlocal cur, cur_len, cur_docs
            if cur_len:
                out_tokens.append(np.concatenate(cur) if len(cur) > 1 else cur[0])
                out_docs.append(cur_docs)
            cur, cur_len, cur_docs = [], 0, 0

        pos = 0
        for ln in lens.tolist():
            seg = flat[pos:pos + ln]
            pos += ln
            start = 0
            ended_in_flush = False
            while ln - start > 0:
                take = min(self.max_len - cur_len, ln - start)
                cur.append(seg[start:start + take])
                cur_len += take
                start += take
                if cur_len == self.max_len:
                    if start == ln:  # doc ends exactly at the boundary —
                        cur_docs += 1  # count it in THIS example only
                        ended_in_flush = True
                    flush()
            if not ended_in_flush:
                cur_docs += 1
        flush()

        n = len(out_tokens)
        tok_lens = np.array([len(t) for t in out_tokens], dtype=np.int32)
        offsets = np.concatenate(([0], np.cumsum(tok_lens))).astype(np.int32)
        values = (np.concatenate(out_tokens) if n else
                  np.empty(0, dtype=flat.dtype))
        return pa.table({
            "tokens": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(values.astype(np.int32), pa.int32()),
            ),
            "n_tok": pa.array(tok_lens, pa.int32()),
            "n_docs": pa.array(np.array(out_docs, dtype=np.int32), pa.int32()),
        })


def pack_sequences(ds, tokens_col: str = "tokens", max_len: int = 2048,
                   batch_size: int = 4096):
    return ds.map_batches(
        SequencePack(tokens_col=tokens_col, max_len=max_len),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    )
