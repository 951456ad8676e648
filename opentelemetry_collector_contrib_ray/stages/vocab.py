"""Token-vocabulary operations over ``list<int32>`` token columns.

Two training-data-pipeline primitives:

- :class:`Md5Tokenize` — deterministic word tokenizer whose ids DuckDB can
  reproduce (``md5_number_upper(word) % vocab_size``), so token-level
  results get EXACT SQL oracles (the corpus's fnv tokenizer cannot be
  expressed in SQL — that is why token_frequency is rows-only).
- :func:`remap_tokens` — rewrite every token id through a vocabulary
  mapping table (the "retokenize to a new vocab / merge vocabs" step of a
  training-data refresh). The mapping is a dense ``np.ndarray`` LUT put
  in the object store ONCE (``ray.put``) and read zero-copy by every map
  task — broadcast, never re-shipped per batch. The per-batch work is one
  fancy-index gather over the flattened list values plus an offset
  rebuild: no Python loop over rows or tokens.

Both stages preserve the per-row list<int32> layout (the repo invariant:
token arrays survive every stage byte-identically unless the stage's
CONTRACT is to rewrite them — this one's is).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64_many


def _flat_and_lens(col) -> tuple[np.ndarray, np.ndarray]:
    """Flattened values + per-row lengths of a list column (slice-safe:
    ``flatten()`` honors the slice; lengths come from consecutive
    offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    return flat, lens


def _rebuild_list(values: np.ndarray, lens: np.ndarray) -> pa.ListArray:
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(values.astype(np.int32, copy=False), pa.int32()),
    )


class Md5Tokenize:
    """map_batches callable: append ``tokens`` (list<int32>) from a text
    column — ``md5_u64(word) % vocab_size`` per single-space-split word,
    the split DuckDB's ``string_split(text, ' ')`` performs (empty text
    tokenizes to the one-element list [''], matching SQL).

    Vectorized via the vocabulary trick: one ``split_pattern`` kernel,
    md5 over the batch's UNIQUE words only, one ``index_in`` gather.
    Stateless and cheap — task-based map_batches, no actor pool.
    """

    def __init__(self, text_col: str = "text", out_col: str = "tokens",
                 vocab_size: int = 50_257):
        self.text_col = text_col
        self.out_col = out_col
        self.vocab_size = vocab_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(col, pattern=" ")
        flat = words.flatten()
        lens = np.diff(words.offsets.to_numpy(zero_copy_only=False))
        uniq = pc.unique(flat)
        ids_u = (md5_u64_many(uniq.to_pylist()) % self.vocab_size).astype(
            np.int64)
        idx = pc.index_in(flat, value_set=uniq).to_numpy(
            zero_copy_only=False)
        toks = ids_u[idx]
        return batch.append_column(self.out_col, _rebuild_list(toks, lens))


class RemapTokens:
    """map_batches callable: ``tokens[i][j] = lut[tokens[i][j]]``.

    ``lut_ref`` is an ``ObjectRef`` to a dense int32 ndarray of length
    ``vocab_size`` (``ray.put`` once by :func:`remap_tokens`); ``ray.get``
    in a worker maps the SAME plasma buffer read-only — the table is
    broadcast per node, not copied per task or per batch. Out-of-range
    token ids raise (mapping must cover the vocab; no silent clamp).
    """

    def __init__(self, lut_ref, tokens_col: str = "tokens"):
        self.lut_ref = lut_ref
        self.tokens_col = tokens_col
        self._lut: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._lut is None:
            import ray

            self._lut = ray.get(self.lut_ref)
        col = batch.column(self.tokens_col)
        flat, lens = _flat_and_lens(col)
        if len(flat) and (flat.min() < 0 or flat.max() >= len(self._lut)):
            raise ValueError(
                f"remap_tokens: token id outside mapping "
                f"[0, {len(self._lut)})")
        mapped = self._lut[flat]
        i = batch.schema.get_field_index(self.tokens_col)
        return batch.set_column(i, self.tokens_col,
                                _rebuild_list(mapped, lens))


def remap_tokens(ds, mapping: np.ndarray, tokens_col: str = "tokens",
                 batch_size: int | None = 8192):
    """Rewrite the token column of ``ds`` through ``mapping`` (dense LUT,
    ``new_id = mapping[old_id]``). One ``ray.put`` broadcast; task-based
    map_batches (cheap state — repo convention reserves actor pools for
    expensive ``__init__``)."""
    import ray

    lut_ref = ray.put(np.ascontiguousarray(mapping, dtype=np.int32))
    return ds.map_batches(
        RemapTokens(lut_ref, tokens_col=tokens_col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    )
