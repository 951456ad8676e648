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


class _BigramPartial:
    """Per-block (t1, t2, cnt) bigram partials over the tokens payload —
    the count-based-LM / tokenizer-merge statistics primitive. Within-doc
    adjacent pairs only (doc boundaries masked); pairs pack into one
    int64 (t1<<32 | t2; ids are nonnegative and < 2^31) so ONE structured
    ``np.unique`` counts the block. Shuffle is bounded by distinct
    bigrams × blocks, never token count."""

    def __init__(self, tokens_col: str):
        self.tokens_col = tokens_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        out_schema = pa.schema([("t1", pa.int64()), ("t2", pa.int64()),
                                ("cnt", pa.int64())])
        if len(flat) < 2:
            return out_schema.empty_table()
        doc_of = np.repeat(np.arange(len(lens)), lens)
        same = doc_of[:-1] == doc_of[1:]
        packed = (flat[:-1] << np.int64(32)) | flat[1:]
        u, c = np.unique(packed[same], return_counts=True)
        return pa.table({
            "t1": pa.array(u >> np.int64(32), pa.int64()),
            "t2": pa.array(u & np.int64(0xFFFFFFFF), pa.int64()),
            "cnt": pa.array(c.astype(np.int64), pa.int64()),
        })


def token_bigram_counts(ds, tokens_col: str = "tokens",
                        top_k: int | None = None):
    """(t1, t2, n) global within-doc bigram counts; optionally the top_k
    by (count desc, t1, t2) — deterministic boundary ties."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _BigramPartial(tokens_col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    totals = partials.groupby(["t1", "t2"]).aggregate(
        Sum("cnt", alias_name="n"))
    if top_k is None:
        return totals
    return totals.sort(["n", "t1", "t2"],
                       descending=[True, False, False]).limit(top_k)


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


class _RarityScore:
    """Second-pass scorer: gather each token's corpus frequency RANK from
    a broadcast LUT, emit per-doc (n_tok, rank_sum, rank_max). Zero-copy
    plasma read of the LUT per task; vectorized segment reduceat."""

    def __init__(self, lut_ref, tokens_col: str, id_cols: list[str]):
        self.lut_ref = lut_ref
        self.tokens_col = tokens_col
        self.id_cols = id_cols
        self._lut: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._lut is None:
            import ray

            self._lut = ray.get(self.lut_ref)
        col = batch.column(self.tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends = off[:-1], off[1:]
        lens = ends - starts
        ranks = self._lut[flat]
        n = len(lens)
        rank_sum = np.zeros(n, dtype=np.int64)
        rank_max = np.zeros(n, dtype=np.int64)
        nz = lens > 0  # reduceat cannot express empty segments
        if nz.any():
            s = starts[nz]
            rank_sum[nz] = np.add.reduceat(ranks, s)
            rank_max[nz] = np.maximum.reduceat(ranks, s)
        cols = {c: batch.column(c) for c in self.id_cols}
        cols["n_tok"] = pa.array(lens.astype(np.int32), pa.int32())
        cols["rank_sum"] = pa.array(rank_sum, pa.int64())
        cols["rank_max"] = pa.array(rank_max, pa.int64())
        return pa.table(cols)


def token_rarity(ds, tokens_col: str = "tokens",
                 id_cols: list[str] | None = None,
                 vocab_size: int = 65536):
    """Per-document token-rarity stats — the integer-exact quality signal
    (rare-token-heavy docs score high; boilerplate scores low).

    Rank = position of the token in the corpus frequency table ordered by
    (count DESC, token ASC) — 1 is the most common token; deterministic,
    integer, so the DuckDB row_number() oracle reproduces it bit-exactly
    (a float log-prob would drift in the last ulp across libms).

    Two STREAMING passes, the CCNet-style shape: pass 1 is the distributed
    bincount (shuffle bounded by |vocab| rows per block); its ≤ vocab_size
    totals come to the driver (bounded: one int64 pair per vocab entry),
    become a dense rank LUT, and broadcast once via ray.put; pass 2
    re-scans the input gathering ranks — no full-dataset materialization
    at any point. Docs holding a token the frequency pass never saw can
    only occur if ``ds`` changes between passes — ranked 0, caller-visible.
    """
    import ray

    id_cols = list(id_cols or ["doc_id"])
    totals = token_frequency(ds, tokens_col=tokens_col,
                             vocab_size=vocab_size).materialize()
    t = pa.concat_tables(
        [b for b in ray.get(totals.to_arrow_refs()) if b.num_rows])
    tok = t.column("token").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = t.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((tok, -cnt))  # count desc, token asc
    lut = np.zeros(vocab_size, dtype=np.int64)
    lut[tok[order]] = np.arange(1, len(tok) + 1, dtype=np.int64)
    lut_ref = ray.put(lut)
    return ds.map_batches(
        _RarityScore(lut_ref, tokens_col, id_cols),
        batch_format="pyarrow", zero_copy_batch=True,
    )


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
        # Greedy in-order packing never defers a doc, so the examples are
        # exactly the concatenated token stream CUT at max_len boundaries —
        # the whole op is a handful of numpy kernels (VERDICT r4 #6: the
        # per-doc Python loop was only a constant factor, but a large one):
        # - values = the flat stream, UNCOPIED;
        # - a doc with tokens is counted in the example holding its LAST
        #   token: (end-1) // max_len (a doc ending exactly on a boundary
        #   lands in the example it filled — same formula);
        # - a zero-length doc is counted in the example where its (empty)
        #   position falls: start // max_len, dropped when that position
        #   is past the last emitted example (matching the loop's
        #   nothing-to-flush tail behavior).
        col = batch.column(self.tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))

        max_len = self.max_len
        total = int(len(flat))
        n_ex = -(-total // max_len) if total else 0

        ends = np.cumsum(lens)
        starts = ends - lens
        nz = lens > 0
        idx_full = (ends[nz] - 1) // max_len
        idx_zero = starts[~nz] // max_len
        idx_zero = idx_zero[idx_zero < n_ex]
        n_docs = (np.bincount(idx_full, minlength=n_ex)
                  + np.bincount(idx_zero, minlength=n_ex)).astype(np.int32)

        tok_lens = np.full(n_ex, max_len, dtype=np.int32)
        if n_ex:
            tok_lens[-1] = total - (n_ex - 1) * max_len
        offsets = np.arange(0, n_ex + 1, dtype=np.int64) * max_len
        if n_ex:
            offsets[-1] = total
        return pa.table({
            "tokens": pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), pa.int32()),
                pa.array(flat.astype(np.int32, copy=False), pa.int32()),
            ),
            "n_tok": pa.array(tok_lens, pa.int32()),
            "n_docs": pa.array(n_docs, pa.int32()),
        })


def pack_sequences(ds, tokens_col: str = "tokens", max_len: int = 2048,
                   batch_size: int = 4096):
    return ds.map_batches(
        SequencePack(tokens_col=tokens_col, max_len=max_len),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    )


class _GramDocPairs:
    """Per-block combiner for repeated-n-gram detection: unique
    (doc, packed k-gram bytes) pairs with occurrence counts.

    One offset-aware flatten of the tokens column, one sliding window
    (zero-copy stride view), doc-boundary masking, and one structured
    ``np.unique`` — no per-row Python. The gram key is the EXACT packed
    little-endian int32 bytes (k×4 wide), not a hash, so the result is
    oracle-exact (no collision caveat); the k× byte inflation is paid only
    on the deduped pair rows, never the raw token stream.
    """

    def __init__(self, id_col: str, tokens_col: str, k: int):
        self.id_col = id_col
        self.tokens_col = tokens_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        col = batch.column(self.tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.ascontiguousarray(
            col.flatten().to_numpy(zero_copy_only=False).astype("<i4"))
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        n_docs = len(lens)
        total = len(flat)
        m = total - k + 1
        empty = pa.table({
            self.id_col: batch.column(self.id_col).slice(0, 0),
            "gram": pa.array([], pa.binary()),
            "occ": pa.array([], pa.int64()),
        })
        if m <= 0 or n_docs == 0:
            return empty
        win = np.lib.stride_tricks.sliding_window_view(flat, k)  # (m, k)
        doc_of = np.repeat(np.arange(n_docs), lens)
        valid = doc_of[:m] == doc_of[k - 1:]
        if not valid.any():
            return empty
        vwin = np.ascontiguousarray(win[valid])
        vdoc = doc_of[:m][valid]
        rec = np.empty(len(vdoc), dtype=[("d", np.int64),
                                         ("g", np.void, k * 4)])
        rec["d"] = vdoc
        rec["g"] = vwin.view(np.dtype((np.void, k * 4))).reshape(-1)
        uniq, counts = np.unique(rec, return_counts=True)
        gram_bytes = uniq["g"].tobytes()
        width = k * 4
        offs = pa.array(np.arange(0, (len(uniq) + 1) * width, width,
                                  dtype=np.int32))
        grams = pa.Array.from_buffers(
            pa.binary(), len(uniq),
            [None, offs.buffers()[1], pa.py_buffer(gram_bytes)])
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self.id_col: ids.take(pa.array(uniq["d"], pa.int64())),
            "gram": grams,
            "occ": pa.array(counts.astype(np.int64), pa.int64()),
        })


def repeated_ngram_counts(ds, id_col: str = "doc_id",
                          tokens_col: str = "tokens", k: int = 8,
                          min_docs: int = 2):
    """Cross-document repeated token k-grams — the duplicated-span
    primitive of training-data dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", public): for every doc,
    how many of its k-gram occurrences belong to a gram seen in
    ≥ ``min_docs`` DISTINCT documents.

    Shape: per-block unique (doc, gram) pairs (docs never straddle rows,
    so pairs are globally unique without a merge) → the shared
    :func:`~..stages.neardup.prefilter_hot_groups` machinery finds grams
    with ≥ min_docs members (size-gated driver/shuffle count + semi-join)
    → one groupby(doc) sums the surviving occurrence counts. The shuffle
    carries deduped (doc, gram, occ) rows — bounded by unique pairs, with
    exact fixed-width binary gram keys.

    Returns (id_col, shared_grams) for docs with ≥1 shared-gram
    occurrence.
    """
    from ray.data.aggregate import Sum

    from .neardup import prefilter_hot_groups

    if k % 2:  # validate BEFORE any dataset work (ADVICE r3)
        raise ValueError("k must be even (gram bytes must be 8-aligned)")
    n_words = (k * 4) // 8

    pairs = ds.map_batches(
        _GramDocPairs(id_col, tokens_col, k),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def combine(t: pa.Table):
        from ..functions.hashing import FNV64_PRIME
        from .neardup import _binary_sig_matrix

        # offset-aware equal-width binary -> (n, n_words) int64, then an
        # FNV-style column fold (semi-join key encoding only; collisions
        # merely re-admit rows, the final groupby keys on doc)
        mat = _binary_sig_matrix(t.column("gram"), n_words).view(np.uint64)
        folded = np.zeros(len(mat), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for w in range(n_words):
                folded = folded * np.uint64(FNV64_PRIME) ^ mat[:, w]
        return folded.view(np.int64)

    hot = prefilter_hot_groups(pairs, ["gram"], combine, min_size=min_docs)
    if hot is None:
        import ray.data as _rd

        sch = pairs.schema()
        t = dict(zip(sch.names, sch.types))[id_col]
        return _rd.from_arrow(pa.table({
            id_col: pa.array([], t),
            "shared_grams": pa.array([], pa.int64()),
        }))
    # partial-merge instead of a hash-shuffle groupby: the survivor set is
    # bounded by hot pairs, and Ray's shuffle groupby costs ~1 s fixed at
    # small scale (r5 isolated profile: 1.1 s of the 2.9 s query); "auto"
    # gates on the materialized partial count, so huge survivor sets still
    # take the shuffle path
    from .aggregate import count_sum

    out = count_sum(hot, keys=[id_col], sum_cols={"occ": "shared_grams"},
                    final="auto")
    return out.select_columns([id_col, "shared_grams"])


class _WordGramDocPairs:
    """Word-k-gram sibling of :class:`_GramDocPairs` over a TEXT column —
    gram key = k words joined by US (0x1f). Everything is arrow/numpy:
    split_pattern, k shifted slices joined by ONE binary_join_element_wise
    pass, a doc-boundary mask, and a pyarrow group_by for per-pair
    occurrence counts. SQL-expressible (string_split + list slicing +
    array_to_string), so this variant carries the DuckDB oracle."""

    def __init__(self, id_col: str, text_col: str, k: int):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = self.k
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(pc.fill_null(text, ""), " ")
        lens = pc.list_value_length(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        words = split.flatten()
        total = len(words)
        m = total - k + 1
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if m <= 0:
            return pa.table({
                self.id_col: ids.slice(0, 0),
                "gram": pa.array([], pa.string()),
                "occ": pa.array([], pa.int64()),
            })
        slices = [words.slice(j, m) for j in range(k)]
        grams_all = pc.binary_join_element_wise(*slices, "\x1f")
        doc_of = np.repeat(np.arange(len(lens)), lens)
        valid = doc_of[:m] == doc_of[k - 1:]
        tbl = pa.table({
            self.id_col: ids.take(pa.array(doc_of[:m][valid], pa.int64())),
            "gram": grams_all.filter(pa.array(valid)),
        })
        g = tbl.group_by([self.id_col, "gram"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["occ" if n == "count_all" else n for n in g.column_names])


def repeated_word_ngram_counts(ds, id_col: str = "doc_id",
                               text_col: str = "text", k: int = 8,
                               min_docs: int = 2):
    """Word-gram variant of :func:`repeated_ngram_counts` (same shape,
    string gram keys, md5 unique-gather semi-join encoding) — the
    oracle-checkable face of the duplicated-span primitive."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_u64_col
    from .neardup import prefilter_hot_groups

    pairs = ds.map_batches(
        _WordGramDocPairs(id_col, text_col, k),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def combine(t: pa.Table):
        return md5_u64_col(t.column("gram")).view(np.int64)

    hot = prefilter_hot_groups(pairs, ["gram"], combine, min_size=min_docs)
    if hot is None:
        import ray.data as _rd

        sch = pairs.schema()
        t = dict(zip(sch.names, sch.types))[id_col]
        return _rd.from_arrow(pa.table({
            id_col: pa.array([], t),
            "shared_grams": pa.array([], pa.int64()),
        }))
    # partial-merge instead of a hash-shuffle groupby: the survivor set is
    # bounded by hot pairs, and Ray's shuffle groupby costs ~1 s fixed at
    # small scale (r5 isolated profile: 1.1 s of the 2.9 s query); "auto"
    # gates on the materialized partial count, so huge survivor sets still
    # take the shuffle path
    from .aggregate import count_sum

    out = count_sum(hot, keys=[id_col], sum_cols={"occ": "shared_grams"},
                    final="auto")
    return out.select_columns([id_col, "shared_grams"])
