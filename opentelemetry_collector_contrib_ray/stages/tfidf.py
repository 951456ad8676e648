"""Term statistics for keyword extraction / TF-IDF — a text-analysis
operator of the training-data-pipeline family (SURVEY LLM-ops; the same
shape as classic TF-IDF keyword extraction).

``top_terms_per_doc`` returns, per document, its top-k terms ranked by
``(tf DESC, term ASC)`` together with each term's corpus document
frequency — the exact integer core of TF-IDF (the caller multiplies
``tf * ln(N/df)`` if it wants the float score; keeping the operator
integer-valued makes it value-hash comparable against a SQL oracle with
no float-rounding hazard).

Scale design (100 TB):

- **tf + per-doc top-k are block-local**: every document lives in exactly
  one block, so term counting and the (tf DESC, term ASC) selection never
  leave the block — zero shuffle, one vectorized pass (pc.split_pattern →
  unique-gather vocab trick → structured np.unique counts → lexsort +
  reduceat rank).
- **df is vocab-bounded**: each block emits (term, n_docs_in_block)
  partials — EXACT distinct-doc counts because a doc is in one block —
  and the merge is size-gated: a driver-side pyarrow group_by below
  ``df_driver_gate`` partial rows, a Ray hash-shuffle groupby above (the
  same gate idiom as count_sum / the LSH prefilter).
- **df lookup is a bounded broadcast**: the merged (term, df) table is
  ``ray.put`` once and joined per block via index_in — terms in the
  top-k output are a subset of the df table by construction, so no
  fallback path is needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = " "


def _block_term_counts(t: pa.Table, id_col: str, text_col: str):
    """(doc_idx int64, term_code int64, tf int64, vocab StringArray) for
    one block — vectorized; empty terms (consecutive separators) dropped."""
    texts = t.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(pc.fill_null(texts, ""), _WS)
    flat = words.flatten()
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        keep = pa.array(nonempty)
        flat = flat.filter(keep)
        doc_idx = doc_idx[nonempty]
    vocab = pc.unique(flat)
    codes = pc.index_in(flat, value_set=vocab).to_numpy(
        zero_copy_only=False).astype(np.int64)
    pair = np.empty(len(codes), dtype=[("d", np.int64), ("c", np.int64)])
    pair["d"] = doc_idx
    pair["c"] = codes
    uniq, tf = np.unique(pair, return_counts=True)
    return uniq["d"], uniq["c"], tf.astype(np.int64), vocab


class _TfTopK:
    """Block-local: per-doc top-k (tf DESC, term ASC) term rows."""

    def __init__(self, id_col: str, text_col: str, k: int):
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        d, c, tf, vocab = _block_term_counts(t, self.id_col, self.text_col)
        if len(d) == 0:
            return pa.table({self.id_col: ids.slice(0, 0),
                             "term": pa.array([], vocab.type),
                             "tf": pa.array([], pa.int64())})
        # rank within doc under (tf DESC, term ASC): integer keys only —
        # the alphabetical rank of each vocab entry stands in for the
        # string itself (code-point order == UTF-8 byte order), so
        # np.lexsort never touches Python objects
        terms = vocab.take(pa.array(c, pa.int64()))
        alpha = pc.sort_indices(vocab).to_numpy(zero_copy_only=False)
        rank_of = np.empty(len(vocab), dtype=np.int64)
        rank_of[alpha] = np.arange(len(vocab), dtype=np.int64)
        order = np.lexsort((rank_of[c], -tf, d))
        d_s, tf_s = d[order], tf[order]
        term_s = terms.take(pa.array(order, pa.int64()))
        # per-doc positional rank along the sorted runs
        boundaries = np.flatnonzero(np.diff(d_s)) + 1
        starts = np.concatenate(([0], boundaries))
        run_start = np.repeat(
            starts, np.diff(np.concatenate((starts, [len(d_s)]))))
        rank = np.arange(len(d_s)) - run_start
        keep = rank < self.k
        return pa.table({
            self.id_col: ids.take(pa.array(d_s[keep], pa.int64())),
            "term": term_s.filter(pa.array(keep)),
            "tf": pa.array(tf_s[keep], pa.int64()),
        })


class _DfPartial:
    """Block-local (term, df) partials — exact because each doc is in
    exactly one block, so distinct-docs-per-term sums across blocks."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        _, c, _, vocab = _block_term_counts(t, self.id_col, self.text_col)
        if len(c) == 0:
            return pa.table({"term": pa.array([], vocab.type),
                             "df": pa.array([], pa.int64())})
        df = np.bincount(c, minlength=len(vocab)).astype(np.int64)
        return pa.table({"term": vocab, "df": pa.array(df, pa.int64())})


def document_frequency(ds, id_col: str = "doc_id", text_col: str = "text",
                       df_driver_gate: int = 5_000_000):
    """(term, df) over the corpus; size-gated merge (driver pyarrow
    group_by under the gate, hash-shuffle groupby above)."""
    partial = ds.map_batches(_DfPartial(id_col, text_col),
                             batch_format="pyarrow", zero_copy_batch=True)
    partial = partial.materialize()
    if partial.count() <= df_driver_gate:
        import ray

        tbl = pa.concat_tables(
            [t for t in ray.get(partial.to_arrow_refs()) if t.num_rows])
        merged = tbl.group_by("term").aggregate([("df", "sum")])
        return merged.rename_columns(["term", "df"])
    from ray.data.aggregate import Sum

    return partial.groupby("term").aggregate(Sum("df", alias_name="df"))


def top_terms_per_doc(ds, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 5, df_driver_gate: int = 5_000_000):
    """Per-doc top-k terms by (tf DESC, term ASC) + corpus df per term.

    Output columns: (id_col, term, tf, df) — all integers/strings, so the
    result is exactly SQL-comparable. ``tf * ln(N / df)`` on top of this
    is classic TF-IDF.
    """
    import ray
    import ray.data as rd

    df = document_frequency(ds, id_col, text_col, df_driver_gate)
    if isinstance(df, pa.Table):
        df_tbl = df
    else:
        df_tbl = pa.concat_tables(
            [t for t in ray.get(df.materialize().to_arrow_refs())
             if t.num_rows])
    # bounded broadcast: |vocab| rows (the token_frequency bound)
    df_ref = ray.put((df_tbl.column("term").combine_chunks(),
                      df_tbl.column("df").combine_chunks()))

    topk = ds.map_batches(_TfTopK(id_col, text_col, k),
                          batch_format="pyarrow", zero_copy_batch=True)

    def attach_df(t: pa.Table) -> pa.Table:
        terms, dfs = ray.get(df_ref)
        idx = pc.index_in(t.column("term"), value_set=terms)
        # every output term exists in the df table by construction
        return t.append_column("df", pc.take(dfs, idx))

    return topk.map_batches(attach_df, batch_format="pyarrow",
                            zero_copy_batch=True)
