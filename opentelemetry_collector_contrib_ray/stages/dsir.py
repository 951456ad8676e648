"""DSIR-style data selection via hashed n-gram importance resampling.

Public method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): featurize every document as hashed word uni+bi-
gram counts over ``n_buckets``, fit bucket distributions p (target
corpus) and q (raw corpus) with Laplace smoothing, weight each raw doc by
its log-likelihood ratio  w(x) = Σ_grams [ln p_b − ln q_b], and keep the
top-weighted docs. Beyond the reference — the domain-matching selector of
a training-data pipeline.

Scale shape: ONE streaming pass to fold q (per-block ``np.bincount``
partials, each bounded by ``n_buckets`` int64s regardless of block text
size; driver merge is buckets-bounded), one driver ``log`` over the
bucket LUT (quantized to int64 decimillinats so scoring is exact-integer
and partition-invariant), one broadcast of the LUT via ``ray.put``, and
ONE scoring pass (vocabulary-trick hashing: md5 once per DISTINCT gram,
gather by code). Selection is a lean (id, weight) sort+limit. The target
corpus is driver-resident by assumption (it is the small side — a quality
reference set, not the 100-TB raw corpus).

No SQL oracle: the LUT is a float ``ln`` fit (libm-dependent last-ulp),
the perplexity_filter precedent — determinism, numpy-reference parity
and ordering invariants are pinned in tests/test_dsir.py instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_SEP = "\x1f"
_QUANT = 10_000  # decimillinats — integer weights, exact accumulation


def _gram_stream(texts, n_buckets: int):
    """(doc_index int64[], bucket int64[]) for the word uni+bigram stream
    of a string column — one vectorized split, adjacency by offsets, md5
    once per DISTINCT gram (md5_u64_col's built-in unique gather)."""
    from ..functions.hashing import md5_u64_col

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parts = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
    lens = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
    flat = parts.flatten()
    doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    streams_doc = [doc]
    streams_gram = [flat]
    if len(flat) > 1:
        adj = doc[1:] == doc[:-1]
        if adj.any():
            m = pa.array(adj)
            left = flat.slice(0, len(flat) - 1).filter(m)
            right = flat.slice(1).filter(m)
            streams_gram.append(
                pc.binary_join_element_wise(left, right, _SEP))
            streams_doc.append(doc[:-1][adj])
    grams = pa.concat_arrays(
        [g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
         for g in streams_gram])
    h = md5_u64_col(grams) % np.uint64(n_buckets)
    return np.concatenate(streams_doc), h.astype(np.int64)


def fit_target_counts(target_texts, n_buckets: int = 65_536) -> np.ndarray:
    """Bucket counts of the (small, driver-resident) target corpus."""
    _, b = _gram_stream(target_texts, n_buckets)
    return np.bincount(b, minlength=n_buckets).astype(np.int64)


class _BucketCounts:
    """map_batches callable: per-block q partial — one bincount row set
    (bucket, n), bounded by n_buckets per block."""

    def __init__(self, text_col: str, n_buckets: int):
        self.text_col = text_col
        self.n_buckets = n_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        _, b = _gram_stream(t.column(self.text_col), self.n_buckets)
        cnt = np.bincount(b, minlength=self.n_buckets)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})


class _Score:
    """map_batches callable: (id, text) -> (id, weight, n_grams) using
    the broadcast int64 LUT (lazy plasma get — cheap-state task rule)."""

    def __init__(self, lut_ref, id_col: str, text_col: str,
                 n_buckets: int):
        self.lut_ref = lut_ref
        self._lut = None
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = n_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._lut is None:
            self._lut = (ray.get(self.lut_ref)
                         if isinstance(self.lut_ref, ray.ObjectRef)
                         else self.lut_ref)
        n = t.num_rows
        w = np.zeros(n, dtype=np.int64)
        g = np.zeros(n, dtype=np.int64)
        if n:
            doc, b = _gram_stream(t.column(self.text_col), self.n_buckets)
            if len(doc):
                np.add.at(w, doc, self._lut[b])
                g = np.bincount(doc, minlength=n).astype(np.int64)
        return pa.table({
            self.id_col: t.column(self.id_col),
            "weight": pa.array(w),
            "n_grams": pa.array(g),
        })


def dsir_weights(ds, target_texts, id_col: str = "doc_id",
                 text_col: str = "text", n_buckets: int = 65_536):
    """(id, weight, n_grams) per raw doc — weight is the int64
    decimillinat log-likelihood ratio Σ[ln p̂_b − ln q̂_b] of the doc's
    hashed uni+bigram buckets (Laplace-smoothed; LUT quantized once on
    the driver so accumulation is exact integer and partition order
    can't change results)."""
    cnt_p = fit_target_counts(target_texts, n_buckets)
    parts = ds.map_batches(_BucketCounts(text_col, n_buckets),
                           batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    cnt_q = np.zeros(n_buckets, dtype=np.int64)
    for tbl in ray.get(parts.to_arrow_refs()):
        if tbl.num_rows:
            cnt_q[tbl.column("bucket").to_numpy(zero_copy_only=False)] += \
                tbl.column("n").to_numpy(zero_copy_only=False)
    lut = np.rint(_QUANT * (
        np.log((cnt_p + 1.0) / (cnt_p.sum() + n_buckets))
        - np.log((cnt_q + 1.0) / (cnt_q.sum() + n_buckets))
    )).astype(np.int64)
    return ds.map_batches(
        _Score(ray.put(lut), id_col, text_col, n_buckets),
        batch_format="pyarrow", zero_copy_batch=True)


def dsir_select(ds, target_texts, k: int, id_col: str = "doc_id",
                text_col: str = "text", n_buckets: int = 65_536):
    """Top-k raw docs by DSIR weight (desc), id asc tie-break — the
    selection step. Per-block top-k partials (≤ k lean rows per block)
    then one driver reduce over blocks × k rows; no global sort of the
    corpus."""
    import ray.data as rd

    scored = dsir_weights(ds, target_texts, id_col=id_col,
                          text_col=text_col, n_buckets=n_buckets)
    sort_spec = [("weight", "descending"), (id_col, "ascending")]

    def reduce_topk(t: pa.Table) -> pa.Table:
        return t.sort_by(sort_spec).slice(0, k)

    partial = scored.map_batches(reduce_topk, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    tables = [t for t in ray.get(partial.to_arrow_refs()) if t.num_rows]
    if not tables:
        return partial
    return rd.from_arrow(
        reduce_topk(pa.concat_tables(tables, promote_options="default")))
