"""Exact substring (duplicated-span) dedup — remove every repeated
character k-gram span except its globally-first occurrence.

The classic training-data op (Lee et al., "Deduplicating Training Data
Makes Language Models Better": ExactSubstr dedup at 50-char windows): a
position ``(doc, pos)`` is CUT when its k-char window occurs anywhere
else in the corpus at a smaller ``(doc_id, pos)``; per doc, overlapping
cut windows merge into spans, and the spans are removed.

Scale shape (the suffix-array of the paper is a single-machine
construct; this is the distributed reformulation):

1. **dup-hash discovery** — per block, a VECTORIZED rolling hash over
   every char position (prefix weighted sums mod 2^64, odd base, inverse
   powers via cumprod wraparound — no per-char Python), partial-counted
   per block (np.unique), then a ``(hash u64, n)`` groupby.  Only 8-byte
   rows cross this shuffle, one per DISTINCT in-block hash.
2. **candidate positions** — the dup-hash set (bounded by actual
   duplication) broadcasts via ray.put below ``dup_broadcast_rows``, else
   a distributed semi-join; a second scan re-hashes and emits
   ``(gram bytes, doc, pos)`` ONLY for positions whose hash is
   duplicated.  Hash collisions merely re-admit singleton grams — the
   next stage groups by the EXACT gram bytes, so collisions can never
   cut unique text (the repo's re-admission invariant).
3. **winner + cut spans** — group by exact gram: the smallest
   ``(doc_id, pos)`` survives, every other occurrence marks
   ``[pos, pos+k-1]`` for removal.  Driver-side lexsort+run-length pass
   below ``candidate_driver_rows`` (the minhash candidate pattern),
   ``groupby().map_groups`` above.
4. **interval merge per doc** — sort spans, vectorized sweep
   (new-group = start > running max end), ``reduceat`` min/max per
   merged span.

ASCII assumption: hashing and slicing operate on UTF-8 BYTES; the SQL
oracle's ``substr``/``len`` count codepoints.  They coincide on ASCII
corpora (the testdata is ASCII; a multi-byte corpus would need
codepoint-indexed slicing — documented, not silently wrong: offsets
into multi-byte text still cut on character boundaries only if k-byte
windows align, so ``require_ascii=True`` raises otherwise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_B = np.uint64(0x100000001B3)  # FNV-ish odd base; invertible mod 2^64
_INV_B = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _doc_bytes(texts_col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 byte array of all docs concatenated, per-doc lengths)."""
    if isinstance(texts_col, pa.ChunkedArray):
        texts_col = texts_col.combine_chunks()
    texts_col = pc.fill_null(texts_col, "")
    blob = "".join(texts_col.to_pylist()).encode("utf-8")
    lens = pc.binary_length(texts_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return np.frombuffer(blob, dtype=np.uint8), lens


def _rolling_hashes(b: np.ndarray, lens: np.ndarray, k: int
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(window hash u64, doc index, char pos within doc) for every
    position whose k-byte window lies inside one document.  All uint64
    arithmetic wraps mod 2^64 by construction."""
    total = int(lens.sum())
    if total < k:
        e = np.empty(0, np.int64)
        return np.empty(0, np.uint64), e, e
    bu = b.astype(np.uint64)
    n = len(bu)
    # B^i and B^-i via wrapping cumprod
    bpow = np.ones(n, dtype=np.uint64)
    bpow[1:] = _B
    np.cumprod(bpow, out=bpow)
    inv = np.ones(n, dtype=np.uint64)
    inv[1:] = _INV_B
    np.cumprod(inv, out=inv)
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(bu * bpow, out=prefix[1:])
    m = n - k + 1
    h = (prefix[k:k + m] - prefix[:m]) * inv[:m]

    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    valid = doc_of[:m] == doc_of[k - 1:k - 1 + m]
    idx = np.nonzero(valid)[0]
    d = doc_of[idx]
    return h[idx], d, idx - starts[d]


class _HashPartial:
    """Task-based map: per-block distinct (hash, count) partials.  The
    ASCII guard rides along here (no separate scan): byte-window hashing
    must match the oracle's codepoint semantics."""

    def __init__(self, text_col: str, k: int, require_ascii: bool = True):
        self.text_col = text_col
        self.k = k
        self.require_ascii = require_ascii

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.require_ascii:
            col = pc.fill_null(batch.column(self.text_col), "")
            if (pc.sum(pc.utf8_length(col)).as_py() or 0) != \
                    (pc.sum(pc.binary_length(col)).as_py() or 0):
                raise ValueError(
                    "substring_dedup_cuts: non-ASCII text; byte-window "
                    "hashing would diverge from codepoint semantics "
                    "(pass require_ascii=False to accept byte semantics)")
        b, lens = _doc_bytes(batch.column(self.text_col))
        h, _d, _p = _rolling_hashes(b, lens, self.k)
        uniq, counts = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq, pa.uint64()),
                         "n": pa.array(counts, pa.int64())})


class _DupPositions:
    """Second scan: (gram fixed-binary, doc_id, pos) for positions whose
    hash is in the duplicated set (lazy zero-copy ref get — task-based)."""

    def __init__(self, dup_ref, id_col: str, text_col: str, k: int):
        self.dup_ref = dup_ref
        self._dup = None
        self.id_col, self.text_col, self.k = id_col, text_col, k

    @property
    def dup(self) -> np.ndarray:
        if self._dup is None:
            self._dup = (ray.get(self.dup_ref)
                         if isinstance(self.dup_ref, ray.ObjectRef)
                         else self.dup_ref)
        return self._dup

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        b, lens = _doc_bytes(batch.column(self.text_col))
        h, d, p = _rolling_hashes(b, lens, k)
        hit = np.isin(h, self.dup, assume_unique=False)
        d, p = d[hit], p[hit]
        if not len(d):
            return pa.table({
                self.id_col: ids.slice(0, 0),
                "gram": pa.array([], pa.binary(k)),
                "pos": pa.array([], pa.int64()),
            })
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        flat_idx = starts[d] + p
        windows = b[flat_idx[:, None] + np.arange(k)]  # (hits, k) uint8
        grams = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(k), len(d), [None, pa.py_buffer(windows.tobytes())])
        return pa.table({
            self.id_col: ids.take(pa.array(d, pa.int64())),
            "gram": grams,
            "pos": pa.array(p, pa.int64()),
        })


def _cuts_from_sorted(doc: np.ndarray, pos: np.ndarray,
                      order_gram_breaks: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Rows sorted by (gram, doc, pos); ``order_gram_breaks`` marks the
    first row of each gram run.  Every non-first row is a cut."""
    keep = ~order_gram_breaks
    return doc[keep], pos[keep]


def _merged_span_rows(doc: np.ndarray, s: np.ndarray, k: int
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge per-doc overlapping [s, s+k-1] spans (inputs unsorted).
    Returns one row per MERGED span: (doc, ms, me) sorted by (doc, ms)."""
    if not len(doc):
        e = np.empty(0, np.int64)
        return e, e, e
    order = np.lexsort((s, doc))
    doc, s = doc[order], s[order]
    e = s + k - 1
    # running max end WITHIN each doc: new span when doc changes or the
    # start clears every earlier end seen in this doc
    new_doc = np.empty(len(doc), dtype=bool)
    new_doc[0] = True
    new_doc[1:] = doc[1:] != doc[:-1]
    # segmented running max: offset each doc's ends by a strictly
    # increasing per-doc base so cross-doc maxima can never leak, then
    # subtract the base back (ends < 2^40 — doc length bound)
    base = np.cumsum(new_doc.astype(np.int64)) * (1 << 40)
    run_max = np.maximum.accumulate(e + base) - base
    prev_max = np.empty(len(doc), dtype=np.int64)
    prev_max[0] = np.iinfo(np.int64).min
    prev_max[1:] = run_max[:-1]
    is_new = new_doc | (s > prev_max)
    first = np.nonzero(is_new)[0]
    return doc[first], s[first], np.maximum.reduceat(e, first)


def _merge_spans(doc: np.ndarray, s: np.ndarray, k: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc, n_spans, n_chars) per doc with >=1 cut (see
    :func:`_merged_span_rows`)."""
    gdoc, ms, me = _merged_span_rows(doc, s, k)
    if not len(gdoc):
        e = np.empty(0, np.int64)
        return e, e, e
    doc_breaks = np.empty(len(gdoc), dtype=bool)
    doc_breaks[0] = True
    doc_breaks[1:] = gdoc[1:] != gdoc[:-1]
    dfirst = np.nonzero(doc_breaks)[0]
    out_doc = gdoc[dfirst]
    n_spans = np.diff(np.concatenate((dfirst, [len(gdoc)])))
    n_chars = np.add.reduceat(me - ms + 1, dfirst)
    return out_doc, n_spans.astype(np.int64), n_chars.astype(np.int64)


def _cut_positions(
    ds,
    id_col: str,
    text_col: str,
    k: int,
    dup_broadcast_rows: int,
    candidate_driver_rows: int,
    require_ascii: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared pipeline: (doc, pos) of every cut occurrence (driver-side
    arrays, bounded by actual duplication — the size-gated hazard is the
    candidate volume, checked against ``candidate_driver_rows``)."""
    from .aggregate import count_sum

    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    counts = count_sum(
        ds.map_batches(_HashPartial(text_col, k, require_ascii),
                       batch_format="pyarrow", zero_copy_batch=True),
        keys=["h"], sum_cols={"n": "n"}, count_name="_blocks").materialize()

    def only_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n"), 2)).select(["h"])

    dups = counts.map_batches(only_dups, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    n_dups = dups.count()
    if n_dups == 0:
        return empty
    if n_dups > dup_broadcast_rows:
        raise ValueError(
            f"{n_dups} duplicated hashes exceed dup_broadcast_rows="
            f"{dup_broadcast_rows} (~{n_dups * 8 >> 20} MiB broadcast); "
            "raise the gate if the nodes have headroom — the array is "
            "one zero-copy plasma object per node")
    dup_arr = np.sort(np.concatenate([
        t.column("h").to_numpy(zero_copy_only=False)
        for t in ray.get(dups.to_arrow_refs()) if t.num_rows
    ]).astype(np.uint64))
    dup_ref = ray.put(dup_arr)

    cands = ds.map_batches(
        _DupPositions(dup_ref, id_col, text_col, k),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    n_cand = cands.count()
    if n_cand == 0:
        return empty
    if n_cand <= candidate_driver_rows:
        tbl = pa.concat_tables(ray.get(cands.to_arrow_refs()))
        gram = np.frombuffer(
            tbl.column("gram").combine_chunks().buffers()[1], dtype=f"S{k}")
        doc = tbl.column(id_col).to_numpy(zero_copy_only=False)
        pos = tbl.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc, gram))
        gram, doc, pos = gram[order], doc[order], pos[order]
        breaks = np.empty(len(gram), dtype=bool)
        breaks[0] = True
        breaks[1:] = gram[1:] != gram[:-1]
        cut_doc, cut_pos = _cuts_from_sorted(doc, pos, breaks)
    else:
        def group_cuts(g):
            import pandas as pd

            g = g.sort_values([id_col, "pos"], kind="mergesort")
            return pd.DataFrame({
                id_col: g[id_col].to_numpy()[1:],
                "pos": g["pos"].to_numpy()[1:],
            })
        cut = cands.groupby("gram").map_groups(
            group_cuts, batch_format="pandas").materialize()
        if cut.count() == 0:
            return empty
        ct = pa.concat_tables(
            [t for t in ray.get(cut.to_arrow_refs()) if t.num_rows])
        cut_doc = ct.column(id_col).to_numpy(zero_copy_only=False)
        cut_pos = ct.column("pos").to_numpy(zero_copy_only=False)
    return cut_doc.astype(np.int64), cut_pos.astype(np.int64)


def _check_id_type(ds, id_col: str):
    # best-effort: only when the schema is already known (plain reads /
    # materialized inputs) — never force execution for a type check
    # (the r4 lazy-input rule); a wrong type still fails loudly later
    # in the numpy sort, just with a worse message
    try:
        sch = ds.schema(fetch_if_missing=False)
    except Exception:
        return
    if sch is None or id_col not in sch.names:
        return
    t = sch.types[sch.names.index(id_col)]
    if not pa.types.is_integer(t):
        raise ValueError(
            f"substring_dedup: {id_col!r} must be an integer column "
            f"(got {t}); dictionary-encode string ids upstream — the "
            "winner ordering and span merge sort on the id")


def substring_dedup_cuts(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    dup_broadcast_rows: int = 100_000_000,
    candidate_driver_rows: int = 2_000_000,
    require_ascii: bool = True,
):
    """(id_col, n_spans_cut, n_chars_cut) per document that loses at
    least one merged duplicated span — SQL-oracle-exact (the windowed
    row_number/interval-merge query in pipelines/queries.py).

    ``dup_broadcast_rows`` gates the dup-hash set broadcast (u64 array
    via ray.put = ONE shared-memory copy per node — 100M hashes is
    800 MB, fine on a 128 GiB node; the explicit raise beyond it keeps
    the limit visible instead of OOMing a worker);
    ``candidate_driver_rows`` gates the driver-side winner pass vs the
    distributed ``groupby(gram)`` (both follow the repo's size-gate
    convention; tests pin gate=0 paths)."""
    import ray.data as rd

    _check_id_type(ds, id_col)
    cut_doc, cut_pos = _cut_positions(
        ds, id_col, text_col, k, dup_broadcast_rows,
        candidate_driver_rows, require_ascii)
    out_doc, n_spans, n_chars = _merge_spans(cut_doc, cut_pos, k)
    return rd.from_arrow(pa.table({
        id_col: pa.array(out_doc, pa.int64()),
        "n_spans_cut": pa.array(n_spans, pa.int64()),
        "n_chars_cut": pa.array(n_chars, pa.int64()),
    }))


class _ApplyCuts:
    """Remove merged spans from each doc's text (lazy span-table ref;
    task-based — the span table is bounded by docs-with-cuts)."""

    def __init__(self, spans_ref, id_col: str, text_col: str):
        self.spans_ref = spans_ref
        self._spans = None
        self.id_col, self.text_col = id_col, text_col

    @property
    def spans(self) -> dict:
        if self._spans is None:
            self._spans = (ray.get(self.spans_ref)
                           if isinstance(self.spans_ref, ray.ObjectRef)
                           else self.spans_ref)
        return self._spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out = []
        for d, t in zip(ids, texts):
            spans = self.spans.get(d)
            if not spans or t is None:
                out.append(t)
                continue
            kept = []
            prev = 0
            for s, e in spans:
                kept.append(t[prev:s])
                prev = e + 1
            kept.append(t[prev:])
            out.append("".join(kept))
        i = batch.column_names.index(self.text_col)
        return batch.set_column(i, self.text_col,
                                pa.array(out, pa.string()))


def substring_dedup_apply(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    dup_broadcast_rows: int = 100_000_000,
    candidate_driver_rows: int = 2_000_000,
    require_ascii: bool = True,
):
    """The REMOVAL form: same dataset with every merged duplicated span
    sliced out of ``text_col`` (docs without cuts pass through
    unchanged).  The span table broadcasts once via ray.put — bounded by
    docs that actually lose text, not the corpus."""
    _check_id_type(ds, id_col)
    cut_doc, cut_pos = _cut_positions(
        ds, id_col, text_col, k, dup_broadcast_rows,
        candidate_driver_rows, require_ascii)
    gdoc, ms, me = _merged_span_rows(cut_doc, cut_pos, k)
    spans: dict = {}
    for d, s, e in zip(gdoc.tolist(), ms.tolist(), me.tolist()):
        spans.setdefault(d, []).append((s, e))
    spans_ref = ray.put(spans)
    return ds.map_batches(
        _ApplyCuts(spans_ref, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True)
