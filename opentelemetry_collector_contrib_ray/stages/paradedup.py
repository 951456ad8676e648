"""Segment-level exact dedup with document reassembly — the
paragraph-dedup op of a training-data pipeline (split every document on a
separator, keep each distinct segment only at its FIRST corpus occurrence,
rebuild the cleaned documents). Real corpora split on "\\n\\n" or ". ";
the granularity is the caller's ``sep``.

Ray-Data-first, three bounded stages:

1. **explode** — one vectorized ``split_pattern`` + repeat per batch:
   (doc, 1-based pos, segment) rows; no Python loop over rows.
2. **first-occurrence argmin** — :func:`~.aggregate.best_per_group` keyed
   on the segment with lexicographic (doc, pos) ascending order: per-block
   partials bound the shuffle by DISTINCT segments x blocks, never total
   segment count. The winners ARE the kept occurrences — no join-back.
3. **reassembly** — distributed sort of the winners by (doc, pos), then a
   per-block run-join with an O(blocks) driver boundary carry (the
   sorted-scan template of window.sessionize_tag_sorted): segment strings
   of docs fully inside a block never leave their task; only the <=2
   boundary runs per block visit the driver.

Documents whose every segment lost (fully-duplicate docs) vanish from the
output — the dedup semantics; count survivors vs input to monitor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


class ExplodeSegments:
    """map_batches callable: (id, text) -> one row per segment."""

    def __init__(self, id_col: str, text_col: str, sep: str):
        self.id_col = id_col
        self.text_col = text_col
        self.sep = sep

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(col, pattern=self.sep)
        lens = np.diff(parts.offsets.to_numpy(zero_copy_only=False))
        idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens) + 1
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self.id_col: ids.take(pa.array(idx, pa.int64())),
            "pos": pa.array(pos, pa.int64()),
            "seg": parts.flatten(),
        })


def segment_dedup(ds, id_col: str, text_col: str, sep: str = "\n\n",
                  out_col: str = "text_clean"):
    """Corpus-wide first-occurrence segment dedup + reassembly.

    Returns (id_col, out_col, n_kept): the cleaned text (kept segments
    re-joined with ``sep`` in original order) per surviving document.
    ``id_col`` must be integer-typed (the boundary-carry tuples rebuild it
    as int64; hash string ids to int first — functions.hashing.md5_u64).
    """
    from .aggregate import best_per_group

    exploded = ds.map_batches(ExplodeSegments(id_col, text_col, sep),
                              batch_format="pyarrow", zero_copy_batch=True)
    winners = best_per_group(
        exploded, keys=["seg"],
        order_by=[(id_col, "ascending"), ("pos", "ascending")])
    return _reassemble(winners, id_col, out_col, sep)


def _reassemble(kept, id_col: str, out_col: str, sep: str):
    """(id, pos, seg) rows -> (id, out_col, n_kept) docs: distributed
    sort by (doc, pos), per-block run-join, O(blocks) driver boundary
    carry (module docstring stage 3). Shared by segment_dedup and
    boilerplate_filter."""
    from .blocks import nonempty_blocks, rightsize_blocks

    out_schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field(out_col, pa.string()),
        pa.field("n_kept", pa.int64()),
    ])

    sorted_ds = nonempty_blocks(
        rightsize_blocks(kept).sort([id_col, "pos"]))
    if sorted_ds.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_returns=2)
    def block_runs(tbl: pa.Table):
        docs = tbl.column(id_col)
        if isinstance(docs, pa.ChunkedArray):
            docs = docs.combine_chunks()
        d = docs.to_numpy(zero_copy_only=False)
        segs = tbl.column("seg").to_pylist()
        starts = np.nonzero(np.concatenate(([True], d[1:] != d[:-1])))[0]
        bounds = np.concatenate((starts, [len(d)]))
        runs = [(int(d[starts[i]]), segs[bounds[i]:bounds[i + 1]])
                for i in range(len(starts))]
        first = (runs[0][0], sep.join(runs[0][1]), len(runs[0][1]))
        last = (runs[-1][0], sep.join(runs[-1][1]), len(runs[-1][1]))
        interior = runs[1:-1]
        tbl_out = pa.table({
            id_col: pa.array([r[0] for r in interior], pa.int64()),
            out_col: pa.array([sep.join(r[1]) for r in interior],
                              pa.string()),
            "n_kept": pa.array([len(r[1]) for r in interior], pa.int64()),
        })
        return tbl_out, (first, last, len(runs) == 1)

    pairs = [block_runs.remote(r) for r in refs]
    summaries = ray.get([s for _, s in pairs])

    finished: list[tuple] = []
    pending: tuple | None = None  # (doc, text, n)

    def merge(a, b):
        return (a[0], a[1] + sep + b[1], a[2] + b[2])

    for first, last, single in summaries:
        if single:
            if pending is not None and pending[0] == first[0]:
                pending = merge(pending, first)
            else:
                if pending is not None:
                    finished.append(pending)
                pending = first
            continue
        if pending is not None and pending[0] == first[0]:
            finished.append(merge(pending, first))
        else:
            if pending is not None:
                finished.append(pending)
            finished.append(first)
        pending = last
    if pending is not None:
        finished.append(pending)

    boundary = pa.table({
        id_col: pa.array([f[0] for f in finished], pa.int64()),
        out_col: pa.array([f[1] for f in finished], pa.string()),
        "n_kept": pa.array([f[2] for f in finished], pa.int64()),
    })
    interior_ds = rd.from_arrow_refs([t for t, _ in pairs])
    return interior_ds.union(rd.from_arrow(boundary))


class _DistinctDocCounts:
    """map_batches callable: exploded (doc, seg) rows -> per-block
    partial (seg-hash, ndocs). Distinct (doc, seg) pairs collapse via
    one lexsort + run mask (zero-loop; the decontaminate pair-dedup
    pattern); hashing the segment to md5_u64 bounds partial bytes at 16
    per distinct pair regardless of line length. Safe because a doc's
    exploded rows share its input block — cross-block double counting of
    a (doc, seg) pair is impossible for per-row fan-out."""

    def __init__(self, id_col: str):
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64_col

        if t.num_rows == 0:  # 0-row blocks break the run mask (r2 hazard)
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        h = md5_u64_col(t.column("seg"))
        d = t.column(self.id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((h, d))
        dh, hh = d[order], h[order]
        first = np.concatenate(
            ([True], (dh[1:] != dh[:-1]) | (hh[1:] != hh[:-1])))
        uniq, counts = np.unique(hh[first], return_counts=True)
        return pa.table({"h": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})


class _DropBoilerplate:
    """Filter exploded rows whose seg-hash is in the broadcast
    boilerplate set (sorted uint64 ndarray; lazy plasma get — the
    cheap-state task-map rule)."""

    def __init__(self, bp_ref):
        self.bp_ref = bp_ref
        self._bp = None

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64_col

        if self._bp is None:
            self._bp = (ray.get(self.bp_ref)
                        if isinstance(self.bp_ref, ray.ObjectRef)
                        else self.bp_ref)
        h = md5_u64_col(t.column("seg"))
        if len(self._bp) == 0:
            return t
        pos = np.searchsorted(self._bp, h)
        pos_c = np.minimum(pos, len(self._bp) - 1)
        keep = self._bp[pos_c] != h
        return t.filter(pa.array(keep))


def boilerplate_filter(ds, id_col: str, text_col: str, sep: str = "\n",
                       min_docs: int = 5, out_col: str = "text_clean",
                       gate: int = 5_000_000):
    """CCNet-style boilerplate removal (beyond the reference — the
    line-frequency filter of a training-data pipeline): drop every
    segment that appears in ``min_docs`` or more DISTINCT documents
    (navigation bars, cookie banners, footers), keep everything else in
    original order, reassemble the cleaned documents. Docs consisting
    entirely of boilerplate vanish (same survivor semantics as
    segment_dedup).

    Scale shape: per-block distinct-(doc, seg) partials hashed to 8-byte
    keys (bytes bounded regardless of line length). Below ``gate``
    partial rows the (hash, n) table merges on the driver and the
    boilerplate SET broadcasts via ray.put (frequent lines are few by
    nature); above it, one lean hash groupby-sum over (h, n) finds the
    frequent hashes and the verdict set still broadcasts — its size is
    bounded by corpus_distinct_lines / min_docs. md5_u64 collisions can
    only DROP extra rows at ~2^-64 per pair (same 8-byte-key basis the
    exact-dedup shuffle already accepts)."""
    exploded = ds.map_batches(ExplodeSegments(id_col, text_col, sep),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    parts = exploded.map_batches(_DistinctDocCounts(id_col),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    # materialized => metadata-only count (r4 gate rule)
    if parts.count() <= gate:
        merged = pa.concat_tables(
            [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows])
        h = merged.column("h").to_numpy(zero_copy_only=False)
        n = merged.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs, ns = h[order], n[order]
        starts = np.concatenate(([True], hs[1:] != hs[:-1]))
        totals = np.add.reduceat(ns, np.nonzero(starts)[0])
        bp = hs[starts][totals >= min_docs].astype(np.uint64)
    else:
        freq = parts.groupby("h").sum("n")

        def hot_only(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t.column("sum(n)"),
                                             min_docs))

        hot = freq.map_batches(hot_only, batch_format="pyarrow",
                               zero_copy_batch=True)
        tbl = pa.concat_tables(
            [t for t in ray.get(hot.materialize().to_arrow_refs())
             if t.num_rows])
        bp = np.sort(tbl.column("h").to_numpy(
            zero_copy_only=False).astype(np.uint64))
    kept = exploded.map_batches(_DropBoilerplate(ray.put(np.sort(bp))),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
    return _reassemble(kept, id_col, out_col, sep)
