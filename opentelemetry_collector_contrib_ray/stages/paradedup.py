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
    from .blocks import nonempty_blocks, rightsize_blocks

    exploded = ds.map_batches(ExplodeSegments(id_col, text_col, sep),
                              batch_format="pyarrow", zero_copy_batch=True)
    winners = best_per_group(
        exploded, keys=["seg"],
        order_by=[(id_col, "ascending"), ("pos", "ascending")])

    out_schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field(out_col, pa.string()),
        pa.field("n_kept", pa.int64()),
    ])

    sorted_ds = nonempty_blocks(
        rightsize_blocks(winners).sort([id_col, "pos"]))
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
