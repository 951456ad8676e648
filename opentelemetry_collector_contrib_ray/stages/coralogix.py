"""coralogixprocessor: per-trace transaction attributes.

Reference semantics (processor/coralogixprocessor/internal/transactions/
transactions.go:17-100 + span_tree.go:18-78):

- Spans are grouped by trace id (the reference REQUIRES groupbytrace in
  front so each batch holds whole traces).
- The TRACE ROOT is the span with an empty parent span id; when several
  compete, the earliest start timestamp wins and the losers are demoted
  to orphans (span_tree.go:27-46). When no span has an empty parent, the
  earliest span overall becomes root (span_tree.go:50-64). Go breaks
  exact start-time ties by insertion/map order; we break them by span id
  so the result is deterministic under any partitioning (documented
  deviation — synthesize unique starts to sidestep it entirely).
- Walking the tree from the root (transactions.go:55-66): the root and
  every REACHABLE span of kind SERVER(2) / CONSUMER(5) start a new
  transaction — they get ``cgx.transaction = own name`` and
  ``cgx.transaction.root = true``; every other reachable span inherits
  its nearest transaction root's name. Spans the walk never reaches
  (children of demoted orphans, parents missing from the trace) get
  NEITHER attribute — nulls in the flat-column model.

Batch reformulation, skew-proof and loop-free: sort by (trace, span) so
traces are contiguous; every block processes its INTERIOR traces with a
fully vectorized kernel (dictionary-encoded parent resolution via
searchsorted + pointer-doubling propagation — O(n log depth), no
per-trace Python); rows of the ≤2 traces touching each block edge are
concatenated in ONE follow-up task and run through the same kernel.
Partitioning assumption: a single trace fits in a task (the reference
buffers whole traces in memory); the boundary task holds at most
2 × blocks traces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_KIND_SERVER = 2
SPAN_KIND_CONSUMER = 5


def _col(tbl: pa.Table, name: str):
    c = tbl.column(name)
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _txn_kernel(
    tbl: pa.Table,
    trace_col: str,
    span_col: str,
    parent_col: str,
    name_col: str,
    kind_col: str,
    start_col: str,
    txn_col: str,
    root_col: str,
    boundary_kinds: tuple[int, ...] = (SPAN_KIND_SERVER, SPAN_KIND_CONSUMER),
) -> pa.Table:
    """Vectorized transaction propagation over a table of WHOLE traces."""
    n = tbl.num_rows
    names = _col(tbl, name_col)
    if n == 0:
        return tbl.append_column(
            txn_col, pa.array([], names.type)
        ).append_column(root_col, pa.array([], pa.bool_()))

    tcode = pc.dictionary_encode(_col(tbl, trace_col)).indices
    tcode = pc.fill_null(tcode, 0).to_numpy(zero_copy_only=False).astype(np.int64)

    span = _col(tbl, span_col)
    parent = _col(tbl, parent_col).cast(span.type)
    pvalid = pc.is_valid(parent).to_numpy(zero_copy_only=False).copy()
    if pa.types.is_string(span.type) or pa.types.is_large_string(span.type):
        pvalid &= pc.not_equal(
            pc.fill_null(parent, ""), ""
        ).to_numpy(zero_copy_only=False)

    # one shared dictionary over span ∪ parent ids -> integer codes
    both = pc.dictionary_encode(
        pa.chunked_array([span, parent]).combine_chunks()
    ).indices
    codes = pc.fill_null(both, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    scode, pcode = codes[:n], codes[n:]
    width = int(codes.max()) + 2
    self_key = tcode * width + scode + 1  # +1 keeps 0 free as "no parent"
    par_key = np.where(pvalid, tcode * width + pcode + 1, 0)

    order = np.argsort(self_key, kind="stable")
    pos = np.searchsorted(self_key[order], par_key)
    pos_c = np.minimum(pos, n - 1)
    hit = self_key[order][pos_c] == par_key
    parent_row = np.where(pvalid & hit, order[pos_c], -1)

    start = _col(tbl, start_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    rowpos = np.arange(n)
    # per trace: empty-parent spans first, then start, then span order
    sel = np.lexsort((rowpos, start, pvalid.astype(np.int8), tcode))
    t_sorted = tcode[sel]
    firsts = np.ones(n, dtype=bool)
    firsts[1:] = t_sorted[1:] != t_sorted[:-1]
    root_rows = sel[firsts]
    is_root = np.zeros(n, dtype=bool)
    is_root[root_rows] = True

    kind = _col(tbl, kind_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    boundary = is_root | np.isin(kind, np.asarray(boundary_kinds, np.int64))

    # reachability: raw-parent pointer doubling, root = self-loop terminator
    p = parent_row.copy()
    p[root_rows] = root_rows
    for _ in range(64):
        nxt = np.where(p >= 0, p[np.maximum(p, 0)], -1)
        if np.array_equal(nxt, p):
            break
        p = nxt
    reachable = p >= 0

    # nearest boundary at-or-above: candidate pointer doubling
    g = np.where(boundary, rowpos, parent_row)
    for _ in range(64):
        g_at = g[np.maximum(g, 0)]
        nxt = np.where((g >= 0) & ~boundary[np.maximum(g, 0)], g_at, g)
        if np.array_equal(nxt, g):
            break
        g = nxt

    anchor = np.where(reachable & (g >= 0), g, -1)
    anchor_arr = pa.array(anchor, pa.int64())
    anchor_arr = pc.if_else(
        pc.greater_equal(anchor_arr, 0), anchor_arr, pa.scalar(None, pa.int64())
    )
    txn = pc.take(names, anchor_arr)
    root_mask = pa.array(reachable & boundary)
    root_arr = pc.if_else(root_mask, pa.scalar(True), pa.scalar(None, pa.bool_()))
    return tbl.append_column(txn_col, txn).append_column(root_col, root_arr)


def transaction_attributes(
    ds,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    name_col: str = "name",
    kind_col: str = "span_kind",
    start_col: str = "start_us",
    txn_col: str = "cgx_transaction",
    root_col: str = "cgx_transaction_root",
    target_rows: int = 262_144,
):
    """Stamp ``cgx.transaction`` / ``cgx.transaction.root`` per trace.

    Sorted-scan shape: ONE range-partitioning sort on (trace, span),
    block-local vectorized kernel over interior traces, one follow-up
    task for the ≤2 edge traces per block. Only table refs travel;
    nothing materializes on the driver.
    """
    import ray
    import ray.data as rd

    from .blocks import nonempty_blocks, rightsize_blocks

    kern_args = (trace_col, span_col, parent_col, name_col, kind_col,
                 start_col, txn_col, root_col)

    sized = rightsize_blocks(ds, target_rows=target_rows)
    sorted_ds = nonempty_blocks(sized.sort([trace_col, span_col]))
    refs = sorted_ds.to_arrow_refs()
    # count is metadata-only here (sorted_ds is materialized); all-empty
    # blocks survive nonempty_blocks as one 0-row block
    if not refs or sorted_ds.count() == 0:
        base = sized.schema()
        tbl = pa.table({n: pa.array([], t)
                        for n, t in zip(base.names, base.types)})
        return rd.from_arrow(_txn_kernel(tbl, *kern_args))

    @ray.remote(num_returns=2)
    def split_and_process(tbl: pa.Table):
        trace = _col(tbl, trace_col)
        first, last = trace[0], trace[-1]
        edge = pc.or_(pc.equal(trace, first), pc.equal(trace, last))
        interior = tbl.filter(pc.invert(edge))
        return _txn_kernel(interior, *kern_args), tbl.filter(edge)

    pairs = [split_and_process.remote(r) for r in refs]

    @ray.remote
    def process_edges(*tables):
        parts = [t for t in tables if t.num_rows]
        if not parts:
            return _txn_kernel(tables[0], *kern_args)
        return _txn_kernel(
            pa.concat_tables(parts, promote_options="default"), *kern_args)

    edge_ref = process_edges.remote(*[e for _, e in pairs])
    return rd.from_arrow_refs([i for i, _ in pairs] + [edge_ref])
