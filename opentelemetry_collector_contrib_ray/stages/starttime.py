"""metricstarttimeprocessor: set start timestamps for cumulative streams.

Re-expresses processor/metricstarttimeprocessor (reference
internal/truereset/adjuster.go:181-212 and
internal/subtractinitial/adjuster.go:198-239, reset predicate
internal/datapointstorage/timeseries_map.go:233-239) over the flat
column model:

- ``true_reset_point``: the first point of a series gets
  ``start = its own timestamp``; every later point reuses the series'
  current reference start; a RESET (value strictly decreases vs the
  previous point) re-anchors the reference start at
  ``reset timestamp - 1ms`` (reference adjuster.go:202-207). Values
  are never modified, no points are dropped.
- ``subtract_initial_point``: the first point of a series is DROPPED
  and becomes the reference; later points report
  ``value - reference_value`` with ``start = reference timestamp``;
  a reset point is kept with its RAW value, ``start = its timestamp
  - 1ms``, and zeroes the reference value for the rest of its segment
  (reference subtractinitial/adjuster.go:225-237).

Both strategies are one segmentation problem over (series, time)-sorted
data: anchor rows = series firsts ∪ resets; every row inherits its most
recent anchor's (start, reference) state. Implemented with the same
skew-PROOF sorted-scan used by delta_to_cumulative_sorted
(stages/window.py): distributed sort → block-local vectorized anchor
scan → O(blocks) driver carry chain → per-block fix-up pass. Task size
is bounded by BLOCK size for any key distribution; only tiny summary
tuples reach the driver.

Values run through integer cents (``round(v*100)`` int64) so both the
reset comparison and the subtracted outputs are float-order-proof and
oracle-checkable; timestamps compare and emit as int64 microseconds
(the 1 ms reference backoff = 1000 µs).

100-TB shape: one range-partitioning sort on (keys, order); pass1/pass2
are embarrassingly parallel over blocks; the driver sees O(blocks)
summaries. No groupby, no broadcast, no per-group pandas.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .window import _segment_bounds

TRUE_RESET = "true_reset_point"
SUBTRACT_INITIAL = "subtract_initial_point"


def metric_start_time(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str,
    value_col: str,
    strategy: str = TRUE_RESET,
    reset_backoff_us: int = 1000,
    start_col: str = "start_us",
    out_value_col: str = "adj_cents",
    as_cents: bool = True,
    target_rows: int = 262_144,
    first_start_us: int | None = None,
):
    """Stamp cumulative-stream start timestamps (and, for
    ``subtract_initial_point``, rebase values) per series.

    ``ts_col`` may be timestamp[*] or int64; starts are emitted as int64
    microseconds in ``start_col``. ``reset_backoff_us`` is the reference's
    1 ms reset re-anchor offset expressed in the emitted unit.
    """
    if strategy not in (TRUE_RESET, SUBTRACT_INITIAL):
        raise ValueError(f"unknown strategy {strategy!r}")
    subtract = strategy == SUBTRACT_INITIAL
    if first_start_us is not None and subtract:
        raise ValueError("first_start_us is only meaningful for "
                         "true_reset_point (start_time_metric strategy)")

    import ray

    from .blocks import nonempty_blocks, rightsize_blocks

    sized = rightsize_blocks(ds, target_rows=target_rows)
    sorted_ds = nonempty_blocks(sized.sort(key_cols + order_cols))
    refs = sorted_ds.to_arrow_refs()
    if not refs or sorted_ds.count() == 0:
        # schema-stable empty output (ADVICE r4: empty paths must match
        # the populated path's schema for unions/joins downstream);
        # counts here are metadata-only — everything is materialized
        import ray.data as rd

        base = sized.schema()
        fields = list(zip(base.names, base.types))
        fields.append((start_col, pa.int64()))
        if subtract:
            fields.append((out_value_col, pa.int64()))
        empty = pa.table({n: pa.array([], t) for n, t in fields})
        return rd.from_arrow(empty)

    backoff = int(reset_backoff_us)

    @ray.remote(num_returns=2)
    def pass1(tbl: pa.Table):
        n = tbl.num_rows
        starts = _segment_bounds(tbl, key_cols)
        tcol = tbl.column(ts_col)
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        t_us = tcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        vcol = tbl.column(value_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        raw = vcol.to_numpy(zero_copy_only=False)
        cents = (np.rint(raw * 100).astype(np.int64) if as_cents
                 else raw.astype(np.int64))

        reset = np.zeros(n, dtype=bool)
        reset[1:] = ~starts[1:] & (cents[1:] < cents[:-1])
        anchor = starts | reset
        a_idx = np.nonzero(anchor)[0]
        aseg = np.cumsum(anchor) - 1
        # series-first anchors keep their own ts (or, for the
        # start_time_metric strategy, the batch-resolved constant);
        # reset anchors back off
        first_anchor_ts = (t_us[a_idx] if first_start_us is None
                           else np.int64(first_start_us))
        anchor_start = np.where(starts[a_idx], first_anchor_ts,
                                t_us[a_idx] - backoff)
        start = anchor_start[aseg]

        out = tbl.append_column(start_col, pa.array(start, pa.int64()))
        if subtract:
            anchor_ref = np.where(starts[a_idx], cents[a_idx], 0)
            ref = anchor_ref[aseg]
            out = out.append_column(out_value_col,
                                    pa.array(cents - ref, pa.int64()))
            out = out.append_column("__mst_cents",
                                    pa.array(cents, pa.int64()))
            out = out.append_column("__mst_drop", pa.array(starts))

        first_key = tuple(tbl.column(k)[0].as_py() for k in key_cols)
        last_key = tuple(tbl.column(k)[-1].as_py() for k in key_cols)
        ge1 = a_idx[a_idx >= 1]
        first_anchor1 = int(ge1[0]) if len(ge1) else n
        summary = (
            first_key, last_key, int(t_us[0]), int(cents[0]),
            int(cents[-1]), int(start[-1]),
            int(ref[-1]) if subtract else 0,
            len(ge1), first_anchor1,
        )
        return out, summary

    pairs = [pass1.remote(r) for r in refs]
    summaries = ray.get([s for _, s in pairs])

    @ray.remote
    def fixup(tbl: pa.Table, prefix: int, new_start, new_ref, undrop0: bool):
        """Rewrite rows [0, prefix) that continue the previous block's
        trailing anchor segment, then finalize (drop helpers / filter)."""
        if new_start is not None:
            i = tbl.column_names.index(start_col)
            col = tbl.column(start_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s = col.to_numpy(zero_copy_only=False).copy()
            s[:prefix] = new_start
            tbl = tbl.set_column(i, start_col, pa.array(s, pa.int64()))
        if not subtract:
            return tbl
        if new_start is not None:
            cents = tbl.column("__mst_cents")
            if isinstance(cents, pa.ChunkedArray):
                cents = cents.combine_chunks()
            c = cents.to_numpy(zero_copy_only=False)
            j = tbl.column_names.index(out_value_col)
            adj = tbl.column(out_value_col)
            if isinstance(adj, pa.ChunkedArray):
                adj = adj.combine_chunks()
            a = adj.to_numpy(zero_copy_only=False).copy()
            a[:prefix] = c[:prefix] - new_ref
            tbl = tbl.set_column(j, out_value_col, pa.array(a, pa.int64()))
        drop = tbl.column("__mst_drop")
        if isinstance(drop, pa.ChunkedArray):
            drop = drop.combine_chunks()
        d = drop.to_numpy(zero_copy_only=False).copy()
        if undrop0 and len(d):
            d[0] = False
        tbl = tbl.drop_columns(["__mst_cents", "__mst_drop"])
        return tbl.filter(pa.array(~d))

    out_refs = []
    carry_start = None
    carry_ref = 0
    prev_last_key = None
    prev_last_cents = None
    for (tbl_ref, _), (first_key, last_key, t0, c0, c_last, trail_start,
                       trail_ref, n_ge1, first_a1) in zip(pairs, summaries):
        cont = prev_last_key is not None and prev_last_key == first_key
        if cont:
            if c0 < prev_last_cents:
                # boundary reset: re-anchor at t0 - backoff, raw values
                fix_start, fix_ref = t0 - backoff, 0
            else:
                fix_start, fix_ref = carry_start, carry_ref
            out_refs.append(fixup.remote(tbl_ref, first_a1, fix_start,
                                         fix_ref, True))
            eff_start0, eff_ref0 = fix_start, fix_ref
        else:
            if subtract:
                out_refs.append(fixup.remote(tbl_ref, 0, None, None, False))
            else:
                out_refs.append(tbl_ref)
            eff_start0 = t0 if first_start_us is None else first_start_us
            eff_ref0 = c0
        if n_ge1 == 0:
            carry_start, carry_ref = eff_start0, eff_ref0
        else:
            carry_start, carry_ref = trail_start, trail_ref
        prev_last_key, prev_last_cents = last_key, c_last

    import ray.data as rd

    return rd.from_arrow_refs(out_refs)


START_TIME_METRIC = "start_time_metric"


def start_time_from_metric(
    ds,
    name_col: str,
    pattern: str,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str,
    value_col: str,
    fallback_us: int = 0,
    value_scale: float = 1_000_000.0,
    reset_backoff_us: int = 1000,
    start_col: str = "start_us",
    target_rows: int = 262_144,
):
    """``start_time_metric`` strategy (reference
    internal/starttimemetric/adjuster.go:58-96): resolve ONE start time
    from the batch — the value of the metric whose name matches
    ``pattern`` (reference default ``process_start_time_seconds``;
    seconds float → timestamp, here ``value * value_scale`` → µs) — then
    stamp every OTHER series' first point with it; resets re-anchor at
    ``point ts - 1ms`` exactly as in true_reset_point. Falls back to
    ``fallback_us`` (the reference's approximate collector start) when no
    metric matches.

    Deterministic resolve: the matching row that is first in
    ``order_cols`` order. The input is materialized ONCE (the same
    rightsize barrier the sorted-scan needs), so the resolve pass reads
    cached blocks — no upstream re-execution. The start-time metric's own
    rows are excluded from the output (they play the reference's Gauge
    role, which the adjuster skips)."""
    import ray
    import pyarrow.compute as pc

    from .blocks import rightsize_blocks

    mat = rightsize_blocks(ds, target_rows=target_rows)
    refs = mat.to_arrow_refs()

    keep_cols = list(order_cols) + [value_col]

    @ray.remote
    def first_match(tbl: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(tbl.column(name_col), pattern)
        sub = tbl.filter(m).select(keep_cols)
        if sub.num_rows == 0:
            return sub
        return sub.sort_by([(c, "ascending") for c in order_cols]).slice(0, 1)

    partials = [t for t in ray.get([first_match.remote(r) for r in refs])
                if t.num_rows]
    if partials:
        head = pa.concat_tables(partials).sort_by(
            [(c, "ascending") for c in order_cols]).slice(0, 1)
        resolved = int(round(head.column(value_col)[0].as_py() * value_scale))
    else:
        resolved = int(fallback_us)

    def drop_matches(tbl: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(tbl.column(name_col), pattern)
        return tbl.filter(pc.invert(m))

    rest = mat.map_batches(drop_matches, batch_format="pyarrow",
                           zero_copy_batch=True)
    return metric_start_time(
        rest, key_cols=key_cols, order_cols=order_cols, ts_col=ts_col,
        value_col=value_col, strategy=TRUE_RESET,
        reset_backoff_us=reset_backoff_us, start_col=start_col,
        target_rows=target_rows, first_start_us=resolved)
