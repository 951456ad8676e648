"""remotetapprocessor analog: rate-limited pass-through tap.

Reference semantics (processor/remotetapprocessor/processor.go +
internal/rate limiting, README): the processor passes ALL data through
unchanged while duplicating a rate-limited portion (default 1 message
per second) to attached inspection clients — a Unix ``tee`` with a
throttle.

Batch reformulation: wall-clock throttling has no meaning in a batch
engine, so the limiter runs on EVENT time — at most ``limit`` records
per time window (default 1 s, configurable), chosen deterministically
(first ``limit`` in ``order_cols`` order) so the tap is reproducible
under any partitioning. The main stream is returned untouched; the tap
is a side output, exactly the reference's topology.

Distributed shape: the per-window first-N is :func:`topk_per_group`
(block-local rank filter, exchange bounded by windows × blocks × limit
rows) — no per-window pandas, no driver materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def remote_tap(
    ds,
    ts_col: str,
    order_cols: list[str],
    limit: int = 1,
    window_us: int = 1_000_000,
    sec_col: str = "tap_window",
):
    """Return ``(passthrough, tapped)``: the input unchanged plus at most
    ``limit`` rows per event-time window of ``window_us`` microseconds.

    ``ts_col`` may be timestamp[*] (cast to int64 µs) or int64 µs.
    ``order_cols`` break ties deterministically (the reference taps
    whatever arrives first; a batch engine must pick an explicit order).
    """
    from .aggregate import topk_per_group

    if limit <= 0:
        raise ValueError("limit must be positive")
    w = int(window_us)

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64())
        # integer truncating divide == floor for the positive epoch-µs
        # domain (matches DuckDB // in the oracle)
        win = pc.multiply(pc.divide(us, w), w)
        return batch.append_column(sec_col, win)

    windowed = ds.map_batches(add_window, batch_format="pyarrow",
                              zero_copy_batch=True)
    tapped = topk_per_group(
        windowed, keys=[sec_col], k=limit,
        order_by=[(c, "ascending") for c in order_cols],
    )
    return ds, tapped
