"""Keyed ordered-stream transforms — delta↔cumulative / interval analogs.

Reference semantics:

- deltatocumulativeprocessor (processor.go:27-120): per metric stream
  identity, add each delta datapoint onto a running cumulative value.
- cumulativetodeltaprocessor (internal/tracking/tracker.go): per stream,
  emit value - previous_value.
- intervalprocessor (processor.go): keep the LAST datapoint per stream per
  interval window.

Batch reformulation (SURVEY.md §2.7): the stream key becomes a groupby key;
within each group, rows are sorted by time and the running state becomes a
cumulative sum / first difference — ``groupby(key).map_groups(sorted op)``.
Partitioning assumption: one group fits in one task's memory (metric
streams are short relative to block size; for pathological keys, split by
time range first).

Integer-cents variants are used by oracle-checked queries so float
accumulation order can never cause value-hash mismatches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def delta_to_cumulative(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum_value",
    as_cents: bool = True,
):
    """Running per-key cumulative sum in time order.

    ``as_cents`` converts the value to integer cents (round-half-even at 2
    decimals) before summing — exact integer arithmetic, reproducible by
    ``SUM(CAST(round(v*100, 0) AS BIGINT)) OVER (PARTITION BY k ORDER BY t)``.
    """

    def cumsum(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_cols, kind="mergesort")
        vals = group[value_col].to_numpy()
        if as_cents:
            cents = np.rint(vals * 100).astype(np.int64)
            group[out_col] = np.cumsum(cents)
        else:
            group[out_col] = np.cumsum(vals)
        return group

    return ds.groupby(key_cols).map_groups(cumsum, batch_format="pandas")


def cumulative_to_delta(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "delta_value",
):
    """Per-key first difference in time order; first row keeps its value
    (reference emits the first cumulative point as-is)."""

    def diff(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_cols, kind="mergesort")
        vals = group[value_col].to_numpy()
        out = np.empty_like(vals)
        out[0] = vals[0]
        out[1:] = vals[1:] - vals[:-1]
        group[out_col] = out
        return group

    return ds.groupby(key_cols).map_groups(diff, batch_format="pandas")


def sessionize(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    agg: str = "summary",
):
    """Session windows: per key, a new session starts when the gap between
    consecutive rows exceeds ``gap_seconds`` (the classic event-time session
    window; Ray Data has no watermarks, so windows close when the group is
    complete — SURVEY.md §1.3 / guide "Streaming-shaped workloads").

    ``agg="summary"`` emits one row per session: key_cols + session index +
    n_events + first/last of order_cols[;1]; ``agg="tag"`` keeps every row,
    adding a ``session_id`` column.
    """

    def windows(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        ts = group[ts_col]
        gaps = ts.diff().dt.total_seconds().fillna(0.0)
        session = (gaps > gap_seconds).cumsum()
        if agg == "tag":
            group["session_id"] = session
            return group
        out = group.groupby(session).agg(
            n_events=(order_cols[-1], "size"),
            first_ts=(ts_col, "min"),
            last_ts=(ts_col, "max"),
        ).reset_index(names="session_id")
        for k in key_cols:
            out[k] = group[k].iloc[0]
        return out[key_cols + ["session_id", "n_events", "first_ts", "last_ts"]]

    return ds.groupby(key_cols).map_groups(windows, batch_format="pandas")


def last_per_interval(
    ds,
    key_cols: list[str],
    order_cols: list[str],
    interval_col: str,
):
    """intervalprocessor: keep the last row per (key, interval window)."""

    def last(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_cols, kind="mergesort")
        return group.tail(1)

    return ds.groupby(key_cols + [interval_col]).map_groups(last, batch_format="pandas")
