"""grafanacloudconnector: host-info usage metric.

Reference semantics (connector/grafanacloudconnector/connector.go:71-90 +
host_metrics.go:15-55): for every resource, the FIRST of the configured
``host_identifiers`` attributes present provides the host name; the
connector keeps a distinct-host set and, each flush interval, emits one
gauge datapoint per host (``grafanacloud.host.info``, value 1).

Batch reformulation: flush wall-clock → event-time windows; the distinct
set is :func:`stages.dedup.exact_dedup` keyed on (window, host) — an
8-byte hash-key shuffle, the same scale shape as logdedup. COALESCE over
the identifier columns is the first-found rule.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def host_info(
    ds,
    identifier_cols: list[str],
    ts_col: str,
    flush_interval_us: int = 60_000_000,
    window_col: str = "flush_window",
    host_col: str = "host_id",
    value_col: str = "grafana_host_info",
):
    """One row per (flush window, distinct host): the host-info gauge.

    Rows where none of ``identifier_cols`` is present are skipped
    (connector.go: hosts are added only when an identifier attribute is
    found).
    """
    w = int(flush_interval_us)

    def derive(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64())
        win = pc.multiply(pc.divide(us, w), w)
        host = pc.coalesce(*[batch.column(c) for c in identifier_cols])
        out = pa.table({window_col: win, host_col: host})
        return out.filter(pc.is_valid(host))

    from .dedup import exact_dedup

    derived = ds.map_batches(derive, batch_format="pyarrow",
                             zero_copy_batch=True)
    distinct = exact_dedup(
        derived, key_cols=[window_col, host_col], order_col=window_col,
    ).select_columns([window_col, host_col])

    def stamp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            value_col, pa.array([1] * batch.num_rows, pa.int64()))

    return distinct.map_batches(stamp, batch_format="pyarrow",
                                zero_copy_batch=True)
