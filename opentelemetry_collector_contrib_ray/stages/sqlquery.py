"""sqlqueryreceiver analog: query-result rows → config-driven metric /
log rows — the row-to-telemetry mapping engine.

Parity with internal/sqlquery (metrics.go:16-124, row_scanner.go,
scraper.go:75-104, config.go) and
receiver/sqlqueryreceiver/logs_receiver.go:282-345:

- in the reference the rows come from a live SQL driver; here they
  come from ANY Ray Dataset (our engine's query results ARE tables).
  The driver stringifies every value (row_scanner.go:22-48 — ``%v``
  for scalars, RFC3339Nano for time.Time, ``%s`` for byte slices) and
  the metric layer re-parses; we keep the semantics without the
  round-trip: typed Arrow columns parse as their Go-stringified form
  would (an integral float64 ``4.0`` → ``"4"`` → Atoi 4; a fractional
  one fails value_type=int), string columns parse with strict strconv
  rules.  NULL cells are OMITTED from the row map
  (ErrNullValueWarning) — a NULL value_column behaves like a missing
  column.
- rowToMetric (metrics.go:16-67): ONE datapoint per (row, metric
  config), appended BEFORE validation — a missing/unparseable
  value_column still emits the datapoint with an EMPTY value (both
  value columns null here), static attrs then attribute_columns still
  attach (a missing attribute column is skipped with a partial
  error).  data_type gauge/sum (+monotonic), aggregation
  cumulative→temporality 2 / delta→1 / gauges 0; cumulative sums
  stamp start_ts, delta sums stamp ``ts − collection_interval``
  (setTimestamp, metrics.go:69-81).  ts_column/start_ts_column
  override the scrape clocks per row: a missing column keeps the
  default, an unparseable value sets the clock to the Go
  zero-on-error ``Timestamp(0)`` QUIRK (metrics.go:23-44 assigns the
  parse result unconditionally).
- rowToLog (logs_receiver.go:328-345): body_column string → body
  (missing = partial error, record still emitted with empty body),
  attribute_columns attach, observed timestamp = collect time.
- tracking_column incremental collection (logs_receiver.go:282-326)
  is the engine's lineage/run_job resume layer; the SQL transport and
  connection-string builder (scraper.go:113-173) are out of batch
  scope.

Execution: per-config vectorized column selection + one fan-out
concat; only the attrs-JSON build touches Python rows.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _go_stringify_cell(v):
    """row_scanner stringification for one already-decoded cell."""
    if v is None:
        return None  # NULL: omitted from the row map
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    return str(v)


def _strict_int(s: str):
    """strconv.Atoi."""
    if not isinstance(s, str) or not s or s.strip() != s or "_" in s:
        return None
    try:
        n = int(s, 10)
    except ValueError:
        return None
    return n if -(1 << 63) <= n < (1 << 63) else None


def _strict_float(s: str):
    if not isinstance(s, str) or not s or s.strip() != s or "_" in s:
        return None
    try:
        return float(s)
    except ValueError:
        return None


def _col_as_values(batch: pa.Table, col: str, value_type: str):
    """Parse a column per value_type with Go stringify→strconv
    semantics; returns a list of (python value | None)."""
    if col not in batch.column_names:
        return [None] * batch.num_rows
    arr = batch.column(col)
    t = arr.type
    if value_type == "int":
        if pa.types.is_integer(t):
            return arr.to_pylist()
        if pa.types.is_floating(t):
            # %v prints integral floats without ".0" -> Atoi succeeds
            vals = arr.to_pylist()
            return [int(v) if v is not None and v == int(v) else None
                    for v in vals]
        return [_strict_int(_go_stringify_cell(v))
                for v in arr.to_pylist()]
    # double
    if pa.types.is_floating(t):
        return arr.to_pylist()
    if pa.types.is_integer(t):
        return [None if v is None else float(v) for v in arr.to_pylist()]
    return [_strict_float(_go_stringify_cell(v))
            for v in arr.to_pylist()]


def _col_as_strings(batch: pa.Table, col: str):
    if col not in batch.column_names:
        return [None] * batch.num_rows
    return [_go_stringify_cell(v)
            for v in batch.column(col).to_pylist()]


def _ts_override(batch, col, default_ns):
    """ts_column semantics: missing column → default; NULL cell →
    default (missing from the row map); unparseable → 0 (quirk)."""
    if not col:
        return [default_ns] * batch.num_rows
    out = []
    for s in _col_as_strings(batch, col):
        if s is None:
            out.append(default_ns)
        else:
            v = _strict_int(s)
            out.append(v if v is not None else 0)
    return out


class _RowsToMetrics:
    def __init__(self, cfgs, start_ts_ns, ts_ns, interval_ns):
        self.cfgs = cfgs
        self.start_ts_ns = start_ts_ns
        self.ts_ns = ts_ns
        self.interval_ns = interval_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        pieces = []
        n = batch.num_rows
        for cfg in self.cfgs:
            dtype = cfg.get("data_type") or "gauge"
            agg = cfg.get("aggregation") or "cumulative"
            temporality = (0 if dtype == "gauge"
                           else 1 if agg == "delta" else 2)
            vt = cfg.get("value_type") or "int"
            vals = _col_as_values(batch, cfg["value_column"], vt)
            starts = _ts_override(batch, cfg.get("start_ts_column"),
                                  self.start_ts_ns)
            tss = _ts_override(batch, cfg.get("ts_column"), self.ts_ns)
            static = dict(cfg.get("static_attributes") or {})
            attr_cols = {c: _col_as_strings(batch, c)
                         for c in cfg.get("attribute_columns") or ()}
            attrs = []
            for i in range(n):
                a = dict(static)
                for c, col_vals in attr_cols.items():
                    if col_vals[i] is not None:
                        a[c] = col_vals[i]
                attrs.append(json.dumps(a, sort_keys=True,
                                        separators=(",", ":")))
            ts_arr = np.asarray(tss, dtype=np.int64)
            if dtype == "gauge":
                start_arr = np.zeros(n, dtype=np.int64)
            elif agg == "delta":
                start_arr = ts_arr - self.interval_ns
            else:
                start_arr = np.asarray(starts, dtype=np.int64)
            pieces.append(pa.table({
                "name": pa.array([cfg["metric_name"]] * n, pa.string()),
                "unit": pa.array([cfg.get("unit") or ""] * n,
                                 pa.string()),
                "mtype": pa.array([dtype] * n, pa.string()),
                "is_monotonic": pa.array(
                    [bool(cfg.get("monotonic")) if dtype == "sum"
                     else None] * n, pa.bool_()),
                "aggregation_temporality": pa.array([temporality] * n,
                                                    pa.int32()),
                "value_int": pa.array(
                    [v if vt == "int" else None for v in vals],
                    pa.int64()),
                "value_double": pa.array(
                    [v if vt == "double" else None for v in vals],
                    pa.float64()),
                "attrs": pa.array(attrs, pa.string()),
                "start_time_unix_nano": pa.array(start_arr, pa.int64()),
                "time_unix_nano": pa.array(ts_arr, pa.int64()),
            }))
        if not pieces:
            return pa.table({})
        return pa.concat_tables(pieces)


def rows_to_metrics(ds, metric_cfgs: list, *, start_ts_ns: int = 0,
                    ts_ns: int = 0,
                    collection_interval_ns: int = 10_000_000_000):
    """Any Dataset's rows → one metric datapoint row per (row, cfg).

    Each cfg: ``{"metric_name", "value_column", "value_type":
    "int"|"double", "data_type": "gauge"|"sum", "monotonic": bool,
    "aggregation": "cumulative"|"delta", "unit",
    "attribute_columns": [...], "static_attributes": {...},
    "ts_column", "start_ts_column"}`` (internal/sqlquery
    config.go:127-170)."""
    return ds.map_batches(
        _RowsToMetrics(metric_cfgs, start_ts_ns, ts_ns,
                       collection_interval_ns),
        batch_format="pyarrow", zero_copy_batch=True)


class _RowsToLogs:
    def __init__(self, cfgs, observed_ns):
        self.cfgs = cfgs
        self.observed_ns = observed_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        pieces = []
        n = batch.num_rows
        for cfg in self.cfgs:
            bodies = _col_as_strings(batch, cfg["body_column"])
            attr_cols = {c: _col_as_strings(batch, c)
                         for c in cfg.get("attribute_columns") or ()}
            attrs = []
            for i in range(n):
                a = {}
                for c, col_vals in attr_cols.items():
                    if col_vals[i] is not None:
                        a[c] = col_vals[i]
                attrs.append(json.dumps(a, sort_keys=True,
                                        separators=(",", ":")))
            pieces.append(pa.table({
                "body": pa.array(
                    [b if b is not None else "" for b in bodies],
                    pa.string()),
                "attrs": pa.array(attrs, pa.string()),
                "observed_time_unix_nano": pa.array(
                    [self.observed_ns] * n, pa.int64()),
            }))
        if not pieces:
            return pa.table({})
        return pa.concat_tables(pieces)


def rows_to_logs(ds, logs_cfgs: list, *, observed_ns: int = 0):
    """Any Dataset's rows → one log row per (row, cfg); cfg =
    ``{"body_column", "attribute_columns": [...]}``."""
    return ds.map_batches(_RowsToLogs(logs_cfgs, observed_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
