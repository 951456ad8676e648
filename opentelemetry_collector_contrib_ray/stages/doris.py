"""dorisexporter analogs: flat log / span / metric datapoint rows →
Doris stream-load JSON-lines documents.

Parity with exporter/dorisexporter
(exporter_logs.go:96-140 dLog, exporter_traces.go:142-222
dTrace/dEvent/dLink, metrics_model.go dMetric/dExemplar,
metrics_{gauge,sum,histogram,exponential_histogram,summary}.go
per-type structs, exporter_common.go:22 timeFormat +
:146-156 toJSONLines, exporter_metrics.go:291-319 value getters):

- every signal marshals through encoding/json (json.Encoder — sorted
  map keys, &<> HTML escapes, Go float forms) in Go struct field
  order; the `json:",inline"` embedded *dMetric promotes the shared
  8 identity fields to the FRONT of every metric doc.
- timestamps render with the Go layout "2006-01-02 15:04:05.999999"
  — microsecond precision, trailing zeros trimmed, dot dropped when
  zero — in the configured timezone (reference default is the
  collector host's time.Local; this port defaults to UTC for
  determinism and takes a fixed-offset parameter).
- ids are hex-or-empty everywhere: spans/logs/links via
  traceutil.TraceIDToHexOrEmptyString, metric exemplars via the
  pdata String() method which ALSO returns "" for zero ids
  (unlike the clickhouse exporter's plain-hex exemplars).
- attribute maps are AsRaw TYPED values (not AsString).
- span Duration is Go Duration.Microseconds() = ns/1000 truncation;
  SpanKind/StatusCode use the traceutil LONG names (SPAN_KIND_*,
  STATUS_CODE_*); sum/histogram/exponential-histogram temporality
  renders the pmetric String() names Unspecified/Delta/Cumulative.
- histogram/exp-histogram Min/Max append the Go zero value when
  unset (no HasMin gate), exp-histogram carries ZeroThreshold.
- metrics route to five per-type tables (<metrics>_gauge/_sum/
  _histogram/_exponential_histogram/_summary — tableSuffix());
  types outside the five are simply never collected
  (exporter_metrics.go:117-127 switch has no default branch).

Execution: 1:1 per-row encode task maps emitting (doris_table,
doris_line) stream-load pairs, block-local, zero shuffle; the HTTP
stream-load transport, labels, and DDL/materialized views are Ray's
write layer / schema management.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import GoStruct, go_json
from .logservice import _as_string

_KIND_LONG = ("SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
              "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
              "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER")
_STATUS_LONG = ("STATUS_CODE_UNSET", "STATUS_CODE_OK",
                "STATUS_CODE_ERROR")
_TEMPORALITY = ("Unspecified", "Delta", "Cumulative")


def _hex_or_empty(h) -> str:
    return "" if not h or set(h) <= {"0"} else h


def doris_format_time(ns: int, tz_offset_s: int = 0) -> str:
    """exporter_common.go:22,44-46: Go layout
    "2006-01-02 15:04:05.999999" — fractional µs digits truncated
    from ns, trailing zeros trimmed, no dot when zero."""
    import datetime as _dt

    t = _dt.datetime.fromtimestamp(
        ns // 1_000_000_000 + tz_offset_s, tz=_dt.timezone.utc)
    base = t.strftime("%Y-%m-%d %H:%M:%S")
    micros = (ns % 1_000_000_000) // 1000
    if micros:
        frac = f"{micros:06d}".rstrip("0")
        return f"{base}.{frac}"
    return base


def _svc(res: dict, key: str) -> str:
    """v.AsString() when present, "" when absent."""
    v = res.get(key)
    return _as_string(v) if v is not None else ""


def _raw(js) -> dict:
    return json.loads(js or "{}") or {}


def doris_log_row(row: dict, tz_offset_s: int = 0) -> str:
    """exporter_logs.go:96-140 dLog in struct order."""
    res = _raw(row.get("resource_attributes"))
    return go_json(GoStruct([
        ("service_name", _svc(res, "service.name")),
        ("timestamp", doris_format_time(
            int(row.get("time_unix_nano") or 0), tz_offset_s)),
        ("service_instance_id",
         _svc(res, "service.instance.id")),
        ("trace_id", _hex_or_empty(row.get("trace_id"))),
        ("span_id", _hex_or_empty(row.get("span_id"))),
        ("severity_number", int(row.get("severity_number") or 0)),
        ("severity_text", row.get("severity_text") or ""),
        ("body", "" if row.get("body") is None
         else str(row["body"])),
        ("resource_attributes", res),
        ("log_attributes", _raw(row.get("attributes"))),
        ("scope_name", row.get("scope_name") or ""),
        ("scope_version", row.get("scope_version") or ""),
    ]))


def doris_span_row(row: dict, tz_offset_s: int = 0) -> str:
    """exporter_traces.go:142-222 dTrace/dEvent/dLink."""
    res = _raw(row.get("resource_attributes"))
    start = int(row.get("start_time_unix_nano") or 0)
    end = int(row.get("end_time_unix_nano") or 0)
    events = [GoStruct([
        ("timestamp", doris_format_time(
            int(e.get("timeUnixNano") or 0), tz_offset_s)),
        ("name", e.get("name") or ""),
        ("attributes", e.get("attributes") or {}),
    ]) for e in json.loads(row.get("events") or "[]")]
    links = [GoStruct([
        ("trace_id", _hex_or_empty(lk.get("traceId"))),
        ("span_id", _hex_or_empty(lk.get("spanId"))),
        ("trace_state", lk.get("traceState") or ""),
        ("attributes", lk.get("attributes") or {}),
    ]) for lk in json.loads(row.get("links") or "[]")]
    return go_json(GoStruct([
        ("service_name", _svc(res, "service.name")),
        ("timestamp", doris_format_time(start, tz_offset_s)),
        ("service_instance_id",
         _svc(res, "service.instance.id")),
        ("trace_id", _hex_or_empty(row.get("trace_id"))),
        ("span_id", _hex_or_empty(row.get("span_id"))),
        ("trace_state", row.get("trace_state") or ""),
        ("parent_span_id", _hex_or_empty(row.get("parent_span_id"))),
        ("span_name", row.get("span_name") or ""),
        ("span_kind", _KIND_LONG[int(row.get("span_kind") or 0)]),
        ("end_time", doris_format_time(end, tz_offset_s)),
        ("duration", (end - start) // 1000),
        ("span_attributes", _raw(row.get("attributes"))),
        ("events", events),
        ("links", links),
        ("status_message", row.get("status_message") or ""),
        ("status_code",
         _STATUS_LONG[int(row.get("status_code") or 0)]),
        ("resource_attributes", res),
        ("scope_name", row.get("scope_name") or ""),
        ("scope_version", row.get("scope_version") or ""),
    ]))


def _doris_exemplars(row: dict, tz_offset_s: int) -> list:
    exs = json.loads(row.get("exemplars") or "[]")
    out = []
    for ex in exs:
        if "asDouble" in ex:
            v = float(ex["asDouble"])
        elif "asInt" in ex:
            v = float(int(ex["asInt"]))
        else:
            v = 0.0
        out.append(GoStruct([
            ("filtered_attributes", ex.get("filteredAttributes")
             or {}),
            ("timestamp", doris_format_time(
                int(ex.get("timeUnixNano") or 0), tz_offset_s)),
            ("value", v),
            # pdata .String(): hex-or-empty (zero ids -> "")
            ("span_id", _hex_or_empty(ex.get("spanId"))),
            ("trace_id", _hex_or_empty(ex.get("traceId"))),
        ]))
    return out


_TABLE_SUFFIX = {"gauge": "_gauge", "sum": "_sum",
                 "histogram": "_histogram",
                 "exponential_histogram": "_exponential_histogram",
                 "summary": "_summary"}


def doris_metric_row(row: dict, tz_offset_s: int = 0,
                     metrics_table: str = "otel_metrics"
                     ) -> tuple[str, str] | None:
    """metrics_*.go add() over one flat datapoint row; returns
    (table, json-line) or None for the uncollected types."""
    mtype = row.get("mtype") or ""
    suffix = _TABLE_SUFFIX.get(mtype)
    if suffix is None:
        return None
    res = _raw(row.get("resource_attributes"))
    head = [
        ("service_name", _svc(res, "service.name")),
        ("service_instance_id",
         _svc(res, "service.instance.id")),
        ("metric_name", row.get("name") or ""),
        ("metric_description", row.get("description") or ""),
        ("metric_unit", row.get("unit") or ""),
        ("resource_attributes", res),
        ("scope_name", row.get("scope_name") or ""),
        ("scope_version", row.get("scope_version") or ""),
    ]
    ts = doris_format_time(int(row.get("time_unix_nano") or 0),
                           tz_offset_s)
    start = doris_format_time(
        int(row.get("start_time_unix_nano") or 0), tz_offset_s)
    attrs = _raw(row.get("attributes"))

    def number_value():
        vd, vi = row.get("value_double"), row.get("value_int")
        if vd is not None:
            return float(vd)
        if vi is not None:
            return float(int(vi))
        return 0.0

    if mtype == "gauge":
        tail = [("timestamp", ts), ("attributes", attrs),
                ("start_time", start), ("value", number_value()),
                ("exemplars", _doris_exemplars(row, tz_offset_s))]
    elif mtype == "sum":
        tail = [("timestamp", ts), ("attributes", attrs),
                ("start_time", start), ("value", number_value()),
                ("exemplars", _doris_exemplars(row, tz_offset_s)),
                ("aggregation_temporality", _TEMPORALITY[
                    int(row.get("aggregation_temporality") or 0)]),
                ("is_monotonic", bool(row.get("is_monotonic")))]
    elif mtype == "histogram":
        tail = [("timestamp", ts), ("attributes", attrs),
                ("start_time", start),
                ("count", int(row.get("count") or 0)),
                ("sum", float(row.get("hsum") or 0.0)),
                ("bucket_counts",
                 [int(c) for c in row.get("bucket_counts") or []]),
                ("explicit_bounds",
                 [float(b) for b in row.get("explicit_bounds")
                  or []]),
                ("exemplars", _doris_exemplars(row, tz_offset_s)),
                ("min", float(row.get("hmin") or 0.0)),
                ("max", float(row.get("hmax") or 0.0)),
                ("aggregation_temporality", _TEMPORALITY[
                    int(row.get("aggregation_temporality") or 0)])]
    elif mtype == "exponential_histogram":
        tail = [("timestamp", ts), ("attributes", attrs),
                ("start_time", start),
                ("count", int(row.get("count") or 0)),
                ("sum", float(row.get("hsum") or 0.0)),
                ("scale", int(row.get("scale") or 0)),
                ("zero_count", int(row.get("zero_count") or 0)),
                ("positive_offset", int(row.get("pos_offset") or 0)),
                ("positive_bucket_counts",
                 [int(c) for c in row.get("pos_bucket_counts")
                  or []]),
                ("negative_offset", int(row.get("neg_offset") or 0)),
                ("negative_bucket_counts",
                 [int(c) for c in row.get("neg_bucket_counts")
                  or []]),
                ("exemplars", _doris_exemplars(row, tz_offset_s)),
                ("min", float(row.get("hmin") or 0.0)),
                ("max", float(row.get("hmax") or 0.0)),
                ("zero_threshold",
                 float(row.get("zero_threshold") or 0.0)),
                ("aggregation_temporality", _TEMPORALITY[
                    int(row.get("aggregation_temporality") or 0)])]
    else:  # summary
        tail = [("timestamp", ts), ("attributes", attrs),
                ("start_time", start),
                ("count", int(row.get("count") or 0)),
                ("sum", float(row.get("ssum") or 0.0)),
                ("quantile_values",
                 [GoStruct([("quantile", float(q)),
                            ("value", float(v))])
                  for q, v in zip(row.get("quantiles") or [],
                                  row.get("quantile_values")
                                  or [])])]
    return (metrics_table + suffix, go_json(GoStruct(head + tail)))


class _DorisLogs:
    def __init__(self, tz_offset_s: int):
        self.tz = tz_offset_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = [doris_log_row(r, self.tz)
                 for r in batch.to_pylist()]
        if "doris_line" in batch.schema.names:
            batch = batch.drop_columns(["doris_line"])
        return batch.append_column(
            "doris_line", pa.array(lines, pa.string()))


def logs_to_doris(ds, *, tz_offset_s: int = 0):
    """Flat log rows → Doris log JSON lines (1:1)."""
    return ds.map_batches(_DorisLogs(tz_offset_s),
                          batch_format="pyarrow",
                          zero_copy_batch=True)


class _DorisTraces:
    def __init__(self, tz_offset_s: int):
        self.tz = tz_offset_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = [doris_span_row(r, self.tz)
                 for r in batch.to_pylist()]
        if "doris_line" in batch.schema.names:
            batch = batch.drop_columns(["doris_line"])
        return batch.append_column(
            "doris_line", pa.array(lines, pa.string()))


def spans_to_doris(ds, *, tz_offset_s: int = 0):
    """Flat span rows → Doris trace JSON lines (1:1)."""
    return ds.map_batches(_DorisTraces(tz_offset_s),
                          batch_format="pyarrow",
                          zero_copy_batch=True)


class _DorisMetrics:
    def __init__(self, tz_offset_s: int, metrics_table: str):
        self.tz = tz_offset_s
        self.table = metrics_table

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, tables, lines = [], [], []
        for i, row in enumerate(batch.to_pylist()):
            rec = doris_metric_row(row, self.tz, self.table)
            if rec is not None:
                parent.append(i)
                tables.append(rec[0])
                lines.append(rec[1])
        out = batch.take(pa.array(parent, pa.int64()))
        collide = [k for k in ("doris_table", "doris_line")
                   if k in out.schema.names]
        if collide:
            out = out.drop_columns(collide)
        out = out.append_column("doris_table",
                                pa.array(tables, pa.string()))
        return out.append_column("doris_line",
                                 pa.array(lines, pa.string()))


def metrics_to_doris(ds, *, tz_offset_s: int = 0,
                     metrics_table: str = "otel_metrics"):
    """Flat metric datapoint rows → per-type Doris table JSON lines
    (1:1 per datapoint; types outside the five never collected)."""
    return ds.map_batches(_DorisMetrics(tz_offset_s, metrics_table),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
