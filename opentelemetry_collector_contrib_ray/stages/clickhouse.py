"""clickhouseexporter analogs: flat log / span / metric datapoint rows
→ the ClickHouse otel_logs / otel_traces / otel_metrics_* table rows.

Parity with exporter/clickhouseexporter
(exporter_logs.go:70-160, exporter_traces.go:70-185,
internal/metrics/{gauge,sum,histogram,exponential_histogram,
summary}_metrics.go Append orders, internal/metrics/metrics_model.go
helpers, internal/sqltemplates/*_insert.sql column lists):

- logs (logs_insert.sql, 15 columns): Timestamp with the 0→
  ObservedTimestamp fallback, hex-or-empty TraceId/SpanId
  (traceutil.TraceIDToHexOrEmptyString), TraceFlags = uint8(flags),
  SeverityText + uint8 SeverityNumber, ServiceName = resource
  service.name AsString else "", Body AsString, schema urls, the four
  attribute maps (resource/scope/log) as AsString maps.
- traces (traces_insert.sql, 22 columns): Timestamp = span start,
  SpanKind/StatusCode = the pdata String() SHORT enum names
  ("Unspecified"/"Internal"/… and "Unset"/"Ok"/"Error" — NOT the
  SPAN_KIND_* long forms the ADX exporter uses), Duration = end−start
  ns, TraceState AsRaw, Events.* three parallel arrays and Links.*
  four parallel arrays where link ids are hex-or-EMPTY
  (convertLinks:172-183).
- metrics: five per-type tables (metrics_*_insert.sql); every row
  carries the 14 shared metadata/identity columns
  (internal/metrics/*_metrics.go:58-71) then the per-type tail:
  gauge Value/Flags/exemplars; sum + AggregationTemporality int32 +
  IsMonotonic; histogram Count/Sum/BucketCounts/ExplicitBounds/
  exemplars/Flags/Min/Max/AggregationTemporality (Min/Max are the Go
  ZERO VALUE 0 when unset — the code appends dp.Min() without a
  HasMin() gate); exp-histogram + Scale/ZeroCount/Positive/Negative
  offset+bucket arrays; summary Count/Sum/Quantiles/QuantileValues/
  Flags (no exemplars, no temporality). getValue
  (metrics_model.go:139-169): int datapoints cast to float64, empty
  type → 0.0. Exemplar trace/span ids are PLAIN hex.EncodeToString —
  a zero id renders as 32/16 zeros, unlike every other id column
  (convertExemplars:116-134).

Representation choices (documented deviations, all deterministic):
ClickHouse DateTime64(9) cells are kept as their int64 ns instants;
Map(...) cells render as sorted-key JSON of AsString values (the Go
map column preserves pcommon insertion order; map equality is
order-independent, so the canonical sort is lossless); Array(...)
cells render as go_json arrays. Nested `Events.Name`-style insert
columns become dot-free `EventsName` output columns.

Execution: 1:1 (logs/traces/metrics — one INSERT row per datapoint,
no fan-out) per-row encode in task maps, block-local, zero shuffle;
the clickhouse-go batch INSERT transport is Ray's write layer
(write_parquet / write_routed), and the DDL in sqltemplates/*_table
.sql is schema management, not data transformation.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import go_json
from .logservice import _as_string

_KIND_PDATA = ("Unspecified", "Internal", "Server", "Client",
               "Producer", "Consumer")
_STATUS_PDATA = ("Unset", "Ok", "Error")

_ZERO_TRACE = "0" * 32
_ZERO_SPAN = "0" * 16


def _hex_or_empty(h) -> str:
    return "" if not h or set(h) <= {"0"} else h


def _attrs_map(js) -> str:
    """AttributesToMap (metrics_model.go:171-177): every value
    AsString; canonical sorted-key JSON rendering."""
    m = json.loads(js or "{}") or {}
    return go_json({k: _as_string(v) for k, v in m.items()})


def _service_name(res: dict) -> str:
    v = res.get("service.name")
    return _as_string(v) if v is not None else ""


def _exemplars(row: dict):
    """convertExemplars (metrics_model.go:116-134): five parallel
    arrays; ids are plain hex (zero ids stay zeros)."""
    exs = json.loads(row.get("exemplars") or "[]")
    attrs, times, values, span_ids, trace_ids = [], [], [], [], []
    for ex in exs:
        fa = ex.get("filteredAttributes") or {}
        attrs.append({k: _as_string(v) for k, v in fa.items()})
        times.append(int(ex.get("timeUnixNano") or 0))
        if "asDouble" in ex:
            values.append(float(ex["asDouble"]))
        elif "asInt" in ex:
            values.append(float(int(ex["asInt"])))
        else:
            values.append(0.0)
        trace_ids.append(ex.get("traceId") or _ZERO_TRACE)
        span_ids.append(ex.get("spanId") or _ZERO_SPAN)
    return (go_json(attrs), go_json(times), go_json(values),
            go_json(span_ids), go_json(trace_ids))


def ch_log_row(row: dict) -> dict:
    """exporter_logs.go:104-135 pushLogsData row Append."""
    res = json.loads(row.get("resource_attributes") or "{}") or {}
    ts = int(row.get("time_unix_nano") or 0)
    if ts == 0:
        ts = int(row.get("observed_time_unix_nano") or 0)
    return {
        "Timestamp": ts,
        "TraceId": _hex_or_empty(row.get("trace_id")),
        "SpanId": _hex_or_empty(row.get("span_id")),
        "TraceFlags": int(row.get("flags") or 0) & 0xFF,
        "SeverityText": row.get("severity_text") or "",
        "SeverityNumber": int(row.get("severity_number") or 0) & 0xFF,
        "ServiceName": _service_name(res),
        "Body": "" if row.get("body") is None else str(row["body"]),
        "ResourceSchemaUrl": row.get("resource_schema_url") or "",
        "ResourceAttributes": go_json(
            {k: _as_string(v) for k, v in res.items()}),
        "ScopeSchemaUrl": row.get("scope_schema_url") or "",
        "ScopeName": row.get("scope_name") or "",
        "ScopeVersion": row.get("scope_version") or "",
        "ScopeAttributes": _attrs_map(row.get("scope_attributes")),
        "LogAttributes": _attrs_map(row.get("attributes")),
    }


def ch_span_row(row: dict) -> dict:
    """exporter_traces.go:103-140 pushTraceData row Append +
    convertEvents/convertLinks (:161-183)."""
    res = json.loads(row.get("resource_attributes") or "{}") or {}
    start = int(row.get("start_time_unix_nano") or 0)
    end = int(row.get("end_time_unix_nano") or 0)
    events = json.loads(row.get("events") or "[]")
    links = json.loads(row.get("links") or "[]")
    return {
        "Timestamp": start,
        "TraceId": _hex_or_empty(row.get("trace_id")),
        "SpanId": _hex_or_empty(row.get("span_id")),
        "ParentSpanId": _hex_or_empty(row.get("parent_span_id")),
        "TraceState": row.get("trace_state") or "",
        "SpanName": row.get("span_name") or "",
        "SpanKind": _KIND_PDATA[int(row.get("span_kind") or 0)],
        "ServiceName": _service_name(res),
        "ResourceAttributes": go_json(
            {k: _as_string(v) for k, v in res.items()}),
        "ScopeName": row.get("scope_name") or "",
        "ScopeVersion": row.get("scope_version") or "",
        "SpanAttributes": _attrs_map(row.get("attributes")),
        "Duration": end - start,
        "StatusCode": _STATUS_PDATA[int(row.get("status_code") or 0)],
        "StatusMessage": row.get("status_message") or "",
        "EventsTimestamp": go_json(
            [int(e.get("timeUnixNano") or 0) for e in events]),
        "EventsName": go_json([e.get("name") or "" for e in events]),
        "EventsAttributes": go_json(
            [{k: _as_string(v)
              for k, v in (e.get("attributes") or {}).items()}
             for e in events]),
        "LinksTraceId": go_json(
            [_hex_or_empty(lk.get("traceId")) for lk in links]),
        "LinksSpanId": go_json(
            [_hex_or_empty(lk.get("spanId")) for lk in links]),
        "LinksTraceState": go_json(
            [lk.get("traceState") or "" for lk in links]),
        "LinksAttributes": go_json(
            [{k: _as_string(v)
              for k, v in (lk.get("attributes") or {}).items()}
             for lk in links]),
    }


_CH_TABLE = {"gauge": "otel_metrics_gauge", "sum": "otel_metrics_sum",
             "histogram": "otel_metrics_histogram",
             "exponential_histogram":
                 "otel_metrics_exponential_histogram",
             "summary": "otel_metrics_summary"}


def ch_metric_row(row: dict) -> dict:
    """internal/metrics/*_metrics.go insert loops over one flat
    datapoint row; unset/unsupported types ERROR the whole push
    (exporter_metrics.go:110-113), mirrored as a raise."""
    mtype = row.get("mtype") or ""
    table = _CH_TABLE.get(mtype)
    if table is None:
        raise ValueError("metrics type is unset" if mtype == ""
                         else "unsupported metrics type")
    res = json.loads(row.get("resource_attributes") or "{}") or {}
    out = {
        "ChTable": table,
        "ResourceAttributes": go_json(
            {k: _as_string(v) for k, v in res.items()}),
        "ResourceSchemaUrl": row.get("resource_schema_url") or "",
        "ScopeName": row.get("scope_name") or "",
        "ScopeVersion": row.get("scope_version") or "",
        "ScopeAttributes": _attrs_map(row.get("scope_attributes")),
        "ScopeDroppedAttrCount":
            int(row.get("scope_dropped_attr_count") or 0),
        "ScopeSchemaUrl": row.get("scope_schema_url") or "",
        "ServiceName": _service_name(res),
        "MetricName": row.get("name") or "",
        "MetricDescription": row.get("description") or "",
        "MetricUnit": row.get("unit") or "",
        "Attributes": _attrs_map(row.get("attributes")),
        "StartTimeUnix": int(row.get("start_time_unix_nano") or 0),
        "TimeUnix": int(row.get("time_unix_nano") or 0),
        "Value": None, "Flags": int(row.get("flags") or 0),
        "ExemplarsFilteredAttributes": None, "ExemplarsTimeUnix": None,
        "ExemplarsValue": None, "ExemplarsSpanId": None,
        "ExemplarsTraceId": None,
        "AggregationTemporality": None, "IsMonotonic": None,
        "Count": None, "Sum": None,
        "BucketCounts": None, "ExplicitBounds": None,
        "Min": None, "Max": None,
        "Scale": None, "ZeroCount": None,
        "PositiveOffset": None, "PositiveBucketCounts": None,
        "NegativeOffset": None, "NegativeBucketCounts": None,
        "Quantiles": None, "QuantileValues": None,
    }

    def number_value():
        vd, vi = row.get("value_double"), row.get("value_int")
        if vd is not None:
            return float(vd)
        if vi is not None:
            return float(int(vi))
        return 0.0

    if mtype in ("gauge", "sum"):
        (out["ExemplarsFilteredAttributes"], out["ExemplarsTimeUnix"],
         out["ExemplarsValue"], out["ExemplarsSpanId"],
         out["ExemplarsTraceId"]) = _exemplars(row)
        out["Value"] = number_value()
        if mtype == "sum":
            out["AggregationTemporality"] = int(
                row.get("aggregation_temporality") or 0)
            out["IsMonotonic"] = bool(row.get("is_monotonic"))
        return out
    if mtype == "histogram":
        (out["ExemplarsFilteredAttributes"], out["ExemplarsTimeUnix"],
         out["ExemplarsValue"], out["ExemplarsSpanId"],
         out["ExemplarsTraceId"]) = _exemplars(row)
        out["Count"] = int(row.get("count") or 0)
        out["Sum"] = float(row.get("hsum") or 0.0)
        out["BucketCounts"] = go_json(
            [int(c) for c in row.get("bucket_counts") or []])
        out["ExplicitBounds"] = go_json(
            [float(b) for b in row.get("explicit_bounds") or []])
        out["Min"] = float(row.get("hmin") or 0.0)
        out["Max"] = float(row.get("hmax") or 0.0)
        out["AggregationTemporality"] = int(
            row.get("aggregation_temporality") or 0)
        return out
    if mtype == "exponential_histogram":
        (out["ExemplarsFilteredAttributes"], out["ExemplarsTimeUnix"],
         out["ExemplarsValue"], out["ExemplarsSpanId"],
         out["ExemplarsTraceId"]) = _exemplars(row)
        out["Count"] = int(row.get("count") or 0)
        out["Sum"] = float(row.get("hsum") or 0.0)
        out["Scale"] = int(row.get("scale") or 0)
        out["ZeroCount"] = int(row.get("zero_count") or 0)
        out["PositiveOffset"] = int(row.get("pos_offset") or 0)
        out["PositiveBucketCounts"] = go_json(
            [int(c) for c in row.get("pos_bucket_counts") or []])
        out["NegativeOffset"] = int(row.get("neg_offset") or 0)
        out["NegativeBucketCounts"] = go_json(
            [int(c) for c in row.get("neg_bucket_counts") or []])
        out["Min"] = float(row.get("hmin") or 0.0)
        out["Max"] = float(row.get("hmax") or 0.0)
        out["AggregationTemporality"] = int(
            row.get("aggregation_temporality") or 0)
        return out
    # summary
    out["Count"] = int(row.get("count") or 0)
    out["Sum"] = float(row.get("ssum") or 0.0)
    out["Quantiles"] = go_json(
        [float(q) for q in row.get("quantiles") or []])
    out["QuantileValues"] = go_json(
        [float(v) for v in row.get("quantile_values") or []])
    return out


_LOG_COLS = ("Timestamp", "TraceId", "SpanId", "TraceFlags",
             "SeverityText", "SeverityNumber", "ServiceName", "Body",
             "ResourceSchemaUrl", "ResourceAttributes",
             "ScopeSchemaUrl", "ScopeName", "ScopeVersion",
             "ScopeAttributes", "LogAttributes")
_TRACE_COLS = ("Timestamp", "TraceId", "SpanId", "ParentSpanId",
               "TraceState", "SpanName", "SpanKind", "ServiceName",
               "ResourceAttributes", "ScopeName", "ScopeVersion",
               "SpanAttributes", "Duration", "StatusCode",
               "StatusMessage", "EventsTimestamp", "EventsName",
               "EventsAttributes", "LinksTraceId", "LinksSpanId",
               "LinksTraceState", "LinksAttributes")
_METRIC_COLS = ("ChTable", "ResourceAttributes", "ResourceSchemaUrl",
                "ScopeName", "ScopeVersion", "ScopeAttributes",
                "ScopeDroppedAttrCount", "ScopeSchemaUrl",
                "ServiceName", "MetricName", "MetricDescription",
                "MetricUnit", "Attributes", "StartTimeUnix",
                "TimeUnix", "Value", "Flags",
                "ExemplarsFilteredAttributes", "ExemplarsTimeUnix",
                "ExemplarsValue", "ExemplarsSpanId",
                "ExemplarsTraceId", "AggregationTemporality",
                "IsMonotonic", "Count", "Sum", "BucketCounts",
                "ExplicitBounds", "Min", "Max", "Scale", "ZeroCount",
                "PositiveOffset", "PositiveBucketCounts",
                "NegativeOffset", "NegativeBucketCounts",
                "Quantiles", "QuantileValues")

_METRIC_TYPES = {
    "Timestamp": pa.int64(), "TraceFlags": pa.int32(),
    "SeverityNumber": pa.int32(), "Duration": pa.int64(),
    "ScopeDroppedAttrCount": pa.int64(), "StartTimeUnix": pa.int64(),
    "TimeUnix": pa.int64(), "Value": pa.float64(),
    "Flags": pa.int64(), "AggregationTemporality": pa.int32(),
    "IsMonotonic": pa.bool_(), "Count": pa.int64(),
    "Sum": pa.float64(), "Min": pa.float64(), "Max": pa.float64(),
    "Scale": pa.int32(), "ZeroCount": pa.int64(),
    "PositiveOffset": pa.int32(), "NegativeOffset": pa.int32(),
}


def _append_cols(batch: pa.Table, parent, recs, names) -> pa.Table:
    out = batch.take(pa.array(parent, pa.int64()))
    collide = [k for k in names if k in out.schema.names]
    if collide:
        out = out.drop_columns(collide)
    for k in names:
        typ = _METRIC_TYPES.get(k, pa.string())
        out = out.append_column(
            k, pa.array([r[k] for r in recs], typ))
    return out


class _ChLogs:
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        recs = [ch_log_row(r) for r in rows]
        return _append_cols(batch, list(range(len(rows))), recs,
                            _LOG_COLS)


def logs_to_clickhouse(ds):
    """Flat log rows → otel_logs INSERT rows (1:1)."""
    return ds.map_batches(_ChLogs(), batch_format="pyarrow",
                          zero_copy_batch=True)


class _ChTraces:
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        recs = [ch_span_row(r) for r in rows]
        return _append_cols(batch, list(range(len(rows))), recs,
                            _TRACE_COLS)


def spans_to_clickhouse(ds):
    """Flat span rows → otel_traces INSERT rows (1:1)."""
    return ds.map_batches(_ChTraces(), batch_format="pyarrow",
                          zero_copy_batch=True)


class _ChMetrics:
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        recs = [ch_metric_row(r) for r in rows]
        return _append_cols(batch, list(range(len(rows))), recs,
                            _METRIC_COLS)


def metrics_to_clickhouse(ds):
    """Flat metric datapoint rows → the five otel_metrics_* tables'
    INSERT rows (one row per datapoint; ChTable names the target;
    unset/unsupported types raise, mirroring the reference's
    whole-push error — exporter_metrics.go:110-113)."""
    return ds.map_batches(_ChMetrics(), batch_format="pyarrow",
                          zero_copy_batch=True)
