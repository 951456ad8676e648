"""tinybirdexporter analogs: flat log / span / metric datapoint rows
→ Tinybird Events-API NDJSON lines.

Parity with exporter/tinybirdexporter
(internal/logs.go logSignal, internal/traces.go traceSignal +
convertEvents/convertLinks, internal/metrics.go baseMetricSignal +
per-type signals, internal/utils.go convertAttributes/getServiceName,
exporter.go json.Encoder NDJSON):

- every signal marshals through encoding/json in Go struct field
  order; the anonymous baseMetricSignal embeds at the FRONT of every
  metric line; attribute maps are map[string]string AsString values
  (sorted keys under encoding/json).
- timestamps are RFC3339Nano (trailing-zero-trimmed fraction).
- ids are traceutil hex-or-empty everywhere INCLUDING exemplars
  (unlike clickhouse's plain-hex exemplars).
- logs: Timestamp has the 0→ObservedTimestamp fallback; Flags/
  SeverityNumber keep their full uint32/int32 width.
- traces: SpanKind/StatusCode are the pdata String() SHORT names
  ("Internal"/"Unset"); `end_time` carries json omitempty but the
  Go Format() never returns "" so it always renders (a zero end time
  renders 0001-01-01T00:00:00Z); `duration` (ns) carries omitempty
  so a ZERO duration is OMITTED from the line; events/links fan into
  parallel arrays, empty slices render [].
- metrics: sum/gauge/histogram/exponential-histogram only — summary
  and empty types are silently skipped (the switch has no case and
  no default, metrics.go:133-306); histogram/exp-histogram Min/Max
  are *float64 omitempty GATED on HasMin()/HasMax() (absent when
  unset — the opposite of the clickhouse/doris zero-value behavior);
  exemplar value int→float casts, empty→0.0.

Execution: 1:1 per-row encode task maps emitting (tb_signal,
tb_line) NDJSON pairs, block-local, zero shuffle; the Events-API
HTTP POST, datasource naming, retry-after handling and gzip are
Ray's write layer.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import GoStruct, go_json
from .logservice import _as_string
from .opencensus import ns_to_rfc3339_nano


def _hex_or_empty(h) -> str:
    return "" if not h or set(h) <= {"0"} else h


def _attrs(js) -> dict:
    m = json.loads(js or "{}") or {}
    return {k: _as_string(v) for k, v in m.items()}


def _service_name(res: dict) -> str:
    v = res.get("service.name")
    return _as_string(v) if v is not None else ""


def tb_log_row(row: dict) -> str:
    """internal/logs.go ConvertLogs over one flat log row."""
    res = _attrs(row.get("resource_attributes"))
    ts = int(row.get("time_unix_nano") or 0)
    if ts == 0:
        ts = int(row.get("observed_time_unix_nano") or 0)
    return go_json(GoStruct([
        ("resource_schema_url", row.get("resource_schema_url")
         or ""),
        ("resource_attributes", res),
        ("service_name", _service_name(res)),
        ("scope_schema_url", row.get("scope_schema_url") or ""),
        ("scope_attributes", _attrs(row.get("scope_attributes"))),
        ("scope_name", row.get("scope_name") or ""),
        ("scope_version", row.get("scope_version") or ""),
        ("timestamp", ns_to_rfc3339_nano(ts)),
        ("trace_id", _hex_or_empty(row.get("trace_id"))),
        ("span_id", _hex_or_empty(row.get("span_id"))),
        ("flags", int(row.get("flags") or 0)),
        ("severity_text", row.get("severity_text") or ""),
        ("severity_number", int(row.get("severity_number") or 0)),
        ("log_attributes", _attrs(row.get("attributes"))),
        ("body", "" if row.get("body") is None
         else str(row["body"])),
    ]))


_KIND_PDATA = ("Unspecified", "Internal", "Server", "Client",
               "Producer", "Consumer")
_STATUS_PDATA = ("Unset", "Ok", "Error")


def tb_span_row(row: dict) -> str:
    """internal/traces.go ConvertTraces over one flat span row."""
    res = _attrs(row.get("resource_attributes"))
    start = int(row.get("start_time_unix_nano") or 0)
    end = int(row.get("end_time_unix_nano") or 0)
    events = json.loads(row.get("events") or "[]")
    links = json.loads(row.get("links") or "[]")
    fields = [
        ("resource_schema_url", row.get("resource_schema_url")
         or ""),
        ("resource_attributes", res),
        ("service_name", _service_name(res)),
        ("scope_schema_url", row.get("scope_schema_url") or ""),
        ("scope_name", row.get("scope_name") or ""),
        ("scope_version", row.get("scope_version") or ""),
        ("scope_attributes", _attrs(row.get("scope_attributes"))),
        ("trace_id", _hex_or_empty(row.get("trace_id"))),
        ("span_id", _hex_or_empty(row.get("span_id"))),
        ("parent_span_id", _hex_or_empty(row.get("parent_span_id"))),
        ("trace_state", row.get("trace_state") or ""),
        ("trace_flags", int(row.get("flags") or 0)),
        ("span_name", row.get("span_name") or ""),
        ("span_kind", _KIND_PDATA[int(row.get("span_kind") or 0)]),
        ("span_attributes", _attrs(row.get("attributes"))),
        ("start_time", ns_to_rfc3339_nano(start)),
        ("end_time", ns_to_rfc3339_nano(end)),
    ]
    if end - start != 0:  # int64 omitempty: zero duration omitted
        fields.append(("duration", end - start))
    fields += [
        ("status_code",
         _STATUS_PDATA[int(row.get("status_code") or 0)]),
        ("status_message", row.get("status_message") or ""),
        ("events_timestamp",
         [ns_to_rfc3339_nano(int(e.get("timeUnixNano") or 0))
          for e in events]),
        ("events_name", [e.get("name") or "" for e in events]),
        ("events_attributes",
         [{k: _as_string(v)
           for k, v in (e.get("attributes") or {}).items()}
          for e in events]),
        ("links_trace_id",
         [_hex_or_empty(lk.get("traceId")) for lk in links]),
        ("links_span_id",
         [_hex_or_empty(lk.get("spanId")) for lk in links]),
        ("links_trace_state",
         [lk.get("traceState") or "" for lk in links]),
        ("links_attributes",
         [{k: _as_string(v)
           for k, v in (lk.get("attributes") or {}).items()}
          for lk in links]),
    ]
    return go_json(GoStruct(fields))


def _exemplars(row: dict):
    exs = json.loads(row.get("exemplars") or "[]")
    attrs, times, values, span_ids, trace_ids = [], [], [], [], []
    for ex in exs:
        fa = ex.get("filteredAttributes") or {}
        attrs.append({k: _as_string(v) for k, v in fa.items()})
        times.append(ns_to_rfc3339_nano(
            int(ex.get("timeUnixNano") or 0)))
        if "asDouble" in ex:
            values.append(float(ex["asDouble"]))
        elif "asInt" in ex:
            values.append(float(int(ex["asInt"])))
        else:
            values.append(0.0)
        span_ids.append(_hex_or_empty(ex.get("spanId")))
        trace_ids.append(_hex_or_empty(ex.get("traceId")))
    return attrs, times, values, span_ids, trace_ids


def tb_metric_row(row: dict) -> tuple[str, str] | None:
    """internal/metrics.go ConvertMetrics over one flat datapoint
    row; None for summary/empty (silently skipped)."""
    mtype = row.get("mtype") or ""
    if mtype not in ("sum", "gauge", "histogram",
                     "exponential_histogram"):
        return None
    res = _attrs(row.get("resource_attributes"))
    ex_attrs, ex_ts, ex_vals, ex_spans, ex_traces = _exemplars(row)
    base = [
        ("resource_schema_url", row.get("resource_schema_url")
         or ""),
        ("resource_attributes", res),
        ("service_name", _service_name(res)),
        ("scope_name", row.get("scope_name") or ""),
        ("scope_version", row.get("scope_version") or ""),
        ("scope_schema_url", row.get("scope_schema_url") or ""),
        ("scope_attributes", _attrs(row.get("scope_attributes"))),
        ("metric_name", row.get("name") or ""),
        ("metric_description", row.get("description") or ""),
        ("metric_unit", row.get("unit") or ""),
        ("metric_attributes", _attrs(row.get("attributes"))),
        ("start_timestamp", ns_to_rfc3339_nano(
            int(row.get("start_time_unix_nano") or 0))),
        ("timestamp", ns_to_rfc3339_nano(
            int(row.get("time_unix_nano") or 0))),
        ("flags", int(row.get("flags") or 0)),
        ("exemplars_filtered_attributes", ex_attrs),
        ("exemplars_timestamp", ex_ts),
        ("exemplars_value", ex_vals),
        ("exemplars_span_id", ex_spans),
        ("exemplars_trace_id", ex_traces),
    ]

    def number_value():
        vd, vi = row.get("value_double"), row.get("value_int")
        if vd is not None:
            return float(vd)
        if vi is not None:
            return float(int(vi))
        return 0.0

    if mtype == "sum":
        tail = [("value", number_value()),
                ("aggregation_temporality",
                 int(row.get("aggregation_temporality") or 0)),
                ("is_monotonic", bool(row.get("is_monotonic")))]
    elif mtype == "gauge":
        tail = [("value", number_value())]
    elif mtype == "histogram":
        tail = [("count", int(row.get("count") or 0)),
                ("sum", float(row.get("hsum") or 0.0)),
                ("bucket_counts",
                 [int(c) for c in row.get("bucket_counts") or []]),
                ("explicit_bounds",
                 [float(b) for b in row.get("explicit_bounds")
                  or []])]
        # *float64 omitempty gated on HasMin()/HasMax()
        if row.get("hmin") is not None:
            tail.append(("min", float(row["hmin"])))
        if row.get("hmax") is not None:
            tail.append(("max", float(row["hmax"])))
        tail.append(("aggregation_temporality",
                     int(row.get("aggregation_temporality") or 0)))
    else:  # exponential_histogram
        tail = [("count", int(row.get("count") or 0)),
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
                  or []])]
        if row.get("hmin") is not None:
            tail.append(("min", float(row["hmin"])))
        if row.get("hmax") is not None:
            tail.append(("max", float(row["hmax"])))
        tail.append(("aggregation_temporality",
                     int(row.get("aggregation_temporality") or 0)))
    return mtype, go_json(GoStruct(base + tail))


class _TbEncode:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = [self.fn(r) for r in batch.to_pylist()]
        if "tb_line" in batch.schema.names:
            batch = batch.drop_columns(["tb_line"])
        return batch.append_column(
            "tb_line", pa.array(lines, pa.string()))


def logs_to_tinybird(ds):
    """Flat log rows → Tinybird NDJSON lines (1:1)."""
    return ds.map_batches(_TbEncode(tb_log_row),
                          batch_format="pyarrow",
                          zero_copy_batch=True)


def spans_to_tinybird(ds):
    """Flat span rows → Tinybird NDJSON lines (1:1)."""
    return ds.map_batches(_TbEncode(tb_span_row),
                          batch_format="pyarrow",
                          zero_copy_batch=True)


class _TbMetrics:
    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, signals, lines = [], [], []
        for i, row in enumerate(batch.to_pylist()):
            rec = tb_metric_row(row)
            if rec is not None:
                parent.append(i)
                signals.append(rec[0])
                lines.append(rec[1])
        out = batch.take(pa.array(parent, pa.int64()))
        collide = [k for k in ("tb_signal", "tb_line")
                   if k in out.schema.names]
        if collide:
            out = out.drop_columns(collide)
        out = out.append_column("tb_signal",
                                pa.array(signals, pa.string()))
        return out.append_column("tb_line",
                                 pa.array(lines, pa.string()))


def metrics_to_tinybird(ds):
    """Flat metric datapoint rows → per-type Tinybird NDJSON lines
    (summary/empty silently skipped)."""
    return ds.map_batches(_TbMetrics(), batch_format="pyarrow",
                          zero_copy_batch=True)
