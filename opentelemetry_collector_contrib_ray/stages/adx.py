"""azuredataexplorerexporter analogs: flat log / span / metric rows →
the ADX OTELLogs / OTELTraces / OTELMetrics table rows.

Parity with exporter/azuredataexplorerexporter
(logsdata_to_adx.go:17-46, tracesdata_to_adx.go:16-92,
metricsdata_to_adx.go:35-247, adx_exporter.go:237-248):

- logs: Timestamp/ObservedTimestamp RFC3339Nano, hex-or-empty
  TraceID/SpanID, SeverityText + int32 SeverityNumber, Body AsString,
  ResourceAttributes = resource attrs AsRaw, LogsAttributes = clone
  of log attrs with the scope map (scope.name / scope.version, only
  when non-empty) copied OVER it (scope wins on collision).
- traces: the 13 span fields — SPAN_KIND_*/STATUS_CODE_* long enum
  names (internal/coreinternal/traceutil), RFC3339Nano start/end,
  TraceAttributes = attrs + scope map, Events array of
  {EventName, Timestamp, EventAttributes} and Links array of
  {TraceID, SpanID, TraceState, SpanLinkAttributes} structs in Go
  declaration order.
- metrics: one row per datapoint with the histogram/summary fan-out —
  Host = resource host.name else the collector hostname (the
  ``default_host`` config here); Gauge/Sum value rows; histogram →
  ``_sum`` (+" (Sum total of samples)" description, sic: no space —
  the Go code concatenates description+"(Sum total of samples)"),
  ``_count``, CUMULATIVE ``_bucket`` rows with le='g'-shortest bound
  (dp attrs overwrite a literal "le" attr; buckets SKIPPED entirely
  unless len(counts) == len(bounds)+1), and the +Inf bucket whose
  value ADDS the overflow count to the cumsum; summary → _sum/_count
  plus per-quantile rows named name_<'f'-shortest quantile> carrying
  BOTH qt='g'-shortest quantile and <quantileName>=value in the
  attribute map; empty name/description fall back to the metric's
  (isEmpty = TrimSpace); Empty/ExponentialHistogram types dropped.

Attribute maps marshal through jsoniter (map key order is Go-random
at runtime); this port canonicalizes with encoding/json sorted-key
order (awsemf.go_json) — deterministic and byte-equal for the
single-ordering cases the reference tests pin.

Execution: 1:1 (logs/traces) or fan-out (metrics) per-row encode in
task maps, block-local, zero shuffle; the Kusto ingest client is Ray's
write layer (write_parquet / write_routed).
"""

from __future__ import annotations

import json
from decimal import Decimal as _Decimal

import pyarrow as pa

from .awsemf import GoStruct, go_json
from .opencensus import ns_to_rfc3339_nano
from .splunkhec import go_fmt_float

_KIND_STR = ("SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
             "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
             "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER")
_STATUS_STR = ("STATUS_CODE_UNSET", "STATUS_CODE_OK",
               "STATUS_CODE_ERROR")


def _hex_or_empty(h) -> str:
    return "" if not h or set(h) <= {"0"} else h


def _scope_map(row: dict) -> dict:
    """adx_exporter.go:237-248 getScopeMap — only non-empty parts."""
    out = {}
    if row.get("scope_name"):
        out["scope.name"] = row["scope_name"]
    if row.get("scope_version"):
        out["scope.version"] = row["scope_version"]
    return out


def _merged_attrs(row: dict) -> dict:
    attrs = json.loads(row.get("attributes") or "{}") or {}
    attrs.update(_scope_map(row))  # copyMap: scope wins
    return attrs


def adx_log_row(row: dict) -> dict:
    """logsdata_to_adx.go:30-46 mapToAdxLog over one flat log row."""
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    return {
        "Timestamp": ns_to_rfc3339_nano(
            int(row.get("time_unix_nano") or 0)),
        "ObservedTimestamp": ns_to_rfc3339_nano(
            int(row.get("observed_time_unix_nano") or 0)),
        "TraceID": _hex_or_empty(row.get("trace_id")),
        "SpanID": _hex_or_empty(row.get("span_id")),
        "SeverityText": row.get("severity_text") or "",
        "SeverityNumber": int(row.get("severity_number") or 0),
        "Body": "" if row.get("body") is None else str(row["body"]),
        "ResourceAttributes": go_json(resource),
        "LogsAttributes": go_json(_merged_attrs(row)),
    }


def adx_trace_row(row: dict) -> dict:
    """tracesdata_to_adx.go:45-92 mapToAdxTrace over one flat span."""
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    events = json.loads(row.get("events") or "[]")
    ev_arr = [GoStruct([
        ("EventName", e.get("name") or ""),
        ("Timestamp", ns_to_rfc3339_nano(
            int(e.get("timeUnixNano") or 0))),
        ("EventAttributes", e.get("attributes") or {}),
    ]) for e in events]
    links = json.loads(row.get("links") or "[]")
    lk_arr = [GoStruct([
        ("TraceID", _hex_or_empty(lk.get("traceId"))),
        ("SpanID", _hex_or_empty(lk.get("spanId"))),
        ("TraceState", lk.get("traceState") or ""),
        ("SpanLinkAttributes", lk.get("attributes") or {}),
    ]) for lk in links]
    return {
        "TraceID": _hex_or_empty(row.get("trace_id")),
        "SpanID": _hex_or_empty(row.get("span_id")),
        "ParentID": _hex_or_empty(row.get("parent_span_id")),
        "SpanName": row.get("span_name") or "",
        "SpanStatus": _STATUS_STR[int(row.get("status_code") or 0)],
        "SpanStatusMessage": row.get("status_message") or "",
        "SpanKind": _KIND_STR[int(row.get("span_kind") or 0)],
        "StartTime": ns_to_rfc3339_nano(
            int(row.get("start_time_unix_nano") or 0)),
        "EndTime": ns_to_rfc3339_nano(
            int(row.get("end_time_unix_nano") or 0)),
        "ResourceAttributes": go_json(resource),
        "TraceAttributes": go_json(_merged_attrs(row)),
        "Events": go_json(ev_arr),
        "Links": go_json(lk_arr),
    }


_SUM_DESC = "(Sum total of samples)"
_COUNT_DESC = "(Count of samples)"


def adx_metric_rows(out: list, parent: int, row: dict,
                    default_host: str = "") -> None:
    """metricsdata_to_adx.go:56-247 mapToAdxMetric over one flat
    datapoint row; appends (parent, field-dict) tuples."""
    mtype = row.get("mtype") or ""
    if mtype not in ("gauge", "sum", "histogram", "summary"):
        return  # Empty / ExponentialHistogram → warn + drop
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    host = resource.get("host.name")
    host = host if isinstance(host, str) else default_host
    res_json = go_json(resource)
    scope = _scope_map(row)
    md_name = row.get("name") or ""
    md_desc = row.get("description") or ""
    unit = row.get("unit") or ""
    ts = ns_to_rfc3339_nano(int(row.get("time_unix_nano") or 0))
    attrs = json.loads(row.get("attributes") or "{}") or {}
    type_str = {"gauge": "Gauge", "sum": "Sum",
                "histogram": "Histogram",
                "summary": "Summary"}[mtype]

    def emit(value: float, name: str = "", desc: str = "",
             extra: dict | None = None):
        # createMetric: clone(scopeattrs) + dp attrs (dp wins); the
        # bucket/quantile extras are the copyMap({"le"/..}, dp) base
        # so dp attrs overwrite the synthetic keys too
        m = dict(scope)
        base = dict(extra) if extra else {}
        base.update(attrs)
        m.update(base)
        out.append((parent, {
            "Timestamp": ts,
            "MetricName": md_name if not name.strip() else name,
            "MetricType": type_str,
            "MetricUnit": unit,
            "MetricDescription": md_desc if not desc.strip()
            else desc,
            "MetricValue": float(value),
            "MetricAttributes": go_json(m),
            "Host": host,
            "ResourceAttributes": res_json,
        }))

    if mtype in ("gauge", "sum"):
        vi, vd = row.get("value_int"), row.get("value_double")
        emit(float(vd) if vd is not None else float(vi or 0))
        return
    if mtype == "histogram":
        emit(float(row.get("hsum") or 0.0),
             md_name + "_sum", md_desc + _SUM_DESC)
        emit(float(row.get("count") or 0),
             md_name + "_count", md_desc + _COUNT_DESC)
        bounds = list(row.get("explicit_bounds") or [])
        counts = list(row.get("bucket_counts") or [])
        if len(counts) == 0 or len(counts) != len(bounds) + 1:
            return
        cum = 0
        for b, c in zip(bounds, counts):
            cum += int(c)
            emit(float(cum), md_name + "_bucket", "",
                 {"le": go_fmt_float(float(b))})
        emit(float(cum + int(counts[-1])), md_name + "_bucket", "",
             {"le": "+Inf"})
        return
    # summary
    emit(float(row.get("ssum") or 0.0),
         md_name + "_sum", md_desc + _SUM_DESC)
    emit(float(row.get("count") or 0),
         md_name + "_count", md_desc + _COUNT_DESC)
    qs = list(row.get("quantiles") or [])
    qvs = list(row.get("quantile_values") or [])
    for q, v in zip(qs, qvs):
        # strconv.FormatFloat(q, 'f', -1, 64): shortest round-trip
        # digits, never an exponent form
        qf = format(_Decimal(repr(float(q))), "f")
        if "." in qf:
            qf = qf.rstrip("0").rstrip(".")
        qname = f"{md_name}_{qf}"
        emit(float(v), qname, md_desc + _COUNT_DESC,
             {"qt": go_fmt_float(float(q)), qname: float(v)})


_LOG_COLS = ("Timestamp", "ObservedTimestamp", "TraceID", "SpanID",
             "SeverityText", "SeverityNumber", "Body",
             "ResourceAttributes", "LogsAttributes")
_TRACE_COLS = ("TraceID", "SpanID", "ParentID", "SpanName",
               "SpanStatus", "SpanStatusMessage", "SpanKind",
               "StartTime", "EndTime", "ResourceAttributes",
               "TraceAttributes", "Events", "Links")
_METRIC_COLS = ("Timestamp", "MetricName", "MetricType", "MetricUnit",
                "MetricDescription", "MetricValue",
                "MetricAttributes", "Host", "ResourceAttributes")


def _append_cols(batch: pa.Table, parent, recs, names) -> pa.Table:
    out = batch.take(pa.array(parent, pa.int64()))
    collide = [k for k in names if k in out.schema.names]
    if collide:
        out = out.drop_columns(collide)
    for k in names:
        if k == "SeverityNumber":
            typ = pa.int32()
        elif k == "MetricValue":
            typ = pa.float64()
        else:
            typ = pa.string()
        out = out.append_column(k, pa.array([r[k] for r in recs], typ))
    return out


class _AdxLogs:
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        recs = [adx_log_row(r) for r in rows]
        return _append_cols(batch, list(range(len(rows))), recs,
                            _LOG_COLS)


def logs_to_adx(ds):
    """Flat log rows → ADX OTELLogs rows (1:1)."""
    return ds.map_batches(_AdxLogs(), batch_format="pyarrow",
                          zero_copy_batch=True)


class _AdxTraces:
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        recs = [adx_trace_row(r) for r in rows]
        return _append_cols(batch, list(range(len(rows))), recs,
                            _TRACE_COLS)


def traces_to_adx(ds):
    """Flat span rows → ADX OTELTraces rows (1:1)."""
    return ds.map_batches(_AdxTraces(), batch_format="pyarrow",
                          zero_copy_batch=True)


class _AdxMetrics:
    def __init__(self, default_host: str):
        self.default_host = default_host

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list = []
        for i, row in enumerate(batch.to_pylist()):
            adx_metric_rows(out, i, row,
                            default_host=self.default_host)
        return _append_cols(batch, [o[0] for o in out],
                            [o[1] for o in out], _METRIC_COLS)


def metrics_to_adx(ds, *, default_host: str = ""):
    """Flat metric datapoint rows → ADX OTELMetrics rows (fan-out).

    ``default_host`` stands in for os.Hostname() (the collector's own
    hostname) when the resource carries no host.name."""
    return ds.map_batches(_AdxMetrics(default_host),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
