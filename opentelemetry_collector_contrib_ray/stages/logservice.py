"""alibabacloud / tencentcloud LogService exporter analogs: flat
log / span / metric rows → LogService key-value records.

Parity with exporter/alibabacloudlogserviceexporter
(logsdata_to_logservice.go, tracedata_to_logservice.go,
metricsdata_to_logservice.go, sanitize.go) — the tencentcloud
exporter's logs path is the SAME translation modulo the sls→cls
proto type (verified by diff; same keys incl. traceID/spanID, same
empty-body drop and time fallback), so one stage serves both:

- logs: contents host/service (resource host.name / service.name,
  "" when absent), resource = Go json.Marshal of the REMAINING
  resource attrs AsString (sorted keys, &<> escapes), otlp.name /
  otlp.version scope shortcuts, timeUnixNano / severityNumber
  decimal strings, attribute = AsString attr map JSON, content =
  body AsString, flags as LOWERCASE HEX, traceID/spanID hex or ""
  — an EMPTY-typed body drops the record (:119-121); sls.Log.Time =
  ts seconds, zero ts → time.Now() (the ``now_ns`` config here).
- traces: the 14 span fields (tracedata:65-147) — OpenTracing
  SHORT kind strings with "" for unspecified, links/logs JSON
  arrays of {attribute, name/spanID…, time} maps (event time = the
  raw ns NUMBER), µs start/end/duration strings, AsRaw attribute
  JSON, UNSET/OK/ERROR status; Time = END-timestamp seconds with
  the now fallback.
- metrics: prometheus-shaped rows ``__name__/__labels__/
  __time_nano__/__value__`` — sanitized label keys (non-alnum → _,
  "key_" digit / "key" underscore prefixes), resource attrs +
  datapoint attrs, labels sorted then joined ``k#$#v|…``, the
  bucket/quantile dimension added EMPTY then Replace()d per
  bucket/quantile (leftmost on duplicates), 'g'-shortest values and
  bounds with the +Inf overflow label, bucket count =
  min(bounds+1, counts), name sanitized by formatMetricName
  ([a-zA-Z0-9_:] keep), gauge/sum/histogram/summary only (empty and
  exponential-histogram types skipped), SCOPE IGNORED.

Execution: 1:1 (logs/traces) or fan-out (metrics) per-row encode in
task maps, block-local, zero shuffle; the SLS/CLS producer upload is
Ray's write layer.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import go_json
from .splunkhec import go_fmt_float

_KIND_SHORT = ("", "internal", "server", "client", "producer",
               "consumer")
_STATUS_SHORT = ("UNSET", "OK", "ERROR")


def _as_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_fmt_float(v)
    return "" if v is None else str(v)


def sanitize_label_key(s: str) -> str:
    """sanitize.go:15-41."""
    if s == "":
        return s
    s = "".join(c if c.isalnum() else "_" for c in s)
    if s[0].isdigit():
        s = "key_" + s
    if s[0] == "_":
        s = "key" + s
    return s


def format_metric_name(name: str) -> str:
    """metricsdata:90-110 — byte-wise [a-zA-Z0-9_:] keep."""
    return "".join(
        c if (("a" <= c <= "z") or ("A" <= c <= "Z")
              or ("0" <= c <= "9") or c in "_:") else "_"
        for c in name)


def _hex_or_empty(h) -> str:
    return "" if not h or set(h) <= {"0"} else h


def _resource_contents(resource: dict) -> tuple[str, str, str]:
    host = _as_string(resource["host.name"]) \
        if "host.name" in resource else ""
    service = _as_string(resource["service.name"]) \
        if "service.name" in resource else ""
    rest = {k: _as_string(v) for k, v in resource.items()
            if k not in ("host.name", "service.name")}
    return host, service, go_json(rest)


def log_to_logservice(row: dict, *, now_ns: int = 0) -> dict | None:
    """logsdata_to_logservice.go:115-185 over one flat log row."""
    if row.get("body") is None:
        return None  # ValueTypeEmpty body → dropped
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    host, service, res_json = _resource_contents(resource)
    attrs = json.loads(row.get("attributes") or "{}") or {}
    ts = int(row.get("time_unix_nano") or 0)
    return {
        "sls_time": (ts if ts > 0 else now_ns) // 1_000_000_000,
        "host": host, "service": service, "resource": res_json,
        "otlp_name": row.get("scope_name") or "",
        "otlp_version": row.get("scope_version") or "",
        "time_unix_nano": str(ts),
        "severity_number": str(int(row.get("severity_number") or 0)),
        "severity_text": row.get("severity_text") or "",
        "attribute": go_json({k: _as_string(v)
                              for k, v in attrs.items()}),
        "content": _as_string(row.get("body")),
        "flags": format(int(row.get("flags") or 0), "x"),
        "traceID": _hex_or_empty(row.get("trace_id")),
        "spanID": _hex_or_empty(row.get("span_id")),
    }


def span_to_logservice(row: dict, *, now_ns: int = 0) -> dict:
    """tracedata_to_logservice.go:65-147 over one flat span row."""
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    host, service, res_json = _resource_contents(resource)
    start = int(row.get("start_time_unix_nano") or 0)
    end = int(row.get("end_time_unix_nano") or 0)
    time_nano = end if end != 0 else now_ns
    events = json.loads(row.get("events") or "[]")
    ev_arr = [{"attribute": e.get("attributes") or {},
               "name": e.get("name") or "",
               "time": int(e.get("timeUnixNano") or 0)}
              for e in events]
    links = json.loads(row.get("links") or "[]")
    lk_arr = [{"attribute": lk.get("attributes") or {},
               "spanID": _hex_or_empty(lk.get("spanId")),
               "traceID": _hex_or_empty(lk.get("traceId"))}
              for lk in links]
    attrs = json.loads(row.get("attributes") or "{}") or {}
    return {
        "sls_time": time_nano // 1_000_000_000,
        "host": host, "service": service, "resource": res_json,
        "otlp_name": row.get("scope_name") or "",
        "otlp_version": row.get("scope_version") or "",
        "traceID": _hex_or_empty(row.get("trace_id")),
        "spanID": _hex_or_empty(row.get("span_id")),
        "parentSpanID": _hex_or_empty(row.get("parent_span_id")),
        "kind": _KIND_SHORT[int(row.get("span_kind") or 0)],
        "name": row.get("span_name") or "",
        "links": go_json(lk_arr),
        "logs": go_json(ev_arr),
        "traceState": row.get("trace_state") or "",
        "start": str(start // 1000),
        "end": str(end // 1000),
        "duration": str((end - start) // 1000),
        "attribute": go_json(attrs),
        "statusCode": _STATUS_SHORT[int(row.get("status_code") or 0)],
        "statusMessage": row.get("status_message") or "",
    }


class _KeyValues:
    """metricsdata:29-88 — sorted (key, value) list + Replace."""

    def __init__(self, pairs=None):
        self.pairs: list[list[str]] = [list(p) for p in (pairs or ())]

    def append(self, key: str, value: str):
        self.pairs.append([sanitize_label_key(key), value])

    def clone(self) -> "_KeyValues":
        return _KeyValues(self.pairs)

    def sort(self):
        self.pairs.sort(key=lambda p: p[0])

    def replace(self, key: str, value: str):
        key = sanitize_label_key(key)
        for p in self.pairs:  # leftmost match on the sorted list
            if p[0] == key:
                p[1] = value
                return

    def string(self) -> str:
        return "|".join(f"{k}#$#{v}" for k, v in self.pairs)


def _metric_log(out: list, parent: int, name: str, labels: _KeyValues,
                nsec: int, value: float):
    labels = labels.clone()
    labels.sort()
    out.append((parent, format_metric_name(name), labels.string(),
                nsec, go_fmt_float(float(value))))


def metric_row_to_logservice(out: list, parent: int, row: dict):
    """metricsdata_to_logservice.go:149-277 over one flat metric row
    (one datapoint per row; the bucket/quantile fan-out multiplies)."""
    mtype = row.get("mtype") or ""
    if mtype not in ("gauge", "sum", "histogram", "summary"):
        return
    labels = _KeyValues()
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    for k, v in resource.items():
        labels.append(k, _as_string(v))
    attrs = json.loads(row.get("attributes") or "{}") or {}
    for k, v in attrs.items():
        labels.append(k, _as_string(v))
    name = row.get("name") or ""
    ts = int(row.get("time_unix_nano") or 0)
    if mtype in ("gauge", "sum"):
        vi, vd = row.get("value_int"), row.get("value_double")
        if vd is not None:
            _metric_log(out, parent, name, labels, ts, float(vd))
        elif vi is not None:
            _metric_log(out, parent, name, labels, ts, float(vi))
        return
    if mtype == "histogram":
        _metric_log(out, parent, name + "_sum", labels, ts,
                    float(row.get("hsum") or 0.0))
        _metric_log(out, parent, name + "_count", labels, ts,
                    float(row.get("count") or 0))
        bounds = [go_fmt_float(float(b))
                  for b in (row.get("explicit_bounds") or [])]
        bounds.append("+Inf")
        counts = list(row.get("bucket_counts") or [])
        blabels = labels.clone()
        blabels.append("le", "")
        blabels.sort()
        for i in range(min(len(bounds), len(counts))):
            blabels.replace("le", bounds[i])
            _metric_log(out, parent, name + "_bucket", blabels, ts,
                        float(counts[i]))
        return
    # summary
    _metric_log(out, parent, name + "_sum", labels, ts,
                float(row.get("ssum") or 0.0))
    _metric_log(out, parent, name + "_count", labels, ts,
                float(row.get("count") or 0))
    slabels = labels.clone()
    slabels.append("quantile", "")
    slabels.sort()
    qs = list(row.get("quantiles") or [])
    qvs = list(row.get("quantile_values") or [])
    for q, v in zip(qs, qvs):
        slabels.replace("quantile", go_fmt_float(float(q)))
        _metric_log(out, parent, name, slabels, ts, float(v))


_LOG_COLS = ("sls_time", "host", "service", "resource", "otlp_name",
             "otlp_version", "time_unix_nano", "severity_number",
             "severity_text", "attribute", "content", "flags",
             "traceID", "spanID")
_SPAN_COLS = ("sls_time", "host", "service", "resource", "otlp_name",
              "otlp_version", "traceID", "spanID", "parentSpanID",
              "kind", "name", "links", "logs", "traceState", "start",
              "end", "duration", "attribute", "statusCode",
              "statusMessage")


def _to_table(batch, parent, cols, names):
    out = batch.take(pa.array(parent, pa.int64()))
    # the record fields REPLACE same-named input flat columns
    # (time_unix_nano etc. become the rendered strings)
    collide = [k for k in names if k in out.schema.names]
    if collide:
        out = out.drop_columns(collide)
    for k in names:
        typ = pa.int64() if k == "sls_time" else pa.string()
        out = out.append_column(k, pa.array(cols[k], typ))
    return out


class _LogsToLS:
    def __init__(self, now_ns):
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, cols = [], {k: [] for k in _LOG_COLS}
        for i, row in enumerate(batch.to_pylist()):
            rec = log_to_logservice(row, now_ns=self.now_ns)
            if rec is None:
                continue
            parent.append(i)
            for k in _LOG_COLS:
                cols[k].append(rec["sls_time" if k == "sls_time"
                                   else k])
        return _to_table(batch, parent, cols, _LOG_COLS)


def logs_to_logservice(ds, *, now_ns: int = 0):
    """Flat log rows → LogService content rows (empty bodies drop)."""
    return ds.map_batches(_LogsToLS(now_ns), batch_format="pyarrow",
                          zero_copy_batch=True)


class _SpansToLS:
    def __init__(self, now_ns):
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, cols = [], {k: [] for k in _SPAN_COLS}
        for i, row in enumerate(batch.to_pylist()):
            rec = span_to_logservice(row, now_ns=self.now_ns)
            parent.append(i)
            for k in _SPAN_COLS:
                cols[k].append(rec[k])
        return _to_table(batch, parent, cols, _SPAN_COLS)


def spans_to_logservice(ds, *, now_ns: int = 0):
    """Flat span rows → LogService content rows (1:1)."""
    return ds.map_batches(_SpansToLS(now_ns), batch_format="pyarrow",
                          zero_copy_batch=True)


class _MetricsToLS:
    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list = []
        for i, row in enumerate(batch.to_pylist()):
            metric_row_to_logservice(out, i, row)
        parent = [o[0] for o in out]
        tab = batch.take(pa.array(parent, pa.int64()))
        tab = tab.append_column(
            "__name__", pa.array([o[1] for o in out], pa.string()))
        tab = tab.append_column(
            "__labels__", pa.array([o[2] for o in out], pa.string()))
        tab = tab.append_column(
            "__time_nano__", pa.array([str(o[3]) for o in out],
                                      pa.string()))
        tab = tab.append_column(
            "__value__", pa.array([o[4] for o in out], pa.string()))
        return tab.append_column(
            "sls_time", pa.array([o[3] // 1_000_000_000
                                  for o in out], pa.int64()))


def metrics_to_logservice(ds):
    """Flat metric datapoint rows → LogService metric rows."""
    return ds.map_batches(_MetricsToLS(), batch_format="pyarrow",
                          zero_copy_batch=True)
