"""splunkhecreceiver + splunkhecexporter analogs: Splunk HEC JSON events.

Receiver parity (receiver/splunkhecreceiver/splunk_to_logdata.go:32-73,
splunkhec_to_metricdata.go:21-133,137-159 and
internal/splunk/common.go:52-137):

- event JSON: ``{"time", "event", "fields", "host", "source",
  "sourcetype", "index"}``; ``time`` may be a float or a numeric string
  (ParseFloat — a non-numeric string fails the event, common.go:124-133).
- Go json.Unmarshal decodes every JSON number into float64 — this
  restatement does the same (``parse_int=float``), so the receiver's
  int64 branches are unreachable on the JSON wire (documented).
- convertTimestamp (splunkhec_to_metricdata.go:137-159): >=1e16 ns,
  >=1e13 µs, >=1e10 ms, else seconds — float multiply then uint64
  truncation, reproduced bit-for-bit in float64. time==0/missing means
  "stamp at indexing time"; a batch engine has none, so null here
  (same documented deviation as the wavefront/influx stages).
- logs: body = the event payload (strings kept raw, other values
  canonical JSON), metadata host/source/sourcetype/index only when
  non-empty, record attributes = ``fields`` in sorted-key order
  (splunk_to_logdata.go:59-69); the engine's flat map column
  stringifies attr values (strings raw, bool true/false, numbers via
  Go %v formatting).
- metrics: GetMetricValues (common.go:88-100) — a ``metric_name``
  field names ONE metric valued by ``_value`` (the Go string
  assertion on a non-string metric_name is an error row here);
  otherwise every ``metric_name:<name>`` field (regex common.go:39,
  name must not itself contain "metric_name") is a metric. Labels =
  remaining fields except metric_name*/_value/empty-key/nil, values
  %v-formatted (buildAttributes, splunkhec_to_metricdata.go:154-168).
  String values best-effort ParseFloat else the point is dropped
  (convertString :91-101); bool/list/map values drop. Go emits the
  values map in random order — sorted by metric name here
  (deterministic, documented).

Exporter parity (exporter/splunkhecexporter/logdata_to_splunk.go:54-160):
null/empty body rejects the record; host defaults to "unknown"
(metricdata_to_splunk.go:22); com.splunk.source / com.splunk.sourcetype
/ com.splunk.index / host.name columns map to the envelope;
severity text/number become otel.log.severity.text/number fields;
non-empty, non-zero span/trace ids become span_id/trace_id fields;
time = Duration.Round(ms).Seconds() (half away from zero). The JSON
field order and omitempty semantics match Go's struct marshal
(event, fields, host, source, sourcetype, index, time; fields maps
in sorted-key order). The flat engine model has no nested attribute
values, so mergeValue's flatten branch (:140-185) is structurally
unreachable and not ported.

Execution shape: per-row JSON wire decode/encode inside task-based
map_batches (same status as the OTLP-JSON reader) — block-local,
zero shuffle; the metrics path fans out one row per metric.
"""

from __future__ import annotations

import json
import math
import re

import numpy as np
import pyarrow as pa

MAP_TYPE = pa.map_(pa.string(), pa.string())

# internal/splunk/common.go:39
_METRIC_NAME_RE = re.compile(r"^metric_name:([A-Za-z.:][A-Za-z0-9_.:\-]*)$")

_F64 = np.float64


def hec_convert_timestamp(t: float):
    """convertTimestamp restated with explicit float64 ops. Returns ns
    int, or None for t == 0 (missing/unknown)."""
    if t == 0:
        return None
    t = _F64(t)
    if t >= _F64(10_000_000_000_000_000):
        return int(np.uint64(t))
    if t >= _F64(10_000_000_000_000):
        return int(np.uint64(t * _F64(1e3)))
    if t >= _F64(10_000_000_000):
        return int(np.uint64(t * _F64(1e6)))
    return int(np.uint64(t * _F64(1e9)))


def ns_to_epoch_ms_seconds(ns: int) -> float:
    """nanoTimestampToEpochMilliseconds: Duration.Round(time.Millisecond)
    (half away from zero) then .Seconds()."""
    r = ns % 1_000_000
    base = ns - r
    if r * 2 >= 1_000_000:
        base += 1_000_000
    return float(_F64(base) / _F64(1e9))


def go_json_dumps(obj) -> str:
    """encoding/json Marshal text shape: UTF-8 kept raw, HTML chars
    escaped (&, <, > → \\u0026 \\u003c \\u003e), compact separators.
    Safe as a global replace — those characters only occur inside JSON
    string literals."""
    s = json.dumps(obj, separators=(",", ":"), ensure_ascii=False)
    return (s.replace("&", "\\u0026").replace("<", "\\u003c")
             .replace(">", "\\u003e"))


def go_fmt_float(v: float) -> str:
    """Go fmt %v / strconv.FormatFloat(v, 'g', -1, 64): shortest
    round-trip digits; scientific form iff the first-digit exponent is
    < -4 or >= 6 (strconv/ftoa.go: shortest mode pins eprec to 6 —
    NOT encoding/json's ±1e21/1e-6 thresholds)."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    s = repr(float(v))
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "e" in s:
        m, _, e = s.partition("e")
        exp = int(e)
    else:
        m, exp = s, 0
    ip, _, fp = m.partition(".")
    digits = ip + fp
    point_exp = exp - len(fp)          # value = digits × 10^point_exp
    digits = digits.lstrip("0")
    trail = len(digits) - len(digits.rstrip("0"))
    digits = digits.rstrip("0")
    point_exp += trail
    if not digits:
        return "-0" if neg else "0"
    first_exp = len(digits) - 1 + point_exp
    if first_exp < -4 or first_exp >= 6:
        mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        out = f"{mant}e{'+' if first_exp >= 0 else '-'}{abs(first_exp):02d}"
    elif point_exp >= 0:
        out = digits + "0" * point_exp
    elif first_exp >= 0:
        out = digits[:first_exp + 1] + "." + digits[first_exp + 1:]
    else:
        out = "0." + "0" * (-first_exp - 1) + digits
    return "-" + out if neg else out


def go_v(val) -> str:
    """Go fmt %v over JSON-decoded values (maps print sorted keys)."""
    if val is None:
        return "<nil>"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        return go_fmt_float(val)
    if isinstance(val, str):
        return val
    if isinstance(val, list):
        return "[" + " ".join(go_v(x) for x in val) + "]"
    if isinstance(val, dict):
        return ("map[" +
                " ".join(f"{k}:{go_v(val[k])}" for k in sorted(val)) + "]")
    return str(val)


def _stringify_attr(val) -> str:
    """Engine map-column serialization of a typed attr value."""
    if isinstance(val, str):
        return val
    return go_v(val)


def _loads(doc: str):
    return json.loads(doc, parse_int=float)


def _decode_event(doc: str):
    """internal/splunk Event.UnmarshalJSON. Returns dict or error str."""
    try:
        raw = _loads(doc)
    except (ValueError, TypeError):
        return "invalid JSON event"
    if not isinstance(raw, dict):
        return "invalid JSON event"
    t = raw.get("time")
    if isinstance(t, str):
        try:
            t = float(t)  # Go ParseFloat (inf/nan spellings included)
        except ValueError:
            return "cannot parse event time"
    elif isinstance(t, bool) or not isinstance(t, (int, float)):
        t = 0.0  # any other JSON type leaves Time at zero (common.go:124)
    fields = raw.get("fields")
    if fields is not None and not isinstance(fields, dict):
        return "invalid fields"
    return {
        "time": float(t or 0.0),
        "event": raw.get("event"),
        "fields": fields or {},
        "host": raw.get("host") or "",
        "source": raw.get("source") or "",
        "sourcetype": raw.get("sourcetype") or "",
        "index": raw.get("index") or "",
    }


def _body_str(event) -> str | None:
    if event is None:
        return None
    if isinstance(event, str):
        return event
    return json.dumps(event, sort_keys=True, separators=(",", ":"))


def hec_event_to_log_row(doc: str):
    """splunkHecToLogData for one event. Returns dict or error str."""
    ev = _decode_event(doc)
    if isinstance(ev, str):
        return ev
    fields = [(k, _stringify_attr(ev["fields"][k]))
              for k in sorted(ev["fields"])]
    return {
        "host": ev["host"] or None,
        "source": ev["source"] or None,
        "sourcetype": ev["sourcetype"] or None,
        "index": ev["index"] or None,
        "body": _body_str(ev["event"]),
        "time_ns": hec_convert_timestamp(ev["time"]),
        "fields": fields,
    }


def get_metric_values(fields: dict):
    """Event.GetMetricValues (common.go:88-100). Returns dict or error."""
    if "metric_name" in fields:
        name = fields["metric_name"]
        if not isinstance(name, str):
            return "metric_name is not a string"
        return {name: fields.get("_value")}
    values = {}
    for k, v in fields.items():
        m = _METRIC_NAME_RE.match(k)
        if m and "metric_name" not in m.group(1):
            values[m.group(1)] = v
    return values


def hec_event_to_metric_rows(doc: str):
    """splunkHecToMetricsData for one event. Returns (rows, dropped)
    or error str; rows sorted by metric name (Go map order is random)."""
    ev = _decode_event(doc)
    if isinstance(ev, str):
        return ev
    values = get_metric_values(ev["fields"])
    if isinstance(values, str):
        return values
    labels = []
    for k in sorted(ev["fields"]):
        if k.startswith("metric_name") or k == "_value":
            continue
        v = ev["fields"][k]
        if k == "" or v is None:
            continue
        labels.append((k, go_v(v)))
    ts = hec_convert_timestamp(ev["time"])
    rows, dropped = [], 0
    for name in sorted(values):
        v = values[name]
        if isinstance(v, bool):
            dropped += 1
            continue
        if isinstance(v, (int, float)):
            dbl = float(v)
        elif isinstance(v, str):
            try:
                dbl = float(v)
            except ValueError:
                dropped += 1
                continue
        else:
            dropped += 1
            continue
        rows.append({
            "name": name,
            "value_double": dbl,
            "time_ns": ts,
            "host": ev["host"] or None,
            "source": ev["source"] or None,
            "sourcetype": ev["sourcetype"] or None,
            "index": ev["index"] or None,
            "attributes": labels,
        })
    return rows, dropped


class _ParseHecLogs:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        keep_idx, cols = [], {
            "host": [], "source": [], "sourcetype": [], "index": [],
            "body": [], "time_ns": [], "fields": [], "error": []}
        for i, doc in enumerate(docs):
            row = hec_event_to_log_row(doc if doc is not None else "")
            if isinstance(row, str):
                if self.on_error == "drop":
                    continue
                keep_idx.append(i)
                for k in ("host", "source", "sourcetype", "index",
                          "body", "time_ns"):
                    cols[k].append(None)
                cols["fields"].append([])
                cols["error"].append(row)
                continue
            keep_idx.append(i)
            for k in ("host", "source", "sourcetype", "index",
                      "body", "time_ns", "fields"):
                cols[k].append(row[k])
            cols["error"].append(None)
        out = batch.take(pa.array(keep_idx, pa.int64()))
        for name, typ in (("host", pa.string()), ("source", pa.string()),
                          ("sourcetype", pa.string()),
                          ("index", pa.string()), ("body", pa.string()),
                          ("time_ns", pa.int64()), ("fields", MAP_TYPE),
                          ("error", pa.string())):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


class _ParseHecMetrics:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {
            "name": [], "value_double": [], "time_ns": [], "host": [],
            "source": [], "sourcetype": [], "index": [],
            "attributes": [], "error": []}
        for i, doc in enumerate(docs):
            res = hec_event_to_metric_rows(doc if doc is not None else "")
            if isinstance(res, str):
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for k in ("name", "value_double", "time_ns", "host",
                          "source", "sourcetype", "index"):
                    cols[k].append(None)
                cols["attributes"].append([])
                cols["error"].append(res)
                continue
            rows, _dropped = res
            for row in rows:
                parent.append(i)
                for k in ("name", "value_double", "time_ns", "host",
                          "source", "sourcetype", "index", "attributes"):
                    cols[k].append(row[k])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in (("name", pa.string()),
                          ("value_double", pa.float64()),
                          ("time_ns", pa.int64()), ("host", pa.string()),
                          ("source", pa.string()),
                          ("sourcetype", pa.string()),
                          ("index", pa.string()),
                          ("attributes", MAP_TYPE),
                          ("error", pa.string())):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_splunk_hec_logs(ds, json_col: str = "event_json", *,
                          on_error: str = "drop"):
    """HEC events → log rows (block-local, zero shuffle)."""
    return ds.map_batches(_ParseHecLogs(json_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


def parse_splunk_hec_metrics(ds, json_col: str = "event_json", *,
                             on_error: str = "drop"):
    """HEC metric events → one row per metric (block-local fan-out)."""
    return ds.map_batches(_ParseHecMetrics(json_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


_ZEROS_RE = re.compile(r"^0+$")


def _id_present(v) -> bool:
    return bool(v) and _ZEROS_RE.match(v) is None


def log_row_to_hec(body, time_ns, host, source, sourcetype, index,
                   severity_text, severity_number, trace_id, span_id,
                   extra_fields) -> str | None:
    """mapLogRecordToSplunkEvent for one flat row → HEC JSON string
    (None when the body is empty — Splunk rejects those)."""
    if body is None or body == "":
        return None
    fields: dict = {}
    if _id_present(span_id):
        fields["span_id"] = span_id
    if _id_present(trace_id):
        fields["trace_id"] = trace_id
    if severity_text:
        fields["otel.log.severity.text"] = severity_text
    if severity_number is not None and severity_number != 0:
        fields["otel.log.severity.number"] = int(severity_number)
    if extra_fields:
        for k, v in extra_fields:
            fields[k] = v
    out: dict = {"event": body}
    if fields:
        out["fields"] = {k: fields[k] for k in sorted(fields)}
    out["host"] = host if host else "unknown"
    if source:
        out["source"] = source
    if sourcetype:
        out["sourcetype"] = sourcetype
    if index:
        out["index"] = index
    t = ns_to_epoch_ms_seconds(int(time_ns)) if time_ns else 0.0
    if t != 0.0:
        out["time"] = t
    return go_json_dumps(out)


class _LogsToHec:
    def __init__(self, colmap: dict, fields_cols: tuple):
        self.colmap = colmap
        self.fields_cols = fields_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows

        def col(key):
            name = self.colmap.get(key)
            if name and name in batch.column_names:
                return batch.column(name).to_pylist()
            return [None] * n

        body = col("body")
        time_ns = col("time_ns")
        host = col("host")
        source = col("source")
        sourcetype = col("sourcetype")
        index = col("index")
        sev_t = col("severity_text")
        sev_n = col("severity_number")
        tid = col("trace_id")
        sid = col("span_id")
        extras = [[(c, v) for c, v in zip(self.fields_cols, vals)
                   if v is not None]
                  for vals in zip(*(batch.column(c).to_pylist()
                                    for c in self.fields_cols))] \
            if self.fields_cols else [[]] * n
        docs, keep = [], []
        for i in range(n):
            doc = log_row_to_hec(body[i], time_ns[i], host[i], source[i],
                                 sourcetype[i], index[i], sev_t[i],
                                 sev_n[i], tid[i], sid[i], extras[i])
            if doc is not None:
                docs.append(doc)
                keep.append(i)
        out = batch.take(pa.array(keep, pa.int64()))
        arr = pa.array(docs, pa.string())
        if "event_json" in out.column_names:
            out = out.set_column(out.column_names.index("event_json"),
                                 "event_json", arr)
        else:
            out = out.append_column("event_json", arr)
        return out


def logs_to_splunk_hec(ds, *, body_col: str = "body",
                       time_ns_col: str | None = None,
                       host_col: str | None = None,
                       source_col: str | None = None,
                       sourcetype_col: str | None = None,
                       index_col: str | None = None,
                       severity_text_col: str | None = None,
                       severity_number_col: str | None = None,
                       trace_id_col: str | None = None,
                       span_id_col: str | None = None,
                       fields_cols: tuple = ()):
    """Flat log rows → HEC JSON envelope column ``event_json``
    (rows with empty bodies are rejected, like the exporter)."""
    colmap = {"body": body_col, "time_ns": time_ns_col,
              "host": host_col, "source": source_col,
              "sourcetype": sourcetype_col, "index": index_col,
              "severity_text": severity_text_col,
              "severity_number": severity_number_col,
              "trace_id": trace_id_col, "span_id": span_id_col}
    return ds.map_batches(_LogsToHec(colmap, tuple(fields_cols)),
                          batch_format="pyarrow", zero_copy_batch=True)
