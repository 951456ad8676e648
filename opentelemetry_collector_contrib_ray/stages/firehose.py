"""awsfirehosereceiver analogs: CloudWatch metric-stream and
CloudWatch-Logs record decoding.

cwmetrics parity (receiver/awsfirehosereceiver/internal/unmarshaler/
cwmetricstream/unmarshaler.go:55-220 + cwmetric.go):

- one firehose record = newline-delimited JSON metric datums; a datum
  that fails to unmarshal or fails isValid (empty metric_name /
  namespace / unit, or no ``value`` object) is SKIPPED (logged and
  continue, :66-79 — not a whole-record failure); a record with ZERO
  valid datums errors (errInvalidRecords, :149-151).
- each datum becomes one summary point: count/sum and min/max as the
  0/1 quantiles plus every ``p<float>`` percentile key (value /100,
  unparsable suffixes skipped, :117-143); non-number value fields are
  ignored (the Go type assertions, cwmetric.go:58-88).
- resource identity: (metric_stream_name, namespace, account_id,
  region); ``AWS/<svc>`` namespaces (case-insensitive AWS prefix)
  split into service.namespace/service.name, otherwise the namespace
  is the service name (:186-207); the ``InstanceId`` dimension renames
  to service.instance.id (:210-220). The reference groups points into
  resource/metric OTLP structure — the flat rows carry the exact key
  columns, a downstream groupby reproduces the grouping.

cwlogs parity (internal/unmarshaler/cwlog/unmarshaler.go:57-143 +
cwlog.go): one record = one GZIP-compressed JSON document
``{messageType, owner, logGroup, logStream, logEvents:[{id,
timestamp(ms), message}]}``; DATA_MESSAGE requires owner/logGroup/
logStream (specific missing-field errors), CONTROL_MESSAGE yields no
rows, any other messageType errors; one log row per event with the ms
timestamp scaled to ns and body = message.

Execution: per-row wire decode in task-based map_batches (same status
as the OTLP codecs) — block-local fan-out, zero shuffle.
"""

from __future__ import annotations

import gzip
import json

import pyarrow as pa

MAP_TYPE = pa.map_(pa.string(), pa.string())
PCT_TYPE = pa.map_(pa.string(), pa.float64())


def _loads(b):
    return json.loads(b, parse_int=float)


def to_service_attributes(namespace: str):
    """toServiceAttributes (:196-207)."""
    idx = namespace.find("/")
    if idx != -1 and namespace[:idx].lower() == "aws":
        return namespace[:idx], namespace[idx + 1:]
    return None, namespace


def parse_cwmetric_datum(line: str):
    """One JSON datum → row dict, None (skip), or never-error."""
    try:
        d = _loads(line)
    except (ValueError, TypeError):
        return None
    if not isinstance(d, dict):
        return None
    value = d.get("value")
    if not isinstance(value, dict):
        return None  # isSet false
    name = d.get("metric_name") or ""
    namespace = d.get("namespace") or ""
    unit = d.get("unit") or ""
    if not (isinstance(name, str) and name and
            isinstance(namespace, str) and namespace and
            isinstance(unit, str) and unit):
        return None

    def num(key):
        v = value.get(key)
        return float(v) if isinstance(v, float) and \
            not isinstance(v, bool) else 0.0

    percentiles = []
    for k in sorted(value):
        if len(k) > 1 and k[0] == "p" and isinstance(value[k], float):
            try:
                float(k[1:])
            except ValueError:
                continue
            percentiles.append((k, float(value[k])))
    dims = d.get("dimensions") or {}
    if not isinstance(dims, dict):
        dims = {}
    attrs = []
    for k in sorted(dims):
        v = dims[k]
        if not isinstance(v, str):
            continue
        attrs.append(("service.instance.id" if k == "InstanceId" else k,
                      v))
    svc_ns, svc_name = to_service_attributes(namespace)
    ts = d.get("timestamp")
    if ts is None:
        ts_ms = 0
    elif isinstance(ts, float) and not isinstance(ts, bool) and \
            ts == int(ts):
        ts_ms = int(ts)
    else:
        return None  # Go: fractional/typed-wrong int64 fails the datum
    for sk in ("metric_stream_name", "account_id", "region"):
        if d.get(sk) is not None and not isinstance(d[sk], str):
            return None
    return {
        "metric_stream_name": d.get("metric_stream_name") or "",
        "account_id": d.get("account_id") or "",
        "region": d.get("region") or "",
        "namespace": namespace,
        "service_namespace": svc_ns,
        "service_name": svc_name,
        "metric_name": name,
        "unit": unit,
        "dimensions": attrs,
        "timestamp_ms": ts_ms,
        "count": num("count"),
        "sum": num("sum"),
        "min": num("min"),
        "max": num("max"),
        "percentiles": percentiles,
    }


def decode_cwmetrics_record(record: str):
    """Newline-delimited datums → rows list or error str."""
    rows = []
    for line in (record or "").split("\n"):
        if line.strip() == "":
            continue
        row = parse_cwmetric_datum(line)
        if row is not None:
            rows.append(row)
    if not rows:
        return "record format invalid"
    return rows


def decode_cwlogs_record(compressed: bytes):
    """One gzip JSON record → rows list (empty for control) or error."""
    try:
        data = gzip.decompress(compressed or b"")
    except OSError:
        return "failed to decompress record"
    try:
        log = _loads(data)
        if not isinstance(log, dict):
            raise ValueError
    except (ValueError, TypeError):
        return "record format invalid"
    for sk in ("messageType", "owner", "logGroup", "logStream"):
        if log.get(sk) is not None and not isinstance(log[sk], str):
            return "record format invalid"
    mtype = log.get("messageType")
    if mtype == "CONTROL_MESSAGE":
        return []
    if mtype != "DATA_MESSAGE":
        return f"invalid message type {mtype!r}"
    if not log.get("owner"):
        return "cloudwatch log record is missing owner field"
    if not log.get("logGroup"):
        return "cloudwatch log record is missing logGroup field"
    if not log.get("logStream"):
        return "cloudwatch log record is missing logStream field"
    events = log.get("logEvents")
    if events is not None and not isinstance(events, list):
        return "record format invalid"
    rows = []
    for event in events or []:
        if not isinstance(event, dict):
            return "record format invalid"
        ts = event.get("timestamp")
        if ts is None:
            t_ns = 0
        elif isinstance(ts, float) and not isinstance(ts, bool) and \
                ts == int(ts):
            t_ns = int(ts) * 1_000_000
        else:
            return "record format invalid"
        msg = event.get("message")
        if msg is not None and not isinstance(msg, str):
            return "record format invalid"
        rows.append({
            "owner": log["owner"],
            "log_group": log["logGroup"],
            "log_stream": log["logStream"],
            "time_ns": t_ns,
            "body": msg or "",
        })
    return rows


_M_COLS = (("metric_stream_name", pa.string()),
           ("account_id", pa.string()), ("region", pa.string()),
           ("namespace", pa.string()),
           ("service_namespace", pa.string()),
           ("service_name", pa.string()), ("metric_name", pa.string()),
           ("unit", pa.string()), ("dimensions", MAP_TYPE),
           ("timestamp_ms", pa.int64()), ("count", pa.float64()),
           ("sum", pa.float64()), ("min", pa.float64()),
           ("max", pa.float64()), ("percentiles", PCT_TYPE))

_L_COLS = (("owner", pa.string()), ("log_group", pa.string()),
           ("log_stream", pa.string()), ("time_ns", pa.int64()),
           ("body", pa.string()))


class _ParseRecords:
    def __init__(self, col: str, on_error: str, decode, schema):
        self.col = col
        self.on_error = on_error
        self.decode = decode
        self.schema = schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        records = batch.column(self.col).to_pylist()
        parent, cols = [], {name: [] for name, _ in self.schema}
        cols["error"] = []
        for i, rec in enumerate(records):
            res = self.decode(rec)
            if isinstance(res, str):
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, typ in self.schema:
                    cols[name].append([] if pa.types.is_map(typ)
                                      else None)
                cols["error"].append(res)
                continue
            for row in res:
                parent.append(i)
                for name, _ in self.schema:
                    cols[name].append(row[name])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in self.schema + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_cwmetrics(ds, record_col: str = "record", *,
                    on_error: str = "drop"):
    """CloudWatch metric-stream JSON records → one summary row per
    datum (block-local fan-out, zero shuffle)."""
    return ds.map_batches(
        _ParseRecords(record_col, on_error, decode_cwmetrics_record,
                      _M_COLS),
        batch_format="pyarrow", zero_copy_batch=True)


def parse_cwlogs(ds, record_col: str = "record_gz", *,
                 on_error: str = "drop"):
    """CloudWatch-Logs gzip records → one log row per event
    (block-local fan-out, zero shuffle)."""
    return ds.map_batches(
        _ParseRecords(record_col, on_error, decode_cwlogs_record,
                      _L_COLS),
        batch_format="pyarrow", zero_copy_batch=True)
