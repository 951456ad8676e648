"""cloudfoundryreceiver analog: loggregator v2 Envelope JSON → flat
log / metric rows.

Parity with receiver/cloudfoundryreceiver/converter.go + receiver.go:

- logs (convertEnvelopeToLogs:82-106): one record per Log envelope —
  body = the payload bytes as string, OUT → Info(9)/"Info" and ERR →
  Error(17)/"Error" (SeverityNumber.String() texts), any other type
  errors the envelope (dropped here with an error column on
  on_error="keep"); timestamp = the envelope's ns timestamp,
  observed = the receiver start wall-clock (the ``observed_ns``
  config here).
- metrics (convertEnvelopeToMetrics:47-80): Counter → ONE Sum metric
  named ``<tags.origin>.<counter.name>`` (an absent origin still
  dots: ".name") with the uint64 total as a DOUBLE and default
  (unspecified/non-monotonic) sum flags; Gauge → one Gauge metric
  per entry of the gauge map; both stamp the envelope timestamp and
  the receiver-start start-timestamp.
- attributes (:108-144 + the cloudfoundry.resourceAttributes.allow
  gate, Beta = ON by default): gate ON → record attrs = the
  ``org.cloudfoundry.``-prefixed tags NOT in ResourceAttributesKeys,
  resource attrs = the listed tags + source_id + instance_id (both
  prefixed); gate OFF (legacy) → ALL tags + source_id + instance_id
  prefixed into the record attrs, resource attrs empty.  Scope name
  is the generated metadata ScopeName.
- carrier: proto3-JSON of the loggregator_v2.Envelope (base64 log
  payloads, string uint64s, enum names) — the RLP gRPC stream is the
  ingest transport, and the receiver's per-interval resource
  regrouping (reflect.DeepEqual scan) is container layout with no
  row effect.

Execution: per-row JSON decode task maps, fan-out per gauge entry,
block-local, zero shuffle.
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa

SCOPE_NAME = ("github.com/open-telemetry/opentelemetry-collector-"
              "contrib/receiver/cloudfoundryreceiver")
ATTR_PREFIX = "org.cloudfoundry."

RESOURCE_ATTRIBUTES_KEYS = frozenset((
    "index", "ip", "deployment", "id", "job", "product",
    "instance_group", "instance_id", "origin", "system_domain",
    "source_id", "source_type", "process_type", "process_id",
    "process_instance_id"))


def _split_attrs(env: dict, allow_resource: bool) -> tuple[str, str]:
    tags = env.get("tags") or {}
    if not allow_resource:
        attrs = {ATTR_PREFIX + k: str(v) for k, v in tags.items()}
        if env.get("sourceId"):
            attrs[ATTR_PREFIX + "source_id"] = env["sourceId"]
        if env.get("instanceId"):
            attrs[ATTR_PREFIX + "instance_id"] = env["instanceId"]
        return json.dumps(attrs, sort_keys=True), "{}"
    attrs = {ATTR_PREFIX + k: str(v) for k, v in tags.items()
             if k not in RESOURCE_ATTRIBUTES_KEYS}
    res = {ATTR_PREFIX + k: str(v) for k, v in tags.items()
           if k in RESOURCE_ATTRIBUTES_KEYS}
    if env.get("sourceId"):
        res[ATTR_PREFIX + "source_id"] = env["sourceId"]
    if env.get("instanceId"):
        res[ATTR_PREFIX + "instance_id"] = env["instanceId"]
    return json.dumps(attrs, sort_keys=True), \
        json.dumps(res, sort_keys=True)


def _payload_str(log: dict) -> str:
    p = log.get("payload") or ""
    try:
        return base64.b64decode(p, validate=True).decode(
            "utf-8", errors="replace")
    except (ValueError, TypeError):
        return str(p)


class _ParseCfLogs:
    def __init__(self, doc_col, observed_ns, allow_resource,
                 on_error):
        self.doc_col = doc_col
        self.observed_ns = observed_ns
        self.allow_resource = allow_resource
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k in (
            "time_unix_nano", "observed_time_unix_nano",
            "severity_number", "severity_text", "body", "attributes",
            "resource_attributes", "scope_name", "error")}
        for i, doc in enumerate(docs):
            err = None
            try:
                env = json.loads(doc if doc is not None else "")
                if not isinstance(env, dict):
                    raise ValueError("not an envelope")
                log = env.get("log")
                if not isinstance(log, dict):
                    raise ValueError("not a log envelope")
                typ = log.get("type") or "OUT"  # proto3 zero value
                if typ == "OUT":
                    sev = (9, "Info")
                elif typ == "ERR":
                    sev = (17, "Error")
                else:
                    raise ValueError(
                        f"unsupported envelope log type: {typ}")
                attrs, res = _split_attrs(env, self.allow_resource)
                parent.append(i)
                cols["time_unix_nano"].append(
                    int(env.get("timestamp") or 0))
                cols["observed_time_unix_nano"].append(
                    self.observed_ns)
                cols["severity_number"].append(sev[0])
                cols["severity_text"].append(sev[1])
                cols["body"].append(_payload_str(log))
                cols["attributes"].append(attrs)
                cols["resource_attributes"].append(res)
                cols["scope_name"].append(SCOPE_NAME)
                cols["error"].append(None)
            except ValueError as e:
                err = str(e)
                if self.on_error == "keep":
                    parent.append(i)
                    for k in cols:
                        cols[k].append(None if k != "error" else err)
        out = batch.take(pa.array(parent, pa.int64()))
        out = out.append_column(
            "time_unix_nano",
            pa.array(cols["time_unix_nano"], pa.int64()))
        out = out.append_column(
            "observed_time_unix_nano",
            pa.array(cols["observed_time_unix_nano"], pa.int64()))
        out = out.append_column(
            "severity_number",
            pa.array(cols["severity_number"], pa.int32()))
        for k in ("severity_text", "body", "attributes",
                  "resource_attributes", "scope_name", "error"):
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        return out


def parse_cloudfoundry_logs(ds, doc_col: str = "envelope", *,
                            observed_ns: int = 0,
                            allow_resource_attributes: bool = True,
                            on_error: str = "drop"):
    """Log envelopes → flat log rows (≤1 per doc)."""
    return ds.map_batches(
        _ParseCfLogs(doc_col, observed_ns, allow_resource_attributes,
                     on_error),
        batch_format="pyarrow", zero_copy_batch=True)


class _ParseCfMetrics:
    def __init__(self, doc_col, start_ns, allow_resource):
        self.doc_col = doc_col
        self.start_ns = start_ns
        self.allow_resource = allow_resource

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k in (
            "name", "mtype", "value_double", "time_unix_nano",
            "start_time_unix_nano", "attributes",
            "resource_attributes", "scope_name")}
        for i, doc in enumerate(docs):
            try:
                env = json.loads(doc if doc is not None else "")
            except ValueError:
                continue
            if not isinstance(env, dict):
                continue
            prefix = str((env.get("tags") or {}).get("origin")
                         or "") + "."
            ts = int(env.get("timestamp") or 0)
            attrs, res = _split_attrs(env, self.allow_resource)

            def emit(name, mtype, value):
                parent.append(i)
                cols["name"].append(prefix + name)
                cols["mtype"].append(mtype)
                cols["value_double"].append(float(value))
                cols["time_unix_nano"].append(ts)
                cols["start_time_unix_nano"].append(self.start_ns)
                cols["attributes"].append(attrs)
                cols["resource_attributes"].append(res)
                cols["scope_name"].append(SCOPE_NAME)

            counter = env.get("counter")
            if isinstance(counter, dict):
                emit(counter.get("name") or "", "sum",
                     int(counter.get("total") or 0))
            gauge = env.get("gauge")
            if isinstance(gauge, dict):
                for name, gv in (gauge.get("metrics") or {}).items():
                    emit(name, "gauge",
                         float((gv or {}).get("value") or 0.0))
        out = batch.take(pa.array(parent, pa.int64()))
        for k in ("name", "mtype"):
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        out = out.append_column(
            "value_double", pa.array(cols["value_double"],
                                     pa.float64()))
        for k in ("time_unix_nano", "start_time_unix_nano"):
            out = out.append_column(k, pa.array(cols[k], pa.int64()))
        for k in ("attributes", "resource_attributes", "scope_name"):
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        return out


def parse_cloudfoundry_metrics(ds, doc_col: str = "envelope", *,
                               start_ns: int = 0,
                               allow_resource_attributes: bool = True):
    """Counter/Gauge envelopes → flat metric rows (fan-out)."""
    return ds.map_batches(
        _ParseCfMetrics(doc_col, start_ns, allow_resource_attributes),
        batch_format="pyarrow", zero_copy_batch=True)
