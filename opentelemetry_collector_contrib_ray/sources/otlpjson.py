"""OTLP-JSON file source — otlpjsonfilereceiver / otlpjsonconnector analog.

Reference semantics (receiver/otlpjsonfilereceiver/file.go:41-95,
connector/otlpjsonconnector): read files of OTLP-JSON documents (one
``resourceLogs`` export per line), unmarshal, and emit the records into the
pipeline.  The pdata forest (ResourceLogs -> ScopeLogs -> LogRecord) is
FLATTENED to one row per LogRecord with resource/scope context denormalized
onto the row — the same flatten-for-processing shape the transformprocessor
uses internally (FlattenLogs, SURVEY.md §1.4).

Ray-Data-first: ``ray.data.read_text`` (one line = one export document) →
``map_batches`` JSON decode per batch.  Attributes maps are emitted as JSON
string columns (the open-schema escape hatch from SURVEY.md §1.2).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

FLAT_SCHEMA = pa.schema(
    [
        ("time_unix_nano", pa.uint64()),
        ("observed_time_unix_nano", pa.uint64()),
        ("severity_number", pa.int32()),
        ("severity_text", pa.string()),
        ("body", pa.string()),
        ("trace_id", pa.string()),
        ("span_id", pa.string()),
        ("attributes", pa.string()),           # JSON-encoded map
        ("resource_attributes", pa.string()),  # JSON-encoded map
        ("scope_name", pa.string()),
    ]
)


def _any_value(v: dict):
    """Decode an OTLP AnyValue {stringValue|intValue|...} to a python value."""
    if not isinstance(v, dict):
        return v
    for k in ("stringValue", "boolValue"):
        if k in v:
            return v[k]
    if "intValue" in v:
        return int(v["intValue"])  # OTLP-JSON encodes int64 as a string
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "arrayValue" in v:
        return [_any_value(x) for x in v["arrayValue"].get("values", [])]
    if "kvlistValue" in v:
        return _kvlist(v["kvlistValue"].get("values", []))
    return None


def _kvlist(kvs: list) -> dict:
    return {kv["key"]: _any_value(kv.get("value")) for kv in kvs}


def flatten_otlp_logs(doc: dict) -> list[dict]:
    """One OTLP-JSON logs export document -> flat rows (one per LogRecord)."""
    rows = []
    for rl in doc.get("resourceLogs", []):
        res_attrs = _kvlist(rl.get("resource", {}).get("attributes", []))
        for sl in rl.get("scopeLogs", []):
            scope_name = sl.get("scope", {}).get("name")
            for lr in sl.get("logRecords", []):
                body = lr.get("body")
                rows.append(
                    {
                        "time_unix_nano": int(lr.get("timeUnixNano", 0)),
                        "observed_time_unix_nano": int(
                            lr.get("observedTimeUnixNano", 0)
                        ),
                        "severity_number": int(lr.get("severityNumber", 0)),
                        "severity_text": lr.get("severityText"),
                        "body": (
                            _any_value(body) if isinstance(body, dict) else body
                        )
                        if body is not None
                        else None,
                        "trace_id": lr.get("traceId"),
                        "span_id": lr.get("spanId"),
                        "attributes": json.dumps(
                            _kvlist(lr.get("attributes", [])), sort_keys=True
                        ),
                        "resource_attributes": json.dumps(res_attrs, sort_keys=True),
                        "scope_name": scope_name,
                    }
                )
    return rows


class _DecodeBatch:
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column("text").to_pylist():
            if not line or not line.strip():
                continue
            rows.append(json.loads(line))
        flat = [r for doc in rows for r in flatten_otlp_logs(doc)]
        if not flat:
            return FLAT_SCHEMA.empty_table()
        cols = {
            f.name: pa.array(
                [str(r[f.name]) if f.name == "body" and r[f.name] is not None
                 else r[f.name] for r in flat],
                f.type,
            )
            for f in FLAT_SCHEMA
        }
        return pa.table(cols)


def read_otlp_json_logs(paths: "str | list[str]") -> ray.data.Dataset:
    """Read OTLP-JSON-lines log files into a flat one-row-per-LogRecord Dataset."""
    ds = ray.data.read_text(paths)
    return ds.map_batches(_DecodeBatch(), batch_format="pyarrow", zero_copy_batch=True)


# --- OTLP-JSON export (fileexporter `format: json` analog) -------------------

def _encode_any_value(v) -> dict:
    """Python value -> OTLP-JSON AnyValue (exact inverse of :func:`_any_value`).

    Proto3 JSON mapping: int64 serializes as a STRING (the reader's
    ``int(v["intValue"])`` expects that); bool checked before int because
    ``bool`` subclasses ``int`` in Python.
    """
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    if isinstance(v, str):
        return {"stringValue": v}
    if isinstance(v, list):
        return {"arrayValue": {"values": [_encode_any_value(x) for x in v]}}
    if isinstance(v, dict):
        return {"kvlistValue": {"values": _encode_kvlist(v)}}
    return {}


def _encode_kvlist(d: dict) -> list:
    return [{"key": k, "value": _encode_any_value(v)} for k, v in sorted(d.items())]


class OtlpJsonWrite:
    """Encode flat LogRecord rows back to OTLP-JSON export documents and write
    one ``.jsonl`` shard per batch — the fileexporter ``format: json`` analog
    (exporter/fileexporter/marshaller.go:28-31 plog.JSONMarshaler,
    file_exporter.go one-line-per-export; README.md:100 "Each line in the
    file is a JSON object").

    The pdata forest is rebuilt from the flat columns: rows group by
    ``resource_attributes`` into ResourceLogs and by ``scope_name`` into
    ScopeLogs, so ``read_otlp_json_logs(write_otlp_json_logs(ds))`` is an
    exact row-level round-trip (pinned by tests/test_otlp_roundtrip.py).

    Per-row Python encode is acceptable here: JSON serialization is
    inherently per-record and this is a terminal export stage bounded by
    output I/O, not a hot transform.  Each task writes its own shard
    (resumable-output convention — the out_dir ACCUMULATES like
    write_routed; rm it before a fresh run).
    """

    MANIFEST_SCHEMA = pa.schema([("path", pa.string()), ("rows", pa.int64())])

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import uuid

        if batch.num_rows == 0:
            return self.MANIFEST_SCHEMA.empty_table()
        cols = {name: batch.column(name).to_pylist() if name in batch.column_names
                else [None] * batch.num_rows
                for name in FLAT_SCHEMA.names}
        # group rows: resource_attributes -> scope_name -> [log records]
        forest: dict[str, dict[str, list]] = {}
        for i in range(batch.num_rows):
            res_key = cols["resource_attributes"][i] or "{}"
            scope = cols["scope_name"][i]
            lr: dict = {}
            if cols["time_unix_nano"][i]:
                lr["timeUnixNano"] = str(cols["time_unix_nano"][i])
            if cols["observed_time_unix_nano"][i]:
                lr["observedTimeUnixNano"] = str(cols["observed_time_unix_nano"][i])
            if cols["severity_number"][i]:
                lr["severityNumber"] = int(cols["severity_number"][i])
            if cols["severity_text"][i] is not None:
                lr["severityText"] = cols["severity_text"][i]
            if cols["body"][i] is not None:
                lr["body"] = {"stringValue": cols["body"][i]}
            if cols["trace_id"][i] is not None:
                lr["traceId"] = cols["trace_id"][i]
            if cols["span_id"][i] is not None:
                lr["spanId"] = cols["span_id"][i]
            attrs = json.loads(cols["attributes"][i]) if cols["attributes"][i] else {}
            if attrs:
                lr["attributes"] = _encode_kvlist(attrs)
            forest.setdefault(res_key, {}).setdefault(scope, []).append(lr)

        resource_logs = []
        for res_key in sorted(forest):
            scope_logs = []
            for scope in sorted(forest[res_key], key=lambda s: s or ""):
                sl: dict = {"logRecords": forest[res_key][scope]}
                if scope is not None:
                    sl["scope"] = {"name": scope}
                scope_logs.append(sl)
            rl: dict = {"scopeLogs": scope_logs}
            res_attrs = json.loads(res_key)
            if res_attrs:
                rl["resource"] = {"attributes": _encode_kvlist(res_attrs)}
            resource_logs.append(rl)
        doc = json.dumps({"resourceLogs": resource_logs}, sort_keys=True,
                         separators=(",", ":"))

        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"export-{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write(doc + "\n")
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def write_otlp_json_logs(ds: ray.data.Dataset, out_dir: str):
    """Write a flat-schema log Dataset as OTLP-JSON lines (one export doc per
    block) under ``out_dir``; returns the materialized shard manifest
    (bounded: one row per block)."""
    manifest = ds.map_batches(OtlpJsonWrite(out_dir), batch_format="pyarrow",
                              zero_copy_batch=True)
    return manifest.materialize()


# =============================================================================
# Traces / Metrics OTLP-JSON — otlpjsonfilereceiver handles all three
# signals (receiver/otlpjsonfilereceiver/file.go:41-95 unmarshals logs,
# metrics AND traces); same proto3 JSON mapping (camelCase keys,
# int64/uint64 as strings, trace/span ids as hex, enums as numbers).
# Flat schemas are shared with the proto codecs (otlpproto.SPAN_FLAT_SCHEMA
# / METRIC_FLAT_SCHEMA), so JSON and proto exports are interchangeable
# row-for-row (pinned by tests/test_otlp_json_signals.py).
# =============================================================================


def flatten_otlp_traces(doc: dict) -> list[dict]:
    """One OTLP-JSON traces export document -> flat rows (one per Span)."""
    rows = []
    for rs in doc.get("resourceSpans", []):
        res_attrs = _kvlist(rs.get("resource", {}).get("attributes", []))
        for ss in rs.get("scopeSpans", []):
            scope_name = ss.get("scope", {}).get("name")
            for sp in ss.get("spans", []):
                status = sp.get("status", {})
                rows.append({
                    "trace_id": sp.get("traceId"),
                    "span_id": sp.get("spanId"),
                    "parent_span_id": sp.get("parentSpanId"),
                    "trace_state": sp.get("traceState"),
                    "span_name": sp.get("name"),
                    "span_kind": int(sp.get("kind", 0)),
                    "start_time_unix_nano": int(
                        sp.get("startTimeUnixNano", 0)),
                    "end_time_unix_nano": int(sp.get("endTimeUnixNano", 0)),
                    "status_code": int(status.get("code", 0)),
                    "status_message": status.get("message"),
                    "attributes": json.dumps(
                        _kvlist(sp.get("attributes", [])), sort_keys=True),
                    "resource_attributes": json.dumps(res_attrs,
                                                      sort_keys=True),
                    "scope_name": scope_name,
                })
    return rows


def flatten_otlp_metrics(doc: dict) -> list[dict]:
    """One OTLP-JSON metrics export document -> flat rows (one per
    NumberDataPoint, parent Metric denormalized)."""
    rows = []
    for rm in doc.get("resourceMetrics", []):
        res_attrs = _kvlist(rm.get("resource", {}).get("attributes", []))
        for sm in rm.get("scopeMetrics", []):
            scope_name = sm.get("scope", {}).get("name")
            for m in sm.get("metrics", []):
                if "sum" in m:
                    body, mtype = m["sum"], "sum"
                    temp = int(body.get("aggregationTemporality", 0))
                    mono = bool(body.get("isMonotonic", False))
                else:
                    body, mtype = m.get("gauge", {}), "gauge"
                    temp, mono = 0, False
                for dp in body.get("dataPoints", []):
                    rows.append({
                        "metric_name": m.get("name"),
                        "metric_description": m.get("description"),
                        "metric_unit": m.get("unit"),
                        "metric_type": mtype,
                        "aggregation_temporality": temp,
                        "is_monotonic": mono,
                        "start_time_unix_nano": int(
                            dp.get("startTimeUnixNano", 0)),
                        "time_unix_nano": int(dp.get("timeUnixNano", 0)),
                        "value_double": (float(dp["asDouble"])
                                         if "asDouble" in dp else None),
                        "value_int": (int(dp["asInt"])
                                      if "asInt" in dp else None),
                        "attributes": json.dumps(
                            _kvlist(dp.get("attributes", [])),
                            sort_keys=True),
                        "resource_attributes": json.dumps(res_attrs,
                                                          sort_keys=True),
                        "scope_name": scope_name,
                    })
    return rows


def _json_rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    if not rows:
        return schema.empty_table()
    return pa.table({f.name: pa.array([r[f.name] for r in rows], f.type)
                     for f in schema})


class _DecodeSignalJson:
    def __init__(self, flatten, schema):
        self.flatten = flatten
        self.schema = schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch.column("text").to_pylist():
            if not line or not line.strip():
                continue
            rows.extend(self.flatten(json.loads(line)))
        return _json_rows_to_table(rows, self.schema)


def read_otlp_json_traces(paths: "str | list[str]") -> ray.data.Dataset:
    """OTLP-JSON-lines trace files -> flat one-row-per-Span Dataset
    (schema = ``otlpproto.SPAN_FLAT_SCHEMA``)."""
    from .otlpproto import SPAN_FLAT_SCHEMA

    ds = ray.data.read_text(paths)
    return ds.map_batches(
        _DecodeSignalJson(flatten_otlp_traces, SPAN_FLAT_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True)


def read_otlp_json_metrics(paths: "str | list[str]") -> ray.data.Dataset:
    """OTLP-JSON-lines metric files -> flat one-row-per-datapoint Dataset
    (schema = ``otlpproto.METRIC_FLAT_SCHEMA``)."""
    from .otlpproto import METRIC_FLAT_SCHEMA

    ds = ray.data.read_text(paths)
    return ds.map_batches(
        _DecodeSignalJson(flatten_otlp_metrics, METRIC_FLAT_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True)


def _span_to_json(cols: dict, i: int) -> dict:
    sp: dict = {}
    if cols["trace_id"][i]:
        sp["traceId"] = cols["trace_id"][i]
    if cols["span_id"][i]:
        sp["spanId"] = cols["span_id"][i]
    if cols["parent_span_id"][i]:
        sp["parentSpanId"] = cols["parent_span_id"][i]
    if cols["trace_state"][i]:
        sp["traceState"] = cols["trace_state"][i]
    if cols["span_name"][i] is not None:
        sp["name"] = cols["span_name"][i]
    if cols["span_kind"][i]:
        sp["kind"] = int(cols["span_kind"][i])
    if cols["start_time_unix_nano"][i]:
        sp["startTimeUnixNano"] = str(cols["start_time_unix_nano"][i])
    if cols["end_time_unix_nano"][i]:
        sp["endTimeUnixNano"] = str(cols["end_time_unix_nano"][i])
    attrs = json.loads(cols["attributes"][i]) if cols["attributes"][i] else {}
    if attrs:
        sp["attributes"] = _encode_kvlist(attrs)
    status: dict = {}
    if cols["status_message"][i]:
        status["message"] = cols["status_message"][i]
    if cols["status_code"][i]:
        status["code"] = int(cols["status_code"][i])
    if status:
        sp["status"] = status
    return sp


def _dp_to_json(cols: dict, i: int) -> dict:
    dp: dict = {}
    if cols["start_time_unix_nano"][i]:
        dp["startTimeUnixNano"] = str(cols["start_time_unix_nano"][i])
    if cols["time_unix_nano"][i]:
        dp["timeUnixNano"] = str(cols["time_unix_nano"][i])
    if cols["value_double"][i] is not None:
        dp["asDouble"] = cols["value_double"][i]
    elif cols["value_int"][i] is not None:
        dp["asInt"] = str(cols["value_int"][i])
    attrs = json.loads(cols["attributes"][i]) if cols["attributes"][i] else {}
    if attrs:
        dp["attributes"] = _encode_kvlist(attrs)
    return dp


class _SignalJsonWrite:
    """Per-batch OTLP-JSON export writer for spans / datapoints — same
    forest rebuild + shard manifest conventions as OtlpJsonWrite."""

    MANIFEST_SCHEMA = OtlpJsonWrite.MANIFEST_SCHEMA

    def __init__(self, out_dir: str, signal: str):
        self.out_dir = out_dir
        self.signal = signal  # "traces" | "metrics"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import uuid

        from .otlpproto import METRIC_FLAT_SCHEMA, SPAN_FLAT_SCHEMA

        if batch.num_rows == 0:
            return self.MANIFEST_SCHEMA.empty_table()
        schema = (SPAN_FLAT_SCHEMA if self.signal == "traces"
                  else METRIC_FLAT_SCHEMA)
        cols = {name: batch.column(name).to_pylist()
                if name in batch.column_names else [None] * batch.num_rows
                for name in schema.names}
        forest: dict[str, dict[str, list[int]]] = {}
        for i in range(batch.num_rows):
            res_key = cols["resource_attributes"][i] or "{}"
            forest.setdefault(res_key, {}).setdefault(
                cols["scope_name"][i], []).append(i)

        resources = []
        for res_key in sorted(forest):
            scopes = []
            for scope in sorted(forest[res_key], key=lambda s: s or ""):
                idxs = forest[res_key][scope]
                if self.signal == "traces":
                    sl: dict = {"spans": [_span_to_json(cols, i)
                                          for i in idxs]}
                else:
                    metrics: dict[tuple, list[int]] = {}
                    for i in idxs:
                        key = (cols["metric_name"][i] or "",
                               cols["metric_description"][i] or "",
                               cols["metric_unit"][i] or "",
                               cols["metric_type"][i] or "gauge",
                               int(cols["aggregation_temporality"][i] or 0),
                               bool(cols["is_monotonic"][i]))
                        metrics.setdefault(key, []).append(i)
                    mlist = []
                    for key in sorted(metrics):
                        name, desc, unit, mtype, temp, mono = key
                        m: dict = {}
                        if name:
                            m["name"] = name
                        if desc:
                            m["description"] = desc
                        if unit:
                            m["unit"] = unit
                        dps = [_dp_to_json(cols, i) for i in metrics[key]]
                        if mtype == "sum":
                            body: dict = {"dataPoints": dps}
                            if temp:
                                body["aggregationTemporality"] = temp
                            if mono:
                                body["isMonotonic"] = True
                            m["sum"] = body
                        else:
                            m["gauge"] = {"dataPoints": dps}
                        mlist.append(m)
                    sl = {"metrics": mlist}
                if scope is not None:
                    sl["scope"] = {"name": scope}
                scopes.append(sl)
            rl: dict = {("scopeSpans" if self.signal == "traces"
                         else "scopeMetrics"): scopes}
            res_attrs = json.loads(res_key)
            if res_attrs:
                rl["resource"] = {"attributes": _encode_kvlist(res_attrs)}
            resources.append(rl)
        top = ("resourceSpans" if self.signal == "traces"
               else "resourceMetrics")
        doc = json.dumps({top: resources}, sort_keys=True,
                         separators=(",", ":"))
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"export-{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write(doc + "\n")
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def write_otlp_json_traces(ds: ray.data.Dataset, out_dir: str):
    manifest = ds.map_batches(_SignalJsonWrite(out_dir, "traces"),
                              batch_format="pyarrow", zero_copy_batch=True)
    return manifest.materialize()


def write_otlp_json_metrics(ds: ray.data.Dataset, out_dir: str):
    manifest = ds.map_batches(_SignalJsonWrite(out_dir, "metrics"),
                              batch_format="pyarrow", zero_copy_batch=True)
    return manifest.materialize()
