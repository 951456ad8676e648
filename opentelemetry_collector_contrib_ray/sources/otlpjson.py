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
