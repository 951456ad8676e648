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
