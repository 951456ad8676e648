"""OTLP-JSON export round-trip — fileexporter `format: json` analog.

read_otlp_json_logs(write_otlp_json_logs(ds)) must be an exact row-level
identity on the flat schema (exporter/fileexporter/README.md:22 — "Use the
OTLP JSON File receiver to read the data back").
"""

import json
import shutil

import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_contrib_ray.sources.otlpjson import (
    FLAT_SCHEMA,
    read_otlp_json_logs,
    write_otlp_json_logs,
)


def _flat_table() -> pa.Table:
    attrs = [
        {"k": "v", "n": 7, "f": 2.5, "b": True,
         "arr": [1, "two", False], "kv": {"inner": 3}},
        {"user": 42},
        {},
        {"neg": -9007199254740993},  # int64 beyond float53 — string-encoded
    ]
    res = [
        {"service": "a", "replica": 1},
        {"service": "a", "replica": 1},
        {"service": "b"},
        {"service": "b"},
    ]
    return pa.table(
        {
            "time_unix_nano": pa.array(
                [1700000000000000001, 1700000000000000002, 0,
                 1700000000000000004], pa.uint64()),
            "observed_time_unix_nano": pa.array(
                [1700000000000000011, 0, 1700000000000000013,
                 1700000000000000014], pa.uint64()),
            "severity_number": pa.array([9, 13, 0, 21], pa.int32()),
            "severity_text": pa.array(["INFO", "WARN", None, "FATAL"]),
            "body": pa.array(["hello", None, "line three", "x" * 300]),
            "trace_id": pa.array(["0af7651916cd43dd8448eb211c80319c",
                                  None, None, "ff" * 16]),
            "span_id": pa.array(["b7ad6b7169203331", None, None, "aa" * 8]),
            "attributes": pa.array(
                [json.dumps(a, sort_keys=True) for a in attrs]),
            "resource_attributes": pa.array(
                [json.dumps(r, sort_keys=True) for r in res]),
            "scope_name": pa.array(["scope-1", "scope-2", None, "scope-1"]),
        }
    ).cast(FLAT_SCHEMA)


def _sorted_pylist(t: pa.Table):
    rows = t.to_pylist()
    return sorted(rows, key=lambda r: (r["time_unix_nano"],
                                       r["observed_time_unix_nano"]))


def test_roundtrip_row_level_identity(ray_session, tmp_path):
    out = str(tmp_path / "otlp_out")
    src = _flat_table()
    manifest = write_otlp_json_logs(
        ray.data.from_arrow(src).repartition(2), out)
    assert manifest.count() >= 1
    assert sum(r["rows"] for r in manifest.take_all()) == src.num_rows

    back = read_otlp_json_logs(out).materialize()
    got = pa.Table.from_pylist(back.take_all(), schema=FLAT_SCHEMA)
    assert _sorted_pylist(got) == _sorted_pylist(src)
    shutil.rmtree(out, ignore_errors=True)


def test_one_line_per_block_grouped_forest(ray_session, tmp_path):
    out = str(tmp_path / "otlp_one")
    src = _flat_table()
    write_otlp_json_logs(ray.data.from_arrow(src), out)

    import glob

    files = glob.glob(out + "/*.jsonl")
    assert len(files) == 1  # one export document per block
    lines = [ln for ln in open(files[0]) if ln.strip()]
    assert len(lines) == 1
    doc = json.loads(lines[0])
    # rows share 2 distinct resources -> 2 ResourceLogs; scopes grouped under
    rls = doc["resourceLogs"]
    assert len(rls) == 2
    n_records = sum(len(sl["logRecords"]) for rl in rls
                    for sl in rl["scopeLogs"])
    assert n_records == src.num_rows


def test_empty_dataset_writes_nothing(ray_session, tmp_path):
    out = str(tmp_path / "otlp_empty")
    manifest = write_otlp_json_logs(
        ray.data.from_arrow(FLAT_SCHEMA.empty_table()), out)
    assert manifest.count() == 0


@pytest.mark.parametrize("missing", ["trace_id", "span_id", "scope_name"])
def test_partial_schema_input_tolerated(ray_session, tmp_path, missing):
    """A pipeline that never set trace ids still exports (column absent)."""
    out = str(tmp_path / f"otlp_miss_{missing}")
    src = _flat_table().drop_columns([missing])
    write_otlp_json_logs(ray.data.from_arrow(src), out)
    back = read_otlp_json_logs(out).materialize()
    col = pa.Table.from_pylist(back.take_all(), schema=FLAT_SCHEMA)[missing]
    assert col.null_count == col.length()
