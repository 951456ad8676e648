"""OTLP-proto export round-trip — fileexporter `format: proto` analog.

Three independent pins on the hand-rolled wire codec
(sources/otlpproto.py):

1. row-level round-trip identity (write -> read == source);
2. hand-computed GOLDEN BYTES for a minimal LogsData (the expected wire
   bytes are written out literally from the proto3 spec, not produced by
   the code under test);
3. two-way cross-decode against google.protobuf message classes built
   from an independently-declared descriptor of the public
   opentelemetry-proto logs/common schemas (guarded: skips if the
   protobuf runtime is absent).
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
from opentelemetry_collector_contrib_ray.sources.otlpproto import (
    decode_logs_data,
    encode_logs_data,
    read_otlp_proto_logs,
    write_otlp_proto_logs,
)

from .test_otlp_roundtrip import _flat_table, _sorted_pylist


def test_proto_roundtrip_row_level_identity(ray_session, tmp_path):
    out = str(tmp_path / "otlp_pb")
    src = _flat_table()
    manifest = write_otlp_proto_logs(
        ray.data.from_arrow(src).repartition(2), out)
    assert manifest.count() >= 1
    assert sum(r["rows"] for r in manifest.take_all()) == src.num_rows

    back = read_otlp_proto_logs(out).materialize()
    got = pa.Table.from_pylist(back.take_all(), schema=FLAT_SCHEMA)
    assert _sorted_pylist(got) == _sorted_pylist(src)
    shutil.rmtree(out, ignore_errors=True)


def test_proto_json_interchange(ray_session, tmp_path):
    """The two export formats carry identical pdata: reading either one
    back yields the same flat rows."""
    src = _flat_table()
    out_j = str(tmp_path / "fmt_json")
    out_p = str(tmp_path / "fmt_pb")
    write_otlp_json_logs(ray.data.from_arrow(src), out_j)
    write_otlp_proto_logs(ray.data.from_arrow(src), out_p)
    via_json = pa.Table.from_pylist(
        read_otlp_json_logs(out_j).take_all(), schema=FLAT_SCHEMA)
    via_pb = pa.Table.from_pylist(
        read_otlp_proto_logs(out_p).take_all(), schema=FLAT_SCHEMA)
    assert _sorted_pylist(via_pb) == _sorted_pylist(via_json)


def _minimal_table() -> pa.Table:
    return pa.table({
        "time_unix_nano": pa.array([0], pa.uint64()),
        "observed_time_unix_nano": pa.array([0], pa.uint64()),
        "severity_number": pa.array([5], pa.int32()),
        "severity_text": pa.array([None], pa.string()),
        "body": pa.array(["hi"], pa.string()),
        "trace_id": pa.array([None], pa.string()),
        "span_id": pa.array([None], pa.string()),
        "attributes": pa.array([None], pa.string()),
        "resource_attributes": pa.array([None], pa.string()),
        "scope_name": pa.array([None], pa.string()),
    })


def test_golden_bytes_minimal_logsdata():
    """Wire bytes assembled BY HAND from the proto3 spec:

    LogRecord  = tag(2,varint) 0x10, value 5          -> 10 05
                 tag(5,len) 0x2a, len 4,
                   AnyValue{string_value="hi"}: tag(1,len) 0x0a, len 2, "hi"
                                                      -> 2a 04 0a 02 68 69
    ScopeLogs  = tag(2,len) 0x12, len 8, LogRecord
    ResourceLogs = tag(2,len) 0x12, len 10, ScopeLogs
    LogsData   = tag(1,len) 0x0a, len 12, ResourceLogs
    """
    rec = bytes([0x10, 0x05, 0x2A, 0x04, 0x0A, 0x02]) + b"hi"
    sl = bytes([0x12, len(rec)]) + rec
    rl = bytes([0x12, len(sl)]) + sl
    golden = bytes([0x0A, len(rl)]) + rl
    assert encode_logs_data(_minimal_table()) == golden
    rows = decode_logs_data(golden)
    assert len(rows) == 1
    assert rows[0]["severity_number"] == 5
    assert rows[0]["body"] == "hi"
    assert rows[0]["time_unix_nano"] == 0
    assert rows[0]["severity_text"] is None


# --- google.protobuf cross-check ---------------------------------------------

def _build_otlp_classes():
    """Declare the public opentelemetry-proto logs/common schemas as a
    dynamic FileDescriptorProto — an INDEPENDENT parser for the same wire
    format (field numbers/types restated here on purpose; agreement of two
    separately-written declarations is the point of the test)."""
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)

    F = descriptor_pb2.FieldDescriptorProto
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "otlp_xcheck.proto"
    fdp.package = "otlpx"
    fdp.syntax = "proto3"

    def msg(name):
        m = fdp.message_type.add()
        m.name = name
        return m

    def field(m, name, num, ftype, repeated=False, type_name=None):
        f = m.field.add()
        f.name, f.number, f.type = name, num, ftype
        f.label = F.LABEL_REPEATED if repeated else F.LABEL_OPTIONAL
        if type_name:
            f.type_name = ".otlpx." + type_name

    av = msg("AnyValue")
    av.oneof_decl.add().name = "value"
    field(av, "string_value", 1, F.TYPE_STRING)
    field(av, "bool_value", 2, F.TYPE_BOOL)
    field(av, "int_value", 3, F.TYPE_INT64)
    field(av, "double_value", 4, F.TYPE_DOUBLE)
    field(av, "array_value", 5, F.TYPE_MESSAGE, type_name="ArrayValue")
    field(av, "kvlist_value", 6, F.TYPE_MESSAGE, type_name="KeyValueList")
    field(av, "bytes_value", 7, F.TYPE_BYTES)
    for f in av.field:
        f.oneof_index = 0
    arr = msg("ArrayValue")
    field(arr, "values", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="AnyValue")
    kvl = msg("KeyValueList")
    field(kvl, "values", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="KeyValue")
    kv = msg("KeyValue")
    field(kv, "key", 1, F.TYPE_STRING)
    field(kv, "value", 2, F.TYPE_MESSAGE, type_name="AnyValue")
    scope = msg("InstrumentationScope")
    field(scope, "name", 1, F.TYPE_STRING)
    field(scope, "version", 2, F.TYPE_STRING)
    res = msg("Resource")
    field(res, "attributes", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="KeyValue")
    lr = msg("LogRecord")
    field(lr, "time_unix_nano", 1, F.TYPE_FIXED64)
    field(lr, "severity_number", 2, F.TYPE_INT32)
    field(lr, "severity_text", 3, F.TYPE_STRING)
    field(lr, "body", 5, F.TYPE_MESSAGE, type_name="AnyValue")
    field(lr, "attributes", 6, F.TYPE_MESSAGE, repeated=True,
          type_name="KeyValue")
    field(lr, "dropped_attributes_count", 7, F.TYPE_UINT32)
    field(lr, "flags", 8, F.TYPE_FIXED32)
    field(lr, "trace_id", 9, F.TYPE_BYTES)
    field(lr, "span_id", 10, F.TYPE_BYTES)
    field(lr, "observed_time_unix_nano", 11, F.TYPE_FIXED64)
    sl = msg("ScopeLogs")
    field(sl, "scope", 1, F.TYPE_MESSAGE, type_name="InstrumentationScope")
    field(sl, "log_records", 2, F.TYPE_MESSAGE, repeated=True,
          type_name="LogRecord")
    field(sl, "schema_url", 3, F.TYPE_STRING)
    rl = msg("ResourceLogs")
    field(rl, "resource", 1, F.TYPE_MESSAGE, type_name="Resource")
    field(rl, "scope_logs", 2, F.TYPE_MESSAGE, repeated=True,
          type_name="ScopeLogs")
    field(rl, "schema_url", 3, F.TYPE_STRING)
    ld = msg("LogsData")
    field(ld, "resource_logs", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="ResourceLogs")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    get = message_factory.GetMessageClass
    return {n: get(pool.FindMessageTypeByName(f"otlpx.{n}"))
            for n in ("LogsData", "AnyValue")}


def _pb_any(v):
    which = v.WhichOneof("value") if hasattr(v, "WhichOneof") else None
    if which is None:
        return None
    got = getattr(v, which)
    if which == "array_value":
        return [_pb_any(x) for x in got.values]
    if which == "kvlist_value":
        return {kv.key: _pb_any(kv.value) for kv in got.values}
    return got


def test_google_protobuf_cross_decode():
    pytest.importorskip("google.protobuf")
    classes = _build_otlp_classes()
    LogsData = classes["LogsData"]

    src = _flat_table()
    payload = encode_logs_data(src)

    # their parser reads our bytes
    m = LogsData()
    m.ParseFromString(payload)
    recs = [(lr, rl, sl) for rl in m.resource_logs
            for sl in rl.scope_logs for lr in sl.log_records]
    assert len(recs) == src.num_rows
    by_time = {lr.time_unix_nano: (lr, rl, sl) for lr, rl, sl in recs}
    srows = src.to_pylist()
    row0 = next(r for r in srows if r["time_unix_nano"] != 0)
    lr, rl, sl = by_time[row0["time_unix_nano"]]
    assert lr.severity_number == row0["severity_number"]
    assert lr.severity_text == row0["severity_text"]
    assert _pb_any(lr.body) == row0["body"]
    assert lr.trace_id.hex() == row0["trace_id"]
    got_attrs = {kv.key: _pb_any(kv.value) for kv in lr.attributes}
    assert got_attrs == json.loads(row0["attributes"])
    got_res = {kv.key: _pb_any(kv.value) for kv in rl.resource.attributes}
    assert got_res == json.loads(row0["resource_attributes"])
    assert sl.scope.name == row0["scope_name"]

    # our parser reads their bytes
    from opentelemetry_collector_contrib_ray.sources.otlpproto import \
        _rows_to_table

    back = _rows_to_table(decode_logs_data(m.SerializeToString()))
    assert _sorted_pylist(back.cast(FLAT_SCHEMA)) == _sorted_pylist(src)


def test_empty_proto_dataset_writes_nothing(ray_session, tmp_path):
    out = str(tmp_path / "otlp_pb_empty")
    manifest = write_otlp_proto_logs(
        ray.data.from_arrow(FLAT_SCHEMA.empty_table()), out)
    assert manifest.count() == 0
