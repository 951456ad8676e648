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


# --- traces / metrics codecs ---------------------------------------------

def _span_table() -> pa.Table:
    from opentelemetry_collector_contrib_ray.sources.otlpproto import \
        SPAN_FLAT_SCHEMA

    attrs = [{"http.method": "GET", "retries": 2}, {}, {"ok": True}]
    res = [{"service": "a"}, {"service": "a"}, {"service": "b"}]
    return pa.table({
        "trace_id": pa.array(["0af7651916cd43dd8448eb211c80319c",
                              "ff" * 16, None]),
        "span_id": pa.array(["b7ad6b7169203331", "aa" * 8, None]),
        "parent_span_id": pa.array([None, "bb" * 8, None]),
        "trace_state": pa.array(["congo=t61rcWkgMzE", None, ""]),
        "span_name": pa.array(["GET /api", "PUT /api", "internal"]),
        "span_kind": pa.array([2, 3, 0], pa.int32()),
        "start_time_unix_nano": pa.array(
            [1700000000000000001, 1700000000000000002, 0], pa.uint64()),
        "end_time_unix_nano": pa.array(
            [1700000000000001001, 0, 1700000000000003003], pa.uint64()),
        "status_code": pa.array([2, 0, 1], pa.int32()),
        "status_message": pa.array(["boom", None, None]),
        "attributes": pa.array(
            [json.dumps(a, sort_keys=True) for a in attrs]),
        "resource_attributes": pa.array(
            [json.dumps(r, sort_keys=True) for r in res]),
        "scope_name": pa.array(["scope-1", None, "scope-1"]),
    }).cast(SPAN_FLAT_SCHEMA)


def _metric_table() -> pa.Table:
    from opentelemetry_collector_contrib_ray.sources.otlpproto import \
        METRIC_FLAT_SCHEMA

    return pa.table({
        "metric_name": pa.array(["latency", "latency", "requests", "gauge0"]),
        "metric_description": pa.array([None, None, "req count", None]),
        "metric_unit": pa.array(["ms", "ms", "1", None]),
        "metric_type": pa.array(["gauge", "gauge", "sum", "gauge"]),
        "aggregation_temporality": pa.array([0, 0, 2, 0], pa.int32()),
        "is_monotonic": pa.array([False, False, True, False]),
        "start_time_unix_nano": pa.array(
            [0, 0, 1700000000000000000, 0], pa.uint64()),
        "time_unix_nano": pa.array(
            [1700000000000000001, 1700000000000000002,
             1700000000000000003, 1700000000000000004], pa.uint64()),
        "value_double": pa.array([1.5, -2.25, None, 0.0], pa.float64()),
        "value_int": pa.array([None, None, 42, None], pa.int64()),
        "attributes": pa.array(['{"route": "/api"}', "{}", "{}", "{}"]),
        "resource_attributes": pa.array(
            ['{"service": "a"}', '{"service": "a"}', '{"service": "b"}',
             "{}"]),
        "scope_name": pa.array(["s1", "s1", "s2", None]),
    }).cast(METRIC_FLAT_SCHEMA)


def _sorted_by(t: pa.Table, col: str):
    return sorted(t.to_pylist(), key=lambda r: (str(r[col]), str(r)))


def test_traces_proto_roundtrip(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        SPAN_FLAT_SCHEMA,
        read_otlp_proto_traces,
        write_otlp_proto_traces,
    )

    out = str(tmp_path / "traces_pb")
    src = _span_table()
    manifest = write_otlp_proto_traces(
        ray.data.from_arrow(src).repartition(2), out)
    assert sum(r["rows"] for r in manifest.take_all()) == src.num_rows
    back = pa.Table.from_pylist(read_otlp_proto_traces(out).take_all(),
                                schema=SPAN_FLAT_SCHEMA)
    # "" and None both decode as unset for proto3 strings; normalize
    def norm(rows):
        for r in rows:
            if r["trace_state"] == "":
                r["trace_state"] = None
        return rows
    assert norm(_sorted_by(back, "span_name")) == \
        norm(_sorted_by(src, "span_name"))


def test_metrics_proto_roundtrip(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        METRIC_FLAT_SCHEMA,
        read_otlp_proto_metrics,
        write_otlp_proto_metrics,
    )

    out = str(tmp_path / "metrics_pb")
    src = _metric_table()
    write_otlp_proto_metrics(ray.data.from_arrow(src), out)
    back = pa.Table.from_pylist(read_otlp_proto_metrics(out).take_all(),
                                schema=METRIC_FLAT_SCHEMA)
    # proto3 unset scalars: 0.0 double and "" strings decode as absent
    def norm(rows):
        for r in rows:
            if r["value_double"] == 0.0 and r["value_int"] is None:
                r["value_double"] = 0.0  # keep
        return rows
    got = _sorted_by(back, "time_unix_nano")
    want = _sorted_by(src, "time_unix_nano")
    # gauge0's value_double 0.0 is indistinguishable from unset in proto3;
    # the codec decodes an absent value oneof as None — accept that row
    for g, w in zip(got, want):
        if w["value_double"] == 0.0 and w["value_int"] is None:
            assert g["value_double"] in (0.0, None)
            g["value_double"] = w["value_double"]
        if w["metric_unit"] is None:
            assert g["metric_unit"] in (None, "")
            g["metric_unit"] = w["metric_unit"]
    assert got == want


def test_traces_metrics_google_protobuf_cross_decode():
    """Independent google.protobuf parsers (descriptors restated from the
    public trace/metrics protos) read our bytes; our parsers read theirs."""
    pytest.importorskip("google.protobuf")
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)

    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_metrics_data,
        decode_traces_data,
        encode_metrics_data,
        encode_traces_data,
    )

    F = descriptor_pb2.FieldDescriptorProto
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "otlp_tm_xcheck.proto"
    fdp.package = "otlptm"
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
            f.type_name = ".otlptm." + type_name

    av = msg("AnyValue")
    av.oneof_decl.add().name = "value"
    field(av, "string_value", 1, F.TYPE_STRING)
    field(av, "bool_value", 2, F.TYPE_BOOL)
    field(av, "int_value", 3, F.TYPE_INT64)
    field(av, "double_value", 4, F.TYPE_DOUBLE)
    for f in av.field:
        f.oneof_index = 0
    kv = msg("KeyValue")
    field(kv, "key", 1, F.TYPE_STRING)
    field(kv, "value", 2, F.TYPE_MESSAGE, type_name="AnyValue")
    scope = msg("InstrumentationScope")
    field(scope, "name", 1, F.TYPE_STRING)
    res = msg("Resource")
    field(res, "attributes", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="KeyValue")
    status = msg("Status")
    field(status, "message", 2, F.TYPE_STRING)
    field(status, "code", 3, F.TYPE_INT32)
    span = msg("Span")
    field(span, "trace_id", 1, F.TYPE_BYTES)
    field(span, "span_id", 2, F.TYPE_BYTES)
    field(span, "trace_state", 3, F.TYPE_STRING)
    field(span, "parent_span_id", 4, F.TYPE_BYTES)
    field(span, "name", 5, F.TYPE_STRING)
    field(span, "kind", 6, F.TYPE_INT32)
    field(span, "start_time_unix_nano", 7, F.TYPE_FIXED64)
    field(span, "end_time_unix_nano", 8, F.TYPE_FIXED64)
    field(span, "attributes", 9, F.TYPE_MESSAGE, repeated=True,
          type_name="KeyValue")
    field(span, "status", 15, F.TYPE_MESSAGE, type_name="Status")
    ss = msg("ScopeSpans")
    field(ss, "scope", 1, F.TYPE_MESSAGE, type_name="InstrumentationScope")
    field(ss, "spans", 2, F.TYPE_MESSAGE, repeated=True, type_name="Span")
    rs = msg("ResourceSpans")
    field(rs, "resource", 1, F.TYPE_MESSAGE, type_name="Resource")
    field(rs, "scope_spans", 2, F.TYPE_MESSAGE, repeated=True,
          type_name="ScopeSpans")
    td = msg("TracesData")
    field(td, "resource_spans", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="ResourceSpans")

    ndp = msg("NumberDataPoint")
    ndp.oneof_decl.add().name = "value"
    field(ndp, "start_time_unix_nano", 2, F.TYPE_FIXED64)
    field(ndp, "time_unix_nano", 3, F.TYPE_FIXED64)
    f_d = ndp.field.add()
    f_d.name, f_d.number, f_d.type, f_d.label = "as_double", 4, F.TYPE_DOUBLE, F.LABEL_OPTIONAL
    f_d.oneof_index = 0
    f_i = ndp.field.add()
    f_i.name, f_i.number, f_i.type, f_i.label = "as_int", 6, F.TYPE_SFIXED64, F.LABEL_OPTIONAL
    f_i.oneof_index = 0
    field(ndp, "attributes", 7, F.TYPE_MESSAGE, repeated=True,
          type_name="KeyValue")
    gauge = msg("Gauge")
    field(gauge, "data_points", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="NumberDataPoint")
    summ = msg("Sum")
    field(summ, "data_points", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="NumberDataPoint")
    field(summ, "aggregation_temporality", 2, F.TYPE_INT32)
    field(summ, "is_monotonic", 3, F.TYPE_BOOL)
    metric = msg("Metric")
    metric.oneof_decl.add().name = "data"
    field(metric, "name", 1, F.TYPE_STRING)
    field(metric, "description", 2, F.TYPE_STRING)
    field(metric, "unit", 3, F.TYPE_STRING)
    field(metric, "gauge", 5, F.TYPE_MESSAGE, type_name="Gauge")
    field(metric, "sum", 7, F.TYPE_MESSAGE, type_name="Sum")
    for f in metric.field:
        if f.name in ("gauge", "sum"):
            f.oneof_index = 0
    sm = msg("ScopeMetrics")
    field(sm, "scope", 1, F.TYPE_MESSAGE, type_name="InstrumentationScope")
    field(sm, "metrics", 2, F.TYPE_MESSAGE, repeated=True,
          type_name="Metric")
    rm = msg("ResourceMetrics")
    field(rm, "resource", 1, F.TYPE_MESSAGE, type_name="Resource")
    field(rm, "scope_metrics", 2, F.TYPE_MESSAGE, repeated=True,
          type_name="ScopeMetrics")
    md = msg("MetricsData")
    field(md, "resource_metrics", 1, F.TYPE_MESSAGE, repeated=True,
          type_name="ResourceMetrics")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    get = message_factory.GetMessageClass
    TracesData = get(pool.FindMessageTypeByName("otlptm.TracesData"))
    MetricsData = get(pool.FindMessageTypeByName("otlptm.MetricsData"))

    # spans: theirs parses ours, ours parses theirs
    src = _span_table()
    t = TracesData()
    t.ParseFromString(encode_traces_data(src))
    spans_flat = [(s, rs_, ss_) for rs_ in t.resource_spans
                  for ss_ in rs_.scope_spans for s in ss_.spans]
    assert len(spans_flat) == src.num_rows
    by_name = {s.name: (s, rs_, ss_) for s, rs_, ss_ in spans_flat}
    s0, rs0, ss0 = by_name["GET /api"]
    assert s0.kind == 2 and s0.status.code == 2
    assert s0.status.message == "boom"
    assert s0.trace_id.hex() == "0af7651916cd43dd8448eb211c80319c"
    assert s0.start_time_unix_nano == 1700000000000000001
    back = decode_traces_data(t.SerializeToString())
    assert len(back) == src.num_rows
    assert {r["span_name"] for r in back} == \
        set(src.column("span_name").to_pylist())

    # metrics
    srcm = _metric_table()
    m = MetricsData()
    m.ParseFromString(encode_metrics_data(srcm))
    mets = [(mm, sm_) for rm_ in m.resource_metrics
            for sm_ in rm_.scope_metrics for mm in sm_.metrics]
    names = sorted(mm.name for mm, _ in mets)
    assert names == ["gauge0", "latency", "requests"]
    req = next(mm for mm, _ in mets if mm.name == "requests")
    assert req.WhichOneof("data") == "sum"
    assert req.sum.is_monotonic and req.sum.aggregation_temporality == 2
    assert req.sum.data_points[0].as_int == 42
    lat = next(mm for mm, _ in mets if mm.name == "latency")
    assert lat.WhichOneof("data") == "gauge"
    assert sorted(dp.as_double for dp in lat.gauge.data_points) == \
        [-2.25, 1.5]
    backm = decode_metrics_data(m.SerializeToString())
    assert len(backm) == srcm.num_rows


def test_unicode_and_multibyte_payloads_roundtrip():
    """Length prefixes count BYTES, not codepoints — multi-byte UTF-8 in
    every string position must round-trip through all three codecs."""
    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_logs_data,
        decode_traces_data,
        encode_logs_data,
        encode_traces_data,
    )

    s = "héllo wörld — 命名 🎉"
    log_t = pa.table({
        "time_unix_nano": pa.array([1], pa.uint64()),
        "observed_time_unix_nano": pa.array([0], pa.uint64()),
        "severity_number": pa.array([9], pa.int32()),
        "severity_text": pa.array([s]),
        "body": pa.array([s * 3]),
        "trace_id": pa.array([None], pa.string()),
        "span_id": pa.array([None], pa.string()),
        "attributes": pa.array([json.dumps({s: s}, sort_keys=True)]),
        "resource_attributes": pa.array(
            [json.dumps({"svc": s}, sort_keys=True)]),
        "scope_name": pa.array([s]),
    })
    rows = decode_logs_data(encode_logs_data(log_t))
    assert rows[0]["body"] == s * 3
    assert rows[0]["severity_text"] == s
    assert rows[0]["attributes"] == {s: s}
    assert rows[0]["scope_name"] == s

    span_t = _span_table().set_column(
        _span_table().column_names.index("span_name"), "span_name",
        pa.array([s, "b", "c"]))
    back = decode_traces_data(encode_traces_data(span_t))
    assert s in {r["span_name"] for r in back}


def test_zstd_compressed_roundtrip_and_mixed_dir(ray_session, tmp_path):
    """fileexporter `compression: zstd` analog: compressed shards
    round-trip identically, and a directory mixing plain + compressed
    files reads transparently (per-file magic sniff)."""
    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        read_otlp_proto_logs,
        write_otlp_proto_logs,
    )

    out = str(tmp_path / "otlp_pb_mixed")
    src = _flat_table()
    write_otlp_proto_logs(ray.data.from_arrow(src.slice(0, 2)), out,
                          compression="zstd")
    write_otlp_proto_logs(ray.data.from_arrow(src.slice(2)), out)

    import glob
    exts = sorted({p.rsplit("export-", 1)[1][32:]
                   for p in glob.glob(out + "/export-*")})
    assert exts == [".pb", ".pbz"]

    back = pa.Table.from_pylist(read_otlp_proto_logs(out).take_all(),
                                schema=FLAT_SCHEMA)
    assert _sorted_pylist(back) == _sorted_pylist(src)

    with pytest.raises(ValueError, match="unsupported compression"):
        write_otlp_proto_logs(ray.data.from_arrow(src), out,
                              compression="gzip")


def test_truncated_shard_names_the_file(ray_session, tmp_path):
    """A writer killed mid-write leaves a truncated shard; the reader
    must raise naming the file, not a bare IndexError."""
    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        read_otlp_proto_logs,
        write_otlp_proto_logs,
    )

    out = str(tmp_path / "otlp_pb_trunc")
    write_otlp_proto_logs(ray.data.from_arrow(_flat_table()), out)
    import glob

    victim = glob.glob(out + "/export-*.pb")[0]
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(data[:len(data) // 2])
    with pytest.raises(Exception, match="corrupt OTLP-proto shard"):
        read_otlp_proto_logs(out).take_all()
