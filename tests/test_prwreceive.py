"""prometheusremotewritereceiver parity: writev2 decode → flat metric
datapoint rows.

Vectors restated from receiver_test.go (TestTranslateV2 cases,
writeV2RequestFixture) plus a google.protobuf cross-check of the
hand-rolled writev2 wire codec against an independently-declared
descriptor of the public PRW 2.0 types.proto.
"""

import math
import struct

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.prwreceive import (
    MT_COUNTER,
    MT_GAUGE,
    MT_HISTOGRAM,
    MT_SUMMARY,
    PrwDecode,
    build_symbolized_request,
    decode_writev2_request,
    encode_writev2_request,
    translate_v2_request,
)

STALE_NAN = struct.unpack("<d", struct.pack("<Q", 0x7FF0000000000002))[0]

FIX_SYMBOLS = ["", "__name__", "test_metric1", "job", "service-x/test",
               "instance", "107cn001", "d", "e", "foo", "bar", "f", "g",
               "h", "i", "Test gauge for test purposes",
               "Maybe op/sec who knows (:",
               "Test counter for test purposes"]


def fixture_request():
    """writeV2RequestFixture from receiver_test.go:37-60."""
    return encode_writev2_request(FIX_SYMBOLS, [
        {"metadata": (MT_GAUGE, 0, 0),
         "labels_refs": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
         "samples": [(1, 1)], "created_timestamp": 1},
        {"metadata": (MT_GAUGE, 0, 0),
         "labels_refs": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
         "samples": [(2, 2)], "created_timestamp": 2},
        {"metadata": (MT_GAUGE, 0, 0),
         "labels_refs": [1, 2, 3, 9, 5, 10, 7, 8, 9, 10],
         "samples": [(2, 2)], "created_timestamp": 2},
    ])


def test_fixture_gauges():
    rows, err = translate_v2_request(fixture_request())
    assert err is None
    assert len(rows) == 3
    r0, r1, r2 = rows
    assert (r0["service_namespace"], r0["service_name"],
            r0["service_instance_id"]) == ("service-x", "test", "107cn001")
    assert r0["mtype"] == "gauge" and r0["value_double"] == 1.0
    assert r0["time_ns"] == 1_000_000
    assert r0["start_time_ns"] == 1_000_000
    assert r0["attributes"] == [("d", "e"), ("foo", "bar")]
    assert r1["value_double"] == 2.0
    # third series: job=foo (no '/'), instance=bar
    assert r2["service_namespace"] is None
    assert (r2["service_name"], r2["service_instance_id"]) == ("foo", "bar")


def test_counter_becomes_sum_and_scope_labels():
    buf = build_symbolized_request([{
        "labels": [("__name__", "reqs_total"), ("job", "j"),
                   ("instance", "i"), ("otel_scope_name", "scope1"),
                   ("otel_scope_version", "v1"), ("a", "b")],
        "metadata": (MT_COUNTER, "help!", "unit!"),
        "samples": [(5.0, 100)], "created_timestamp": 50,
    }])
    rows, err = translate_v2_request(buf, scope_name_default="D",
                                     scope_version_default="V")
    assert err is None
    (r,) = rows
    assert r["mtype"] == "sum"
    assert (r["scope_name"], r["scope_version"]) == ("scope1", "v1")
    assert (r["unit"], r["description"]) == ("unit!", "help!")
    assert r["attributes"] == [("a", "b")]  # scope labels excluded
    assert r["start_time_ns"] == 50_000_000


def test_scope_defaults_apply():
    buf = build_symbolized_request([{
        "labels": [("__name__", "m"), ("job", "j")],
        "metadata": (MT_GAUGE, 0, 0), "samples": [(1.0, 1)],
    }])
    rows, _ = translate_v2_request(buf, scope_name_default="OpenTelemetry Collector",
                                   scope_version_default="latest")
    assert (rows[0]["scope_name"], rows[0]["scope_version"]) == (
        "OpenTelemetry Collector", "latest")
    assert rows[0]["service_instance_id"] is None


def test_whole_request_errors():
    # missing metric name
    bad = build_symbolized_request([
        {"labels": [("job", "j")], "metadata": (MT_GAUGE, 0, 0),
         "samples": [(1.0, 1)]},
        {"labels": [("__name__", "ok"), ("job", "j")],
         "metadata": (MT_GAUGE, 0, 0), "samples": [(1.0, 1)]},
    ])
    rows, err = translate_v2_request(bad)
    assert rows is None and "missing metric name" in err
    # duplicate label
    dup = build_symbolized_request([
        {"labels": [("__name__", "m"), ("x", "1"), ("x", "2")],
         "metadata": (MT_GAUGE, 0, 0), "samples": [(1.0, 1)]}])
    rows, err = translate_v2_request(dup)
    assert rows is None and "duplicate label" in err
    # out-of-bounds unit ref
    oob = encode_writev2_request(["", "__name__", "m"], [
        {"labels_refs": [1, 2], "metadata": (MT_GAUGE, 0, 99),
         "samples": [(1.0, 1)]}])
    rows, err = translate_v2_request(oob)
    assert rows is None and "unit ref" in err
    # unsupported type (stateset=7)
    uns = build_symbolized_request([
        {"labels": [("__name__", "m")], "metadata": (7, 0, 0),
         "samples": [(1.0, 1)]}])
    rows, err = translate_v2_request(uns)
    assert rows is None and "unsupported metric type" in err


def test_silent_drops():
    # summary series and classic histogram (histogram type + samples)
    buf = build_symbolized_request([
        {"labels": [("__name__", "s")], "metadata": (MT_SUMMARY, 0, 0),
         "samples": [(1.0, 1)]},
        {"labels": [("__name__", "h")], "metadata": (MT_HISTOGRAM, 0, 0),
         "samples": [(1.0, 1)],
         "histograms": [{"count_int": 1, "sum": 1.0, "schema": 0,
                         "timestamp": 1}]},
        {"labels": [("__name__", "g")], "metadata": (MT_GAUGE, 0, 0),
         "samples": [(7.0, 1)]},
    ])
    rows, err = translate_v2_request(buf)
    assert err is None
    assert [r["name"] for r in rows] == ["g"]


def test_histogram_drops_gauge_hint_and_invalid_schema():
    buf = build_symbolized_request([
        {"labels": [("__name__", "h")], "metadata": (MT_HISTOGRAM, 0, 0),
         "histograms": [
             {"count_int": 1, "sum": 1.0, "schema": 0, "timestamp": 1,
              "reset_hint": 3},                     # RESET_HINT_GAUGE
             {"count_int": 1, "sum": 1.0, "schema": 42, "timestamp": 1},
             {"count_int": 1, "sum": 1.0, "schema": 9, "timestamp": 1},
         ]}])
    rows, err = translate_v2_request(buf)
    assert err is None and rows == []


def test_exponential_histogram_integer():
    """TestTranslateV2 'exponential histogram' vector
    (receiver_test.go:660-735)."""
    buf = build_symbolized_request([{
        "labels": [("__name__", "test_metric"), ("job", "service-x/test"),
                   ("instance", "107cn001"), ("otel_scope_name", "scope1"),
                   ("otel_scope_version", "v1"), ("attr1", "attr1")],
        "metadata": (MT_HISTOGRAM, 0, 0), "created_timestamp": 1,
        "histograms": [{
            "count_int": 20, "sum": 30.0, "timestamp": 1,
            "zero_threshold": 1.0, "zero_count_int": 2, "schema": -4,
            "positive_spans": [(1, 2), (3, 1)],
            "negative_spans": [(0, 1), (2, 1)],
            "positive_deltas": [100, 244, 221],
            "negative_deltas": [1, 2],
        }]}])
    rows, err = translate_v2_request(buf)
    assert err is None
    (r,) = rows
    assert r["mtype"] == "exponential_histogram"
    assert r["scale"] == -4
    assert r["sum"] == 30.0 and r["count"] == 20
    assert r["zero_count"] == 2 and r["zero_threshold"] == 1.0
    assert r["positive_offset"] == 0
    assert r["positive_buckets"] == [100, 344, 0, 0, 0, 565]
    assert r["negative_offset"] == -1
    assert r["negative_buckets"] == [1, 0, 0, 3]
    assert r["start_time_ns"] == 1_000_000 and r["time_ns"] == 1_000_000
    assert r["attributes"] == [("attr1", "attr1")]


def test_exponential_histogram_negative_counts_dropped():
    buf = build_symbolized_request([{
        "labels": [("__name__", "m")], "metadata": (MT_HISTOGRAM, 0, 0),
        "histograms": [{"count_int": 5, "sum": 1.0, "schema": 0,
                        "timestamp": 1, "positive_spans": [(1, 2)],
                        "positive_deltas": [100, -500]}]}])
    rows, err = translate_v2_request(buf)
    assert err is None and rows == []
    # float histogram with a negative absolute count
    buf = build_symbolized_request([{
        "labels": [("__name__", "m")], "metadata": (MT_HISTOGRAM, 0, 0),
        "histograms": [{"count_float": 5.0, "sum": 1.0, "schema": 0,
                        "timestamp": 1, "positive_spans": [(1, 1)],
                        "positive_counts": [-3.0]}]}])
    rows, err = translate_v2_request(buf)
    assert err is None and rows == []


def test_exponential_histogram_float_absolute():
    buf = build_symbolized_request([{
        "labels": [("__name__", "m")], "metadata": (MT_HISTOGRAM, 0, 0),
        "histograms": [{"count_float": 6.9, "sum": 10.0, "schema": 2,
                        "timestamp": 3, "zero_count_float": 1.5,
                        "positive_spans": [(2, 2), (1, 1)],
                        "positive_counts": [2.9, 3.0, 4.2]}]}])
    rows, err = translate_v2_request(buf)
    assert err is None
    (r,) = rows
    assert r["count"] == 6            # uint64 truncation
    assert r["zero_count"] == 1
    assert r["positive_offset"] == 1
    assert r["positive_buckets"] == [2, 3, 0, 4]


def test_nhcb_integer():
    """TestTranslateV2 'NHCB translation' vector
    (receiver_test.go:1090-1156)."""
    buf = build_symbolized_request([{
        "labels": [("__name__", "test_hncb_histogram"), ("job", "test"),
                   ("instance", "localhost:8080")],
        "metadata": (MT_HISTOGRAM, 0, 0), "created_timestamp": 123456000,
        "histograms": [{
            "timestamp": 123456789, "schema": -53, "sum": 100.5,
            "count_int": 180, "custom_values": [1.0, 2.0, 5.0, 10.0],
            "positive_spans": [(0, 5)],
            "positive_deltas": [10, 15, 20, 5, 0]}]}])
    rows, err = translate_v2_request(
        buf, scope_name_default="OpenTelemetry Collector",
        scope_version_default="latest")
    assert err is None
    (r,) = rows
    assert r["mtype"] == "histogram"
    assert r["service_name"] == "test"
    assert r["service_namespace"] is None
    assert r["explicit_bounds"] == [1.0, 2.0, 5.0, 10.0]
    assert r["bucket_counts"] == [10, 25, 45, 50, 50]
    assert r["sum"] == 100.5 and r["count"] == 180
    assert r["start_time_ns"] == 123456000 * 1_000_000
    assert r["time_ns"] == 123456789 * 1_000_000
    assert r["no_recorded_value"] is False


def test_nhcb_stale_nan():
    buf = build_symbolized_request([{
        "labels": [("__name__", "stale"), ("job", "test")],
        "metadata": (MT_HISTOGRAM, 0, 0),
        "histograms": [{
            "timestamp": 123456789, "schema": -53, "sum": STALE_NAN,
            "count_int": 0, "custom_values": [1.0, 2.0, 5.0, 10.0]}]}])
    rows, err = translate_v2_request(buf)
    assert err is None
    (r,) = rows
    assert r["no_recorded_value"] is True
    assert r["sum"] is None and r["count"] is None
    assert r["bucket_counts"] == [0, 0, 0, 0, 0]
    # an ordinary NaN sum is NOT stale
    assert not math.isnan(STALE_NAN) is False  # STALE_NAN is a NaN
    buf2 = build_symbolized_request([{
        "labels": [("__name__", "plain_nan"), ("job", "test")],
        "metadata": (MT_HISTOGRAM, 0, 0),
        "histograms": [{
            "timestamp": 1, "schema": -53, "sum": float("nan"),
            "count_int": 2, "custom_values": [1.0]}]}])
    rows2, _ = translate_v2_request(buf2)
    assert rows2[0]["no_recorded_value"] is False


def test_nhcb_without_custom_values_dropped():
    buf = build_symbolized_request([{
        "labels": [("__name__", "m")], "metadata": (MT_HISTOGRAM, 0, 0),
        "histograms": [{"timestamp": 1, "schema": -53, "sum": 1.0,
                        "count_int": 1}]}])
    rows, err = translate_v2_request(buf)
    assert err is None and rows == []


def test_target_info_resource_attrs():
    buf = build_symbolized_request([
        {"labels": [("__name__", "m1"), ("job", "ns/svc"),
                    ("instance", "i1")],
         "metadata": (MT_GAUGE, 0, 0), "samples": [(1.0, 1)]},
        {"labels": [("__name__", "target_info"), ("job", "ns/svc"),
                    ("instance", "i1"), ("k8s_cluster", "c1"),
                    ("extra", "x")], "metadata": (0, 0, 0)},
        {"labels": [("__name__", "m2"), ("job", "other"),
                    ("instance", "i2")],
         "metadata": (MT_GAUGE, 0, 0), "samples": [(2.0, 2)]},
    ])
    rows, err = translate_v2_request(buf)
    assert err is None
    by_name = {r["name"]: r for r in rows}
    assert by_name["m1"]["resource_attrs"] == [
        ("extra", "x"), ("k8s_cluster", "c1")]
    assert by_name["m2"]["resource_attrs"] == []


def test_description_longest_wins():
    buf = build_symbolized_request([
        {"labels": [("__name__", "m"), ("job", "j")],
         "metadata": (MT_GAUGE, "short", 0), "samples": [(1.0, 1)]},
        {"labels": [("__name__", "m"), ("job", "j")],
         "metadata": (MT_GAUGE, "a much longer description", 0),
         "samples": [(2.0, 2)]},
    ])
    rows, err = translate_v2_request(buf)
    assert err is None
    assert all(r["description"] == "a much longer description"
               for r in rows)


def test_stage_whole_request_drop(ray_session):
    import ray.data
    good = fixture_request()
    bad = build_symbolized_request([
        {"labels": [("job", "j")], "metadata": (MT_GAUGE, 0, 0),
         "samples": [(1.0, 1)]}])
    tab = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "body": pa.array([good, bad], pa.binary())})
    out = PrwDecode(body_col="body", id_cols=("doc_id",))(tab)
    assert out.column("doc_id").to_pylist() == [1, 1, 1]
    assert out.num_rows == 3


def test_codec_cross_check_with_google_protobuf():
    """Two-way cross-decode against google.protobuf messages built from
    an independently-declared descriptor of the public PRW 2.0
    types.proto (prompb/io/prometheus/write/v2)."""
    pb = pytest.importorskip("google.protobuf")  # noqa: F841
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)

    F = descriptor_pb2.FieldDescriptorProto
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "writev2_xcheck.proto"
    fdp.package = "wv2"
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
            f.type_name = ".wv2." + type_name
        return f

    req = msg("Request")
    field(req, "symbols", 4, F.TYPE_STRING, repeated=True)
    field(req, "timeseries", 5, F.TYPE_MESSAGE, repeated=True,
          type_name="TimeSeries")
    ts = msg("TimeSeries")
    field(ts, "labels_refs", 1, F.TYPE_UINT32, repeated=True)
    field(ts, "samples", 2, F.TYPE_MESSAGE, repeated=True,
          type_name="Sample")
    field(ts, "histograms", 3, F.TYPE_MESSAGE, repeated=True,
          type_name="Histogram")
    field(ts, "metadata", 5, F.TYPE_MESSAGE, type_name="Metadata")
    field(ts, "created_timestamp", 6, F.TYPE_INT64)
    sample = msg("Sample")
    field(sample, "value", 1, F.TYPE_DOUBLE)
    field(sample, "timestamp", 2, F.TYPE_INT64)
    md = msg("Metadata")
    field(md, "type", 1, F.TYPE_INT32)  # enum as int
    field(md, "help_ref", 3, F.TYPE_UINT32)
    field(md, "unit_ref", 4, F.TYPE_UINT32)
    hist = msg("Histogram")
    hist.oneof_decl.add().name = "count"
    hist.oneof_decl.add().name = "zero_count"
    f1 = field(hist, "count_int", 1, F.TYPE_UINT64)
    f1.oneof_index = 0
    f2 = field(hist, "count_float", 2, F.TYPE_DOUBLE)
    f2.oneof_index = 0
    f3 = field(hist, "zero_count_int", 3, F.TYPE_UINT64)
    f3.oneof_index = 1
    f4 = field(hist, "zero_count_float", 4, F.TYPE_DOUBLE)
    f4.oneof_index = 1
    field(hist, "sum", 5, F.TYPE_DOUBLE)
    field(hist, "schema", 6, F.TYPE_SINT32)
    field(hist, "zero_threshold", 7, F.TYPE_DOUBLE)
    field(hist, "negative_spans", 8, F.TYPE_MESSAGE, repeated=True,
          type_name="BucketSpan")
    field(hist, "negative_deltas", 9, F.TYPE_SINT64, repeated=True)
    field(hist, "negative_counts", 10, F.TYPE_DOUBLE, repeated=True)
    field(hist, "positive_spans", 11, F.TYPE_MESSAGE, repeated=True,
          type_name="BucketSpan")
    field(hist, "positive_deltas", 12, F.TYPE_SINT64, repeated=True)
    field(hist, "positive_counts", 13, F.TYPE_DOUBLE, repeated=True)
    field(hist, "reset_hint", 14, F.TYPE_INT32)
    field(hist, "timestamp", 15, F.TYPE_INT64)
    field(hist, "custom_values", 16, F.TYPE_DOUBLE, repeated=True)
    span = msg("BucketSpan")
    field(span, "offset", 1, F.TYPE_SINT32)
    field(span, "length", 2, F.TYPE_UINT32)

    pool = descriptor_pool.DescriptorPool()
    fd = pool.Add(fdp)
    Request = message_factory.GetMessageClass(
        fd.message_types_by_name["Request"])

    # mine -> protobuf
    buf = build_symbolized_request([{
        "labels": [("__name__", "m"), ("job", "a/b")],
        "metadata": (MT_HISTOGRAM, 0, 0), "created_timestamp": -7,
        "histograms": [{
            "count_float": 2.5, "zero_count_float": 0.5, "sum": -3.25,
            "schema": -4, "zero_threshold": 1e-6,
            "positive_spans": [(-2, 1), (3, 2)],
            "positive_counts": [1.0, 2.0, 3.0],
            "negative_spans": [(1, 1)], "negative_deltas": [-5],
            "reset_hint": 2, "timestamp": -9,
            "custom_values": [0.5, 1.5]}],
    }, {
        "labels": [("__name__", "g")],
        "metadata": (MT_GAUGE, 0, 0), "samples": [(-1.5, -42)],
    }])
    m = Request()
    m.ParseFromString(buf)
    assert list(m.symbols) == ["", "__name__", "m", "job", "a/b", "g"]
    h = m.timeseries[0].histograms[0]
    assert h.count_float == 2.5 and h.WhichOneof("count") == "count_float"
    assert h.schema == -4 and h.timestamp == -9
    assert [(s.offset, s.length) for s in h.positive_spans] == [(-2, 1),
                                                                (3, 2)]
    assert list(h.negative_deltas) == [-5]
    assert list(h.custom_values) == [0.5, 1.5]
    assert m.timeseries[0].created_timestamp == -7
    assert m.timeseries[1].samples[0].value == -1.5
    assert m.timeseries[1].samples[0].timestamp == -42

    # protobuf -> mine
    m2 = Request()
    m2.symbols.extend(["", "__name__", "x"])
    t = m2.timeseries.add()
    t.labels_refs.extend([1, 2])
    t.metadata.type = MT_HISTOGRAM
    t.created_timestamp = 11
    hh = t.histograms.add()
    hh.count_int = 9
    hh.zero_count_int = 1
    hh.sum = 4.5
    hh.schema = 3
    hh.positive_spans.add(offset=-1, length=2)
    hh.positive_deltas.extend([2, -1])
    hh.timestamp = 13
    syms, series = decode_writev2_request(m2.SerializeToString())
    assert syms == ["", "__name__", "x"]
    hd = series[0]["histograms"][0]
    assert hd["count_kind"] == "int" and hd["count"] == 9
    assert hd["schema"] == 3
    assert hd["positive_spans"] == [(-1, 2)]
    assert hd["positive_deltas"] == [2, -1]
    rows, err = translate_v2_request(m2.SerializeToString())
    assert err is None
    assert rows[0]["positive_buckets"] == [2, 1]
    assert rows[0]["positive_offset"] == -2
