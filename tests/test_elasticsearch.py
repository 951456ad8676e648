"""elasticsearchexporter parity: objmodel document semantics, mapping
modes, data-stream routing — pinned on the reference's own model_test.go
golden documents."""

import datetime
import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.elasticsearch import (
    ESDoc,
    encode_log_doc,
    encode_span_doc,
    logs_to_elasticsearch,
    route_record,
    sanitize_data_stream_field,
    spans_to_elasticsearch,
    _DISALLOWED_DS,
    _DISALLOWED_NS,
)

TS_2023 = int(datetime.datetime(
    2023, 4, 19, 3, 4, 5, tzinfo=datetime.timezone.utc
).timestamp()) * 10 ** 9 + 6
TS_2024 = 1710273641123456789


# --- objmodel semantics ---------------------------------------------------

def test_dedup_last_wins_and_prefix_rename():
    # (path.x=1, path.x.a="test") → (path.x.value=1, path.x.a="test")
    d = ESDoc()
    d.add("path.x", 1)
    d.add("path.x.a", "test")
    assert d.serialize(True) == '{"path":{"x":{"a":"test","value":1}}}'
    # duplicate keys: LAST value wins
    d = ESDoc()
    d.add("k", 1)
    d.add("k", 2)
    assert d.serialize(False) == '{"k":2}'
    # renamed field loses to an existing .value field
    d = ESDoc()
    d.add("path.x", 1)
    d.add("path.x.value", 7)
    assert d.serialize(True) == '{"path":{"x":{"value":7}}}'


def test_value_rendering():
    d = ESDoc()
    d.add("f", 1.0)           # explicit radix point
    d.add("g", float("nan"))  # NaN → null
    d.add("i", 42)
    d.add("b", True)
    d.add("arr", [1, {"m": 2}])
    assert d.serialize(False) == \
        '{"arr":[1,{"m":2}],"b":true,"f":1.0,"g":null,"i":42}'


def test_nested_attribute_flattening():
    d = ESDoc()
    d.add_attributes("A", {"x": {"y": 1}, "z": "s"})
    assert d.serialize(False) == '{"A.x.y":1,"A.z":"s"}'
    d = ESDoc()
    d.add_attributes("", {"x": {"y": 1}, "z": "s"})
    assert d.serialize(True) == '{"x":{"y":1},"z":"s"}'


# --- reference golden documents -------------------------------------------

LEGACY_LOG_WANT = (
    '{"@timestamp":"2023-04-19T03:04:05.000000006Z",'
    '"Attributes.log-attr1":"value1","Body":"log-body",'
    '"Resource.key1":"value1","Scope.name":"","Scope.version":"",'
    '"SeverityNumber":0,"TraceFlags":0}')


def test_legacy_log_golden():
    got = encode_log_doc(
        "none", body="log-body", time_unix_nano=TS_2023, observed_ns=0,
        severity_number=0, severity_text=None, trace_id=None,
        span_id=None, flags=0, attrs={"log-attr1": "value1"},
        resource={"key1": "value1"}, scope_name="", scope_version="",
        scope_attrs={}, index="")
    assert got == LEGACY_LOG_WANT
    # zero record timestamp falls back to observed; both zero → epoch
    got = encode_log_doc(
        "none", body="log-body", time_unix_nano=0, observed_ns=0,
        severity_number=0, severity_text=None, trace_id=None,
        span_id=None, flags=0, attrs={"log-attr1": "value1"},
        resource={"key1": "value1"}, scope_name="", scope_version="",
        scope_attrs={}, index="")
    assert got.startswith('{"@timestamp":"1970-01-01T00:00:00.000000000Z"')


def test_mode_matrix_golden():
    common = dict(body=None, time_unix_nano=0, observed_ns=0,
                  severity_number=0, severity_text=None, trace_id=None,
                  span_id=None, flags=0,
                  attrs={"s": "baz", "o": {"sub_i": 19}}, resource={},
                  scope_name="", scope_version="",
                  scope_attrs={"keyStr": "val str", "keyInt": 42},
                  index="")
    assert json.loads(encode_log_doc("raw", **common)) == {
        "@timestamp": "1970-01-01T00:00:00.000000000Z",
        "Scope.name": "", "Scope.version": "", "Scope.keyInt": 42,
        "Scope.keyStr": "val str", "SeverityNumber": 0, "TraceFlags": 0,
        "o.sub_i": 19, "s": "baz"}
    assert json.loads(encode_log_doc("none", **common)) == {
        "@timestamp": "1970-01-01T00:00:00.000000000Z",
        "Scope.name": "", "Scope.version": "", "Scope.keyInt": 42,
        "Scope.keyStr": "val str", "SeverityNumber": 0, "TraceFlags": 0,
        "Attributes.o.sub_i": 19, "Attributes.s": "baz"}
    assert json.loads(encode_log_doc("ecs", **common)) == {
        "@timestamp": "1970-01-01T00:00:00.000000000Z",
        "agent": {"name": "otlp"}, "keyInt": 42, "keyStr": "val str",
        "o": {"sub_i": 19}, "s": "baz"}


def test_ecs_log_duplication_golden():
    # TestEncodeLogECSModeDuplication — byte-exact
    res = {"service.name": "foo.bar", "host.name": "localhost",
           "service.version": "1.1.0", "os.type": "darwin",
           "os.description": "Mac OS Mojave", "os.name": "Mac OS X",
           "os.version": "10.14.1",
           "container.image.tags": ["v3.4.0"]}
    got = encode_log_doc(
        "ecs", body=None, time_unix_nano=0, observed_ns=TS_2024,
        severity_number=0, severity_text=None, trace_id=None,
        span_id=None, flags=0,
        attrs={"event.name": "user-password-change"}, resource=res,
        scope_name=None, scope_version=None, scope_attrs={}, index="")
    assert got == (
        '{"@timestamp":"2024-03-12T20:00:41.123456789Z",'
        '"agent":{"name":"otlp"},'
        '"container":{"image":{"tag":["v3.4.0"]}},'
        '"event":{"action":"user-password-change"},'
        '"host":{"hostname":"localhost","name":"localhost",'
        '"os":{"full":"Mac OS Mojave","name":"Mac OS X",'
        '"platform":"darwin","type":"macos","version":"10.14.1"}},'
        '"service":{"name":"foo.bar","version":"1.1.0"}}')


def test_ecs_span_golden():
    row = {"trace_id": "01020304050607080807060504030201",
           "span_id": "1920212223242526",
           "parent_span_id": "0102030405060708",
           "span_name": "client span", "span_kind": 3,
           "start_time_unix_nano": TS_2023,
           "end_time_unix_nano": TS_2023 + 10 ** 9,
           "status_code": 2, "status_message": "Test",
           "attributes": "{}",
           "resource_attributes": json.dumps({
               "cloud.provider": "aws",
               "cloud.platform": "aws_elastic_beanstalk",
               "deployment.environment": "BETA",
               "service.instance.id": "23",
               "service.name": "some-service",
               "service.version": "env-version-1234"}),
           "links": json.dumps([
               {"traceId": "01020304050607080807060504030201",
                "spanId": "1112131415161718"},
               {"traceId": "21222324252627282827262524232221",
                "spanId": "3132333435363738"}]),
           "events": "[]"}
    got = json.loads(encode_span_doc("ecs", row, ""))
    assert got == {
        "@timestamp": "2023-04-19T03:04:05.000000006Z",
        "trace": {"id": "01020304050607080807060504030201"},
        "span": {"id": "1920212223242526", "name": "client span",
                 "links": [
                     {"span_id": "1112131415161718",
                      "trace_id": "01020304050607080807060504030201"},
                     {"span_id": "3132333435363738",
                      "trace_id": "21222324252627282827262524232221"}]},
        "parent": {"id": "0102030405060708"},
        "cloud": {"provider": "aws",
                  "service": {"name": "aws_elastic_beanstalk"}},
        "event": {"outcome": "failure"},
        "service": {"environment": "BETA", "name": "some-service",
                    "node": {"name": "23"},
                    "version": "env-version-1234"}}


def test_legacy_span_golden():
    # expectedSpanBody (model_test.go:32), minus the scope attribute
    # which the flat span rows do not carry
    row = {"trace_id": "01020304050607080807060504030201",
           "span_id": "1920212223242526", "parent_span_id": None,
           "span_name": "client span", "span_kind": 3,
           "start_time_unix_nano": TS_2023,
           "end_time_unix_nano": TS_2023 + 10 ** 9,
           "status_code": 2, "status_message": "Test",
           "attributes": json.dumps({"service.instance.id": "23"}),
           "resource_attributes": json.dumps({
               "cloud.platform": "aws_elastic_beanstalk",
               "cloud.provider": "aws",
               "deployment.environment": "BETA",
               "service.instance.id": "23",
               "service.name": "some-service",
               "service.version": "env-version-1234"}),
           "scope_name": "io.opentelemetry.rabbitmq-2.7",
           "scope_version": "1.30.0-alpha",
           "links": json.dumps([
               {"traceId": "01020304050607080807060504030200",
                "spanId": "", "attributes": {}}]),
           "events": json.dumps([
               {"name": "fooEvent", "timeUnixNano": TS_2023,
                "attributes": {"eventMockBar": "bar",
                               "eventMockFoo": "foo"}}])}
    got = encode_span_doc("none", row, "")
    assert got == (
        '{"@timestamp":"2023-04-19T03:04:05.000000006Z",'
        '"Attributes.service.instance.id":"23","Duration":1000000,'
        '"EndTimestamp":"2023-04-19T03:04:06.000000006Z",'
        '"Events.fooEvent.eventMockBar":"bar",'
        '"Events.fooEvent.eventMockFoo":"foo",'
        '"Events.fooEvent.time":"2023-04-19T03:04:05.000000006Z",'
        '"Kind":"SPAN_KIND_CLIENT",'
        '"Link":"[{\\"attribute\\":{},\\"spanID\\":\\"\\",'
        '\\"traceID\\":\\"01020304050607080807060504030200\\"}]",'
        '"Name":"client span",'
        '"Resource.cloud.platform":"aws_elastic_beanstalk",'
        '"Resource.cloud.provider":"aws",'
        '"Resource.deployment.environment":"BETA",'
        '"Resource.service.instance.id":"23",'
        '"Resource.service.name":"some-service",'
        '"Resource.service.version":"env-version-1234",'
        '"Scope.name":"io.opentelemetry.rabbitmq-2.7",'
        '"Scope.version":"1.30.0-alpha",'
        '"SpanId":"1920212223242526",'
        '"TraceId":"01020304050607080807060504030201",'
        '"TraceStatus":2,"TraceStatusDescription":"Test"}')


def test_bodymap_mode():
    got = encode_log_doc("bodymap", body={"a": 1, "b": "x"},
                         time_unix_nano=0, observed_ns=0,
                         severity_number=0, severity_text=None,
                         trace_id=None, span_id=None, flags=0, attrs={},
                         resource={}, scope_name=None,
                         scope_version=None, scope_attrs={}, index="")
    assert json.loads(got) == {"a": 1, "b": "x"}
    with pytest.raises(ValueError):
        encode_log_doc("bodymap", body="not a map", time_unix_nano=0,
                       observed_ns=0, severity_number=0,
                       severity_text=None, trace_id=None, span_id=None,
                       flags=0, attrs={}, resource={}, scope_name=None,
                       scope_version=None, scope_attrs={}, index="")


# --- routing ---------------------------------------------------------------

def test_sanitize_data_stream_field():
    assert sanitize_data_stream_field("My-DS#1", _DISALLOWED_DS) == \
        "my_ds_1"
    assert sanitize_data_stream_field("My-DS#1", _DISALLOWED_NS) == \
        "my-ds_1"                      # '-' allowed in namespaces
    long = "x" * 200
    assert sanitize_data_stream_field(long, _DISALLOWED_DS, ".otel") == \
        "x" * 95 + ".otel"


def test_route_record_precedence():
    # 1. elasticsearch.index attr wins
    assert route_record({"elasticsearch.index": "idx"}, {}, {}, "",
                        "logs") == "idx"
    # 2. data_stream attrs, record > scope > resource
    assert route_record({"data_stream.dataset": "rec"},
                        {"data_stream.dataset": "sco"},
                        {"data_stream.dataset": "res"}, "",
                        "logs") == "logs-rec-default"
    # 3. receiver-based only when no dataset attr
    scope = "github.com/x/receiver/hostmetricsreceiver/internal/foo"
    assert route_record({}, {}, {}, scope, "logs") == \
        "logs-hostmetricsreceiver-default"
    assert route_record({"data_stream.dataset": "d"}, {}, {}, scope,
                        "logs") == "logs-d-default"
    # 4. defaults
    assert route_record({}, {}, {}, "", "metrics") == \
        "metrics-generic-default"
    # static index wins over everything
    assert route_record({"elasticsearch.index": "idx"}, {}, {}, "",
                        "logs", static_index="static") == "static"


# --- Ray stages --------------------------------------------------------------

def test_logs_to_elasticsearch_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "body": pa.array(["hello", "world"], pa.string()),
        "time_unix_nano": pa.array([TS_2023] * 2, pa.int64()),
        "attributes": pa.array(
            [json.dumps({"data_stream.dataset": "ds1"}), "{}"],
            pa.string()),
        "resource_attributes": pa.array(
            [json.dumps({"service.name": "s"})] * 2, pa.string()),
    }))
    out = logs_to_elasticsearch(ds, "ecs").to_pandas()
    assert list(out["es_index"]) == ["logs-ds1-default",
                                     "logs-generic-default"]
    docs = [json.loads(d) for d in out["es_doc"]]
    assert docs[0]["message"] == "hello"
    assert docs[0]["data_stream"] == {
        "type": "logs", "dataset": "ds1", "namespace": "default"}
    assert docs[1]["service"] == {"name": "s"}


def test_bodymap_error_row(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "body": pa.array(['{"a": 1}', "plain"], pa.string()),
    }))
    out = logs_to_elasticsearch(ds, "bodymap").to_pandas()
    assert len(out) == 1                       # non-map body dropped
    assert json.loads(out["es_doc"].iloc[0]) == {"a": 1}
    kept = logs_to_elasticsearch(ds, "bodymap",
                                 on_error="keep").to_pandas()
    assert len(kept) == 2 and kept["error"].notna().sum() == 1


def test_spans_to_elasticsearch_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "trace_id": pa.array(["ab" * 16], pa.string()),
        "span_id": pa.array(["cd" * 8], pa.string()),
        "parent_span_id": pa.array([None], pa.string()),
        "span_name": pa.array(["op"], pa.string()),
        "span_kind": pa.array([2], pa.int64()),
        "start_time_unix_nano": pa.array([TS_2023], pa.int64()),
        "end_time_unix_nano": pa.array([TS_2023 + 1000], pa.int64()),
        "status_code": pa.array([1], pa.int64()),
        "status_message": pa.array([None], pa.string()),
        "attributes": pa.array(["{}"], pa.string()),
        "resource_attributes": pa.array(
            [json.dumps({"service.name": "s"})], pa.string()),
        "links": pa.array(["[]"], pa.string()),
        "events": pa.array(["[]"], pa.string()),
    }))
    out = spans_to_elasticsearch(ds, "ecs").to_pandas()
    assert out["es_index"].iloc[0] == "traces-generic-default"
    doc = json.loads(out["es_doc"].iloc[0])
    assert doc["event"] == {"outcome": "success"}
    assert doc["span"]["id"] == "cd" * 8
