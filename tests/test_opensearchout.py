"""opensearchexporter parity — SS4O documents, Log Data Model modes,
index naming (encoder.go, sso_model.go, sso_log_exporter.go)."""

import json

from opentelemetry_collector_contrib_ray.stages.opensearchout import (
    encode_log_data_model,
    encode_log_sso,
    encode_span_sso,
    get_index_name,
    resolve_log_index_name,
)

LOG = {
    "time_unix_nano": 1681873445123456789,
    "observed_time_unix_nano": 1681873446000000000,
    "severity_number": 9,
    "severity_text": "Info",
    "body": "hello",
    "trace_id": "0102030405060708090a0b0c0d0e0f10",
    "span_id": "0102030405060708",
    "attributes": json.dumps({"k": "v", "n": 7}),
    "resource_attributes": json.dumps({"service.name": "svc",
                                       "num": 5}),
    "scope_name": "lib",
    "scope_version": "1.0",
    "scope_schema_url": "http://s",
    "flags": 1,
}


def test_ss4o_log_golden():
    doc = encode_log_sso(dict(LOG), dataset="ds", namespace="ns")
    assert doc == (
        '{"attributes":{"data_stream":{"dataset":"ds","namespace":'
        '"ns","type":"record"},"k":"v","n":7},"body":"hello",'
        '"instrumentationScope":{"name":"lib","schemaUrl":"http://s",'
        '"version":"1.0"},'
        '"observedTimestamp":"2023-04-19T03:04:06Z",'
        '"resource":{"num":"5","service.name":"svc"},'
        '"schemaUrl":"http://s",'
        '"severity":{"text":"Info","number":9},'
        '"spanId":"0102030405060708",'
        '"@timestamp":"2023-04-19T03:04:05.123456789Z",'
        '"traceId":"0102030405060708090a0b0c0d0e0f10"}')


def test_ss4o_log_minimal():
    row = {"body": "", "attributes": "{}", "resource_attributes": "{}",
           "scope_name": "", "time_unix_nano": 0,
           "observed_time_unix_nano": 0}
    doc = encode_log_sso(row)
    assert doc == (
        '{"body":"","instrumentationScope":{},'
        '"observedTimestamp":"1970-01-01T00:00:00Z",'
        '"severity":{},'
        '"@timestamp":"1970-01-01T00:00:00Z"}')


SPAN = {
    "trace_id": "0102030405060708090a0b0c0d0e0f10",
    "span_id": "0102030405060708",
    "parent_span_id": "1112131415161718",
    "trace_state": "a=b",
    "span_name": "op",
    "span_kind": 2,
    "start_time_unix_nano": 1681873445000000000,
    "end_time_unix_nano": 1681873446000000000,
    "status_code": 2,
    "status_message": "boom",
    "attributes": json.dumps({"a": 1}),
    "resource_attributes": json.dumps({"service.name": "svc"}),
    "scope_name": "lib",
    "scope_version": "1.0",
    "events": json.dumps([
        {"name": "e1", "timeUnixNano": 1681873445500000000,
         "attributes": {"x": "y"}},
        # a timestamp inside the first unix second renders observed
        {"name": "early", "timeUnixNano": 999999999,
         "attributes": {}},
    ]),
    "links": json.dumps([
        {"traceId": "f" * 32, "spanId": "e" * 16, "traceState": "t=1",
         "attributes": {"l": "v"}},
    ]),
}


def test_ss4o_span_golden():
    doc = encode_span_sso(dict(SPAN), dataset="d", namespace="",
                          observed_ns=1700000000000000000)
    assert doc == (
        '{"attributes":{"a":1,"data_stream":{"dataset":"d",'
        '"type":"span"}},'
        '"droppedAttributesCount":0,"droppedEventsCount":0,'
        '"droppedLinksCount":0,'
        '"endTime":"2023-04-19T03:04:06Z",'
        '"events":[{"attributes":{"x":"y"},'
        '"droppedAttributesCount":0,"name":"e1",'
        '"@timestamp":"2023-04-19T03:04:05.5Z"},'
        '{"attributes":{},"droppedAttributesCount":0,"name":"early",'
        '"observedTimestamp":"2023-11-14T22:13:20Z"}],'
        '"instrumentationScope":{"droppedAttributesCount":0,'
        '"name":"lib","schemaUrl":"","version":"1.0"},'
        '"kind":"Server",'
        '"links":[{"attributes":{"l":"v"},'
        '"spanId":"eeeeeeeeeeeeeeee",'
        '"traceId":"ffffffffffffffffffffffffffffffff",'
        '"traceState":"t=1"}],'
        '"name":"op","parentSpanId":"1112131415161718",'
        '"resource":{"service.name":"svc"},'
        '"spanId":"0102030405060708",'
        '"startTime":"2023-04-19T03:04:05Z",'
        '"status":{"code":"Error","message":"boom"},'
        '"@timestamp":"0001-01-01T00:00:00Z",'
        '"traceId":"0102030405060708090a0b0c0d0e0f10",'
        '"traceState":"a=b"}')


def test_log_data_model_insertion_order_keeps_duplicates():
    # no dedup, no dedot → insertion order; resource attr and record
    # attr with the same key BOTH appear (encoder.go:133-140)
    row = dict(LOG, attributes=json.dumps({"k": "rec"}),
               resource_attributes=json.dumps({"k": "res"}))
    doc = encode_log_data_model(row)
    assert doc == (
        '{"Attributes.k":"res",'
        '"@timestamp":"2023-04-19T03:04:05.123456789Z",'
        '"TraceId":"0102030405060708090a0b0c0d0e0f10",'
        '"SpanId":"0102030405060708","TraceFlags":1,'
        '"SeverityText":"Info","SeverityNumber":9,"Body":"hello",'
        '"Attributes.k":"rec"}')


def test_log_data_model_dedup_and_dedot():
    row = dict(LOG, attributes=json.dumps({"k": "rec"}),
               resource_attributes=json.dumps({"k": "res"}))
    dedup = encode_log_data_model(row, dedup=True)
    assert dedup.count('"Attributes.k"') == 1
    assert '"Attributes.k":"rec"' in dedup
    dedot = encode_log_data_model(row, dedot=True)
    # sorted + nested objects, duplicates retained (Sort is stable)
    assert dedot.startswith('{"@timestamp"')
    assert '"Attributes":{"k":"res","k":"rec"}' in dedot


def test_log_data_model_flatten_unix_custom_field():
    row = dict(LOG, attributes=json.dumps({"k": "rec"}),
               resource_attributes=json.dumps({"r": "res"}))
    doc = encode_log_data_model(row, flatten_attributes=True,
                                timestamp_field="ts",
                                unix_time=True)
    assert doc.startswith('{"r":"res","ts":1681873445123,')
    assert doc.endswith('"Body":"hello","k":"rec"}')


def test_index_naming():
    assert get_index_name("default", "namespace", "", "logs") == \
        "ss4o_logs-default-namespace"
    assert get_index_name("d", "n", "", "traces") == "ss4o_traces-d-n"
    assert get_index_name("d", "n", "custom") == "custom"
    # empty parts keep the dashes (strings.Join)
    assert get_index_name("", "", "", "logs") == "ss4o_logs--"

    attrs = {"service.name": "svc", "empty": ""}
    assert resolve_log_index_name("logs-%{service.name}", attrs,
                                  "", "", 0) == "logs-svc"
    # empty value falls back; missing key falls back; else 'unknown'
    assert resolve_log_index_name("l-%{empty}", attrs, "fb", "", 0) \
        == "l-fb"
    assert resolve_log_index_name("l-%{nope}", attrs, "", "", 0) \
        == "l-unknown"
    # Java-style time format conversion, appended with '-'
    assert resolve_log_index_name(
        "logs", {}, "", "yyyy.MM.dd", 1681873445000000000) \
        == "logs-2023.04.19"
    assert resolve_log_index_name(
        "logs", {}, "", "yy-MM-dd HH:mm:ss", 1681873445000000000) \
        == "logs-23-04-19 03:04:05"


def test_stage_end_to_end(ray_session):
    import pyarrow as pa
    import ray

    from opentelemetry_collector_contrib_ray.stages.opensearchout import (
        logs_to_opensearch,
        spans_to_opensearch,
    )

    logs = ray.data.from_arrow(pa.table({
        k: pa.array([v if not isinstance(v, int) else v],
                    pa.string() if isinstance(v, str) else pa.int64())
        for k, v in LOG.items()}))
    out = logs_to_opensearch(
        logs, logs_index="l-%{service.name}",
        logs_index_time_format="yyyy.MM.dd").take_all()
    assert out[0]["os_index"] == "l-svc-2023.04.19"
    assert json.loads(out[0]["os_doc"])["body"] == "hello"

    spans = ray.data.from_arrow(pa.table({
        k: pa.array([v], pa.string() if isinstance(v, str)
                    else pa.int64())
        for k, v in SPAN.items()}))
    out = spans_to_opensearch(spans, dataset="d",
                              namespace="n").take_all()
    assert out[0]["os_index"] == "ss4o_traces-d-n"
    doc = json.loads(out[0]["os_doc"])
    assert doc["@timestamp"] == "0001-01-01T00:00:00Z"
    assert doc["kind"] == "Server"
