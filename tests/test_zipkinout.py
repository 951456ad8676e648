"""zipkin export-direction parity (from_translator.go + zipkin-go
marshal rules), round-tripped through the round-5 zipkin PARSER.

Vectors from pkg/translator/zipkin/zipkinv2/from_translator_test.go
(zipkinOneSpan fixtures) and the reference's test tables.
"""

import json

from opentelemetry_collector_contrib_ray.stages.zipkin import (
    zipkin_span_to_flat)
from opentelemetry_collector_contrib_ray.stages.zipkinout import (
    flat_span_to_zipkin)

TRACE = "0102030405060708090a0b0c0d0e0f10"
SPAN = "0102030405060708"
START_NS = 1581452772000000123   # testdata.TestSpanStartTime-ish
EVENT_NS = 1581452773000000123


def base_row(**kw):
    row = {
        "trace_id": TRACE, "span_id": SPAN, "parent_span_id": None,
        "trace_state": None, "span_name": "operationa", "span_kind": 0,
        "start_time_unix_nano": START_NS,
        "end_time_unix_nano": START_NS + 1000000468,
        "status_code": 0, "status_message": None,
        "attributes": "{}",
        "resource_attributes": json.dumps(
            {"resource-attr": "resource-attr-val-1"}),
        "scope_name": None, "scope_version": None,
        "events": "[]", "links": "[]",
    }
    row.update(kw)
    return row


def enc(row):
    doc, err = flat_span_to_zipkin(row)
    assert err is None, err
    return json.loads(doc)


def test_one_span_ok_vector():
    events = [
        {"name": "event-with-attr", "timeUnixNano": EVENT_NS,
         "attributes": {"span-event-attr": "span-event-attr-val"},
         "droppedAttributesCount": 2},
        {"name": "event", "timeUnixNano": EVENT_NS,
         "attributes": {}, "droppedAttributesCount": 2},
    ]
    z = enc(base_row(status_code=1, events=json.dumps(events)))
    assert z["traceId"] == TRACE
    assert z["id"] == SPAN
    assert "parentId" not in z
    assert z["name"] == "operationa"
    assert "kind" not in z
    assert z["localEndpoint"] == {
        "serviceName": "OTLPResourceNoServiceName"}
    assert "remoteEndpoint" not in z
    assert z["tags"] == {"resource-attr": "resource-attr-val-1",
                         "otel.status_code": "STATUS_CODE_OK"}
    assert [a["value"] for a in z["annotations"]] == [
        'event-with-attr|{"span-event-attr":"span-event-attr-val"}|2',
        "event|{}|2"]
    assert z["annotations"][0]["timestamp"] == (EVENT_NS + 500) // 1000
    # zipkin-go duration: +500ns then truncate to µs
    assert z["duration"] == (1000000468 + 500) // 1000
    assert z["timestamp"] == (START_NS + 500) // 1000


def test_status_error_and_unset():
    z = enc(base_row(status_code=2, status_message="error message"))
    assert z["tags"]["error"] == "true"
    assert z["tags"]["otel.status_code"] == "STATUS_CODE_ERROR"
    assert z["tags"]["otel.status_description"] == "error message"
    # unset: no status tags, and a user-set error tag is DELETED
    z = enc(base_row(status_code=0,
                     attributes=json.dumps({"error": "perhaps"})))
    assert "error" not in z["tags"]
    assert "otel.status_code" not in z["tags"]


def test_invalid_ids_error():
    assert flat_span_to_zipkin(base_row(trace_id="0" * 32))[1] == \
        "TraceID is invalid"
    assert flat_span_to_zipkin(base_row(span_id=""))[1] == \
        "SpanID is invalid"


def test_trace_id_high_zero_renders_16_hex():
    z = enc(base_row(trace_id="0" * 16 + "090a0b0c0d0e0f10"))
    assert z["traceId"] == "090a0b0c0d0e0f10"


def test_service_name_precedence_and_source_tag():
    res = {"k8s.deployment.name": "dep1", "extra": "x"}
    z = enc(base_row(resource_attributes=json.dumps(res)))
    assert z["localEndpoint"]["serviceName"] == "dep1"
    assert z["tags"]["otlp.service.name.source"] == "k8s.deployment.name"
    assert "k8s.deployment.name" not in z["tags"]
    # service.name wins without a source tag
    res = {"service.name": "svc", "faas.name": "fn"}
    z = enc(base_row(resource_attributes=json.dumps(res)))
    assert z["localEndpoint"]["serviceName"] == "svc"
    assert "otlp.service.name.source" not in z["tags"]
    assert z["tags"]["faas.name"] == "fn"


def test_endpoints_and_redundant_tag_removal():
    attrs = {"net.host.ip": "1.2.3.4", "net.host.port": "8080",
             "peer.service": "remote-svc", "net.peer.ip": "::1",
             "net.peer.port": "70000", "keep": "me"}
    z = enc(base_row(attributes=json.dumps(attrs)))
    assert z["localEndpoint"] == {
        "serviceName": "OTLPResourceNoServiceName",
        "ipv4": "1.2.3.4", "port": 8080}
    # overflow port: ParseUint error ignored -> MaxUint16
    assert z["remoteEndpoint"] == {"serviceName": "remote-svc",
                                   "ipv6": "::1", "port": 65535}
    assert set(z["tags"]) == {"keep", "resource-attr"}


def test_internal_kind_tag_and_kind_map():
    z = enc(base_row(span_kind=1))
    assert "kind" not in z
    assert z["tags"]["span.kind"] == "internal"
    for k, name in ((2, "SERVER"), (3, "CLIENT"), (4, "PRODUCER"),
                    (5, "CONSUMER")):
        assert enc(base_row(span_kind=k))["kind"] == name


def test_tracestate_scope_and_links():
    links = [{"traceId": TRACE, "spanId": SPAN, "traceState": "a=b",
              "attributes": {"k": "v"}, "droppedAttributesCount": 1},
             {"traceId": "0" * 32, "spanId": "0" * 16, "traceState": "",
              "attributes": {}, "droppedAttributesCount": 0}]
    z = enc(base_row(trace_state="w=1", scope_name="lib",
                     scope_version="v9", links=json.dumps(links)))
    assert z["tags"]["w3c.tracestate"] == "w=1"
    assert z["tags"]["otel.library.name"] == "lib"
    assert z["tags"]["otel.library.version"] == "v9"
    assert z["tags"]["otlp.link.0"] == \
        f'{TRACE}|{SPAN}|a=b|{{"k":"v"}}|1'
    assert z["tags"]["otlp.link.1"] == "|||{}|0"


def test_timestamp_zero_second_omitted():
    z = enc(base_row(start_time_unix_nano=999_999_999,
                     end_time_unix_nano=1_000_000_999))
    assert "timestamp" not in z
    assert z["duration"] == (1000 + 500) // 1000
    # sub-µs duration clamps to 1
    z = enc(base_row(end_time_unix_nano=START_NS + 300))
    assert z["duration"] == 1
    # negative duration is a marshal error
    assert flat_span_to_zipkin(
        base_row(end_time_unix_nano=START_NS - 5))[1] == \
        "ValidDurationRequired"


def test_round_trip_through_parser():
    """encode → zipkin_span_to_flat recovers the flat row (µs-aligned
    times, lowercase names)."""
    start = 1581452772000000000
    events = [{"name": "ev", "timeUnixNano": start + 5_000,
               "attributes": {"a": "b"}, "droppedAttributesCount": 0}]
    links = [{"traceId": TRACE, "spanId": SPAN, "traceState": "t=1",
              "attributes": {"x": "y"}, "droppedAttributesCount": 3}]
    row = base_row(
        span_name="operationa", span_kind=3, status_code=2,
        status_message="boom", trace_state="w=2",
        start_time_unix_nano=start,
        end_time_unix_nano=start + 2_000_000,
        attributes=json.dumps({"http.method": "GET",
                               "net.peer.ip": "9.8.7.6"}),
        resource_attributes=json.dumps({"service.name": "svc-a",
                                        "host.name": "h1"}),
        scope_name="lib", scope_version="1.2",
        events=json.dumps(events), links=json.dumps(links))
    doc, err = flat_span_to_zipkin(row)
    assert err is None
    back = zipkin_span_to_flat(json.loads(doc))
    assert isinstance(back, dict), back
    assert back["trace_id"] == TRACE and back["span_id"] == SPAN
    assert back["span_name"] == "operationa"
    assert back["span_kind"] == 3
    assert back["start_time_unix_nano"] == start
    assert back["end_time_unix_nano"] == start + 2_000_000
    assert back["status_code"] == 2
    assert back["status_message"] == "boom"
    assert back["trace_state"] == "w=2"
    assert back["scope_name"] == "lib"
    assert back["scope_version"] == "1.2"
    assert json.loads(back["resource_attributes"]) == {
        "service.name": "svc-a", "host.name": "h1"}
    assert json.loads(back["attributes"]) == {
        "http.method": "GET", "net.peer.ip": "9.8.7.6"}
    assert json.loads(back["events"]) == events
    assert json.loads(back["links"]) == links
