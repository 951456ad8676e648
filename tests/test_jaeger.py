"""Jaeger model-JSON → flat span translation parity
(pkg/translator/jaeger/jaegerproto_to_traces.go + its test vectors)."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.jaeger import (
    jaeger_span_to_flat,
    parse_jaeger_batches,
    process_to_resource,
)


def kv(key, vtype="STRING", **kw):
    return {"key": key, "vType": vtype, **kw}


def s(key, v):
    return kv(key, "STRING", vStr=v)


BASE = {"traceIdHigh": 0xF1F2F3F4F5F6F7F8, "traceIdLow": 0xF9FAFBFCFDFEFF80,
        "spanId": 0xAFAEADACABAAA9A8, "operationName": "operationA",
        "startTime": 1_700_000_000_000_000_000, "duration": 1_000_000}


def flat(sp, res=None):
    row = jaeger_span_to_flat(sp, res or {})
    assert not isinstance(row, str), row
    return row


def test_ids_big_endian_hex():
    row = flat(BASE)
    assert row["trace_id"] == "f1f2f3f4f5f6f7f8f9fafbfcfdfeff80"
    assert row["span_id"] == "afaeadacabaaa9a8"
    assert row["parent_span_id"] is None
    assert row["span_name"] == "operationA"
    assert row["start_time_unix_nano"] == BASE["startTime"]
    assert row["end_time_unix_nano"] == BASE["startTime"] + 1_000_000


def test_string_ids_accepted():
    row = flat({**BASE, "spanId": str(BASE["spanId"])})
    assert row["span_id"] == "afaeadacabaaa9a8"


def test_tag_typing():
    # TestJTagsToInternalAttributes vector
    row = flat({**BASE, "tags": [
        kv("bool-val", "BOOL", vBool=True),
        kv("int-val", "INT64", vInt64=123),
        s("string-val", "abc"),
        kv("double-val", "FLOAT64", vFloat64=1.23),
        kv("binary-val", "BINARY", vBinary="AAAAAABkfZg="),
    ]})
    assert json.loads(row["attributes"]) == {
        "bool-val": True, "int-val": 123, "string-val": "abc",
        "double-val": 1.23, "binary-val": "AAAAAABkfZg="}


def test_unknown_tag_type():
    row = flat({**BASE, "tags": [kv("x", "WAT")]})
    assert json.loads(row["attributes"])["x"] == \
        '<Unknown Jaeger TagType "WAT">'


def test_span_kind_tag():
    for name, code in [("client", 3), ("server", 2), ("producer", 4),
                       ("consumer", 5), ("internal", 1), ("weird", 0)]:
        row = flat({**BASE, "tags": [s("span.kind", name)]})
        assert row["span_kind"] == code
        assert "span.kind" not in json.loads(row["attributes"])


# --- TestSetInternalSpanStatus vector table -------------------------------

def status_of(tags, kind_tag=None):
    tl = list(tags)
    if kind_tag:
        tl.append(s("span.kind", kind_tag))
    row = flat({**BASE, "tags": tl})
    return (row["status_code"], row["status_message"],
            len(json.loads(row["attributes"])))


def test_status_no_tags():
    assert status_of([]) == (0, None, 0)


def test_status_error_tag():
    assert status_of([kv("error", "BOOL", vBool=True)]) == (2, "", 0)


def test_status_error_tag_non_bool_ignored():
    # only a BOOL error tag is honored
    assert status_of([s("error", "true")]) == (0, None, 1)


def test_status_code_string():
    assert status_of([s("otel.status_code", "OK")]) == (1, "", 0)


def test_status_code_message_and_error():
    assert status_of([
        kv("error", "BOOL", vBool=True),
        s("otel.status_code", "ERROR"),
        s("otel.status_description", "Error: Invalid argument"),
    ]) == (2, "Error: Invalid argument", 0)


def test_status_http_code_string():
    # http.status_code stays an attribute
    assert status_of([s("http.status_code", "404")]) == (2, "", 1)


def test_status_http_code_message_and_error():
    assert status_of([
        kv("error", "BOOL", vBool=True),
        kv("http.status_code", "INT64", vInt64=404),
        s("http.status_message", "HTTP 404: Not Found"),
    ]) == (2, "HTTP 404: Not Found", 2)


def test_status_code_precedence_over_http():
    assert status_of([
        s("otel.status_code", "OK"),
        kv("http.status_code", "INT64", vInt64=500),
        s("http.status_message", "Server Error"),
    ]) == (1, "", 2)


def test_status_http_200_ignored_when_error_true():
    assert status_of([
        kv("error", "BOOL", vBool=True),
        kv("http.status_code", "INT64", vInt64=200),
    ]) == (2, "", 1)


def test_status_4xx_server_unset():
    assert status_of([
        kv("error", "BOOL", vBool=False),
        kv("http.status_code", "INT64", vInt64=404),
    ], kind_tag="server") == (0, None, 2)


def test_status_4xx_client_error():
    assert status_of([kv("http.status_code", "INT64", vInt64=404)],
                     kind_tag="client") == (2, "", 1)


def test_status_http_not_parseable_is_ignored():
    assert status_of([s("http.status_code", "4 04")]) == (0, None, 1)


# --- references / parent / links ------------------------------------------

REF = {"traceIdHigh": BASE["traceIdHigh"],
       "traceIdLow": BASE["traceIdLow"]}


def test_child_parent_single_ref_no_link():
    # two-spans-child-parent vector
    row = flat({**BASE, "references": [
        {**REF, "spanId": 0x0102, "refType": "CHILD_OF"}]})
    assert row["parent_span_id"] == f"{0x0102:016x}"
    assert json.loads(row["links"]) == []


def test_follower_ref_is_parent_and_link():
    # two-spans-with-follower vector: FOLLOWS_FROM sets the parent AND
    # stays a link
    row = flat({**BASE, "references": [
        {**REF, "spanId": 0x0102, "refType": "FOLLOWS_FROM"}]})
    assert row["parent_span_id"] == f"{0x0102:016x}"
    links = json.loads(row["links"])
    assert len(links) == 1
    assert links[0]["spanId"] == f"{0x0102:016x}"
    assert links[0]["attributes"] == {
        "opentracing.ref_type": "follows_from"}


def test_two_parents_first_childof_wins():
    # a-spans-with-two-parent vector
    row = flat({**BASE, "references": [
        {**REF, "spanId": 0xA, "refType": "CHILD_OF"},
        {**REF, "spanId": 0xB, "refType": "CHILD_OF"}]})
    assert row["parent_span_id"] == f"{0xA:016x}"
    links = json.loads(row["links"])
    assert [link["spanId"] for link in links] == [f"{0xB:016x}"]
    assert links[0]["attributes"] == {"opentracing.ref_type": "child_of"}


def test_cross_trace_ref_not_parent_but_link():
    row = flat({**BASE, "references": [
        {"traceIdHigh": 1, "traceIdLow": 2, "spanId": 0xC,
         "refType": "CHILD_OF"}]})
    assert row["parent_span_id"] is None
    links = json.loads(row["links"])
    assert links[0]["traceId"] == f"{1:016x}{2:016x}"


# --- scope / tracestate / events ------------------------------------------

def test_scope_extraction():
    row = flat({**BASE, "tags": [s("otel.scope.name", "io.test"),
                                 s("otel.scope.version", "0.42.0"),
                                 s("k", "v")]})
    assert row["scope_name"] == "io.test"
    assert row["scope_version"] == "0.42.0"
    assert json.loads(row["attributes"]) == {"k": "v"}


def test_trace_state_tag():
    row = flat({**BASE, "tags": [s("w3c.tracestate", "a=b")]})
    assert row["trace_state"] == "a=b"
    assert json.loads(row["attributes"]) == {}
    assert flat(BASE)["trace_state"] is None


def test_logs_to_events_with_event_name():
    row = flat({**BASE, "logs": [
        {"timestamp": 7, "fields": [s("event", "event-with-attr"),
                                    s("span-event-attr", "v")]},
        {"timestamp": 8, "fields": [kv("attr-int", "INT64", vInt64=123)]},
    ]})
    ev = json.loads(row["events"])
    assert ev == [
        {"attributes": {"span-event-attr": "v"},
         "droppedAttributesCount": 0, "name": "event-with-attr",
         "timeUnixNano": 7},
        {"attributes": {"attr-int": 123}, "droppedAttributesCount": 0,
         "name": "", "timeUnixNano": 8}]


# --- process → resource ----------------------------------------------------

def test_process_service_and_tags():
    res = process_to_resource({"serviceName": "service-1",
                               "tags": [kv("int-attr-1", "INT64",
                                           vInt64=123)]})
    assert res == {"service.name": "service-1", "int-attr-1": 123}


def test_process_no_service_name_sentinel():
    assert process_to_resource(
        {"serviceName": "OTLPResourceNoServiceName",
         "tags": [s("a", "b")]}) == {}
    assert process_to_resource(None) == {}
    assert process_to_resource({"serviceName": ""}) == {}


def test_process_hostname_translation():
    res = process_to_resource({"serviceName": "x",
                               "tags": [s("hostname", "h1")]})
    assert res == {"service.name": "x", "host.name": "h1"}
    # host.name present -> hostname kept
    res = process_to_resource({"serviceName": "x",
                               "tags": [s("hostname", "h1"),
                                        s("host.name", "h2")]})
    assert res == {"service.name": "x", "hostname": "h1",
                   "host.name": "h2"}


def test_process_jaeger_version_translation():
    res = process_to_resource({"serviceName": "x",
                               "tags": [s("jaeger.version", "1.2")]})
    assert res == {"service.name": "x",
                   "opencensus.exporterversion": "Jaeger-1.2"}


def test_span_process_overrides_batch_process():
    # regroup semantics: the span-level process wins
    row = flat({**BASE, "process": {"serviceName": "span-svc"}},
               res={"service.name": "batch-svc"})
    assert json.loads(row["resource_attributes"]) == {
        "service.name": "span-svc"}
    row = flat(BASE, res={"service.name": "batch-svc"})
    assert json.loads(row["resource_attributes"]) == {
        "service.name": "batch-svc"}


# --- dataset-level ----------------------------------------------------------

def _ds_of(docs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "batch_json": pa.array(docs, pa.string())}))


def test_parse_jaeger_batches_dataset(ray_session):
    docs = [
        json.dumps({"process": {"serviceName": "svc"},
                    "spans": [BASE, None, {}]}),   # blanks skipped
        "not json",
        json.dumps({"spans": [{**BASE, "spanId": 2,
                               "tags": [s("span.kind", "server")]}]}),
    ]
    out = parse_jaeger_batches(_ds_of(docs), "batch_json").take_all()
    assert len(out) == 2
    assert out[0]["doc_id"] == 0
    assert json.loads(out[0]["resource_attributes"]) == {
        "service.name": "svc"}
    assert out[1]["doc_id"] == 2
    assert out[1]["span_kind"] == 2

    kept = parse_jaeger_batches(_ds_of(docs), "batch_json",
                                on_error="keep").take_all()
    errs = [r for r in kept if r["error"] is not None]
    assert len(errs) == 1 and errs[0]["doc_id"] == 1
