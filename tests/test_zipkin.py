"""zipkinv2 → flat span translation parity
(pkg/translator/zipkin/zipkinv2/to_translator.go)."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.zipkin import (
    parse_zipkin_spans,
    zipkin_span_to_flat,
)


def flat(sp, **kw):
    row = zipkin_span_to_flat(sp, **kw)
    assert not isinstance(row, str), row
    return row


BASE = {"traceId": "a" * 32, "id": "b" * 16, "name": "op",
        "timestamp": 1_700_000_000_000_000, "duration": 100}


def test_id_padding():
    row = flat({**BASE, "traceId": "12ef", "id": "34"})
    assert row["trace_id"] == "12ef".rjust(32, "0")
    assert row["span_id"] == "34".rjust(16, "0")


def test_parent_equal_to_self_is_dropped():
    assert flat({**BASE, "parentId": "b" * 16})["parent_span_id"] is None
    assert flat({**BASE, "parentId": "c" * 16})["parent_span_id"] == \
        "c" * 16


def test_kind_map_and_internal_tag():
    assert flat({**BASE, "kind": "CLIENT"})["span_kind"] == 3
    assert flat({**BASE, "kind": "SERVER"})["span_kind"] == 2
    assert flat({**BASE, "kind": "PRODUCER"})["span_kind"] == 4
    assert flat({**BASE, "kind": "CONSUMER"})["span_kind"] == 5
    row = flat({**BASE, "tags": {"span.kind": "internal"}})
    assert row["span_kind"] == 1
    assert json.loads(row["attributes"]) == {}      # tag consumed
    assert flat(BASE)["span_kind"] == 0


def test_status_code_names_and_unknown():
    for name, code in [("STATUS_CODE_OK", 1), ("STATUS_CODE_ERROR", 2),
                       ("Ok", 1), ("Error", 2), ("Unset", 0),
                       ("garbage", 0)]:   # Go map zero value
        assert flat({**BASE, "tags": {"otel.status_code": name}})[
            "status_code"] == code


def test_error_tag_semantics():
    row = flat({**BASE, "tags": {"error": "true"}})
    assert row["status_code"] == 2
    assert json.loads(row["attributes"]) == {}
    # a non-"true" error value forces code 2 but STAYS an attribute
    row = flat({**BASE, "tags": {"error": "timeout"}})
    assert row["status_code"] == 2
    assert json.loads(row["attributes"]) == {"error": "timeout"}


def test_tracestate_tag():
    row = flat({**BASE, "tags": {"w3c.tracestate": "a=1"}})
    assert row["trace_state"] == "a=1"
    assert json.loads(row["attributes"]) == {}


def test_endpoints_to_attrs():
    row = flat({**BASE,
                "localEndpoint": {"serviceName": "svc",
                                  "ipv4": "1.2.3.4", "port": 80},
                "remoteEndpoint": {"serviceName": "peer",
                                   "ipv6": "::1", "port": 443}})
    attrs = json.loads(row["attributes"])
    assert attrs == {"net.host.ip": "1.2.3.4", "net.host.port": 80,
                     "peer.service": "peer", "net.peer.ip": "::1",
                     "net.peer.port": 443}
    assert json.loads(row["resource_attributes"]) == {
        "service.name": "svc"}


def test_service_name_source_override():
    row = flat({**BASE,
                "localEndpoint": {"serviceName": "svc"},
                "tags": {"otlp.service.name.source": "faas.name"}})
    assert json.loads(row["resource_attributes"]) == {"faas.name": "svc"}


def test_resource_convention_tags_move():
    row = flat({**BASE,
                "localEndpoint": {"serviceName": "svc"},
                "tags": {"host.name": "h1", "k8s.pod.name": "p",
                         "custom": "x"}})
    assert json.loads(row["resource_attributes"]) == {
        "service.name": "svc", "host.name": "h1", "k8s.pod.name": "p"}
    assert json.loads(row["attributes"]) == {"custom": "x"}


def test_scope_extraction():
    row = flat({**BASE, "tags": {"otel.library.name": "lib",
                                 "otel.library.version": "9"}})
    assert row["scope_name"] == "lib" and row["scope_version"] == "9"
    assert json.loads(row["attributes"]) == {}


def test_absent_timestamp_rule():
    row = flat({"traceId": "a" * 32, "id": "b" * 16, "duration": 77})
    assert row["start_time_unix_nano"] == 0
    assert row["end_time_unix_nano"] == 77_000
    assert json.loads(row["attributes"]) == {
        "otel.zipkin.absentField.startTime": True}


def test_timestamps_microseconds_to_ns():
    row = flat(BASE)
    assert row["start_time_unix_nano"] == 1_700_000_000_000_000_000
    assert row["end_time_unix_nano"] == 1_700_000_000_000_100_000


def test_events_from_annotations():
    row = flat({**BASE, "annotations": [
        {"timestamp": 5, "value": "plain"},
        {"timestamp": 6, "value": 'ev|{"a":1,"b":1.5,"c":"x|y"}|2'}]})
    evs = json.loads(row["events"])
    assert evs[0] == {"name": "plain", "timeUnixNano": 5000,
                      "attributes": {}, "droppedAttributesCount": 0}
    # inner '|' rejoined; whole floats become ints (Go float64 path)
    assert evs[1]["name"] == "ev"
    assert evs[1]["attributes"] == {"a": 1, "b": 1.5, "c": "x|y"}
    assert evs[1]["droppedAttributesCount"] == 2


def test_links_from_tags():
    t, s = "c" * 32, "d" * 16
    row = flat({**BASE, "tags": {
        "otlp.link.0": f'{t}|{s}|st=1|{{"k":"v"}}|3',
        "otlp.link.2": "ignored (gap stops the scan)"}})
    links = json.loads(row["links"])
    assert links == [{"traceId": t, "spanId": s, "traceState": "st=1",
                      "attributes": {"k": "v"},
                      "droppedAttributesCount": 3}]
    assert "otlp.link.2" in json.loads(row["attributes"])


def test_link_short_value_skipped():
    row = flat({**BASE, "tags": {"otlp.link.0": "a|b|c"}})
    assert json.loads(row["links"]) == []


def test_link_exact_id_lengths():
    bad = zipkin_span_to_flat({**BASE, "tags": {
        "otlp.link.0": 'abc|%s|st|{}|0' % ("d" * 16)}})
    assert bad == "invalid link id"


def test_parse_string_tags_typing():
    row = flat({**BASE, "tags": {"i": "-3", "d": "2.5", "b": "true",
                                 "s": "x", "m": '{"a":1}'}},
               parse_string_tags=True)
    assert json.loads(row["attributes"]) == {
        "i": -3, "d": 2.5, "b": True, "s": "x", "m": '{"a":1}'}


def test_errors():
    assert isinstance(zipkin_span_to_flat({"traceId": "zz",
                                           "id": "b" * 16}), str)
    assert isinstance(zipkin_span_to_flat({"traceId": "a" * 33,
                                           "id": "b" * 16}), str)
    assert isinstance(zipkin_span_to_flat({"traceId": "a" * 32}), str)
    assert isinstance(zipkin_span_to_flat(
        {**BASE, "tags": {"k": 5}}), str)


def test_stage_fanout_and_doc_error(ray_session):
    import ray

    good = json.dumps([BASE, {**BASE, "id": "c" * 16}])
    bad = json.dumps([{"traceId": "zz", "id": "b" * 16}])
    ds = ray.data.from_arrow(pa.table({
        "spans_json": pa.array([good, bad], pa.string()),
        "idx": pa.array([0, 1], pa.int64())}))
    out = parse_zipkin_spans(ds, "spans_json").to_pandas()
    assert list(out["idx"]) == [0, 0]
    kept = parse_zipkin_spans(ds, "spans_json",
                              on_error="keep").to_pandas()
    assert len(kept) == 3 and kept["error"].notna().sum() == 1
