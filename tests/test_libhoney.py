"""libhoneyreceiver decode parity
(receiver/libhoneyreceiver/internal/{parser,libhoneyevent,eventtime})."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.libhoney import (
    get_event_time_ns,
    libhoney_batch_to_rows,
    parse_libhoney,
    span_id_from,
    trace_id_from,
)


def test_event_time_forms():
    assert get_event_time_ns("2023-04-19T03:04:05.000000006Z") == \
        1681873445000000006
    assert get_event_time_ns("1700000000") == 1700000000 * 10 ** 9
    # 13-digit epochs split "sec.frac" through float64 — Go's
    # int64(dec*1e9) truncation is mirrored bit-for-bit
    assert get_event_time_ns("1700000000123") == 1700000000122999906
    assert get_event_time_ns("1700000000.5") == 1700000000500000000
    assert get_event_time_ns("junk") == 0
    assert get_event_time_ns(None) == 0


def test_fnv_id_derivation():
    # spanIDFrom: one fnv64a sum LE; traceIDFrom: two CHAINED sums
    assert span_id_from("x") == span_id_from("x")
    assert len(span_id_from("x")) == 16
    tid = trace_id_from("x")
    assert len(tid) == 32
    assert tid[:16] == span_id_from("x")     # first half = single sum
    assert tid[:16] != tid[16:]


def _batch(events, dataset="ds1"):
    return libhoney_batch_to_rows(events, dataset)


def test_span_decode_full_surface():
    events = [{"time": "1700000001", "data": {
        "meta.signal_type": "trace", "name": "op1",
        "trace.trace_id": "0102030405060708090a0b0c0d0e0f10",
        "trace.span_id": "1112131415161718",
        "trace.parent_id": "2122232425262728",
        "duration_ms": 2.5, "span.kind": "client", "error": True,
        "status_message": "bad", "service.name": "svcA",
        "library.name": "libX", "attr1": "v"}}]
    spans, logs = _batch(events)
    assert logs == []
    sp = spans[0]
    assert sp["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert sp["span_id"] == "1112131415161718"
    assert sp["parent_span_id"] == "2122232425262728"
    assert sp["span_kind"] == 3
    assert sp["status_code"] == 2 and sp["status_message"] == "bad"
    assert sp["end_time_unix_nano"] - sp["start_time_unix_nano"] == \
        2_500_000
    # meta.signal_type and status_message are NOT in Go's
    # alreadyUsedFields → they stay as span attributes
    assert json.loads(sp["attributes"]) == {
        "SampleRate": 1, "attr1": "v", "meta.signal_type": "trace",
        "status_message": "bad"}
    assert sp["scope_name"] == "libX"
    assert sp["scope_version"] == "unset"
    assert json.loads(sp["resource_attributes"]) == {
        "service.name": "svcA"}


def test_id_slice_quirks():
    # 64-hex span id takes bytes 8:24, then the Go [8]byte conversion
    # keeps the first 8 → bytes 8:16 of the original
    sid64 = bytes(range(32)).hex()
    events = [{"data": {"meta.signal_type": "trace", "name": "o",
                        "trace.trace_id": "ab" * 16,
                        "trace.span_id": sid64}}]
    spans, _ = _batch(events)
    assert spans[0]["span_id"] == bytes(range(8, 16)).hex()
    # invalid hex falls back to the fnv64a derivation
    events = [{"data": {"meta.signal_type": "trace", "name": "o",
                        "trace.trace_id": "not-hex!",
                        "trace.span_id": "zz"}}]
    spans, _ = _batch(events)
    assert spans[0]["trace_id"] == trace_id_from("nothex!")
    assert spans[0]["span_id"] == span_id_from("zz")


def test_log_order_dependent_already_used():
    events = [
        {"time": "1700000000", "samplerate": 2, "data": {
            "meta.signal_type": "log", "body": "hello",
            "severity_code": 9, "severity_text": "INFO", "flags": 1,
            "trace.trace_id": "tt", "k": 1.5}},
        {"data": {"meta.signal_type": "trace", "name": "s",
                  "trace.trace_id": "ab" * 16,
                  "trace.span_id": "cd" * 8}},
        {"data": {"meta.signal_type": "log", "body": "later",
                  "trace.trace_id": "tt2"}},
    ]
    spans, logs = _batch(events)
    assert len(spans) == 1 and len(logs) == 2
    a0 = json.loads(logs[0]["attributes"])
    assert a0["trace.trace_id"] == "tt"      # before any span: kept
    assert a0["SampleRate"] == 2 and a0["k"] == 1.5
    assert "body" not in a0 and "severity_text" not in a0
    assert logs[0]["severity_number"] == 9 and logs[0]["flags"] == 1
    a1 = json.loads(logs[1]["attributes"])
    assert "trace.trace_id" not in a1        # after a span: consumed
    assert logs[1]["scope_name"] == "libhoney.receiver"
    assert logs[1]["scope_version"] == "1.0.0"
    assert json.loads(logs[1]["resource_attributes"]) == {
        "service.name": "ds1"}               # dataset fallback


def test_scope_first_sighting_pins_version():
    events = [
        {"data": {"meta.signal_type": "log", "body": "a",
                  "service.name": "s", "library.name": "L",
                  "library.version": "1"}},
        {"data": {"meta.signal_type": "log", "body": "b",
                  "service.name": "s", "library.name": "L",
                  "library.version": "9"}},
    ]
    _, logs = _batch(events)
    assert [r["scope_version"] for r in logs] == ["1", "1"]


def test_span_events_and_links_reattach():
    events = [
        {"data": {"meta.signal_type": "trace", "name": "s",
                  "trace.trace_id": "ab" * 16,
                  "trace.span_id": "cd" * 8}},
        {"time": "1700000002", "data": {
            "meta.signal_type": "trace",
            "meta.annotation_type": "span_event", "name": "ev1",
            "trace.parent_id": "cd" * 8, "ek": "v"}},
        {"data": {"meta.signal_type": "trace",
                  "meta.annotation_type": "link",
                  "trace.parent_id": "cd" * 8,
                  "trace.link.trace_id": "aa" * 16,
                  "trace.link.span_id": "bb" * 8, "lk": 7}},
        # link without required ids is skipped
        {"data": {"meta.signal_type": "trace",
                  "meta.annotation_type": "link",
                  "trace.parent_id": "cd" * 8, "lk": 8}},
    ]
    spans, _ = _batch(events)
    sp = spans[0]
    evs = json.loads(sp["events"])
    assert len(evs) == 1
    assert evs[0]["name"] == "ev1"
    assert evs[0]["attributes"] == {"ek": "v"}
    assert evs[0]["timeUnixNano"] == 1700000002 * 10 ** 9
    links = json.loads(sp["links"])
    assert len(links) == 1
    assert links[0]["traceId"] == "aa" * 16
    assert links[0]["spanId"] == "bb" * 8
    assert links[0]["attributes"] == {"lk": 7}


def test_parse_libhoney_dataset(ray_session):
    import ray

    doc = json.dumps([
        {"data": {"meta.signal_type": "trace", "name": "op",
                  "trace.trace_id": "ab" * 16,
                  "trace.span_id": "cd" * 8, "duration_ms": 1.0}},
        {"data": {"meta.signal_type": "log", "body": "b"}}])
    ds = ray.data.from_arrow(pa.table({
        "dataset": pa.array(["myds"], pa.string()),
        "events_json": pa.array([doc], pa.string())}))
    spans = parse_libhoney(ds, "events_json",
                           signal="traces").to_pandas()
    logs = parse_libhoney(ds, "events_json", signal="logs").to_pandas()
    assert len(spans) == 1 and spans["span_name"].iloc[0] == "op"
    assert len(logs) == 1 and logs["body"].iloc[0] == "b"
    assert json.loads(logs["resource_attributes"].iloc[0]) == {
        "service.name": "myds"}
