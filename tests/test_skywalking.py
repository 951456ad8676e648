"""skywalking translator parity — id math pinned to the reference's
own vectors (skywalkingproto_to_traces_test.go:156-298) and span
semantics to skywalkingproto_to_traces.go."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.skywalking import (
    _ParseSkywalking,
    segment_id_to_span_id,
    segment_to_rows,
    sw_trace_id,
)

SEG32 = "4f2f27748b8e44ecaf18fe0347194e86"
SEGJ = SEG32 + ".33.16560607369950066"


def test_trace_id_reference_vectors():
    assert sw_trace_id("de5980b8-fce3-4a37-aab9-b4ac3af7eedd") == bytes(
        [222, 89, 128, 184, 252, 227, 74, 55,
         170, 185, 180, 172, 58, 247, 238, 221])
    assert sw_trace_id("de5980b8fce34a37aab9b4ac3af7eedd") == bytes(
        [222, 89, 128, 184, 252, 227, 74, 55,
         170, 185, 180, 172, 58, 247, 238, 221])
    assert sw_trace_id("de59") == bytes(16)
    assert sw_trace_id(
        "de5980b8fce34a37aab9b4ac3af7eedd.1.16563474296430001") == bytes(
        [222, 89, 128, 184, 253, 227, 74, 55,
         27, 228, 27, 205, 94, 47, 212, 221])
    assert sw_trace_id(".,<>?/-=+MNop") == bytes(16)


def test_span_id_reference_vectors():
    assert segment_id_to_span_id(SEGJ, 123) == bytes(
        [233, 196, 85, 168, 37, 66, 48, 106])
    assert segment_id_to_span_id(SEG32, 123) == bytes(
        [155, 55, 217, 119, 204, 151, 10, 106])
    assert segment_id_to_span_id("16560607369950066", 12) == bytes(8)
    assert segment_id_to_span_id("1", 2) == bytes(8)
    assert segment_id_to_span_id(".,<>?/-=+MNop", 2) == bytes(8)
    # uniqueness across span ids in one segment
    assert segment_id_to_span_id(SEGJ, 123) != segment_id_to_span_id(SEGJ, 1)


def mk_seg(**kw):
    seg = {"traceId": "de5980b8-fce3-4a37-aab9-b4ac3af7eedd",
           "traceSegmentId": SEGJ, "service": "svc",
           "serviceInstance": "inst", "spans": []}
    seg.update(kw)
    return seg


def test_segment_basic_span():
    seg = mk_seg(spans=[{
        "spanId": 1, "parentSpanId": 0, "startTime": 1000,
        "endTime": 2000, "operationName": "op",
        "spanType": "Entry", "spanLayer": "Http",
        "tags": [{"key": "url", "value": "http://e"},
                 {"key": "custom", "value": "x"}],
    }])
    rows = segment_to_rows(seg)
    assert len(rows) == 1
    r = rows[0]
    assert r["trace_id"] == "de5980b8fce34a37aab9b4ac3af7eedd"
    assert r["span_id"] == segment_id_to_span_id(SEGJ, 1).hex()
    assert r["parent_span_id"] == segment_id_to_span_id(SEGJ, 0).hex()
    assert r["span_kind"] == 2  # Entry → Server
    assert r["start_time_unix_nano"] == 1000 * 10**6  # ms → ns
    assert r["end_time_unix_nano"] == 2000 * 10**6
    assert r["status_code"] == 1 and r["status_message"] == "SUCCESS"
    attrs = json.loads(r["attributes"])
    assert attrs["url"] == "http://e" and attrs["custom"] == "x"
    assert attrs["sw8.segment_id"] == SEGJ
    assert attrs["sw8.span_id"] == 1
    assert attrs["sw8.parent_span_id"] == 0
    res = json.loads(r["resource_attributes"])
    assert res["service.name"] == "svc"
    assert res["service.instance.id"] == "inst"
    assert res["sw8.trace_id"] == "de5980b8-fce3-4a37-aab9-b4ac3af7eedd"
    # last (only) span's mapped tag lands on the resource
    assert res["http.url"] == "http://e" and "custom" not in res


def test_resource_last_span_wins():
    seg = mk_seg(spans=[
        {"spanId": 0, "parentSpanId": -1,
         "tags": [{"key": "db.type", "value": "mysql"}]},
        {"spanId": 1, "parentSpanId": 0,
         "tags": [{"key": "status_code", "value": "200"}]},
    ])
    res = json.loads(segment_to_rows(seg)[0]["resource_attributes"])
    assert res.get("http.status_code") == "200"
    assert "db.system" not in res  # cleared by the second span


def test_parent_from_single_ref_and_links():
    ref = {"traceId": "de5980b8fce34a37aab9b4ac3af7eedd",
           "parentTraceSegmentId": SEG32, "parentSpanId": 2,
           "refType": "CrossThread", "parentService": "ps",
           "parentServiceInstance": "pi", "parentEndpoint": "pe",
           "networkAddressUsedAtPeer": "1.2.3.4:80"}
    seg = mk_seg(spans=[{"spanId": 0, "parentSpanId": -1,
                         "refs": [ref]}])
    r = segment_to_rows(seg)[0]
    assert r["parent_span_id"] == segment_id_to_span_id(SEG32, 2).hex()
    links = json.loads(r["links"])
    assert len(links) == 1
    lk = links[0]
    assert lk["traceId"] == "de5980b8fce34a37aab9b4ac3af7eedd"
    assert lk["spanId"] == segment_id_to_span_id(SEG32, 2).hex()
    a = lk["attributes"]
    assert a["refType"] == "CrossThread"
    assert a["parent.service"] == "ps"
    assert a["sw8.parent_span_id"] == "2"  # string, unlike span attrs
    assert a["sw8.parent_segment_id"] == SEG32
    # root with -1 parent and no sw8.parent_span_id attr
    attrs = json.loads(r["attributes"])
    assert "sw8.parent_span_id" not in attrs


def test_root_no_refs_has_empty_parent():
    seg = mk_seg(spans=[{"spanId": 0, "parentSpanId": -1}])
    assert segment_to_rows(seg)[0]["parent_span_id"] is None


def test_kind_table():
    cases = [
        ({"spanLayer": "MQ", "spanType": "Entry"}, 5),   # Consumer
        ({"spanLayer": "MQ", "spanType": "Exit"}, 4),    # Producer
        ({"spanLayer": "MQ", "spanType": "Local"}, 0),   # falls through
        ({"spanType": "Exit"}, 3),                        # Client
        ({"spanType": "Entry"}, 2),                       # Server
        ({"spanType": "Local"}, 1),                       # Internal
        ({"spanType": 2}, 1),                             # int form
    ]
    for extra, want in cases:
        seg = mk_seg(spans=[dict({"spanId": 0, "parentSpanId": -1},
                                 **extra)])
        assert segment_to_rows(seg)[0]["span_kind"] == want, extra


def test_error_status_and_events():
    seg = mk_seg(spans=[{
        "spanId": 0, "parentSpanId": -1, "isError": True,
        "logs": [{"time": 5, "data": [{"key": "log-key1",
                                       "value": "log-value1"}]},
                 {"time": 6}],
    }])
    r = segment_to_rows(seg)[0]
    assert r["status_code"] == 2 and r["status_message"] == "ERROR"
    evs = json.loads(r["events"])
    assert [e["name"] for e in evs] == ["logs", "logs"]
    assert evs[0]["timeUnixNano"] == 5 * 10**6
    assert evs[0]["attributes"] == {"log-key1": "log-value1"}
    assert "attributes" not in evs[1]  # empty data → no attrs


def test_stage_fanout_and_errors():
    good = json.dumps(mk_seg(spans=[
        {"spanId": 0, "parentSpanId": -1},
        {"spanId": 1, "parentSpanId": 0}]))
    empty = json.dumps(mk_seg())  # no spans → no rows
    batch = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "segment_json": pa.array(
                          [good, "not json", empty])})
    out = _ParseSkywalking("segment_json", "send")(batch)
    assert out.num_rows == 3
    errs = out.column("error").to_pylist()
    assert errs == [None, None, "invalid skywalking JSON segment"]
    assert out.column("doc_id").to_pylist() == [1, 1, 2]
    dropped = _ParseSkywalking("segment_json", "drop")(batch)
    assert dropped.num_rows == 2
    assert "error" not in dropped.column_names
