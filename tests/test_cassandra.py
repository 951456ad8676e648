"""cassandraexporter stage parity (stages/cassandra.py)."""

import json

from opentelemetry_collector_contrib_ray.stages.cassandra import (
    cass_log_row, cass_span_row)


def test_log_row_marshal_quirks():
    r = cass_log_row({
        "time_unix_nano": 5, "trace_id": "0" * 32,
        "span_id": "ab" * 8, "flags": 3,
        "severity_text": "INFO", "severity_number": 9,
        "body": "hello",
        "resource_attributes": json.dumps(
            {"s": "v", "n": 5, "f": 1.5, "b": True,
             "m": {"x": 1}}),
        "attributes": "{}",
    })
    assert r["timestamp"] == 5 and r["traceid"] == ""
    assert r["spanid"] == "ab" * 8 and r["traceflags"] == 3
    # body is json.Marshal(AsRaw): strings keep their quotes
    assert r["body"] == '"hello"'
    # map<text,text> values are JSON literals, not AsString
    m = json.loads(r["resourceattributes"])
    assert m == {"s": '"v"', "n": "5", "f": "1.5", "b": "true",
                 "m": '{"x":1}'}
    assert r["logattributes"] == "{}"
    # nil body marshals to the JSON null literal
    assert cass_log_row({})["body"] == "null"


def test_span_row():
    r = cass_span_row({
        "trace_id": "ab" * 16, "span_id": "cd" * 8,
        "parent_span_id": "", "trace_state": "w=1",
        "span_name": "op", "span_kind": 4, "status_code": 1,
        "status_message": "",
        "start_time_unix_nano": 10, "end_time_unix_nano": 25,
        "attributes": "{}", "resource_attributes": "{}",
    })
    assert r["timestamp"] == 10 and r["duration"] == 15  # ns
    assert r["spankind"] == "SPAN_KIND_PRODUCER"   # long names
    assert r["statuscode"] == "STATUS_CODE_OK"
    assert r["parentspanid"] == ""
    # the INSERT has no events/links columns (constants.go:16)
    assert "events" not in r and "links" not in r
