"""tinybirdexporter stage parity (stages/tinybird.py)."""

import json

from opentelemetry_collector_contrib_ray.stages.tinybird import (
    tb_log_row, tb_metric_row, tb_span_row)


def test_log_row():
    line = tb_log_row({
        "time_unix_nano": 0,
        "observed_time_unix_nano": 1719158400_000_000_000,
        "trace_id": "0102030405060708090a0b0c0d0e0f10",
        "span_id": "0" * 16, "flags": 1,
        "severity_text": "INFO", "severity_number": 9,
        "body": "log line",
        "resource_schema_url": "https://s/1.20.0",
        "resource_attributes": json.dumps(
            {"service.name": "svc", "n": 7}),
        "scope_schema_url": "https://s/1.20.0",
        "scope_name": "test-scope", "scope_version": "1.0.0",
        "scope_attributes": json.dumps({"sk": 1.5}),
        "attributes": json.dumps({"k": "v"}),
    })
    d = json.loads(line)
    assert list(d) == [
        "resource_schema_url", "resource_attributes", "service_name",
        "scope_schema_url", "scope_attributes", "scope_name",
        "scope_version", "timestamp", "trace_id", "span_id", "flags",
        "severity_text", "severity_number", "log_attributes", "body"]
    # 0 → observed fallback; RFC3339Nano
    assert d["timestamp"] == "2024-06-23T16:00:00Z"
    assert d["span_id"] == ""                # hex-or-empty
    assert d["resource_attributes"] == {"service.name": "svc",
                                        "n": "7"}  # AsString
    assert d["scope_attributes"] == {"sk": "1.5"}
    assert d["service_name"] == "svc"


def test_span_row_duration_omitempty():
    base = {
        "trace_id": "ab" * 16, "span_id": "cd" * 8,
        "parent_span_id": "", "trace_state": "", "span_name": "op",
        "span_kind": 1, "status_code": 0, "status_message": "",
        "start_time_unix_nano": 1719158400_000_000_000,
        "end_time_unix_nano": 1719158400_000_000_000,
        "attributes": "{}", "resource_attributes": "{}",
        "events": "[]", "links": "[]",
    }
    d = json.loads(tb_span_row(base))
    # zero duration is OMITTED (int64 omitempty); end_time stays
    assert "duration" not in d
    assert d["end_time"] == "2024-06-23T16:00:00Z"
    assert d["span_kind"] == "Internal"      # pdata short names
    assert d["status_code"] == "Unset"
    assert d["events_timestamp"] == [] and d["links_trace_id"] == []

    d = json.loads(tb_span_row(dict(
        base, end_time_unix_nano=1719158401_500_000_001,
        events=json.dumps([{"name": "ev", "timeUnixNano":
                            1719158400_000_000_001,
                            "attributes": {"a": 2}}]),
        links=json.dumps([{"traceId": "11" * 16, "spanId": "0" * 16,
                           "traceState": "s",
                           "attributes": {"b": True}}]))))
    assert d["duration"] == 1_500_000_001
    assert d["events_timestamp"] == ["2024-06-23T16:00:00.000000001Z"]
    assert d["events_attributes"] == [{"a": "2"}]
    assert d["links_span_id"] == [""]        # hex-or-empty
    assert d["links_attributes"] == [{"b": "true"}]


def test_metric_rows():
    base = {
        "name": "m", "description": "d", "unit": "1",
        "resource_attributes": json.dumps({"service.name": "s"}),
        "scope_name": "sn", "scope_version": "sv",
        "scope_attributes": "{}", "attributes": "{}",
        "start_time_unix_nano": 0, "time_unix_nano": 0, "flags": 2,
    }
    sig, line = tb_metric_row(dict(
        base, mtype="gauge", value_int=20,
        exemplars=json.dumps([{"asInt": 3, "spanId": "01" * 8}])))
    d = json.loads(line)
    assert sig == "gauge"
    assert list(d)[:3] == ["resource_schema_url",
                           "resource_attributes", "service_name"]
    assert d["value"] == 20.0
    assert d["exemplars_value"] == [3.0]
    # exemplar ids are traceutil hex-or-EMPTY here
    assert d["exemplars_trace_id"] == [""]
    assert d["exemplars_span_id"] == ["01" * 8]

    # histogram min/max gated on HasMin/HasMax (omitempty pointers)
    sig, line = tb_metric_row(dict(
        base, mtype="histogram", count=3, hsum=1.5,
        bucket_counts=[1, 2], explicit_bounds=[0.5],
        aggregation_temporality=1))
    d = json.loads(line)
    assert "min" not in d and "max" not in d
    sig, line = tb_metric_row(dict(
        base, mtype="histogram", count=3, hsum=1.5,
        bucket_counts=[1, 2], explicit_bounds=[0.5], hmin=0.0,
        hmax=2.0, aggregation_temporality=1))
    d = json.loads(line)
    assert d["min"] == 0.0 and d["max"] == 2.0  # 0.0 still renders
    # tail order: ... explicit_bounds, min, max, temporality
    keys = list(d)
    assert keys[-3:] == ["min", "max", "aggregation_temporality"]

    sig, line = tb_metric_row(dict(
        base, mtype="sum", value_double=1.5,
        aggregation_temporality=2, is_monotonic=True))
    d = json.loads(line)
    assert list(d)[-3:] == ["value", "aggregation_temporality",
                            "is_monotonic"]

    # summary and empty types silently skipped
    assert tb_metric_row(dict(base, mtype="summary")) is None
    assert tb_metric_row(dict(base, mtype="")) is None
