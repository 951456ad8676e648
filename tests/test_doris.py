"""dorisexporter stage parity (stages/doris.py)."""

import json

from opentelemetry_collector_contrib_ray.stages.doris import (
    doris_format_time, doris_log_row, doris_metric_row,
    doris_span_row)


def test_format_time():
    # TestCommonExporter_FormatTime: 1µs renders .000001
    assert doris_format_time(1704067200_000_001_000) \
        == "2024-01-01 00:00:00.000001"
    # zero fraction drops the dot
    assert doris_format_time(1704067200_000_000_000) \
        == "2024-01-01 00:00:00"
    # trailing zeros trimmed
    assert doris_format_time(1704067200_250_000_000) \
        == "2024-01-01 00:00:00.25"
    # sub-µs digits truncate (Go .999999 layout)
    assert doris_format_time(1704067200_000_000_999) \
        == "2024-01-01 00:00:00"
    assert doris_format_time(0) == "1970-01-01 00:00:00"
    # fixed timezone offset
    assert doris_format_time(1704067200_000_000_000, 3600) \
        == "2024-01-01 01:00:00"


def test_log_row_order_and_typed_attrs():
    line = doris_log_row({
        "time_unix_nano": 1704067200_000_001_000,
        "trace_id": "ab" * 16, "span_id": "0" * 16,
        "severity_number": 9, "severity_text": "INFO",
        "body": "hello",
        "resource_attributes": json.dumps(
            {"service.name": "svc", "service.instance.id": "i1",
             "n": 5}),
        "attributes": json.dumps({"f": 1.5, "b": True}),
        "scope_name": "SN", "scope_version": "1",
    })
    d = json.loads(line)
    # Go struct field order (dLog)
    assert list(d) == [
        "service_name", "timestamp", "service_instance_id",
        "trace_id", "span_id", "severity_number", "severity_text",
        "body", "resource_attributes", "log_attributes",
        "scope_name", "scope_version"]
    assert d["service_name"] == "svc"
    assert d["service_instance_id"] == "i1"
    assert d["span_id"] == ""  # hex-or-empty
    # AsRaw typed maps — NOT AsString
    assert d["resource_attributes"]["n"] == 5
    assert d["log_attributes"] == {"f": 1.5, "b": True}


def test_span_row():
    line = doris_span_row({
        "trace_id": "ab" * 16, "span_id": "cd" * 8,
        "parent_span_id": "ef" * 8,
        "trace_state": "w=1", "span_name": "op",
        "span_kind": 3, "status_code": 1,
        "start_time_unix_nano": 1704067200_000_000_000,
        "end_time_unix_nano": 1704067201_500_000_999,
        "attributes": "{}",
        "resource_attributes": json.dumps({"service.name": "s"}),
        "events": json.dumps([
            {"name": "ev", "timeUnixNano": 1704067200_000_000_001,
             "attributes": {"a": 1}}]),
        "links": json.dumps([
            {"traceId": "11" * 16, "spanId": "0" * 16,
             "traceState": "", "attributes": {}}]),
    })
    d = json.loads(line)
    assert d["span_kind"] == "SPAN_KIND_CLIENT"      # LONG names
    assert d["status_code"] == "STATUS_CODE_OK"
    # Duration.Microseconds() truncates the 999 ns
    assert d["duration"] == 1_500_000
    assert d["end_time"] == "2024-01-01 00:00:01.5"
    # event +1ns truncates to the same µs string as start
    assert d["events"][0]["timestamp"] == "2024-01-01 00:00:00"
    assert d["links"][0]["span_id"] == ""            # hex-or-empty


def test_metric_rows():
    base = {
        "name": "m", "description": "d", "unit": "1",
        "resource_attributes": json.dumps(
            {"service.name": "s", "service.instance.id": "i"}),
        "scope_name": "sn", "scope_version": "sv",
        "attributes": json.dumps({"k": "v"}),
        "start_time_unix_nano": 0, "time_unix_nano": 0,
    }
    # gauge with exemplar: pdata String() ids are hex-or-EMPTY
    row = dict(base, mtype="gauge", value_int=20,
               exemplars=json.dumps([
                   {"asDouble": 1.5, "spanId": "01" * 8}]))
    table, line = doris_metric_row(row)
    d = json.loads(line)
    assert table == "otel_metrics_gauge"
    # inline dMetric head promoted to the FRONT
    assert list(d)[:8] == [
        "service_name", "service_instance_id", "metric_name",
        "metric_description", "metric_unit", "resource_attributes",
        "scope_name", "scope_version"]
    assert d["value"] == 20.0
    ex = d["exemplars"][0]
    assert list(ex) == ["filtered_attributes", "timestamp", "value",
                        "span_id", "trace_id"]
    assert ex["trace_id"] == "" and ex["span_id"] == "01" * 8

    row = dict(base, mtype="sum", value_double=2.5,
               aggregation_temporality=2, is_monotonic=True)
    table, line = doris_metric_row(row)
    d = json.loads(line)
    assert table == "otel_metrics_sum"
    assert d["aggregation_temporality"] == "Cumulative"
    assert d["is_monotonic"] is True

    row = dict(base, mtype="histogram", count=3, hsum=1.5,
               bucket_counts=[1, 2], explicit_bounds=[0.5],
               aggregation_temporality=1)
    table, line = doris_metric_row(row)
    d = json.loads(line)
    assert d["min"] == 0.0 and d["max"] == 0.0   # Go zero values
    assert d["aggregation_temporality"] == "Delta"

    row = dict(base, mtype="exponential_histogram", count=2,
               hsum=4.0, scale=-1, zero_count=1, pos_offset=2,
               pos_bucket_counts=[1], neg_offset=0,
               neg_bucket_counts=[], zero_threshold=0.001,
               aggregation_temporality=2)
    table, line = doris_metric_row(row)
    d = json.loads(line)
    assert table == "otel_metrics_exponential_histogram"
    assert d["scale"] == -1 and d["zero_threshold"] == 0.001

    row = dict(base, mtype="summary", count=5, ssum=2.5,
               quantiles=[0.0, 1.0], quantile_values=[1.0, 9.0])
    table, line = doris_metric_row(row)
    d = json.loads(line)
    assert d["quantile_values"] == [
        {"quantile": 0.0, "value": 1.0},
        {"quantile": 1.0, "value": 9.0}]

    # types outside the five are never collected (no default branch)
    assert doris_metric_row(dict(base, mtype="weird")) is None
