"""clickhouseexporter stage parity (stages/clickhouse.py) vs
exporter/clickhouseexporter semantics."""

import json

import pytest

from opentelemetry_collector_contrib_ray.stages.clickhouse import (
    ch_log_row, ch_metric_row, ch_span_row)


def test_log_row_full():
    row = {
        "time_unix_nano": 0,
        "observed_time_unix_nano": 1_700_000_000_123_456_789,
        "trace_id": "0" * 32, "span_id": "0102030405060708",
        "flags": 0x101,  # uint8 truncation
        "severity_text": "INFO", "severity_number": 9,
        "body": "hello",
        "resource_schema_url": "r-url",
        "resource_attributes": json.dumps(
            {"service.name": "svc", "n": 5, "f": 1.5, "b": True}),
        "scope_schema_url": "s-url",
        "scope_name": "SN", "scope_version": "1.0",
        "scope_attributes": json.dumps({"sk": "sv"}),
        "attributes": json.dumps({"k": "v"}),
    }
    r = ch_log_row(row)
    # 0 timestamp falls back to observed (exporter_logs.go:108-111)
    assert r["Timestamp"] == 1_700_000_000_123_456_789
    assert r["TraceId"] == ""          # hex-or-empty
    assert r["SpanId"] == "0102030405060708"
    assert r["TraceFlags"] == 1        # uint8(0x101)
    assert r["SeverityText"] == "INFO" and r["SeverityNumber"] == 9
    assert r["ServiceName"] == "svc"
    assert r["Body"] == "hello"
    assert r["ResourceSchemaUrl"] == "r-url"
    # AsString values: int decimal, float 'g'-shortest, bool words
    assert json.loads(r["ResourceAttributes"]) == {
        "service.name": "svc", "n": "5", "f": "1.5", "b": "true"}
    assert r["ScopeAttributes"] == '{"sk":"sv"}'
    assert r["LogAttributes"] == '{"k":"v"}'


def test_log_row_defaults():
    r = ch_log_row({})
    assert r["Timestamp"] == 0 and r["Body"] == ""
    assert r["ServiceName"] == ""      # Test_GetServiceName unset
    assert r["ResourceAttributes"] == "{}"


def test_service_name_asstring_bool():
    # Test_GetServiceName: non-string service.name goes AsString
    r = ch_log_row({"resource_attributes":
                    json.dumps({"service.name": True})})
    assert r["ServiceName"] == "true"


def test_span_row_enums_and_arrays():
    row = {
        "start_time_unix_nano": 1_700_000_000_000_000_000,
        "end_time_unix_nano": 1_700_000_001_500_000_000,
        "trace_id": "ab" * 16, "span_id": "cd" * 8,
        "parent_span_id": "0" * 16,
        "trace_state": "w3c=1", "span_name": "op",
        "span_kind": 2, "status_code": 2, "status_message": "boom",
        "resource_attributes": json.dumps({"service.name": "svc"}),
        "scope_name": "SN", "scope_version": "2",
        "attributes": json.dumps({"a": 1}),
        "events": json.dumps([
            {"name": "ev1", "timeUnixNano": 5,
             "attributes": {"x": 2.5}}]),
        "links": json.dumps([
            {"traceId": "0" * 32, "spanId": "ef" * 8,
             "traceState": "ts", "attributes": {}}]),
    }
    r = ch_span_row(row)
    assert r["Timestamp"] == 1_700_000_000_000_000_000
    # pdata String() SHORT names, not SPAN_KIND_* long forms
    assert r["SpanKind"] == "Server" and r["StatusCode"] == "Error"
    assert r["Duration"] == 1_500_000_000
    assert r["ParentSpanId"] == ""     # hex-or-empty
    assert r["SpanAttributes"] == '{"a":"1"}'
    assert json.loads(r["EventsTimestamp"]) == [5]
    assert json.loads(r["EventsName"]) == ["ev1"]
    assert json.loads(r["EventsAttributes"]) == [{"x": "2.5"}]
    # link ids are hex-or-EMPTY (convertLinks), unlike exemplars
    assert json.loads(r["LinksTraceId"]) == [""]
    assert json.loads(r["LinksSpanId"]) == ["efefefefefefefef"]
    assert json.loads(r["LinksTraceState"]) == ["ts"]


def test_span_kind_default_unspecified():
    r = ch_span_row({})
    assert r["SpanKind"] == "Unspecified"
    assert r["StatusCode"] == "Unset" and r["Duration"] == 0


def _base_metric(mtype):
    return {
        "mtype": mtype, "name": "m", "description": "d", "unit": "1",
        "resource_attributes": json.dumps({"service.name": "s"}),
        "resource_schema_url": "ru", "scope_schema_url": "su",
        "scope_name": "sn", "scope_version": "sv",
        "scope_attributes": json.dumps({}),
        "scope_dropped_attr_count": 3,
        "attributes": json.dumps({"k": "v"}),
        "start_time_unix_nano": 10, "time_unix_nano": 20,
        "flags": 1,
    }


def test_metric_gauge_exemplars():
    # Test_convertExemplars vectors: zero ids render as plain hex
    # zeros (NOT hex-or-empty), int values cast to float, missing
    # value type -> 0.0
    row = _base_metric("gauge")
    row["value_int"] = 20
    row["exemplars"] = json.dumps([
        {"filteredAttributes": {"key1": "value1", "key2": "value2"}},
        {"timeUnixNano": 1672218930_000000000, "asInt": 20},
        {"asDouble": 15.0, "spanId": "0102030400000000"},
    ])
    r = ch_metric_row(row)
    assert r["ChTable"] == "otel_metrics_gauge"
    assert r["Value"] == 20.0          # getValue int cast
    assert r["Flags"] == 1
    assert json.loads(r["ExemplarsFilteredAttributes"]) == [
        {"key1": "value1", "key2": "value2"}, {}, {}]
    assert json.loads(r["ExemplarsTimeUnix"]) == [
        0, 1672218930_000000000, 0]
    assert json.loads(r["ExemplarsValue"]) == [0.0, 20.0, 15.0]
    assert json.loads(r["ExemplarsTraceId"]) == ["0" * 32] * 3
    assert json.loads(r["ExemplarsSpanId"]) == [
        "0" * 16, "0" * 16, "0102030400000000"]
    assert r["AggregationTemporality"] is None  # gauge has none
    assert r["ScopeDroppedAttrCount"] == 3


def test_metric_sum_and_summary():
    row = _base_metric("sum")
    row.update(value_double=2.5, aggregation_temporality=2,
               is_monotonic=True)
    r = ch_metric_row(row)
    assert r["ChTable"] == "otel_metrics_sum"
    assert r["Value"] == 2.5 and r["AggregationTemporality"] == 2
    assert r["IsMonotonic"] is True

    row = _base_metric("summary")
    row.update(count=7, ssum=1.5, quantiles=[0.0, 0.5],
               quantile_values=[1.0, 2.0])
    r = ch_metric_row(row)
    assert r["ChTable"] == "otel_metrics_summary"
    assert r["Count"] == 7 and r["Sum"] == 1.5
    assert json.loads(r["Quantiles"]) == [0.0, 0.5]
    assert json.loads(r["QuantileValues"]) == [1.0, 2.0]
    # summary has NO exemplars / temporality columns
    assert r["ExemplarsValue"] is None
    assert r["AggregationTemporality"] is None


def test_metric_histograms():
    row = _base_metric("histogram")
    row.update(count=9, hsum=4.5, bucket_counts=[1, 2, 6],
               explicit_bounds=[0.5, 1.0],
               aggregation_temporality=1, exemplars="[]")
    r = ch_metric_row(row)
    assert r["ChTable"] == "otel_metrics_histogram"
    assert json.loads(r["BucketCounts"]) == [1, 2, 6]
    assert json.loads(r["ExplicitBounds"]) == [0.5, 1.0]
    # unset Min/Max append the Go zero value (no HasMin gate)
    assert r["Min"] == 0.0 and r["Max"] == 0.0
    assert r["AggregationTemporality"] == 1

    row = _base_metric("exponential_histogram")
    row.update(count=4, hsum=8.0, scale=2, zero_count=1,
               pos_offset=3, pos_bucket_counts=[1, 1],
               neg_offset=-2, neg_bucket_counts=[2],
               hmin=0.5, hmax=9.0, aggregation_temporality=2)
    r = ch_metric_row(row)
    assert r["ChTable"] == "otel_metrics_exponential_histogram"
    assert r["Scale"] == 2 and r["ZeroCount"] == 1
    assert r["PositiveOffset"] == 3
    assert json.loads(r["PositiveBucketCounts"]) == [1, 1]
    assert r["NegativeOffset"] == -2
    assert json.loads(r["NegativeBucketCounts"]) == [2]
    assert r["Min"] == 0.5 and r["Max"] == 9.0


def test_metric_unknown_type_errors():
    # exporter_metrics.go:110-113 whole-push errors
    with pytest.raises(ValueError, match="metrics type is unset"):
        ch_metric_row({"mtype": ""})
    with pytest.raises(ValueError, match="unsupported"):
        ch_metric_row({"mtype": "weird"})
