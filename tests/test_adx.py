"""azuredataexplorerexporter parity (stages/adx.py) — vectors from
metricsdata_to_adx_test.go / logsdata_to_adx_test.go /
tracesdata_to_adx_test.go."""

import json

from opentelemetry_collector_contrib_ray.stages.adx import (
    adx_log_row,
    adx_metric_rows,
    adx_trace_row,
)


def _metric(row, **kw):
    out = []
    adx_metric_rows(out, 0, row, **kw)
    return [r for _, r in out]


def test_histogram_fanout_reference_vector():
    # Test_rawMetricsToAdxMetrics metrics_simple_histogram_with_value:
    # bounds [1,2,4], counts [4,2,3,5], sum 23, count 7, attrs k1=v1,
    # scope SN/SV → _sum/_count then cumulative buckets 4/6/9 and
    # +Inf 14 (= 9 + overflow 5)
    rows = _metric({
        "mtype": "histogram", "name": "http.server.duration",
        "description": "measures the duration of the inbound HTTP"
                       " request",
        "unit": "milliseconds", "time_unix_nano": 0,
        "hsum": 23.0, "count": 7,
        "explicit_bounds": [1.0, 2.0, 4.0],
        "bucket_counts": [4, 2, 3, 5],
        "attributes": json.dumps({"k1": "v1"}),
        "resource_attributes": json.dumps(
            {"key": "value", "host.name": "test-host"}),
        "scope_name": "SN", "scope_version": "SV",
    })
    assert [r["MetricName"] for r in rows] == [
        "http.server.duration_sum", "http.server.duration_count",
        "http.server.duration_bucket", "http.server.duration_bucket",
        "http.server.duration_bucket", "http.server.duration_bucket"]
    assert [r["MetricValue"] for r in rows] == [23.0, 7.0, 4.0, 6.0,
                                                9.0, 14.0]
    assert rows[0]["MetricDescription"] == (
        "measures the duration of the inbound HTTP request"
        "(Sum total of samples)")
    assert rows[1]["MetricDescription"].endswith("(Count of samples)")
    # bucket desc falls back to the metric description (isEmpty rule)
    assert rows[2]["MetricDescription"] == (
        "measures the duration of the inbound HTTP request")
    assert json.loads(rows[2]["MetricAttributes"]) == {
        "le": "1", "scope.name": "SN", "scope.version": "SV",
        "k1": "v1"}
    assert json.loads(rows[5]["MetricAttributes"])["le"] == "+Inf"
    assert all(r["Host"] == "test-host" for r in rows)
    assert all(r["MetricType"] == "Histogram" for r in rows)
    assert all(r["MetricUnit"] == "milliseconds" for r in rows)


def test_histogram_buckets_skipped_on_count_mismatch():
    rows = _metric({
        "mtype": "histogram", "name": "h", "description": "d",
        "unit": "", "time_unix_nano": 0, "hsum": 1.0, "count": 2,
        "explicit_bounds": [1.0, 2.0], "bucket_counts": [1, 1],
        "attributes": "{}", "resource_attributes": "{}",
    })
    assert [r["MetricName"] for r in rows] == ["h_sum", "h_count"]


def test_summary_quantile_rows():
    rows = _metric({
        "mtype": "summary", "name": "lat", "description": "d",
        "unit": "s", "time_unix_nano": 1_500_000_000,
        "ssum": 10.0, "count": 4,
        "quantiles": [0.5, 0.99], "quantile_values": [23.0, 45.0],
        "attributes": json.dumps({"k": "v"}),
        "resource_attributes": "{}", "scope_name": "",
    }, default_host="collector-host")
    assert [r["MetricName"] for r in rows] == [
        "lat_sum", "lat_count", "lat_0.5", "lat_0.99"]
    q = json.loads(rows[2]["MetricAttributes"])
    # qt + the quantileName carrying the VALUE, plus dp attrs
    assert q == {"qt": "0.5", "lat_0.5": 23.0, "k": "v"}
    assert rows[2]["MetricValue"] == 23.0
    assert rows[2]["MetricDescription"] == "d(Count of samples)"
    assert all(r["Host"] == "collector-host" for r in rows)
    assert rows[0]["Timestamp"] == "1970-01-01T00:00:01.5Z"


def test_gauge_int_value_and_unsupported_drop():
    rows = _metric({
        "mtype": "gauge", "name": "g", "description": "", "unit": "",
        "time_unix_nano": 0, "value_int": 7,
        "attributes": "{}", "resource_attributes": "{}",
    })
    assert rows[0]["MetricValue"] == 7.0
    assert rows[0]["MetricType"] == "Gauge"
    assert _metric({"mtype": "exponential_histogram",
                    "attributes": "{}",
                    "resource_attributes": "{}"}) == []


def test_log_row_scope_wins_and_ids():
    rec = adx_log_row({
        "time_unix_nano": 1_700_000_000_250_000_000,
        "observed_time_unix_nano": 0,
        "trace_id": "0" * 32, "span_id": "00000000000000ab",
        "severity_text": "INFO", "severity_number": 9,
        "body": "hello",
        "attributes": json.dumps({"scope.name": "app-value",
                                  "x": 1}),
        "resource_attributes": json.dumps({"r": "1"}),
        "scope_name": "SN", "scope_version": "",
    })
    assert rec["Timestamp"] == "2023-11-14T22:13:20.25Z"
    assert rec["ObservedTimestamp"] == "1970-01-01T00:00:00Z"
    assert rec["TraceID"] == ""  # all-zero → empty
    assert rec["SpanID"] == "00000000000000ab"
    la = json.loads(rec["LogsAttributes"])
    assert la == {"scope.name": "SN", "x": 1}  # scope wins, no
    # scope.version (empty parts omitted)
    assert rec["Body"] == "hello"
    assert rec["SeverityNumber"] == 9


def test_trace_row_enums_events_links():
    rec = adx_trace_row({
        "trace_id": f"{5:032x}", "span_id": f"{6:016x}",
        "parent_span_id": "", "span_name": "op",
        "status_code": 2, "status_message": "boom", "span_kind": 4,
        "start_time_unix_nano": 1_000_000_000,
        "end_time_unix_nano": 2_500_000_000,
        "attributes": "{}", "resource_attributes": "{}",
        "scope_name": "SN", "scope_version": "SV",
        "events": json.dumps([{"name": "ev", "timeUnixNano": 1,
                               "attributes": {"a": 1}}]),
        "links": json.dumps([{"traceId": f"{9:032x}",
                              "spanId": f"{10:016x}",
                              "traceState": "w=1",
                              "attributes": {}}]),
    })
    assert rec["SpanKind"] == "SPAN_KIND_PRODUCER"
    assert rec["SpanStatus"] == "STATUS_CODE_ERROR"
    assert rec["ParentID"] == ""
    assert rec["StartTime"] == "1970-01-01T00:00:01Z"
    assert rec["EndTime"] == "1970-01-01T00:00:02.5Z"
    # Go struct declaration order in the arrays
    assert rec["Events"] == (
        '[{"EventName":"ev",'
        '"Timestamp":"1970-01-01T00:00:00.000000001Z",'
        '"EventAttributes":{"a":1}}]')
    assert rec["Links"] == (
        '[{"TraceID":"' + f"{9:032x}" + '",'
        '"SpanID":"' + f"{10:016x}" + '",'
        '"TraceState":"w=1",'
        '"SpanLinkAttributes":{}}]')
    ta = json.loads(rec["TraceAttributes"])
    assert ta == {"scope.name": "SN", "scope.version": "SV"}
