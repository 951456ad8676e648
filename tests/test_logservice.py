"""alibabacloud/tencentcloud LogService exporter parity
(logsdata/tracedata/metricsdata_to_logservice.go, sanitize.go)."""

import json

from opentelemetry_collector_contrib_ray.stages.logservice import (
    format_metric_name,
    log_to_logservice,
    metric_row_to_logservice,
    sanitize_label_key,
    span_to_logservice,
)


def test_sanitize_and_name_format():
    assert sanitize_label_key("a.b-c") == "a_b_c"
    assert sanitize_label_key("0abc") == "key_0abc"
    assert sanitize_label_key("_x") == "key_x"
    assert sanitize_label_key("") == ""
    assert format_metric_name("a.b:c_d-e") == "a_b:c_d_e"


def test_log_record():
    row = {
        "time_unix_nano": 1681873445123456789,
        "severity_number": 9, "severity_text": "Info",
        "body": "hello", "flags": 255,
        "trace_id": "0102030405060708090a0b0c0d0e0f10",
        "span_id": "0102030405060708",
        "attributes": json.dumps({"k": "v", "n": 7}),
        "resource_attributes": json.dumps(
            {"host.name": "h1", "service.name": "svc", "env": "p"}),
        "scope_name": "lib", "scope_version": "1.0",
    }
    rec = log_to_logservice(row)
    assert rec["sls_time"] == 1681873445
    assert rec["host"] == "h1" and rec["service"] == "svc"
    assert rec["resource"] == '{"env":"p"}'
    assert rec["otlp_name"] == "lib"
    assert rec["time_unix_nano"] == "1681873445123456789"
    assert rec["severity_number"] == "9"
    assert rec["attribute"] == '{"k":"v","n":"7"}'  # AsString values
    assert rec["content"] == "hello"
    assert rec["flags"] == "ff"  # lowercase hex
    assert rec["traceID"] == "0102030405060708090a0b0c0d0e0f10"
    # empty-typed body drops the record; zero ts takes now
    assert log_to_logservice({"body": None}) is None
    rec = log_to_logservice(
        {"body": "", "time_unix_nano": 0, "attributes": "{}",
         "resource_attributes": "{}"}, now_ns=5_000_000_000)
    assert rec["sls_time"] == 5 and rec["time_unix_nano"] == "0"
    assert rec["traceID"] == "" and rec["flags"] == "0"


def test_span_record():
    row = {
        "trace_id": "0102030405060708090a0b0c0d0e0f10",
        "span_id": "0102030405060708", "parent_span_id": "",
        "trace_state": "a=b", "span_name": "op", "span_kind": 2,
        "start_time_unix_nano": 1681873445000001500,
        "end_time_unix_nano": 1681873446000002500,
        "status_code": 2, "status_message": "boom",
        "attributes": json.dumps({"a": 1}),
        "resource_attributes": json.dumps({"service.name": "svc"}),
        "scope_name": "lib", "scope_version": "1.0",
        "events": json.dumps([{"name": "ev",
                               "timeUnixNano": 1681873445500000000,
                               "attributes": {"x": "y"}}]),
        "links": json.dumps([{"traceId": "f" * 32, "spanId": "e" * 16,
                              "attributes": {}}]),
    }
    rec = span_to_logservice(row)
    assert rec["sls_time"] == 1681873446  # END-timestamp seconds
    assert rec["host"] == "" and rec["service"] == "svc"
    assert rec["kind"] == "server"
    assert rec["parentSpanID"] == ""
    assert rec["start"] == "1681873445000001"  # µs truncation
    assert rec["end"] == "1681873446000002"
    assert rec["duration"] == "1000001"
    assert rec["statusCode"] == "ERROR"
    assert rec["logs"] == ('[{"attribute":{"x":"y"},"name":"ev",'
                           '"time":1681873445500000000}]')
    assert rec["links"] == ('[{"attribute":{},"spanID":"' + "e" * 16
                            + '","traceID":"' + "f" * 32 + '"}]')
    assert rec["attribute"] == '{"a":1}'  # AsRaw typed
    # kind unspecified → "", status unset → UNSET, zero end → now
    rec = span_to_logservice(
        {"span_kind": 0, "status_code": 0, "attributes": "{}",
         "resource_attributes": "{}", "events": "[]", "links": "[]",
         "start_time_unix_nano": 0, "end_time_unix_nano": 0},
        now_ns=9_000_000_000)
    assert rec["kind"] == "" and rec["statusCode"] == "UNSET"
    assert rec["sls_time"] == 9


def _metric_rows(row):
    out = []
    metric_row_to_logservice(out, 0, row)
    return [(name, labels, ns, val) for _, name, labels, ns, val
            in out]


def test_metric_number():
    rows = _metric_rows({
        "mtype": "gauge", "name": "cpu.util", "value_double": 0.25,
        "time_unix_nano": 1681873445000000000,
        "attributes": json.dumps({"core": "0", "0bad": "x"}),
        "resource_attributes": json.dumps({"host.name": "h"})})
    assert rows == [("cpu_util",
                     "core#$#0|host_name#$#h|key_0bad#$#x",
                     1681873445000000000, "0.25")]
    # int value goes through float64
    rows = _metric_rows({"mtype": "sum", "name": "n", "value_int": 7,
                         "time_unix_nano": 1, "attributes": "{}",
                         "resource_attributes": "{}"})
    assert rows[0][3] == "7"
    # exponential histogram / empty types skipped
    assert _metric_rows({"mtype": "exponential_histogram"}) == []


def test_metric_histogram_fanout():
    rows = _metric_rows({
        "mtype": "histogram", "name": "lat", "count": 10, "hsum": 2.5,
        "explicit_bounds": [0.5, 2.0], "bucket_counts": [1, 2, 7],
        "time_unix_nano": 2_000_000_000,
        "attributes": json.dumps({"p": "a"}),
        "resource_attributes": "{}"})
    names = [r[0] for r in rows]
    assert names == ["lat_sum", "lat_count", "lat_bucket",
                     "lat_bucket", "lat_bucket"]
    assert rows[0][3] == "2.5" and rows[1][3] == "10"
    assert rows[2][1] == "le#$#0.5|p#$#a" and rows[2][3] == "1"
    assert rows[3][1] == "le#$#2|p#$#a" and rows[3][3] == "2"
    assert rows[4][1] == "le#$#+Inf|p#$#a" and rows[4][3] == "7"
    # bucketCount = min(bounds+1, len(counts)) — short counts clip
    rows = _metric_rows({
        "mtype": "histogram", "name": "lat", "count": 3, "hsum": 1.0,
        "explicit_bounds": [0.5, 2.0], "bucket_counts": [1, 2],
        "time_unix_nano": 1, "attributes": "{}",
        "resource_attributes": "{}"})
    assert [r[0] for r in rows].count("lat_bucket") == 2


def test_metric_summary_fanout():
    rows = _metric_rows({
        "mtype": "summary", "name": "rpc", "count": 5, "ssum": 1.5,
        "quantiles": [0.5, 0.99], "quantile_values": [1.0, 2.0],
        "time_unix_nano": 3_000_000_000, "attributes": "{}",
        "resource_attributes": "{}"})
    assert [r[0] for r in rows] == ["rpc_sum", "rpc_count", "rpc",
                                    "rpc"]
    assert rows[2][1] == "quantile#$#0.5" and rows[2][3] == "1"
    assert rows[3][1] == "quantile#$#0.99" and rows[3][3] == "2"


def test_stages_end_to_end(ray_session):
    import pyarrow as pa
    import ray

    from opentelemetry_collector_contrib_ray.stages.logservice import (
        logs_to_logservice,
        metrics_to_logservice,
        spans_to_logservice,
    )

    logs = ray.data.from_arrow(pa.table({
        "body": pa.array(["x", None], pa.string()),
        "time_unix_nano": pa.array([1_500_000_000, 0], pa.int64()),
        "attributes": pa.array(["{}", "{}"], pa.string()),
        "resource_attributes": pa.array(["{}", "{}"], pa.string()),
    }))
    out = logs_to_logservice(logs).take_all()
    assert len(out) == 1 and out[0]["sls_time"] == 1

    spans = ray.data.from_arrow(pa.table({
        "trace_id": pa.array(["a" * 32], pa.string()),
        "span_id": pa.array(["b" * 16], pa.string()),
        "span_kind": pa.array([3], pa.int64()),
        "status_code": pa.array([1], pa.int64()),
        "start_time_unix_nano": pa.array([1_000_000_000], pa.int64()),
        "end_time_unix_nano": pa.array([2_000_000_000], pa.int64()),
        "attributes": pa.array(["{}"], pa.string()),
        "resource_attributes": pa.array(["{}"], pa.string()),
        "events": pa.array(["[]"], pa.string()),
        "links": pa.array(["[]"], pa.string()),
    }))
    out = spans_to_logservice(spans).take_all()
    assert out[0]["kind"] == "client" and out[0]["statusCode"] == "OK"

    mets = ray.data.from_arrow(pa.table({
        "mtype": pa.array(["gauge"], pa.string()),
        "name": pa.array(["m"], pa.string()),
        "value_double": pa.array([1.5], pa.float64()),
        "time_unix_nano": pa.array([4_000_000_000], pa.int64()),
        "attributes": pa.array(["{}"], pa.string()),
        "resource_attributes": pa.array(["{}"], pa.string()),
    }))
    out = metrics_to_logservice(mets).take_all()
    assert out[0]["__name__"] == "m"
    assert out[0]["__value__"] == "1.5"
    assert out[0]["sls_time"] == 4
