"""Splunk HEC receiver/exporter parity.

Timestamp vectors = the reference's own table
(splunkhec_to_metricdata_test.go:462-507, including the
floating-point-accuracy expectations); %v float formatting restates
strconv.FormatFloat(v, 'g', -1, 64).
"""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.splunkhec import (
    get_metric_values,
    go_fmt_float,
    go_v,
    hec_convert_timestamp,
    hec_event_to_log_row,
    hec_event_to_metric_rows,
    log_row_to_hec,
    ns_to_epoch_ms_seconds,
    parse_splunk_hec_logs,
    parse_splunk_hec_metrics,
)


# ---------------------------------------------------------------------------
# convertTimestamp — the reference's own test table


@pytest.mark.parametrize("t,want", [
    (1234567890123456789, 1234567890123456768),   # ns (fp accuracy)
    (1234567890123456, 1234567890123456000),      # µs
    (1234567890456, 1234567890456000000),         # ms
    (1234567890, 1234567890000000000),            # s
    (1234567890.123456789, 1234567890123456768),  # dot ns (fp accuracy)
    (1234567890.123456, 1234567890123456000),     # dot µs
    (1234567890.456, 1234567890456000000),        # dot ms
])
def test_convert_timestamp_reference_vectors(t, want):
    assert hec_convert_timestamp(t) == want


def test_convert_timestamp_zero_is_null():
    assert hec_convert_timestamp(0) is None


# ---------------------------------------------------------------------------
# Go %v float formatting (strconv 'g' shortest: sci iff exp < -4 or >= 6)


@pytest.mark.parametrize("v,want", [
    (2.0, "2"), (0.5, "0.5"), (9.0, "9"), (87.332, "87.332"),
    (100000.0, "100000"), (999999.0, "999999"),
    (1e6, "1e+06"), (1.5e6, "1.5e+06"), (1234560.0, "1.23456e+06"),
    (0.0001, "0.0001"), (1e-5, "1e-05"), (-0.0, "-0"), (0.0, "0"),
    (-3.25, "-3.25"), (1e21, "1e+21"),
])
def test_go_fmt_float(v, want):
    assert go_fmt_float(v) == want


def test_go_v_composites():
    assert go_v(True) == "true"
    assert go_v(None) == "<nil>"
    assert go_v([1.0, "x", False]) == "[1 x false]"
    assert go_v({"b": 2.0, "a": "y"}) == "map[a:y b:2]"  # sorted keys


# ---------------------------------------------------------------------------
# GetMetricValues (common.go:88-100)


def test_single_metric_form():
    assert get_metric_values(
        {"metric_name": "cpu", "_value": 1.5}) == {"cpu": 1.5}


def test_single_metric_form_non_string_name_errors():
    assert isinstance(get_metric_values(
        {"metric_name": 3.0, "_value": 1.5}), str)


def test_multi_metric_form_regex_gate():
    vals = get_metric_values({
        "metric_name:cpu.idle": 1.0,
        "metric_name:9bad": 2.0,         # first char must be letter/./:
        "metric_name:a_metric_name_b": 3.0,  # name contains metric_name
        "metric_name:m-e.t:r_ic2": 4.0,
        "dc": "eu"})
    assert vals == {"cpu.idle": 1.0, "m-e.t:r_ic2": 4.0}


# ---------------------------------------------------------------------------
# logs path


def test_log_row_basic():
    row = hec_event_to_log_row(json.dumps({
        "time": 1234567890.456, "event": "hello",
        "host": "h", "source": "s", "sourcetype": "st", "index": "i",
        "fields": {"b": 2.0, "a": "x"}}))
    assert row["body"] == "hello"
    assert row["time_ns"] == 1234567890456000000
    assert row["host"] == "h" and row["index"] == "i"
    assert row["fields"] == [("a", "x"), ("b", "2")]   # sorted keys


def test_log_row_time_string_and_bad_time():
    assert hec_event_to_log_row(
        '{"event":"x","time":"1234567890"}')["time_ns"] == \
        1234567890000000000
    assert isinstance(hec_event_to_log_row(
        '{"event":"x","time":"notanumber"}'), str)


def test_log_row_structured_body_canonical_json():
    row = hec_event_to_log_row('{"event":{"z":1,"a":"b"}}')
    assert row["body"] == '{"a":"b","z":1.0}'
    assert row["time_ns"] is None       # missing time


def test_log_row_empty_metadata_is_null():
    row = hec_event_to_log_row('{"event":"x","host":""}')
    assert row["host"] is None and row["source"] is None


def test_parse_logs_batch_drop_and_keep():
    docs = ['{"event":"a","host":"h"}', "not json", '["list"]']
    t = pa.table({"event_json": pa.array(docs, pa.string()),
                  "idx": pa.array([0, 1, 2], pa.int64())})
    from opentelemetry_collector_contrib_ray.stages.splunkhec import (
        _ParseHecLogs,
    )
    out = _ParseHecLogs("event_json", "drop")(t)
    assert out.num_rows == 1 and out.column("idx").to_pylist() == [0]
    kept = _ParseHecLogs("event_json", "keep")(t)
    assert kept.num_rows == 3
    assert kept.column("error").to_pylist() == [
        None, "invalid JSON event", "invalid JSON event"]


# ---------------------------------------------------------------------------
# metrics path


def test_metric_rows_fanout_sorted_with_labels():
    rows, dropped = hec_event_to_metric_rows(json.dumps({
        "time": 1234567890,
        "fields": {"metric_name:b.m": 2.0, "metric_name:a.m": "3.5",
                   "dc": "eu", "n": 4.0, "ok": True, "": "skipme",
                   "nil": None}}))
    assert dropped == 0
    assert [(r["name"], r["value_double"]) for r in rows] == [
        ("a.m", 3.5), ("b.m", 2.0)]
    assert rows[0]["attributes"] == [("dc", "eu"), ("n", "4"),
                                     ("ok", "true")]
    assert rows[0]["time_ns"] == 1234567890000000000


def test_metric_rows_string_drop_and_bool_drop():
    rows, dropped = hec_event_to_metric_rows(json.dumps({
        "fields": {"metric_name:a": "abc", "metric_name:b": True,
                   "metric_name:c": 1.0}}))
    assert dropped == 2
    assert [(r["name"],) for r in rows] == [("c",)]


def test_metric_single_form_string_value():
    rows, dropped = hec_event_to_metric_rows(
        '{"fields":{"metric_name":"g1","_value":"7"}}')
    assert rows[0]["name"] == "g1" and rows[0]["value_double"] == 7.0
    assert rows[0]["attributes"] == []


def test_parse_metrics_batch_fanout_carries_parent():
    docs = ['{"fields":{"metric_name:a":1,"metric_name:b":2}}',
            '{"fields":{"metric_name:9x":1}}']
    t = pa.table({"event_json": pa.array(docs, pa.string()),
                  "idx": pa.array([10, 11], pa.int64())})
    from opentelemetry_collector_contrib_ray.stages.splunkhec import (
        _ParseHecMetrics,
    )
    out = _ParseHecMetrics("event_json", "drop")(t)
    assert out.column("idx").to_pylist() == [10, 10]
    assert out.column("name").to_pylist() == ["a", "b"]


# ---------------------------------------------------------------------------
# exporter path + round trip


def test_ns_to_epoch_ms_seconds_docstring_example():
    # logdata_to_splunk.go:136 example: 1433188255.500
    assert ns_to_epoch_ms_seconds(1433188255500000000) == 1433188255.5
    assert ns_to_epoch_ms_seconds(1433188255500499999) == 1433188255.5
    assert ns_to_epoch_ms_seconds(1433188255500500000) == 1433188255.501


def test_exporter_rejects_empty_body():
    assert log_row_to_hec(None, 0, None, None, None, None,
                          None, None, None, None, []) is None
    assert log_row_to_hec("", 0, None, None, None, None,
                          None, None, None, None, []) is None


def test_exporter_envelope_shape_and_omitempty():
    doc = log_row_to_hec("msg", 1700000000001000000, None, "src", None,
                         None, "ERROR", 17, "0" * 32, "00ab" + "0" * 12,
                         [("k", "v")])
    obj = json.loads(doc)
    # host always present, defaulting to "unknown"
    assert obj["host"] == "unknown"
    assert obj["source"] == "src"
    assert "sourcetype" not in obj and "index" not in obj
    # all-zero trace id is empty → omitted; span id present
    assert obj["fields"] == {"k": "v", "otel.log.severity.number": 17,
                             "otel.log.severity.text": "ERROR",
                             "span_id": "00ab" + "0" * 12}
    assert obj["time"] == 1700000000.001
    # Go struct marshal order
    assert list(obj) == ["event", "fields", "host", "source", "time"]


def test_roundtrip_through_stages(ray_session):
    import ray

    flat = pa.table({
        "body": pa.array(["b0", "b1", ""], pa.string()),
        "time_ns": pa.array(
            [1700000000001000000, None, 5], pa.int64()),
        "host": pa.array(["h0", None, "x"], pa.string()),
        "k1": pa.array(["v0", None, "z"], pa.string())})
    ds = ray.data.from_arrow(flat)
    from opentelemetry_collector_contrib_ray.stages.splunkhec import (
        logs_to_splunk_hec,
    )
    hec = logs_to_splunk_hec(ds, body_col="body", time_ns_col="time_ns",
                             host_col="host", fields_cols=("k1",))
    back = parse_splunk_hec_logs(hec, "event_json").to_pandas()
    assert len(back) == 2                      # empty body rejected
    assert list(back["body"]) == ["b0", "b1"]
    assert list(back["host"]) == ["h0", "unknown"]
    assert back["time_ns"][0] == 1700000000001000000
    assert back["fields"][0] == [("k1", "v0")]
    assert back["fields"][1] == []
