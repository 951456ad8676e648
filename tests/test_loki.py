"""Loki push receiver/translator parity.

Strictness cases restate receiver/lokireceiver/internal/unmarshal_test.go
and push_test.go; the level table and label rules restate
pkg/translator/loki logs_to_loki.go / convert.go.
"""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.loki import (
    decode_push_doc,
    labelset_string,
    log_row_to_loki,
    logs_to_loki_push,
    normalize_label,
    parse_loki_push,
    severity_level,
)


# ---------------------------------------------------------------------------
# receiver decode — the reference's own unmarshal vectors


def test_push_test_vector():
    # push_test.go:54
    doc = ('{"streams":[{"stream":{"foo":"bar"},'
           '"values":[["1680000000000000000","log line"]]}]}')
    rows = decode_push_doc(doc)
    assert rows == [{"body": "log line",
                     "time_ns": 1680000000000000000,
                     "attributes": [("foo", "bar")]}]


def test_stream_not_object_errors():
    # unmarshal_test.go:26
    doc = ('{"streams":[{"stream":"not-a-json-object",'
           '"values":[["1680000000000000000","log line"]]}]}')
    assert isinstance(decode_push_doc(doc), str)


def test_values_not_array_errors():
    # unmarshal_test.go:31
    doc = '{"streams":[{"stream":{"foo":"bar"},"values":"not-an-array"}]}'
    assert isinstance(decode_push_doc(doc), str)


def test_null_values_ok():
    # unmarshal_test.go:36 — valid JSON with null values
    doc = '{"streams":[{"stream":{"foo":"bar"},"values":null}]}'
    assert decode_push_doc(doc) == []


def test_null_entry_skipped():
    doc = ('{"streams":[{"stream":{"a":"b"},"values":'
           '[null,["5","x"]]}]}')
    rows = decode_push_doc(doc)
    assert len(rows) == 1 and rows[0]["time_ns"] == 5


def test_numeric_timestamp_not_string_errors():
    doc = '{"streams":[{"stream":{"a":"b"},"values":[[168,"x"]]}]}'
    assert isinstance(decode_push_doc(doc), str)


def test_non_integer_timestamp_errors():
    doc = '{"streams":[{"stream":{"a":"b"},"values":[["1.5","x"]]}]}'
    assert isinstance(decode_push_doc(doc), str)


def test_structured_metadata_overwrites_label():
    doc = ('{"streams":[{"stream":{"a":"b","z":"1"},"values":'
           '[["7","x",{"a":"META","new":"v"}]]}]}')
    rows = decode_push_doc(doc)
    # PutStr updates "a" in place, appends "new" after the labels
    assert rows[0]["attributes"] == [("a", "META"), ("z", "1"),
                                     ("new", "v")]


def test_internal_labels_dropped():
    doc = ('{"streams":[{"stream":{"__internal__":"x","ok":"1"},'
           '"values":[["7","x"]]}]}')
    assert decode_push_doc(doc)[0]["attributes"] == [("ok", "1")]


def test_invalid_label_name_fails_request():
    doc = ('{"streams":[{"stream":{"bad-name":"x"},'
           '"values":[["7","x"]]}]}')
    assert isinstance(decode_push_doc(doc), str)


def test_non_string_label_value_fails_request():
    doc = '{"streams":[{"stream":{"a":5},"values":[["7","x"]]}]}'
    assert isinstance(decode_push_doc(doc), str)


def test_keep_timestamp_false_nulls():
    doc = '{"streams":[{"stream":{"a":"b"},"values":[["7","x"]]}]}'
    assert decode_push_doc(doc, keep_timestamp=False)[0]["time_ns"] is None


def test_empty_streams():
    assert decode_push_doc("{}") == []
    assert decode_push_doc('{"streams":[]}') == []


# ---------------------------------------------------------------------------
# level table + label normalization


@pytest.mark.parametrize("n,want", [
    (0, "UNSPECIFIED"), (1, "TRACE"), (2, "TRACE2"), (4, "TRACE4"),
    (5, "DEBUG"), (9, "INFO"), (11, "INFO3"), (13, "WARN"),
    (17, "ERROR"), (20, "ERROR4"), (21, "FATAL"), (24, "FATAL4"),
])
def test_severity_level_table(n, want):
    assert severity_level(n) == want


@pytest.mark.parametrize("name,want", [
    ("service.name", "service_name"), ("ok_name", "ok_name"),
    ("9lives", "key_9lives"), ("_private", "key_private"),
    ("__double", "__double"), ("a-b/c", "a_b_c"),
])
def test_normalize_label(name, want):
    assert normalize_label(name) == want


def test_labelset_string_sorted_quoted():
    assert labelset_string({"b": 'say "hi"', "a": "x"}) == \
        '{a="x", b="say \\"hi\\""}'


# ---------------------------------------------------------------------------
# exporter direction


def test_default_labels_and_job():
    labels, ts, line = log_row_to_loki(
        "msg", 5, 0, None, None, None, 0, {},
        {"service.name": "svc", "service.namespace": "ns",
         "service.instance.id": "i1"})
    assert labels == {"exporter": "OTLP", "job": "ns/svc",
                      "instance": "i1"}
    obj = json.loads(line)
    # resource attrs stay in the body (job/instance are derived labels)
    assert obj["resources"]["service.name"] == "svc"


def test_job_without_namespace():
    labels, _, _ = log_row_to_loki(
        "m", 1, 0, None, None, None, 0, {}, {"service.name": "s"})
    assert labels["job"] == "s"


def test_default_labels_suppressed():
    labels, _, _ = log_row_to_loki(
        "m", 1, 9, None, None, None, 0, {}, {"service.name": "s"},
        default_labels_enabled={"exporter": False, "job": False,
                                "level": False})
    assert labels == {}


def test_level_label_and_promotion_removal():
    labels, _, line = log_row_to_loki(
        "m", 1, 9, "INFO", None, None, 0,
        {"app": "a1", "env": "e"}, {}, label_cols=("app",))
    assert labels["level"] == "INFO" and labels["app"] == "a1"
    obj = json.loads(line)
    # promoted attrs removed from body; env stays
    assert obj["attributes"] == {"env": "e"}
    assert obj["severity"] == "INFO"


def test_existing_level_attr_wins():
    labels, _, _ = log_row_to_loki(
        "m", 1, 17, None, None, None, 0, {"level": "custom"}, {})
    assert labels["level"] == "custom"


def test_raw_format():
    _, _, line = log_row_to_loki(
        "plain text", 1, 0, None, None, None, 0, {"a": "b"}, {},
        fmt="raw")
    assert line == "plain text"


def test_json_format_go_struct_order_and_omitempty():
    _, _, line = log_row_to_loki(
        "b", 1, 0, "S", "ab" * 16, "cd" * 8, 1, {}, {})
    obj = json.loads(line)
    assert list(obj) == ["body", "traceid", "spanid", "severity",
                         "flags"]
    _, _, line2 = log_row_to_loki("b", 1, 0, None, "0" * 32, None, 0,
                                  {}, {})
    assert list(json.loads(line2)) == ["body"]   # zero ids omitted


def test_html_escaping_matches_go_json():
    _, _, line = log_row_to_loki("a<b>&c", 1, 0, None, None, None, 0,
                                 {}, {})
    assert '"a\\u003cb\\u003e\\u0026c"' in line


# ---------------------------------------------------------------------------
# stage round trip


def test_stage_roundtrip(ray_session):
    import ray

    flat = pa.table({
        "body": pa.array(["m0", "m1", "m2"], pa.string()),
        "time_ns": pa.array([10, 20, 30], pa.int64()),
        "sev": pa.array([9, 0, 17], pa.int64()),
        "app": pa.array(["x", "x", "y"], pa.string())})
    ds = ray.data.from_arrow(flat)
    push = logs_to_loki_push(ds, body_col="body", time_ns_col="time_ns",
                             severity_number_col="sev",
                             attr_cols=("app",), label_cols=("app",),
                             fmt="raw")
    docs = push.to_pandas()["push_json"].tolist()
    assert len(docs) == 1
    obj = json.loads(docs[0])
    # three distinct label sets → three streams, sorted by label string
    assert len(obj["streams"]) == 3
    back = parse_loki_push(ray.data.from_arrow(
        pa.table({"push_json": pa.array(docs, pa.string())})),
        "push_json").to_pandas().sort_values("time_ns")
    assert list(back["body"]) == ["m0", "m1", "m2"]
    attrs0 = dict(back.iloc[0]["attributes"])
    assert attrs0 == {"app": "x", "exporter": "OTLP", "level": "INFO"}
    attrs1 = dict(back.iloc[1]["attributes"])
    assert "level" not in attrs1
