"""mezmoexporter + k8seventsreceiver parity
(mezmoexporter/exporter.go:75-165, utils.go;
k8seventsreceiver/k8s_event_to_logdata.go, receiver.go:138-161)."""

import json

from opentelemetry_collector_contrib_ray.stages.k8sevents import (
    go_time_string,
    k8s_event_to_row,
)
from opentelemetry_collector_contrib_ray.stages.mezmo import (
    log_to_mezmo_line,
    truncate_string,
)


# --- mezmo -----------------------------------------------------------------

def test_mezmo_line_golden():
    row = {
        "time_unix_nano": 1681873445123456789,
        "severity_text": "DEBUG",
        "body": "minimal attribute log",
        "trace_id": "0102030405060708090a0b0c0d0e0f10",
        "span_id": "0102030405060708",
        "attributes": json.dumps({"appname": "myapp", "k": "v",
                                  "n": 7}),
        "resource_attributes": json.dumps({"host.name": "h1"}),
    }
    line = log_to_mezmo_line(row)
    assert line == (
        '{"timestamp":1681873445123,'
        '"line":"minimal attribute log",'
        '"app":"myapp","level":"DEBUG",'
        '"meta":{"appname":"myapp","hostname":"h1","k":"v","n":"",'
        '"span.id":"0102030405060708",'
        '"trace.id":"0102030405060708090a0b0c0d0e0f10"}}')


def test_mezmo_defaults_and_now_substitute():
    row = {"time_unix_nano": 0, "severity_text": "", "body": "",
           "attributes": "{}", "resource_attributes": "{}"}
    line = json.loads(log_to_mezmo_line(row, now_ms=1234))
    assert line["timestamp"] == 1234
    assert line["level"] == "info"
    assert line["app"] == ""
    assert line["meta"] == {}


def test_mezmo_attr_overwrites_hostname():
    # the attrs loop runs AFTER hostname/trace/span (exporter.go:105)
    row = {"time_unix_nano": 1_000_000, "severity_text": "x",
           "body": "b",
           "attributes": json.dumps({"hostname": "attr-host"}),
           "resource_attributes": json.dumps({"host.name": "res"})}
    line = json.loads(log_to_mezmo_line(row))
    assert line["meta"]["hostname"] == "attr-host"


def test_mezmo_truncation_strictly_less():
    # utils.go:7-13 — len(s) < maxLen keeps, len == maxLen cuts
    assert truncate_string("a" * 79, 80) == "a" * 79
    assert truncate_string("a" * 80, 80) == "a" * 80  # cut to 80
    assert truncate_string("a" * 81, 80) == "a" * 80
    row = {"time_unix_nano": 1_000_000,
           "severity_text": "L" * 100, "body": "b",
           "attributes": "{}", "resource_attributes": "{}"}
    assert json.loads(log_to_mezmo_line(row))["level"] == "L" * 80


# --- k8sevents ---------------------------------------------------------------

EV = {
    "metadata": {"name": "sample-nginx.1", "uid": "uid-1",
                 "creationTimestamp": "2023-04-19T03:04:05Z"},
    "involvedObject": {"kind": "Pod", "name": "sample-nginx",
                       "uid": "obj-uid", "fieldPath": "spec.c{n}",
                       "apiVersion": "v1",
                       "resourceVersion": "7387066320",
                       "namespace": "default"},
    "source": {"host": "node-1"},
    "reason": "Scheduled", "action": "Binding",
    "message": "Successfully assigned",
    "type": "Normal", "count": 3,
    "lastTimestamp": "2023-04-19T03:04:06Z",
}


def test_k8s_event_full():
    row = k8s_event_to_row(EV)
    res = json.loads(row["resource_attributes"])
    assert res == {
        "k8s.node.name": "node-1", "k8s.object.kind": "Pod",
        "k8s.object.name": "sample-nginx", "k8s.object.uid":
        "obj-uid", "k8s.object.fieldpath": "spec.c{n}",
        "k8s.object.api_version": "v1",
        "k8s.object.resource_version": "7387066320"}
    attrs = json.loads(row["attributes"])
    assert attrs["k8s.event.reason"] == "Scheduled"
    assert attrs["k8s.event.start_time"] == \
        "2023-04-19 03:04:05 +0000 UTC"
    assert attrs["k8s.namespace.name"] == "default"
    assert attrs["k8s.event.count"] == 3
    # severity from the lowercased type, text keeps original casing
    assert row["severity_number"] == 9
    assert row["severity_text"] == "Normal"
    assert row["body"] == "Successfully assigned"
    # lastTimestamp wins (no eventTime)
    assert row["time_unix_nano"] == 1681873446000000000


def test_k8s_event_timestamp_priority_and_unknown_type():
    ev = dict(EV, eventTime="2023-04-19T03:04:07.123456Z",
              type="Weird", count=0)
    row = k8s_event_to_row(ev)
    assert row["time_unix_nano"] == 1681873447123456000
    assert row["severity_number"] == 0
    assert row["severity_text"] == ""
    assert "k8s.event.count" not in json.loads(row["attributes"])


def test_k8s_event_zero_creation_time():
    ev = dict(EV, metadata={"name": "n", "uid": "u"})
    attrs = json.loads(k8s_event_to_row(ev)["attributes"])
    assert attrs["k8s.event.start_time"] == \
        "0001-01-01 00:00:00 +0000 UTC"
    assert go_time_string(1681873445500000000) == \
        "2023-04-19 03:04:05.5 +0000 UTC"


def test_k8s_stage_filters(ray_session):
    import pyarrow as pa
    import ray

    from opentelemetry_collector_contrib_ray.stages.k8sevents import (
        parse_k8s_events,
    )

    docs = [json.dumps(EV),
            json.dumps(dict(EV, involvedObject=dict(
                EV["involvedObject"], namespace="other"))),
            "not json"]
    ds = ray.data.from_arrow(pa.table({"event_json":
                                       pa.array(docs, pa.string())}))
    out = parse_k8s_events(ds, namespaces=["default"]).take_all()
    assert len(out) == 1
    assert json.loads(out[0]["attributes"])["k8s.namespace.name"] \
        == "default"
    # allowEvent: older-than-start events dropped
    out = parse_k8s_events(
        ds, not_before_ns=1681873446000000001).take_all()
    assert len(out) == 0


def test_mezmo_stage(ray_session):
    import pyarrow as pa
    import ray

    from opentelemetry_collector_contrib_ray.stages.mezmo import (
        logs_to_mezmo,
    )

    ds = ray.data.from_arrow(pa.table({
        "time_unix_nano": pa.array([2_000_000], pa.int64()),
        "severity_text": pa.array(["warn"], pa.string()),
        "body": pa.array(["hello"], pa.string()),
        "attributes": pa.array([json.dumps({"appname": "a"})],
                               pa.string()),
        "resource_attributes": pa.array(["{}"], pa.string()),
    }))
    out = logs_to_mezmo(ds).take_all()
    line = json.loads(out[0]["mezmo_line"])
    assert line == {"timestamp": 2, "line": "hello", "app": "a",
                    "level": "warn", "meta": {"appname": "a"}}
