"""alertmanagerexporter parity (alertmanager_exporter.go)."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.alertmanager import (
    span_events_to_alerts,
    spans_to_alertmanager,
)


def _row(events):
    return {"trace_id": "ab" * 16, "span_id": "cd" * 8,
            "events": json.dumps(events)}


def test_labels_annotations_split():
    alerts = span_events_to_alerts(
        _row([{"name": "exception",
               "timeUnixNano": 1681873445500000000,
               "attributes": {"severity": "critical", "env": "p",
                              "n": 5}}]),
        severity_attribute="severity", default_severity="info",
        event_labels=("env",), generator_url="g")
    a = json.loads(alerts[0])
    # labels: configured subset + severity + event_name only
    assert a["labels"] == {"env": "p", "event_name": "exception",
                           "severity": "critical"}
    # annotations: ALL attrs AsString + trace/span ids
    assert a["annotations"] == {
        "severity": "critical", "env": "p", "n": "5",
        "TraceID": "ab" * 16, "SpanID": "cd" * 8}
    assert a["startsAt"] == "2023-04-19T03:04:05.5Z"
    assert a["endsAt"] == "0001-01-01T00:00:00Z"
    assert a["generatorURL"] == "g"


def test_default_severity_and_no_events():
    alerts = span_events_to_alerts(
        _row([{"name": "e", "timeUnixNano": 0, "attributes": {}}]),
        severity_attribute="severity", default_severity="warn",
        event_labels=(), generator_url="")
    assert json.loads(alerts[0])["labels"]["severity"] == "warn"
    assert span_events_to_alerts(
        _row([]), severity_attribute="severity",
        default_severity="info", event_labels=(),
        generator_url="") == []


def test_spans_to_alertmanager_dataset(ray_session):
    import ray

    t = pa.table({
        "trace_id": pa.array(["ab" * 16], pa.string()),
        "span_id": pa.array(["cd" * 8], pa.string()),
        "events": pa.array([json.dumps(
            [{"name": "x", "timeUnixNano": 0, "attributes": {}},
             {"name": "y", "timeUnixNano": 0, "attributes": {}}])],
            pa.string())})
    out = spans_to_alertmanager(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 2     # one alert per span event
