"""cloudfoundryreceiver parity — pinned on the reference's own
TestConvertCountEnvelope / log-envelope vectors (converter_test.go)."""

import base64
import json

import pytest

from opentelemetry_collector_contrib_ray.stages.cloudfoundry import (
    SCOPE_NAME,
    parse_cloudfoundry_logs,
    parse_cloudfoundry_metrics,
)

COUNT_ENV = {
    "timestamp": 1_700_000_000_000_000_001,
    "sourceId": "uaa",
    "tags": {
        "origin": "gorouter", "deployment": "cf", "job": "router",
        "index": "bc276108-8282-48a5-bae7-c009c4392246",
        "ip": "10.244.0.34", "custom": "datapoint"},
    "counter": {"name": "bad_gateways", "delta": "1", "total": "10"},
}

LOG_ENV = {
    "timestamp": 1_700_000_000_000_000_002,
    "sourceId": "744e75bb-69d1-4cf4-b037-76875368097b",
    "instanceId": "0",
    "tags": {"origin": "rep", "custom": "datapoint"},
    "log": {"payload": base64.b64encode(
        b"test-app. Says Hello. on index: 0").decode(),
        "type": "OUT"},
}


def _run_metrics(env, **opts):
    import pyarrow as pa
    import ray

    ds = ray.data.from_arrow(pa.table(
        {"envelope": pa.array([json.dumps(env)], pa.string())}))
    return parse_cloudfoundry_metrics(ds, start_ns=123, **opts) \
        .take_all()


def _run_logs(env, **opts):
    import pyarrow as pa
    import ray

    ds = ray.data.from_arrow(pa.table(
        {"envelope": pa.array([json.dumps(env)], pa.string())}))
    return parse_cloudfoundry_logs(ds, observed_ns=456, **opts) \
        .take_all()


def test_count_envelope_gate_on(ray_session):
    out = _run_metrics(COUNT_ENV)
    assert len(out) == 1
    r = out[0]
    assert r["name"] == "gorouter.bad_gateways"
    assert r["mtype"] == "sum"
    assert r["value_double"] == 10.0
    assert r["start_time_unix_nano"] == 123
    assert json.loads(r["attributes"]) == {
        "org.cloudfoundry.custom": "datapoint"}
    assert json.loads(r["resource_attributes"]) == {
        "org.cloudfoundry.source_id": "uaa",
        "org.cloudfoundry.origin": "gorouter",
        "org.cloudfoundry.deployment": "cf",
        "org.cloudfoundry.job": "router",
        "org.cloudfoundry.index":
            "bc276108-8282-48a5-bae7-c009c4392246",
        "org.cloudfoundry.ip": "10.244.0.34"}
    assert r["scope_name"] == SCOPE_NAME


def test_count_envelope_gate_off_legacy(ray_session):
    out = _run_metrics(COUNT_ENV, allow_resource_attributes=False)
    attrs = json.loads(out[0]["attributes"])
    assert attrs == {
        "org.cloudfoundry.source_id": "uaa",
        "org.cloudfoundry.origin": "gorouter",
        "org.cloudfoundry.deployment": "cf",
        "org.cloudfoundry.job": "router",
        "org.cloudfoundry.index":
            "bc276108-8282-48a5-bae7-c009c4392246",
        "org.cloudfoundry.ip": "10.244.0.34",
        "org.cloudfoundry.custom": "datapoint"}
    assert json.loads(out[0]["resource_attributes"]) == {}


def test_gauge_envelope_fan_out(ray_session):
    env = dict(COUNT_ENV)
    del env["counter"]
    env["gauge"] = {"metrics": {"memory": {"value": 17046641.0,
                                           "unit": "bytes"},
                                "disk": {"value": 10231808.0}}}
    out = _run_metrics(env)
    got = {r["name"]: r for r in out}
    assert set(got) == {"gorouter.memory", "gorouter.disk"}
    assert got["gorouter.memory"]["mtype"] == "gauge"
    assert got["gorouter.memory"]["value_double"] == 17046641.0


def test_missing_origin_still_dots():
    import ray  # noqa: F401 — session fixture

    env = dict(COUNT_ENV, tags={})
    out = _run_metrics(env)
    assert out[0]["name"] == ".bad_gateways"


def test_log_envelope(ray_session):
    out = _run_logs(LOG_ENV)
    r = out[0]
    assert r["body"] == "test-app. Says Hello. on index: 0"
    assert r["severity_number"] == 9
    assert r["severity_text"] == "Info"
    assert r["observed_time_unix_nano"] == 456
    assert json.loads(r["resource_attributes"])[
        "org.cloudfoundry.instance_id"] == "0"
    err = dict(LOG_ENV, log=dict(LOG_ENV["log"], type="ERR"))
    r = _run_logs(err)[0]
    assert (r["severity_number"], r["severity_text"]) == (17, "Error")


def test_log_envelope_bad_type_dropped_or_kept(ray_session):
    bad = dict(LOG_ENV, log=dict(LOG_ENV["log"], type="WEIRD"))
    assert _run_logs(bad) == []
    kept = _run_logs(bad, on_error="keep")
    assert len(kept) == 1
    assert "unsupported envelope log type" in kept[0]["error"]


def test_non_log_envelope_dropped(ray_session):
    assert _run_logs(COUNT_ENV) == []
