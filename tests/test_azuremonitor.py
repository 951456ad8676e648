"""azuremonitorexporter parity (trace_to_envelope.go,
log_to_envelope.go, conventions.go, time_utils.go)."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.azuremonitor import (
    format_duration,
    log_to_envelope,
    logs_to_azuremonitor,
    span_to_envelopes,
    spans_to_azuremonitor,
    to_ai_severity_level,
)


def row(kind, attrs, status=0, msg=None, events="[]", links="[]",
        res=None, name="opX"):
    return {"trace_id": "ab" * 16, "span_id": "cd" * 8,
            "parent_span_id": "ef" * 8, "span_name": name,
            "span_kind": kind,
            "start_time_unix_nano": 1681873445000000000,
            "end_time_unix_nano": 1681873446500000000,
            "status_code": status, "status_message": msg,
            "attributes": json.dumps(attrs),
            "resource_attributes": json.dumps(
                res or {"service.name": "svc",
                        "service.namespace": "ns",
                        "service.instance.id": "i1"}),
            "scope_name": "lib", "scope_version": "1.0",
            "events": events, "links": links}


def test_format_duration():
    assert format_duration(90_500_000_000) == "00.00:01:30.500000"
    assert format_duration((25 * 3600 + 2 * 60 + 3) * 10 ** 9
                           + 123456789) == "01.01:02:03.123456"
    assert format_duration(0) == "00.00:00:00.000000"


def test_http_server_request():
    envs = span_to_envelopes(row(2, {
        "http.method": "GET", "http.route": "api/x",
        "http.scheme": "https", "http.host": "h.com",
        "http.target": "/t", "http.status_code": 404,
        "enduser.id": "u1"}, status=2, msg="bad"))
    e = json.loads(envs[0])
    assert e["name"] == "Microsoft.ApplicationInsights.Request"
    bd = e["data"]["baseData"]
    assert bd["name"] == "GET /api/x"        # route slash-prefixed
    assert (bd["responseCode"], bd["success"]) == ("404", False)
    assert bd["url"] == "https://h.com/t"
    assert e["tags"]["ai.operation.name"] == "GET /api/x"
    assert e["tags"]["ai.user.id"] == "u1"
    assert e["tags"]["ai.cloud.role"] == "ns.svc"
    assert e["tags"]["ai.cloud.roleInstance"] == "i1"
    p = bd["properties"]
    assert p["otel.status_code"] == "STATUS_CODE_ERROR"
    assert p["otel.status_description"] == "bad"
    assert p["instrumentation_library_name"] == "lib"
    # server url fallbacks: server_name + port combo
    envs = span_to_envelopes(row(2, {
        "http.method": "GET", "http.scheme": "http",
        "http.server_name": "sn", "net.host.port": 8080,
        "http.target": "t"}))
    assert json.loads(envs[0])["data"]["baseData"]["url"] == \
        "http://sn:8080/t"


def test_dependency_types():
    # db client
    bd = json.loads(span_to_envelopes(row(3, {
        "db.system": "mysql", "db.statement": "SELECT 1",
        "net.peer.name": "db", "net.peer.port": 3306}))[0]
    )["data"]["baseData"]
    assert (bd["type"], bd["data"], bd["target"]) == \
        ("mysql", "SELECT 1", "db:3306")
    # db falls back to operation
    bd = json.loads(span_to_envelopes(row(3, {
        "db.system": "redis", "db.operation": "GET"}))[0]
    )["data"]["baseData"]
    assert bd["data"] == "GET"
    # rpc client: grpc code, type = system, data = name
    bd = json.loads(span_to_envelopes(row(3, {
        "rpc.system": "grpc", "rpc.grpc.status_code": 5,
        "net.peer.ip": "1.2.3.4", "net.peer.port": 50051},
        name="Svc/M"))[0])["data"]["baseData"]
    assert (bd["resultCode"], bd["type"], bd["data"],
            bd["target"]) == ("5", "grpc", "Svc/M", "1.2.3.4:50051")
    # messaging producer
    bd = json.loads(span_to_envelopes(row(4, {
        "messaging.system": "kafka", "messaging.url": "k://t"}))[0]
    )["data"]["baseData"]
    assert (bd["type"], bd["data"], bd["target"]) == \
        ("kafka", "k://t", "k://t")
    # internal forces InProc even when classified
    bd = json.loads(span_to_envelopes(row(1, {
        "http.method": "GET", "http.url": "http://x/y"}))[0]
    )["data"]["baseData"]
    assert bd["type"] == "InProc"
    assert (bd["data"], bd["target"]) == ("http://x/y", "x")
    # faas unsupported
    with pytest.raises(ValueError):
        span_to_envelopes(row(2, {"faas.trigger": "http"}))


def test_span_event_envelopes():
    events = json.dumps([
        {"name": "exception", "timeUnixNano": 1681873445100000000,
         "attributes": {"exception.type": "E",
                        "exception.message": "m",
                        "exception.stacktrace": "st"}},
        {"name": "note", "timeUnixNano": 0, "attributes": {"k": "v"}}])
    envs = span_to_envelopes(row(2, {}, events=events))
    assert len(envs) == 2                  # note skipped by default
    exc = json.loads(envs[1])
    assert exc["data"]["baseType"] == "ExceptionData"
    assert exc["data"]["baseData"]["exceptions"][0] == {
        "typeName": "E", "message": "m", "hasFullStack": True,
        "stack": "st"}
    assert exc["tags"]["ai.operation.parentId"] == "cd" * 8
    envs = span_to_envelopes(row(2, {}, events=events),
                             span_events_enabled=True)
    assert len(envs) == 3
    msg = json.loads(envs[2])
    assert msg["data"]["baseData"]["message"] == "note"
    assert msg["data"]["baseData"]["properties"]["k"] == "v"


def test_links_property():
    links = json.dumps([{"traceId": "aa" * 16, "spanId": "bb" * 8}])
    bd = json.loads(span_to_envelopes(row(2, {}, links=links))[0]
                    )["data"]["baseData"]
    assert json.loads(bd["properties"]["_MS.links"]) == [
        {"operation_Id": "aa" * 16, "id": "bb" * 8}]


def test_log_severity_bands_and_modes():
    assert to_ai_severity_level(1) == 0 and to_ai_severity_level(8) == 0
    assert to_ai_severity_level(9) == 1
    assert to_ai_severity_level(13) == 2
    assert to_ai_severity_level(17) == 3
    assert to_ai_severity_level(24) == 4
    assert to_ai_severity_level(0) == 1      # Information fallback
    lrow = {"trace_id": "ab" * 16, "span_id": "cd" * 8, "body": "hello",
            "time_unix_nano": 1681873445000000000,
            "severity_number": 17, "severity_text": "ERROR",
            "attributes": json.dumps({"k": "v"}),
            "resource_attributes": json.dumps({"service.name": "s"}),
            "scope_name": "lib", "scope_version": None}
    e = json.loads(log_to_envelope(lrow))
    assert e["data"]["baseType"] == "MessageData"
    assert e["data"]["baseData"]["severityLevel"] == 3
    assert e["data"]["baseData"]["properties"]["k"] == "v"
    e = json.loads(log_to_envelope(
        {**lrow, "attributes": json.dumps({"exception.type": "E"})},
        exception_events_enabled=True))
    assert e["data"]["baseType"] == "ExceptionData"
    assert e["data"]["baseData"]["problemId"] == "ERROR"
    e = json.loads(log_to_envelope(
        {**lrow, "attributes": json.dumps(
            {"microsoft.custom_event.name": "ce"})},
        custom_events_enabled=True))
    assert e["data"]["baseType"] == "EventData"
    assert e["data"]["baseData"]["name"] == "ce"
    # custom events disabled → plain message
    e = json.loads(log_to_envelope(
        {**lrow, "attributes": json.dumps(
            {"microsoft.custom_event.name": "ce"})}))
    assert e["data"]["baseType"] == "MessageData"


def test_stages_dataset(ray_session):
    import ray

    r = row(2, {"http.method": "GET", "http.url": "http://x/y"})
    t = pa.table({k: pa.array([v], pa.int64() if isinstance(v, int)
                              else pa.string()) for k, v in r.items()})
    out = spans_to_azuremonitor(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    assert json.loads(out["envelope_json"].iloc[0])["data"][
        "baseType"] == "RequestData"
    lt = pa.table({
        "trace_id": pa.array(["ab" * 16], pa.string()),
        "span_id": pa.array(["cd" * 8], pa.string()),
        "body": pa.array(["b"], pa.string()),
        "time_unix_nano": pa.array([1], pa.int64()),
        "severity_number": pa.array([9], pa.int64()),
        "severity_text": pa.array(["INFO"], pa.string()),
        "attributes": pa.array(["{}"], pa.string()),
        "resource_attributes": pa.array(["{}"], pa.string()),
        "scope_name": pa.array([None], pa.string()),
        "scope_version": pa.array([None], pa.string())})
    lout = logs_to_azuremonitor(ray.data.from_arrow(lt)).to_pandas()
    assert json.loads(lout["envelope_json"].iloc[0])["data"][
        "baseData"]["severityLevel"] == 1
