"""pkg/translator/azure + azureeventhubreceiver parity
(stages/azure.py)."""

import json

import pytest

from opentelemetry_collector_contrib_ray.stages.azureeventhub import (
    azure_log_records, azure_metric_records, azure_timestamp,
    azure_trace_records)


def test_as_timestamp_vectors():
    # TestAsTimestamp
    assert azure_timestamp("2022-11-11T04:48:27.6767145Z") \
        == 1668142107_676_714_500  # 7-digit fraction, ns precision
    assert azure_timestamp(
        "11/20/2024 13:57:18", ["01/02/2006 15:04:05"]) is not None
    # format set but the iso fallback succeeds
    assert azure_timestamp(
        "2022-11-11T04:48:27.6767145Z",
        ["01/02/2006 15:04:05"]) is not None
    # all formats fail, fallback fails
    assert azure_timestamp(
        "11/20/2024 13:57:18", ["2006-01-02 15:04:05"]) is None
    assert azure_timestamp("invalid-time") is None
    # the "bad time" fixture form: +00:00 offset iso8601
    assert azure_timestamp("2021-10-14T22:17:11+00:00") \
        == azure_timestamp("2021-10-14T22:17:11Z")


def test_log_records_maximum():
    body = json.dumps({"records": [
        {"time": "2022-11-11T04:48:27.6767145Z",
         "resourceId": "/RESOURCE_ID-1", "tenantId": "/TENANT_ID",
         "operationName": "SecretGet", "operationVersion": "7.0",
         "category": "AuditEvent", "resultType": "Success",
         "resultSignature": "Signature",
         "resultDescription": "Description", "durationMs": "1234",
         "callerIpAddress": "127.0.0.1",
         "correlationId": "607964b6", "Level": "Warning",
         "location": "ukso",
         "identity": {"claim": {"oid": "607964b6"}},
         "properties": {"string": "string", "int": 429,
                        "float": 3.14, "bool": False}},
    ]})
    rows = azure_log_records(body, version="1.2.3")
    assert len(rows) == 1
    r = rows[0]
    assert r["resource_id"] == "/RESOURCE_ID-1"
    assert r["scope_version"] == "1.2.3"
    assert r["severity_number"] == 13       # Warning
    assert r["severity_text"] == "Warning"  # raw token
    a = json.loads(r["attributes"])
    assert a["azure.category"] == "AuditEvent"
    assert a["azure.duration"] == 1234      # string token ParseInts
    assert a["azure.tenant.id"] == "/TENANT_ID"
    assert a["azure.identity"] == {"claim": {"oid": "607964b6"}}
    assert a["azure.properties"]["float"] == 3.14
    assert a["cloud.region"] == "ukso"
    assert a["cloud.provider"] == "azure"
    assert a["net.sock.peer.addr"] == "127.0.0.1"


def test_log_records_quirks():
    # bad duration dropped; empty setIf strings dropped; numeric
    # Level becomes (4, "4"); missing timestamp skips the record;
    # timeStamp fallback used when time absent
    body = json.dumps({"records": [
        {"time": "2023-10-26T14:22:43.3416357Z", "Level": 4,
         "operationName": "op", "category": "c",
         "durationMs": "invalid", "resultType": "",
         "resourceId": "/R"},
        {"operationName": "no-ts", "category": "c",
         "resourceId": "/R"},
        {"timeStamp": "2023-10-26T14:22:43Z", "operationName": "o2",
         "category": "c", "resourceId": "/R"},
    ]})
    rows = azure_log_records(body)
    assert len(rows) == 2
    assert rows[0]["severity_number"] == 4
    assert rows[0]["severity_text"] == "4"
    a = json.loads(rows[0]["attributes"])
    assert "azure.duration" not in a
    assert "azure.result.type" not in a   # setIf drops empty
    assert rows[1]["severity_number"] == 0
    assert rows[1]["severity_text"] == ""

    with pytest.raises(ValueError):
        azure_log_records("{not json")


def test_trace_records():
    rec = {"time": "2024-01-01T00:00:00Z",
           "resourceId": "/RES",
           "AppRoleName": "frontend", "AppRoleInstance": "i-1",
           "Type": "AppRequests",
           "OperationId": "4bf92f3577b34da6a3ce929d0e0e4736",
           "Id": "00f067aa0ba902b7", "ParentId": "ab",
           "Name": "GET /", "Url": "https://ex.com/p?q=1",
           "ClientIP": "1.2.3.4", "ResultCode": "200",
           "DurationMs": 1.5,
           "Properties": {"HTTP Method": "GET", "k": "v"}}
    rows = azure_trace_records(json.dumps({"records": [rec]}),
                               version="9")
    assert len(rows) == 1
    r = rows[0]
    assert r["trace_id"] == "4bf92f3577b34da6a3ce929d0e0e4736"
    assert r["span_id"] == "00f067aa0ba902b7"
    # short hex "ab" right-pads with zeros into the 8-byte array
    assert r["parent_span_id"] == "ab00000000000000"
    assert r["span_kind"] == 2
    assert r["end_time_unix_nano"] - r["start_time_unix_nano"] \
        == 1_500_000
    a = json.loads(r["attributes"])
    assert a["http.host"] == "ex.com" and a["http.path"] == "/p"
    assert a["http.scheme"] == "https"
    assert a["http.method"] == "GET"
    assert a["k"] == "v" and "HTTP Method" not in a
    res = json.loads(r["resource_attributes"])
    assert res["service.name"] == "frontend"
    assert res["azure.resource.id"] == "/RES"
    assert res["telemetry.sdk.version"] == "9"
    assert res["telemetry.sdk.language"] == "go"

    # invalid hex id STOPS the payload keeping prior spans (the
    # reference returns the nil decode error there)
    bad = dict(rec, OperationId="zz")
    rows = azure_trace_records(
        json.dumps({"records": [rec, bad, rec]}))
    assert len(rows) == 1


def test_metric_records():
    body = json.dumps({"records": [
        {"time": "2024-01-01T00:01:00Z", "resourceId": "/R",
         "metricName": "Incoming Requests", "timeGrain": "PT1M",
         "total": 10.0, "count": 2.0, "minimum": 1.0,
         "maximum": 9.0, "average": 5.0},
        {"time": "2024-01-01T00:01:00Z", "resourceId": "/R",
         "metricName": "X", "timeGrain": "PT5M", "total": 1.0},
    ]})
    rows = azure_metric_records(body, version="2")
    # PT5M skipped; five gauges for the PT1M record
    assert [r["name"] for r in rows] == [
        "incoming_requests_total", "incoming_requests_count",
        "incoming_requests_minimum", "incoming_requests_maximum",
        "incoming_requests_average"]
    assert [r["value_double"] for r in rows] == [10, 2, 1, 9, 5]
    assert all(r["time_unix_nano"] - r["start_time_unix_nano"]
               == 60_000_000_000 for r in rows)
    res = json.loads(rows[0]["resource_attributes"])
    assert res["azure.resource.id"] == "/R"
    assert "azureeventhubreceiver" in res["telemetry.sdk.name"]
