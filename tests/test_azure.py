"""azurelogs translator parity (pkg/translator/azurelogs)."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.azure import (
    as_severity,
    azure_record_to_row,
    extract_raw_attributes,
    front_door_access_log_attrs,
    parse_azure_logs,
    parse_azure_time,
)


# ---------------------------------------------------------------------------
# severity + time


@pytest.mark.parametrize("level,num,text", [
    ("Informational", 9, "Informational"), ("Warning", 13, "Warning"),
    ("Error", 17, "Error"), ("Critical", 21, "Critical"),
    (2.0, 2, "2"), ("7", 7, "7"), ("bogus", 0, "bogus"),
    ("-3", 0, "-3"),
])
def test_severity(level, num, text):
    assert as_severity(level) == (num, text)


def test_time_iso8601_variants():
    assert parse_azure_time("2023-11-14T22:13:20Z") == \
        1700000000 * 10**9
    assert parse_azure_time("2023-11-14T22:13:20.123Z") == \
        1700000000 * 10**9 + 123_000_000
    assert parse_azure_time("2023-11-14T22:13:20+00:00") == \
        1700000000 * 10**9
    assert parse_azure_time("not a time") is None


def test_time_custom_format_first():
    assert parse_azure_time("14/11/2023 22:13:20",
                            ("%d/%m/%Y %H:%M:%S",)) == \
        1700000000 * 10**9


# ---------------------------------------------------------------------------
# FrontDoorAccessLog structured handler


BASE_PROPS = {"requestBytes": "10", "responseBytes": "20",
              "clientPort": "1", "httpStatusCode": "200",
              "timeToFirstByte": "0.154", "timeTaken": "1.5"}


def test_frontdoor_numbers_and_times():
    attrs = front_door_access_log_attrs(dict(BASE_PROPS))
    assert attrs["http.request.size"] == 10
    assert attrs["azure.time_to_first_byte"] == 154   # 0.154×1e3 trunc
    assert attrs["duration"] == 1500


def test_frontdoor_bad_number_is_handler_error():
    props = {**BASE_PROPS, "requestBytes": "xx"}
    assert isinstance(front_door_access_log_attrs(props), str)


def test_frontdoor_uri_decomposition():
    props = {**BASE_PROPS,
             "requestUri": "https://h:8080/a/b?q=1#frag"}
    attrs = front_door_access_log_attrs(props)
    assert attrs["url.original"].startswith("https://")
    assert attrs["url.port"] == 8080
    assert attrs["url.scheme"] == "https"
    assert attrs["url.path"] == "/a/b"
    assert attrs["url.query"] == "q=1"
    assert attrs["url.fragment"] == "frag"


def test_frontdoor_security_protocol():
    attrs = front_door_access_log_attrs(
        {**BASE_PROPS, "securityProtocol": "TLS 1.3"})
    assert attrs["tls.protocol.name"] == "TLS"
    assert attrs["tls.protocol.version"] == "1.3"
    assert isinstance(front_door_access_log_attrs(
        {**BASE_PROPS, "securityProtocol": "TLSonly"}), str)
    assert isinstance(front_door_access_log_attrs(
        {**BASE_PROPS, "securityProtocol": "TLS 1.3 extra"}), str)


def test_frontdoor_destination_rules():
    # endpoint only
    a = front_door_access_log_attrs({**BASE_PROPS, "endpoint": "e:443"})
    assert a["destination.address"] == "e" and a["destination.port"] == 443
    # backend + different endpoint → endpoint goes to network.peer
    a = front_door_access_log_attrs(
        {**BASE_PROPS, "backendHostname": "be:80", "endpoint": "ep"})
    assert a["destination.address"] == "be"
    assert a["destination.port"] == 80
    assert a["network.peer.address"] == "ep"
    # no port → whole value is the address
    a = front_door_access_log_attrs(
        {**BASE_PROPS, "endpoint": "hostonly"})
    assert a["destination.address"] == "hostonly"
    assert "destination.port" not in a


def test_frontdoor_error_info_rules():
    a = front_door_access_log_attrs(
        {**BASE_PROPS, "errorInfo": "NoError"})
    assert "exception.type" not in a
    a = front_door_access_log_attrs(
        {**BASE_PROPS, "ErrorInfo": "OriginTimeout"})
    assert a["exception.type"] == "OriginTimeout"
    assert isinstance(front_door_access_log_attrs(
        {**BASE_PROPS, "errorInfo": "A", "ErrorInfo": "B"}), str)


def test_frontdoor_na_ignored():
    a = front_door_access_log_attrs(
        {**BASE_PROPS, "userAgent": "N/A", "pop": "LAX",
         "originIP": "10.0.0.1:9000"})
    assert "user_agent.original" not in a
    assert a["azure.pop"] == "LAX"
    assert a["server.address"] == "10.0.0.1"
    assert a["server.port"] == 9000


# ---------------------------------------------------------------------------
# raw-body path


def test_raw_attributes_default_handler():
    body = extract_raw_attributes({
        "category": "X", "operationName": "op",
        "durationMs": 42.0, "resultType": "OK", "location": "eu",
        "callerIpAddress": "1.1.1.1", "tenantId": "t",
        "properties": {"a": 1.0, "b": "s"}})
    assert body["duration"] == 42
    assert body["properties"] == {"a": 1.0, "b": "s"}
    assert body["cloud.region"] == "eu"
    assert body["network.peer.address"] == "1.1.1.1"


def test_raw_attributes_fractional_duration_dropped():
    body = extract_raw_attributes({"category": "X",
                                   "operationName": "",
                                   "durationMs": 42.5})
    assert "duration" not in body


def test_raw_attributes_http_logs_handler():
    body = extract_raw_attributes({
        "category": "AppServiceHTTPLogs", "operationName": "",
        "properties": {"CsMethod": "GET", "ScStatus": "200",
                       "TimeTaken": 250.0, "Protocol": "HTTP/1.1",
                       "Other": "x"}})
    assert body["http.request.method"] == "GET"
    assert body["http.response.status_code"] == 200
    assert body["http.server.request.duration"] == 0.25
    assert body["network.protocol.name"] == "http"
    assert body["network.protocol.version"] == "1.1"
    assert body["properties"] == {"Other": "x"}


def test_raw_attributes_non_object_properties():
    body = extract_raw_attributes({"category": "X",
                                   "operationName": "",
                                   "properties": "plain text"})
    assert body["properties"] == "plain text"


# ---------------------------------------------------------------------------
# record + stage


def test_record_skipped_on_bad_time():
    assert azure_record_to_row({"time": "junk", "category": "X"}) is None
    assert azure_record_to_row({"category": "X"}) is None


def test_handler_error_keeps_record_without_attrs():
    row = azure_record_to_row({
        "time": "2023-11-14T22:13:20Z",
        "category": "FrontDoorAccessLog",
        "properties": {"requestBytes": "bad"}})
    assert row is not None
    assert json.loads(row["attributes"]) == {}
    assert row["body"] is None


def test_stage(ray_session):
    import ray

    doc = json.dumps({"records": [
        {"time": "2023-11-14T22:13:20Z", "resourceId": "/r/1",
         "category": "C", "operationName": "op"},
        {"time": "junk", "category": "C"}]})
    ds = ray.data.from_arrow(pa.table({
        "export_json": pa.array([doc, "not json"], pa.string()),
        "idx": pa.array([0, 1], pa.int64())}))
    out = parse_azure_logs(ds, "export_json").to_pandas()
    assert list(out["idx"]) == [0]
    assert out.iloc[0]["resource_id"] == "/r/1"
