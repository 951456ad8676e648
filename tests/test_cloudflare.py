"""cloudflarereceiver decode parity (logs.go)."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.cloudflare import (
    cloudflare_payload_to_rows,
    parse_cloudflare_logs,
    severity_from_status,
)


def test_severity_bands():
    assert severity_from_status(200) == (9, "Info")
    assert severity_from_status(302) == (10, "Info2")
    assert severity_from_status(404) == (13, "Warn")
    assert severity_from_status(503) == (17, "Error")
    assert severity_from_status(700) == (0, None)


def test_zone_grouping_and_flatten():
    payload = json.dumps({
        "ZoneName": "z", "EdgeStartTimestamp": "2023-04-19T03:04:05Z",
        "EdgeResponseStatus": 200,
        "Meta": {"a": 1, "b": {"c": "x"}}, "arr": [1]})
    rows = cloudflare_payload_to_rows(payload)
    r = rows[0]
    assert json.loads(r["resource_attributes"]) == {
        "cloudflare.zone": "z"}
    attrs = json.loads(r["attributes"])
    assert attrs["Meta.a"] == 1 and attrs["Meta.b.c"] == "x"
    assert "arr" not in attrs              # arrays unsupported
    assert json.loads(r["body"])["arr"] == [1]   # but kept in body
    assert r["time_unix_nano"] == 1681873445000000000


def test_bad_timestamp_record_stays_empty():
    # the Go `continue` fires the record loop AFTER the record was
    # appended: it ships with only the observed timestamp
    payload = json.dumps({"EdgeStartTimestamp": "junk",
                          "EdgeResponseStatus": 500, "k": "v"})
    rows = cloudflare_payload_to_rows(payload)
    assert len(rows) == 1
    r = rows[0]
    assert (r["time_unix_nano"], r["severity_number"],
            r["attributes"], r["body"]) == (0, 0, "{}", None)
    # missing timestamp field: processing continues normally
    rows = cloudflare_payload_to_rows(
        json.dumps({"EdgeResponseStatus": 500, "k": "v"}))
    assert rows[0]["severity_number"] == 17
    assert json.loads(rows[0]["attributes"])["k"] == "v"


def test_timestamp_formats_and_attr_mapping():
    rows = cloudflare_payload_to_rows(
        json.dumps({"ts": 1700000000, "k": "v"}),
        timestamp_field="ts", timestamp_format="unix")
    assert rows[0]["time_unix_nano"] == 1700000000 * 10 ** 9
    rows = cloudflare_payload_to_rows(
        json.dumps({"ts": "1700000000000000001"}),
        timestamp_field="ts", timestamp_format="unixnano")
    assert rows[0]["time_unix_nano"] == 1700000000000000001
    # attributes mapping: only mapped fields, renamed
    rows = cloudflare_payload_to_rows(
        json.dumps({"ClientIP": "1.1.1.1", "other": "x"}),
        attributes={"ClientIP": "client.address"})
    assert json.loads(rows[0]["attributes"]) == {
        "client.address": "1.1.1.1"}


def test_bad_line_fails_payload():
    with pytest.raises(ValueError):
        cloudflare_payload_to_rows('{"a": 1}\n{not json')
    # blank lines skipped
    rows = cloudflare_payload_to_rows('\n{"a": 1}\n\n')
    assert len(rows) == 1


def test_parse_cloudflare_dataset(ray_session):
    import ray

    good = json.dumps({"ZoneName": "z", "EdgeResponseStatus": 200})
    ds = ray.data.from_arrow(pa.table({
        "payload": pa.array([good, "{bad"], pa.string())}))
    out = parse_cloudflare_logs(ds, "payload").to_pandas()
    assert len(out) == 1
    kept = parse_cloudflare_logs(ds, "payload",
                                 on_error="keep").to_pandas()
    assert len(kept) == 2 and kept["error"].notna().sum() == 1
