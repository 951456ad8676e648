"""webhookeventreceiver decode parity (req_to_log.go, receiver.go)."""

import gzip
import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.webhookevent import (
    parse_webhook_events,
    split_json_objects,
    webhook_body_to_rows,
)


def test_split_json_objects():
    assert split_json_objects('{"a":1} {"b":2}\n[3] "s" 5') == \
        ['{"a":1}', '{"b":2}', '[3]', '"s"', '5']
    # invalid token stops the scan, earlier values kept
    assert split_json_objects('{"a":1} junk') == ['{"a":1}']
    # nothing decodes → original body
    assert split_json_objects("plain text") == ["plain text"]


def test_split_modes_and_metadata():
    rows = webhook_body_to_rows("l1\nl2",
                                query={"src": "gh", "empty": ""},
                                headers={"X-Sig": "abc", "Other": "x"},
                                split_logs_at_new_line=True,
                                include_headers_regex="^X-")
    assert [r["body"] for r in rows] == ["l1", "l2"]
    # empty query params dropped; only regex-matched headers kept
    assert json.loads(rows[0]["resource_attributes"]) == {"src": "gh"}
    assert json.loads(rows[0]["attributes"]) == {
        "header.X-Sig": ["abc"]}
    assert rows[0]["scope_name"] == "otlp/webhookevent"
    # default: one record per body
    assert len(webhook_body_to_rows("a\nb")) == 1


def test_gzip_and_errors():
    rows = webhook_body_to_rows(gzip.compress(b'{"a":1}{"b":2}'),
                                split_at_json_boundary=True)
    assert [r["body"] for r in rows] == ['{"a":1}', '{"b":2}']
    with pytest.raises(ValueError):
        webhook_body_to_rows("")                    # empty body 400s
    with pytest.raises(ValueError):
        webhook_body_to_rows("x", headers={},
                             required_header=("K", "v"))
    webhook_body_to_rows("x", headers={"K": "v"},
                         required_header=("K", "v"))


def test_parse_webhook_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "body_raw": pa.array(["hello", ""], pa.string()),
        "query": pa.array([json.dumps({"q": "1"}), None], pa.string()),
        "headers": pa.array([None, None], pa.string())}))
    out = parse_webhook_events(ds, "body_raw").to_pandas()
    assert len(out) == 1                  # empty body dropped
    assert out["body"].iloc[0] == "hello"
    assert json.loads(out["resource_attributes"].iloc[0]) == {"q": "1"}
