"""datadogreceiver series/service-check decode parity
(receiver/datadogreceiver/internal/translator)."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.datadog import (
    dd_series_rows,
    dd_service_check_rows,
    dd_tags_to_attributes,
    parse_datadog_series,
)


def test_tag_translation_table():
    res, dp = dd_tags_to_attributes(
        ["env:prod", "service:web", "version:1.2", "pod_name:p1",
         "ENV:shouty", "http.status_code:500"], "h1")
    assert res["host.name"] == "h1"
    assert res["deployment.environment.name"] == "shouty"  # last wins
    assert res["service.name"] == "web"
    assert res["service.version"] == "1.2"
    assert res["k8s.pod.name"] == "p1"
    assert res["http.response.status_code"] == "500"
    assert dp == {}


def test_tag_slices_and_unnamed():
    res, dp = dd_tags_to_attributes(
        ["image_tag:v9", "http.request.headers.x-req-id:abc",
         "http.response.headers.etag:e1", "custom:v", "bare", ""],
        "")
    assert res["container.image.tags"] == ["v9"]
    assert res["http.request.header.x-req-id"] == ["abc"]
    assert res["http.response.header.etag"] == ["e1"]
    # Go keeps the empty tag as an empty-key dp attribute
    # (tagsToAttributes has no empty guard after the "" cut)
    assert dp == {"custom": "v", "unnamed_bare": "bare", "": ""}
    assert "host.name" not in res
    # tag value keeps colons after the first cut
    _, dp = dd_tags_to_attributes(["url_path:/a:b:c"], "")
    assert dp == {"url_path": "/a:b:c"}


def test_series_typing_and_rate_interval():
    doc = {"series": [
        {"metric": "c", "type": "count",
         "points": [[1700000000, 3]], "tags": [], "host": "h"},
        {"metric": "r", "type": "rate", "interval": 10,
         "points": [[1700000000, 1.5]], "tags": []},
        {"metric": "r2", "type": "rate",
         "points": [[1700000000, 1.5]], "tags": []},
        {"metric": "g", "type": "gauge",
         "points": [[1700000000, 2.5]], "tags": []},
        {"metric": "skip", "type": "distribution",
         "points": [[1700000000, 1]]},
        {"metric": "unset", "points": [[1700000000, 1]]},
    ]}
    rows = dd_series_rows(doc)
    by_name = {r["metric_name"]: r for r in rows}
    assert set(by_name) == {"c", "r", "r2", "g"}
    assert by_name["c"]["metric_type"] == "sum"
    assert by_name["c"]["aggregation_temporality"] == 1
    assert by_name["c"]["is_monotonic"] is False
    assert by_name["r"]["value_double"] == 15.0   # × interval
    assert by_name["r2"]["value_double"] == 1.5   # interval unset
    assert by_name["g"]["metric_type"] == "gauge"
    assert by_name["c"]["time_unix_nano"] == 1700000000 * 10 ** 9


def test_series_point_skips_and_stream_chaining():
    doc = {"series": [{"metric": "m", "type": "gauge",
                       "points": [[1, 1.0], [2], [None, 3.0],
                                  [3, None], [4, 4.0]],
                       "tags": []}]}
    rows = dd_series_rows(doc)
    assert [(r["time_unix_nano"] // 10 ** 9, r["value_double"])
            for r in rows] == [(1, 1.0), (4, 4.0)]
    # second valid point of the stream chains start = previous ts
    assert rows[0]["start_time_unix_nano"] == 0
    assert rows[1]["start_time_unix_nano"] == 1 * 10 ** 9
    # a DIFFERENT stream (other dp attrs) does not chain
    doc = {"series": [
        {"metric": "m", "type": "gauge", "points": [[1, 1.0]],
         "tags": ["k:a"]},
        {"metric": "m", "type": "gauge", "points": [[2, 2.0]],
         "tags": ["k:b"]}]}
    rows = dd_series_rows(doc)
    assert all(r["start_time_unix_nano"] == 0 for r in rows)


def test_service_checks():
    rows = dd_service_check_rows([
        {"check": "db.ok", "host_name": "h", "status": 2,
         "timestamp": 1700000000, "tags": ["env:prod"]},
        {"check": "noop", "status": 0}])
    assert rows[0]["value_int"] == 2
    assert rows[0]["metric_type"] == "gauge"
    assert rows[0]["time_unix_nano"] == 1700000000 * 10 ** 9
    assert json.loads(rows[0]["resource_attributes"]) == {
        "deployment.environment.name": "prod", "host.name": "h"}
    assert rows[1]["value_int"] == 0 and rows[1]["time_unix_nano"] == 0


def test_parse_datadog_series_dataset(ray_session):
    import ray

    good = json.dumps({"series": [{"metric": "m", "type": "gauge",
                                   "points": [[1, 2.5]], "tags": []}]})
    ds = ray.data.from_arrow(pa.table({
        "dd_json": pa.array([good, "{bad"], pa.string())}))
    out = parse_datadog_series(ds, "dd_json").to_pandas()
    assert len(out) == 1 and out["value_double"].iloc[0] == 2.5
    kept = parse_datadog_series(ds, "dd_json",
                                on_error="keep").to_pandas()
    assert len(kept) == 2 and kept["error"].notna().sum() == 1
