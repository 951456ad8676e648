"""Cross-family interop: every span DECODER emits the shared flat span
schema (zipkin._COLS), so every span EXPORTER must consume any
decoder's output directly. This pins the interchange contract the
module docstrings promise."""

import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.alertmanager import (
    span_events_to_alerts,
)
from opentelemetry_collector_contrib_ray.stages.azuremonitor import (
    span_to_envelopes,
)
from opentelemetry_collector_contrib_ray.stages.elasticsearch import (
    encode_span_doc,
)
from opentelemetry_collector_contrib_ray.stages.githubrx import (
    github_event_to_rows,
)
from opentelemetry_collector_contrib_ray.stages.gitlabrx import (
    gitlab_pipeline_to_rows,
)
from opentelemetry_collector_contrib_ray.stages.opencensus import (
    flat_span_to_oc,
    oc_span_to_flat,
)
from opentelemetry_collector_contrib_ray.stages.xray import (
    make_segments_from_span,
)
from opentelemetry_collector_contrib_ray.stages.zipkin import _COLS

SPAN_COLS = {name for name, _ in _COLS}


def _github_rows():
    return github_event_to_rows({
        "workflow_job": {
            "id": 7, "run_id": 123, "run_attempt": 1, "name": "build",
            "created_at": "2023-04-19T03:04:00Z",
            "started_at": "2023-04-19T03:04:10Z",
            "completed_at": "2023-04-19T03:05:00Z",
            "conclusion": "success", "head_branch": "main",
            "head_sha": "abc", "html_url": "u",
            "steps": [{"name": "checkout", "number": 1,
                       "status": "completed", "conclusion": "success",
                       "started_at": "2023-04-19T03:04:10Z",
                       "completed_at": "2023-04-19T03:04:20Z"}]},
        "repository": {"name": "r"}, "sender": {"login": "x"}},
        "workflow_job")


def _gitlab_rows():
    return gitlab_pipeline_to_rows({
        "object_attributes": {"id": 55, "name": "p",
                              "created_at": "2025-04-01 18:30:00 UTC",
                              "finished_at":
                                  "2025-04-01 18:35:00 UTC"},
        "commit": {"title": "t"},
        "project": {"path_with_namespace": "o/r"},
        "builds": [{"id": 1, "stage": "s", "name": "j",
                    "status": "success",
                    "started_at": "2025-04-01 18:30:10 UTC",
                    "finished_at": "2025-04-01 18:31:00 UTC"}]})


@pytest.mark.parametrize("rows_fn", [_github_rows, _gitlab_rows])
def test_decoder_rows_carry_full_span_schema(rows_fn):
    for row in rows_fn():
        assert SPAN_COLS <= set(row), SPAN_COLS - set(row)
        json.loads(row["attributes"])
        json.loads(row["resource_attributes"])
        json.loads(row["events"])
        json.loads(row["links"])


@pytest.mark.parametrize("rows_fn", [_github_rows, _gitlab_rows])
def test_cicd_rows_feed_every_span_exporter(rows_fn):
    for row in rows_fn():
        # X-Ray segments (amazon trace id derives from the hex id)
        segs = make_segments_from_span(row)
        assert segs and segs[0]["id"] == row["span_id"]
        # AppInsights envelopes
        envs = span_to_envelopes(row)
        env = json.loads(envs[0])
        assert env["data"]["baseData"]["id"] == row["span_id"]
        # elasticsearch docs, both mapping families
        for mode in ("ecs", "none"):
            doc = json.loads(encode_span_doc(mode, row, ""))
            assert doc
        # opencensus wire and back: lossless over this surface
        back = oc_span_to_flat(flat_span_to_oc(row),
                               row["resource_attributes"])
        for k in ("trace_id", "span_id", "span_name",
                  "start_time_unix_nano", "end_time_unix_nano"):
            assert back[k] == row[k], k
        # alertmanager alerts (one per span event)
        alerts = span_events_to_alerts(
            row, severity_attribute="severity",
            default_severity="info", event_labels=(),
            generator_url="")
        assert len(alerts) == len(json.loads(row["events"]))
