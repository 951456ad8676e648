"""gitlabreceiver decode parity (traces_event_handling.go, model.go)."""

import hashlib
import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.gitlabrx import (
    gitlab_pipeline_to_rows,
    gl_job_span_id,
    gl_pipeline_span_id,
    gl_stage_span_id,
    gl_trace_id,
    parse_gitlab_events,
    parse_gitlab_time,
)

FIN = "2025-04-01 18:35:00 UTC"


def _event(**oa_over):
    oa = {"id": 55, "name": "", "created_at": "2025-04-01 18:30:00 UTC",
          "finished_at": FIN}
    oa.update(oa_over)
    return {
        "object_attributes": oa,
        "commit": {"title": "fix: thing"},
        "project": {"path_with_namespace": "org/repo"},
        "builds": [
            {"id": 1, "stage": "build", "name": "compile",
             "status": "success",
             "started_at": "2025-04-01 18:30:10 UTC",
             "finished_at": "2025-04-01 18:31:00 UTC"},
            {"id": 2, "stage": "build", "name": "lint",
             "status": "failed",
             "started_at": "2025-04-01 18:30:05 UTC",
             "finished_at": "2025-04-01 18:31:30 UTC"},
            {"id": 3, "stage": "test", "name": "unit",
             "status": "success",
             "started_at": "2025-04-01 18:32:00 UTC",
             "finished_at": "2025-04-01 18:33:00 UTC"},
            {"id": 4, "stage": "test", "name": "pending",
             "status": "created",
             "started_at": "2025-04-01 18:32:30 UTC",
             "finished_at": ""}]}


def test_time_formats():
    # webhook form and test-event RFC3339 form parse identically
    assert parse_gitlab_time("2025-04-01 18:31:49 UTC") == \
        parse_gitlab_time("2025-04-01T18:31:49Z")
    for bad in ("", "null", "not a time"):
        with pytest.raises(ValueError):
            parse_gitlab_time(bad)


def test_deterministic_ids():
    assert gl_trace_id(55, FIN) == \
        hashlib.sha256(f"55t{FIN}".encode()).hexdigest()[:32]
    assert gl_pipeline_span_id(55, FIN) == \
        hashlib.sha256(f"55{FIN}".encode()).hexdigest()[16:32]
    assert gl_stage_span_id(55, "build", FIN) == \
        hashlib.sha256(f"55build{FIN}".encode()).hexdigest()[16:32]
    assert gl_job_span_id(9, FIN) == \
        hashlib.sha256(f"9{FIN}".encode()).hexdigest()[16:32]
    with pytest.raises(ValueError):
        gl_stage_span_id(55, "", FIN)       # empty stage name errors


def test_pipeline_tree():
    rows = gitlab_pipeline_to_rows(_event())
    # pipeline + 2 derived stages + 3 finished jobs (unfinished skipped)
    assert len(rows) == 6
    p, sb, st, j1, j2, j3 = rows
    assert p["span_name"] == "fix: thing"      # commit-title fallback
    assert p["parent_span_id"] is None
    assert sb["parent_span_id"] == p["span_id"]
    # stage start = earliest job start, end = latest job finish
    assert sb["span_id"] == gl_stage_span_id(
        55, "build", "2025-04-01 18:30:05 UTC")
    assert sb["end_time_unix_nano"] == \
        parse_gitlab_time("2025-04-01 18:31:30 UTC")
    # test stage start = min(18:32:00, 18:32:30)
    assert st["span_id"] == gl_stage_span_id(
        55, "test", "2025-04-01 18:32:00 UTC")
    assert j1["parent_span_id"] == sb["span_id"]
    assert j3["parent_span_id"] == st["span_id"]
    assert json.loads(p["resource_attributes"]) == {
        "service.name": "org/repo"}
    # explicit pipeline name beats the commit title
    rows = gitlab_pipeline_to_rows(_event(name="nightly"))
    assert rows[0]["span_name"] == "nightly"


def test_whole_event_errors():
    # a stage whose only job never finished → empty stage finish time
    # → the whole event errors (the reference's handler returns error)
    ev = _event()
    ev["builds"] = [ev["builds"][3]]
    with pytest.raises(ValueError):
        gitlab_pipeline_to_rows(ev)
    # unparseable pipeline finish time → error
    with pytest.raises(ValueError):
        gitlab_pipeline_to_rows(_event(finished_at="null"))


def test_parse_gitlab_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "event_json": pa.array([json.dumps(_event()), "{bad"],
                               pa.string())}))
    out = parse_gitlab_events(ds, "event_json").to_pandas()
    assert len(out) == 6
    kept = parse_gitlab_events(ds, "event_json",
                               on_error="keep").to_pandas()
    assert kept["error"].notna().sum() == 1
