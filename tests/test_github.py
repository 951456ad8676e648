"""githubreceiver decode parity (trace_event_handling.go, model.go)."""

import hashlib
import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.githubrx import (
    github_event_to_rows,
    new_job_span_id,
    new_parent_span_id,
    new_step_span_id,
    new_trace_id,
    parse_github_events,
    to_snake_case,
    unique_step_names,
)


def test_deterministic_ids():
    assert new_trace_id(123, 1) == \
        hashlib.sha256(b"1231t").hexdigest()[:32]
    assert new_parent_span_id(123, 1) == \
        hashlib.sha256(b"1231s").hexdigest()[16:32]
    assert new_job_span_id(123, 1, "b") == \
        hashlib.sha256(b"1231b").hexdigest()[16:32]
    assert new_step_span_id(123, 1, "b", "s", 2) == \
        hashlib.sha256(b"1231bs2").hexdigest()[16:32]


def test_unique_steps_and_snake_case():
    assert unique_step_names(["a", "b", "a", "a"]) == \
        ["a", "b", "a-1", "a-2"]
    assert unique_step_names([]) == []
    assert to_snake_case("costCenter") == "cost_center"
    assert to_snake_case("My-Prop.x") == "my_prop_x"
    assert to_snake_case("a$b#c") == "a_dollar_b_hash_c"


def _run_event(attempt=1, conclusion="success", prev=False):
    run = {"id": 123, "run_attempt": attempt, "name": "CI",
           "run_started_at": "2023-04-19T03:04:05Z",
           "updated_at": "2023-04-19T03:05:05Z",
           "conclusion": conclusion, "head_branch": "main",
           "head_sha": "abc", "html_url": "u",
           "head_commit": {"committer": {"name": "N",
                                         "email": "e@x"}}}
    if prev:
        run["previous_attempt_url"] = \
            "https://api.github.com/repos/o/r/runs/123/attempts/1"
    return {"workflow_run": run,
            "repository": {"name": "My_Repo",
                           "custom_properties": {
                               "service_name": "Pay_Svc",
                               "costCenter": "cc1"}},
            "sender": {"login": "octo"}}


def test_workflow_run():
    rows = github_event_to_rows(_run_event(attempt=2, prev=True),
                                "workflow_run")
    r = rows[0]
    assert r["trace_id"] == new_trace_id(123, 2)
    assert r["span_id"] == new_parent_span_id(123, 2)
    assert r["status_code"] == 1
    assert r["status_message"] == "success"
    res = json.loads(r["resource_attributes"])
    assert res["service.name"] == "pay-svc"          # formatted
    assert res["github.repository.custom_properties.cost_center"] \
        == "cc1"
    assert res["cicd.pipeline.run.previous_attempt.url.full"] == \
        "https://github.com/o/r/runs/123/attempts/1"
    # link to the previous attempt's trace
    assert json.loads(r["links"])[0]["traceId"] == new_trace_id(123, 1)
    # attempt 1: no link even with prev url
    rows = github_event_to_rows(_run_event(attempt=1, prev=True),
                                "workflow_run")
    assert json.loads(rows[0]["links"]) == []
    # non-success/failure conclusion → Unset
    rows = github_event_to_rows(_run_event(conclusion="neutral"),
                                "workflow_run")
    assert rows[0]["status_code"] == 0
    assert json.loads(rows[0]["resource_attributes"])[
        "cicd.pipeline.run.status"] == "neutral"


def _job_event(**over):
    job = {"id": 7, "run_id": 123, "run_attempt": 1, "name": "build",
           "created_at": "2023-04-19T03:04:00Z",
           "started_at": "2023-04-19T03:04:10Z",
           "completed_at": "2023-04-19T03:05:00Z",
           "conclusion": "failure", "head_branch": "main",
           "head_sha": "abc", "runner_id": 9, "runner_group_id": 1,
           "runner_name": "r1", "runner_group_name": "g",
           "node_id": "N1", "labels": ["Ubuntu-Latest"],
           "html_url": "u",
           "steps": [{"name": "checkout", "number": 1,
                      "status": "completed", "conclusion": "success",
                      "started_at": "2023-04-19T03:04:10Z",
                      "completed_at": "2023-04-19T03:04:20Z"}]}
    job.update(over)
    return {"workflow_job": job, "repository": {"name": "r"},
            "sender": {"login": "octo"}}


def test_workflow_job_tree():
    rows = github_event_to_rows(_job_event(), "workflow_job")
    job, queue, step = rows
    assert job["parent_span_id"] == new_parent_span_id(123, 1)
    assert job["span_id"] == new_job_span_id(123, 1, "build")
    assert queue["parent_span_id"] == job["span_id"]
    assert queue["span_name"] == "queue-build"
    # the reference parents STEPS at the queue span
    assert step["parent_span_id"] == queue["span_id"]
    qa = json.loads(queue["attributes"])
    assert qa["cicd.pipeline.run.queue.duration"] == 10e9
    assert step["status_message"] == "failure"   # job conclusion
    res = json.loads(job["resource_attributes"])
    assert res["cicd.pipeline.worker.labels"] == ["ubuntu-latest"]
    assert res["cicd.pipeline.run.task.status"] == "failure"


def test_queue_created_after_started_clamp():
    rows = github_event_to_rows(_job_event(
        created_at="2023-04-19T03:04:20Z",
        started_at="2023-04-19T03:04:10Z"), "workflow_job")
    queue = rows[1]
    assert json.loads(queue["attributes"])[
        "cicd.pipeline.run.queue.duration"] == 0.0
    assert queue["start_time_unix_nano"] == \
        queue["end_time_unix_nano"]


def test_parse_github_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "event_json": pa.array([json.dumps(_run_event()), "{bad"],
                               pa.string()),
        "event_type": pa.array(["workflow_run", "workflow_run"],
                               pa.string())}))
    out = parse_github_events(ds, "event_json").to_pandas()
    assert len(out) == 1 and out["span_name"].iloc[0] == "CI"
    kept = parse_github_events(ds, "event_json",
                               on_error="keep").to_pandas()
    assert len(kept) == 2 and kept["error"].notna().sum() == 1
