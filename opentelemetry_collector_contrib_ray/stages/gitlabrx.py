"""gitlabreceiver analog: pipeline webhook events → CI/CD trace spans.

Parity with receiver/gitlabreceiver (traces_event_handling.go,
model.go):

- deterministic sha256 ids (the reference's design): trace =
  sha256("{pipelineID}t{finishedAt}")[:32 hex]; pipeline span =
  sha256("{pipelineID}{finishedAt}")[16:32]; stage span =
  sha256("{pipelineID}{stageName}{startedAt}")[16:32]; job span =
  sha256("{jobID}{startedAt}")[16:32].
- resource: service.name = project.path_with_namespace.
- pipeline span: name = object_attributes.name else the commit title,
  times created_at→finished_at; stages are DERIVED from the builds
  (GitLab has no stage webhooks): per stage name the first job's
  status, earliest started_at, latest finished_at; stage spans parent
  at the pipeline span (first-appearance order — Go iterates the map
  randomly); jobs with a non-empty finished_at parent at their stage's
  span id.  Spans carry no attributes yet (the reference's ToDo).
- times parse "2006-01-02 15:04:05 UTC" (webhook form) with an RFC3339
  fallback (test form); empty/"null" times error — and ANY id/time
  error fails the whole event (the handler returns an error).

Execution: per-row decode in a task-based map_batches, fan-out one row
per span, block-local, zero shuffle.  Output schema = the shared flat
span rows.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timezone

import pyarrow as pa

from .zipkin import _COLS


def _sha_span(input_str: str) -> str:
    return hashlib.sha256(input_str.encode()).hexdigest()[16:32]


def gl_trace_id(pipeline_id: int, finished_at: str) -> str:
    parse_gitlab_time(finished_at)
    return hashlib.sha256(
        f"{pipeline_id}t{finished_at}".encode()).hexdigest()[:32]


def gl_pipeline_span_id(pipeline_id: int, finished_at: str) -> str:
    parse_gitlab_time(finished_at)
    return _sha_span(f"{pipeline_id}{finished_at}")


def gl_stage_span_id(pipeline_id: int, stage: str,
                     started_at: str) -> str:
    if not stage:
        raise ValueError("stageName is empty")
    parse_gitlab_time(started_at)
    return _sha_span(f"{pipeline_id}{stage}{started_at}")


def gl_job_span_id(job_id: int, started_at: str) -> str:
    parse_gitlab_time(started_at)
    return _sha_span(f"{job_id}{started_at}")


def parse_gitlab_time(t) -> int:
    """→ unix ns; raises on empty/"null"/unparseable (the reference's
    whole-event error path)."""
    if not t or t == "null" or not isinstance(t, str):
        raise ValueError("time is empty")
    try:
        dt = datetime.strptime(t, "%Y-%m-%d %H:%M:%S UTC")
        dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000
    except ValueError:
        pass
    s = t
    try:
        if s.endswith(("Z", "z")):
            s, tz = s[:-1], "+00:00"
        else:
            tz, s = s[-6:], s[:-6]
        frac = 0
        if "." in s:
            s, _, f = s.partition(".")
            frac = int(f.ljust(9, "0")[:9])
        dt = datetime.fromisoformat(s + tz)
        return int(dt.timestamp()) * 1_000_000_000 + frac
    except (ValueError, IndexError):
        raise ValueError(f"unparseable gitlab time {t!r}") from None


def _row(trace_id, span_id, parent, name, start, end, res_json):
    return {"trace_id": trace_id, "span_id": span_id,
            "parent_span_id": parent, "trace_state": None,
            "span_name": name, "span_kind": 0,
            "start_time_unix_nano": start, "end_time_unix_nano": end,
            "status_code": 0, "status_message": None,
            "attributes": "{}", "resource_attributes": res_json,
            "scope_name": None, "scope_version": None,
            "events": "[]", "links": "[]"}


def gitlab_pipeline_to_rows(event: dict) -> list[dict]:
    oa = event.get("object_attributes") or {}
    pid = int(oa.get("id") or 0)
    finished_at = oa.get("finished_at") or ""
    res_json = json.dumps(
        {"service.name":
         (event.get("project") or {}).get("path_with_namespace") or ""},
        sort_keys=True)

    tid = gl_trace_id(pid, finished_at)
    pipeline_span_id = gl_pipeline_span_id(pid, finished_at)
    name = oa.get("name") or (event.get("commit") or {}).get(
        "title") or ""
    rows = [_row(tid, pipeline_span_id, None, name,
                 parse_gitlab_time(oa.get("created_at")),
                 parse_gitlab_time(finished_at), res_json)]

    # derive stages from the builds (first-appearance order)
    stages: dict = {}
    order: list = []
    for job in event.get("builds") or []:
        stage_name = job.get("stage") or ""
        stage = stages.get(stage_name)
        if stage is None:
            stage = {"name": stage_name,
                     "status": job.get("status") or "",
                     "started_at": "", "finished_at": ""}
            stages[stage_name] = stage
            order.append(stage_name)
        js, jf = job.get("started_at") or "", job.get(
            "finished_at") or ""
        if not stage["started_at"]:
            stage["started_at"] = js
        elif js and parse_gitlab_time(js) < parse_gitlab_time(
                stage["started_at"]):
            stage["started_at"] = js
        if not stage["finished_at"]:
            stage["finished_at"] = jf
        elif jf and parse_gitlab_time(jf) > parse_gitlab_time(
                stage["finished_at"]):
            stage["finished_at"] = jf

    for stage_name in order:
        stage = stages[stage_name]
        rows.append(_row(
            tid, gl_stage_span_id(pid, stage_name, stage["started_at"]),
            pipeline_span_id, stage_name,
            parse_gitlab_time(stage["started_at"]),
            parse_gitlab_time(stage["finished_at"]), res_json))

    for job in event.get("builds") or []:
        if not job.get("finished_at"):
            continue
        stage = stages[job.get("stage") or ""]
        parent = gl_stage_span_id(pid, job.get("stage") or "",
                                  stage["started_at"])
        rows.append(_row(
            tid, gl_job_span_id(int(job.get("id") or 0),
                                job.get("started_at") or ""),
            parent, job.get("name") or "",
            parse_gitlab_time(job.get("started_at")),
            parse_gitlab_time(job.get("finished_at")), res_json))
    return rows


class _ParseGitlab:
    def __init__(self, json_col, on_error):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                event = json.loads(doc if doc is not None else "")
                rows = gitlab_pipeline_to_rows(event)
            except (ValueError, TypeError, KeyError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(None)
                cols["error"].append(str(e))
                continue
            for row in rows:
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(row[name])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in _COLS + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_gitlab_events(ds, json_col: str = "event_json", *,
                        on_error: str = "drop"):
    """GitLab pipeline webhook events → flat CI/CD span rows
    (pipeline + derived stages + finished jobs)."""
    return ds.map_batches(_ParseGitlab(json_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
