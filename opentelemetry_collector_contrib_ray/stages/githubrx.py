"""githubreceiver analog: workflow webhook events → CI/CD trace spans.

Parity with receiver/githubreceiver (trace_event_handling.go,
model.go):

- deterministic ids (the reference's own design — no randomness):
  trace id = sha256("{runID}{runAttempt}t")[:32 hex]; root/parent span
  id = sha256("{runID}{runAttempt}s")[16:32 hex]; job span id =
  sha256("{runID}{runAttempt}{jobName}")[16:32]; step/queue span ids =
  sha256("{runID}{runAttempt}{jobName}{stepName}{number}")[16:32]
  (queue uses stepName "queue-{jobName}", number 1).
- workflow_run → ONE root server span (name = run name, start =
  run_started_at, end = updated_at, status Ok/Error/Unset from the
  conclusion with the conclusion as message, a link to the previous
  attempt's trace when run_attempt > 1 and previous_attempt_url set).
- workflow_job → a job span (parent = the run's root span id, times
  created_at→completed_at), a queue span (parent = the JOB span;
  start = created_at, end = started_at, duration attr
  cicd.pipeline.run.queue.duration as FLOAT ns with the
  created>started zero-clamp quirk), and one span per step parented
  at the QUEUE span (the reference's own wiring), named with the
  `-n` duplicate suffix scheme, with cicd.pipeline.task.name +
  cicd.pipeline.run.task.status attrs (success/failure/skip→failure
  status code table, conclusion-of-the-JOB as every step's status
  message).
- resource attrs (model.go:142-277): service.name = config >
  custom_properties.service_name > repo name (each lowercased with
  _→-), repository custom properties as
  github.repository.custom_properties.<snake_case> attrs, the
  vcs.*/cicd.* attribute sets incl. the conclusion status tables, the
  previous-attempt html URL rewrite (api.github.com/repos →
  github.com), referenced-workflow path/revision/version triplets
  keyed by the lowercased file stem, worker/runner attrs + lowercased
  label slices for jobs.
- timestamps are GitHub RFC3339 strings → ns (missing → 0 here; Go's
  zero-time Unix nanos are a transport artifact).

Execution: per-row decode in a task-based map_batches, fan-out one row
per span, block-local, zero shuffle.  Output schema = the shared flat
span rows (zipkin._COLS).
"""

from __future__ import annotations

import hashlib
import json
import re
from datetime import datetime

import pyarrow as pa

from .zipkin import _COLS

_STATUS = {"success": 1, "failure": 2}
_RUN_STATUS = {"success": "success", "failure": "failure",
               "skipped": "skip", "cancelled": "cancellation"}
_STEP_STATUS = {"success": "success", "failure": "failure",
                "skipped": "failure", "cancelled": "cancellation"}


def new_trace_id(run_id: int, run_attempt: int) -> str:
    return hashlib.sha256(
        f"{run_id}{run_attempt}t".encode()).hexdigest()[:32]


def new_parent_span_id(run_id: int, run_attempt: int) -> str:
    return hashlib.sha256(
        f"{run_id}{run_attempt}s".encode()).hexdigest()[16:32]


def new_job_span_id(run_id: int, run_attempt: int, job: str) -> str:
    return hashlib.sha256(
        f"{run_id}{run_attempt}{job}".encode()).hexdigest()[16:32]


def new_step_span_id(run_id: int, run_attempt: int, job: str,
                     step: str, number: int) -> str:
    return hashlib.sha256(
        f"{run_id}{run_attempt}{job}{step}{number}".encode()
    ).hexdigest()[16:32]


def _ts(s) -> int:
    if not s or not isinstance(s, str):
        return 0
    try:
        v = s
        if v.endswith(("Z", "z")):
            v, tz = v[:-1], "+00:00"
        else:
            tz, v = v[-6:], v[:-6]
        frac = 0
        if "." in v:
            v, _, f = v.partition(".")
            frac = int(f.ljust(9, "0")[:9])
        dt = datetime.fromisoformat(v + tz)
        return int(dt.timestamp()) * 1_000_000_000 + frac
    except (ValueError, IndexError):
        return 0


def format_service_string(s: str) -> str:
    return s.replace("_", "-").lower()


def to_snake_case(s: str) -> str:
    for a, b in (("-", "_"), (" ", "_"), (".", "_"),
                 ("$", "_dollar_"), ("#", "_hash_")):
        s = s.replace(a, b)
    out = []
    for i, r in enumerate(s):
        if i > 0 and r.isupper():
            prev_low = s[i - 1].islower() or s[i - 1].isdigit()
            next_low = i < len(s) - 1 and s[i + 1].islower()
            if prev_low or next_low:
                out.append("_")
        out.append(r.lower())
    res = "".join(out)
    while "__" in res:
        res = res.replace("__", "_")
    return res


def unique_step_names(names: list[str]) -> list[str]:
    count: dict = {}
    for n in names:
        count[n] = count.get(n, 0) + 1
    seen: dict = {}
    out = []
    for n in names:
        if count[n] == 1:
            out.append(n)
            continue
        seen[n] = seen.get(n, 0) + 1
        out.append(n if seen[n] == 1 else f"{n}-{seen[n] - 1}")
    return out


def _service_name(event: dict, configured: str | None) -> str:
    if configured:
        return format_service_string(configured)
    props = (event.get("repository") or {}).get(
        "custom_properties") or {}
    if props.get("service_name") is not None:
        return format_service_string(str(props["service_name"]))
    repo = (event.get("repository") or {}).get("name")
    if repo:
        return format_service_string(repo)
    return "unknown_service"


def _custom_props(attrs: dict, event: dict):
    props = (event.get("repository") or {}).get(
        "custom_properties") or {}
    for key, value in props.items():
        if key == "service_name":
            continue
        akey = ("github.repository.custom_properties."
                + to_snake_case(key))
        if isinstance(value, bool):
            attrs[akey] = "true" if value else "false"
        elif isinstance(value, (str, int, float)):
            attrs[akey] = value
        else:
            attrs[akey] = json.dumps(value, separators=(",", ":"))


def _split_ref_workflow_path(path: str) -> str:
    parts = path.split("@")
    if len(parts) != 2:
        raise ValueError("invalid reference workflow path")
    stem = parts[0].split("/")[-1].split(".")[0]
    return stem.lower()


def _run_resource(event: dict, configured_service) -> dict:
    run = event.get("workflow_run") or {}
    repo = event.get("repository") or {}
    attrs: dict = {"service.name": _service_name(event,
                                                 configured_service)}
    _custom_props(attrs, event)
    attrs["vcs.repository.name"] = repo.get("name") or ""
    attrs["vcs.vendor.name"] = "github"
    attrs["vcs.ref.head"] = run.get("head_branch") or ""
    attrs["vcs.ref.head.type"] = "branch"
    attrs["vcs.ref.head.revision"] = run.get("head_sha") or ""
    committer = (run.get("head_commit") or {}).get("committer") or {}
    attrs["vcs.ref.head.revision.author.name"] = \
        committer.get("name") or ""
    attrs["vcs.ref.head.revision.author.email"] = \
        committer.get("email") or ""
    attrs["cicd.pipeline.name"] = run.get("name") or ""
    attrs["cicd.pipeline.run.sender.login"] = \
        (event.get("sender") or {}).get("login") or ""
    attrs["cicd.pipeline.run.url.full"] = run.get("html_url") or ""
    attrs["cicd.pipeline.run.id"] = int(run.get("id") or 0)
    conclusion = (run.get("conclusion") or "").lower()
    attrs["cicd.pipeline.run.status"] = _RUN_STATUS.get(conclusion,
                                                        conclusion)
    if run.get("previous_attempt_url"):
        attrs["cicd.pipeline.run.previous_attempt.url.full"] = \
            run["previous_attempt_url"].replace(
                "api.github.com/repos", "github.com", 1)
    for w in run.get("referenced_workflows") or []:
        name = _split_ref_workflow_path(w.get("path") or "")
        tpl = "github.reference.workflow." + name
        attrs[tpl + ".path"] = w.get("path") or ""
        attrs[tpl + ".revision"] = w.get("sha") or ""
        attrs[tpl + ".version"] = w.get("ref") or ""
    return attrs


def _job_resource(event: dict, configured_service) -> dict:
    job = event.get("workflow_job") or {}
    repo = event.get("repository") or {}
    attrs: dict = {"service.name": _service_name(event,
                                                 configured_service)}
    _custom_props(attrs, event)
    attrs["vcs.repository.name"] = repo.get("name") or ""
    attrs["vcs.vendor.name"] = "github"
    attrs["vcs.ref.head"] = job.get("head_branch") or ""
    attrs["vcs.ref.head.type"] = "branch"
    attrs["vcs.ref.head.revision"] = job.get("head_sha") or ""
    attrs["cicd.pipeline.worker.id"] = int(job.get("runner_id") or 0)
    attrs["cicd.pipeline.worker.group.id"] = \
        int(job.get("runner_group_id") or 0)
    attrs["cicd.pipeline.worker.name"] = job.get("runner_name") or ""
    attrs["cicd.pipeline.worker.group.name"] = \
        job.get("runner_group_name") or ""
    attrs["cicd.pipeline.worker.node.id"] = job.get("node_id") or ""
    if job.get("labels"):
        attrs["cicd.pipeline.worker.labels"] = [
            str(x).lower() for x in job["labels"]]
    attrs["cicd.pipeline.name"] = job.get("name") or ""
    attrs["cicd.pipeline.task.run.sender.login"] = \
        (event.get("sender") or {}).get("login") or ""
    attrs["cicd.pipeline.task.run.url.full"] = job.get("html_url") or ""
    attrs["cicd.pipeline.task.run.id"] = int(job.get("id") or 0)
    conclusion = (job.get("conclusion") or "").lower()
    if conclusion in _RUN_STATUS:
        attrs["cicd.pipeline.run.task.status"] = _RUN_STATUS[conclusion]
    else:
        # the reference's default case writes the RUN status key
        attrs["cicd.pipeline.run.status"] = conclusion
    return attrs


def _status_from_conclusion(conclusion: str):
    c = (conclusion or "").lower()
    return _STATUS.get(c, 0)


def _base_row(trace_id, span_id, parent, name, start, end, code,
              message, attrs, res_json):
    return {"trace_id": trace_id, "span_id": span_id,
            "parent_span_id": parent, "trace_state": None,
            "span_name": name, "span_kind": 2,
            "start_time_unix_nano": start, "end_time_unix_nano": end,
            "status_code": code, "status_message": message or None,
            "attributes": json.dumps(attrs, sort_keys=True),
            "resource_attributes": res_json,
            "scope_name": None, "scope_version": None,
            "events": "[]", "links": "[]"}


def github_event_to_rows(event: dict, event_type: str, *,
                         configured_service: str | None = None
                         ) -> list[dict]:
    if event_type == "workflow_run":
        run = event.get("workflow_run") or {}
        run_id = int(run.get("id") or 0)
        attempt = int(run.get("run_attempt") or 0)
        tid = new_trace_id(run_id, attempt)
        res_json = json.dumps(_run_resource(event, configured_service),
                              sort_keys=True)
        row = _base_row(
            tid, new_parent_span_id(run_id, attempt), None,
            run.get("name") or "", _ts(run.get("run_started_at")),
            _ts(run.get("updated_at")),
            _status_from_conclusion(run.get("conclusion")),
            run.get("conclusion"), {}, res_json)
        if run.get("previous_attempt_url") and attempt > 1:
            row["links"] = json.dumps([{
                "traceId": new_trace_id(run_id, attempt - 1),
                "spanId": "0" * 16, "attributes": {},
                "droppedAttributesCount": 0}], sort_keys=True)
        return [row]
    if event_type != "workflow_job":
        raise ValueError(f"unsupported github event {event_type!r}")

    job = event.get("workflow_job") or {}
    run_id = int(job.get("run_id") or 0)
    attempt = int(job.get("run_attempt") or 0)
    job_name = job.get("name") or ""
    tid = new_trace_id(run_id, attempt)
    res_json = json.dumps(_job_resource(event, configured_service),
                          sort_keys=True)
    rows = []

    parent_id = new_parent_span_id(run_id, attempt)
    job_span_id = new_job_span_id(run_id, attempt, job_name)
    rows.append(_base_row(
        tid, job_span_id, parent_id, job_name,
        _ts(job.get("created_at")), _ts(job.get("completed_at")),
        _status_from_conclusion(job.get("conclusion")),
        job.get("conclusion"), {}, res_json))

    queue_name = f"queue-{job_name}"
    queue_span_id = new_step_span_id(run_id, attempt, job_name,
                                     queue_name, 1)
    created = _ts(job.get("created_at"))
    started = _ts(job.get("started_at"))
    duration = started - created
    q_start = created
    if created > started:
        duration = 0
        q_start = started
    rows.append(_base_row(
        tid, queue_span_id, job_span_id, queue_name, q_start, started,
        0, None,
        {"cicd.pipeline.run.queue.duration": float(duration)},
        res_json))

    steps = job.get("steps") or []
    names = unique_step_names([s.get("name") or "" for s in steps])
    for step, name in zip(steps, names):
        conclusion = (step.get("conclusion") or "").lower()
        attrs = {"cicd.pipeline.task.name": name}
        status = _STEP_STATUS.get(conclusion)
        attrs["cicd.pipeline.run.task.status"] = \
            status if status is not None else (step.get("status") or "")
        code = {"success": 1, "failure": 2}.get(conclusion, 0)
        rows.append(_base_row(
            tid,
            new_step_span_id(run_id, attempt, job_name,
                             step.get("name") or "",
                             int(step.get("number") or 0)),
            queue_span_id, name, _ts(step.get("started_at")),
            _ts(step.get("completed_at")), code,
            job.get("conclusion"), attrs, res_json))
    return rows


class _ParseGithub:
    def __init__(self, json_col, type_col, opts, on_error):
        self.json_col = json_col
        self.type_col = type_col
        self.opts = opts
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        types = batch.column(self.type_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                event = json.loads(doc if doc is not None else "")
                rows = github_event_to_rows(event, types[i] or "",
                                            **self.opts)
            except (ValueError, TypeError) as e:
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


def parse_github_events(ds, json_col: str = "event_json", *,
                        type_col: str = "event_type",
                        configured_service: str | None = None,
                        on_error: str = "drop"):
    """GitHub workflow_run/workflow_job webhook events → flat CI/CD
    span rows (block-local fan-out, zero shuffle)."""
    opts = {"configured_service": configured_service}
    return ds.map_batches(
        _ParseGithub(json_col, type_col, opts, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
