"""awscloudwatchlogsexporter analog: flat log rows → CloudWatch Logs
InputLogEvent rows.

Parity with exporter/awscloudwatchlogsexporter/exporter.go + util.go:

- one event per log record (``logToCWLog``:176-246): ``timestamp`` =
  record ns // 1e6 (Go truncating int64 division by time.Millisecond),
  ``message`` = Go ``json.Marshal`` of the ``cwLogBody`` struct in
  field order body, severity_number, severity_text,
  dropped_attributes_count, flags, trace_id, span_id, attributes,
  scope, resource — every field ``omitempty`` (exporter.go:163-174).
  trace/span ids are emitted only when the pdata id is non-zero
  (:210-214); scope only when the scope NAME is non-empty (:220-227);
  attribute maps are Go maps (sorted keys, ``&<>`` HTML escapes).
- raw_log mode (:184-201): the body string IS the message; if it
  unmarshals into the ``emfMetadata`` struct, a v1 ``_aws.logGroupName``
  (else a v0 ``log_group_name``) overrides the log group, and the
  matching stream field overrides the stream only when non-empty.  An
  unmarshal error (non-object body, wrong field types) keeps the raw
  body with the config-resolved group/stream.
- group/stream resolution (util.go:80-97 ``getLogInfo``):
  ``{PatternKey}`` placeholders resolve against the resource
  attributes — the RAW pattern key first, then its
  ``patternKeyToAttributeMap`` name (util.go:57-69); a missing or
  empty value substitutes the literal ``undefined``.  This exporter's
  table adds FaasName/FaasVersion over the EMF exporter's (util.go:15).

Execution: 1:1 per-row encode in a task-based map_batches —
block-local, zero shuffle.  The cwlogs pusher's 1 MB / 10k-event
batching and PutLogEvents transport are Ray's write layer.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import GoStruct, go_json

# util.go:15-26 — the EMF table plus the two Faas keys.
PATTERN_KEY_TO_ATTR = {
    "ClusterName": "aws.ecs.cluster.name",
    "TaskId": "aws.ecs.task.id",
    "NodeName": "k8s.node.name",
    "PodName": "pod",
    "ServiceName": "service.name",
    "ContainerInstanceId": "aws.ecs.container.instance.id",
    "TaskDefinitionFamily": "aws.ecs.task.family",
    "InstanceId": "service.instance.id",
    "FaasName": "faas.name",
    "FaasVersion": "faas.version",
}


def _attr_str(v) -> str:
    """util.go:99-114 anyMapToStringMap — fmt-style string forms."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, float):
        # fmt %v of a float64: shortest 'g'
        from .splunkhec import go_fmt_float
        return go_fmt_float(v)
    return str(v)


def replace_patterns(s: str, attrs: dict) -> str:
    """util.go:47-77 — every known {Key}; raw key wins over the
    mapped attribute name; missing/empty → the literal 'undefined'."""
    for key, mapped in PATTERN_KEY_TO_ATTR.items():
        pattern = "{" + key + "}"
        if pattern not in s:
            continue
        v = attrs.get(key)
        if v is None:
            v = attrs.get(mapped)
        sv = _attr_str(v) if v is not None else ""
        s = s.replace(pattern, sv if sv != "" else "undefined")
    return s


def _hex_id_empty(h) -> bool:
    """pcommon ids marshal only when non-zero (exporter.go:210-214)."""
    return not h or set(h) <= {"0"}


class _BadField(Exception):
    pass


def _go_field(obj: dict, name: str):
    """encoding/json field match: exact key wins, else the LAST
    case-insensitive match in document order; present values must be
    strings (the struct field type) or the unmarshal errors."""
    v, found = None, False
    for k, kv in obj.items():
        if k == name or k.lower() == name.lower():
            v, found = kv, True
    if found and v is not None and not isinstance(v, str):
        raise _BadField(name)
    return v if found else None


def _emf_override(body: str):
    """exporter.go:184-200 — the emfMetadata sniff on a raw body.

    Returns (group, stream) overrides or (None, None).  Mirrors Go
    json.Unmarshal semantics: top level must be an object, field
    names match case-insensitively, present fields must have the
    struct's types or the whole sniff errors (→ no override).
    """
    try:
        meta = json.loads(body)
    except (ValueError, TypeError):
        return None, None
    if not isinstance(meta, dict):
        return None, None
    try:
        aws = None
        for k, kv in meta.items():
            if k == "_aws" or k.lower() == "_aws":
                aws = kv
        if aws is not None and not isinstance(aws, dict):
            return None, None
        v1_group = v1_stream = None
        if isinstance(aws, dict):
            v1_group = _go_field(aws, "logGroupName")
            v1_stream = _go_field(aws, "logStreamName")
        v0_group = _go_field(meta, "log_group_name")
        v0_stream = _go_field(meta, "log_stream_name")
    except _BadField:
        return None, None
    # v1 wins when _aws carries a group; else v0 (exporter.go:190-200).
    if v1_group:
        return v1_group, v1_stream or None
    if v0_group:
        return v0_group, v0_stream or None
    return None, None


def log_to_cw_event(row: dict, *, log_group_name: str,
                    log_stream_name: str, raw_log: bool) -> dict:
    """One flat log row → {log_group, log_stream, timestamp, message}."""
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    str_attrs = {k: _attr_str(v) for k, v in resource.items()}
    group = replace_patterns(log_group_name, str_attrs) \
        if log_group_name else ""
    stream = replace_patterns(log_stream_name, str_attrs) \
        if log_stream_name else ""

    if raw_log:
        body = row.get("body") or ""
        g, s = _emf_override(body)
        if g:
            group = g
            if s:
                stream = s
        message = body
    else:
        b = GoStruct()
        body = row.get("body")
        if body:
            b["body"] = body
        sev = int(row.get("severity_number") or 0)
        if sev:
            b["severity_number"] = sev
        if row.get("severity_text"):
            b["severity_text"] = row["severity_text"]
        dropped = int(row.get("dropped_attributes_count") or 0)
        if dropped:
            b["dropped_attributes_count"] = dropped
        flags = int(row.get("flags") or 0)
        if flags:
            b["flags"] = flags
        if not _hex_id_empty(row.get("trace_id")):
            b["trace_id"] = row["trace_id"]
        if not _hex_id_empty(row.get("span_id")):
            b["span_id"] = row["span_id"]
        attrs = json.loads(row.get("attributes") or "{}") or {}
        if attrs:
            b["attributes"] = attrs
        if row.get("scope_name"):
            scope = GoStruct()
            scope["name"] = row["scope_name"]
            if row.get("scope_version"):
                scope["version"] = row["scope_version"]
            scope_attrs = json.loads(
                row.get("scope_attributes") or "{}") or {}
            if scope_attrs:
                scope["attributes"] = scope_attrs
            b["scope"] = scope
        if resource:
            b["resource"] = resource
        message = go_json(b)

    ts = int(row.get("time_unix_nano") or 0) // 1_000_000
    return {"log_group": group, "log_stream": stream,
            "timestamp": ts, "message": message}


class _LogsToCW:
    def __init__(self, opts):
        self.opts = opts

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        cols = {"log_group": [], "log_stream": [],
                "timestamp": [], "message": []}
        for row in rows:
            ev = log_to_cw_event(row, **self.opts)
            for k, v in ev.items():
                cols[k].append(v)
        out = batch
        for k in ("log_group", "log_stream", "message"):
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        return out.append_column(
            "timestamp", pa.array(cols["timestamp"], pa.int64()))


def logs_to_cwlogs(ds, *, log_group_name: str = "",
                   log_stream_name: str = "", raw_log: bool = False):
    """Flat log rows → CloudWatch Logs event rows (1:1)."""
    opts = {"log_group_name": log_group_name,
            "log_stream_name": log_stream_name, "raw_log": raw_log}
    return ds.map_batches(_LogsToCW(opts), batch_format="pyarrow",
                          zero_copy_batch=True)
