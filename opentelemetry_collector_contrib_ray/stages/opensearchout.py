"""opensearchexporter analog: flat log/span rows → SS4O (Simple
Schema for Observability) bulk documents + index names.

Parity with exporter/opensearchexporter (encoder.go, sso_model.go,
sso_log_exporter.go, trace_bulk_indexer.go:121-147):

- ss4o logs (encodeLogSSO:56-99): ``ssoRecord`` Go-JSON in struct
  field order (attributes, body, instrumentationScope,
  observedTimestamp, resource, schemaUrl, severity, spanId,
  @timestamp, traceId) with the struct tags' omitempty set; body =
  AsString, resource = AsString map, attributes = AsRaw typed values;
  a configured dataset/namespace injects a ``data_stream`` object
  (dataset/namespace omitempty + type "record") INTO the attributes
  map; ObservedTimestamp = time.Now() in Go — replaced by the
  record's own observed timestamp column (deterministic refinement).
- ss4o traces (encodeTrace:146-220): ``ssoSpan`` field order with
  Kind()/StatusCode() enum NAMES, AsString resource, events with the
  ``ts.Unix() != 0`` timestamp-vs-observedTimestamp split (a real
  timestamp inside the first unix second renders as observed!), link
  rows, data_stream type "span" — and the ``@timestamp`` field the
  reference NEVER assigns, so every span document carries the Go
  zero time ``0001-01-01T00:00:00Z``.
- Log Data Model mode (encodeLogDataModel:103-142): the objmodel
  document (shared with the elasticsearch stage) — resource attrs
  under ``Attributes.``, @timestamp (or the configured field /
  epoch-millis int when unix_time), TraceId/SpanId/TraceFlags/
  SeverityText/SeverityNumber/Body, record attrs; flatten_attributes
  puts both attr sets at the ROOT; Dedup only when ``dedup``, Sort
  only when ``dedot`` — otherwise fields stay in insertion order
  with duplicates retained.
- index naming: default ``ss4o_logs-<dataset>-<namespace>`` /
  ``ss4o_traces-<dataset>-<namespace>`` (getIndexName, trace
  indexer:146); an explicit logs_index resolves ``%{placeholder}``
  against the merged resource/scope/record attrs (non-empty value,
  else logs_index_fallback, else the literal ``unknown``) and
  appends ``-<time>`` under the Java-style yyyy/MM/dd/HH/mm/ss
  format (resolveLogIndexName:141-160; the reference stamps
  time.Now() with a TODO — the batch engine uses the record's own
  timestamp, per-ROW rather than per-request since a batch has no
  request boundary).

Execution: 1:1 per-row encode in task maps, block-local, zero
shuffle; output (os_index, os_doc) rows feed write_routed — the
opensearch-go bulk indexer transport is Ray's write layer.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone

import pyarrow as pa

from .awsemf import GoStruct, go_json
from .elasticsearch import ESDoc
from .splunkhec import go_fmt_float

GO_ZERO_TIME = "0001-01-01T00:00:00Z"

_KIND_NAMES = ("Unspecified", "Internal", "Server", "Client",
               "Producer", "Consumer")
_STATUS_NAMES = ("Unset", "Ok", "Error")


def _unix_rfc3339(ns: int) -> str:
    """Go time.Time json.Marshal (RFC3339Nano) of time.Unix(0, ns)."""
    sec, frac = divmod(int(ns), 1_000_000_000)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    base = (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
            f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}")
    if frac:
        base += ("." + f"{frac:09d}").rstrip("0")
    return base + "Z"


def _as_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_fmt_float(v)
    return "" if v is None else str(v)


def _jmap(s) -> dict:
    return json.loads(s) if s else {}


def _data_stream(dataset: str, namespace: str, typ: str):
    if not dataset and not namespace:
        return None
    ds = GoStruct()
    if dataset:
        ds["dataset"] = dataset
    if namespace:
        ds["namespace"] = namespace
    ds["type"] = typ
    return ds


def encode_log_sso(row: dict, *, dataset: str = "",
                   namespace: str = "") -> str:
    """One flat log row → the ssoRecord JSON document."""
    attrs = _jmap(row.get("attributes"))
    ds = _data_stream(dataset, namespace, "record")
    if ds is not None:
        attrs["data_stream"] = ds
    doc = GoStruct()
    if attrs:
        doc["attributes"] = attrs
    doc["body"] = row.get("body") or ""
    # struct order: attributes, name, schemaUrl, version
    # (sso_model.go:66-72), all omitempty
    scope = GoStruct()
    scope_attrs = _jmap(row.get("scope_attributes"))
    if scope_attrs:
        scope["attributes"] = scope_attrs
    if row.get("scope_name"):
        scope["name"] = row["scope_name"]
    if row.get("scope_schema_url"):
        scope["schemaUrl"] = row["scope_schema_url"]
    if row.get("scope_version"):
        scope["version"] = row["scope_version"]
    doc["instrumentationScope"] = scope
    # Go stamps time.Now(); the batch engine uses the record's own
    # observed timestamp (deterministic refinement)
    doc["observedTimestamp"] = _unix_rfc3339(
        int(row.get("observed_time_unix_nano") or 0))
    resource = _jmap(row.get("resource_attributes"))
    if resource:
        doc["resource"] = {k: _as_string(v) for k, v in
                           resource.items()}
    if row.get("scope_schema_url"):
        doc["schemaUrl"] = row["scope_schema_url"]
    sev = GoStruct()
    if row.get("severity_text"):
        sev["text"] = row["severity_text"]
    if int(row.get("severity_number") or 0):
        sev["number"] = int(row["severity_number"])
    doc["severity"] = sev
    if row.get("span_id"):
        doc["spanId"] = row["span_id"]
    doc["@timestamp"] = _unix_rfc3339(
        int(row.get("time_unix_nano") or 0))
    if row.get("trace_id"):
        doc["traceId"] = row["trace_id"]
    return go_json(_reorder_sso_record(doc))


def _reorder_sso_record(doc: GoStruct) -> GoStruct:
    """ssoRecord struct field order (sso_model.go:63-83)."""
    order = ("attributes", "body", "instrumentationScope",
             "observedTimestamp", "resource", "schemaUrl", "severity",
             "spanId", "@timestamp", "traceId")
    out = GoStruct()
    for k in order:
        if k in doc:
            out[k] = doc[k]
    return out


def encode_span_sso(row: dict, *, dataset: str = "",
                    namespace: str = "",
                    observed_ns: int = 0) -> str:
    """One flat span row → the ssoSpan JSON document."""
    attrs = _jmap(row.get("attributes"))
    ds = _data_stream(dataset, namespace, "span")
    if ds is not None:
        attrs["data_stream"] = ds
    doc = GoStruct()
    if attrs:
        doc["attributes"] = attrs
    doc["droppedAttributesCount"] = int(
        row.get("dropped_attributes_count") or 0)
    doc["droppedEventsCount"] = int(
        row.get("dropped_events_count") or 0)
    doc["droppedLinksCount"] = int(row.get("dropped_links_count") or 0)
    doc["endTime"] = _unix_rfc3339(
        int(row.get("end_time_unix_nano") or 0))
    events = json.loads(row.get("events") or "[]")
    if events:
        evs = []
        for e in events:
            ev = GoStruct()
            ev["attributes"] = e.get("attributes") or {}
            ev["droppedAttributesCount"] = int(
                e.get("droppedAttributesCount") or 0)
            ev["name"] = e.get("name") or ""
            ts = int(e.get("timeUnixNano") or 0)
            # ts.Unix() != 0 — a timestamp inside the first unix
            # second takes the observed branch (encoder.go:177-183)
            if ts // 1_000_000_000 != 0:
                ev["@timestamp"] = _unix_rfc3339(ts)
            else:
                ev["observedTimestamp"] = _unix_rfc3339(observed_ns)
            # struct order: attributes, droppedAttributesCount, name,
            # observedTimestamp, @timestamp (sso_model.go:16-22)
            ordered = GoStruct()
            for k in ("attributes", "droppedAttributesCount", "name",
                      "observedTimestamp", "@timestamp"):
                if k in ev:
                    ordered[k] = ev[k]
            evs.append(ordered)
        doc["events"] = evs
    scope = GoStruct()
    scope["droppedAttributesCount"] = 0
    scope["name"] = row.get("scope_name") or ""
    scope["schemaUrl"] = row.get("scope_schema_url") or ""
    scope["version"] = row.get("scope_version") or ""
    scope_attrs = _jmap(row.get("scope_attributes"))
    if scope_attrs:
        scope = GoStruct([("attributes", scope_attrs), *scope.items()])
    doc["instrumentationScope"] = scope
    doc["kind"] = _KIND_NAMES[int(row.get("span_kind") or 0)]
    links = json.loads(row.get("links") or "[]")
    if links:
        lks = []
        for lk in links:
            out = GoStruct()
            if lk.get("attributes"):
                out["attributes"] = lk["attributes"]
            if lk.get("spanId"):
                out["spanId"] = lk["spanId"]
            if lk.get("traceId"):
                out["traceId"] = lk["traceId"]
            if lk.get("traceState"):
                out["traceState"] = lk["traceState"]
            if int(lk.get("droppedAttributesCount") or 0):
                out["droppedAttributesCount"] = \
                    int(lk["droppedAttributesCount"])
            lks.append(out)
        doc["links"] = lks
    doc["name"] = row.get("span_name") or ""
    doc["parentSpanId"] = row.get("parent_span_id") or ""
    resource = _jmap(row.get("resource_attributes"))
    if resource:
        doc["resource"] = {k: _as_string(v) for k, v in
                           resource.items()}
    doc["spanId"] = row.get("span_id") or ""
    doc["startTime"] = _unix_rfc3339(
        int(row.get("start_time_unix_nano") or 0))
    status = GoStruct()
    status["code"] = _STATUS_NAMES[int(row.get("status_code") or 0)]
    status["message"] = row.get("status_message") or ""
    doc["status"] = status
    # encodeTrace never assigns sso.Timestamp → the Go zero time
    doc["@timestamp"] = GO_ZERO_TIME
    doc["traceId"] = row.get("trace_id") or ""
    doc["traceState"] = row.get("trace_state") or ""
    order = ("attributes", "droppedAttributesCount",
             "droppedEventsCount", "droppedLinksCount", "endTime",
             "events", "instrumentationScope", "kind", "links",
             "name", "parentSpanId", "resource", "spanId",
             "startTime", "status", "@timestamp", "traceId",
             "traceState")
    out = GoStruct()
    for k in order:
        if k in doc:
            out[k] = doc[k]
    return go_json(out)


def encode_log_data_model(row: dict, *, flatten_attributes: bool =
                          False, timestamp_field: str = "",
                          unix_time: bool = False, dedup: bool = False,
                          dedot: bool = False) -> str:
    """encodeLogDataModel:103-142 via the shared objmodel ESDoc."""
    doc = ESDoc()
    resource = _jmap(row.get("resource_attributes"))
    if flatten_attributes:
        doc.add_attributes("", resource)
    else:
        doc.add_attributes("Attributes", resource)
    field = timestamp_field or "@timestamp"
    ts = int(row.get("time_unix_nano") or 0)
    if unix_time:
        doc.add_int(field, ts // 1_000_000)
    else:
        doc.add_timestamp(field, ts)
    doc.add_id("TraceId", row.get("trace_id") or "", 32)
    doc.add_id("SpanId", row.get("span_id") or "", 16)
    doc.add_int("TraceFlags", int(row.get("flags") or 0))
    doc.add_string("SeverityText", row.get("severity_text") or "")
    doc.add_int("SeverityNumber", int(row.get("severity_number") or 0))
    doc.add_attribute("Body", row.get("body"))
    attrs = _jmap(row.get("attributes"))
    if flatten_attributes:
        doc.add_attributes("", attrs)
    else:
        doc.add_attributes("Attributes", attrs)
    return doc.serialize(dedot, dedup=dedup, sort=(not dedup and dedot))


# --- index naming ----------------------------------------------------------

_PLACEHOLDER = re.compile(r"%\{([^}]+)\}")
_JAVA_TO_STRF = (("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"),
                 ("dd", "%d"), ("HH", "%H"), ("mm", "%M"), ("ss", "%S"))


def get_index_name(dataset: str, namespace: str, index: str,
                   signal: str = "logs") -> str:
    """getIndexName / trace_bulk_indexer:146 — joined even when parts
    are empty."""
    if index:
        return index
    return "-".join([f"ss4o_{signal}", dataset, namespace])


def resolve_log_index_name(logs_index: str, attrs: dict,
                           fallback: str, time_format: str,
                           t_ns: int) -> str:
    """resolveLogIndexName:141-160."""
    def sub(m):
        v = attrs.get(m.group(1))
        if v:
            return _as_string(v)
        return fallback if fallback else "unknown"

    index = _PLACEHOLDER.sub(sub, logs_index)
    if time_format:
        f = time_format
        for java, strf in _JAVA_TO_STRF:
            f = f.replace(java, strf)
        dt = datetime.fromtimestamp(t_ns // 1_000_000_000,
                                    tz=timezone.utc)
        index = index + "-" + dt.strftime(f)
    return index


class _LogsToOS:
    def __init__(self, opts):
        self.opts = dict(opts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        o = self.opts
        rows = batch.to_pylist()
        docs, idxs = [], []
        default_index = get_index_name(o["dataset"], o["namespace"],
                                       o["logs_index"], "logs")
        for row in rows:
            if o["mode"] == "ss4o":
                docs.append(encode_log_sso(
                    row, dataset=o["dataset"],
                    namespace=o["namespace"]))
            else:
                docs.append(encode_log_data_model(
                    row,
                    flatten_attributes=(o["mode"]
                                        == "flatten_attributes"),
                    timestamp_field=o["timestamp_field"],
                    unix_time=o["unix_time"], dedup=o["dedup"],
                    dedot=o["dedot"]))
            if o["logs_index"]:
                # merged resource/scope/record attrs, record last-wins
                attrs = {}
                attrs.update(_jmap(row.get("resource_attributes")))
                if row.get("scope_name"):
                    attrs["scope.name"] = row["scope_name"]
                if row.get("scope_version"):
                    attrs["scope.version"] = row["scope_version"]
                attrs.update(_jmap(row.get("scope_attributes")))
                attrs.update(_jmap(row.get("attributes")))
                idxs.append(resolve_log_index_name(
                    o["logs_index"],
                    {k: _as_string(v) for k, v in attrs.items()},
                    o["logs_index_fallback"],
                    o["logs_index_time_format"],
                    int(row.get("time_unix_nano") or 0)))
            else:
                idxs.append(default_index)
        return batch.append_column(
            "os_index", pa.array(idxs, pa.string())).append_column(
            "os_doc", pa.array(docs, pa.string()))


def logs_to_opensearch(ds, *, mode: str = "ss4o",
                       dataset: str = "default",
                       namespace: str = "namespace",
                       logs_index: str = "",
                       logs_index_fallback: str = "",
                       logs_index_time_format: str = "",
                       timestamp_field: str = "",
                       unix_time: bool = False, dedup: bool = False,
                       dedot: bool = False):
    """Flat log rows → (os_index, os_doc) bulk pairs (1:1)."""
    opts = dict(mode=mode, dataset=dataset, namespace=namespace,
                logs_index=logs_index,
                logs_index_fallback=logs_index_fallback,
                logs_index_time_format=logs_index_time_format,
                timestamp_field=timestamp_field, unix_time=unix_time,
                dedup=dedup, dedot=dedot)
    return ds.map_batches(_LogsToOS(opts), batch_format="pyarrow",
                          zero_copy_batch=True)


class _SpansToOS:
    def __init__(self, opts):
        self.opts = dict(opts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        o = self.opts
        rows = batch.to_pylist()
        index = get_index_name(o["dataset"], o["namespace"], "",
                               "traces")
        docs = [encode_span_sso(row, dataset=o["dataset"],
                                namespace=o["namespace"],
                                observed_ns=o["observed_ns"])
                for row in rows]
        return batch.append_column(
            "os_index",
            pa.array([index] * len(rows), pa.string())).append_column(
            "os_doc", pa.array(docs, pa.string()))


def spans_to_opensearch(ds, *, dataset: str = "default",
                        namespace: str = "namespace",
                        observed_ns: int = 0):
    """Flat span rows → (os_index, os_doc) SS4O bulk pairs (1:1)."""
    opts = dict(dataset=dataset, namespace=namespace,
                observed_ns=observed_ns)
    return ds.map_batches(_SpansToOS(opts), batch_format="pyarrow",
                          zero_copy_batch=True)
