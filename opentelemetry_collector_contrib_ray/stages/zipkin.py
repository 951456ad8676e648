"""pkg/translator/zipkin/zipkinv2 analog: Zipkin v2 JSON spans → the
engine's flat span rows.

Parity with pkg/translator/zipkin/zipkinv2/to_translator.go:204-528 and
internal/zipkin/attributes.go:

- ids: hex strings; traceId 1..32 hex chars left-padded to 32, span ids
  to 16; ``parentId == id`` means no parent (:211-214).
- ``w3c.tracestate`` tag → trace_state (:207-210).
- kind CLIENT/SERVER/PRODUCER/CONSUMER → OTel 3/2/4/5; otherwise a
  ``span.kind`` tag equal to "internal" → 1, else 0 (:255-273).
- status: ``otel.status_code`` via the exporter's name map (both
  STATUS_CODE_* and Unset/Ok/Error spellings; unknown names → 0, the
  Go map zero value) + ``otel.status_description`` message; an
  ``error`` tag forces code 2 and is REMOVED only when its value is
  exactly "true" (:236-252).
- links: ``otlp.link.N`` tags (N < 128)
  ``traceid|spanid|tracestate|{json}|dropped`` — inner ``|`` inside the
  attribute JSON is rejoined (:275-330); events: annotations whose
  value is ``name|{json}|dropped`` or a bare name (:332-367). Their
  attribute JSON decodes like Go: every number is float64, whole
  floats become ints (jsonMapToAttributeMap :369-383).
- attributes: remaining tags (resource semantic-convention keys move
  to resource_attributes, ``otlp.service.name.source`` renames the
  service key, ``otel.library.name/version`` populate the scope);
  with parse_string_tags=True, tag values typed by the
  DetermineValueType regexes (int ``-?\\d+``, double ``-?\\d+\\.\\d+``,
  bool true/false; map/slice-looking strings stay strings,
  :418-444); endpoint-derived attrs net.host.ip/net.host.port and
  peer.service/net.peer.ip/net.peer.port (:396-416).
- timestamps are µs in zipkin JSON → ns; an absent timestamp maps to
  unix zero + duration with the ``otel.zipkin.absentField.startTime``
  attr set true (:506-528).
- any malformed span (bad hex id, bad link/event JSON, bad dropped
  count) fails the WHOLE document — the zipkinreceiver 400s the POST.

Output matches sources/otlpjson.SPAN_FLAT_SCHEMA column-for-column
(trace_id … scope_name) so zipkin input is interchangeable with the
OTLP JSON/proto codecs; zipkin-specific extras ride in additional
``scope_version``, ``events`` and ``links`` canonical-JSON columns.

Execution: per-row JSON wire decode in a task-based map_batches (same
status as the OTLP-JSON reader), one output row per span, block-local.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

STATUS_CODE_VALUE = {"STATUS_CODE_UNSET": 0, "STATUS_CODE_OK": 1,
                     "STATUS_CODE_ERROR": 2,
                     "Unset": 0, "Ok": 1, "Error": 2}

KIND_MAP = {"CLIENT": 3, "SERVER": 2, "PRODUCER": 4, "CONSUMER": 5}

_HEX_RE = re.compile(r"^[0-9a-fA-F]+$")
_INT_RE = re.compile(r"^-?\d+$")
_DBL_RE = re.compile(r"^-?\d+\.\d+$")
_BOOL_RE = re.compile(r"^(true|false)$")

# getResourceSemanticConventionAttributeNames (:82-170) — v1.15.0 set
RESOURCE_ATTR_KEYS = frozenset("""
cloud.provider cloud.account.id cloud.region cloud.availability_zone
cloud.platform aws.ecs.container.arn aws.ecs.cluster.arn
aws.ecs.launchtype aws.ecs.task.arn aws.ecs.task.family
aws.ecs.task.revision aws.eks.cluster.arn aws.log.group.names
aws.log.group.arns aws.log.stream.names aws.log.stream.arns
container.name container.id container.runtime container.image.name
container.image.tag deployment.environment device.id
device.model.identifier device.model.name device.manufacturer
faas.name faas.id faas.version faas.instance faas.max_memory
host.id host.name host.type host.arch host.image.name host.image.id
host.image.version k8s.cluster.name k8s.node.name k8s.node.uid
k8s.namespace.name k8s.pod.uid k8s.pod.name k8s.container.name
k8s.container.restart_count k8s.replicaset.uid k8s.replicaset.name
k8s.deployment.uid k8s.deployment.name k8s.statefulset.uid
k8s.statefulset.name k8s.daemonset.uid k8s.daemonset.name k8s.job.uid
k8s.job.name k8s.cronjob.uid k8s.cronjob.name os.type os.description
os.name os.version process.pid process.executable.name
process.executable.path process.command process.command_line
process.command_args process.owner process.runtime.name
process.runtime.version process.runtime.description service.name
service.namespace service.instance.id service.version
telemetry.sdk.name telemetry.sdk.language telemetry.sdk.version
telemetry.auto.version webengine.name webengine.version
webengine.description
""".split())

# nonSpanAttributes additions (:173-182)
NON_SPAN_EXTRA = frozenset([
    "otlp.service.name.source", "otel.library.name",
    "otel.library.version", "opencensus.starttime",
    "opencensus.exporterversion", "opencensus.resourcetype"])

START_TIME_ABSENT = "otel.zipkin.absentField.startTime"
NO_SERVICE_NAME = "OTLPResourceNoServiceName"


def _pad_id(s: str, width: int):
    """zipkin hex id → lowercase left-padded hex, or None on error."""
    if not isinstance(s, str) or s == "" or len(s) > width \
            or not _HEX_RE.match(s):
        return None
    return s.lower().rjust(width, "0")


def _exact_id(s: str, width: int):
    """Link-id rule (unmarshalJSON :531-550): empty means unset, any
    other length than the exact hex width is an error."""
    if s == "":
        return ""
    if len(s) != width or not _HEX_RE.match(s):
        return None
    return s.lower()


def _go_attr_json(s: str):
    """json.Unmarshal into map[string]any + jsonMapToAttributeMap:
    numbers are float64, whole floats become ints; only
    string/number/bool survive. None on error."""
    try:
        obj = json.loads(s, parse_int=float)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict):
        return None
    out = {}
    for k, v in obj.items():
        if isinstance(v, str) or isinstance(v, bool):
            out[k] = v
        elif isinstance(v, float):
            out[k] = int(v) if v % 1.0 == 0.0 else v
    return out


def _split_piped(val: str, min_parts: int):
    """name|{json}|dropped with inner '|' rejoined into the json."""
    parts = val.split("|")
    if len(parts) < min_parts:
        return None
    return parts


def _typed_tag(val: str):
    """DetermineValueType + tagsToAttributeMap (:418-444)."""
    if _INT_RE.match(val):
        try:
            return int(val)
        except ValueError:
            return val
    if _DBL_RE.match(val):
        return float(val)
    if _BOOL_RE.match(val):
        return val == "true"
    return val


def zipkin_span_to_flat(zspan: dict, parse_string_tags: bool = False):
    """One zipkin v2 JSON span object → flat row dict, or error str."""
    if not isinstance(zspan, dict):
        return "span is not a JSON object"
    trace_id = _pad_id(zspan.get("traceId"), 32)
    span_id = _pad_id(zspan.get("id"), 16)
    if trace_id is None or span_id is None:
        return "invalid trace/span id"
    parent = zspan.get("parentId")
    parent_id = None
    if parent is not None:
        parent_id = _pad_id(parent, 16)
        if parent_id is None:
            return "invalid parent id"
        if parent_id == span_id:
            parent_id = None

    tags = dict(zspan.get("tags") or {})
    for v in tags.values():
        if not isinstance(v, str):
            return "tag value is not a string"

    trace_state = tags.pop("w3c.tracestate", None)

    # kind
    kind = KIND_MAP.get(zspan.get("kind") or "", None)
    if kind is None:
        sk = tags.pop("span.kind", None)
        kind = 1 if sk == "internal" else 0

    # status
    status_code, status_message = 0, None
    if "otel.status_code" in tags:
        status_code = STATUS_CODE_VALUE.get(tags.pop("otel.status_code"),
                                            0)
        if "otel.status_description" in tags:
            status_message = tags.pop("otel.status_description")
    if "error" in tags:
        status_code = 2
        if tags["error"] == "true":
            del tags["error"]

    # links
    links = []
    for i in range(128):
        key = f"otlp.link.{i}"
        if key not in tags:
            break
        parts = _split_piped(tags.pop(key), 5)
        if parts is None:
            continue
        lt = _exact_id(parts[0], 32)
        ls = _exact_id(parts[1], 16)
        if lt is None or ls is None:
            return "invalid link id"
        attrs = _go_attr_json("|".join(parts[3:-1]))
        if attrs is None:
            return "invalid link attributes"
        if not _INT_RE.match(parts[-1]) or int(parts[-1]) < 0:
            return "invalid link dropped count"
        links.append({"traceId": lt, "spanId": ls,
                      "traceState": parts[2], "attributes": attrs,
                      "droppedAttributesCount": int(parts[-1])})

    # resource + scope
    local = zspan.get("localEndpoint") or {}
    service_name = local.get("serviceName") or NO_SERVICE_NAME
    res_attrs = {}
    scope_name = scope_version = None
    if service_name != NO_SERVICE_NAME:
        sn_source = tags.pop("otlp.service.name.source", None)
        res_attrs[sn_source or "service.name"] = service_name
    if "otel.library.name" in tags:
        scope_name = tags.pop("otel.library.name")
        scope_version = tags.pop("otel.library.version", None)
    for key in list(tags):
        if key in RESOURCE_ATTR_KEYS:
            res_attrs[key] = tags.pop(key)
        elif key in NON_SPAN_EXTRA:
            tags.pop(key)

    # remaining tags → span attributes
    attrs = {}
    for k, v in tags.items():
        attrs[k] = _typed_tag(v) if parse_string_tags else v
    if local.get("ipv4") or local.get("ipv6"):
        attrs["net.host.ip"] = local.get("ipv6") or local.get("ipv4")
    if local.get("port"):
        attrs["net.host.port"] = int(local["port"])
    remote = zspan.get("remoteEndpoint") or {}
    if remote.get("serviceName"):
        attrs["peer.service"] = remote["serviceName"]
    if remote.get("ipv4") or remote.get("ipv6"):
        attrs["net.peer.ip"] = remote.get("ipv6") or remote.get("ipv4")
    if remote.get("port"):
        attrs["net.peer.port"] = int(remote["port"])

    # timestamps (µs in zipkin JSON)
    ts_us = zspan.get("timestamp")
    dur_us = zspan.get("duration") or 0
    if not isinstance(dur_us, int) or isinstance(dur_us, bool):
        return "invalid duration"
    if ts_us is None or ts_us == 0:
        start_ns, end_ns = 0, dur_us * 1000
        attrs[START_TIME_ABSENT] = True
    else:
        if not isinstance(ts_us, int) or isinstance(ts_us, bool):
            return "invalid timestamp"
        start_ns = ts_us * 1000
        end_ns = (ts_us + dur_us) * 1000

    # events (annotations)
    events = []
    for anno in zspan.get("annotations") or []:
        if not isinstance(anno, dict):
            return "invalid annotation"
        ets = anno.get("timestamp") or 0
        val = anno.get("value") or ""
        parts = val.split("|")
        ev = {"name": parts[0], "timeUnixNano": int(ets) * 1000,
              "attributes": {}, "droppedAttributesCount": 0}
        if len(parts) >= 3:
            eattrs = _go_attr_json("|".join(parts[1:-1]))
            if eattrs is None:
                return "invalid annotation attributes"
            if not _INT_RE.match(parts[-1]) or int(parts[-1]) < 0:
                return "invalid annotation dropped count"
            ev["attributes"] = eattrs
            ev["droppedAttributesCount"] = int(parts[-1])
        events.append(ev)

    return {
        "trace_id": trace_id,
        "span_id": span_id,
        "parent_span_id": parent_id,
        "trace_state": trace_state,
        "span_name": zspan.get("name") or "",
        "span_kind": kind,
        "start_time_unix_nano": start_ns,
        "end_time_unix_nano": end_ns,
        "status_code": status_code,
        "status_message": status_message,
        "attributes": json.dumps(attrs, sort_keys=True),
        "resource_attributes": json.dumps(res_attrs, sort_keys=True),
        "scope_name": scope_name,
        "scope_version": scope_version,
        "events": json.dumps(events, sort_keys=True),
        "links": json.dumps(links, sort_keys=True),
    }


_COLS = (("trace_id", pa.string()), ("span_id", pa.string()),
         ("parent_span_id", pa.string()), ("trace_state", pa.string()),
         ("span_name", pa.string()), ("span_kind", pa.int64()),
         ("start_time_unix_nano", pa.int64()),
         ("end_time_unix_nano", pa.int64()),
         ("status_code", pa.int64()), ("status_message", pa.string()),
         ("attributes", pa.string()),
         ("resource_attributes", pa.string()),
         ("scope_name", pa.string()), ("scope_version", pa.string()),
         ("events", pa.string()), ("links", pa.string()))


class _ParseZipkin:
    def __init__(self, json_col: str, parse_string_tags: bool,
                 on_error: str):
        self.json_col = json_col
        self.parse_string_tags = parse_string_tags
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                spans = json.loads(doc if doc is not None else "")
                if not isinstance(spans, list):
                    raise ValueError
            except (ValueError, TypeError):
                spans = "invalid zipkin JSON document"
            rows = []
            if isinstance(spans, str):
                err = spans
            else:
                err = None
                for sp in spans:
                    if sp is None:
                        continue
                    row = zipkin_span_to_flat(sp, self.parse_string_tags)
                    if isinstance(row, str):
                        err = row
                        break
                    rows.append(row)
            if err is not None:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(None)
                cols["error"].append(err)
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


def parse_zipkin_spans(ds, json_col: str = "spans_json", *,
                       parse_string_tags: bool = False,
                       on_error: str = "drop"):
    """Zipkin v2 JSON span arrays → flat span rows (block-local
    fan-out, zero shuffle; schema-compatible with the OTLP codecs)."""
    return ds.map_batches(
        _ParseZipkin(json_col, parse_string_tags, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
