"""zipkinexporter analog: flat OTel span rows → Zipkin v2 JSON spans.

Parity with pkg/translator/zipkin/zipkinv2/from_translator.go (the
exporter's in-tree translation) plus the openzipkin zipkin-go model's
JSON marshal rules (model/span.go — the public library the exporter
serializes through):

- resource attrs → tags with the service-name precedence chain
  (service.name > faas.name > k8s.deployment.name >
  process.executable.name, :278-299), the chosen key deleted and
  non-service.name sources recorded in ``otlp.service.name.source``;
  no resource attrs → ``OTLPResourceNoServiceName`` (:261-276).
- scope name/version → ``otel.library.name``/``otel.library.version``
  tags when non-empty (:86-98).
- span attrs overlay resource/scope tags (:192-202); values AsString.
- empty trace/span id → error; the exporter fails the whole batch
  (FromTraces :38-57) — ``on_error="drop"`` drops the row here,
  documented divergence bounded to invalid-id rows.
- tracestate → ``w3c.tracestate`` tag (:118-121); parent id omitted
  when empty; Sampled is set but NOT serialized (SpanContext json:"-").
- timestamp only when startTime.Unix() != 0 (:130-139); duration only
  when end != 0, as end-start ns (:141-143).
- kind map client/server/producer/consumer; INTERNAL adds the
  ``span.kind: internal`` tag and serializes as no kind (:144-147).
- endpoints (:316-364): local = service name + net.host.ip/port,
  remote = peer.service (overrides, marked redundant) +
  net.peer.ip/port; used keys removed from tags AFTER both endpoints;
  invalid IPs parse to nil but stay redundant; ports ParseUint(10,16)
  → 0 on error; ``serviceName=="" and ip==nil`` → no endpoint; ipv6
  selected by ':' presence (:366-373).
- status (:168-190): Error → ``error: "true"`` tag, any other code
  DELETES a pre-existing error tag; non-Unset adds
  ``otel.status_code`` (STATUS_CODE_OK/ERROR) and a non-empty message
  adds ``otel.status_description`` (zs.Err is json:"-", not on wire).
- events → annotations: bare name when no attrs and no dropped count,
  else ``name|{json.Marshal attrs}|dropped`` (:204-229); links → tags
  ``otlp.link.N`` = ``traceHex|spanHex|tracestate|{json}|dropped``
  with empty-id → "" (:231-243). json.Marshal = sorted keys + HTML
  escapes (awsemf.go_json).
- zipkin-go marshal (model/span.go): span name LOWERCASED; timestamp
  µs (Unix<1 with non-zero time errors); duration <0 errors, (0,1µs)
  clamps to 1µs, else +500ns then truncate to µs; empty endpoints
  omitted; traceId 16 hex when the high half is zero else 32; tag map
  sorted; field order timestamp, duration, traceId, id, parentId,
  name, kind, localEndpoint, remoteEndpoint, annotations, tags.

Execution: one task-based map_batches, one JSON span per row,
block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import go_json, go_json_float

NO_SERVICE_NAME = "OTLPResourceNoServiceName"

_KIND_JSON = {2: "SERVER", 3: "CLIENT", 4: "PRODUCER", 5: "CONSUMER"}

_SERVICE_SOURCES = ("service.name", "faas.name", "k8s.deployment.name",
                    "process.executable.name")


def _as_string(v) -> str:
    """pcommon.Value.AsString over JSON-decoded values."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_json_float(v)
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"), sort_keys=True)
    return str(v)


def _is_ipv4(s: str) -> bool:
    parts = s.split(".")
    if len(parts) != 4:
        return False
    for p in parts:
        if not p.isdigit() or not 0 <= int(p) <= 255 or (
                len(p) > 1 and p[0] == "0"):
            return False
    return True


def _is_ipv6(s: str) -> bool:
    try:
        import ipaddress
        return isinstance(ipaddress.ip_address(s), ipaddress.IPv6Address)
    except ValueError:
        return False


def _endpoint(tags: dict, service_name: str, remote: bool,
              redundant: set):
    """zipkinEndpointFromTags (:316-364)."""
    if remote and "peer.service" in tags:
        service_name = tags["peer.service"]
        redundant.add("peer.service")
    ip_key = "net.peer.ip" if remote else "net.host.ip"
    port_key = "net.peer.port" if remote else "net.host.port"
    ip = None
    ipv6_selected = False
    if ip_key in tags:
        ip_str = tags[ip_key]
        ipv6_selected = ":" in ip_str
        if ipv6_selected:
            ip = ip_str if _is_ipv6(ip_str) else None
        else:
            ip = ip_str if _is_ipv4(ip_str) else None
        redundant.add(ip_key)
    port = 0
    if port_key in tags:
        # strconv.ParseUint(s, 10, 16) with the error IGNORED (:345):
        # syntax errors yield 0, range overflow yields MaxUint16
        s = tags[port_key]
        if s.isdigit():
            port = min(int(s), 0xFFFF)
        redundant.add(port_key)
    if service_name == "" and ip is None:
        return None
    ep = {}
    if service_name:
        ep["serviceName"] = service_name
    if ip is not None:
        ep["ipv6" if ipv6_selected else "ipv4"] = ip
    if port:
        ep["port"] = port
    return ep


def _hex_or_empty(h) -> str:
    if not h or set(h) == {"0"}:
        return ""
    return h


def flat_span_to_zipkin(row: dict):
    """One flat span row → (zipkin v2 JSON object string, None) or
    (None, error)."""
    res_attrs = json.loads(row.get("resource_attributes") or "{}")
    tags: dict = {}
    if res_attrs:
        for k, v in res_attrs.items():
            tags[k] = _as_string(v)
        service_name = NO_SERVICE_NAME
        for i, key in enumerate(_SERVICE_SOURCES):
            if key in tags:
                service_name = tags.pop(key)
                if i > 0:
                    tags["otlp.service.name.source"] = key
                break
    else:
        service_name = NO_SERVICE_NAME

    if row.get("scope_name"):
        tags["otel.library.name"] = row["scope_name"]
    if row.get("scope_version"):
        tags["otel.library.version"] = row["scope_version"]

    for k, v in json.loads(row.get("attributes") or "{}").items():
        tags[k] = _as_string(v)

    trace_id = row.get("trace_id") or ""
    if not trace_id or set(trace_id) == {"0"}:
        return None, "TraceID is invalid"
    span_id = row.get("span_id") or ""
    if not span_id or set(span_id) == {"0"}:
        return None, "SpanID is invalid"

    if row.get("trace_state"):
        tags["w3c.tracestate"] = row["trace_state"]

    parent = row.get("parent_span_id")
    parent_id = None
    if parent and set(parent) != {"0"}:
        parent_id = parent

    start_ns = row.get("start_time_unix_nano") or 0
    end_ns = row.get("end_time_unix_nano") or 0
    timestamp_us = None
    if start_ns // 1_000_000_000 != 0:
        # zipkin-go: non-zero pre-1970 stamps are marshal errors
        if start_ns < 1_000_000_000:
            return None, "ValidTimestampRequired"
        timestamp_us = (start_ns + 500) // 1000
    duration_us = None
    if end_ns != 0:
        dur_ns = end_ns - start_ns
        if dur_ns < 0:
            return None, "ValidDurationRequired"
        if dur_ns < 1000:
            duration_us = 1 if dur_ns > 0 else 0
        else:
            duration_us = (dur_ns + 500) // 1000
        if duration_us == 0:
            duration_us = None  # omitempty

    kind = row.get("span_kind") or 0
    if kind == 1:
        tags["span.kind"] = "internal"

    redundant: set = set()
    local_ep = _endpoint(tags, service_name, False, redundant)
    remote_ep = _endpoint(tags, "", True, redundant)
    for k in redundant:
        tags.pop(k, None)

    status_code = row.get("status_code") or 0
    if status_code == 2:
        tags["error"] = "true"
    else:
        tags.pop("error", None)
    if status_code != 0:
        tags["otel.status_code"] = ("STATUS_CODE_ERROR"
                                    if status_code == 2
                                    else "STATUS_CODE_OK")
        if row.get("status_message"):
            tags["otel.status_description"] = row["status_message"]

    annotations = []
    for ev in json.loads(row.get("events") or "[]"):
        attrs = ev.get("attributes") or {}
        dropped = ev.get("droppedAttributesCount") or 0
        if not attrs and not dropped:
            value = ev.get("name") or ""
        else:
            value = (f"{ev.get('name') or ''}|{go_json(attrs)}|"
                     f"{dropped}")
        annotations.append(
            {"timestamp": (int(ev.get("timeUnixNano") or 0) + 500)
             // 1000, "value": value})

    for i, link in enumerate(json.loads(row.get("links") or "[]")):
        tags[f"otlp.link.{i}"] = (
            f"{_hex_or_empty(link.get('traceId'))}|"
            f"{_hex_or_empty(link.get('spanId'))}|"
            f"{link.get('traceState') or ''}|"
            f"{go_json(link.get('attributes') or {})}|"
            f"{link.get('droppedAttributesCount') or 0}")

    # --- serialize (zipkin-go model/span.go field order) -------------
    if trace_id[:16] == "0" * 16:
        trace_id_out = trace_id[16:]
    else:
        trace_id_out = trace_id

    parts = []
    if timestamp_us is not None:
        parts.append(f'"timestamp":{timestamp_us}')
    if duration_us is not None:
        parts.append(f'"duration":{duration_us}')
    parts.append(f'"traceId":{go_json(trace_id_out)}')
    parts.append(f'"id":{go_json(span_id)}')
    if parent_id is not None:
        parts.append(f'"parentId":{go_json(parent_id)}')
    name = (row.get("span_name") or "").lower()
    if name:
        parts.append(f'"name":{go_json(name)}')
    if kind in _KIND_JSON:
        parts.append(f'"kind":{go_json(_KIND_JSON[kind])}')
    if local_ep is not None:
        parts.append('"localEndpoint":' + _ep_json(local_ep))
    if remote_ep is not None:
        parts.append('"remoteEndpoint":' + _ep_json(remote_ep))
    if annotations:
        parts.append('"annotations":[' + ",".join(
            f'{{"timestamp":{a["timestamp"]},'
            f'"value":{go_json(a["value"])}}}' for a in annotations)
            + "]")
    if tags:
        parts.append('"tags":' + go_json(tags))
    return "{" + ",".join(parts) + "}", None


def _ep_json(ep: dict) -> str:
    parts = []
    for key in ("serviceName", "ipv4", "ipv6"):
        if key in ep:
            parts.append(f'"{key}":{go_json(ep[key])}')
    if "port" in ep:
        parts.append(f'"port":{ep["port"]}')
    return "{" + ",".join(parts) + "}"


class ZipkinEncode:
    def __init__(self, id_cols=("doc_id",), on_error="drop"):
        self.id_cols = tuple(id_cols)
        self.on_error = on_error

    def __call__(self, tab: pa.Table) -> pa.Table:
        rows = tab.to_pylist()
        keep = []
        out = []
        for i, r in enumerate(rows):
            doc, err = flat_span_to_zipkin(r)
            if err is not None:
                if self.on_error == "raise":
                    raise ValueError(err)
                continue
            keep.append(i)
            out.append(doc)
        idx = pa.array(keep, pa.int64())
        data = {c: tab.column(c).take(idx) for c in self.id_cols}
        data["zipkin_json"] = pa.array(out, pa.string())
        return pa.table(data)


def spans_to_zipkin(ds, *, id_cols=("doc_id",), on_error="drop"):
    """Encode flat span rows (the SPAN_FLAT_SCHEMA the zipkin/jaeger/
    OTLP codecs share) as Zipkin v2 JSON span objects — one per row;
    wrap in ``[...]`` per payload for the POST body."""
    return ds.map_batches(ZipkinEncode(id_cols=id_cols,
                                       on_error=on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
