"""azuremonitorexporter analog: flat span/log rows → Application
Insights envelopes.

Parity with exporter/azuremonitorexporter (trace_to_envelope.go,
log_to_envelope.go, conventions.go, contracts_utils.go, time_utils.go):

- span classification (mapIncomingSpanToType:682-713, first match):
  rpc.system → RPC, http.method → HTTP, db.system → Database,
  messaging.system → Messaging, faas.trigger → unsupported (error);
  Server/Consumer spans become RequestData, Client/Producer/Internal
  become RemoteDependencyData (Internal forces Type=InProc; Unspecified
  kind counts as Internal).
- RequestData/RemoteDependencyData defaults: id = span id hex, name =
  span name, duration = DD.HH:MM:SS.UUUUUU, responseCode/resultCode =
  the status-code integer string with success = code != Error; HTTP
  spans override name "{method} {route-or-name}" (request) / "{method}
  [route]" (dependency), response code from http.status_code (success
  100-399), url/data/target from the spec-ordered attribute combos;
  RPC prefixes "{rpc.system} " and uses rpc.grpc.status_code else "0",
  url/data = name, source/target = peer name-over-ip[:port]; Database
  type = db.system, data = statement else operation, target = peer;
  Messaging source/target = messaging.url else peer; unknown spans just
  copy attributes.  EVERY span attribute also lands in properties
  (AsString, floats strconv 'f' -1), plus otel.status_code
  (STATUS_CODE_* names) and otel.status_description when non-empty.
- envelope tags: ai.operation.id/parentId (trace/parent hex),
  ai.user.id from enduser.id, ai.operation.name for requests,
  ai.cloud.role = [service.namespace "."] service.name,
  ai.cloud.roleInstance = service.instance.id, ai.internal.sdkVersion
  (a fixed "otelcol" stand-in for getCollectorVersion); resource attrs
  and scope name/version join properties; span links marshal into the
  _MS.links property ([{operation_Id, id}]).
- span events (:136-180): exception events always export
  (ExceptionData with typeName/message/stack + hasFullStack and
  severity Error), other events only when span_events_enabled
  (MessageData, message = event name); both ride envelopes stamped
  with the event time and ai.operation.parentId = the SPAN's id.
- logs (log_to_envelope.go): MessageData by default (severity number →
  Verbose/Information/Warning/Error/Critical bands, Information
  fallback; body AsString; operation ids from the record);
  custom_events_enabled + microsoft.custom_event.name /
  APPLICATION_INSIGHTS_EVENT_MARKER_ATTRIBUTE → EventData;
  exception_events_enabled + exception.type-or-message → ExceptionData
  with ProblemId = severity text; a zero timestamp falls back to the
  observed time (the reference's time.Now third fallback is a batch
  no-op → zero time).
- contracts.Sanitize truncation (external library, 8k/32k field caps)
  is out of scope — corpus values sit far below the caps (documented).

Envelope JSON uses the public AppInsights bond-schema field order
({ver, name, time, sampleRate, tags, data:{baseType, baseData}}).

Execution: per-row encode in task-based map_batches, one output row
per envelope (span events fan out), block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import GoStruct, go_json
from .opencensus import ns_to_rfc3339_nano

SDK_VERSION = "otelcol"
_STATUS_NAMES = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK",
                 2: "STATUS_CODE_ERROR"}


def _as_string(v) -> str:
    """pcommon.Value.AsString / setAttributeValueAsProperty: floats use
    strconv 'f' -1 (always decimal)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        s = f"{v:.17g}"
        # strconv FormatFloat(v,'f',-1,64): shortest decimal, no exp
        s = repr(v)
        if "e" in s or "E" in s:
            from decimal import Decimal
            s = format(Decimal(s), "f")
        return s
    if isinstance(v, list):
        return json.dumps(v, separators=(",", ":"))
    return "" if v is None else str(v)


def _as_int(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            return None
    return None


def format_duration(ns: int) -> str:
    """time_utils.go formatDuration: DD.HH:MM:SS.UUUUUU."""
    us, _ = divmod(int(ns), 1000)
    s, us = divmod(us, 1_000_000)
    m, s = divmod(s, 60)
    h, m = divmod(m, 60)
    d, h = divmod(h, 24)
    return f"{d:02d}.{h:02d}:{m:02d}:{s:02d}.{us:06d}"


def _span_type(attrs: dict) -> str:
    if not attrs:
        return "unknown"
    if "rpc.system" in attrs:
        return "rpc"
    if "http.method" in attrs:
        return "http"
    if "db.system" in attrs:
        return "db"
    if "messaging.system" in attrs:
        return "messaging"
    if "faas.trigger" in attrs:
        return "faas"
    return "unknown"


def _peer_address(attrs: dict) -> str:
    out = attrs.get("net.peer.name") or attrs.get("net.peer.ip") or ""
    port = _as_int(attrs.get("net.peer.port"))
    if out != "" and port:
        out += f":{port}"
    elif port and out == "":
        out = ""  # Go writes only the port suffix after a name/ip
    return out


def _prefix_slash(s: str) -> str:
    return s if s.startswith("/") else "/" + s


def _http_status(attrs: dict):
    code = _as_int(attrs.get("http.status_code"))
    if code:
        return str(code), 100 <= code <= 399
    return None, None


def _base_properties(attrs: dict) -> dict:
    return {k: _as_string(v) for k, v in attrs.items()
            if isinstance(v, (str, bool, int, float))}


def _envelope(name, time_ns, tags, base_type, base_data) -> GoStruct:
    return GoStruct([
        ("ver", 1),
        ("name", name),
        ("time", ns_to_rfc3339_nano(time_ns)),
        ("sampleRate", 100.0),
        ("tags", tags),
        ("data", GoStruct([("baseType", base_type),
                           ("baseData", base_data)]))])


def _cloud_tags(tags: dict, resource: dict):
    if isinstance(resource.get("service.name"), str):
        role = resource["service.name"]
        if isinstance(resource.get("service.namespace"), str):
            role = resource["service.namespace"] + "." + role
        tags["ai.cloud.role"] = role
    if isinstance(resource.get("service.instance.id"), str):
        tags["ai.cloud.roleInstance"] = resource["service.instance.id"]
    tags["ai.internal.sdkVersion"] = SDK_VERSION


def _apply_common_properties(props: dict, resource: dict,
                             scope_name, scope_version):
    for k, v in resource.items():
        props[k] = v if isinstance(v, str) else _as_string(v)
    if scope_name:
        props["instrumentation_library_name"] = scope_name
    if scope_version:
        props["instrumentation_library_version"] = scope_version


def span_to_envelopes(row: dict, *, span_events_enabled: bool = False
                      ) -> list[str]:
    """spanToEnvelopes (trace_to_envelope.go:52-183)."""
    attrs = json.loads(row.get("attributes") or "{}")
    resource = json.loads(row.get("resource_attributes") or "{}")
    events = json.loads(row.get("events") or "[]")
    links = json.loads(row.get("links") or "[]")
    kind = row.get("span_kind") or 0
    if kind == 0:
        kind = 1  # Unspecified → Internal

    stype = _span_type(attrs)
    if stype == "faas":
        raise ValueError("unsupported Span type")

    status_code = row.get("status_code") or 0
    code_str = str(status_code)
    success = status_code != 2
    duration = format_duration((row.get("end_time_unix_nano") or 0)
                               - (row.get("start_time_unix_nano") or 0))
    sid = row.get("span_id") or ""
    name = row.get("span_name") or ""
    props: dict = {}

    tags = {"ai.operation.id": row.get("trace_id") or "",
            "ai.operation.parentId": row.get("parent_span_id") or ""}
    if isinstance(attrs.get("enduser.id"), str):
        tags["ai.user.id"] = attrs["enduser.id"]

    http_code, http_ok = _http_status(attrs)
    if kind in (2, 5):                       # Server/Consumer → Request
        base_type = "RequestData"
        base = GoStruct([("ver", 2), ("id", sid)])
        data_name = name
        source = url = None
        response_code, ok = code_str, success
        if stype == "http":
            props = _base_properties(attrs)
            if http_code:
                response_code, ok = http_code, http_ok
            method = _as_string(attrs.get("http.method", ""))
            route = attrs.get("http.route")
            data_name = method + " " + (
                _prefix_slash(route) if isinstance(route, str) and route
                else name)
            target = attrs.get("http.target")
            if isinstance(target, str) and target:
                target = _prefix_slash(target)
            scheme = attrs.get("http.scheme")
            host = attrs.get("http.host")
            server_name = attrs.get("http.server_name")
            host_name = attrs.get("net.host.name")
            host_port = _as_int(attrs.get("net.host.port"))
            if scheme and host and target:
                url = f"{scheme}://{host}{target}"
            elif scheme and server_name and host_port and target:
                url = f"{scheme}://{server_name}:{host_port}{target}"
            elif scheme and host_name and host_port and target:
                url = f"{scheme}://{host_name}:{host_port}{target}"
            elif isinstance(attrs.get("http.url"), str):
                url = attrs["http.url"]
            source = (attrs.get("http.client_ip")
                      or attrs.get("net.peer.ip") or None)
        elif stype == "rpc":
            props = _base_properties(attrs)
            grpc = _as_int(attrs.get("rpc.grpc.status_code"))
            response_code = str(grpc) if grpc else "0"
            ok = success
            data_name = _as_string(attrs.get("rpc.system", "")) + " " \
                + name
            url = data_name
            source = _peer_address(attrs) or None
        elif stype == "messaging":
            props = _base_properties(attrs)
            source = (attrs.get("messaging.url")
                      or _peer_address(attrs) or None)
        else:
            props = _base_properties(attrs)
        if source:
            base["source"] = source
        base["name"] = data_name
        base["duration"] = duration
        base["responseCode"] = response_code
        base["success"] = ok
        if url:
            base["url"] = url
        tags["ai.operation.name"] = data_name
    else:                                    # Client/Producer/Internal
        base_type = "RemoteDependencyData"
        base = GoStruct([("ver", 2)])
        data_name = name
        result_code, ok = code_str, success
        dep_data = dep_target = dep_type = None
        if stype == "http":
            props = _base_properties(attrs)
            dep_type = "HTTP"
            if http_code:
                result_code, ok = http_code, http_ok
            method = _as_string(attrs.get("http.method", ""))
            route = attrs.get("http.route")
            data_name = method + (
                " " + route if isinstance(route, str) and route else "")
            target = attrs.get("http.target")
            if isinstance(target, str) and target:
                target = _prefix_slash(target)
            scheme = attrs.get("http.scheme")
            host = attrs.get("http.host")
            peer_name = attrs.get("net.peer.name")
            peer_ip = attrs.get("net.peer.ip")
            peer_port = _as_int(attrs.get("net.peer.port"))
            if isinstance(attrs.get("http.url"), str):
                from urllib.parse import urlparse
                dep_data = attrs["http.url"]
                try:
                    dep_target = urlparse(dep_data).netloc
                except ValueError:
                    dep_target = None
            elif scheme and host and target:
                dep_data = f"{scheme}://{host}{target}"
                dep_target = host
            elif scheme and peer_name and peer_port and target:
                dep_data = f"{scheme}://{peer_name}:{peer_port}{target}"
                dep_target = f"{peer_name}:{peer_port}"
            elif scheme and peer_ip and peer_port and target:
                dep_data = f"{scheme}://{peer_ip}:{peer_port}{target}"
                dep_target = f"{peer_ip}:{peer_port}"
        elif stype == "rpc":
            props = _base_properties(attrs)
            grpc = _as_int(attrs.get("rpc.grpc.status_code"))
            result_code = str(grpc) if grpc else "0"
            ok = success
            dep_data = data_name
            dep_type = _as_string(attrs.get("rpc.system", ""))
            dep_target = _peer_address(attrs) or None
        elif stype == "db":
            props = _base_properties(attrs)
            dep_type = _as_string(attrs.get("db.system", ""))
            dep_data = (attrs.get("db.statement")
                        or attrs.get("db.operation") or None)
            dep_target = _peer_address(attrs) or None
        elif stype == "messaging":
            props = _base_properties(attrs)
            dep_data = attrs.get("messaging.url") or None
            dep_type = _as_string(attrs.get("messaging.system", ""))
            dep_target = (attrs.get("messaging.url")
                          or _peer_address(attrs) or None)
        else:
            props = _base_properties(attrs)
        if kind == 1:
            dep_type = "InProc"
        base["name"] = data_name
        base["id"] = sid
        base["resultCode"] = result_code
        base["duration"] = duration
        base["success"] = ok
        if dep_data:
            base["data"] = dep_data
        if dep_target:
            base["target"] = dep_target
        if dep_type:
            base["type"] = dep_type

    props["otel.status_code"] = _STATUS_NAMES.get(status_code,
                                                  "STATUS_CODE_UNSET")
    if row.get("status_message"):
        props["otel.status_description"] = row["status_message"]
    _apply_common_properties(props, resource, row.get("scope_name"),
                             row.get("scope_version"))
    if links:
        props["_MS.links"] = json.dumps(
            [{"operation_Id": lk.get("traceId") or "",
              "id": lk.get("spanId") or ""} for lk in links],
            separators=(",", ":"))
    _cloud_tags(tags, resource)
    base["properties"] = dict(sorted(props.items()))

    out = [go_json(_envelope(
        f"Microsoft.ApplicationInsights.{base_type[:-4]}",
        row.get("start_time_unix_nano") or 0, dict(sorted(tags.items())),
        base_type, base))]

    for ev in events:
        ev_name = ev.get("name") or ""
        if ev_name != "exception" and not span_events_enabled:
            continue
        ea = ev.get("attributes") or {}
        ev_tags = {"ai.operation.id": row.get("trace_id") or "",
                   "ai.operation.parentId": sid}
        ev_props: dict = {}
        if ev_name == "exception":
            stack = ea.get("exception.stacktrace")
            detail = GoStruct([
                ("typeName", _as_string(ea.get("exception.type", ""))),
                ("message", _as_string(ea.get("exception.message", ""))),
                ("hasFullStack", isinstance(stack, str) and stack != ""),
            ])
            if isinstance(stack, str) and stack:
                detail["stack"] = stack
            ev_props = _base_properties(ea)
            ev_base = GoStruct([("ver", 2),
                                ("exceptions", [detail]),
                                ("severityLevel", 3)])
            base_type = "ExceptionData"
            env_name = "Microsoft.ApplicationInsights.Exception"
        else:
            ev_props = _base_properties(ea)
            ev_base = GoStruct([("ver", 2), ("message", ev_name)])
            base_type = "MessageData"
            env_name = "Microsoft.ApplicationInsights.Message"
        _apply_common_properties(ev_props, resource,
                                 row.get("scope_name"),
                                 row.get("scope_version"))
        ev_base["properties"] = dict(sorted(ev_props.items()))
        _cloud_tags(ev_tags, resource)
        out.append(go_json(_envelope(
            env_name, ev.get("timeUnixNano") or 0,
            dict(sorted(ev_tags.items())), base_type, ev_base)))
    return out


_SEVERITY_BANDS = ((1, 8, 0), (9, 12, 1), (13, 16, 2), (17, 20, 3),
                   (21, 24, 4))


def to_ai_severity_level(sn: int) -> int:
    for lo, hi, level in _SEVERITY_BANDS:
        if lo <= sn <= hi:
            return level
    return 1                       # Information fallback


def log_to_envelope(row: dict, *, custom_events_enabled: bool = False,
                    exception_events_enabled: bool = False) -> str:
    """LogRecordToEnvelope (log_to_envelope.go:86-97)."""
    attrs = json.loads(row.get("attributes") or "{}")
    resource = json.loads(row.get("resource_attributes") or "{}")
    time_ns = (row.get("time_unix_nano")
               or row.get("observed_time_unix_nano") or 0)
    tags: dict = {}
    props: dict = {}
    if custom_events_enabled and (
            "microsoft.custom_event.name" in attrs
            or "APPLICATION_INSIGHTS_EVENT_MARKER_ATTRIBUTE" in attrs):
        ev_name = _as_string(
            attrs.get("microsoft.custom_event.name",
                      attrs.get(
                          "APPLICATION_INSIGHTS_EVENT_MARKER_ATTRIBUTE",
                          "")))
        base = GoStruct([("ver", 2), ("name", ev_name)])
        base_type = "EventData"
        env_name = "Microsoft.ApplicationInsights.Event"
        props = _base_properties(attrs)
    elif exception_events_enabled and (
            "exception.type" in attrs or "exception.message" in attrs):
        stack = attrs.get("exception.stacktrace")
        detail = GoStruct([
            ("typeName", _as_string(attrs.get("exception.type", ""))),
            ("message", _as_string(attrs.get("exception.message", ""))),
            ("hasFullStack", isinstance(stack, str) and stack != "")])
        if isinstance(stack, str) and stack:
            detail["stack"] = stack
        base = GoStruct([
            ("ver", 2), ("exceptions", [detail]),
            ("severityLevel",
             to_ai_severity_level(row.get("severity_number") or 0))])
        if row.get("severity_text"):
            base["problemId"] = row["severity_text"]
        base_type = "ExceptionData"
        env_name = "Microsoft.ApplicationInsights.Exception"
        tags["ai.operation.id"] = row.get("trace_id") or ""
        tags["ai.operation.parentId"] = row.get("span_id") or ""
        props = _base_properties(attrs)
        _apply_common_properties(props, resource,
                                 row.get("scope_name"),
                                 row.get("scope_version"))
        _cloud_tags(tags, resource)
    else:
        base = GoStruct([
            ("ver", 2),
            ("message", _as_string(row.get("body") or "")),
            ("severityLevel",
             to_ai_severity_level(row.get("severity_number") or 0))])
        base_type = "MessageData"
        env_name = "Microsoft.ApplicationInsights.Message"
        tags["ai.operation.id"] = row.get("trace_id") or ""
        tags["ai.operation.parentId"] = row.get("span_id") or ""
        props = {}
        _apply_common_properties(props, resource,
                                 row.get("scope_name"),
                                 row.get("scope_version"))
        _cloud_tags(tags, resource)
        props.update(_base_properties(attrs))
    tags.setdefault("ai.internal.sdkVersion", SDK_VERSION)
    base["properties"] = dict(sorted(props.items()))
    return go_json(_envelope(env_name, time_ns,
                             dict(sorted(tags.items())), base_type,
                             base))


class _SpansToAzure:
    def __init__(self, span_events_enabled, on_error):
        self.span_events_enabled = span_events_enabled
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        parent, docs = [], []
        for i, row in enumerate(rows):
            try:
                envs = span_to_envelopes(
                    row, span_events_enabled=self.span_events_enabled)
            except ValueError:
                if self.on_error == "drop":
                    continue
                raise
            for env in envs:
                parent.append(i)
                docs.append(env)
        out = batch.take(pa.array(parent, pa.int64()))
        return out.append_column("envelope_json",
                                 pa.array(docs, pa.string()))


def spans_to_azuremonitor(ds, *, span_events_enabled: bool = False,
                          on_error: str = "drop"):
    """Flat span rows → AppInsights envelope rows (span events fan
    out); block-local, zero shuffle."""
    return ds.map_batches(
        _SpansToAzure(span_events_enabled, on_error),
        batch_format="pyarrow", zero_copy_batch=True)


class _LogsToAzure:
    def __init__(self, opts):
        self.opts = opts

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        docs = [log_to_envelope(row, **self.opts) for row in rows]
        return batch.append_column("envelope_json",
                                   pa.array(docs, pa.string()))


def logs_to_azuremonitor(ds, *, custom_events_enabled: bool = False,
                         exception_events_enabled: bool = False):
    """Flat log rows → AppInsights envelope rows."""
    opts = {"custom_events_enabled": custom_events_enabled,
            "exception_events_enabled": exception_events_enabled}
    return ds.map_batches(_LogsToAzure(opts),
                          batch_format="pyarrow", zero_copy_batch=True)
