"""datadogsemanticsprocessor analog: stamp ``datadog.*`` semantic
attributes onto span rows.

Parity with processor/datadogsemanticsprocessor/processor.go:20-229:

- ``insertAttrIfMissingOrShouldOverride`` (:20-31): every datadog.*
  stamp writes only when the key is absent, unless
  ``override_incoming_datadog_fields`` is set (which also REMOVES an
  incoming ``datadog.host.name`` resource attr before recomputing it,
  :66-68).
- resource level: ``datadog.service`` (service.name, lowercased, else
  ``otlpresourcenoservicename``), ``datadog.version``
  (service.version else ""), ``datadog.env``
  (deployment.environment.name else deployment.environment else
  "default"), ``datadog.host.name`` (source resolution),
  ``git.commit.sha`` / ``git.repository_url`` from
  vcs.ref.head.revision / vcs.repository.url.full with the scheme
  stripped (:79-93, url.Parse + TrimPrefix(scheme+"://")).
- span level: ``datadog.name`` / ``datadog.resource`` /
  ``datadog.type`` / ``datadog.span.kind`` via the datadog-agent
  traceutil naming algorithms, ``datadog.http_status_code`` when a
  status code attr exists, ``datadog.error`` 0/1 with
  error.msg/type/stack extraction (status2Error :169-209: exception
  events first — case-insensitive "exception" name — then status
  message, then http status code [+ optional http.status_text]).

The GetOTelService / GetOTelOperationNameV2 / GetOTelResourceV2 /
GetOTelSpanType / OTelSpanKindName / source-resolution internals live
in the EXTERNAL datadog-agent + opentelemetry-mapping-go libraries;
they are restated here at the granularity the reference's own
processor_test.go pins (operation.name override, http server/client
request names, messaging/rpc/aws/faas/graphql/protocol fallbacks,
kind-name default, resource.name > "METHOD route" > span name,
web/http/db/cache/custom types, datadog.host.name > host.name source
chain, normalize = lowercase) — documented scope boundary for the
full normalization tables.

Execution: one task-based map_batches over the flat span schema
(attributes / resource_attributes JSON columns mutated in place),
block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

_KIND_NAMES = {0: "unspecified", 1: "internal", 2: "server",
               3: "client", 4: "producer", 5: "consumer"}


def _val(attrs: dict, *keys, normalize=False):
    for k in keys:
        v = attrs.get(k)
        if v is not None and v != "":
            s = v if isinstance(v, str) else (
                "true" if v is True else "false" if v is False else str(v))
            return s.lower() if normalize else s
    return ""


def _span_or_res(sattr, rattr, *keys, normalize=False):
    v = _val(sattr, *keys, normalize=normalize)
    return v or _val(rattr, *keys, normalize=normalize)


def get_otel_service(rattr: dict) -> str:
    """traceutil.GetOTelService(res, normalize=true) — lowercased,
    defaulting to otlpresourcenoservicename."""
    return _val(rattr, "service.name", normalize=True) or \
        "otlpresourcenoservicename"


def get_otel_env(rattr: dict) -> str:
    return _val(rattr, "deployment.environment.name",
                "deployment.environment")


def operation_name_v2(kind: int, sattr: dict) -> str:
    """traceutil.GetOTelOperationNameV2 restated."""
    opname = _val(sattr, "operation.name", normalize=True)
    if opname:
        return opname
    is_client = kind == 3
    is_server = kind == 2
    if _val(sattr, "http.request.method", "http.method"):
        if is_server:
            return "http.server.request"
        if is_client:
            return "http.client.request"
    db = _val(sattr, "db.system.name", "db.system", normalize=True)
    if db and is_client:
        return f"{db}.query"
    msys = _val(sattr, "messaging.system", normalize=True)
    mop = _val(sattr, "messaging.operation.type", "messaging.operation",
               normalize=True)
    if msys and mop and kind in (2, 3, 4, 5):
        return f"{msys}.{mop}"
    rpc = _val(sattr, "rpc.system", normalize=True)
    if rpc == "aws-api" and is_client:
        svc = _val(sattr, "rpc.service", normalize=True)
        return f"aws.{svc}.request" if svc else "aws.client.request"
    if rpc and is_client:
        return f"{rpc}.client.request"
    if rpc and is_server:
        return f"{rpc}.server.request"
    provider = _val(sattr, "faas.invoked_provider", normalize=True)
    invoked = _val(sattr, "faas.invoked_name", normalize=True)
    if provider and invoked and is_client:
        return f"{provider}.{invoked}.invoke"
    trigger = _val(sattr, "faas.trigger", normalize=True)
    if trigger and is_server:
        return f"{trigger}.invoke"
    if _val(sattr, "graphql.operation.type"):
        return "graphql.server.request"
    protocol = _val(sattr, "network.protocol.name", normalize=True)
    if is_server:
        return f"{protocol}.server.request" if protocol \
            else "server.request"
    if is_client:
        return f"{protocol}.client.request" if protocol \
            else "client.request"
    if kind:
        return _KIND_NAMES[kind]
    return "internal"


def resource_v2(kind: int, sattr: dict, rattr: dict,
                span_name: str) -> str:
    """traceutil.GetOTelResourceV2 restated."""
    m = _span_or_res(sattr, rattr, "resource.name")
    if m:
        return m
    method = _span_or_res(sattr, rattr, "http.request.method",
                          "http.method")
    if method:
        if method == "_OTHER":
            method = "HTTP"
        route = _span_or_res(sattr, rattr, "http.route")
        return f"{method} {route}" if route else method
    mop = _span_or_res(sattr, rattr, "messaging.operation.type",
                       "messaging.operation")
    if mop:
        dest = _span_or_res(sattr, rattr, "messaging.destination.name",
                            "messaging.destination")
        return f"{mop} {dest}" if dest else mop
    rpc_method = _span_or_res(sattr, rattr, "rpc.method")
    if rpc_method:
        svc = _span_or_res(sattr, rattr, "rpc.service")
        return f"{rpc_method} {svc}" if svc else rpc_method
    gql = _span_or_res(sattr, rattr, "graphql.operation.type")
    if gql:
        name = _span_or_res(sattr, rattr, "graphql.operation.name")
        return f"{gql} {name}" if name else gql
    stmt = _span_or_res(sattr, rattr, "db.query.text", "db.statement")
    if stmt:
        return stmt
    return span_name or ""


_CACHE_DBS = {"redis", "memcached"}


def span_type(kind: int, sattr: dict, rattr: dict) -> str:
    """traceutil.GetOTelSpanType restated: server → web, client →
    http/db/cache by db.system, everything else custom."""
    if kind == 2:
        return "web"
    if kind == 3:
        db = _span_or_res(sattr, rattr, "db.system.name", "db.system",
                          normalize=True)
        if not db:
            return "http"
        return "cache" if db in _CACHE_DBS else "db"
    return "custom"


def strip_protocol_from_url(raw: str) -> str:
    """processor.go:211-220 — TrimPrefix(scheme + '://')."""
    scheme = ""
    for i, c in enumerate(raw):
        if c == ":":
            scheme = raw[:i]
            break
        if not (c.isalnum() or c in "+-."):
            break
    if scheme and raw.startswith(scheme + "://"):
        return raw[len(scheme) + 3:]
    return raw


def resolve_host_name(rattr: dict) -> str:
    """mapping-go source resolution, restated subset:
    datadog.host.name > host.name; cloud-provider chains are the
    external library's scope."""
    return _val(rattr, "datadog.host.name") or _val(rattr, "host.name")


def status2_error(status_code: int, status_message: str,
                  events: list, sattr: dict) -> tuple[int, dict]:
    """processor.go:169-209."""
    if status_code != 2:
        return 0, {}
    meta: dict = {}
    for ev in events or []:
        if (ev.get("name") or "").lower() != "exception":
            continue
        attrs = ev.get("attributes") or {}
        for src, dst in (("exception.message", "error.msg"),
                         ("exception.type", "error.type"),
                         ("exception.stacktrace", "error.stack")):
            if src in attrs:
                meta[dst] = str(attrs[src])
    if "error.msg" not in meta:
        if status_message:
            meta["error.msg"] = status_message
        else:
            code = _val(sattr, "http.response.status_code",
                        "http.status_code")
            if code:
                text = sattr.get("http.status_text")
                meta["error.msg"] = f"{code} {text}" if text else code
    return 1, meta


class DatadogSemantics:
    def __init__(self, override_incoming_datadog_fields: bool = False):
        self.override = override_incoming_datadog_fields

    def _put(self, attrs: dict, key: str, value):
        if self.override or key not in attrs:
            attrs[key] = value

    def __call__(self, tab: pa.Table) -> pa.Table:
        rows = tab.to_pylist()
        res_out, attr_out = [], []
        for r in rows:
            rattr = json.loads(r.get("resource_attributes") or "{}")
            sattr = json.loads(r.get("attributes") or "{}")
            kind = r.get("span_kind") or 0

            self._put(rattr, "datadog.service", get_otel_service(rattr))
            sv = rattr.get("service.version")
            self._put(rattr, "datadog.version",
                      "" if sv is None else str(sv))
            self._put(rattr, "datadog.env", get_otel_env(rattr)
                      or "default")
            if self.override:
                rattr.pop("datadog.host.name", None)
            self._put(rattr, "datadog.host.name",
                      resolve_host_name(rattr))
            if "vcs.ref.head.revision" in rattr:
                self._put(rattr, "git.commit.sha",
                          str(rattr["vcs.ref.head.revision"]))
            if "vcs.repository.url.full" in rattr:
                self._put(rattr, "git.repository_url",
                          strip_protocol_from_url(
                              str(rattr["vcs.repository.url.full"])))

            self._put(sattr, "datadog.name",
                      operation_name_v2(kind, sattr))
            self._put(sattr, "datadog.resource",
                      resource_v2(kind, sattr, rattr,
                                  r.get("span_name") or ""))
            self._put(sattr, "datadog.type",
                      span_type(kind, sattr, rattr))
            self._put(sattr, "datadog.span.kind", _KIND_NAMES[kind])
            if "vcs.ref.head.revision" in sattr:
                self._put(sattr, "git.commit.sha",
                          str(sattr["vcs.ref.head.revision"]))
            if "vcs.repository.url.full" in sattr:
                self._put(sattr, "git.repository_url",
                          strip_protocol_from_url(
                              str(sattr["vcs.repository.url.full"])))
            code = _val(sattr, "http.response.status_code",
                        "http.status_code")
            if code:
                self._put(sattr, "datadog.http_status_code", code)
            events = json.loads(r.get("events") or "[]")
            dd_error, meta = status2_error(
                r.get("status_code") or 0, r.get("status_message"),
                events, sattr)
            self._put(sattr, "datadog.error", dd_error)
            if dd_error == 1:
                for k in ("error.msg", "error.type", "error.stack"):
                    self._put(sattr, f"datadog.{k}", meta.get(k, ""))

            res_out.append(json.dumps(rattr, sort_keys=True))
            attr_out.append(json.dumps(sattr, sort_keys=True))

        data = {c: tab.column(c) for c in tab.column_names
                if c not in ("attributes", "resource_attributes")}
        data["resource_attributes"] = pa.array(res_out, pa.string())
        data["attributes"] = pa.array(attr_out, pa.string())
        return pa.table(data)


def datadog_semantics(ds, *, override_incoming_datadog_fields=False):
    """Stamp datadog.* semantic attributes onto flat span rows."""
    return ds.map_batches(
        DatadogSemantics(override_incoming_datadog_fields),
        batch_format="pyarrow", zero_copy_batch=True)
