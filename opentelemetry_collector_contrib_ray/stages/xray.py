"""awsxrayexporter analog: flat span rows → X-Ray segment documents.

Parity with exporter/awsxrayexporter/internal/translator (segment.go,
http.go, aws.go, cause.go, sql.go, service.go, span_links.go) and the
internal/aws/xray Segment schema:

- segment vs subsegment: non-server spans with a parent are
  type=subsegment and do NOT store resource attributes
  (segment.go:316-325); client/producer/consumer subsegments with an
  aws.remote.service attribute get namespace=remote (:127-137).
- LOCAL_ROOT handling (aws.span.kind attr, :113-283): a local-root
  dependency span (kind not server/internal) fans out into TWO
  documents — a dependency subsegment (parent re-pointed at a fresh
  service segment id, name from aws.remote.service with the AWS.SDK./
  AWS:: prefix trimmed for aws-api spans, namespace remote, links
  dropped for consumers) and a service segment (the fresh id, name
  from aws.local.service, HTTP/AWS-subsegment fields removed,
  non-otel.resource.* metadata dropped, links dropped for
  non-consumers, the aws.remote.*/remoteTarget/K8s.RemoteNamespace
  annotations removed); a local-root server/internal span emits one
  segment with type/namespace cleared.
- amazon trace id "1-<8 hex epoch>-<24 hex id>" (:545-584); the
  28-day/5-minute epoch validation is skipped by default (the
  exporter's beta feature gate state); validation mode available with
  an explicit ``now`` for determinism.
- segment naming precedence (:355-449): aws.local.service (server /
  local-root internal), aws.remote.service (client/producer/consumer,
  AWS-SDK prefix trim), peer.service, aws.service (+ aws namespace),
  db.name@db-host (jdbc: trimmed), resource service.name (server
  only), rpc.service, http.host, net.peer.name, then the span name
  scrubbed to X-Ray's segment alphabet (200-char cap, "span"
  fallback); namespace aws for rpc.system=aws-api spans, else remote
  for clients.
- http (http.go): both SemConv generations feed request
  method/client_ip/user_agent and response status; url assembled per
  the OTel http-span combinations for server vs client spans with the
  default-port elision; client_ip precedence http.client_ip >
  net.peer.ip > network.peer.address (valid IPs only) with
  client.address overwriting, x_forwarded_for=true when the client ip
  came without a net-peer address; response content_length from
  message.type=RECEIVED event sizes.  Go iterates the attr map
  randomly — this port applies the precedence rules in a fixed
  canonical order (deterministic refinement).
- cause (cause.go): exception events parsed (type/message/stacktrace)
  with per-language stack parsers (java/php, python, javascript,
  dotnet, go); aws-api "HTTP request failure" events become
  aws.http.error.event exceptions with the code@epoch@message string;
  else an error status (or http.status_text) yields a single
  exception; error/fault/throttle from http.status_code 4xx/5xx/429
  with status-code fallback to Fault.  The reference draws random
  exception/segment ids — this port derives them as
  md5(trace_id:span_id:counter)[:16] (deterministic refinement of an
  opaque id).
- aws (aws.go): resource EC2/ECS/Beanstalk/EKS metadata objects (the
  nil fields of EC2/Beanstalk/EKS/LogGroup structs marshal as JSON
  null — no omitempty, mirrored), cloudwatch_logs from log-group
  ARNs > names > config (&-separated string form supported), xray SDK
  metadata ("<name> for <language>"), operation from aws.operation >
  rpc.method, account/region/request_id/queue_url/table_name(+s) from
  the aws.* attribute pairs with SQS/DynamoDB SemConv preference;
  non-AWS cloud.provider drops the whole aws block.
- sql (sql.go): db.system must be a SQL system; url = span name,
  connection_string = (db.connection_string | "localhost") +
  "/" + db.name, sanitized_query = db.statement.
- annotations/metadata (segment.go:590-707): indexed attrs (+
  aws.xray.annotations list) become annotations with keys scrubbed to
  [A-Za-z0-9_] (dots kept — the allowDot gate's beta default);
  everything else lands in metadata.default; aws.xray.metadata.<ns>
  JSON-string attrs open their own namespace; resource attrs stored
  as otel.resource.* (segments only); enduser.id becomes the user
  field.
- JSON: Go json.Marshal struct field order, HTML escaping, float64
  's shortest forms (shared go_json emitter); the reference's
  json.Encoder trailing newline is stripped (transport detail).

Execution: pure per-row encode in a task-based map_batches → one
output row per segment document (local-root dependency spans emit
two), block-local, zero shuffle.
"""

from __future__ import annotations

import hashlib
import ipaddress
import json
import re
import time as _time
from urllib.parse import urlparse

import pyarrow as pa

from .awsemf import GoStruct, go_json

_INVALID_SEGMENT_CHARS = re.compile(r"[^ 0-9\w.:/%&#=+\-@]", re.UNICODE)
# \w covers letters/digits/underscore incl. unicode; Go's class is
# [ 0-9 \p{L} N _ . : / % & # = + \ - @] — close over the corpus.

_SQL_SYSTEMS = {"db2", "derby", "hive", "mariadb", "mssql", "mysql",
                "oracle", "postgresql", "sqlite", "teradata",
                "other_sql"}

_ORIGIN_BY_PLATFORM = {
    "aws_app_runner": "AWS::AppRunner::Service",
    "aws_eks": "AWS::EKS::Container",
    "aws_elastic_beanstalk": "AWS::ElasticBeanstalk::Environment",
    "aws_ec2": "AWS::EC2::Instance",
}

_REMOVE_FOR_SERVICE_SEGMENT = ("aws.remote.service", "aws.remote.operation",
                               "remoteTarget", "K8s.RemoteNamespace")

_KIND_SERVER, _KIND_CLIENT = 2, 3
_KIND_PRODUCER, _KIND_CONSUMER = 4, 5
_KIND_INTERNAL = 1


def _s(v):
    """awsxray.String: '' → omitted (None)."""
    return v if v else None


class _IdGen:
    """Deterministic stand-in for the reference's random segment ids."""

    def __init__(self, trace_id: str, span_id: str):
        self.base = f"{trace_id}:{span_id}"
        self.n = 0

    def __call__(self) -> str:
        self.n += 1
        return hashlib.md5(
            f"{self.base}:{self.n}".encode()).hexdigest()[:16]


def convert_to_amazon_trace_id(trace_id_hex: str, *,
                               skip_validation: bool = True,
                               now: float | None = None) -> str:
    raw = bytes.fromhex((trace_id_hex or "").ljust(32, "0")[:32])
    epoch = int.from_bytes(raw[0:4], "big")
    if not skip_validation:
        now_s = int(now if now is not None else _time.time())
        delta = now_s - epoch
        if delta > 60 * 60 * 24 * 28 or delta < -(60 * 5):
            raise ValueError(f"invalid xray traceid: {trace_id_hex}")
    return f"1-{raw[0:4].hex()}-{raw[4:16].hex()}"


def fix_segment_name(name: str) -> str:
    name = _INVALID_SEGMENT_CHARS.sub("", name or "")
    if len(name) > 200:
        name = name[:200]
    elif not name:
        name = "span"
    return name


def fix_annotation_key(key: str, allow_dot: bool = True) -> str:
    return "".join(
        r if ("0" <= r <= "9" or "A" <= r <= "Z" or "a" <= r <= "z"
              or (allow_dot and r == ".")) else "_"
        for r in key)


def _is_ip(s) -> bool:
    try:
        ipaddress.ip_address(s)
        return True
    except (ValueError, TypeError):
        return False


def _as_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return "" if v is None else str(v)


def _is_aws_sdk(attrs: dict) -> bool:
    return attrs.get("rpc.system") == "aws-api"


def _trim_aws_sdk_prefix(name: str, attrs: dict) -> str:
    if _is_aws_sdk(attrs):
        if name.startswith("AWS.SDK."):
            return name[len("AWS.SDK."):]
        if name.startswith("AWS::"):
            return name[len("AWS::"):]
    return name


# --- http.go ---------------------------------------------------------------

_URL_KEYS = {"http.url", "url.full", "http.scheme", "url.scheme",
             "http.host", "http.target", "http.server_name",
             "net.host.port", "host.name", "net.host.name",
             "net.peer.name", "net.peer.port", "net.peer.ip",
             "url.path", "url.query", "server.address", "server.port"}


def make_http(span_kind: int, attrs: dict, events: list):
    """→ (filtered attrs, http dict or None)."""
    request = GoStruct()
    response = GoStruct()
    url_parts: dict = {}
    filtered: dict = {}
    has_http = False
    has_url_attrs = False
    has_net_peer_addr = False
    client_ip = None

    def put_part(dst_key, v, int_ok=False):
        s = v if isinstance(v, str) else ""
        if not s and int_ok and isinstance(v, int) and not \
                isinstance(v, bool):
            s = str(v)
        url_parts[dst_key] = s

    for key, value in attrs.items():
        if key in ("http.method", "http.request.method"):
            request["method"] = _as_str(value)
            has_http = True
        elif key == "http.client_ip":
            client_ip = _as_str(value)
            has_http = True
        elif key in ("http.user_agent", "user_agent.original"):
            request["user_agent"] = _as_str(value)
            has_http = True
        elif key in ("http.status_code", "http.response.status_code"):
            response["status"] = int(value) if isinstance(
                value, int) and not isinstance(value, bool) else 0
            has_http = True
        elif key in ("http.url", "url.full"):
            put_part("http.url", value)
            has_http = True
            has_url_attrs = True
        elif key in ("http.scheme", "url.scheme"):
            put_part("http.scheme", value)
            has_http = True
        elif key == "http.host":
            put_part(key, value)
            has_http = True
            has_url_attrs = True
        elif key in ("http.target", "url.path", "url.query"):
            put_part(key, value)
            has_http = True
        elif key == "http.server_name":
            put_part(key, value)
            has_http = True
            has_url_attrs = True
        elif key in ("net.host.port", "net.peer.port", "server.port"):
            put_part(key, value, int_ok=True)
        elif key in ("host.name", "net.host.name", "net.peer.name",
                     "server.address"):
            put_part(key, value)
            has_url_attrs = True
        elif key == "net.peer.ip":
            put_part(key, value)
            has_url_attrs = True
            has_net_peer_addr = True
        elif key == "network.peer.address":
            if _is_ip(value):
                has_url_attrs = True
                has_net_peer_addr = True
        elif key == "client.address":
            pass
        else:
            filtered[key] = value

    # client_ip precedence in a fixed order (Go map order is random):
    # http.client_ip > net.peer.ip > network.peer.address; then
    # client.address overwrites when it is a valid IP.
    if client_ip is None and isinstance(attrs.get("net.peer.ip"), str):
        client_ip = attrs["net.peer.ip"]
    if client_ip is None and _is_ip(attrs.get("network.peer.address")):
        client_ip = attrs["network.peer.address"]
    if _is_ip(attrs.get("client.address")):
        client_ip = attrs["client.address"]
    if client_ip:
        request["client_ip"] = client_ip

    if not has_net_peer_addr and client_ip:
        request["x_forwarded_for"] = True

    if not has_http:
        return filtered, None

    if has_url_attrs:
        if span_kind == _KIND_SERVER:
            request["url"] = _construct_url(url_parts, server=True)
        else:
            request["url"] = _construct_url(url_parts, server=False)

    size = 0
    for ev in events or []:
        ea = ev.get("attributes") or {}
        if ea.get("message.type") == "RECEIVED":
            v = ea.get("messaging.message.payload_size_bytes")
            if isinstance(v, int) and not isinstance(v, bool) and v:
                size = v
                break
    response["content_length"] = size

    # Go struct key order: x_forwarded_for, method, url, user_agent,
    # client_ip / status, content_length
    req = GoStruct()
    for k in ("x_forwarded_for", "method", "url", "user_agent",
              "client_ip"):
        if k in request:
            req[k] = request[k]
    resp = GoStruct()
    for k in ("status", "content_length"):
        if k in response:
            resp[k] = response[k]
    return filtered, GoStruct([("request", req), ("response", resp)])


def _construct_url(parts: dict, *, server: bool) -> str:
    if "http.url" in parts:
        return parts["http.url"]
    scheme = parts.get("http.scheme") or "http"
    port = ""
    host = parts.get("http.host", "")
    if not host:
        if server:
            host = (parts.get("http.server_name")
                    or parts.get("net.host.name")
                    or parts.get("host.name")
                    or parts.get("server.address", ""))
            port = parts.get("net.host.port") or \
                parts.get("server.port", "")
        else:
            host = parts.get("net.peer.name") or \
                parts.get("net.peer.ip", "")
            port = parts.get("net.peer.port", "")
    url = f"{scheme}://{host}"
    if port and not (scheme == "http" and port == "80") and not \
            (scheme == "https" and port == "443"):
        url += ":" + port
    if "http.target" in parts:
        url += parts["http.target"]
    else:
        url += parts.get("url.path", "/")
        query = parts.get("url.query")
        if query:
            if not query.startswith("?"):
                query = "?" + query
            url += query
    return url


# --- cause.go ----------------------------------------------------------------

def _parse_exception(ex_type, message, stacktrace, is_remote, language,
                     idgen):
    # cause.go uses aws.String (pointer-to-"" is non-nil): message and
    # type emit even when empty
    ex = GoStruct([("id", idgen()), ("message", message or ""),
                   ("type", ex_type or ""), ("remote", is_remote)])
    exceptions = [ex]
    if not stacktrace:
        return exceptions
    if language in ("java", "php"):
        exceptions = _java_stack(stacktrace, exceptions, idgen)
    elif language == "python":
        exceptions = _python_stack(stacktrace, exceptions, idgen)
    elif language == "javascript":
        exceptions = _js_stack(stacktrace, exceptions)
    elif language == "dotnet":
        exceptions = _dotnet_stack(stacktrace, exceptions)
    elif language == "go":
        exceptions = _go_stack(stacktrace, exceptions)
    return exceptions


def _frame(path, label, line):
    fr = GoStruct()
    if path:
        fr["path"] = path
    fr["line"] = line
    if label:
        fr["label"] = label
    return fr


def _java_stack(st: str, exceptions, idgen):
    lines = st.splitlines()
    ex = exceptions[0]
    is_remote = ex.get("remote")
    if len(lines) < 2:
        return exceptions
    stack = []
    i = 1
    while i is not None and i < len(lines):
        line = lines[i]
        if line.startswith("\tat "):
            paren = line.find("(")
            if paren >= 0 and line.endswith(")"):
                label = line[len("\tat "):paren]
                slash = label.find("/")
                if slash >= 0:
                    label = label[slash + 1:]
                path = line[paren + 1:-1]
                lno = 0
                colon = path.find(":")
                if colon >= 0:
                    try:
                        lno = int(path[colon + 1:])
                    except ValueError:
                        lno = 0
                    path = path[:colon]
                stack.append(_frame(path, label, lno))
        elif line.startswith("Caused by: "):
            cause_type = line[len("Caused by: "):]
            colon = cause_type.find(":")
            cause_msg = ""
            if colon >= 0:
                cause_msg = cause_type[colon + 2:]
                cause_type = cause_type[:colon]
            i += 1
            while i < len(lines):
                nxt = lines[i]
                if nxt.startswith("\tat ") and "(" in nxt and \
                        nxt.endswith(")"):
                    break
                cause_msg += nxt
                i += 1
            new_ex = GoStruct([("id", idgen()),
                               ("message", cause_msg),
                               ("type", cause_type),
                               ("remote", is_remote)])
            ex["cause"] = new_ex["id"]
            if stack:
                ex["stack"] = stack
            exceptions.append(new_ex)
            ex = new_ex
            stack = []
            continue
        i += 1
    if stack:
        ex["stack"] = stack
    return exceptions


def _python_stack(st: str, exceptions, idgen):
    lines = st.split("\n")
    idx = len(lines) - 2
    if idx < 0:
        return exceptions
    ex = exceptions[0]
    is_remote = ex.get("remote")
    stack = []
    while idx >= 0:
        line = lines[idx]
        if line.startswith("  File "):
            parts = line.split(",")
            if len(parts) == 3:
                file = parts[0][8:-1]
                lno = 0
                if parts[1].startswith(" line "):
                    try:
                        lno = int(parts[1][6:])
                    except ValueError:
                        lno = 0
                label = parts[2][4:] if parts[2].startswith(" in ") else ""
                stack.append(_frame(file, label, lno))
        elif line.startswith("During handling of the above exception,"
                             " another exception occurred:"):
            nxt = idx - 1
            while nxt >= 0 and not lines[nxt].startswith("  File "):
                nxt -= 1
            if nxt < 0:
                break
            message = "\n".join(lines[nxt + 2:idx - 1])
            idx = nxt
            colon = message.find(":")
            if colon < 0:
                break
            new_ex = GoStruct([("id", idgen()),
                               ("message", message[colon + 2:]),
                               ("type", message[:colon]),
                               ("remote", is_remote)])
            ex["cause"] = new_ex["id"]
            if stack:
                ex["stack"] = stack
            exceptions.append(new_ex)
            ex = new_ex
            stack = []
            continue
        idx -= 1
    if stack:
        ex["stack"] = stack
    return exceptions


def _js_stack(st: str, exceptions):
    lines = st.splitlines()
    ex = exceptions[0]
    stack = []
    for line in lines[1:]:
        if not line.startswith("    at "):
            continue
        paren = line.find("(")
        label, path, lno = "", "", 0
        if paren >= 0 and line.endswith(")"):
            label = line[7:paren]
            path = line[paren + 1:-1]
        elif paren < 0:
            path = line[7:]
        c1 = path.find(":")
        c2 = path.find(":", c1 + 1) if c1 >= 0 else -1
        if c1 >= 0 and c2 >= 0 and c1 != c2:
            try:
                lno = int(path[c1 + 1:c2])
            except ValueError:
                lno = 0
            path = path[:c1]
        elif c1 < 0 and "native" in path:
            path = "native"
        if path or label or lno:
            stack.append(_frame(path, label, lno))
    if stack:
        ex["stack"] = stack
    return exceptions


def _dotnet_stack(st: str, exceptions):
    lines = st.splitlines()
    ex = exceptions[0]
    stack = []
    for raw in lines[1:]:
        line = raw.strip()
        if not line.startswith("at "):
            continue
        if " in " in line:
            parts = line.split(" in ")
            label = parts[0][len("at "):]
            path = parts[1]
            lno = 0
            colon = parts[1].rfind(":")
            if colon >= 0:
                line_str = path[colon + 1:]
                if line_str.startswith("line"):
                    line_str = line_str[5:]
                path = path[:colon]
                try:
                    lno = int(line_str)
                except ValueError:
                    lno = 0
            stack.append(_frame(path, label, lno))
        else:
            idx = line.rfind(")")
            if idx >= 0:
                stack.append(_frame("", line[len("at "):idx + 1], 0))
    if stack:
        ex["stack"] = stack
    return exceptions


_GO_GOROUTINE_RE = re.compile(r"^goroutine.*\brunning\b.*:$")
_GO_PLN_RE = re.compile(r"([^:\s]+):(\d+)")


def _go_stack(st: str, exceptions):
    lines = st.splitlines()
    ex = exceptions[0]
    stack = []
    i = 1
    path, lno = "", 0
    while i < len(lines):
        line = lines[i]
        if _GO_GOROUTINE_RE.match(line):
            i += 1
            if i >= len(lines):
                break
            line = lines[i]
        label = line
        i += 1
        nxt = lines[i] if i < len(lines) else ""
        m = _GO_PLN_RE.search(nxt)
        if m:
            path = m.group(1)
            lno = int(m.group(2))
        stack.append(_frame(path, label, lno))
        i += 1
    if stack:
        ex["stack"] = stack
    return exceptions


def make_cause(status_code, status_message, attrs: dict, events: list,
               resource: dict, span_kind: int, idgen,
               span_attrs: dict | None = None):
    """→ (is_error, is_fault, is_throttle, filtered attrs, cause).
    ``span_attrs`` is the UNfiltered span attribute map — Go reads the
    http status code from span.Attributes(), not the filtered set."""
    if span_attrs is None:
        span_attrs = attrs
    filtered = attrs
    is_aws_sdk = _is_aws_sdk(attrs)
    has_exc = any((ev.get("name") == "exception") or
                  (is_aws_sdk and ev.get("name") == "HTTP request failure")
                  for ev in events or [])
    cause = None
    if has_exc:
        language = resource.get("telemetry.sdk.language", "")
        is_remote = span_kind in (_KIND_CLIENT, _KIND_PRODUCER)
        exceptions = []
        for ev in events or []:
            ea = ev.get("attributes") or {}
            if ev.get("name") == "exception":
                exceptions.extend(_parse_exception(
                    _as_str(ea.get("exception.type")),
                    _as_str(ea.get("exception.message")),
                    _as_str(ea.get("exception.stacktrace")),
                    is_remote, language, idgen))
            elif is_aws_sdk and ev.get("name") == "HTTP request failure":
                code = ea.get("http.response.status_code")
                msg = ea.get("aws.http.error_message")
                if code is not None and msg is not None:
                    epoch_us = (ev.get("timeUnixNano") or 0) // 1000
                    message = "@".join([
                        _as_str(code),
                        f"{epoch_us / 1_000_000:.6f}", _as_str(msg)])
                    exceptions.append(GoStruct([
                        ("id", idgen()), ("message", message),
                        ("type", "aws.http.error.event"),
                        ("remote", True)]))
        cause = GoStruct([("exceptions", exceptions)])
    elif status_code == 2:
        message = status_message or ""
        filtered = {}
        for key, value in attrs.items():
            if key == "http.status_text":
                if not message:
                    message = _as_str(value)
            else:
                filtered[key] = value
        if message:
            # Exception{ID, Type: aws.String(""), Message: ...}: the
            # empty type pointer still marshals ("type":"")
            ex = GoStruct([("id", idgen()), ("message", message),
                           ("type", "")])
            cause = GoStruct([("exceptions", [ex])])

    code = span_attrs.get("http.status_code")
    if not isinstance(code, int) or isinstance(code, bool):
        code = span_attrs.get("http.response.status_code")
    has_code = isinstance(code, int) and not isinstance(code, bool)

    is_throttle = is_error = is_fault = False
    if not has_code or code < 400 or code > 599:
        if status_code == 2:
            is_fault = True
    elif 400 <= code <= 499:
        is_error = True
        if code == 429:
            is_throttle = True
    elif 500 <= code <= 599:
        is_fault = True
    return is_error, is_fault, is_throttle, filtered, cause


# --- aws.go -------------------------------------------------------------------

def _log_group_slice(v):
    if isinstance(v, str):
        return [x for x in v.split("&") if x]
    if isinstance(v, list):
        return [x for x in v]
    return []


def make_aws(attrs: dict, resource: dict, log_group_names):
    filtered = {}
    r = resource
    cloud = r.get("cloud.provider", "")
    service = r.get("cloud.platform", "")
    account = _as_str(r.get("cloud.account.id", ""))
    operation = ""
    remote_region = request_id = queue_url = table_name = ""
    table_names = None

    if "aws.operation" in attrs:
        operation = _as_str(attrs["aws.operation"])
    elif "rpc.method" in attrs:
        operation = _as_str(attrs["rpc.method"])

    for key, value in attrs.items():
        if key in ("rpc.method", "aws.operation"):
            continue
        if key == "aws.account_id":
            if value is not None:
                account = _as_str(value)
        elif key == "aws.region":
            remote_region = _as_str(value)
        elif key in ("aws.request_id", "aws.requestId"):
            request_id = _as_str(value)
        elif key in ("aws.queue_url", "aws.queue.url"):
            queue_url = _as_str(value)
        elif key in ("aws.table_name", "aws.table.name"):
            table_name = _as_str(value)
        else:
            filtered[key] = value

    if cloud not in ("aws", ""):
        return filtered, None

    if "messaging.url" in attrs:
        queue_url = _as_str(attrs["messaging.url"])
    tv = attrs.get("aws.dynamodb.table_names")
    if isinstance(tv, list):
        if len(tv) == 1:
            table_name = _as_str(tv[0])
        elif len(tv) > 1:
            table_name = ""
            table_names = [_as_str(x) for x in tv]
    elif isinstance(tv, str):
        table_name = tv

    ec2 = ecs = ebs = eks = None
    host_id = _as_str(r.get("host.id", ""))
    if service == "aws_ec2" or host_id:
        ec2 = GoStruct([
            ("instance_id", _s(host_id)),
            ("availability_zone",
             _s(_as_str(r.get("cloud.availability_zone", "")))),
            ("instance_size", _s(_as_str(r.get("host.type", "")))),
            ("ami_id", _s(_as_str(r.get("host.image.id", ""))))])
    if service == "aws_ecs":
        ecs = GoStruct()
        for k, src in (("container", "container.name"),
                       ("container_id", "container.id"),
                       ("task_arn", "aws.ecs.task.arn"),
                       ("task_family", "aws.ecs.task.family"),
                       ("cluster_arn", "aws.ecs.cluster.arn"),
                       ("container_arn", "aws.ecs.container.arn"),
                       ("availability_zone", "cloud.availability_zone"),
                       ("launch_type", "aws.ecs.launchtype")):
            v = _as_str(r.get(src, ""))
            if v:
                ecs[k] = v
    deploy_id = _as_str(r.get("service.instance.id", ""))
    if service == "aws_elastic_beanstalk" and deploy_id:
        try:
            deploy_num = int(deploy_id)
        except ValueError:
            deploy_num = 0
        ebs = GoStruct([
            ("environment_name",
             _s(_as_str(r.get("service.namespace", "")))),
            ("version_label", _s(_as_str(r.get("service.version", "")))),
            ("deployment_id", deploy_num)])
    cluster_name = _as_str(r.get("k8s.cluster.name", ""))
    if service == "aws_eks" or cluster_name:
        eks = GoStruct([
            ("cluster_name", _s(cluster_name)),
            ("pod", _s(_as_str(r.get("k8s.pod.name", "")))),
            ("container_id", _s(_as_str(r.get("container.id", ""))))])

    cwl = None
    arns = _log_group_slice(r.get("aws.log.group.arns"))
    names = _log_group_slice(r.get("aws.log.group.names"))
    if arns:
        cwl = [GoStruct([("log_group", _s(_parse_log_group(a))),
                         ("arn", a)]) for a in arns]
    elif names:
        cwl = [GoStruct([("log_group", n)]) for n in names]
    elif log_group_names:
        cwl = [GoStruct([("log_group", n)]) for n in log_group_names]

    sdk_name = _as_str(r.get("telemetry.sdk.name", ""))
    sdk_language = _as_str(r.get("telemetry.sdk.language", ""))
    sdk = (f"{sdk_name} for {sdk_language}"
           if sdk_name and sdk_language else sdk_name)
    auto = (_as_str(r.get("telemetry.auto.version", "")) or
            _as_str(r.get("telemetry.distro.version", "")))
    xray_meta = GoStruct()
    if sdk:
        xray_meta["sdk"] = sdk
    if r.get("telemetry.sdk.version"):
        xray_meta["sdk_version"] = _as_str(r["telemetry.sdk.version"])
    xray_meta["auto_instrumentation"] = auto != ""

    aws = GoStruct()
    if ebs is not None:
        aws["elastic_beanstalk"] = ebs
    if cwl is not None:
        aws["cloudwatch_logs"] = cwl
    if ecs is not None:
        aws["ecs"] = ecs
    if ec2 is not None:
        aws["ec2"] = ec2
    if eks is not None:
        aws["eks"] = eks
    aws["xray"] = xray_meta
    for k, v in (("account_id", account), ("operation", operation),
                 ("region", remote_region), ("request_id", request_id),
                 ("queue_url", queue_url), ("table_name", table_name)):
        if v:
            aws[k] = v
    if table_names:
        aws["table_names"] = table_names
    return filtered, aws


def _parse_log_group(arn: str) -> str:
    parts = arn.split(":")
    return parts[6] if len(parts) >= 7 else arn


# --- sql.go --------------------------------------------------------------------

def make_sql(span_name: str, attrs: dict):
    filtered = {}
    db = {k: "" for k in ("conn", "system", "name", "stmt", "user")}
    for key, value in attrs.items():
        if key == "db.connection_string":
            db["conn"] = _as_str(value)
        elif key == "db.system":
            db["system"] = _as_str(value)
        elif key == "db.name":
            db["name"] = _as_str(value)
        elif key == "db.statement":
            db["stmt"] = _as_str(value)
        elif key == "db.user":
            db["user"] = _as_str(value)
        else:
            filtered[key] = value
    if db["system"] not in _SQL_SYSTEMS:
        return attrs, None
    conn = (db["conn"] or "localhost") + "/" + db["name"]
    sql = GoStruct([("connection_string", conn)])
    if span_name:
        sql["url"] = span_name
    if db["stmt"]:
        sql["sanitized_query"] = db["stmt"]
    sql["database_type"] = db["system"]
    if db["user"]:
        sql["user"] = db["user"]
    # reorder to struct order: connection_string, url,
    # sanitized_query, database_type, user — already in that order
    return filtered, sql


# --- annotations / metadata -------------------------------------------------------

def make_xray_attributes(attrs: dict, resource: dict, store_resource,
                         indexed, index_all, allow_dot=True):
    user = ""
    attrs = dict(attrs)
    if "enduser.id" in attrs:
        user = _as_str(attrs.pop("enduser.id"))
    if not attrs and (not store_resource or not resource):
        return user, None, None

    annotations: dict = {}
    metadata: dict = {}
    default_meta: dict = {}
    indexed_keys = {} if index_all else {k: True for k in indexed}
    anno_list = attrs.pop("aws.xray.annotations", None)
    if isinstance(anno_list, list):
        for v in anno_list:
            if isinstance(v, str):
                indexed_keys[v] = True
    elif anno_list is not None:
        attrs["aws.xray.annotations"] = anno_list

    if store_resource:
        for key, value in resource.items():
            key = "otel.resource." + key
            is_anno = isinstance(value, (str, int, float, bool))
            if is_anno and (index_all or indexed_keys.get(key)):
                annotations[fix_annotation_key(key, allow_dot)] = value
            elif value is not None:
                default_meta[key] = value

    if index_all:
        for key, value in attrs.items():
            if isinstance(value, (str, int, float, bool)):
                annotations[fix_annotation_key(key, allow_dot)] = value
    else:
        for key, value in attrs.items():
            if indexed_keys.get(key):
                if isinstance(value, (str, int, float, bool)):
                    annotations[fix_annotation_key(key,
                                                   allow_dot)] = value
            elif key.startswith("aws.xray.metadata.") and \
                    isinstance(value, str):
                namespace = key[len("aws.xray.metadata."):]
                try:
                    meta_val = json.loads(value)
                    if not isinstance(meta_val, dict):
                        raise ValueError
                except ValueError:
                    default_meta[key] = value
                    continue
                if namespace.lower() == "default":
                    default_meta.update(meta_val)
                else:
                    metadata[namespace] = meta_val
            elif value is not None:
                default_meta[key] = value

    if default_meta:
        metadata["default"] = default_meta
    return (user, annotations or None, metadata or None)


# --- segment assembly --------------------------------------------------------------

_ORIGIN_ORDER = ("aws_app_runner", "aws_eks", "aws_elastic_beanstalk",
                 "aws_ecs", "aws_ec2")


def determine_aws_origin(resource: dict) -> str:
    if not resource:
        return ""
    provider = resource.get("cloud.provider")
    if provider is not None and provider != "aws":
        return ""
    platform = resource.get("cloud.platform")
    if platform is None:
        return ""
    if platform == "aws_ecs":
        lt = resource.get("aws.ecs.launchtype")
        if lt == "ec2":
            return "AWS::ECS::EC2"
        if lt == "fargate":
            return "AWS::ECS::Fargate"
        return "AWS::ECS::Container"
    return _ORIGIN_BY_PLATFORM.get(platform, "")


def make_segment(row: dict, *, indexed_attrs=(), index_all_attrs=False,
                 log_group_names=(), skip_timestamp_validation=True,
                 allow_dot=True, idgen=None) -> GoStruct:
    """MakeSegment (segment.go:316-478) over one flat span row."""
    attrs = json.loads(row.get("attributes") or "{}")
    resource = json.loads(row.get("resource_attributes") or "{}")
    events = json.loads(row.get("events") or "[]")
    links = json.loads(row.get("links") or "[]")
    kind = row.get("span_kind") or 0
    parent = row.get("parent_span_id") or ""
    if idgen is None:
        idgen = _IdGen(row.get("trace_id") or "",
                       row.get("span_id") or "")

    segment_type = ""
    store_resource = True
    if kind != _KIND_SERVER and parent:
        segment_type = "subsegment"
        store_resource = False

    trace_id = convert_to_amazon_trace_id(
        row.get("trace_id") or "",
        skip_validation=skip_timestamp_validation)

    start = (row.get("start_time_unix_nano") or 0) / 1e9
    end = (row.get("end_time_unix_nano") or 0) / 1e9
    httpfiltered, http = make_http(kind, attrs, events)
    is_error, is_fault, is_throttle, causefiltered, cause = make_cause(
        row.get("status_code") or 0, row.get("status_message"),
        httpfiltered, events, resource, kind, idgen, span_attrs=attrs)
    origin = determine_aws_origin(resource)
    awsfiltered, aws = make_aws(causefiltered, resource, log_group_names)
    version = (resource.get("service.version")
               or resource.get("container.image.tag"))
    service = GoStruct([("version", _as_str(version))]) \
        if version is not None else None
    sqlfiltered, sql = make_sql(row.get("span_name") or "", awsfiltered)
    additional = dict(sqlfiltered)
    for name in indexed_attrs:
        if name not in additional and name in attrs:
            additional[name] = attrs[name]
    user, annotations, metadata = make_xray_attributes(
        additional, resource, store_resource, indexed_attrs,
        index_all_attrs, allow_dot)
    span_links = _make_span_links(links, skip_timestamp_validation)

    name = ""
    namespace = ""
    if kind == _KIND_SERVER and isinstance(
            attrs.get("aws.local.service"), str):
        name = attrs["aws.local.service"]
    if kind == _KIND_INTERNAL and \
            attrs.get("aws.span.kind") == "LOCAL_ROOT" and \
            isinstance(attrs.get("aws.local.service"), str):
        name = attrs["aws.local.service"]
    if kind in (_KIND_CLIENT, _KIND_PRODUCER, _KIND_CONSUMER) and \
            isinstance(attrs.get("aws.remote.service"), str):
        name = _trim_aws_sdk_prefix(attrs["aws.remote.service"], attrs)
    if not name and isinstance(attrs.get("peer.service"), str):
        name = attrs["peer.service"]
    if _is_aws_sdk(attrs):
        namespace = "aws"
    if not name and isinstance(attrs.get("aws.service"), str):
        name = attrs["aws.service"]
        if not namespace:
            namespace = "aws"
    if not name and isinstance(attrs.get("db.name"), str):
        name = attrs["db.name"]
        db_url = attrs.get("db.connection_string")
        if isinstance(db_url, str):
            s = db_url[5:] if db_url.startswith("jdbc:") else db_url
            try:
                host = urlparse(s).hostname
            except ValueError:
                host = None
            if host:
                name += "@" + host
    if not name and kind == _KIND_SERVER and \
            isinstance(resource.get("service.name"), str):
        name = resource["service.name"]
    if not name and isinstance(attrs.get("rpc.service"), str):
        name = attrs["rpc.service"]
    if not name and isinstance(attrs.get("http.host"), str):
        name = attrs["http.host"]
    if not name and isinstance(attrs.get("net.peer.name"), str):
        name = attrs["net.peer.name"]
    if not name:
        name = fix_segment_name(row.get("span_name") or "")
    if not namespace and kind == _KIND_CLIENT:
        namespace = "remote"

    seg = GoStruct()
    seg["name"] = name or None
    seg["id"] = _s(row.get("span_id") or "")
    seg["start_time"] = start
    if service is not None:
        seg["service"] = service
    if origin:
        seg["origin"] = origin
    if user:
        seg["user"] = user
    if span_links:
        seg["links"] = span_links
    seg["trace_id"] = trace_id
    seg["end_time"] = end
    if http is not None:
        seg["http"] = http
    seg["fault"] = is_fault
    seg["error"] = is_error
    seg["throttle"] = is_throttle
    if cause is not None:
        seg["cause"] = cause
    if aws is not None:
        seg["aws"] = aws
    if annotations:
        seg["annotations"] = annotations
    if metadata:
        seg["metadata"] = metadata
    if namespace:
        seg["namespace"] = namespace
    if parent:
        seg["parent_id"] = parent
    if segment_type:
        seg["type"] = segment_type
    if sql is not None:
        seg["sql"] = sql
    return seg


def _make_span_links(links: list, skip_validation: bool):
    out = []
    for lk in links or []:
        ld = GoStruct()
        ld.update({
            "trace_id": convert_to_amazon_trace_id(
                lk.get("traceId") or "", skip_validation=skip_validation),
            "id": lk.get("spanId") or "",
        })
        lattrs = lk.get("attributes") or {}
        if lattrs:
            ld["attributes"] = lattrs
        # struct order: trace_id, id, attributes (SpanLinkData)
        out.append(ld)
    return out


def make_segments_from_span(row: dict, **opts) -> list[GoStruct]:
    """MakeSegmentsFromSpan: LOCAL_ROOT spans may fan out into a
    dependency subsegment + a service segment (segment.go:113-283)."""
    attrs = json.loads(row.get("attributes") or "{}")
    idgen = _IdGen(row.get("trace_id") or "", row.get("span_id") or "")
    kind = row.get("span_kind") or 0
    if attrs.get("aws.span.kind") != "LOCAL_ROOT":
        seg = make_segment(row, idgen=idgen, **opts)
        if kind in (_KIND_CLIENT, _KIND_CONSUMER, _KIND_PRODUCER) and \
                "type" in seg and "namespace" not in seg and \
                "aws.remote.service" in attrs:
            # insert namespace in struct position (before parent_id)
            seg = _with_namespace(seg, "remote")
        return [seg]
    if kind in (_KIND_SERVER, _KIND_INTERNAL):
        seg = make_segment(row, idgen=idgen, **opts)
        seg.pop("type", None)
        seg.pop("namespace", None)
        return [seg]
    # local-root dependency span → dependency subsegment + service segment
    service_id = idgen()

    dep_row = dict(row)
    dep_row["parent_span_id"] = service_id
    dep = make_segment(dep_row, idgen=idgen, **opts)
    dep = _with_type(dep, "subsegment")
    if "namespace" not in dep:
        dep = _with_namespace(dep, "remote")
    if kind == _KIND_CONSUMER:
        dep.pop("links", None)
    if isinstance(attrs.get("aws.remote.service"), str):
        dep["name"] = _trim_aws_sdk_prefix(attrs["aws.remote.service"],
                                           attrs)

    svc_row = dict(row)
    svc_row["span_id"] = service_id
    svc_attrs = {k: v for k, v in attrs.items()
                 if k not in _REMOVE_FOR_SERVICE_SEGMENT}
    svc_row["attributes"] = json.dumps(svc_attrs)
    svc = make_segment(svc_row, idgen=idgen, **opts)
    if isinstance(attrs.get("aws.local.service"), str):
        svc["name"] = attrs["aws.local.service"]
    svc.pop("http", None)
    if "aws" in svc:
        for k in ("operation", "account_id", "region", "request_id",
                  "queue_url", "table_name", "table_names"):
            svc["aws"].pop(k, None)
    if "metadata" in svc:
        meta = svc["metadata"]
        for ns in list(meta):
            meta[ns] = {k: v for k, v in meta[ns].items()
                        if k.startswith("otel.resource.")}
            if not meta[ns]:
                del meta[ns]
        if not meta:
            del svc["metadata"]
    svc.pop("type", None)
    svc.pop("namespace", None)
    if kind != _KIND_CONSUMER:
        svc.pop("links", None)
    return [dep, svc]


def _with_type(seg: GoStruct, typ: str) -> GoStruct:
    if "type" in seg:
        seg["type"] = typ
        return seg
    return _insert_before(seg, "type", typ, after_keys=("sql",))


def _with_namespace(seg: GoStruct, ns: str) -> GoStruct:
    if "namespace" in seg:
        seg["namespace"] = ns
        return seg
    return _insert_before(seg, "namespace",
                          ns, after_keys=("parent_id", "type", "sql"))


def _insert_before(seg: GoStruct, key, value, after_keys) -> GoStruct:
    out = GoStruct()
    inserted = False
    for k, v in seg.items():
        if not inserted and k in after_keys:
            out[key] = value
            inserted = True
        out[k] = v
    if not inserted:
        out[key] = value
    return out


class _SpansToXRay:
    def __init__(self, opts: dict, on_error: str):
        self.opts = opts
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        parent, docs, errors = [], [], []
        for i, row in enumerate(rows):
            try:
                segs = make_segments_from_span(row, **self.opts)
            except (ValueError, TypeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                docs.append(None)
                errors.append(str(e))
                continue
            for seg in segs:
                parent.append(i)
                docs.append(go_json(seg))
                errors.append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        out = out.append_column("xray_json", pa.array(docs, pa.string()))
        if self.on_error != "drop":
            out = out.append_column("error",
                                    pa.array(errors, pa.string()))
        return out


def spans_to_xray(ds, *, indexed_attrs=(), index_all_attrs=False,
                  log_group_names=(), skip_timestamp_validation=True,
                  allow_dot=True, on_error: str = "drop"):
    """Flat span rows → X-Ray segment document rows (one per segment;
    local-root dependency spans emit two), block-local, zero shuffle."""
    opts = {"indexed_attrs": tuple(indexed_attrs),
            "index_all_attrs": index_all_attrs,
            "log_group_names": tuple(log_group_names),
            "skip_timestamp_validation": skip_timestamp_validation,
            "allow_dot": allow_dot}
    return ds.map_batches(_SpansToXRay(opts, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


# --- receiver direction (receiver/awsxrayreceiver/internal/translator) ----
#
# ToTraces (translator.go:28-209): one X-Ray segment document (with
# embedded subsegments, recursively flattened) → flat span rows sharing
# one resource.  Semantics mirrored exactly:
#
# - resource from the ROOT segment: service.name = seg.name, AWS block
#   → cloud/host/container/beanstalk/eks resource attrs (cloud.provider
#   "unknown" when the aws block is absent), xray SDK name/version with
#   the "for <language>" split (language forced "java" when a cause with
#   exceptions exists — the receiver's documented TODO), service.version,
#   aws.xray.resource_arn (translator.go:185-200, aws.go, sdk.go).
# - kind: ClientIP present → Server; namespace aws/remote → Client (aws
#   also stores the name as the aws.service attr, unknown namespace =
#   whole-segment error); nil/local → Internal; NO parent id (root) →
#   Server overwrite (populateSpan:160-164, name.go).
# - trace id "1-hex8-hex24" → 32-hex (len<35 = error); span/parent ids
#   16-hex.
# - http: method/client ip/user agent/url/x_forwarded_for attrs;
#   response status → http.status_code attr + span status via
#   StatusCodeFromHTTP (<399 Unset, else Error); content_length
#   string→http.response_content_length str, float→int (http.go).
# - cause: status forced Error when Unset; exception-id strings land in
#   status message; exception objects become `exception` events with the
#   aws.xray.exception.* attrs and a rebuilt "Type: Message\n\tat
#   Label(Path: line)\n" stacktrace (cause.go).
# - aws span attrs (account/operation/region/request id/queue url/table
#   name/retries), sql (url split "proto://host/db" via the receiver's
#   regexp → db.connection_string + db.name, error when unparseable),
#   in_progress/traced bools, enduser.id, annotations (+ the
#   aws.xray.annotations key list), metadata namespaces re-marshalled to
#   aws.xray.metadata.<ns> JSON attrs (sorted keys — Go map marshal).
# - embedded subsegments inherit the root trace id, parent = enclosing
#   segment id; the parent-status refinement loop (translator.go:94-106)
#   is mirrored though it is a no-op for the Unset/Error code set.

def _decode_xray_trace_id(tid) -> str:
    if tid is None:
        raise ValueError("traceID is null")
    if len(tid) < 35:
        raise ValueError("traceID length is wrong")
    out = tid[2:10] + tid[11:]
    bytes.fromhex(out)
    return out


def _decode_xray_span_id(sid) -> str:
    if sid is None:
        raise ValueError("spanid is null")
    if len(sid) != 16:
        raise ValueError("spanID length is wrong")
    bytes.fromhex(sid)
    return sid


def _seg_resource_attrs(seg: dict) -> dict:
    attrs: dict = {}
    if seg.get("name"):
        attrs["service.name"] = seg["name"]
    aws = seg.get("aws")
    if aws is None:
        attrs["cloud.provider"] = "unknown"
    else:
        attrs["cloud.provider"] = "aws"
        if aws.get("account_id"):
            attrs["cloud.account.id"] = aws["account_id"]
        for lg in aws.get("cloudwatch_logs") or []:
            if lg.get("arn"):
                attrs.setdefault("aws.log.group.arns",
                                 []).append(lg["arn"])
            if lg.get("log_group") is not None:
                attrs.setdefault("aws.log.group.names",
                                 []).append(lg["log_group"])
        ec2 = aws.get("ec2")
        if ec2 is not None:
            for src, dst in (("availability_zone",
                              "cloud.availability_zone"),
                             ("instance_id", "host.id"),
                             ("instance_size", "host.type"),
                             ("ami_id", "host.image.id")):
                if ec2.get(src) is not None:
                    attrs[dst] = ec2[src]
        ecs = aws.get("ecs")
        if ecs is not None:
            for src, dst in (("container", "container.name"),
                             ("availability_zone",
                              "cloud.availability_zone"),
                             ("container_id", "container.id")):
                if ecs.get(src) is not None:
                    attrs[dst] = ecs[src]
        bs = aws.get("elastic_beanstalk")
        if bs is not None:
            if bs.get("environment_name") is not None:
                attrs["service.namespace"] = bs["environment_name"]
            if bs.get("deployment_id") is not None:
                attrs["service.instance.id"] = str(
                    int(bs["deployment_id"]))
            if bs.get("version_label") is not None:
                attrs["service.version"] = bs["version_label"]
        eks = aws.get("eks")
        if eks is not None:
            for src, dst in (("container_id", "container.id"),
                             ("cluster_name", "k8s.cluster.name"),
                             ("pod", "k8s.pod.name")):
                if eks.get(src) is not None:
                    attrs[dst] = eks[src]
        xr = aws.get("xray")
        if xr is not None:
            if xr.get("sdk_version") is not None:
                attrs["telemetry.sdk.version"] = xr["sdk_version"]
            if xr.get("sdk") is not None:
                attrs["telemetry.sdk.name"] = xr["sdk"]
                cause = seg.get("cause")
                if isinstance(cause, dict) and cause.get("exceptions"):
                    attrs["telemetry.sdk.language"] = "java"
                else:
                    i = xr["sdk"].find("for ")
                    if i != -1:
                        attrs["telemetry.sdk.language"] = \
                            xr["sdk"][i + len("for "):]
    svc = seg.get("service")
    if svc is not None and svc.get("version") is not None:
        attrs["service.version"] = svc["version"]
    if seg.get("resource_arn") is not None:
        attrs["aws.xray.resource_arn"] = seg["resource_arn"]
    return attrs


_SQL_URL_RE = re.compile(r"^(.+//.+)/([^\?]+)\??.*$")


def _xray_seg_to_row(seg: dict, trace_id, parent_id, res_json: str):
    attrs: dict = {}
    name = seg.get("name")
    if name is None:
        raise ValueError('segment "name" cannot be nil')
    if seg.get("id") is None:
        raise ValueError('segment "id" cannot be nil')
    if seg.get("start_time") is None:
        raise ValueError('segment "start_time" cannot be nil')

    kind = 0
    http = seg.get("http") or {}
    req = http.get("request") or {}
    if req.get("client_ip") is not None:
        kind = _KIND_SERVER
    ns = seg.get("namespace")
    if ns is None or ns == "local":
        if kind == 0:
            kind = _KIND_INTERNAL
    elif ns == "aws":
        kind = _KIND_CLIENT
        attrs["aws.service"] = name
    elif ns == "remote":
        kind = _KIND_CLIENT
    else:
        raise ValueError(f"unexpected namespace: {ns}")

    tid = _decode_xray_trace_id(seg.get("trace_id")
                                if seg.get("trace_id") is not None
                                else trace_id)
    pid = None
    if parent_id is not None:
        pid = _decode_xray_span_id(parent_id)
    elif seg.get("parent_id") is not None:
        pid = _decode_xray_span_id(seg["parent_id"])
    sid = _decode_xray_span_id(seg.get("id"))
    if pid is None:
        kind = _KIND_SERVER        # root: populateSpan overwrites

    start_ns = int(float(seg["start_time"]) * 1e9)
    end_ns = int(float(seg["end_time"]) * 1e9) \
        if seg.get("end_time") is not None else 0
    if seg.get("in_progress") is not None:
        attrs["aws.xray.inprogress"] = bool(seg["in_progress"])
    if seg.get("user") is not None:
        attrs["enduser.id"] = seg["user"]

    status_code, status_message = 0, None
    if req.get("method") is not None:
        attrs["http.method"] = req["method"]
    if req.get("client_ip") is not None:
        attrs["http.client_ip"] = req["client_ip"]
    if req.get("user_agent") is not None:
        attrs["http.user_agent"] = req["user_agent"]
    if req.get("url") is not None:
        attrs["http.url"] = req["url"]
    if req.get("x_forwarded_for") is not None:
        attrs["aws.xray.x_forwarded_for"] = bool(req["x_forwarded_for"])
    resp = http.get("response") or {}
    if resp.get("status") is not None:
        code = int(resp["status"])
        status_code = 0 if 100 <= code < 399 else 2
        attrs["http.status_code"] = code
    cl = resp.get("content_length")
    if isinstance(cl, str):
        attrs["http.response_content_length"] = cl
    elif isinstance(cl, (int, float)) and not isinstance(cl, bool):
        attrs["http.response_content_length"] = int(cl)

    events = []
    cause = seg.get("cause")
    if cause is not None:
        if status_code == 0:
            status_code = 2
        if isinstance(cause, str):
            status_message = cause
        else:
            for excp in cause.get("exceptions") or []:
                ea: dict = {"aws.xray.exception.id": excp.get("id")}
                if excp.get("message") is not None:
                    ea["exception.message"] = excp["message"]
                if excp.get("type") is not None:
                    ea["exception.type"] = excp["type"]
                if excp.get("remote") is not None:
                    ea["aws.xray.exception.remote"] = excp["remote"]
                if excp.get("truncated") is not None:
                    ea["aws.xray.exception.truncated"] = \
                        int(excp["truncated"])
                if excp.get("skipped") is not None:
                    ea["aws.xray.exception.skipped"] = \
                        int(excp["skipped"])
                if excp.get("cause") is not None:
                    ea["aws.xray.exception.cause"] = excp["cause"]
                stack = excp.get("stack") or []
                if stack:
                    st = (f"{excp.get('type') or ''}: "
                          f"{excp.get('message') or ''}\n")
                    for fr in stack:
                        line = ("<unknown>" if fr.get("line") is None
                                else str(int(fr["line"])))
                        st += (f"\tat {fr.get('label') or ''}"
                               f"({fr.get('path') or ''}: {line})\n")
                    ea["exception.stacktrace"] = st
                events.append({"name": "exception", "timeUnixNano": 0,
                               "attributes": ea,
                               "droppedAttributesCount": 0})

    aws = seg.get("aws")
    if aws is not None:
        for src, dst in (("account_id", "aws.account_id"),
                         ("operation", "aws.operation"),
                         ("region", "aws.region"),
                         ("request_id", "aws.request_id"),
                         ("queue_url", "aws.queue_url"),
                         ("table_name", "aws.table_name")):
            if aws.get(src) is not None:
                attrs[dst] = aws[src]
        if aws.get("retries") is not None:
            attrs["aws.xray.retries"] = int(aws["retries"])

    sql = seg.get("sql")
    if sql is not None:
        if sql.get("url") is not None:
            m = _SQL_URL_RE.match(sql["url"])
            if not m:
                raise ValueError(
                    'failed to parse out the database name in the '
                    f'"sql.url" field, rawUrl: {sql["url"]}')
            attrs["db.connection_string"] = m.group(1)
            attrs["db.name"] = m.group(2)
        for src, dst in (("database_type", "db.system"),
                         ("sanitized_query", "db.statement"),
                         ("user", "db.user")):
            if sql.get(src) is not None:
                attrs[dst] = sql[src]

    if seg.get("traced") is not None:
        attrs["aws.xray.traced"] = bool(seg["traced"])

    annos = seg.get("annotations") or {}
    if annos:
        attrs["aws.xray.annotations"] = sorted(annos)
        for k in annos:
            attrs[k] = annos[k]
    for ns_name, meta in (seg.get("metadata") or {}).items():
        attrs["aws.xray.metadata." + ns_name] = json.dumps(
            meta, separators=(",", ":"), sort_keys=True)

    return {
        "trace_id": tid, "span_id": sid, "parent_span_id": pid,
        "trace_state": None, "span_name": name, "span_kind": kind,
        "start_time_unix_nano": start_ns,
        "end_time_unix_nano": end_ns,
        "status_code": status_code, "status_message": status_message,
        "attributes": json.dumps(attrs, sort_keys=True),
        "resource_attributes": res_json,
        "scope_name": None, "scope_version": None,
        "events": json.dumps(events, sort_keys=True),
        "links": json.dumps([]),
    }


def xray_doc_to_rows(doc: dict) -> list[dict]:
    """One segment document → flat rows (root + flattened subsegments)."""
    res_json = json.dumps(_seg_resource_attrs(doc), sort_keys=True)

    rows: list = []

    def walk(seg, trace_id, parent_id):
        row = _xray_seg_to_row(seg, trace_id, parent_id, res_json)
        rows.append(row)
        my_trace = seg.get("trace_id") if seg.get("trace_id") \
            is not None else trace_id
        for sub in seg.get("subsegments") or []:
            child = walk(sub, my_trace, seg.get("id"))
            # translator.go:94-106 parent-status refinement (no-op for
            # the Unset/Error code set, mirrored for parity)
            if seg.get("cause") is not None and \
                    child["status_code"] != 0 and \
                    row["status_code"] == 2:
                row["status_code"] = child["status_code"]
        return row

    walk(doc, doc.get("trace_id"), None)
    return rows


class _ParseXRay:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .zipkin import _COLS
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                d = json.loads(doc if doc is not None else "")
                if not isinstance(d, dict):
                    raise ValueError("segment must be an object")
                rows = xray_doc_to_rows(d)
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


def parse_xray_segments(ds, json_col: str = "xray_json", *,
                        on_error: str = "drop"):
    """X-Ray segment documents → flat span rows (block-local fan-out,
    zero shuffle; schema = the zipkin/jaeger/OTLP span rows)."""
    return ds.map_batches(_ParseXRay(json_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
