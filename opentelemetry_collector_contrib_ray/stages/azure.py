"""pkg/translator/azurelogs analog: Azure resource-log (diagnostic
export) record decoding.

Parity with pkg/translator/azurelogs/resourcelogs_to_logs.go:83-330,
category_logs.go and property_names.go:

- one document = ``{"records": [...]}``; per record: timestamp from
  ``time`` else ``timeStamp`` (user-supplied strptime formats first,
  ISO-8601 fallback) — an unparseable/missing timestamp SKIPS the
  record (:104-108); severity from ``Level`` ("Informational"→9,
  "Warning"→13, "Error"→17, "Critical"→21, else positive number
  pass-through, else 0; severity text = the raw spelling, :193-211);
  resource identity per distinct ``resourceId`` with
  cloud.provider=azure / cloud.resource_id / event.name=
  "az.resource.log" (:149-156).
- FULLY-MAPPED categories (category_logs.go:86-115): only
  FrontDoorAccessLog, AzureCdnAccessLog and FrontDoorWAFLog have real
  handlers upstream; this restatement implements FrontDoorAccessLog
  (the richest: putInt/handleTime millisecond scaling, request-URI
  decomposition, "<name> <version>" security protocol, backend/
  endpoint destination splitting with missing-port tolerance,
  NoError-gated exception.type, "N/A"-ignoring putStr) and routes the
  other two through the same machinery's raw path (their handlers are
  the same switch-table shape; documented). A handler error logs and
  leaves the record with timestamp/severity only (:139-145); success
  adds the azure.category / azure.correlation_id /
  azure.operation.name / azure.operation.version common schema.
- every OTHER category (errStillToImplement/errUnsupportedCategory)
  gets extractRawAttributes as the BODY (:122-131, :228-258):
  category, correlation.id, integer durationMs, identity,
  operation.name/version, result.*, tenant.id, cloud.region,
  network.peer.address, and ``properties`` run through the
  per-category field-rename tables (property_names.go — all nine
  restated: FrontDoor access/health-probe, AppService app/audit/
  auth/console/HTTP/IPSec/platform; unknown categories keep every
  property under "properties"). Non-object properties JSON keeps the
  primitive (or the raw string when unparseable).

Execution: per-row wire decode in task-based map_batches (same status
as the OTLP codecs), fan-out one row per record, block-local.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa

SEVERITY_NAMES = {"Informational": 9, "Warning": 13, "Error": 17,
                  "Critical": 21}


def as_severity(level) -> tuple:
    """asSeverity (:193-211). Returns (number, text). The Level field
    is a json.Number in Go — it keeps the literal digits, so a whole
    float from our parse_int=float decode renders back as an int."""
    if isinstance(level, float) and not isinstance(level, bool) and \
            level == int(level):
        level = int(level)
    text = str(level)
    if text in SEVERITY_NAMES:
        return SEVERITY_NAMES[text], text
    try:
        n = int(text, 10)   # json.Number.Int64: ParseInt, 0 on error
    except (ValueError, TypeError):
        n = 0
    return (n if n > 0 else 0), text


def parse_azure_time(s: str, formats: tuple = ()):
    """asTimestamp (:173-188): user formats first, ISO-8601 fallback.
    Returns ns int or None."""
    for fmt in formats:
        try:
            t = datetime.strptime(s, fmt)
            if t.tzinfo is None:
                t = t.replace(tzinfo=timezone.utc)
            return int(t.timestamp()) * 1_000_000_000 + \
                t.microsecond * 1000
        except ValueError:
            continue
    try:
        iso = s.replace("Z", "+00:00")
        t = datetime.fromisoformat(iso)
        if t.tzinfo is None:
            t = t.replace(tzinfo=timezone.utc)
        epoch = int(t.timestamp())
        return epoch * 1_000_000_000 + t.microsecond * 1000
    except (ValueError, TypeError):
        return None


def _to_int(v):
    """normalize.go toInt: int-typed or parseable string → int64,
    else the value unchanged."""
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, float) and v == int(v):
        return v  # Go float64 is NOT converted by toInt
    if isinstance(v, str):
        try:
            return int(v, 10)
        except ValueError:
            return v
    return v


def _to_float(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return v
    return v


def _try_float(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return None
    return None


def _to_lower(v):
    return v.lower() if isinstance(v, str) else v


def _cut(s, sep):
    a, _, b = s.partition(sep)
    return a, b


# ---------------------------------------------------------------------------
# property_names.go raw-path handlers (field, value, attrs, props)


def _h_front_door_access(field, value, attrs, props):
    if field == "trackingReference":
        attrs["az.service_request_id"] = value
    elif field == "httpMethod":
        attrs["http.request.method"] = value
    elif field == "httpVersion":
        attrs["network.protocol.version"] = value
    elif field == "requestUri":
        attrs["url.full"] = value
    elif field == "hostName":
        attrs["server.address"] = value
    elif field == "requestBytes":
        attrs["http.request.size"] = _to_int(value)
    elif field == "responseBytes":
        attrs["http.response.size"] = _to_int(value)
    elif field == "userAgent":
        attrs["user_agent.original"] = value
    elif field in ("ClientIp", "clientIp"):
        attrs["client.address"] = value
    elif field in ("ClientPort", "clientPort"):
        attrs["client.port"] = value
    elif field == "socketIp":
        attrs["network.peer.address"] = value
    elif field == "timeTaken":
        attrs["http.server.request.duration"] = _to_float(value)
    elif field == "requestProtocol":
        attrs["network.protocol.name"] = _to_lower(value)
    elif field == "securityCipher":
        attrs["tls.cipher"] = value
    elif field == "securityCurves":
        attrs["tls.curve"] = value
    elif field == "httpStatusCode":
        attrs["http.response.status_code"] = _to_int(value)
    elif field == "routeName":
        attrs["http.route"] = value
    elif field == "referer":
        attrs["http.request.header.referer"] = value
    elif field == "errorInfo":
        attrs["error.type"] = value
    elif field == "securityProtocol":
        if not isinstance(value, str):
            return
        name, remaining = _cut(value, " ")
        if name == "" or remaining == "":
            return
        version, remaining = _cut(remaining, " ")
        if version == "" or remaining != "":
            return
        attrs["tls.protocol.name"] = name.lower()
        attrs["tls.protocol.version"] = version
    else:
        props[field] = value


def _h_front_door_probe(field, value, attrs, props):
    if field == "httpVerb":
        attrs["http.request.method"] = value
    elif field == "httpStatusCode":
        attrs["http.response.status_code"] = _to_int(value)
    elif field == "probeURL":
        attrs["url.full"] = value
    elif field == "originIP":
        attrs["server.address"] = value
    elif field == "DNSLatencyMicroseconds":
        f = _try_float(value)
        if f is not None:
            attrs["dns.lookup.duration"] = f / 1_000_000
    elif field == "totalLatencyMilliseconds":
        f = _try_float(value)
        if f is not None:
            attrs["http.request.duration"] = f / 1_000
    else:
        props[field] = value


def _h_app_logs(field, value, attrs, props):
    m = {"ContainerId": "container.id", "ExceptionClass": "exception.type",
         "Host": "host.id", "Method": "code.function",
         "Source": "code.filepath"}
    if field in m:
        attrs[m[field]] = value
    elif field in ("Stacktrace", "StackTrace"):
        attrs["exception.stacktrace"] = value
    else:
        props[field] = value


def _h_audit_logs(field, value, attrs, props):
    if field == "Protocol":
        attrs["network.protocol.name"] = _to_lower(value)
    elif field == "User":
        attrs["enduser.id"] = value
    elif field == "UserAddress":
        attrs["client.address"] = value
    else:
        props[field] = value


def _h_auth_logs(field, value, attrs, props):
    if field == "StatusCode":
        attrs["http.response.status_code"] = _to_int(value)
    else:
        props[field] = value


def _h_console_logs(field, value, attrs, props):
    if field == "ContainerId":
        attrs["container.id"] = value
    elif field == "Host":
        attrs["host.id"] = value
    else:
        props[field] = value


def _h_http_logs(field, value, attrs, props):
    m = {"CIp": "client.address", "ComputerName": "host.name",
         "CsHost": "url.domain", "CsMethod": "http.request.method",
         "CsUriQuery": "url.query", "CsUriStem": "url.path",
         "Referer": "http.request.header.referer",
         "UserAgent": "user_agent.original"}
    if field in m:
        attrs[m[field]] = value
    elif field == "CsBytes":
        attrs["http.request.body.size"] = _to_int(value)
    elif field == "ScBytes":
        attrs["http.response.body.size"] = _to_int(value)
    elif field == "ScStatus":
        attrs["http.response.status_code"] = _to_int(value)
    elif field == "SPort":
        attrs["server.port"] = _to_int(value)
    elif field == "TimeTaken":
        f = _try_float(value)
        if f is not None:
            attrs["http.server.request.duration"] = f / 1_000
    elif field == "Protocol":
        if not isinstance(value, str):
            return
        name, remaining = _cut(value, "/")
        if name == "" or remaining == "":
            return
        version, remaining = _cut(remaining, "/")
        if version == "" or remaining != "":
            return
        attrs["network.protocol.name"] = name.lower()
        attrs["network.protocol.version"] = version
    else:
        props[field] = value


def _h_ipsec_logs(field, value, attrs, props):
    m = {"CIp": "client.address", "CsHost": "url.domain",
         "XAzureFDID": "http.request.header.x-azure-fdid",
         "XFDHealthProbe": "http.request.header.x-fd-healthprobe",
         "XForwardedFor": "http.request.header.x-forwarded-for",
         "XForwardedHost": "http.request.header.x-forwarded-host"}
    if field in m:
        attrs[m[field]] = value
    else:
        props[field] = value


def _h_platform_logs(field, value, attrs, props):
    m = {"containerId": "container.id", "containerName": "container.name",
         "exception": "error.type"}
    if field in m:
        attrs[m[field]] = value
    else:
        props[field] = value


RAW_PATH_HANDLERS = {
    "FrontDoorAccessLog": _h_front_door_access,
    "FrontDoorHealthProbeLog": _h_front_door_probe,
    "AppServiceAppLogs": _h_app_logs,
    "AppServiceAuditLogs": _h_audit_logs,
    "AppServiceAuthenticationLogs": _h_auth_logs,
    "AppServiceConsoleLogs": _h_console_logs,
    "AppServiceHTTPLogs": _h_http_logs,
    "AppServiceIPSecAuditLogs": _h_ipsec_logs,
    "AppServicePlatformLogs": _h_platform_logs,
}

NO_ERROR = "NoError"


# ---------------------------------------------------------------------------
# FrontDoorAccessLog — the fully-mapped category (category_logs.go)


def _put_str(attrs, key, value):
    """putStr: skip empty and "N/A"."""
    if value not in ("", "N/A", None):
        attrs[key] = value


def _put_int(attrs, key, value) -> bool:
    """putInt: ParseInt or error."""
    try:
        attrs[key] = int(str(value), 10)
        return True
    except (ValueError, TypeError):
        return False


def _handle_time(attrs, key, value) -> bool:
    """handleTime: ParseFloat then ×1e3 truncated to int."""
    try:
        attrs[key] = int(float(value) * 1e3)
        return True
    except (ValueError, TypeError):
        return False


def _split_host_port(full: str):
    """net.SplitHostPort with the missing-port tolerance the Go code
    applies (whole string becomes the host)."""
    if full.count(":") == 1 and not full.startswith("["):
        host, port = full.split(":")
        return host, port
    if ":" not in full:
        return full, ""
    if full.startswith("[") and "]:" in full:
        host, port = full.rsplit("]:", 1)
        return host[1:], port
    return full, ""   # ipv6 without port etc


def front_door_access_log_attrs(props: dict):
    """addFrontDoorAccessLogProperties (category_logs.go). Returns the
    attr dict or an error string."""
    def s(key):
        v = props.get(key, "")
        return v if isinstance(v, str) else None

    for key in ("requestBytes", "responseBytes", "clientPort",
                "httpStatusCode", "timeToFirstByte", "timeTaken",
                "requestUri", "securityProtocol", "backendHostname",
                "endpoint", "errorInfo", "ErrorInfo",
                "trackingReference", "httpMethod", "httpVersion",
                "requestProtocol", "sni", "userAgent", "clientIp",
                "socketIp", "pop", "cacheStatus", "securityCurves",
                "securityCipher", "hostName"):
        if key in props and not isinstance(props[key], str):
            return f"failed to parse FrontDoorAccessLog properties: " \
                   f"{key} is not a string"
    attrs: dict = {}
    for key, field in (("requestBytes", "http.request.size"),
                       ("responseBytes", "http.response.size"),
                       ("clientPort", "client.port"),
                       ("httpStatusCode", "http.response.status_code")):
        if not _put_int(attrs, field, props.get(key, "")):
            return f"failed to get number for field {field}"
    if not _handle_time(attrs, "azure.time_to_first_byte",
                        props.get("timeToFirstByte", "")):
        return "failed to get number for field azure.time_to_first_byte"
    if not _handle_time(attrs, "duration", props.get("timeTaken", "")):
        return "failed to get number for field duration"

    uri = props.get("requestUri", "")
    if uri:
        from urllib.parse import urlsplit
        try:
            u = urlsplit(uri)
            port = u.port
        except ValueError:
            return f"failed to parse request URI {uri!r}"
        attrs["url.original"] = uri
        if port is not None:
            attrs["url.port"] = int(port)
        _put_str(attrs, "url.scheme", u.scheme)
        _put_str(attrs, "url.path", u.path)
        _put_str(attrs, "url.query", u.query)
        _put_str(attrs, "url.fragment", u.fragment)

    sec = props.get("securityProtocol", "")
    if sec:
        name, remaining = _cut(sec, " ")
        if remaining == "":
            return f"security protocol {sec!r} is missing version"
        version, remaining = _cut(remaining, " ")
        if remaining != "":
            return f"security protocol {sec!r} has invalid format"
        attrs["tls.protocol.name"] = name
        attrs["tls.protocol.version"] = version

    backend = props.get("backendHostname", "")
    endpoint = props.get("endpoint", "")
    if backend == "":
        if endpoint != "":
            host, port = _split_host_port(endpoint)
            if host:
                attrs["destination.address"] = host
            if port and not _put_int(attrs, "destination.port", port):
                return f"failed to parse endpoint {endpoint!r}"
    else:
        host, port = _split_host_port(backend)
        if host:
            attrs["destination.address"] = host
        if port and not _put_int(attrs, "destination.port", port):
            return f"failed to parse backend hostname {backend!r}"
        if endpoint != backend and endpoint != "":
            host, port = _split_host_port(endpoint)
            if host:
                attrs["network.peer.address"] = host
            if port and not _put_int(attrs, "network.peer.port", port):
                return f"failed to parse endpoint {endpoint!r}"

    e0, e1 = props.get("errorInfo", ""), props.get("ErrorInfo", "")
    if e0 != e1 and e0 != "" and e1 != "":
        return ('unexpected: "errorInfo" and "ErrorInfo" JSON fields '
                "have different values")
    err_info = e1 or e0
    if err_info and err_info != NO_ERROR:
        attrs["exception.type"] = err_info

    origin = props.get("originIP", "")
    if origin and origin != "N/A":
        address, _, port = origin.partition(":")
        _put_str(attrs, "server.address", address)
        if port and not _put_int(attrs, "server.port", port):
            return f"failed to get port from {origin!r}"

    _put_str(attrs, "azure.ref", props.get("trackingReference", ""))
    _put_str(attrs, "http.request.method", props.get("httpMethod", ""))
    _put_str(attrs, "network.protocol.version",
             props.get("httpVersion", ""))
    _put_str(attrs, "network.protocol.name",
             props.get("requestProtocol", ""))
    _put_str(attrs, "tls.server.name", props.get("sni", ""))
    _put_str(attrs, "user_agent.original", props.get("userAgent", ""))
    _put_str(attrs, "client.address", props.get("clientIp", ""))
    _put_str(attrs, "source.address", props.get("socketIp", ""))
    _put_str(attrs, "azure.pop", props.get("pop", ""))
    _put_str(attrs, "azure.cache_status", props.get("cacheStatus", ""))
    _put_str(attrs, "tls.curve", props.get("securityCurves", ""))
    _put_str(attrs, "tls.cipher", props.get("securityCipher", ""))
    return attrs


# ---------------------------------------------------------------------------
# record → flat row


def _set_if(attrs: dict, key: str, value):
    if value not in (None, ""):
        attrs[key] = value


def extract_raw_attributes(rec: dict) -> dict:
    """extractRawAttributes (:228-258) — the body for categories with
    no structured mapping yet."""
    attrs: dict = {"category": rec.get("category") or "",
                   "operation.name": rec.get("operationName") or ""}
    _set_if(attrs, "correlation.id", rec.get("correlationId"))
    dur = rec.get("durationMs")   # json.Number: integer literals only
    if isinstance(dur, float) and not isinstance(dur, bool) and \
            dur == int(dur):
        attrs["duration"] = int(dur)
    elif isinstance(dur, str):
        try:
            attrs["duration"] = int(dur, 10)
        except ValueError:
            pass
    if rec.get("identity") is not None:
        attrs["identity"] = rec["identity"]
    _set_if(attrs, "operation.version", rec.get("operationVersion"))

    props = rec.get("properties")
    if props is not None:
        if isinstance(props, dict):
            handler = RAW_PATH_HANDLERS.get(
                rec.get("category") or "",
                lambda f, v, a, p: p.__setitem__(f, v))
            extra: dict = {}
            for field in sorted(props):
                handler(field, props[field], attrs, extra)
            if extra:
                attrs["properties"] = extra
        else:
            attrs["properties"] = props   # primitive / list kept raw

    _set_if(attrs, "result.description", rec.get("resultDescription"))
    _set_if(attrs, "result.signature", rec.get("resultSignature"))
    _set_if(attrs, "result.type", rec.get("resultType"))
    _set_if(attrs, "tenant.id", rec.get("tenantId"))
    _set_if(attrs, "cloud.region", rec.get("location"))
    _set_if(attrs, "network.peer.address", rec.get("callerIpAddress"))
    return attrs


FULLY_MAPPED = {"FrontDoorAccessLog"}


def azure_record_to_row(rec: dict, time_formats: tuple = ()):
    """One diagnostic record → flat row dict or None (skipped)."""
    if not isinstance(rec, dict):
        return None
    ts = rec.get("time") or rec.get("timeStamp") or ""
    t_ns = parse_azure_time(ts, time_formats) if ts else None
    if t_ns is None:
        return None   # unparseable timestamp skips the record (:104)
    level = rec.get("Level", rec.get("level"))
    sev_n, sev_t = (0, None)
    if level is not None:
        sev_n, sev_t = as_severity(level)
    category = rec.get("category") or ""
    attrs: dict = {}
    body = None
    if category in FULLY_MAPPED:
        props = rec.get("properties")
        mapped = front_door_access_log_attrs(
            props if isinstance(props, dict) else {})
        if isinstance(mapped, str):
            pass  # handler error: record keeps ts/severity only (:139)
        else:
            attrs = mapped
            attrs["azure.category"] = category
            _set_if(attrs, "azure.correlation_id",
                    rec.get("correlationId"))
            attrs["azure.operation.name"] = rec.get("operationName") or ""
            _set_if(attrs, "azure.operation.version",
                    rec.get("operationVersion"))
    else:
        body = extract_raw_attributes(rec)
    return {
        "resource_id": rec.get("resourceId") or "",
        "category": category,
        "time_ns": t_ns,
        "severity_number": sev_n,
        "severity_text": sev_t,
        "attributes": json.dumps(attrs, sort_keys=True),
        "body": json.dumps(body, sort_keys=True)
        if body is not None else None,
    }


class _ParseAzureLogs:
    def __init__(self, json_col: str, time_formats: tuple,
                 on_error: str):
        self.json_col = json_col
        self.time_formats = time_formats
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {
            "resource_id": [], "category": [], "time_ns": [],
            "severity_number": [], "severity_text": [],
            "attributes": [], "body": [], "error": []}
        for i, doc in enumerate(docs):
            try:
                # Go decodes any-typed JSON numbers as float64
                obj = json.loads(doc if doc is not None else "",
                                 parse_int=float)
                records = obj.get("records") if isinstance(obj, dict) \
                    else None
                if not isinstance(records, list):
                    raise ValueError
            except (ValueError, TypeError):
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for k in ("resource_id", "category", "time_ns",
                          "severity_number", "severity_text",
                          "attributes", "body"):
                    cols[k].append(None)
                cols["error"].append("JSON parse failed")
                continue
            for rec in records:
                row = azure_record_to_row(rec, self.time_formats)
                if row is None:
                    continue
                parent.append(i)
                for k in ("resource_id", "category", "time_ns",
                          "severity_number", "severity_text",
                          "attributes", "body"):
                    cols[k].append(row[k])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in (("resource_id", pa.string()),
                          ("category", pa.string()),
                          ("time_ns", pa.int64()),
                          ("severity_number", pa.int64()),
                          ("severity_text", pa.string()),
                          ("attributes", pa.string()),
                          ("body", pa.string()),
                          ("error", pa.string())):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_azure_logs(ds, json_col: str = "export_json", *,
                     time_formats: tuple = (), on_error: str = "drop"):
    """Azure diagnostic-export documents → one log row per record
    (block-local fan-out, zero shuffle)."""
    return ds.map_batches(
        _ParseAzureLogs(json_col, tuple(time_formats), on_error),
        batch_format="pyarrow", zero_copy_batch=True)
