"""pkg/translator/azure + azureeventhubreceiver analogs: Azure
Event-Hub resource-log / AppTraces / resource-metric JSON payloads →
flat OTel rows.

Parity with pkg/translator/azure/resourcelogs_to_logs.go,
resources_to_traces.go and receiver/azureeventhubreceiver/
azureresourcemetrics_unmarshaler.go:

- logs (resourcelogs_to_logs.go:82-135): one resource per DISTINCT
  resourceId in first-seen order carrying azure.resource.id; scope =
  the translator scopeName + Version; per record: Time-else-timeStamp
  parsed with user Go layouts first then an ISO-8601 fallback
  (asTimestamp:150-166), unparseable/missing timestamps SKIP the
  record; Level is a jsoniter json.Number that also accepts STRING
  tokens — severity text is the raw token, number via the
  Informational/Warning/Error/Critical table (9/13/17/21) else the
  positive integer value else 0 (asSeverity:171-189); attributes =
  extractRawAttributes (:191-219): azure.category/operation.name
  always, setIf'd optionals (empty strings dropped), azure.duration
  ONLY when the raw durationMs token ParseInts (floats/garbage
  dropped), identity/properties RAW, cloud.region from location,
  constant cloud.provider=azure, callerIpAddress → net.sock.peer.addr.
- traces (resources_to_traces.go:71-169): ONE resource per payload
  with telemetry.sdk.name/language/version + cloud.provider and
  service.name OVERWRITTEN per record (last record wins — the Go loop
  PutStrs the shared resource); azure.resource.id = FIRST non-empty;
  per record: bad timestamp skips the record, an INVALID hex
  Operation/Span/Parent id STOPS the whole payload keeping prior
  spans and returns the nil decode error (the reference's
  `return t, err` quirk — err is nil there); ids are
  hex.DecodeString bytes left-copied into zeroed 16/8-byte arrays
  (short ids right-pad, long ids truncate); span attrs in insertion
  order OperationName/AppRoleName/AppRoleInstance/Type/http.url/
  http.host/http.path/http.response.status_code/http.client_ip/
  http.client_city/http.client_type/http.client_state/
  http.client_country/http.scheme/http.method then Properties minus
  "HTTP Method"; kind=Server, end = start + DurationMs×1e6 ns
  (float multiply, Go uint64 cast truncation).
- metrics (azureresourcemetrics_unmarshaler.go:66-147): same
  resource head with the RECEIVER scope name; per record: non-"PT1M"
  timeGrain skips, start = time − 1 minute, five gauge double
  datapoints named lower(replace(metricName," ","_"))_{total,count,
  minimum,maximum,average}.

Properties / identity values travel verbatim from the source JSON
(jsoniter decodes numbers into float64 interfaces in Go; the JSON
re-rendering is numerically identical).

Execution: per-row payload decode task maps (fan-out, one row per
log record / span / metric datapoint), block-local, zero shuffle;
the Event-Hub consumer, partition checkpointing (persister.go) and
the raw-logs passthrough are ingest transport / the repo's lineage
layer.
"""

from __future__ import annotations

import calendar
import json
import re

import pyarrow as pa

LOGS_SCOPE = ("github.com/open-telemetry/opentelemetry-collector-"
              "contrib/pkg/translator/azure")
METRICS_SCOPE = ("github.com/open-telemetry/opentelemetry-collector-"
                 "contrib/receiver/azureeventhubreceiver")

_ISO = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:[T ](\d{2}):(\d{2})(?::(\d{2}))?(\.\d+)?)?"
    r"(Z|[+-]\d{2}:?\d{2})?$")

_SEVERITY = {"Informational": 9, "Warning": 13, "Error": 17,
             "Critical": 21}


def azure_timestamp(s: str, formats: list[str] | None = None):
    """asTimestamp: user Go layouts first, ISO-8601 fallback;
    returns ns or None."""
    if not s:
        return None
    if formats:
        import datetime as _dt

        from ..functions.converters import gotime_to_strptime

        for f in formats:
            try:
                t = _dt.datetime.strptime(s, gotime_to_strptime(f))
                return int(calendar.timegm(t.timetuple())
                           ) * 1_000_000_000 + t.microsecond * 1000
            except ValueError:
                continue
    m = _ISO.match(s)
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mm = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    frac = m.group(7) or ""
    nanos = int((frac[1:] + "000000000")[:9]) if frac else 0
    try:
        base = calendar.timegm((y, mo, d, hh, mm, ss, 0, 0, 0))
    except (ValueError, OverflowError):
        return None
    off = 0
    tz = m.group(8)
    if tz and tz != "Z":
        th, tm = int(tz[1:3]), int(tz[-2:])
        off = (th * 3600 + tm * 60) * (1 if tz[0] == "+" else -1)
    return (base - off) * 1_000_000_000 + nanos


def _severity(level) -> tuple[int, str]:
    """asSeverity over the raw json.Number token (jsoniter accepts
    string tokens too)."""
    tok = str(level)
    if isinstance(level, bool):
        tok = "true" if level else "false"
    elif isinstance(level, float) and level.is_integer():
        tok = str(int(level))
    n = _SEVERITY.get(tok)
    if n is None:
        try:
            v = int(tok)
            n = v if v > 0 else 0
        except ValueError:
            n = 0
    return n, tok


def azure_log_records(body: str,
                      formats: list[str] | None = None,
                      version: str = "") -> list[dict]:
    """resourcelogs_to_logs.go:82-135 over one payload; one dict per
    kept record. Unparseable payloads raise ValueError (the decode
    error fails the whole payload)."""
    try:
        doc = json.loads(body)
    except (ValueError, TypeError) as exc:
        raise ValueError(f"azure logs decode: {exc}") from None
    out = []
    for rec in (doc or {}).get("records") or []:
        if not isinstance(rec, dict):
            continue
        ns = azure_timestamp(rec.get("time") or "", formats)
        if ns is None:
            ns = azure_timestamp(rec.get("timeStamp") or "", formats)
        if ns is None:
            continue  # warn + skip
        attrs: dict = {}
        attrs["azure.category"] = rec.get("category") or ""

        def set_if(key, value):
            if isinstance(value, str) and value != "":
                attrs[key] = value

        set_if("azure.correlation.id", rec.get("correlationId"))
        dur = rec.get("durationMs")
        if dur is not None:
            try:
                attrs["azure.duration"] = int(str(dur))
            except ValueError:
                pass
        if rec.get("identity") is not None:
            attrs["azure.identity"] = rec["identity"]
        attrs["azure.operation.name"] = rec.get("operationName") or ""
        set_if("azure.operation.version",
               rec.get("operationVersion"))
        if rec.get("properties") is not None:
            attrs["azure.properties"] = rec["properties"]
        set_if("azure.result.description",
               rec.get("resultDescription"))
        set_if("azure.result.signature", rec.get("resultSignature"))
        set_if("azure.result.type", rec.get("resultType"))
        set_if("azure.tenant.id", rec.get("tenantId"))
        set_if("cloud.region", rec.get("location"))
        attrs["cloud.provider"] = "azure"
        set_if("net.sock.peer.addr", rec.get("callerIpAddress"))

        level = rec.get("Level")
        sev_n, sev_t = (0, "") if level is None else _severity(level)
        out.append({
            "resource_id": rec.get("resourceId") or "",
            "scope_name": LOGS_SCOPE,
            "scope_version": version,
            "time_unix_nano": ns,
            "severity_number": sev_n,
            "severity_text": sev_t,
            "attributes": json.dumps(attrs, sort_keys=True,
                                     separators=(",", ":")),
        })
    return out


def _id_from_hex(s: str, width: int) -> str | None:
    """TraceIDFromHex/SpanIDFromHex: hex.DecodeString then left-copy
    into a zeroed array; None = invalid hex (stops the payload)."""
    s = s or ""
    if len(s) % 2 != 0:
        return None
    try:
        b = bytes.fromhex(s)
    except ValueError:
        return None
    return (b[:width] + b"\x00" * width)[:width].hex()


def azure_trace_records(body: str,
                        formats: list[str] | None = None,
                        version: str = "") -> list[dict]:
    """resources_to_traces.go:71-169 over one payload."""
    try:
        doc = json.loads(body)
    except (ValueError, TypeError) as exc:
        raise ValueError(f"azure traces decode: {exc}") from None
    from urllib.parse import urlsplit

    records = (doc or {}).get("records") or []
    resource_id = ""
    service_name = ""
    rows = []
    for rec in records:
        if not isinstance(rec, dict):
            continue
        if not resource_id and rec.get("resourceId"):
            resource_id = rec["resourceId"]
        # the shared resource's service.name: every record PutStrs
        # it, so the LAST record wins
        service_name = rec.get("AppRoleName") or ""
        ns = azure_timestamp(rec.get("time") or "", formats)
        if ns is None:
            continue
        trace_id = _id_from_hex(rec.get("OperationId") or "", 16)
        span_id = _id_from_hex(rec.get("Id") or "", 8)
        parent_id = _id_from_hex(rec.get("ParentId") or "", 8)
        if trace_id is None or span_id is None or parent_id is None:
            break  # `return t, err` with the nil decode error
        props = rec.get("Properties") or {}
        url = rec.get("Url") or ""
        try:
            u = urlsplit(url)
            host, path, scheme = u.netloc, u.path, u.scheme
        except ValueError:
            host = path = scheme = ""
        attrs = {
            "OperationName": rec.get("OperationName") or "",
            "AppRoleName": rec.get("AppRoleName") or "",
            "AppRoleInstance": rec.get("AppRoleInstance") or "",
            "Type": rec.get("Type") or "",
            "http.url": url,
            "http.host": host,
            "http.path": path,
            "http.response.status_code": rec.get("ResultCode") or "",
            "http.client_ip": rec.get("ClientIP") or "",
            "http.client_city": rec.get("ClientCity") or "",
            "http.client_type": rec.get("ClientType") or "",
            "http.client_state":
                rec.get("ClientStateOrProvince") or "",
            "http.client_country":
                rec.get("ClientCountryOrRegion") or "",
            "http.scheme": scheme,
            "http.method": str(props.get("HTTP Method") or ""),
        }
        for k, v in props.items():
            if k != "HTTP Method":
                attrs[k] = str(v)
        rows.append({
            "trace_id": trace_id,
            "span_id": span_id,
            "parent_span_id": parent_id,
            "span_name": rec.get("Name") or "",
            "span_kind": 2,  # Server
            "start_time_unix_nano": ns,
            "end_time_unix_nano":
                ns + int(float(rec.get("DurationMs") or 0.0) * 1e6),
            "attributes": json.dumps(attrs, sort_keys=True,
                                     separators=(",", ":")),
        })
    res_attrs = {
        "telemetry.sdk.name": LOGS_SCOPE,
        "telemetry.sdk.language": "go",
        "telemetry.sdk.version": version,
        "cloud.provider": "azure",
    }
    if service_name or records:
        res_attrs["service.name"] = service_name
    if resource_id:
        res_attrs["azure.resource.id"] = resource_id
    res_json = json.dumps(res_attrs, sort_keys=True,
                          separators=(",", ":"))
    for r in rows:
        r["resource_attributes"] = res_json
    return rows


_METRIC_SUFFIXES = ("total", "count", "minimum", "maximum",
                    "average")


def azure_metric_records(body: str,
                         formats: list[str] | None = None,
                         version: str = "") -> list[dict]:
    """azureresourcemetrics_unmarshaler.go:66-147 over one payload;
    five gauge rows per kept record."""
    try:
        doc = json.loads(body)
    except (ValueError, TypeError) as exc:
        raise ValueError(f"azure metrics decode: {exc}") from None
    records = (doc or {}).get("records") or []
    resource_id = ""
    rows = []
    for rec in records:
        if not isinstance(rec, dict):
            continue
        if not resource_id and rec.get("resourceId"):
            resource_id = rec["resourceId"]
        ns = azure_timestamp(rec.get("time") or "", formats)
        if ns is None:
            continue
        if (rec.get("timeGrain") or "") != "PT1M":
            continue  # unhandled time grain
        start = ns - 60 * 1_000_000_000
        base = (rec.get("metricName") or "").replace(" ", "_")
        vals = (float(rec.get("total") or 0.0),
                float(rec.get("count") or 0.0),
                float(rec.get("minimum") or 0.0),
                float(rec.get("maximum") or 0.0),
                float(rec.get("average") or 0.0))
        for suffix, v in zip(_METRIC_SUFFIXES, vals):
            rows.append({
                "name": f"{base}_{suffix}".lower(),
                "mtype": "gauge",
                "start_time_unix_nano": start,
                "time_unix_nano": ns,
                "value_double": v,
            })
    res_attrs = {
        "telemetry.sdk.name": METRICS_SCOPE,
        "telemetry.sdk.language": "go",
        "telemetry.sdk.version": version,
        "cloud.provider": "azure",
    }
    if resource_id:
        res_attrs["azure.resource.id"] = resource_id
    res_json = json.dumps(res_attrs, sort_keys=True,
                          separators=(",", ":"))
    for r in rows:
        r["resource_attributes"] = res_json
        r["scope_name"] = ""
        r["scope_version"] = ""
    return rows


_LOG_FIELDS = (("resource_id", pa.string()),
               ("scope_name", pa.string()),
               ("scope_version", pa.string()),
               ("time_unix_nano", pa.int64()),
               ("severity_number", pa.int32()),
               ("severity_text", pa.string()),
               ("attributes", pa.string()))
_TRACE_FIELDS = (("trace_id", pa.string()),
                 ("span_id", pa.string()),
                 ("parent_span_id", pa.string()),
                 ("span_name", pa.string()),
                 ("span_kind", pa.int32()),
                 ("start_time_unix_nano", pa.int64()),
                 ("end_time_unix_nano", pa.int64()),
                 ("attributes", pa.string()),
                 ("resource_attributes", pa.string()))
_METRIC_FIELDS = (("name", pa.string()),
                  ("mtype", pa.string()),
                  ("start_time_unix_nano", pa.int64()),
                  ("time_unix_nano", pa.int64()),
                  ("value_double", pa.float64()),
                  ("resource_attributes", pa.string()),
                  ("scope_name", pa.string()),
                  ("scope_version", pa.string()))


class _AzureParse:
    def __init__(self, fn, fields, body_col: str,
                 formats: list[str] | None, version: str):
        self.fn = fn
        self.fields = fields
        self.body_col = body_col
        self.formats = formats
        self.version = version

    def __call__(self, batch: pa.Table) -> pa.Table:
        bodies = batch.column(self.body_col).to_pylist()
        parent, recs = [], []
        for i, body in enumerate(bodies):
            try:
                rows = self.fn(body, self.formats, self.version)
            except ValueError:
                continue  # whole payload fails; nothing emitted
            for r in rows:
                parent.append(i)
                recs.append(r)
        out = batch.take(pa.array(parent, pa.int64()))
        names = [k for k, _ in self.fields]
        collide = [k for k in names if k in out.schema.names]
        if collide:
            out = out.drop_columns(collide)
        for k, typ in self.fields:
            out = out.append_column(
                k, pa.array([r[k] for r in recs], typ))
        return out


def parse_azure_logs(ds, *, body_col: str = "body",
                     formats: list[str] | None = None,
                     version: str = ""):
    """Azure resource-log payloads → flat log rows (fan-out)."""
    return ds.map_batches(
        _AzureParse(azure_log_records, _LOG_FIELDS, body_col,
                    formats, version),
        batch_format="pyarrow", zero_copy_batch=True)


def parse_azure_traces(ds, *, body_col: str = "body",
                       formats: list[str] | None = None,
                       version: str = ""):
    """Azure AppRequests/AppDependencies payloads → flat span rows
    (fan-out)."""
    return ds.map_batches(
        _AzureParse(azure_trace_records, _TRACE_FIELDS, body_col,
                    formats, version),
        batch_format="pyarrow", zero_copy_batch=True)


def parse_azure_metrics(ds, *, body_col: str = "body",
                        formats: list[str] | None = None,
                        version: str = ""):
    """Azure resource-metric payloads → five gauge rows per record
    (fan-out)."""
    return ds.map_batches(
        _AzureParse(azure_metric_records, _METRIC_FIELDS, body_col,
                    formats, version),
        batch_format="pyarrow", zero_copy_batch=True)
