"""pkg/translator/faro analog (receiver direction): Grafana Faro web-SDK
payloads → flat OTel log rows, and the payload's embedded OTLP traces →
flat span rows.

Parity with pkg/translator/faro/faro_to_logs.go:29-99 and keyval.go:

- one log record per payload item, in payload order logs → exceptions →
  measurements → events (faro_to_logs.go:35-63); the record body is the
  go-logfmt rendering of the item's ordered key/value map with the
  payload meta merged in afterwards (mergeKeyVal = ordered-map Set:
  existing keys keep their position, new keys append).
- per-kind key orders (keyval.go:78-185): log = timestamp kind level
  message context_* trace action; exception = timestamp kind level type
  value stacktrace trace context_* action; measurement = timestamp kind
  level type context_* <sorted %f value keys> trace value_* action;
  event = timestamp kind level event_name event_domain event_data_*
  action trace.  Map-derived keys (context, attributes, values) are
  emitted in Go ``slices.Sorted`` order.  ``keyValAdd`` drops
  empty-string values.
- meta key order (keyval.go:188-200): sdk app user session page browser
  k6 view geo; browser_mobile is ``fmt.Sprintf("%v", bool)`` (always
  present); brands render as browser_brand_<i>_brand/_version for the
  array form, browser_brands for the string form (keyval.go:277-288);
  k6_isK6Browser only when true.
- exception stacktrace string = "Type: Value" + "\\n  at fn
  (module|file:line:col)" per frame (keyval.go:113-135).
- record attributes: kind=<kind> always; exceptions additionally get
  hash = decimal xxh3.HashString(exception.Value)
  (faro_to_logs.go:47,94-96; functions/hashing.xxh3_64 — the 17-128
  path is pinned against the reference's own testdata hash vectors).
- resource attributes (faro_to_logs.go:71-79): service.name,
  service.version, deployment.environment always; service.namespace and
  app_bundle_id only when non-empty.
- timestamps render in Go TimeFormatRFC3339Milli
  ("2006-01-02T15:04:05.999Z07:00"): millisecond precision, trailing
  zeros (and a bare dot) trimmed, "Z" for UTC; an absent timestamp is
  the Go zero time "0001-01-01T00:00:00Z".
- logfmt rendering follows go-logfmt: a value is quoted iff it contains
  a rune <= ' ', '=', '"' or invalid UTF-8; quoting is Go strconv.Quote
  (named escapes, \\xHH / \\uHHHH for non-printables — Python
  str.isprintable() stands in for unicode.IsPrint, identical over the
  corpus alphabet).  An invalid key (same rune set, or empty) fails the
  item's marshal and the record is SKIPPED, the reference's per-record
  error semantics (faro_to_logs.go:85-90).
- a payload that fails JSON decode or field typing fails the WHOLE
  document (the faroreceiver 400s the POST) — same whole-request
  convention as the loki/zipkin stages.

Traces direction (faro_to_traces.go:17-45): payload.traces is an
embedded OTLP-JSON traces document; each ResourceSpans gets the meta
app's service.name/service.version/deployment.environment (and
service.namespace when non-empty) stamped into its resource attributes
(PutStr = update-in-place or append), then flattens through the shared
OTLP span codec so faro trace input is interchangeable with the
OTLP/zipkin/jaeger span rows.

Geo/K6 JSON field spellings follow the grafana/faro Go SDK
(``isK6Browser``, ``continent_iso_code`` …); the reference testdata does
not exercise them, so they are parity-by-construction only.

Execution: per-row JSON wire decode in a task-based map_batches (same
status as the OTLP-JSON reader), fan-out one row per item, block-local,
zero shuffle; original columns carried via batch.take(parent).
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timezone

import pyarrow as pa

from ..functions.hashing import xxh3_64
from .splunkhec import go_fmt_float

GO_ZERO_TIME = "0001-01-01T00:00:00Z"


# --- go-logfmt / strconv.Quote parity ---------------------------------

def _needs_quote(s: str) -> bool:
    return s == "" or any(r <= " " or r in '="' for r in s)


def go_strconv_quote(s: str) -> str:
    """Go strconv.Quote: double-quoted, named escapes for \\a..\\v,
    \\xHH below 0x80 / \\uHHHH / \\UHHHHHHHH for non-printables."""
    out = ['"']
    named = {"\a": "\\a", "\b": "\\b", "\f": "\\f", "\n": "\\n",
             "\r": "\\r", "\t": "\\t", "\v": "\\v"}
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch in named:
            out.append(named[ch])
        elif ch.isprintable() or ch == " ":
            out.append(ch)
        else:
            cp = ord(ch)
            if cp < 0x80:
                out.append(f"\\x{cp:02x}")
            elif cp < 0x10000:
                out.append(f"\\u{cp:04x}")
            else:
                out.append(f"\\U{cp:08x}")
    out.append('"')
    return "".join(out)


def _invalid_key(k: str) -> bool:
    return k == "" or any(r <= " " or r in '="' for r in k)


def logfmt_line(pairs) -> str:
    """go-logfmt MarshalKeyvals over (key, value) pairs; values may be
    str (quoted per needsQuoting) or float (fmt.Sprint = 'g' shortest).
    Raises ValueError on an invalid key (the caller skips the record)."""
    parts = []
    for k, v in pairs:
        if _invalid_key(k):
            raise ValueError(f"invalid logfmt key: {k!r}")
        if isinstance(v, float):
            sv = go_fmt_float(v)
        else:
            sv = v
            if _needs_quote(sv):
                sv = go_strconv_quote(sv)
        parts.append(f"{k}={sv}")
    return " ".join(parts)


# --- timestamps --------------------------------------------------------

def rfc3339_milli(ts: str | None) -> str:
    """Go time.Format("2006-01-02T15:04:05.999Z07:00") of an RFC3339
    input: truncate to ms, trim trailing fractional zeros, Z for UTC."""
    if not ts:
        return GO_ZERO_TIME
    s = ts.strip()
    if s.endswith(("Z", "z")):
        dt = datetime.fromisoformat(s[:-1] + "+00:00")
    else:
        dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    ms = dt.microsecond // 1000
    frac = ""
    if ms:
        frac = f".{ms:03d}".rstrip("0")
    off = dt.utcoffset()
    if not off:
        tz = "Z"
    else:
        total = int(off.total_seconds())
        sign = "+" if total >= 0 else "-"
        total = abs(total)
        tz = f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"
    return (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
            f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}{frac}{tz}")


# --- keyval builders (keyval.go) ---------------------------------------

def _kv_add(kv: list, key: str, value: str):
    if value != "":
        kv.append((key, value))


def _str(v, field: str) -> str:
    if v is None:
        return ""
    if not isinstance(v, str):
        raise ValueError(f"faro: field {field} must be a string")
    return v


def _map(v, field: str) -> dict:
    if v is None:
        return {}
    if not isinstance(v, dict):
        raise ValueError(f"faro: field {field} must be an object")
    return {k: _str(x, f"{field}.{k}") for k, x in v.items()}


def _trace_kv(kv: list, item: dict):
    tc = item.get("trace") or {}
    _kv_add(kv, "traceID", _str(tc.get("trace_id"), "trace.trace_id"))
    _kv_add(kv, "spanID", _str(tc.get("span_id"), "trace.span_id"))


def _action_kv(kv: list, item: dict):
    a = item.get("action") or {}
    _kv_add(kv, "action_id", _str(a.get("id"), "action.id"))
    _kv_add(kv, "action_name", _str(a.get("name"), "action.name"))
    _kv_add(kv, "action_parent_id",
            _str(a.get("parentId"), "action.parentId"))


def _ctx_kv(kv: list, item: dict, prefix: str = "context_"):
    ctx = _map(item.get("context"), "context")
    for k in sorted(ctx):
        _kv_add(kv, prefix + k, ctx[k])


def _log_kv(item: dict) -> list:
    kv = []
    level = _str(item.get("level"), "log.level") or "info"
    _kv_add(kv, "timestamp", rfc3339_milli(item.get("timestamp")))
    _kv_add(kv, "kind", "log")
    _kv_add(kv, "level", level)
    _kv_add(kv, "message", _str(item.get("message"), "log.message"))
    _ctx_kv(kv, item)
    _trace_kv(kv, item)
    _action_kv(kv, item)
    return kv


def _exception_string(item: dict) -> str:
    typ = _str(item.get("type"), "exception.type")
    val = _str(item.get("value"), "exception.value")
    out = f"{typ}: {val}"
    st = item.get("stacktrace") or {}
    for fr in st.get("frames") or []:
        module = _str(fr.get("module"), "frame.module")
        module = module + "|" if module else ""
        fn = _str(fr.get("function"), "frame.function")
        fname = _str(fr.get("filename"), "frame.filename")
        lineno = fr.get("lineno", 0) or 0
        colno = fr.get("colno", 0) or 0
        out += f"\n  at {fn} ({module}{fname}:{lineno}:{colno})"
    return out


def _exception_kv(item: dict) -> list:
    kv = []
    _kv_add(kv, "timestamp", rfc3339_milli(item.get("timestamp")))
    _kv_add(kv, "kind", "exception")
    _kv_add(kv, "level", "error")
    _kv_add(kv, "type", _str(item.get("type"), "exception.type"))
    _kv_add(kv, "value", _str(item.get("value"), "exception.value"))
    _kv_add(kv, "stacktrace", _exception_string(item))
    _trace_kv(kv, item)
    _ctx_kv(kv, item)
    _action_kv(kv, item)
    return kv


def _measurement_kv(item: dict) -> list:
    kv = []
    _kv_add(kv, "timestamp", rfc3339_milli(item.get("timestamp")))
    _kv_add(kv, "kind", "measurement")
    _kv_add(kv, "level", "info")
    _kv_add(kv, "type", _str(item.get("type"), "measurement.type"))
    _ctx_kv(kv, item)
    values = item.get("values") or {}
    if not isinstance(values, dict):
        raise ValueError("faro: measurement.values must be an object")
    fv = {}
    for k, v in values.items():
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError("faro: measurement value must be a number")
        fv[k] = float(v)
    for k in sorted(fv):
        _kv_add(kv, k, f"{fv[k]:f}")        # Go fmt %f
    _trace_kv(kv, item)
    for k in sorted(fv):
        kv.append((f"value_{k}", fv[k]))    # raw float64 (logfmt 'g')
    _action_kv(kv, item)
    return kv


def _event_kv(item: dict) -> list:
    kv = []
    _kv_add(kv, "timestamp", rfc3339_milli(item.get("timestamp")))
    _kv_add(kv, "kind", "event")
    _kv_add(kv, "level", "info")
    _kv_add(kv, "event_name", _str(item.get("name"), "event.name"))
    _kv_add(kv, "event_domain", _str(item.get("domain"), "event.domain"))
    if item.get("attributes") is not None:
        attrs = _map(item.get("attributes"), "event.attributes")
        for k in sorted(attrs):
            _kv_add(kv, "event_data_" + k, attrs[k])
    _action_kv(kv, item)
    _trace_kv(kv, item)
    return kv


def _meta_kv(meta: dict) -> list:
    kv = []
    sdk = meta.get("sdk") or {}
    _kv_add(kv, "sdk_name", _str(sdk.get("name"), "sdk.name"))
    _kv_add(kv, "sdk_version", _str(sdk.get("version"), "sdk.version"))
    integrations = sdk.get("integrations") or []
    if integrations:
        _kv_add(kv, "sdk_integrations", ",".join(
            f"{_str(i.get('name'), 'i.name')}:"
            f"{_str(i.get('version'), 'i.version')}"
            for i in integrations))
    app = meta.get("app") or {}
    _kv_add(kv, "app_name", _str(app.get("name"), "app.name"))
    _kv_add(kv, "app_namespace", _str(app.get("namespace"), "app.ns"))
    _kv_add(kv, "app_release", _str(app.get("release"), "app.release"))
    _kv_add(kv, "app_version", _str(app.get("version"), "app.version"))
    _kv_add(kv, "app_environment",
            _str(app.get("environment"), "app.environment"))
    user = meta.get("user") or {}
    _kv_add(kv, "user_email", _str(user.get("email"), "user.email"))
    _kv_add(kv, "user_id", _str(user.get("id"), "user.id"))
    _kv_add(kv, "user_username", _str(user.get("username"), "user.name"))
    uattrs = _map(user.get("attributes"), "user.attributes")
    for k in sorted(uattrs):
        _kv_add(kv, "user_attr_" + k, uattrs[k])
    session = meta.get("session") or {}
    _kv_add(kv, "session_id", _str(session.get("id"), "session.id"))
    sattrs = _map(session.get("attributes"), "session.attributes")
    for k in sorted(sattrs):
        _kv_add(kv, "session_attr_" + k, sattrs[k])
    page = meta.get("page") or {}
    _kv_add(kv, "page_id", _str(page.get("id"), "page.id"))
    _kv_add(kv, "page_url", _str(page.get("url"), "page.url"))
    pattrs = _map(page.get("attributes"), "page.attributes")
    for k in sorted(pattrs):
        _kv_add(kv, "page_attr_" + k, pattrs[k])
    browser = meta.get("browser")
    if browser is not None:
        _kv_add(kv, "browser_name", _str(browser.get("name"), "b.name"))
        _kv_add(kv, "browser_version",
                _str(browser.get("version"), "b.version"))
        _kv_add(kv, "browser_os", _str(browser.get("os"), "b.os"))
        mobile = browser.get("mobile", False)
        if not isinstance(mobile, bool):
            raise ValueError("faro: browser.mobile must be a bool")
        _kv_add(kv, "browser_mobile", "true" if mobile else "false")
        _kv_add(kv, "browser_userAgent",
                _str(browser.get("userAgent"), "b.userAgent"))
        _kv_add(kv, "browser_language",
                _str(browser.get("language"), "b.language"))
        _kv_add(kv, "browser_viewportWidth",
                _str(browser.get("viewportWidth"), "b.viewportWidth"))
        _kv_add(kv, "browser_viewportHeight",
                _str(browser.get("viewportHeight"), "b.viewportHeight"))
        brands = browser.get("brands")
        if isinstance(brands, list):
            for i, b in enumerate(brands):
                _kv_add(kv, f"browser_brand_{i}_brand",
                        _str(b.get("brand"), "brand.brand"))
                _kv_add(kv, f"browser_brand_{i}_version",
                        _str(b.get("version"), "brand.version"))
        elif isinstance(brands, str):
            _kv_add(kv, "browser_brands", brands)
        elif brands is not None:
            raise ValueError("faro: browser.brands must be array or string")
    k6 = meta.get("k6") or {}
    if k6.get("isK6Browser"):
        _kv_add(kv, "k6_isK6Browser", "true")
    view = meta.get("view") or {}
    _kv_add(kv, "view_name", _str(view.get("name"), "view.name"))
    geo = meta.get("geo") or {}
    _kv_add(kv, "geo_continent_iso",
            _str(geo.get("continent_iso_code"), "geo.continent"))
    _kv_add(kv, "geo_country_iso",
            _str(geo.get("country_iso_code"), "geo.country"))
    _kv_add(kv, "geo_subdivision_iso",
            _str(geo.get("subdivision_iso_code") or
                 geo.get("subdivision_iso"), "geo.subdivision"))
    _kv_add(kv, "geo_city", _str(geo.get("city"), "geo.city"))
    _kv_add(kv, "geo_asn_org", _str(geo.get("asn_org"), "geo.asn_org"))
    _kv_add(kv, "geo_asn_id", _str(geo.get("asn_id"), "geo.asn_id"))
    return kv


def _merge_kv(target: list, source: list) -> list:
    """ordered-map Set semantics: overwrite in place, append new keys."""
    d = dict(target)
    for k, v in source:
        d[k] = v
    return list(d.items())


def faro_payload_to_log_rows(payload: dict) -> list[dict]:
    """faro_to_logs.go TranslateToLogs over one decoded payload: one
    row per item with the logfmt body, kind/hash attrs and resource
    attributes; marshal-failing records are skipped (per-record error
    semantics)."""
    items = []
    for it in payload.get("logs") or []:
        items.append(("log", _log_kv(it), 0))
    for it in payload.get("exceptions") or []:
        h = xxh3_64(_str(it.get("value"), "exception.value")
                    .encode("utf-8"))
        items.append(("exception", _exception_kv(it), h))
    for it in payload.get("measurements") or []:
        items.append(("measurement", _measurement_kv(it), 0))
    for it in payload.get("events") or []:
        items.append(("event", _event_kv(it), 0))
    if not items:
        return []
    meta = payload.get("meta") or {}
    meta_kv = _meta_kv(meta)
    app = meta.get("app") or {}
    res = {
        "service_name": _str(app.get("name"), "app.name"),
        "service_version": _str(app.get("version"), "app.version"),
        "deployment_environment":
            _str(app.get("environment"), "app.environment"),
        "service_namespace":
            _str(app.get("namespace"), "app.namespace") or None,
        "app_bundle_id": _str(app.get("bundleId"), "app.bundleId") or None,
    }
    rows = []
    for kind, kv, h in items:
        merged = _merge_kv(kv, meta_kv)
        try:
            body = logfmt_line(merged)
        except ValueError:
            continue            # record skipped, the Go error path
        rows.append({"body": body, "kind": kind,
                     "hash": str(h) if (kind == "exception" and h) else None,
                     **res})
    return rows


_LOG_COLS = (("body", pa.string()), ("kind", pa.string()),
             ("hash", pa.string()), ("service_name", pa.string()),
             ("service_version", pa.string()),
             ("deployment_environment", pa.string()),
             ("service_namespace", pa.string()),
             ("app_bundle_id", pa.string()))


class _ParseFaro:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _LOG_COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                payload = json.loads(doc if doc is not None else "")
                if not isinstance(payload, dict):
                    raise ValueError("faro: payload must be an object")
                rows = faro_payload_to_log_rows(payload)
            except (ValueError, TypeError, AttributeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _LOG_COLS:
                    cols[name].append(None)
                cols["error"].append(str(e) or "invalid faro payload")
                continue
            for row in rows:
                parent.append(i)
                for name, _ in _LOG_COLS:
                    cols[name].append(row[name])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in _LOG_COLS + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_faro_payloads(ds, json_col: str = "payload_json", *,
                        on_error: str = "drop"):
    """Faro payload JSON documents → flat OTel log rows (block-local
    fan-out, zero shuffle; one row per log/exception/measurement/event
    item, logfmt body + kind/hash attributes + meta.app resource)."""
    return ds.map_batches(_ParseFaro(json_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


# --- traces direction ---------------------------------------------------

def faro_payload_trace_rows(payload: dict) -> list[dict]:
    """faro_to_traces.go TranslateToTraces: stamp meta.app attrs onto
    each embedded ResourceSpans (PutStr update-or-append), then flatten
    through the shared OTLP span codec."""
    from ..sources.otlpjson import flatten_otlp_traces
    traces = payload.get("traces")
    if not traces:
        return []
    app = (payload.get("meta") or {}).get("app") or {}
    stamp = [("service.name", _str(app.get("name"), "app.name")),
             ("service.version", _str(app.get("version"), "app.version")),
             ("deployment.environment",
              _str(app.get("environment"), "app.environment"))]
    ns = _str(app.get("namespace"), "app.namespace")
    if ns:
        stamp.append(("service.namespace", ns))
    for rs in traces.get("resourceSpans") or []:
        res = rs.setdefault("resource", {})
        attrs = res.setdefault("attributes", [])
        have = {kv.get("key"): kv for kv in attrs}
        for k, v in stamp:
            if k in have:
                have[k]["value"] = {"stringValue": v}
            else:
                attrs.append({"key": k, "value": {"stringValue": v}})
    return flatten_otlp_traces(traces)


class _ParseFaroTraces:
    def __init__(self, json_col: str):
        self.json_col = json_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.otlpproto import SPAN_FLAT_SCHEMA
        docs = batch.column(self.json_col).to_pylist()
        parent, rows = [], []
        for i, doc in enumerate(docs):
            try:
                payload = json.loads(doc if doc is not None else "")
                if not isinstance(payload, dict):
                    continue
                for row in faro_payload_trace_rows(payload):
                    parent.append(i)
                    rows.append(row)
            except (ValueError, TypeError, AttributeError):
                continue
        out = batch.take(pa.array(parent, pa.int64()))
        for field in SPAN_FLAT_SCHEMA:
            arr = pa.array([r.get(field.name) for r in rows], field.type)
            if field.name in out.column_names:
                out = out.set_column(
                    out.column_names.index(field.name), field.name, arr)
            else:
                out = out.append_column(field.name, arr)
        return out


def parse_faro_traces(ds, json_col: str = "payload_json"):
    """Faro payload JSON documents → flat span rows from the embedded
    OTLP traces (meta.app resource attrs stamped; schema-compatible
    with the OTLP/zipkin/jaeger codecs)."""
    return ds.map_batches(_ParseFaroTraces(json_col),
                          batch_format="pyarrow", zero_copy_batch=True)


# --- exporter direction (logs_to_faro.go) -------------------------------
#
# TranslateFromLogs (logs_to_faro.go:118-169): each log record's logfmt
# body is parsed back to a key/value map, rebuilt into a single-item
# faro payload by kind, and payloads with the same meta (sha256 of the
# JSON-encoded Meta, :140-153) merge item lists.  Per-record errors
# (unparseable logfmt, missing/unknown kind, bad bool/float/frame)
# skip the record, the Go multierr path.  Go iterates the meta map in
# random order; payloads here are emitted in first-appearance order
# (deterministic refinement, same set).

_LEVELS = {"error", "warning", "trace", "info", "debug"}

_FRAME_RE = re.compile(
    r"(?P<function>.+)?\s\(((?P<module>.+)\|)?(?P<filename>.+)?"
    r":(?P<lineno>\d+)?:(?P<colno>\d+)?\)$")


def go_unquote(s: str) -> str:
    """strconv.Unquote for a double-quoted Go string literal."""
    if len(s) < 2 or s[0] != '"' or s[-1] != '"':
        raise ValueError("not a quoted string")
    body = s[1:-1]
    out = []
    i = 0
    named = {"a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r",
             "t": "\t", "v": "\v", "\\": "\\", '"': '"', "'": "'"}
    while i < len(body):
        ch = body[i]
        if ch == '"':
            raise ValueError("unescaped quote")
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        i += 1
        if i >= len(body):
            raise ValueError("trailing backslash")
        e = body[i]
        if e in named:
            out.append(named[e])
            i += 1
        elif e == "x":
            out.append(chr(int(body[i + 1:i + 3], 16)))
            i += 3
        elif e == "u":
            out.append(chr(int(body[i + 1:i + 5], 16)))
            i += 5
        elif e == "U":
            out.append(chr(int(body[i + 1:i + 9], 16)))
            i += 9
        elif e in "01234567":
            out.append(chr(int(body[i:i + 3], 8)))
            i += 3
        else:
            raise ValueError(f"bad escape \\{e}")
    return "".join(out)


def logfmt_parse(line: str) -> dict:
    """go-logfmt Decoder over one record: key[=value] tokens, values
    optionally Go-quoted; duplicate keys last-wins; a '"' inside an
    unquoted token is an error (the record is skipped upstream)."""
    kv = {}
    i, n = 0, len(line)
    while i < n:
        while i < n and line[i] in " \t":
            i += 1
        if i >= n:
            break
        # key
        j = i
        while j < n and line[j] not in ' \t=':
            if line[j] == '"':
                raise ValueError("unexpected quote in key")
            j += 1
        key = line[i:j]
        if j < n and line[j] == "=":
            j += 1
            if j < n and line[j] == '"':
                k = j + 1
                while k < n:
                    if line[k] == "\\":
                        k += 2
                        continue
                    if line[k] == '"':
                        break
                    k += 1
                if k >= n:
                    raise ValueError("unterminated quoted value")
                value = go_unquote(line[j:k + 1])
                j = k + 1
            else:
                k = j
                while k < n and line[k] not in " \t":
                    if line[k] == '"':
                        raise ValueError("unexpected quote in value")
                    k += 1
                value = line[j:k]
                j = k
        else:
            value = ""
        if key:
            kv[key] = value
        i = j
    return kv


def _parse_rfc3339_milli(val: str) -> str:
    """time.Parse(RFC3339Milli) → canonical re-render (errors raise)."""
    out = rfc3339_milli(val)
    return out


def _extract_trace(kv: dict) -> dict:
    tc = {}
    if kv.get("traceID"):
        tc["trace_id"] = kv["traceID"]
    if kv.get("spanID"):
        tc["span_id"] = kv["spanID"]
    return tc


def _extract_action(kv: dict) -> dict:
    a = {}
    if kv.get("action_id"):
        a["id"] = kv["action_id"]
    if kv.get("action_name"):
        a["name"] = kv["action_name"]
    if kv.get("action_parent_id"):
        a["parentId"] = kv["action_parent_id"]
    return a


def _prefixed(kv: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in kv.items()
            if k.startswith(prefix)}


def _set_common(item: dict, kv: dict):
    if "timestamp" in kv:
        item["timestamp"] = _parse_rfc3339_milli(kv["timestamp"])
    tc = _extract_trace(kv)
    if tc:
        item["trace"] = tc
    a = _extract_action(kv)
    if a:
        item["action"] = a


def _extract_log(kv: dict) -> dict:
    item = {}
    if "message" in kv:
        item["message"] = kv["message"]
    lvl = kv.get("level")
    if lvl in _LEVELS:
        item["level"] = lvl
    ctx = _prefixed(kv, "context_")
    if ctx:
        item["context"] = ctx
    _set_common(item, kv)
    return item


def _extract_exception(kv: dict) -> dict:
    item = {}
    if "type" in kv:
        item["type"] = kv["type"]
    if "value" in kv:
        item["value"] = kv["value"]
    ctx = _prefixed(kv, "context_")
    if ctx:
        item["context"] = ctx
    if "stacktrace" in kv:
        frames = []
        st = kv["stacktrace"]
        prefix = f"{item.get('type', '')}: {item.get('value', '')}"
        if st.startswith(prefix):
            st = st[len(prefix):]
        for fs in st.split("\n  at "):
            if fs == "":
                continue
            m = _FRAME_RE.search(fs)
            if m is None:
                raise ValueError(f"unparseable frame: {fs!r}")
            fr = {}
            if m.group("function"):
                fr["function"] = m.group("function")
            if m.group("module"):
                fr["module"] = m.group("module")
            if m.group("filename"):
                fr["filename"] = m.group("filename")
            if m.group("lineno"):
                fr["lineno"] = int(m.group("lineno"))
            if m.group("colno"):
                fr["colno"] = int(m.group("colno"))
            frames.append(fr)
        item["stacktrace"] = {"frames": frames} if frames else {}
    _set_common(item, kv)
    return item


def _extract_measurement(kv: dict) -> dict:
    item = {}
    if "type" in kv:
        item["type"] = kv["type"]
    ctx = _prefixed(kv, "context_")
    if ctx:
        item["context"] = ctx
    values = {}
    for k, v in _prefixed(kv, "value_").items():
        values[k] = float(v)       # strconv.ParseFloat; raises on junk
    if values:
        item["values"] = values
    _set_common(item, kv)
    return item


def _extract_event(kv: dict) -> dict:
    item = {}
    if "event_name" in kv:
        item["name"] = kv["event_name"]
    if "event_domain" in kv:
        item["domain"] = kv["event_domain"]
    attrs = _prefixed(kv, "event_data_")
    if attrs:
        item["attributes"] = attrs
    _set_common(item, kv)
    return item


def _parse_bool_go(s: str) -> bool:
    if s in ("1", "t", "T", "TRUE", "true", "True"):
        return True
    if s in ("0", "f", "F", "FALSE", "false", "False"):
        return False
    raise ValueError(f"invalid bool {s!r}")


def _extract_meta(kv: dict, resource: dict) -> dict:
    """extractMetaFromKeyVal: app resolved resource-first
    (service.name > custom "app" attr > body app_name), browser/k6
    bools strict."""
    meta = {}
    app = {}
    name = resource.get("service_name") or resource.get("app") or ""
    if not name:
        name = kv.get("app_name", "")
    if name:
        app["name"] = name
    ns = resource.get("service_namespace") or kv.get("app_namespace", "")
    if ns:
        app["namespace"] = ns
    if kv.get("app_release"):
        app["release"] = kv["app_release"]
    ver = resource.get("service_version") or kv.get("app_version", "")
    if ver:
        app["version"] = ver
    env = (resource.get("deployment_environment") or
           kv.get("app_environment", ""))
    if env:
        app["environment"] = env
    if resource.get("app_bundle_id"):
        app["bundleId"] = resource["app_bundle_id"]
    if app:
        meta["app"] = app
    sdk = {}
    if kv.get("sdk_name"):
        sdk["name"] = kv["sdk_name"]
    if kv.get("sdk_version"):
        sdk["version"] = kv["sdk_version"]
    if kv.get("sdk_integrations"):
        ints = []
        for part in kv["sdk_integrations"].split(","):
            n, _, v = part.partition(":")
            if not _:
                raise ValueError("bad sdk integration")
            ints.append({"name": n, "version": v})
        sdk["integrations"] = ints
    if sdk:
        meta["sdk"] = sdk
    user = {}
    for src, dst in (("user_email", "email"), ("user_id", "id"),
                     ("user_username", "username")):
        if kv.get(src):
            user[dst] = kv[src]
    uattrs = _prefixed(kv, "user_attr_")
    if uattrs:
        user["attributes"] = uattrs
    if user:
        meta["user"] = user
    session = {}
    if kv.get("session_id"):
        session["id"] = kv["session_id"]
    sattrs = _prefixed(kv, "session_attr_")
    if sattrs:
        session["attributes"] = sattrs
    if session:
        meta["session"] = session
    page = {}
    if kv.get("page_id"):
        page["id"] = kv["page_id"]
    if kv.get("page_url"):
        page["url"] = kv["page_url"]
    pattrs = _prefixed(kv, "page_attr_")
    if pattrs:
        page["attributes"] = pattrs
    if page:
        meta["page"] = page
    browser = {}
    for src, dst in (("browser_name", "name"),
                     ("browser_version", "version"),
                     ("browser_os", "os"),
                     ("browser_language", "language"),
                     ("browser_userAgent", "userAgent"),
                     ("browser_viewportWidth", "viewportWidth"),
                     ("browser_viewportHeight", "viewportHeight")):
        if kv.get(src):
            browser[dst] = kv[src]
    if "browser_mobile" in kv:
        browser["mobile"] = _parse_bool_go(kv["browser_mobile"])
    if "browser_brands" in kv:
        browser["brands"] = kv["browser_brands"]
    else:
        brands_map = {}
        for k, v in kv.items():
            if not k.startswith("browser_brand_"):
                continue
            suffix = k[len("browser_brand_"):]
            idx_s, _, field = suffix.partition("_")
            idx = int(idx_s)
            b = brands_map.setdefault(idx, {})
            if field == "brand":
                b["brand"] = v
            elif field == "version":
                b["version"] = v
        if brands_map:
            browser["brands"] = [brands_map[i]
                                 for i in range(len(brands_map))]
    if browser:
        meta["browser"] = browser
    if "k6_isK6Browser" in kv:
        if _parse_bool_go(kv["k6_isK6Browser"]):
            meta["k6"] = {"isK6Browser": True}
    view = {}
    if kv.get("view_name"):
        view["name"] = kv["view_name"]
    if view:
        meta["view"] = view
    geo = {}
    for src, dst in (("geo_continent_iso", "continent_iso_code"),
                     ("geo_country_iso", "country_iso_code"),
                     ("geo_subdivision_iso", "subdivision_iso_code"),
                     ("geo_city", "city"),
                     ("geo_asn_org", "asn_org"),
                     ("geo_asn_id", "asn_id")):
        if kv.get(src):
            geo[dst] = kv[src]
    if geo:
        meta["geo"] = geo
    return meta


_KIND_FIELD = {"log": "logs", "exception": "exceptions",
               "measurement": "measurements", "event": "events"}

_KIND_EXTRACT = {"log": _extract_log, "exception": _extract_exception,
                 "measurement": _extract_measurement,
                 "event": _extract_event}


def log_row_to_faro(body: str, resource: dict):
    """translateLogToFaroPayload: one flat log row → (meta, kind, item).
    Raises ValueError on the Go error paths (bad logfmt, missing or
    unknown kind, bad bool/float/frame)."""
    kv = logfmt_parse(body if body is not None else "")
    kind = kv.get("kind")
    if kind is None:
        raise ValueError("log record body doesn't contain kind")
    if kind not in _KIND_FIELD:
        raise ValueError(f"kind: {kind} is not supported")
    item = _KIND_EXTRACT[kind](kv)
    meta = _extract_meta(kv, resource)
    return meta, kind, item


def rows_to_faro_payloads(rows) -> tuple[list[dict], list[str]]:
    """Group (body, resource) rows into faro payloads by meta identity
    (canonical-JSON key = the Go sha256-of-Meta key); payloads in
    first-appearance order. Returns (payloads, per-record errors)."""
    payloads, order, errs = {}, [], []
    for body, resource in rows:
        try:
            meta, kind, item = log_row_to_faro(body, resource)
        except ValueError as e:
            errs.append(str(e))
            continue
        key = json.dumps(meta, sort_keys=True, separators=(",", ":"))
        if key not in payloads:
            payloads[key] = {"meta": meta}
            order.append(key)
        payloads[key].setdefault(_KIND_FIELD[kind], []).append(item)
    return [payloads[k] for k in order], errs


_RES_COLS = ("service_name", "service_version", "deployment_environment",
             "service_namespace", "app_bundle_id")


class _LogsToFaro:
    """Per-block partial: one row per (meta_key, item) with the item
    JSON; the global groupby merges item lists per meta."""

    def __init__(self, body_col: str):
        self.body_col = body_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bodies = batch.column(self.body_col).to_pylist()
        res_cols = {c: (batch.column(c).to_pylist()
                        if c in batch.column_names else [None] * len(bodies))
                    for c in _RES_COLS}
        keys, kinds, items, metas = [], [], [], []
        for i, body in enumerate(bodies):
            resource = {c: res_cols[c][i] for c in _RES_COLS
                        if res_cols[c][i] is not None}
            try:
                meta, kind, item = log_row_to_faro(body, resource)
            except ValueError:
                continue
            keys.append(json.dumps(meta, sort_keys=True,
                                   separators=(",", ":")))
            kinds.append(kind)
            items.append(json.dumps(item, sort_keys=True,
                                    separators=(",", ":")))
            metas.append(keys[-1])
        return pa.table({"meta_key": pa.array(keys, pa.string()),
                         "kind": pa.array(kinds, pa.string()),
                         "item_json": pa.array(items, pa.string()),
                         "meta_json": pa.array(metas, pa.string())})


def logs_to_faro_payloads(ds, body_col: str = "body", *,
                          max_items: int = 8192):
    """Flat log rows → faro payload JSON documents, grouped by meta
    identity (logs_to_faro.go:118-169).  Shuffle shape: one lean
    (meta_key, kind, item_json) row per record through a hash groupby;
    group count = distinct metas × payload slices (``max_items`` bounds
    any hot meta's payload size, the loki max_entries convention)."""
    import pandas as pd

    partial = ds.map_batches(_LogsToFaro(body_col),
                             batch_format="pyarrow", zero_copy_batch=True)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        meta = json.loads(g["meta_key"].iloc[0])
        out_rows = []
        for lo in range(0, len(g), max_items):
            payload = {"meta": meta}
            sl = g.iloc[lo:lo + max_items]
            for kind, item in zip(sl["kind"], sl["item_json"]):
                payload.setdefault(_KIND_FIELD[kind],
                                   []).append(json.loads(item))
            out_rows.append({
                "meta_key": g["meta_key"].iloc[0],
                "payload_json": json.dumps(payload, sort_keys=True,
                                           separators=(",", ":")),
            })
        return pd.DataFrame(out_rows)

    return partial.groupby("meta_key").map_groups(
        finish, batch_format="pandas")
