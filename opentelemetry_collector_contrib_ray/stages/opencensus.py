"""pkg/translator/opencensus analog: OpenCensus ⇄ OTel, both signals.

Carrier: proto3-JSON of the OC export batch — one document per
``{node, resource, spans}`` / ``{node, resource, metrics}`` triple
(ids base64, int64 as strings, timestamps RFC3339, enums by name —
exactly what protojson emits for the census proto; the reference wire
is protobuf, same transport-variant status as the jaeger stage).

Decode parity (oc_to_traces.go, oc_to_resource.go, oc_to_metrics.go):

- per-span/metric resource split (oc_to_traces.go:37-104): items with
  their own ``resource`` get it (merged with the node) instead of the
  batch resource; a flat row model makes this simply "which resource
  the row's resource_attributes came from".
- node+resource → attrs (oc_to_resource.go:35-125): labels first with
  ``cloud.zone``→``cloud.availability_zone``, node attributes
  overwrite, then the special fields overwrite everything:
  service.name, opencensus.starttime (RFC3339Nano), host.name,
  process.pid (int, only when ≠0), telemetry.sdk.version,
  opencensus.exporterversion, telemetry.sdk.language (the 10-entry
  code map), opencensus.resourcetype.
- span kind (oc_to_traces.go:228-266): SERVER/CLIENT by field;
  UNSPECIFIED falls back to the ``span.kind`` attr
  (consumer/producer/internal, attr deleted on success, any other
  value leaves attr + kind 0).
- status (:153-178): OC code 0→Unset, everything else→Error; an
  ``otel.status_code`` int attr overrides the code verbatim and is
  deleted — but ONLY when the OC status is present (nil status returns
  before the attr is consumed, Go-exact).
- tracestate entries joined ``k=v,…``; attributes typed from the
  AttributeValue oneof with the literal
  "<Unknown OpenCensus attribute value type>" fallback; dropped count
  from the attr container; events = annotations (description → name)
  and message events (name "message", message.type enum name +
  messaging.message.id/payload_size_bytes/payload_compressed_size_bytes
  int attrs); links with tracestate+attrs;
  SameProcessAsParentSpan wrapper → bool attr
  ``opencensus.same_process_as_parent_span``. Span-level dropped
  event/link counts are not represented in the flat row model
  (documented reduction; per-event dropped counts ARE carried).
- ids: bytes truncated/zero-padded to 16/8 (oc_to_traces.go:137-151);
  zero parent → null, zero trace/span ids render as zero hex.
- metrics (oc_to_metrics.go): descriptor type → (gauge|sum cumulative
  monotonic|histogram cumulative|summary) with GAUGE_INT64/DOUBLE and
  CUMULATIVE_INT64/DOUBLE value typing; UNSPECIFIED/GAUGE_DISTRIBUTION
  descriptors and nil descriptors become empty metrics (no rows);
  label keys zip with per-timeseries values, hasValue=false skipped,
  value-list shorter than key-list truncates the keys (:191-210);
  distribution → sum/count/bucket counts/explicit bounds + per-bucket
  exemplars (value, timestamp, attachments); summary → sum/count
  wrappers + snapshot percentile/100 quantiles.

Encode parity (traces_to_oc.go, resource_to_oc.go, metrics_to_oc.go):

- attrs → node/resource: the same special keys back out (pid via
  ParseUint, bad values skipped; starttime re-parsed RFC3339Nano),
  everything else a resource label, cloud.availability_zone back to
  cloud.zone; resource type from opencensus.resourcetype else inferred
  from label presence (container.name→container, k8s.pod.name→k8s,
  host.name→host, cloud.provider→cloud — first match,
  resource_to_oc.go:29-51).
- spans: consumer/producer/internal kinds become the span.kind attr,
  status Unset/Ok→OC OK (Ok additionally records otel.status_code=1),
  Error→OC code 2; the same_process attr mirrors into the wrapper AND
  stays an attribute (Go keeps it in the map, traces_to_oc.go:47-48);
  events whose attrs are exactly the four message-event keys rebuild a
  MessageEvent (type by enum name), everything else an annotation.
- metrics: label-key union across the metric's points, sorted;
  defaults hasValue=false for missing keys; sum non-monotonic or
  non-cumulative degrades to a gauge type; int-ness decided by ALL
  number points being int (metrics_to_oc.go:52-191); histogram
  exemplars re-attach to the first bucket whose bound fits.

Execution: per-row JSON wire decode in task-based map_batches, fan-out
one row per span / metric point, block-local, zero shuffle; originals
carried via batch.take(parent).  Encode groups block-locally by
(group column, resource identity) — fan-out rows of one source doc are
contiguous within a block, the loki/splunk request convention.
"""

from __future__ import annotations

import base64
import json
from datetime import datetime, timezone

import pyarrow as pa

from .zipkin import _COLS

_SPAPS_ATTR = "opencensus.same_process_as_parent_span"
_UNKNOWN_ATTR = "<Unknown OpenCensus attribute value type>"
_UNKNOWN_EVENT = ("An unknown OpenCensus TimeEvent type was detected "
                  "when translating")

_OC_LANG_TO_SDK = {1: "cpp", 2: "dotnet", 3: "erlang", 4: "go",
                   5: "java", 6: "nodejs", 7: "php", 8: "python",
                   9: "ruby", 10: "webjs"}
_SDK_TO_OC_LANG = {v: k for k, v in _OC_LANG_TO_SDK.items()}
_OC_LANG_NAMES = {1: "LANGUAGE_CPP", 2: "LANGUAGE_DOTNET", 3: "LANGUAGE_ERLANG",
                  4: "LANGUAGE_GO", 5: "LANGUAGE_JAVA", 6: "LANGUAGE_NODE_JS",
                  7: "LANGUAGE_PHP", 8: "LANGUAGE_PYTHON", 9: "LANGUAGE_RUBY",
                  10: "LANGUAGE_WEB_JS"}
_OC_LANG_BY_NAME = {v: k for k, v in _OC_LANG_NAMES.items()}

_MSG_EVENT_KEYS = ("message.type", "messaging.message.id",
                   "messaging.message.payload_size_bytes",
                   "messaging.message.payload_compressed_size_bytes")

_MSG_TYPE_NAMES = {0: "TYPE_UNSPECIFIED", 1: "SENT", 2: "RECEIVED"}
_MSG_TYPE_BY_NAME = {v: k for k, v in _MSG_TYPE_NAMES.items()}

# first-match label-presence → inferred OC resource type
_INFERRED_TYPES = (("container.name", "container"),
                   ("k8s.pod.name", "k8s"),
                   ("host.name", "host"),
                   ("cloud.provider", "cloud"))


# --- proto3-JSON scalar helpers -----------------------------------------

def rfc3339_to_ns(s) -> int:
    """protojson Timestamp → unix ns (exact, nanosecond fraction)."""
    if not s:
        return 0
    s = s.strip()
    if s.endswith(("Z", "z")):
        s, tz = s[:-1], "+00:00"
    else:
        # trailing ±HH:MM offset
        tz = s[-6:]
        s = s[:-6]
    frac = 0
    if "." in s:
        s, _, f = s.partition(".")
        frac = int(f.ljust(9, "0")[:9])
    dt = datetime.fromisoformat(s + tz)
    return int(dt.timestamp()) * 1_000_000_000 + frac


def ns_to_rfc3339(ns: int) -> str:
    """protojson Timestamp emission: UTC 'Z', fraction printed with
    0/3/6/9 digits (the smallest that is exact)."""
    sec, frac = divmod(int(ns), 1_000_000_000)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    base = (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
            f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}")
    if frac == 0:
        return base + "Z"
    if frac % 1_000_000 == 0:
        return f"{base}.{frac // 1_000_000:03d}Z"
    if frac % 1_000 == 0:
        return f"{base}.{frac // 1_000:06d}Z"
    return f"{base}.{frac:09d}Z"


def ns_to_rfc3339_nano(ns: int) -> str:
    """Go time.Format(time.RFC3339Nano): trailing fractional zeros
    trimmed (any count), used for the opencensus.starttime attr."""
    sec, frac = divmod(int(ns), 1_000_000_000)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    base = (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
            f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}")
    if frac:
        base += ("." + f"{frac:09d}").rstrip("0")
    return base + "Z"


def _b64_to_hex(s, width: int):
    """base64 id bytes → zero-padded/truncated hex (oc_to_traces.go
    traceIDToInternal/spanIDToInternal copy semantics)."""
    raw = base64.b64decode(s) if s else b""
    raw = (raw + b"\x00" * width)[:width]
    return raw.hex()


def _hex_to_b64(h, width: int):
    """hex id → base64, None for the all-zero (IsEmpty) id."""
    raw = bytes.fromhex(h) if h else b""
    raw = (raw + b"\x00" * width)[:width]
    if raw == b"\x00" * width:
        return None
    return base64.b64encode(raw).decode("ascii")


def _int64(v) -> int:
    """proto3-JSON int64: number or decimal string."""
    if v is None:
        return 0
    return int(v)


def oc_attr_value(av: dict):
    """AttributeValue oneof → python value (PutStr/Int/Bool/Double)."""
    if "stringValue" in av:
        sv = av["stringValue"] or {}
        return sv.get("value") or ""
    if "intValue" in av:
        return _int64(av["intValue"])
    if "boolValue" in av:
        return bool(av["boolValue"])
    if "doubleValue" in av:
        return float(av["doubleValue"])
    return _UNKNOWN_ATTR


def _py_to_oc_attr(v) -> dict:
    """python attr value → AttributeValue oneof (traces_to_oc.go
    attributeValueToOC; flat JSON has no map/slice values)."""
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    return {"stringValue": {"value": v}} if v else {"stringValue": {}}


def _oc_attrs(container) -> tuple[dict, int]:
    """Span_Attributes message → (py dict, droppedAttributesCount)."""
    if not container:
        return {}, 0
    amap = container.get("attributeMap") or {}
    out = {k: oc_attr_value(v or {}) for k, v in amap.items()}
    return out, _int64(container.get("droppedAttributesCount"))


def _tracestate(ts) -> str:
    if not ts:
        return ""
    return ",".join(f"{e.get('key', '')}={e.get('value', '')}"
                    for e in ts.get("entries") or [])


# --- node/resource ⇄ attrs ----------------------------------------------

def oc_node_resource_attrs(node, resource) -> dict:
    """ocNodeResourceToInternal (oc_to_resource.go:35-125)."""
    node = node or {}
    resource = resource or {}
    attrs: dict = {}
    for k, v in (resource.get("labels") or {}).items():
        if k == "cloud.zone":
            attrs["cloud.availability_zone"] = v
        else:
            attrs[k] = v
    for k, v in (node.get("attributes") or {}).items():
        attrs[k] = v
    svc = node.get("serviceInfo") or {}
    if svc.get("name"):
        attrs["service.name"] = svc["name"]
    ident = node.get("identifier") or {}
    if ident.get("startTimestamp"):
        attrs["opencensus.starttime"] = ns_to_rfc3339_nano(
            rfc3339_to_ns(ident["startTimestamp"]))
    if ident.get("hostName"):
        attrs["host.name"] = ident["hostName"]
    if _int64(ident.get("pid")):
        attrs["process.pid"] = _int64(ident["pid"])
    lib = node.get("libraryInfo") or {}
    if lib.get("coreLibraryVersion"):
        attrs["telemetry.sdk.version"] = lib["coreLibraryVersion"]
    if lib.get("exporterVersion"):
        attrs["opencensus.exporterversion"] = lib["exporterVersion"]
    lang = lib.get("language")
    if isinstance(lang, str):
        lang = _OC_LANG_BY_NAME.get(lang, 0)
    if lang and lang in _OC_LANG_TO_SDK:
        attrs["telemetry.sdk.language"] = _OC_LANG_TO_SDK[lang]
    if resource.get("type"):
        attrs["opencensus.resourcetype"] = resource["type"]
    return attrs


def attrs_to_oc_node_resource(attrs: dict):
    """internalResourceToOC (resource_to_oc.go:70-127)."""
    if not attrs:
        return None, None
    node: dict = {}
    res: dict = {}
    labels: dict = {}
    for k, v in attrs.items():
        sval = _attr_as_string(v)
        if k == "cloud.availability_zone":
            labels["cloud.zone"] = sval
        elif k == "opencensus.resourcetype":
            res["type"] = sval
        elif k == "service.name":
            node.setdefault("serviceInfo", {})["name"] = sval
        elif k == "opencensus.starttime":
            try:
                ns = rfc3339_to_ns(sval)
            except ValueError:
                continue
            node.setdefault("identifier", {})["startTimestamp"] = \
                ns_to_rfc3339(ns)
        elif k == "host.name":
            node.setdefault("identifier", {})["hostName"] = sval
        elif k == "process.pid":
            try:
                pid = int(sval)
                if pid < 0 or pid > 0xFFFFFFFF:
                    raise ValueError
            except ValueError:
                continue
            node.setdefault("identifier", {})["pid"] = str(pid)
        elif k == "telemetry.sdk.version":
            node.setdefault("libraryInfo", {})["coreLibraryVersion"] = sval
        elif k == "opencensus.exporterversion":
            node.setdefault("libraryInfo", {})["exporterVersion"] = sval
        elif k == "telemetry.sdk.language":
            code = _SDK_TO_OC_LANG.get(sval)
            if code:
                node.setdefault("libraryInfo", {})["language"] = \
                    _OC_LANG_NAMES[code]
        else:
            labels[k] = sval
    res["labels"] = labels
    if not res.get("type"):
        for key, typ in _INFERRED_TYPES:
            if key in labels:
                res["type"] = typ
                break
    return node, res


def _attr_as_string(v) -> str:
    """pcommon.Value.AsString for flat JSON values."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        from .splunkhec import go_fmt_float
        return go_fmt_float(v)
    if isinstance(v, int):
        return str(v)
    return v if v is not None else ""


# --- span decode ---------------------------------------------------------

def oc_span_to_flat(span: dict, res_attrs_json: str) -> dict:
    """ocSpanToInternal (oc_to_traces.go:113-135) → flat row."""
    attrs_container = span.get("attributes") or {}
    attrs, dropped = _oc_attrs(attrs_container)

    # kind BEFORE attrs cleanup (may delete span.kind)
    kind_field = span.get("kind") or 0
    if kind_field == "SERVER" or kind_field == 1:
        kind = 2
    elif kind_field == "CLIENT" or kind_field == 2:
        kind = 3
    else:
        kind = 0
        kv = attrs.get("span.kind")
        if isinstance(kv, str):
            mapped = {"consumer": 5, "producer": 4, "internal": 1}.get(kv)
            if mapped is not None:
                kind = mapped
                del attrs["span.kind"]

    status = span.get("status")
    status_code, status_message = 0, None
    if status is not None:
        status_code = 0 if _int64(status.get("code")) == 0 else 2
        if "otel.status_code" in attrs:
            ov = attrs["otel.status_code"]
            status_code = ov if isinstance(ov, int) and not \
                isinstance(ov, bool) else 0
            del attrs["otel.status_code"]
        status_message = status.get("message") or None

    events = []
    for te in (span.get("timeEvents") or {}).get("timeEvent") or []:
        if te is None:
            continue
        ts = rfc3339_to_ns(te.get("time"))
        if "annotation" in te:
            ann = te["annotation"] or {}
            desc = (ann.get("description") or {}).get("value") or ""
            eattrs, edropped = _oc_attrs(ann.get("attributes"))
            events.append({"name": desc, "timeUnixNano": ts,
                           "attributes": eattrs,
                           "droppedAttributesCount": edropped})
        elif "messageEvent" in te:
            me = te["messageEvent"] or {}
            typ = me.get("type") or 0
            if isinstance(typ, int):
                typ = _MSG_TYPE_NAMES.get(typ, "TYPE_UNSPECIFIED")
            events.append({"name": "message", "timeUnixNano": ts,
                           "attributes": {
                               "message.type": typ,
                               "messaging.message.id":
                                   _int64(me.get("id")),
                               "messaging.message.payload_size_bytes":
                                   _int64(me.get("uncompressedSize")),
                               "messaging.message."
                               "payload_compressed_size_bytes":
                                   _int64(me.get("compressedSize"))},
                           "droppedAttributesCount": 0})
        else:
            events.append({"name": _UNKNOWN_EVENT, "timeUnixNano": ts,
                           "attributes": {},
                           "droppedAttributesCount": 0})

    links = []
    for lk in (span.get("links") or {}).get("link") or []:
        if lk is None:
            continue
        lattrs, ldropped = _oc_attrs(lk.get("attributes"))
        link = {"traceId": _b64_to_hex(lk.get("traceId"), 16),
                "spanId": _b64_to_hex(lk.get("spanId"), 8),
                "attributes": lattrs,
                "droppedAttributesCount": ldropped}
        lts = _tracestate(lk.get("tracestate"))
        if lts:
            link["traceState"] = lts
        links.append(link)

    spaps = span.get("sameProcessAsParentSpan")
    if spaps is not None:
        val = spaps.get("value", False) if isinstance(spaps, dict) \
            else bool(spaps)
        attrs[_SPAPS_ATTR] = bool(val)

    parent_hex = _b64_to_hex(span.get("parentSpanId"), 8)
    return {
        "trace_id": _b64_to_hex(span.get("traceId"), 16),
        "span_id": _b64_to_hex(span.get("spanId"), 8),
        "parent_span_id": None if parent_hex == "0" * 16 else parent_hex,
        "trace_state": _tracestate(span.get("tracestate")) or None,
        "span_name": (span.get("name") or {}).get("value") or "",
        "span_kind": kind,
        "start_time_unix_nano": rfc3339_to_ns(span.get("startTime")),
        "end_time_unix_nano": rfc3339_to_ns(span.get("endTime")),
        "status_code": status_code,
        "status_message": status_message,
        "attributes": json.dumps(attrs, sort_keys=True),
        "resource_attributes": res_attrs_json,
        "scope_name": None,
        "scope_version": None,
        "events": json.dumps(events, sort_keys=True),
        "links": json.dumps(links, sort_keys=True),
    }


class _ParseOCTraces:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                d = json.loads(doc if doc is not None else "")
                if not isinstance(d, dict):
                    raise ValueError("oc: document must be an object")
                batch_res = json.dumps(
                    oc_node_resource_attrs(d.get("node"),
                                           d.get("resource")),
                    sort_keys=True)
                rows = []
                for sp in d.get("spans") or []:
                    if sp is None:
                        continue       # nil spans skipped (Go)
                    res_json = batch_res
                    if sp.get("resource") is not None:
                        res_json = json.dumps(
                            oc_node_resource_attrs(d.get("node"),
                                                   sp["resource"]),
                            sort_keys=True)
                    rows.append(oc_span_to_flat(sp, res_json))
            except (ValueError, TypeError, KeyError,
                    json.JSONDecodeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(None)
                cols["error"].append(str(e) or "invalid oc document")
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


def parse_oc_traces(ds, json_col: str = "oc_json", *,
                    on_error: str = "drop"):
    """OC trace batch documents → flat span rows (block-local fan-out,
    zero shuffle; schema = the zipkin/jaeger/OTLP span rows)."""
    return ds.map_batches(_ParseOCTraces(json_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


# --- span encode (traces_to_oc.go) ---------------------------------------

def flat_span_to_oc(row: dict) -> dict:
    """spanToOC (traces_to_oc.go:46-86) over one flat row."""
    attrs = json.loads(row.get("attributes") or "{}")
    amap = {k: _py_to_oc_attr(v) for k, v in attrs.items()}

    kind = row.get("span_kind") or 0
    kind_attr = {5: "consumer", 4: "producer", 1: "internal"}.get(kind)
    if kind_attr:
        amap["span.kind"] = {"stringValue": {"value": kind_attr}}
    oc_kind = {2: "SERVER", 3: "CLIENT"}.get(kind, "SPAN_KIND_UNSPECIFIED")

    code = row.get("status_code") or 0
    if code == 1:                       # Ok → OC OK + marker attr
        oc_code, status_attr = 0, 1
    elif code == 2:                     # Error → OC Unknown
        oc_code, status_attr = 2, None
    else:                               # Unset → OC OK
        oc_code, status_attr = 0, None
    if status_attr is not None:
        amap["otel.status_code"] = {"intValue": str(status_attr)}
    status: dict = {}
    if oc_code:
        status["code"] = oc_code
    if row.get("status_message"):
        status["message"] = row["status_message"]

    spaps = None
    if isinstance(attrs.get(_SPAPS_ATTR), bool):
        spaps = {"value": attrs[_SPAPS_ATTR]}

    events = json.loads(row.get("events") or "[]")
    oc_events = []
    for ev in events:
        eattrs = ev.get("attributes") or {}
        te: dict = {"time": ns_to_rfc3339(ev.get("timeUnixNano") or 0)}
        if len(eattrs) == len(_MSG_EVENT_KEYS) and \
                any(k in eattrs for k in _MSG_EVENT_KEYS):
            typ = eattrs.get("message.type")
            te["messageEvent"] = {
                "type": typ if typ in _MSG_TYPE_BY_NAME
                else "TYPE_UNSPECIFIED",
                "id": str(_int_or_zero(
                    eattrs.get("messaging.message.id"))),
                "uncompressedSize": str(_int_or_zero(eattrs.get(
                    "messaging.message.payload_size_bytes"))),
                "compressedSize": str(_int_or_zero(eattrs.get(
                    "messaging.message.payload_compressed_size_bytes"))),
            }
        else:
            ann: dict = {}
            if ev.get("name"):
                ann["description"] = {"value": ev["name"]}
            if eattrs or ev.get("droppedAttributesCount"):
                ann["attributes"] = {
                    "attributeMap": {k: _py_to_oc_attr(v)
                                     for k, v in eattrs.items()},
                    "droppedAttributesCount":
                        ev.get("droppedAttributesCount") or 0}
            te["annotation"] = ann
        oc_events.append(te)

    links = json.loads(row.get("links") or "[]")
    oc_links = []
    for lk in links:
        ol: dict = {}
        tid = _hex_to_b64(lk.get("traceId"), 16)
        sid = _hex_to_b64(lk.get("spanId"), 8)
        if tid:
            ol["traceId"] = tid
        if sid:
            ol["spanId"] = sid
        lts = _ts_entries(lk.get("traceState"))
        if lts:
            ol["tracestate"] = lts
        lattrs = lk.get("attributes") or {}
        if lattrs or lk.get("droppedAttributesCount"):
            ol["attributes"] = {
                "attributeMap": {k: _py_to_oc_attr(v)
                                 for k, v in lattrs.items()},
                "droppedAttributesCount":
                    lk.get("droppedAttributesCount") or 0}
        oc_links.append(ol)

    sp: dict = {}
    tid = _hex_to_b64(row.get("trace_id"), 16)
    sid = _hex_to_b64(row.get("span_id"), 8)
    pid = _hex_to_b64(row.get("parent_span_id"), 8)
    if tid:
        sp["traceId"] = tid
    if sid:
        sp["spanId"] = sid
    if pid:
        sp["parentSpanId"] = pid
    ts_entries = _ts_entries(row.get("trace_state"))
    if ts_entries:
        sp["tracestate"] = ts_entries
    if row.get("span_name"):
        sp["name"] = {"value": row["span_name"]}
    if oc_kind != "SPAN_KIND_UNSPECIFIED":
        sp["kind"] = oc_kind
    sp["startTime"] = ns_to_rfc3339(row.get("start_time_unix_nano") or 0)
    sp["endTime"] = ns_to_rfc3339(row.get("end_time_unix_nano") or 0)
    if amap:
        sp["attributes"] = {"attributeMap": amap}
    if oc_events:
        sp["timeEvents"] = {"timeEvent": oc_events}
    if oc_links:
        sp["links"] = {"link": oc_links}
    sp["status"] = status
    if spaps is not None:
        sp["sameProcessAsParentSpan"] = spaps
    return sp


def _int_or_zero(v):
    return v if isinstance(v, int) and not isinstance(v, bool) else 0


def _ts_entries(trace_state):
    if not trace_state:
        return None
    entries = []
    for pair in trace_state.split(","):
        k, _, v = pair.partition("=")
        entries.append({"key": k, "value": v})
    return {"entries": entries}


class _SpansToOC:
    """Block-local: group contiguous (group, resource_attributes) runs
    into one OC document each (ResourceSpansToOC per resource)."""

    def __init__(self, group_col: str):
        self.group_col = group_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        groups = (batch.column(self.group_col).to_pylist()
                  if self.group_col in batch.column_names
                  else [None] * n)
        res = batch.column("resource_attributes").to_pylist()
        rows = batch.to_pylist()
        out_groups, out_docs = [], []
        i = 0
        while i < n:
            j = i
            while j < n and groups[j] == groups[i] and res[j] == res[i]:
                j += 1
            node, resource = attrs_to_oc_node_resource(
                json.loads(res[i] or "{}"))
            doc: dict = {}
            if node:
                doc["node"] = node
            if resource is not None:
                doc["resource"] = resource
            doc["spans"] = [flat_span_to_oc(rows[k]) for k in range(i, j)]
            out_groups.append(groups[i])
            out_docs.append(json.dumps(doc, sort_keys=True))
            i = j
        cols = {"oc_json": pa.array(out_docs, pa.string())}
        if self.group_col in batch.column_names:
            gt = batch.schema.field(self.group_col).type
            cols = {self.group_col: pa.array(out_groups, gt), **cols}
        return pa.table(cols)


def spans_to_oc(ds, group_col: str = "event_id"):
    """Flat span rows → OC trace batch documents, one per contiguous
    (group, resource) run — the per-span-resource split inverted."""
    return ds.map_batches(_SpansToOC(group_col),
                          batch_format="pyarrow", zero_copy_batch=True)


# --- metrics decode ------------------------------------------------------

_MCOLS = (("metric_name", pa.string()), ("metric_description", pa.string()),
          ("metric_unit", pa.string()), ("metric_type", pa.string()),
          ("aggregation_temporality", pa.int64()),
          ("is_monotonic", pa.bool_()),
          ("start_time_unix_nano", pa.int64()),
          ("time_unix_nano", pa.int64()),
          ("value_int", pa.int64()), ("value_double", pa.float64()),
          ("count", pa.int64()), ("dist_sum", pa.float64()),
          ("bucket_counts", pa.string()), ("explicit_bounds", pa.string()),
          ("quantiles", pa.string()), ("exemplars", pa.string()),
          ("attributes", pa.string()),
          ("resource_attributes", pa.string()))

_OC_DESCRIPTOR_TYPES = {
    "GAUGE_INT64": ("gauge", "int"), 1: ("gauge", "int"),
    "GAUGE_DOUBLE": ("gauge", "double"), 2: ("gauge", "double"),
    "CUMULATIVE_INT64": ("sum", "int"), 4: ("sum", "int"),
    "CUMULATIVE_DOUBLE": ("sum", "double"), 5: ("sum", "double"),
    "CUMULATIVE_DISTRIBUTION": ("histogram", None), 6: ("histogram", None),
    "SUMMARY": ("summary", None), 7: ("summary", None),
}


def oc_metric_rows(metric: dict, res_json: str) -> list[dict]:
    """ocMetricToMetrics (oc_to_metrics.go:127-348) → flat point rows."""
    desc = metric.get("metricDescriptor")
    if not desc:
        return []
    typ = _OC_DESCRIPTOR_TYPES.get(desc.get("type") or 0)
    if typ is None:
        return []          # UNSPECIFIED / GAUGE_DISTRIBUTION → empty
    mtype, valtype = typ
    keys = [lk.get("key") or "" for lk in desc.get("labelKeys") or []]
    base = {"metric_name": desc.get("name") or "",
            "metric_description": desc.get("description") or "",
            "metric_unit": desc.get("unit") or "",
            "metric_type": mtype,
            "aggregation_temporality": 2 if mtype in ("sum", "histogram")
            else 0,
            "is_monotonic": mtype == "sum",
            "resource_attributes": res_json}
    rows = []
    for ts in metric.get("timeseries") or []:
        if ts is None:
            continue
        start = rfc3339_to_ns(ts.get("startTimestamp"))
        values = ts.get("labelValues") or []
        cnt = min(len(keys), len(values)) if keys and values else 0
        attrs = {}
        for i in range(cnt):
            lv = values[i] or {}
            if not lv.get("hasValue"):
                continue
            attrs[keys[i]] = lv.get("value") or ""
        attrs_json = json.dumps(attrs, sort_keys=True)
        for p in ts.get("points") or []:
            if p is None:
                continue
            row = dict(base)
            row["start_time_unix_nano"] = start
            row["time_unix_nano"] = rfc3339_to_ns(p.get("timestamp"))
            row["attributes"] = attrs_json
            row.update({"value_int": None, "value_double": None,
                        "count": None, "dist_sum": None,
                        "bucket_counts": None, "explicit_bounds": None,
                        "quantiles": None, "exemplars": None})
            if valtype == "int":
                row["value_int"] = _int64(p.get("int64Value"))
            elif valtype == "double":
                row["value_double"] = float(p.get("doubleValue") or 0.0)
            elif mtype == "histogram":
                dv = p.get("distributionValue") or {}
                row["dist_sum"] = float(dv.get("sum") or 0.0)
                row["count"] = _int64(dv.get("count"))
                buckets = dv.get("buckets") or []
                row["bucket_counts"] = json.dumps(
                    [_int64((b or {}).get("count")) for b in buckets])
                bounds = (((dv.get("bucketOptions") or {})
                           .get("explicit") or {}).get("bounds") or [])
                row["explicit_bounds"] = json.dumps(
                    [float(b) for b in bounds])
                exemplars = []
                for b in buckets:
                    ex = (b or {}).get("exemplar")
                    if not ex:
                        continue
                    exemplars.append({
                        "value": float(ex.get("value") or 0.0),
                        "timeUnixNano": rfc3339_to_ns(ex.get("timestamp")),
                        "filteredAttributes": ex.get("attachments") or {}})
                row["exemplars"] = json.dumps(exemplars, sort_keys=True)
            elif mtype == "summary":
                sv = p.get("summaryValue") or {}
                row["dist_sum"] = float(
                    (sv.get("sum") or {}).get("value") or 0.0)
                row["count"] = _int64((sv.get("count") or {}).get("value"))
                pct = ((sv.get("snapshot") or {})
                       .get("percentileValues") or [])
                row["quantiles"] = json.dumps(
                    [{"quantile": float((q or {}).get("percentile")
                                        or 0.0) / 100,
                      "value": float((q or {}).get("value") or 0.0)}
                     for q in pct])
            rows.append(row)
    return rows


class _ParseOCMetrics:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _MCOLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                d = json.loads(doc if doc is not None else "")
                if not isinstance(d, dict):
                    raise ValueError("oc: document must be an object")
                batch_res = json.dumps(
                    oc_node_resource_attrs(d.get("node"),
                                           d.get("resource")),
                    sort_keys=True)
                rows = []
                for m in d.get("metrics") or []:
                    if m is None:
                        continue
                    res_json = batch_res
                    if m.get("resource") is not None:
                        res_json = json.dumps(
                            oc_node_resource_attrs(d.get("node"),
                                                   m["resource"]),
                            sort_keys=True)
                    rows.extend(oc_metric_rows(m, res_json))
            except (ValueError, TypeError, KeyError,
                    json.JSONDecodeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _MCOLS:
                    cols[name].append(None)
                cols["error"].append(str(e) or "invalid oc document")
                continue
            for row in rows:
                parent.append(i)
                for name, _ in _MCOLS:
                    cols[name].append(row[name])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in _MCOLS + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_oc_metrics(ds, json_col: str = "oc_json", *,
                     on_error: str = "drop"):
    """OC metric batch documents → flat point rows (block-local
    fan-out, zero shuffle)."""
    return ds.map_batches(_ParseOCMetrics(json_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


# --- metrics encode (metrics_to_oc.go) -----------------------------------

def flat_metric_points_to_oc(points: list[dict]) -> dict:
    """metricToOC over one metric's points (same name/desc/unit/type):
    sorted label-key union, hasValue defaults, all-int detection."""
    first = points[0]
    mtype = first["metric_type"]
    key_set: set = set()
    all_int = True
    for p in points:
        attrs = json.loads(p.get("attributes") or "{}")
        key_set.update(attrs)
        if mtype in ("gauge", "sum") and p.get("value_int") is None:
            all_int = False
    keys = sorted(key_set)

    if mtype == "gauge":
        oc_type = "GAUGE_INT64" if all_int else "GAUGE_DOUBLE"
    elif mtype == "sum":
        if first.get("is_monotonic") and \
                first.get("aggregation_temporality") == 2:
            oc_type = "CUMULATIVE_INT64" if all_int else "CUMULATIVE_DOUBLE"
        else:
            oc_type = "GAUGE_INT64" if all_int else "GAUGE_DOUBLE"
    elif mtype == "histogram":
        oc_type = ("CUMULATIVE_DISTRIBUTION"
                   if first.get("aggregation_temporality") == 2
                   else "GAUGE_DISTRIBUTION")
    else:
        oc_type = "SUMMARY"

    timeseries = []
    for p in points:
        attrs = json.loads(p.get("attributes") or "{}")
        lvs = []
        for k in keys:
            if k in attrs:
                lvs.append({"value": _attr_as_string(attrs[k]),
                            "hasValue": True})
            else:
                lvs.append({})
        point: dict = {"timestamp": ns_to_rfc3339(
            p.get("time_unix_nano") or 0)}
        if mtype in ("gauge", "sum"):
            if all_int:
                point["int64Value"] = str(p.get("value_int") or 0)
            else:
                v = p.get("value_double")
                if v is None and p.get("value_int") is not None:
                    v = float(p["value_int"])
                point["doubleValue"] = v or 0.0
        elif mtype == "histogram":
            bucket_counts = json.loads(p.get("bucket_counts") or "[]")
            bounds = json.loads(p.get("explicit_bounds") or "[]")
            buckets = [{"count": str(c)} for c in bucket_counts]
            for ex in json.loads(p.get("exemplars") or "[]"):
                val = ex.get("value") or 0.0
                pos = 0
                while pos < len(bounds) and val > bounds[pos]:
                    pos += 1
                if pos < len(buckets):
                    oce = {"value": val,
                           "timestamp": ns_to_rfc3339(
                               ex.get("timeUnixNano") or 0)}
                    if ex.get("filteredAttributes"):
                        oce["attachments"] = {
                            k: _attr_as_string(v) for k, v in
                            ex["filteredAttributes"].items()}
                    buckets[pos]["exemplar"] = oce
            dv: dict = {"count": str(p.get("count") or 0),
                        "sum": p.get("dist_sum") or 0.0}
            if bounds:
                dv["bucketOptions"] = {"explicit": {"bounds": bounds}}
            if buckets:
                dv["buckets"] = buckets
            point["distributionValue"] = dv
        else:
            quantiles = json.loads(p.get("quantiles") or "[]")
            point["summaryValue"] = {
                "sum": {"value": p.get("dist_sum") or 0.0},
                "count": {"value": str(p.get("count") or 0)},
                "snapshot": {"percentileValues": [
                    {"percentile": q["quantile"] * 100,
                     "value": q["value"]} for q in quantiles]}}
        ts: dict = {}
        if p.get("start_time_unix_nano"):
            ts["startTimestamp"] = ns_to_rfc3339(p["start_time_unix_nano"])
        if lvs:
            ts["labelValues"] = lvs
        ts["points"] = [point]
        timeseries.append(ts)

    descriptor: dict = {"type": oc_type}
    if first.get("metric_name"):
        descriptor["name"] = first["metric_name"]
    if first.get("metric_description"):
        descriptor["description"] = first["metric_description"]
    if first.get("metric_unit"):
        descriptor["unit"] = first["metric_unit"]
    if keys:
        descriptor["labelKeys"] = [{"key": k} for k in keys]
    return {"metricDescriptor": descriptor, "timeseries": timeseries}


class _MetricsToOC:
    def __init__(self, group_col: str):
        self.group_col = group_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        groups = (batch.column(self.group_col).to_pylist()
                  if self.group_col in batch.column_names
                  else [None] * n)
        res = batch.column("resource_attributes").to_pylist()
        rows = batch.to_pylist()
        out_groups, out_docs = [], []
        i = 0
        while i < n:
            j = i
            while j < n and groups[j] == groups[i] and res[j] == res[i]:
                j += 1
            # group contiguous rows by metric identity, order-preserving
            metrics, order = {}, []
            for k in range(i, j):
                ident = (rows[k]["metric_name"],
                         rows[k]["metric_description"],
                         rows[k]["metric_unit"], rows[k]["metric_type"])
                if ident not in metrics:
                    metrics[ident] = []
                    order.append(ident)
                metrics[ident].append(rows[k])
            node, resource = attrs_to_oc_node_resource(
                json.loads(res[i] or "{}"))
            doc: dict = {}
            if node:
                doc["node"] = node
            if resource is not None:
                doc["resource"] = resource
            doc["metrics"] = [flat_metric_points_to_oc(metrics[idn])
                              for idn in order]
            out_groups.append(groups[i])
            out_docs.append(json.dumps(doc, sort_keys=True))
            i = j
        cols = {"oc_json": pa.array(out_docs, pa.string())}
        if self.group_col in batch.column_names:
            gt = batch.schema.field(self.group_col).type
            cols = {self.group_col: pa.array(out_groups, gt), **cols}
        return pa.table(cols)


def metrics_to_oc(ds, group_col: str = "event_id"):
    """Flat metric point rows → OC metric batch documents (one per
    contiguous (group, resource) run; label-key union per metric)."""
    return ds.map_batches(_MetricsToOC(group_col),
                          batch_format="pyarrow", zero_copy_batch=True)
