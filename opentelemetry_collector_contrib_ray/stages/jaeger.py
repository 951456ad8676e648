"""pkg/translator/jaeger analog: Jaeger model-JSON batches → the
engine's flat span rows.

Parity with pkg/translator/jaeger/jaegerproto_to_traces.go (cited by
line below) over a JSON carrier of ``model.Batch``:

- ids: ``(traceIdHigh, traceIdLow)`` uint64 pair → 32-hex big-endian
  concat, ``spanId`` uint64 → 16-hex (xidutils/big_endian_converter.go);
  decimal strings accepted like gogoproto JSON.
- parent span: the jaeger ``model.Span.ParentSpanID()`` rule — the
  first same-trace CHILD_OF reference wins, else the first same-trace
  FOLLOWS_FROM, else none (pinned by the reference's
  two-spans-with-follower / a-spans-with-two-parent vectors).
- tags → typed attributes (:230-247): STRING/BOOL/INT64/FLOAT64 map to
  native JSON types, BINARY stays the base64 string of the wire form,
  unknown vTypes become ``<Unknown Jaeger TagType "X">``.
- ``otel.scope.name``/``otel.scope.version`` tags → scope columns,
  deleted via GetVStr regardless of tag type (:442-462).
- ``span.kind`` tag → kind client/server/producer/consumer/internal →
  3/2/4/5/1, else 0; tag removed (:213-216, :367-381).
- status (:249-310, test-vector table TestSetInternalSpanStatus):
  a BOOL ``error`` tag equal to true forces code 2, removes the tag,
  takes the message from ``otel.status_description`` (removed) else
  ``http.status_message`` (kept); ``otel.status_code`` (OK/ERROR after
  upper-casing its STRING value) applies only when the error tag did
  not, is always removed, message from ``otel.status_description``;
  otherwise ``http.status_code`` (INT64 or parseable STRING, tag kept)
  derives the code — 4xx is Error for client spans and Unset for
  server spans, else 100..398 Unset / everything else Error
  (tracetranslator.StatusCodeFromHTTP), message from
  ``http.status_message`` (kept). When no rule fires the status stays
  unset: code 0, message null.
- ``w3c.tracestate`` tag → trace_state (string value, tag removed,
  :432-440).
- logs → events: one event per log, ``event`` field → event name
  (removed), remaining fields typed like tags (:383-411).
- references → links (:413-430): entirely skipped when the only
  reference is the parent CHILD_OF; otherwise every non-parent-CHILD_OF
  reference becomes a link carrying
  ``opentracing.ref_type = child_of|follows_from``.
- process → resource attributes (:129-172): ``serviceName`` →
  ``service.name`` unless it is the ``OTLPResourceNoServiceName``
  sentinel; process tags typed; ``hostname`` renamed to ``host.name``
  when the latter is absent; ``jaeger.version`` becomes
  ``opencensus.exporterversion = "Jaeger-"+v`` when that key is absent.
- regroup (:48-94): a span-level ``process`` takes precedence over the
  batch process — per-span resource resolution makes this exact in the
  flat-row model (the reference's ResourceSpans re-grouping is a
  carrier-layout concern with no row-level effect).
- blank spans (JSON null / empty object) are skipped (:182).

Output matches ``stages/zipkin._COLS`` column-for-column so Jaeger
input is interchangeable with the zipkin / OTLP JSON / OTLP proto
codecs. The thrift carrier (jaegerthrift_to_traces.go) shares these
semantics and is out of scope as a transport variant.

Execution: per-row JSON wire decode in a task-based map_batches, one
output row per span, block-local, zero shuffle.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_GO_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_U64_RE = re.compile(r"^[0-9]+$")

from .zipkin import _COLS

NO_SERVICE_NAME = "OTLPResourceNoServiceName"

KIND_MAP = {"client": 3, "server": 2, "producer": 4, "consumer": 5,
            "internal": 1}

_REF_TYPE_ATTR = {"CHILD_OF": "child_of", "FOLLOWS_FROM": "follows_from"}


def _kv_value(tag: dict):
    """model.KeyValue JSON → typed python value (:230-247)."""
    vt = tag.get("vType", "STRING") or "STRING"
    if vt == "STRING":
        return tag.get("vStr") or ""
    if vt == "BOOL":
        return bool(tag.get("vBool", False))
    if vt == "INT64":
        return int(tag.get("vInt64", 0) or 0)
    if vt == "FLOAT64":
        return float(tag.get("vFloat64", 0.0) or 0.0)
    if vt == "BINARY":
        # pdata bytes value; the flat JSON map keeps the wire base64
        return tag.get("vBinary") or ""
    return f'<Unknown Jaeger TagType "{vt}">'


def _vstr(v) -> str:
    """pcommon.Value.Str() — the string value, '' for non-strings."""
    return v if isinstance(v, str) else ""


def _tags_to_attrs(tags) -> dict:
    attrs = {}
    for tag in tags or []:
        if isinstance(tag, dict) and "key" in tag:
            attrs[tag["key"]] = _kv_value(tag)
    return attrs


def process_to_resource(process) -> dict:
    """model.Process → resource-attribute dict (:129-172)."""
    if not isinstance(process, dict):
        return {}
    sn = process.get("serviceName") or ""
    if sn == NO_SERVICE_NAME:
        return {}
    tags = process.get("tags") or []
    if sn == "" and not tags:
        return {}
    res = {}
    if sn:
        res["service.name"] = sn
    res.update(_tags_to_attrs(tags))
    if "hostname" in res and "host.name" not in res:
        res["host.name"] = res.pop("hostname")
    if "jaeger.version" in res and "opencensus.exporterversion" not in res:
        jv = res.pop("jaeger.version")
        res["opencensus.exporterversion"] = "Jaeger-" + _vstr(jv)
    return res


def _u64(v):
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return v if 0 <= v < 1 << 64 else None
    if isinstance(v, str):
        if _U64_RE.match(v):
            return _u64(int(v))
        return None
    return None


def _span_ids(obj):
    hi = _u64(obj.get("traceIdHigh", 0) or 0)
    lo = _u64(obj.get("traceIdLow", 0) or 0)
    sid = _u64(obj.get("spanId", 0) or 0)
    if hi is None or lo is None or sid is None:
        return None
    return hi, lo, sid


def _parent_span_id(span, hi: int, lo: int):
    """jaeger model.Span.ParentSpanID(): first same-trace CHILD_OF,
    else first same-trace FOLLOWS_FROM, else 0."""
    follows = 0
    for ref in span.get("references") or []:
        ids = _span_ids(ref)
        if ids is None or ids[0] != hi or ids[1] != lo:
            continue
        rt = ref.get("refType") or "CHILD_OF"
        if rt == "CHILD_OF":
            return ids[2]
        if follows == 0 and rt == "FOLLOWS_FROM":
            follows = ids[2]
    return follows


def _set_status(attrs: dict, kind: int):
    """setInternalSpanStatus (:249-310) over the attr dict, mutating it
    exactly like the Go map. Returns (code, message-or-None)."""
    code, msg, exists = 0, "", False

    err = attrs.get("error")
    if isinstance(err, bool):
        if err:
            code, exists = 2, True
            del attrs["error"]
            if "otel.status_description" in attrs:
                msg = _vstr(attrs.pop("otel.status_description"))
            elif "http.status_message" in attrs:
                msg = _vstr(attrs["http.status_message"])

    if "otel.status_code" in attrs:
        if not exists:
            exists = True
            up = _vstr(attrs["otel.status_code"]).upper()
            code = {"OK": 1, "ERROR": 2}.get(up, 0)
            if "otel.status_description" in attrs:
                msg = _vstr(attrs.pop("otel.status_description"))
        del attrs["otel.status_code"]
    elif not exists and "http.status_code" in attrs:
        http_code = _http_code(attrs["http.status_code"])
        if http_code is not None:
            c = _status_from_http(http_code, kind)
            if c != 0:
                exists, code = True, c
            if "http.status_message" in attrs:
                msg = _vstr(attrs["http.status_message"])

    return (code, msg) if exists else (0, None)


def _http_code(v):
    """codeFromAttr (:328-343): INT64 value or parseable STRING."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, str):
        # strconv.ParseInt(s, 10, 0): no spaces/underscores, one
        # optional sign then digits
        if _GO_INT_RE.match(v):
            return int(v, 10)
        return None
    return None


def _status_from_http(http_code: int, kind: int) -> int:
    """getStatusCodeFromHTTPStatusAttr (:345-365)."""
    if 400 <= http_code < 500:
        if kind == 3:          # client
            return 2
        if kind == 2:          # server
            return 0
    return 0 if 100 <= http_code < 399 else 2


def jaeger_span_to_flat(span: dict, batch_res: dict):
    """One jaeger model.Span JSON object → flat row dict, or error str."""
    if not isinstance(span, dict):
        return "span is not a JSON object"

    # getScope (:442-462): find-and-delete via the tag list
    tags = [t for t in span.get("tags") or []
            if isinstance(t, dict) and "key" in t]
    scope_name = scope_version = None
    for i, t in enumerate(tags):
        if t["key"] == "otel.scope.name":
            scope_name = _vstr(t.get("vStr") or "")
            del tags[i]
            break
    if scope_name is not None:
        for i, t in enumerate(tags):
            if t["key"] == "otel.scope.version":
                scope_version = _vstr(t.get("vStr") or "")
                del tags[i]
                break

    ids = _span_ids(span)
    if ids is None:
        return "invalid trace/span id"
    hi, lo, sid = ids

    start_ns = span.get("startTime") or 0
    dur_ns = span.get("duration") or 0
    if (not isinstance(start_ns, int) or isinstance(start_ns, bool)
            or not isinstance(dur_ns, int) or isinstance(dur_ns, bool)):
        return "invalid timestamp/duration"

    parent = _parent_span_id(span, hi, lo)

    attrs = _tags_to_attrs(tags)
    kind = 0
    if "span.kind" in attrs:
        kind = KIND_MAP.get(_vstr(attrs["span.kind"]), 0)
        del attrs["span.kind"]

    status_code, status_message = _set_status(attrs, kind)

    trace_state = None
    if "w3c.tracestate" in attrs:
        trace_state = _vstr(attrs.pop("w3c.tracestate"))

    # logs → events (:383-411)
    events = []
    for log in span.get("logs") or []:
        if not isinstance(log, dict):
            return "invalid log"
        ts = log.get("timestamp") or 0
        if not isinstance(ts, int) or isinstance(ts, bool):
            return "invalid log timestamp"
        fields = _tags_to_attrs(log.get("fields"))
        name = ""
        if "event" in fields:
            name = _vstr(fields.pop("event"))
        events.append({"name": name, "timeUnixNano": ts,
                       "attributes": fields,
                       "droppedAttributesCount": 0})

    # references → links (:413-430)
    refs = span.get("references") or []
    links = []
    skip_all = False
    if len(refs) == 1 and isinstance(refs[0], dict):
        rids = _span_ids(refs[0])
        if (rids is not None and rids[2] == parent
                and (refs[0].get("refType") or "CHILD_OF") == "CHILD_OF"):
            skip_all = True
    if refs and not skip_all:
        for ref in refs:
            if not isinstance(ref, dict):
                return "invalid reference"
            rids = _span_ids(ref)
            if rids is None:
                return "invalid reference id"
            rt = ref.get("refType") or "CHILD_OF"
            if rids[2] == parent and rt == "CHILD_OF":
                continue
            links.append({
                "traceId": f"{rids[0]:016x}{rids[1]:016x}",
                "spanId": f"{rids[2]:016x}",
                "attributes": {"opentracing.ref_type":
                               _REF_TYPE_ATTR.get(rt, "follows_from")},
            })

    res = (process_to_resource(span["process"])
           if isinstance(span.get("process"), dict) else batch_res)

    return {
        "trace_id": f"{hi:016x}{lo:016x}",
        "span_id": f"{sid:016x}",
        "parent_span_id": f"{parent:016x}" if parent else None,
        "trace_state": trace_state,
        "span_name": span.get("operationName") or "",
        "span_kind": kind,
        "start_time_unix_nano": start_ns,
        "end_time_unix_nano": start_ns + dur_ns,
        "status_code": status_code,
        "status_message": status_message,
        "attributes": json.dumps(attrs, sort_keys=True),
        "resource_attributes": json.dumps(res, sort_keys=True),
        "scope_name": scope_name,
        "scope_version": scope_version,
        "events": json.dumps(events, sort_keys=True),
        "links": json.dumps(links, sort_keys=True),
    }


def _is_blank_span(span) -> bool:
    """nil / blank-proto-span skip (:182)."""
    if span is None:
        return True
    if not isinstance(span, dict):
        return False
    return not any(span.get(k) for k in
                   ("traceIdHigh", "traceIdLow", "spanId",
                    "operationName", "startTime", "duration",
                    "tags", "logs", "references", "process"))


class _ParseJaeger:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                jb = json.loads(doc if doc is not None else "")
                if not isinstance(jb, dict):
                    raise ValueError
            except (ValueError, TypeError):
                jb = None
            rows, err = [], None
            if jb is None:
                err = "invalid jaeger JSON batch"
            else:
                batch_res = process_to_resource(jb.get("process"))
                for sp in jb.get("spans") or []:
                    if _is_blank_span(sp):
                        continue
                    row = jaeger_span_to_flat(sp, batch_res)
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


def parse_jaeger_batches(ds, json_col: str = "batch_json", *,
                         on_error: str = "drop"):
    """Jaeger model.Batch JSON documents → flat span rows (block-local
    fan-out, zero shuffle; schema-compatible with the zipkin/OTLP
    codecs)."""
    return ds.map_batches(
        _ParseJaeger(json_col, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
