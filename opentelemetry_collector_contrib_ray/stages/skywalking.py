"""skywalkingreceiver wire format: SegmentObject JSON → flat OTel spans.

Parity with pkg/translator/skywalking/skywalkingproto_to_traces.go:

- ID math (:264-350): ``swTraceIDToTraceID`` — ≤36 chars goes through
  RFC-4122 uuid.Parse (36 hyphenated or 32 bare hex; parse error →
  all-zero id), longer (java-agent ``hex32.mid.last``) through
  ``swStringToUUID`` with extra=0; ``segmentIDToSpanID`` —
  ``swStringToUUID(segmentID, spanID)`` folded 16→8 bytes by
  ``uid[i] ^ uid[i+8]``; ``swStringToUUID`` hex-decodes the first 32
  chars (partial bytes kept on an invalid char, early return without
  the XOR — hex.Decode semantics), XORs ``extra`` into bytes 0-4
  LSB-first, then requires ``'.'`` exactly at index 32 and integral
  mid/last (failures → ALL-ZERO uuid), XORing mid into bytes 4-8 and
  last into bytes 8-16 LSB-first.
- span identity (:105-112): span_id = segmentIDToSpanID(segmentId,
  spanId); parent = same-segment parentSpanId when != -1, else the
  single ref's (parentTraceSegmentId, parentSpanId), else empty.
- resource (:54-88): the LAST non-nil span's tags filtered through
  otSpanTagsMapping (url/status_code/db.type/db.instance/mq.broker →
  semconv) — each span CLEARS the previous one's contribution — then
  service.name / service.instance.id / sw8.trace_id stamped over.
- attributes (:124-131,218-224): span tags verbatim (string), plus
  sw8.segment_id (str), sw8.span_id (int), sw8.parent_span_id (int,
  only when != -1).
- status (:208-216): isError → (ERROR, "ERROR") else (OK, "SUCCESS").
- kind (:134-150): MQ layer Entry→Consumer / Exit→Producer (Local
  under MQ → Unspecified); else Exit→Client, Entry→Server,
  Local→Internal, default Unspecified.
- events (:226-248): each log → event named "logs", ms→ns timestamp,
  data pairs as string attrs.
- links (:157-205): each ref → link with ref.traceId,
  segmentIDToSpanID(parentTraceSegmentId, parentSpanId), empty trace
  state, and the eight parity attrs (refType enum NAME, parent
  service/instance/endpoint, network.AddressUsedAtPeer, sw8.trace_id,
  sw8.parent_segment_id, sw8.parent_span_id as STRING).
- timestamps (:251-253): start/end/log times are epoch MILLIseconds
  (``time.UnixMilli`` — the Go doc comment says microseconds; the
  implementation wins) → ×1e6 ns.

Execution shape: per-row JSON wire decode in a block-local task map,
one output row per span, schema = stages/zipkin._COLS (interchangeable
with the zipkin/jaeger/OTLP codecs), zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .zipkin import _COLS

_HEX = set("0123456789abcdefABCDEF")

# otSpanTagsMapping (:34-40), semconv v1.8.0 spellings
OT_TAGS_MAPPING = {
    "url": "http.url",
    "status_code": "http.status_code",
    "db.type": "db.system",
    "db.instance": "db.name",
    "mq.broker": "net.peer.name",
}

_SPAN_TYPE = {"Entry": 0, "Exit": 1, "Local": 2}
_SPAN_LAYER = {"Unknown": 0, "Database": 1, "RPCFramework": 2,
               "Http": 3, "MQ": 4, "Cache": 5}
_REF_TYPE_NAMES = {0: "CrossProcess", 1: "CrossThread"}

KIND_UNSPECIFIED, KIND_INTERNAL, KIND_SERVER, KIND_CLIENT, \
    KIND_PRODUCER, KIND_CONSUMER = 0, 1, 2, 3, 4, 5


def _hex_decode_partial(s: str) -> tuple[bytes, bool]:
    """hex.Decode semantics over the first 32 chars: decode byte pairs
    until an invalid char; on failure keep the decoded prefix,
    zero-fill the rest, and signal the error (None second half)."""
    out = bytearray(16)
    for i in range(16):
        pair = s[2 * i:2 * i + 2]
        if pair[0] not in _HEX or pair[1] not in _HEX:
            return bytes(out), False
        out[i] = int(pair, 16)
    return bytes(out), True


def _atoi(s: str):
    """strconv.Atoi: optional sign + digits, 64-bit range."""
    if not s:
        return None
    body = s[1:] if s[0] in "+-" else s
    if not body or not body.isdigit():
        return None
    v = int(s)
    if not -(2 ** 63) <= v < 2 ** 63:
        return None
    return v


def sw_string_to_uuid(s: str, extra: int) -> bytes:
    """swStringToUUID (:293-350)."""
    if len(s) < 32:
        return bytes(16)
    uid, ok = _hex_decode_partial(s)
    if not ok:
        return uid  # partial decode, no XOR (hex.Decode error path)
    uid = bytearray(uid)
    e = extra & 0xFFFFFFFF
    for i in range(4):
        uid[i] ^= e & 0xFF
        e >>= 8
    if len(s) == 32:
        return bytes(uid)
    i1 = s.find(".")
    i2 = s.rfind(".")
    if i1 != 32 or i2 < 0:
        return bytes(16)
    mid = _atoi(s[i1 + 1:i2])
    if mid is None:
        return bytes(16)
    last = _atoi(s[i2 + 1:])
    if last is None:
        return bytes(16)
    for i in range(4, 8):
        uid[i] ^= mid & 0xFF
        mid >>= 8
    for i in range(8, 16):
        uid[i] ^= last & 0xFF
        last >>= 8
    return bytes(uid)


def _uuid_parse(s: str) -> bytes | None:
    """google/uuid Parse for the ≤36 forms: 36 hyphenated at 8-13-18-23
    or 32 bare hex; anything else is an error."""
    if len(s) == 36:
        if s[8] != "-" or s[13] != "-" or s[18] != "-" or s[23] != "-":
            return None
        hexs = s[:8] + s[9:13] + s[14:18] + s[19:23] + s[24:]
    elif len(s) == 32:
        hexs = s
    else:
        return None
    if any(c not in _HEX for c in hexs):
        return None
    return bytes.fromhex(hexs)


def sw_trace_id(trace_id: str) -> bytes:
    """swTraceIDToTraceID (:264-277)."""
    if len(trace_id) <= 36:
        uid = _uuid_parse(trace_id)
        return uid if uid is not None else bytes(16)
    return sw_string_to_uuid(trace_id, 0)


def segment_id_to_span_id(segment_id: str, span_id: int) -> bytes:
    """segmentIDToSpanID (:279-290): 16-byte uuid folded hi^lo."""
    if len(segment_id) < 32:
        return bytes(8)
    uid = sw_string_to_uuid(segment_id, span_id & 0xFFFFFFFF)
    return bytes(uid[i] ^ uid[i + 8] for i in range(8))


def _enum(v, table) -> int:
    if isinstance(v, str):
        return table.get(v, -1)
    if isinstance(v, bool) or v is None:
        return 0
    if isinstance(v, int):
        return v
    return -1


def _kv_pairs(pairs) -> dict:
    out = {}
    for p in pairs or []:
        if isinstance(p, dict):
            out[str(p.get("key", ""))] = str(p.get("value", ""))
    return out


def segment_to_rows(seg: dict) -> list[dict]:
    """One SegmentObject JSON → flat span row dicts (ProtoToTraces)."""
    spans = seg.get("spans") or []
    if not spans:
        return []
    trace_id = str(seg.get("traceId", "") or "")
    segment_id = str(seg.get("traceSegmentId", "") or "")
    tid_hex = sw_trace_id(trace_id).hex()

    # swTagsToInternalResource over every span: last non-nil wins
    res: dict = {}
    for span in spans:
        if not isinstance(span, dict):
            continue
        res = {}
        for p in span.get("tags") or []:
            if isinstance(p, dict):
                ot = OT_TAGS_MAPPING.get(p.get("key"))
                if ot:
                    res[ot] = str(p.get("value", ""))
    res["service.name"] = str(seg.get("service", "") or "")
    res["service.instance.id"] = str(seg.get("serviceInstance", "") or "")
    res["sw8.trace_id"] = trace_id
    res_json = json.dumps(res, sort_keys=True)

    rows = []
    for span in spans:
        if not isinstance(span, dict):
            continue
        sid = int(span.get("spanId", 0) or 0)
        psid = span.get("parentSpanId", 0)
        psid = int(psid if psid is not None else 0)
        refs = span.get("refs") or []

        span_id = segment_id_to_span_id(segment_id, sid).hex()
        if psid != -1:
            parent = segment_id_to_span_id(segment_id, psid).hex()
        elif len(refs) == 1 and isinstance(refs[0], dict):
            r = refs[0]
            parent = segment_id_to_span_id(
                str(r.get("parentTraceSegmentId", "") or ""),
                int(r.get("parentSpanId", 0) or 0)).hex()
        else:
            parent = None

        attrs: dict = dict(_kv_pairs(span.get("tags")))
        attrs["sw8.segment_id"] = segment_id
        attrs["sw8.span_id"] = sid
        if psid != -1:
            attrs["sw8.parent_span_id"] = psid

        is_err = bool(span.get("isError", False))
        status_code = 2 if is_err else 1
        status_message = "ERROR" if is_err else "SUCCESS"

        stype = _enum(span.get("spanType"), _SPAN_TYPE)
        slayer = _enum(span.get("spanLayer"), _SPAN_LAYER)
        if slayer == 4:  # MQ
            kind = (KIND_CONSUMER if stype == 0
                    else KIND_PRODUCER if stype == 1
                    else KIND_UNSPECIFIED)
        elif stype == 1:
            kind = KIND_CLIENT
        elif stype == 0:
            kind = KIND_SERVER
        elif stype == 2:
            kind = KIND_INTERNAL
        else:
            kind = KIND_UNSPECIFIED

        events = []
        for lg in span.get("logs") or []:
            if not isinstance(lg, dict):
                continue
            ev = {"name": "logs",
                  "timeUnixNano": int(lg.get("time", 0) or 0) * 1_000_000}
            data = _kv_pairs(lg.get("data"))
            if data:
                ev["attributes"] = data
            events.append(ev)

        links = []
        for r in refs:
            if not isinstance(r, dict):
                continue
            rt = _enum(r.get("refType"), {"CrossProcess": 0,
                                          "CrossThread": 1})
            links.append({
                "traceId": sw_trace_id(
                    str(r.get("traceId", "") or "")).hex(),
                "spanId": segment_id_to_span_id(
                    str(r.get("parentTraceSegmentId", "") or ""),
                    int(r.get("parentSpanId", 0) or 0)).hex(),
                "traceState": "",
                "attributes": {
                    "parent.service":
                        str(r.get("parentService", "") or ""),
                    "parent.service.instance":
                        str(r.get("parentServiceInstance", "") or ""),
                    "parent.endpoint":
                        str(r.get("parentEndpoint", "") or ""),
                    "network.AddressUsedAtPeer":
                        str(r.get("networkAddressUsedAtPeer", "") or ""),
                    "refType": _REF_TYPE_NAMES.get(rt, str(rt)),
                    "sw8.trace_id": str(r.get("traceId", "") or ""),
                    "sw8.parent_segment_id":
                        str(r.get("parentTraceSegmentId", "") or ""),
                    "sw8.parent_span_id":
                        str(int(r.get("parentSpanId", 0) or 0)),
                },
            })

        rows.append({
            "trace_id": tid_hex,
            "span_id": span_id,
            "parent_span_id": parent,
            "trace_state": "",
            "span_name": str(span.get("operationName", "") or ""),
            "span_kind": kind,
            "start_time_unix_nano":
                int(span.get("startTime", 0) or 0) * 1_000_000,
            "end_time_unix_nano":
                int(span.get("endTime", 0) or 0) * 1_000_000,
            "status_code": status_code,
            "status_message": status_message,
            "attributes": json.dumps(attrs, sort_keys=True),
            "resource_attributes": res_json,
            "scope_name": None,
            "scope_version": None,
            "events": json.dumps(events, sort_keys=True),
            "links": json.dumps(links, sort_keys=True),
        })
    return rows


class _ParseSkywalking:
    def __init__(self, json_col: str, on_error: str):
        self.json_col = json_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                seg = json.loads(doc if doc is not None else "")
                if not isinstance(seg, dict):
                    raise ValueError
            except (ValueError, TypeError):
                seg = None
            if seg is None:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(None)
                cols["error"].append("invalid skywalking JSON segment")
                continue
            for row in segment_to_rows(seg):
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


def parse_skywalking_segments(ds, json_col: str = "segment_json", *,
                              on_error: str = "drop"):
    """SkyWalking SegmentObject JSON documents → flat span rows
    (block-local fan-out, zero shuffle; schema-compatible with the
    zipkin/jaeger/OTLP codecs)."""
    return ds.map_batches(
        _ParseSkywalking(json_col, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
