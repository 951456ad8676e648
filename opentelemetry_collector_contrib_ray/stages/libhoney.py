"""libhoneyreceiver analog: Honeycomb libhoney event batches → flat
span + log rows.

Parity with receiver/libhoneyreceiver/internal (parser.go,
libhoneyevent.go, eventtime.go, factory.go defaults):

- one payload = a JSON array of ``{time, samplerate, data}`` events for
  one dataset (the URL path in the reference); samplerate defaults 1.
- event time: RFC3339Nano, else integer epoch by digit count (10 =
  seconds, >10 = seconds+fraction via the string-split rule), else a
  float epoch; unparseable/absent → 0 here (the reference stamps the
  arrival wall clock — no wall clock in a batch decode, documented).
- signal type (libhoneyevent.go:96-120): meta.signal_type log/trace;
  trace + meta.annotation_type span_event/link; anything else → log.
- service = data[service.name] else the dataset; scope =
  service+library.name with library.version defaulting "unset" and the
  FIRST sighting of a scope key pinning its version/service; events
  without a library land in the seeded "libhoney.receiver"/"1.0.0"
  scope whose service is the dataset (parser.go:44-52, GetScope).
- span ids (ToPTraceSpan/GetParentID): dashes stripped, hex decoded;
  64-hex span/parent ids take bytes 8:24, ≥32-hex take the first 16
  bytes — and the Go slice→[8]byte conversion then keeps the FIRST 8
  bytes (mirrored); invalid hex falls back to the fnv64a-derived id
  (span: one sum LE; trace: two chained sums LE per half); ABSENT ids
  draw crypto/rand in Go — a deterministic md5 stand-in here.
- span fields: start = event time, end = start + duration_ms (the
  first configured duration field) ms→ns; status message from
  status_message, code Error iff the error field is present; span.kind
  names map to OTel kinds; SampleRate int attr + remaining data fields
  typed str/int/float/bool.
- the shared alreadyUsedFields list MUTATES as the batch processes
  (trace/duration fields join it when the first span appears), so a
  log BEFORE any span keeps trace.trace_id as an attribute and a log
  after one does not — order-dependent, mirrored exactly.
- span events/links (parser.go:94-108, 140-246): annotated events
  group by their trace.parent_id span id and attach to the matching
  span after the whole batch processes (final alreadyUsedFields);
  links REQUIRE valid trace.link.trace_id/span_id hex (skipped
  otherwise) and drop trace.link.* / meta.* attrs; span events take
  name = data["name"] (missing = error row, where Go would panic).
- output resources: {"service.name": <scope service>} + scope
  name/version columns; logs carry severity_code/severity_text/flags/
  body per ToPLogRecord.

Execution: per-row JSON decode in a task-based map_batches, fan-out
one row per span or log record, block-local, zero shuffle.
"""

from __future__ import annotations

import hashlib
import json
import math
import re

import pyarrow as pa

_RFC3339 = re.compile(
    r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?"
    r"([Zz]|[+-]\d{2}:\d{2})$")

DEFAULT_FIELDS = {
    "service_name": "service.name",
    "library_name": "library.name",
    "library_version": "library.version",
    "trace_id": "trace.trace_id",
    "span_id": "trace.span_id",
    "parent_id": "trace.parent_id",
    "name": "name",
    "error": "error",
    "span_kind": "span.kind",
    "duration_fields": ("duration_ms",),
}

_KINDS = {"server": 2, "client": 3, "producer": 4, "consumer": 5,
          "internal": 1}

FNV64_OFFSET = 0xCBF29CE484222325
FNV64_PRIME = 0x100000001B3
U64 = (1 << 64) - 1


def _fnv64a(data: bytes, h: int = FNV64_OFFSET) -> int:
    for b in data:
        h = ((h ^ b) * FNV64_PRIME) & U64
    return h


def span_id_from(s: str) -> str:
    """spanIDFrom: fnv64a sum, little-endian 8 bytes → hex."""
    return _fnv64a(s.encode()).to_bytes(8, "little").hex()


def trace_id_from(s: str) -> str:
    """traceIDFrom: two CHAINED fnv64a sums (the hash keeps its state
    between Sum64 calls), little-endian halves."""
    n1 = _fnv64a(s.encode())
    n2 = _fnv64a(s.encode(), n1)
    return (n1.to_bytes(8, "little") + n2.to_bytes(8, "little")).hex()


def get_event_time_ns(header) -> int:
    """eventtime.GetEventTime → unix ns (0 for unparseable)."""
    if not header or not isinstance(header, str):
        return 0
    if _RFC3339.match(header):
        from datetime import datetime
        s = header
        if s.endswith(("Z", "z")):
            s, tz = s[:-1], "+00:00"
        else:
            tz, s = s[-6:], s[:-6]
        frac = 0
        if "." in s:
            s, _, f = s.partition(".")
            frac = int(f.ljust(9, "0")[:9])
        try:
            dt = datetime.fromisoformat(s + tz)
        except ValueError:
            return 0
        return int(dt.timestamp()) * 1_000_000_000 + frac
    def _unix_from_float(f: float) -> int:
        dec, sec = math.modf(f)
        return int(sec) * 1_000_000_000 + int(dec * 1e9)

    try:
        int(header, 0)
    except ValueError:
        try:
            return _unix_from_float(float(header))
        except ValueError:
            return 0
    if len(header) == 10:
        return int(header, 0) * 1_000_000_000
    if len(header) > 10:
        try:
            return _unix_from_float(float(header[:10] + "."
                                          + header[10:]))
        except ValueError:
            return 0
    return 0


def _decode_hex_id(raw: str, *, trace: bool):
    s = raw.replace("-", "")
    try:
        b = bytes.fromhex(s)
    except ValueError:
        return None
    if trace:
        if len(b) >= 32:
            b = b[:32]
        # the Go slice→[16]byte conversion keeps the first 16 bytes
        # (shorter ids pad here where Go would panic)
        return b[:16].ljust(16, b"\x00").hex()
    if len(b) == 32:
        b = b[8:24]
    elif len(b) >= 16:
        b = b[:16]
    # Go slice→[8]byte conversion keeps the first 8 bytes (panics only
    # when shorter — shorter ids pad here, an opaque-id refinement)
    return b[:8].ljust(8, b"\x00").hex()


def _det_id(base: str, n: int, width: int) -> str:
    return hashlib.md5(f"{base}:{n}".encode()).hexdigest()[:width * 2]


def _attr_value(v):
    if isinstance(v, (str, bool, int, float)):
        return v
    return None            # unsupported type: Go logs + skips


def libhoney_batch_to_rows(events: list, dataset: str,
                           fields: dict | None = None):
    """parser.ToPdata over one event batch → (span rows, log rows)."""
    cfg = dict(DEFAULT_FIELDS)
    if fields:
        cfg.update(fields)
    svc_field = cfg["service_name"]
    lib_field = cfg["library_name"]
    ver_field = cfg["library_version"]
    duration_fields = tuple(cfg["duration_fields"])

    scopes: dict = {"libhoney.receiver":
                    {"service": dataset, "name": "libhoney.receiver",
                     "version": "1.0.0"}}
    already_used = [svc_field, lib_field, ver_field]
    trace_fields = [cfg["name"], cfg["trace_id"], cfg["parent_id"],
                    cfg["span_id"], cfg["error"], cfg["span_kind"]]

    span_rows: list = []
    log_rows: list = []
    span_events: dict = {}
    span_links: dict = {}

    def get_scope(data, service):
        lib = data.get(lib_field)
        if not isinstance(lib, str):
            return "libhoney.receiver"
        key = service + lib
        if key not in scopes:
            ver = data.get(ver_field)
            scopes[key] = {"service": service, "name": lib,
                           "version": ver if isinstance(ver, str)
                           else "unset"}
        return key

    def parent_id_of(data):
        pid = data.get(cfg["parent_id"])
        if pid is None or not isinstance(pid, str):
            return None
        out = _decode_hex_id(pid, trace=False)
        if out is None:
            return span_id_from(pid)
        return out

    for idx, ev in enumerate(events):
        if not isinstance(ev, dict):
            raise ValueError("libhoney event must be an object")
        data = ev.get("data") or {}
        samplerate = ev.get("samplerate", 1)
        time_ns = get_event_time_ns(ev.get("time"))
        sig = data.get("meta.signal_type")
        action = "log"
        if sig == "trace":
            atype = data.get("meta.annotation_type")
            action = {"span_event": "span_event",
                      "link": "span_link"}.get(atype, "span")
        elif sig == "log":
            action = "log"

        if action == "span_event":
            span_events.setdefault(parent_id_of(data), []).append(
                (time_ns, data))
            continue
        if action == "span_link":
            span_links.setdefault(parent_id_of(data), []).append(
                (time_ns, data))
            continue

        service = data.get(svc_field)
        service = service if isinstance(service, str) else dataset
        scope_key = get_scope(data, service)
        scope = scopes[scope_key]

        if action == "log":
            attrs = {"SampleRate": int(samplerate)}
            sev_num = data.get("severity_code")
            sev_text = data.get("severity_text")
            flags = data.get("flags")
            body = data.get("body")
            log_already = {"severity_text", "severity_code", "flags",
                           "body"}
            for k, v in data.items():
                if k in already_used or k in log_already:
                    continue
                av = _attr_value(v)
                if av is not None:
                    attrs[k] = av
            log_rows.append({
                "body": body if isinstance(body, str) else None,
                "time_unix_nano": time_ns,
                "severity_number": int(sev_num) if isinstance(
                    sev_num, (int, float)) and not isinstance(
                    sev_num, bool) else 0,
                "severity_text": sev_text if isinstance(sev_text, str)
                else None,
                "flags": int(flags) if isinstance(flags, (int, float))
                and not isinstance(flags, bool) else 0,
                "attributes": json.dumps(attrs, sort_keys=True),
                "resource_attributes": json.dumps(
                    {"service.name": scope["service"]}, sort_keys=True),
                "scope_name": scope["name"],
                "scope_version": scope["version"]})
            continue

        # span
        already_used.extend(trace_fields)
        already_used.extend(duration_fields)

        duration_ms = 0.0
        for df in duration_fields:
            if df in data and isinstance(data[df], (int, float)) and \
                    not isinstance(data[df], bool):
                duration_ms = float(data[df])
                break
        end_ns = time_ns + int(duration_ms * 1_000_000)

        tid_raw = data.get(cfg["trace_id"])
        if isinstance(tid_raw, str):
            tid = _decode_hex_id(tid_raw, trace=True)
            if tid is None:
                tid = trace_id_from(tid_raw.replace("-", ""))
        else:
            tid = _det_id(f"{dataset}:{idx}", 0, 16)
        sid_raw = data.get(cfg["span_id"])
        if isinstance(sid_raw, str):
            sid = _decode_hex_id(sid_raw, trace=False)
            if sid is None:
                sid = span_id_from(sid_raw)
        else:
            sid = _det_id(f"{dataset}:{idx}", 1, 8)
        pid = None
        if cfg["parent_id"] in data and \
                data.get(cfg["parent_id"]) is not None:
            pid = parent_id_of(data)

        attrs = {"SampleRate": int(samplerate)}
        for k, v in data.items():
            if k in already_used:
                continue
            av = _attr_value(v)
            if av is not None:
                attrs[k] = av

        status_code = 2 if cfg["error"] in data else 0
        status_message = data.get("status_message")
        kind = 0
        sk = data.get(cfg["span_kind"])
        if isinstance(sk, str):
            kind = _KINDS.get(sk, 0)

        span_rows.append({
            "trace_id": tid, "span_id": sid, "parent_span_id": pid,
            "trace_state": None,
            "span_name": data.get(cfg["name"]) if isinstance(
                data.get(cfg["name"]), str) else "",
            "span_kind": kind,
            "start_time_unix_nano": time_ns,
            "end_time_unix_nano": end_ns,
            "status_code": status_code,
            "status_message": status_message if isinstance(
                status_message, str) else None,
            "attributes": attrs,        # finalized below
            "resource_attributes": json.dumps(
                {"service.name": scope["service"]}, sort_keys=True),
            "scope_name": scope["name"],
            "scope_version": scope["version"],
            "events": [], "links": []})

    # reattach span events/links using the FINAL alreadyUsedFields
    skip_meta = ("meta.annotation_type", "meta.signal_type")
    for row in span_rows:
        for time_ns, data in span_events.get(row["span_id"], []):
            name = data.get("name")
            if not isinstance(name, str):
                raise ValueError("span event missing name")
            ea = {}
            for k, v in data.items():
                if k in already_used or k in skip_meta:
                    continue
                av = _attr_value(v)
                if av is not None:
                    ea[k] = av
            row["events"].append({"name": name, "timeUnixNano": time_ns,
                                  "attributes": ea,
                                  "droppedAttributesCount": 0})
        for _, data in span_links.get(row["span_id"], []):
            lt = data.get("trace.link.trace_id")
            ls = data.get("trace.link.span_id")
            if not isinstance(lt, str) or not isinstance(ls, str):
                continue
            try:
                ltb = bytes.fromhex(lt)
                lsb = bytes.fromhex(ls)
            except ValueError:
                continue
            la = {}
            for k, v in data.items():
                if k.startswith("trace.link.") or k in already_used or \
                        k in skip_meta:
                    continue
                av = _attr_value(v)
                if av is not None:
                    la[k] = av
            row["links"].append({
                "traceId": ltb[:32][:16].hex(),
                "spanId": (lsb[:16])[:8].hex(),
                "attributes": la, "droppedAttributesCount": 0})
        row["attributes"] = json.dumps(row["attributes"], sort_keys=True)
        row["events"] = json.dumps(row["events"], sort_keys=True)
        row["links"] = json.dumps(row["links"], sort_keys=True)
    return span_rows, log_rows


_LOG_COLS = (("body", pa.string()), ("time_unix_nano", pa.int64()),
             ("severity_number", pa.int64()),
             ("severity_text", pa.string()), ("flags", pa.int64()),
             ("attributes", pa.string()),
             ("resource_attributes", pa.string()),
             ("scope_name", pa.string()), ("scope_version", pa.string()))


class _ParseLibhoney:
    def __init__(self, json_col, dataset_col, signal, fields, on_error):
        self.json_col = json_col
        self.dataset_col = dataset_col
        self.signal = signal
        self.fields = fields
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .zipkin import _COLS
        span_cols = _COLS
        docs = batch.column(self.json_col).to_pylist()
        datasets = (batch.column(self.dataset_col).to_pylist()
                    if self.dataset_col in batch.column_names
                    else ["unknown"] * len(docs))
        cols_spec = span_cols if self.signal == "traces" else _LOG_COLS
        parent, cols = [], {name: [] for name, _ in cols_spec}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                events = json.loads(doc if doc is not None else "")
                if not isinstance(events, list):
                    raise ValueError("libhoney payload must be an array")
                spans, logs = libhoney_batch_to_rows(
                    events, datasets[i] or "unknown", self.fields)
                rows = spans if self.signal == "traces" else logs
            except (ValueError, TypeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in cols_spec:
                    cols[name].append(None)
                cols["error"].append(str(e))
                continue
            for row in rows:
                parent.append(i)
                for name, _ in cols_spec:
                    cols[name].append(row.get(name))
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in cols_spec + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_libhoney(ds, json_col: str = "events_json", *,
                   dataset_col: str = "dataset", signal: str = "traces",
                   fields: dict | None = None, on_error: str = "drop"):
    """libhoney event batches → flat span rows (signal="traces") or
    log rows (signal="logs"); block-local fan-out, zero shuffle."""
    return ds.map_batches(
        _ParseLibhoney(json_col, dataset_col, signal, fields, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
