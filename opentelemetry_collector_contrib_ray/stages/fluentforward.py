"""fluentforwardreceiver analog: Fluentd Forward-protocol (msgpack)
event decoding.

Parity with receiver/fluentforwardreceiver/conversion.go:25-406,
timeext.go:15-45 and server.go:137-200 (all three carrier modes of the
Forward Protocol Specification v1):

- Message mode ``[tag, time, record, options?]`` (array len 3-4),
  Forward mode ``[tag, [[time, record], ...], options?]`` (len 2-3),
  PackedForward mode ``[tag, bin|str, options?]`` — the mode is
  detected from the SECOND array element per the spec (the Go code
  peeks wire bytes for streaming; decoding the whole event first is
  the batch equivalent — same classification).
- timestamps: msgpack int/uint = epoch seconds; the fluent EventTime
  extension (type 0, 8 bytes big-endian seconds‖nanoseconds) carries
  sub-second precision (timeext.go:36-45); anything else errors.
- record: the ``message`` (fluentd) or ``log`` (fluentbit) key becomes
  the body, every other key an attribute; binary map keys/values are
  accepted and stringified (conversion.go:156-177); msgpack value
  typing per conversion.go:95-121 (uint/int → int, float32/64 →
  double, bytes → string, nil → empty, nested maps/arrays recurse).
- the record tag lands in the ``fluent.tag`` attribute of every
  record (conversion.go:19).
- PackedForward entries are a raw concatenated msgpack stream of
  ``[time, record]`` entries, gzip-decompressed first when the options
  map says ``compressed: "gzip"`` (conversion.go:377-406); the
  ``chunk`` option is an ack detail of the socket protocol (no socket
  here) and is surfaced as a column instead.
- a malformed event is an error row (the reference closes the
  connection, server.go:112-118).

Flat output per log record: fluent.tag, time_ns, body (strings raw,
other payloads canonical JSON), attributes map<string,string>
(strings raw, other values Go %v formatting), mode, chunk. The engine
stores msgpack events one per row in a binary column — the socket
framing is out of scope for a batch engine (SURVEY §2.1).

Execution: per-row wire decode in a task-based map_batches (same
status as the OTLP-proto codec) — block-local fan-out, zero shuffle.
"""

from __future__ import annotations

import gzip
import io
import json
import struct

import pyarrow as pa

try:
    import msgpack
except ImportError:  # pragma: no cover
    msgpack = None

from .splunkhec import go_v

MAP_TYPE = pa.map_(pa.string(), pa.string())

TAG_ATTRIBUTE_KEY = "fluent.tag"


def _to_str(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return go_v(_plain(v))


def _plain(v):
    """msgpack value → plain python per parseToAttributeValue typing."""
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, dict):
        return {_to_str(k): _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, float):
        return float(v)
    return v


def _time_ns(ts):
    """timeFromTimestamp (conversion.go:124-134). None on error."""
    if isinstance(ts, bool):
        return None
    if isinstance(ts, int):
        return ts * 1_000_000_000
    if msgpack is not None and isinstance(ts, msgpack.ExtType):
        if ts.code != 0 or len(ts.data) != 8:
            return None
        secs, nanos = struct.unpack(">II", ts.data)
        return secs * 1_000_000_000 + nanos
    return None


def _record_to_row(ts, record):
    """parseRecordToLogRecord: body from message/log, rest attrs."""
    t = _time_ns(ts)
    if t is None:
        return "unknown type of time value"
    if not isinstance(record, dict):
        return "record is not a map"
    body = None
    attrs = []
    for k, v in record.items():
        key = _to_str(k) if not isinstance(k, str) else k
        if key in ("message", "log"):
            pv = _plain(v)
            body = pv if isinstance(pv, str) else json.dumps(
                pv, sort_keys=True, separators=(",", ":"))
        else:
            attrs.append((key, _to_str(v)))
    return {"time_ns": t, "body": body, "attrs": attrs}


def decode_fluent_event(raw: bytes):
    """One Forward-protocol event → (mode, chunk, rows) or error str."""
    if msgpack is None:
        raise NotImplementedError("msgpack not available")
    try:
        unpacker = msgpack.Unpacker(io.BytesIO(raw), raw=False,
                                    strict_map_key=False)
        ev = unpacker.unpack()
    except Exception:  # noqa: BLE001 — any wire malformation
        return "could not decode msgpack event"
    if not isinstance(ev, (list, tuple)) or len(ev) < 2:
        return "could not determine event mode"
    tag = ev[0]
    if isinstance(tag, bytes):
        tag = tag.decode("utf-8", "replace")
    if not isinstance(tag, str):
        return "malformed tag field"
    second = ev[1]
    options = {}

    def read_options(idx):
        if len(ev) > idx:
            if not isinstance(ev[idx], dict):
                return "malformed options"
            for k, v in ev[idx].items():
                options[_to_str(k)] = v
        return None

    rows = []
    if isinstance(second, (int, msgpack.ExtType)) and \
            not isinstance(second, bool):
        mode = "message"
        if len(ev) < 3 or len(ev) > 4:
            return "malformed message-mode event"
        row = _record_to_row(second, ev[2])
        if isinstance(row, str):
            return row
        rows.append(row)
        err = read_options(3)
        if err:
            return err
    elif isinstance(second, (list, tuple)):
        mode = "forward"
        if len(ev) > 3:
            return "malformed forward-mode event"
        for entry in second:
            if not isinstance(entry, (list, tuple)) or len(entry) != 2:
                return "malformed forward-mode entry"
            row = _record_to_row(entry[0], entry[1])
            if isinstance(row, str):
                return row
            rows.append(row)
        err = read_options(2)
        if err:
            return err
    elif isinstance(second, (bytes, str)):
        mode = "packedforward"
        if len(ev) > 3:
            return "malformed packedforward-mode event"
        err = read_options(2)
        if err:
            return err
        blob = second.encode("utf-8") if isinstance(second, str) \
            else second
        if options.get("compressed") == "gzip":
            try:
                blob = gzip.decompress(blob)
            except OSError:
                return "invalid gzip entries"
        try:
            sub = msgpack.Unpacker(io.BytesIO(blob), raw=False,
                                   strict_map_key=False)
            for entry in sub:
                if not isinstance(entry, (list, tuple)) or \
                        len(entry) != 2:
                    return "malformed packedforward entry"
                row = _record_to_row(entry[0], entry[1])
                if isinstance(row, str):
                    return row
                rows.append(row)
        except Exception:  # noqa: BLE001
            return "could not decode packedforward entries"
    else:
        return "could not determine event mode"

    chunk = options.get("chunk")
    if isinstance(chunk, bytes):
        chunk = chunk.decode("utf-8", "replace")
    if not isinstance(chunk, str):
        chunk = None
    return mode, chunk, [
        {**row, "attrs": row["attrs"] + [(TAG_ATTRIBUTE_KEY, tag)]}
        for row in rows]


class _ParseFluent:
    def __init__(self, bin_col: str, on_error: str):
        self.bin_col = bin_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        events = batch.column(self.bin_col).to_pylist()
        parent, cols = [], {"mode": [], "chunk": [], "time_ns": [],
                            "body": [], "attributes": [], "error": []}
        for i, raw in enumerate(events):
            res = decode_fluent_event(raw if raw is not None else b"")
            if isinstance(res, str):
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for k in ("mode", "chunk", "time_ns", "body"):
                    cols[k].append(None)
                cols["attributes"].append([])
                cols["error"].append(res)
                continue
            mode, chunk, rows = res
            for row in rows:
                parent.append(i)
                cols["mode"].append(mode)
                cols["chunk"].append(chunk)
                cols["time_ns"].append(row["time_ns"])
                cols["body"].append(row["body"])
                cols["attributes"].append(row["attrs"])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in (("mode", pa.string()), ("chunk", pa.string()),
                          ("time_ns", pa.int64()), ("body", pa.string()),
                          ("attributes", MAP_TYPE),
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


def parse_fluent_events(ds, bin_col: str = "event_msgpack", *,
                        on_error: str = "drop"):
    """Fluent Forward msgpack events → one log row per record
    (block-local fan-out, zero shuffle)."""
    return ds.map_batches(_ParseFluent(bin_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
