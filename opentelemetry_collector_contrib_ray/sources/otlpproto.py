"""OTLP protobuf file source/sink — fileexporter ``format: proto`` analog.

Reference semantics (exporter/fileexporter/marshaller.go:33-36
plog.ProtoMarshaler + file_exporter.go binary branch; the wire schema is
the PUBLIC opentelemetry-proto ``logs/v1/logs.proto`` + ``common/v1/
common.proto``): each export is one ``LogsData`` message — ResourceLogs →
ScopeLogs → LogRecord — written length-prefixed so multiple exports can
share one file (the reference's ``format: proto`` writes size-delimited
messages for the same reason).

No generated protobuf classes exist in this container, so the wire format
is hand-rolled from the public .proto definitions (varint / fixed64 /
length-delimited — proto3 scalar rules).  Field numbers:

  LogsData:      resource_logs=1
  ResourceLogs:  resource=1, scope_logs=2, schema_url=3
  Resource:      attributes=1 (repeated KeyValue)
  ScopeLogs:     scope=1, log_records=2, schema_url=3
  InstrumentationScope: name=1, version=2
  LogRecord:     time_unix_nano=1 (fixed64), severity_number=2 (varint),
                 severity_text=3, body=5 (AnyValue), attributes=6,
                 dropped_attributes_count=7, flags=8 (fixed32),
                 trace_id=9 (bytes), span_id=10 (bytes),
                 observed_time_unix_nano=11 (fixed64)
  AnyValue:      string_value=1, bool_value=2, int_value=3,
                 double_value=4 (fixed64), array_value=5, kvlist_value=6,
                 bytes_value=7
  KeyValue:      key=1, value=2;  KeyValueList/ArrayValue: values=1

Flat row schema is shared with the OTLP-JSON path (``otlpjson.FLAT_SCHEMA``)
so ``read_otlp_proto_logs(write_otlp_proto_logs(ds))`` is an exact
row-level round-trip interchangeable with the JSON pair (pinned by
tests/test_otlp_roundtrip.py golden bytes + cross-decode).

Per-record Python encode is acceptable here for the same reason as the
JSON exporter: protobuf serialization is inherently per-record and this is
a terminal export stage bounded by output I/O, not a hot transform.
"""

from __future__ import annotations

import json
import struct

import pyarrow as pa

import ray.data

from .otlpjson import FLAT_SCHEMA

_U64 = 0xFFFFFFFFFFFFFFFF


# --- wire primitives ---------------------------------------------------------

def _varint(n: int) -> bytes:
    n &= _U64  # negative int64 -> 10-byte two's-complement varint
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _str_field(field: int, s: str) -> bytes:
    return _len_field(field, s.encode("utf-8"))


def _fixed64(field: int, n: int) -> bytes:
    return _tag(field, 1) + struct.pack("<Q", n & _U64)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes.

    value is int for wire 0, raw 8/4 bytes for wire 1/5, and the payload
    slice for wire 2 — exactly the information a proto3 parser needs."""
    pos, end = 0, len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val, pos = buf[pos:pos + 8], pos + 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val, pos = buf[pos:pos + ln], pos + ln
        elif wire == 5:
            val, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


# --- AnyValue / KeyValue -----------------------------------------------------

def encode_any_value(v) -> bytes:
    """Python value -> AnyValue message bytes (bool before int: bool
    subclasses int in Python)."""
    if isinstance(v, bool):
        return _tag(2, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(3, 0) + _varint(v)
    if isinstance(v, float):
        return _tag(4, 1) + struct.pack("<d", v)
    if isinstance(v, str):
        return _str_field(1, v)
    if isinstance(v, bytes):
        return _len_field(7, v)
    if isinstance(v, list):
        inner = b"".join(_len_field(1, encode_any_value(x)) for x in v)
        return _len_field(5, inner)
    if isinstance(v, dict):
        return _len_field(6, encode_kvlist(v))
    return b""  # null -> empty AnyValue (proto3 unset oneof)


def encode_kvlist(d: dict) -> bytes:
    """dict -> KeyValueList message bytes (sorted keys — deterministic,
    matching the JSON exporter's sort_keys)."""
    return b"".join(
        _len_field(1, _str_field(1, k) + _len_field(2, encode_any_value(v)))
        for k, v in sorted(d.items())
    )


def decode_any_value(buf: bytes):
    for field, wire, val in _fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 2:
            return bool(val)
        if field == 3:
            return _signed64(val)
        if field == 4:
            return struct.unpack("<d", val)[0]
        if field == 5:  # ArrayValue{values=1}
            return [decode_any_value(v) for f, w, v in _fields(val)
                    if f == 1]
        if field == 6:
            return decode_kvlist(val)
        if field == 7:
            return val
    return None


def decode_kvlist(buf: bytes) -> dict:
    out = {}
    for field, wire, val in _fields(buf):
        if field != 1:
            continue
        key, value = None, None
        for f, w, v in _fields(val):
            if f == 1:
                key = v.decode("utf-8")
            elif f == 2:
                value = decode_any_value(v)
        if key is not None:
            out[key] = value
    return out


# --- LogsData encode ---------------------------------------------------------

def _encode_log_record(cols: dict, i: int) -> bytes:
    """One flat row -> LogRecord bytes.  proto3 semantics: zero/None fields
    are omitted (unset scalar == default), mirroring the JSON exporter's
    conditionals so the two formats round-trip identically."""
    out = bytearray()
    if cols["time_unix_nano"][i]:
        out += _fixed64(1, int(cols["time_unix_nano"][i]))
    if cols["severity_number"][i]:
        out += _tag(2, 0) + _varint(int(cols["severity_number"][i]))
    if cols["severity_text"][i] is not None:
        out += _str_field(3, cols["severity_text"][i])
    if cols["body"][i] is not None:
        out += _len_field(5, encode_any_value(cols["body"][i]))
    attrs = json.loads(cols["attributes"][i]) if cols["attributes"][i] else {}
    for k, v in sorted(attrs.items()):
        out += _len_field(
            6, _str_field(1, k) + _len_field(2, encode_any_value(v)))
    if cols["trace_id"][i]:
        out += _len_field(9, bytes.fromhex(cols["trace_id"][i]))
    if cols["span_id"][i]:
        out += _len_field(10, bytes.fromhex(cols["span_id"][i]))
    if cols["observed_time_unix_nano"][i]:
        out += _fixed64(11, int(cols["observed_time_unix_nano"][i]))
    return bytes(out)


def encode_logs_data(batch: pa.Table) -> bytes:
    """Flat LogRecord rows -> one ``LogsData`` export message.  Rows group
    by ``resource_attributes`` into ResourceLogs and by ``scope_name`` into
    ScopeLogs — the same pdata forest rebuild as ``OtlpJsonWrite``."""
    cols = {name: batch.column(name).to_pylist()
            if name in batch.column_names else [None] * batch.num_rows
            for name in FLAT_SCHEMA.names}
    forest: dict[str, dict[str, list[bytes]]] = {}
    for i in range(batch.num_rows):
        res_key = cols["resource_attributes"][i] or "{}"
        scope = cols["scope_name"][i]
        forest.setdefault(res_key, {}).setdefault(scope, []).append(
            _encode_log_record(cols, i))

    doc = bytearray()
    for res_key in sorted(forest):
        rl = bytearray()
        res_attrs = json.loads(res_key)
        if res_attrs:
            rl += _len_field(1, encode_kvlist(res_attrs))  # Resource.attributes
        for scope in sorted(forest[res_key], key=lambda s: s or ""):
            sl = bytearray()
            if scope is not None:
                sl += _len_field(1, _str_field(1, scope))  # scope.name
            for rec in forest[res_key][scope]:
                sl += _len_field(2, rec)
            rl += _len_field(2, bytes(sl))
        doc += _len_field(1, bytes(rl))
    return bytes(doc)


# --- LogsData decode ---------------------------------------------------------

def _decode_log_record(buf: bytes, res_attrs: dict, scope_name) -> dict:
    row = {
        "time_unix_nano": 0, "observed_time_unix_nano": 0,
        "severity_number": 0, "severity_text": None, "body": None,
        "trace_id": None, "span_id": None, "attributes": {},
        "resource_attributes": res_attrs, "scope_name": scope_name,
    }
    for field, wire, val in _fields(buf):
        if field == 1:
            row["time_unix_nano"] = struct.unpack("<Q", val)[0]
        elif field == 2:
            row["severity_number"] = val
        elif field == 3:
            row["severity_text"] = val.decode("utf-8")
        elif field == 5:
            body = decode_any_value(val)
            row["body"] = str(body) if body is not None else None
        elif field == 6:
            key, value = None, None
            for f, w, v in _fields(val):
                if f == 1:
                    key = v.decode("utf-8")
                elif f == 2:
                    value = decode_any_value(v)
            if key is not None:
                row["attributes"][key] = value
        elif field == 9:
            row["trace_id"] = val.hex()
        elif field == 10:
            row["span_id"] = val.hex()
        elif field == 11:
            row["observed_time_unix_nano"] = struct.unpack("<Q", val)[0]
    return row


def decode_logs_data(buf: bytes) -> list[dict]:
    """One ``LogsData`` message -> flat rows (one per LogRecord), the exact
    shape :func:`otlpjson.flatten_otlp_logs` produces."""
    rows = []
    for field, _w, rl in _fields(buf):
        if field != 1:
            continue
        res_attrs: dict = {}
        scope_logs = []
        for f, _w2, v in _fields(rl):
            if f == 1:  # Resource
                for f2, _w3, v2 in _fields(v):
                    if f2 == 1:
                        key, value = None, None
                        for f3, _w4, v3 in _fields(v2):
                            if f3 == 1:
                                key = v3.decode("utf-8")
                            elif f3 == 2:
                                value = decode_any_value(v3)
                        if key is not None:
                            res_attrs[key] = value
            elif f == 2:
                scope_logs.append(v)
        for sl in scope_logs:
            scope_name = None
            recs = []
            for f, _w2, v in _fields(sl):
                if f == 1:  # InstrumentationScope
                    for f2, _w3, v2 in _fields(v):
                        if f2 == 1:
                            scope_name = v2.decode("utf-8")
                elif f == 2:
                    recs.append(v)
            rows.extend(_decode_log_record(r, res_attrs, scope_name)
                        for r in recs)
    return rows


# --- Ray Data source / sink --------------------------------------------------

def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return FLAT_SCHEMA.empty_table()
    cols = {}
    for f in FLAT_SCHEMA:
        if f.name in ("attributes", "resource_attributes"):
            cols[f.name] = pa.array(
                [json.dumps(r[f.name], sort_keys=True) for r in rows],
                f.type)
        else:
            cols[f.name] = pa.array([r[f.name] for r in rows], f.type)
    return pa.table(cols)


# Optional zstd file compression — the fileexporter's ``compression:
# zstd`` analog (exporter/fileexporter/config.go:31-47). The runtime's
# only zstd binding (pyarrow.Codec) needs the decompressed size up front,
# so compressed shards carry an 8-byte magic + varint(uncompressed size)
# header before the standard zstd stream of size-delimited exports;
# readers sniff the magic, so mixed plain/compressed directories read
# transparently.
_ZSTD_MAGIC = b"OTLPZSTD"


def _frame_file(payload: bytes, compression: "str | None") -> bytes:
    if compression is None:
        return payload
    if compression != "zstd":
        raise ValueError(
            f"unsupported compression {compression!r}; one of (None, 'zstd')")
    comp = pa.Codec("zstd").compress(payload, asbytes=True)
    return _ZSTD_MAGIC + _varint(len(payload)) + comp


def _unframe_file(data: bytes) -> bytes:
    if not data.startswith(_ZSTD_MAGIC):
        return data
    size, pos = _read_varint(data, len(_ZSTD_MAGIC))
    return pa.Codec("zstd").decompress(data[pos:], decompressed_size=size,
                                       asbytes=True)


class OtlpProtoWrite:
    """Encode flat LogRecord rows to one size-delimited ``LogsData`` export
    per batch, appended to a per-task ``.pb`` shard (resumable-output
    convention: the out_dir ACCUMULATES like write_routed; rm before a
    fresh run)."""

    MANIFEST_SCHEMA = pa.schema([("path", pa.string()), ("rows", pa.int64())])

    def __init__(self, out_dir: str, compression: "str | None" = None):
        if compression not in (None, "zstd"):  # fail fast, driver-side
            raise ValueError(
                f"unsupported compression {compression!r}; "
                "one of (None, 'zstd')")
        self.out_dir = out_dir
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import uuid

        if batch.num_rows == 0:
            return self.MANIFEST_SCHEMA.empty_table()
        payload = encode_logs_data(batch)
        os.makedirs(self.out_dir, exist_ok=True)
        # .pbz, not .pb.zst: ray.data.read_binary_files auto-decompresses
        # on a .zst suffix and chokes on our size-hint header
        ext = ".pbz" if self.compression else ".pb"
        path = os.path.join(self.out_dir, f"export-{uuid.uuid4().hex}{ext}")
        with open(path, "wb") as f:
            f.write(_frame_file(_varint(len(payload)) + payload,
                                self.compression))
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def write_otlp_proto_logs(ds: ray.data.Dataset, out_dir: str,
                          compression: "str | None" = None):
    """Write a flat-schema log Dataset as size-delimited OTLP-proto
    ``LogsData`` files under ``out_dir``; returns the materialized shard
    manifest (bounded: one row per block)."""
    manifest = ds.map_batches(OtlpProtoWrite(out_dir, compression),
                              batch_format="pyarrow", zero_copy_batch=True)
    return manifest.materialize()


def _decode_shard(payload: bytes, decode, path: str) -> list[dict]:
    """Decode one size-delimited shard; a truncated or corrupt file (e.g.
    a writer killed mid-write) raises a clear error NAMING the file
    instead of a bare IndexError from the varint reader."""
    try:
        payload = _unframe_file(payload)
        rows = []
        pos = 0
        while pos < len(payload):
            ln, pos = _read_varint(payload, pos)
            if pos + ln > len(payload):
                raise ValueError(
                    f"truncated export frame ({ln} bytes declared, "
                    f"{len(payload) - pos} remain)")
            rows.extend(decode(payload[pos:pos + ln]))
            pos += ln
        return rows
    except Exception as e:
        raise ValueError(f"corrupt OTLP-proto shard {path!r}: {e}") from e


class _DecodeProtoBatch:
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        paths = (batch.column("path").to_pylist()
                 if "path" in batch.column_names
                 else [None] * batch.num_rows)
        for payload, path in zip(batch.column("bytes").to_pylist(), paths):
            rows.extend(_decode_shard(payload, decode_logs_data, path))
        return _rows_to_table(rows)


def read_otlp_proto_logs(paths: "str | list[str]") -> ray.data.Dataset:
    """Read size-delimited OTLP-proto LogsData files (plain or
    zstd-compressed — sniffed per file) into a flat one-row-per-LogRecord
    Dataset (schema = ``otlpjson.FLAT_SCHEMA``)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_DecodeProtoBatch(), batch_format="pyarrow",
                          zero_copy_batch=True)


# =============================================================================
# Traces / Metrics wire codecs — same fileexporter `format: proto` analog
# over trace/v1/trace.proto and metrics/v1/metrics.proto (public schemas).
# Flat column names match the OTTL span/datapoint context path sets
# (functions/contexts.py) so context-translated statements address these
# rows directly.
# =============================================================================

SPAN_FLAT_SCHEMA = pa.schema([
    ("trace_id", pa.string()),
    ("span_id", pa.string()),
    ("parent_span_id", pa.string()),
    ("trace_state", pa.string()),
    ("span_name", pa.string()),
    ("span_kind", pa.int32()),
    ("start_time_unix_nano", pa.uint64()),
    ("end_time_unix_nano", pa.uint64()),
    ("status_code", pa.int32()),
    ("status_message", pa.string()),
    ("attributes", pa.string()),           # JSON-encoded map
    ("resource_attributes", pa.string()),  # JSON-encoded map
    ("scope_name", pa.string()),
])

# one row per NumberDataPoint, parent Metric denormalized onto the row
METRIC_FLAT_SCHEMA = pa.schema([
    ("metric_name", pa.string()),
    ("metric_description", pa.string()),
    ("metric_unit", pa.string()),
    ("metric_type", pa.string()),          # "gauge" | "sum"
    ("aggregation_temporality", pa.int32()),
    ("is_monotonic", pa.bool_()),
    ("start_time_unix_nano", pa.uint64()),
    ("time_unix_nano", pa.uint64()),
    ("value_double", pa.float64()),
    ("value_int", pa.int64()),
    ("attributes", pa.string()),
    ("resource_attributes", pa.string()),
    ("scope_name", pa.string()),
])


def _encode_kvs_field(field: int, attrs_json) -> bytes:
    attrs = json.loads(attrs_json) if attrs_json else {}
    return b"".join(
        _len_field(field,
                   _str_field(1, k) + _len_field(2, encode_any_value(v)))
        for k, v in sorted(attrs.items()))


def _decode_kvs(buf: bytes) -> dict:
    key, value = None, None
    for f, _w, v in _fields(buf):
        if f == 1:
            key = v.decode("utf-8")
        elif f == 2:
            value = decode_any_value(v)
    return {key: value} if key is not None else {}


def _forest(cols: dict, num_rows: int):
    """rows grouped resource_attributes -> scope_name (shared by all three
    signal encoders)."""
    forest: dict[str, dict[str, list[int]]] = {}
    for i in range(num_rows):
        res_key = cols["resource_attributes"][i] or "{}"
        forest.setdefault(res_key, {}).setdefault(
            cols["scope_name"][i], []).append(i)
    return forest


def _resource_scope_wrap(forest, cols, encode_scope_items) -> bytes:
    """Assemble <Signal>sData bytes: ResourceX{resource=1, scope_x=2}
    around per-scope item payloads produced by ``encode_scope_items``."""
    doc = bytearray()
    for res_key in sorted(forest):
        rl = bytearray()
        res_attrs = json.loads(res_key)
        if res_attrs:
            rl += _len_field(1, encode_kvlist(res_attrs))
        for scope in sorted(forest[res_key], key=lambda s: s or ""):
            sl = bytearray()
            if scope is not None:
                sl += _len_field(1, _str_field(1, scope))
            sl += encode_scope_items(cols, forest[res_key][scope])
            rl += _len_field(2, bytes(sl))
        doc += _len_field(1, bytes(rl))
    return bytes(doc)


# --- spans -------------------------------------------------------------------

def _encode_span(cols: dict, i: int) -> bytes:
    out = bytearray()
    if cols["trace_id"][i]:
        out += _len_field(1, bytes.fromhex(cols["trace_id"][i]))
    if cols["span_id"][i]:
        out += _len_field(2, bytes.fromhex(cols["span_id"][i]))
    if cols["trace_state"][i]:
        out += _str_field(3, cols["trace_state"][i])
    if cols["parent_span_id"][i]:
        out += _len_field(4, bytes.fromhex(cols["parent_span_id"][i]))
    if cols["span_name"][i] is not None:
        out += _str_field(5, cols["span_name"][i])
    if cols["span_kind"][i]:
        out += _tag(6, 0) + _varint(int(cols["span_kind"][i]))
    if cols["start_time_unix_nano"][i]:
        out += _fixed64(7, int(cols["start_time_unix_nano"][i]))
    if cols["end_time_unix_nano"][i]:
        out += _fixed64(8, int(cols["end_time_unix_nano"][i]))
    out += _encode_kvs_field(9, cols["attributes"][i])
    code = int(cols["status_code"][i] or 0)
    msg = cols["status_message"][i]
    if code or msg:
        status = bytearray()
        if msg:
            status += _str_field(2, msg)
        if code:
            status += _tag(3, 0) + _varint(code)
        out += _len_field(15, bytes(status))
    return bytes(out)


def encode_traces_data(batch: pa.Table) -> bytes:
    """Flat span rows -> one ``TracesData`` message (trace.proto:
    ResourceSpans=1 -> ScopeSpans{scope=1, spans=2} -> Span)."""
    cols = {name: batch.column(name).to_pylist()
            if name in batch.column_names else [None] * batch.num_rows
            for name in SPAN_FLAT_SCHEMA.names}

    def items(cols, idxs):
        return b"".join(_len_field(2, _encode_span(cols, i)) for i in idxs)

    return _resource_scope_wrap(_forest(cols, batch.num_rows), cols, items)


def _decode_span(buf: bytes, res_attrs: dict, scope_name) -> dict:
    row = {"trace_id": None, "span_id": None, "parent_span_id": None,
           "trace_state": None, "span_name": None, "span_kind": 0,
           "start_time_unix_nano": 0, "end_time_unix_nano": 0,
           "status_code": 0, "status_message": None, "attributes": {},
           "resource_attributes": res_attrs, "scope_name": scope_name}
    for f, _w, v in _fields(buf):
        if f == 1:
            row["trace_id"] = v.hex()
        elif f == 2:
            row["span_id"] = v.hex()
        elif f == 3:
            row["trace_state"] = v.decode("utf-8")
        elif f == 4:
            row["parent_span_id"] = v.hex()
        elif f == 5:
            row["span_name"] = v.decode("utf-8")
        elif f == 6:
            row["span_kind"] = v
        elif f == 7:
            row["start_time_unix_nano"] = struct.unpack("<Q", v)[0]
        elif f == 8:
            row["end_time_unix_nano"] = struct.unpack("<Q", v)[0]
        elif f == 9:
            row["attributes"].update(_decode_kvs(v))
        elif f == 15:
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    row["status_message"] = v2.decode("utf-8")
                elif f2 == 3:
                    row["status_code"] = v2
    return row


def decode_traces_data(buf: bytes) -> list[dict]:
    rows = []
    for field, _w, rl in _fields(buf):
        if field != 1:
            continue
        res_attrs: dict = {}
        scopes = []
        for f, _w2, v in _fields(rl):
            if f == 1:
                for f2, _w3, v2 in _fields(v):
                    if f2 == 1:
                        res_attrs.update(_decode_kvs(v2))
            elif f == 2:
                scopes.append(v)
        for sl in scopes:
            scope_name = None
            spans = []
            for f, _w2, v in _fields(sl):
                if f == 1:
                    for f2, _w3, v2 in _fields(v):
                        if f2 == 1:
                            scope_name = v2.decode("utf-8")
                elif f == 2:
                    spans.append(v)
            rows.extend(_decode_span(s, res_attrs, scope_name)
                        for s in spans)
    return rows


# --- metrics -----------------------------------------------------------------

def _encode_number_dp(cols: dict, i: int) -> bytes:
    out = bytearray()
    if cols["start_time_unix_nano"][i]:
        out += _fixed64(2, int(cols["start_time_unix_nano"][i]))
    if cols["time_unix_nano"][i]:
        out += _fixed64(3, int(cols["time_unix_nano"][i]))
    if cols["value_double"][i] is not None:
        out += _tag(4, 1) + struct.pack("<d", cols["value_double"][i])
    elif cols["value_int"][i] is not None:
        out += _tag(6, 1) + struct.pack("<q", cols["value_int"][i])
    out += _encode_kvs_field(7, cols["attributes"][i])
    return bytes(out)


def encode_metrics_data(batch: pa.Table) -> bytes:
    """Flat datapoint rows -> one ``MetricsData`` message (metrics.proto:
    ResourceMetrics=1 -> ScopeMetrics{scope=1, metrics=2} -> Metric
    {name=1, description=2, unit=3, gauge=5 | sum=7} -> NumberDataPoint).
    Datapoints sharing (metric_name, description, unit, type,
    temporality, monotonic) within a scope group under one Metric."""
    cols = {name: batch.column(name).to_pylist()
            if name in batch.column_names else [None] * batch.num_rows
            for name in METRIC_FLAT_SCHEMA.names}

    def items(cols, idxs):
        metrics: dict[tuple, list[int]] = {}
        for i in idxs:
            key = (cols["metric_name"][i] or "",
                   cols["metric_description"][i] or "",
                   cols["metric_unit"][i] or "",
                   cols["metric_type"][i] or "gauge",
                   int(cols["aggregation_temporality"][i] or 0),
                   bool(cols["is_monotonic"][i]))
            metrics.setdefault(key, []).append(i)
        out = bytearray()
        for key in sorted(metrics):
            name, desc, unit, mtype, temp, mono = key
            m = bytearray()
            if name:
                m += _str_field(1, name)
            if desc:
                m += _str_field(2, desc)
            if unit:
                m += _str_field(3, unit)
            dps = b"".join(_len_field(1, _encode_number_dp(cols, i))
                           for i in metrics[key])
            if mtype == "sum":
                body = bytearray(dps)
                if temp:
                    body += _tag(2, 0) + _varint(temp)
                if mono:
                    body += _tag(3, 0) + _varint(1)
                m += _len_field(7, bytes(body))
            else:
                m += _len_field(5, dps)
            out += _len_field(2, bytes(m))
        return bytes(out)

    return _resource_scope_wrap(_forest(cols, batch.num_rows), cols, items)


def decode_metrics_data(buf: bytes) -> list[dict]:
    rows = []
    for field, _w, rl in _fields(buf):
        if field != 1:
            continue
        res_attrs: dict = {}
        scopes = []
        for f, _w2, v in _fields(rl):
            if f == 1:
                for f2, _w3, v2 in _fields(v):
                    if f2 == 1:
                        res_attrs.update(_decode_kvs(v2))
            elif f == 2:
                scopes.append(v)
        for sl in scopes:
            scope_name = None
            metrics = []
            for f, _w2, v in _fields(sl):
                if f == 1:
                    for f2, _w3, v2 in _fields(v):
                        if f2 == 1:
                            scope_name = v2.decode("utf-8")
                elif f == 2:
                    metrics.append(v)
            for mbuf in metrics:
                meta = {"metric_name": None, "metric_description": None,
                        "metric_unit": None, "metric_type": "gauge",
                        "aggregation_temporality": 0, "is_monotonic": False}
                dps = []
                for f, _w2, v in _fields(mbuf):
                    if f == 1:
                        meta["metric_name"] = v.decode("utf-8")
                    elif f == 2:
                        meta["metric_description"] = v.decode("utf-8")
                    elif f == 3:
                        meta["metric_unit"] = v.decode("utf-8")
                    elif f in (5, 7):
                        meta["metric_type"] = "sum" if f == 7 else "gauge"
                        for f2, _w3, v2 in _fields(v):
                            if f2 == 1:
                                dps.append(v2)
                            elif f2 == 2:
                                meta["aggregation_temporality"] = v2
                            elif f2 == 3:
                                meta["is_monotonic"] = bool(v2)
                for dp in dps:
                    row = {**meta, "start_time_unix_nano": 0,
                           "time_unix_nano": 0, "value_double": None,
                           "value_int": None, "attributes": {},
                           "resource_attributes": res_attrs,
                           "scope_name": scope_name}
                    for f, _w2, v in _fields(dp):
                        if f == 2:
                            row["start_time_unix_nano"] = \
                                struct.unpack("<Q", v)[0]
                        elif f == 3:
                            row["time_unix_nano"] = struct.unpack("<Q", v)[0]
                        elif f == 4:
                            row["value_double"] = struct.unpack("<d", v)[0]
                        elif f == 6:
                            row["value_int"] = struct.unpack("<q", v)[0]
                        elif f == 7:
                            row["attributes"].update(_decode_kvs(v))
                    rows.append(row)
    return rows


# --- Ray Data source / sink (spans + metrics) --------------------------------

def _flat_rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    if not rows:
        return schema.empty_table()
    cols = {}
    for f in schema:
        if f.name in ("attributes", "resource_attributes"):
            cols[f.name] = pa.array(
                [json.dumps(r[f.name], sort_keys=True) for r in rows],
                f.type)
        else:
            cols[f.name] = pa.array([r[f.name] for r in rows], f.type)
    return pa.table(cols)


class _SignalProtoWrite:
    """Shared per-batch size-delimited writer (see OtlpProtoWrite)."""

    MANIFEST_SCHEMA = OtlpProtoWrite.MANIFEST_SCHEMA

    def __init__(self, out_dir: str, encode,
                 compression: "str | None" = None):
        if compression not in (None, "zstd"):  # fail fast, driver-side
            raise ValueError(
                f"unsupported compression {compression!r}; "
                "one of (None, 'zstd')")
        self.out_dir = out_dir
        self.encode = encode
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import uuid

        if batch.num_rows == 0:
            return self.MANIFEST_SCHEMA.empty_table()
        payload = self.encode(batch)
        os.makedirs(self.out_dir, exist_ok=True)
        # .pbz, not .pb.zst: ray.data.read_binary_files auto-decompresses
        # on a .zst suffix and chokes on our size-hint header
        ext = ".pbz" if self.compression else ".pb"
        path = os.path.join(self.out_dir, f"export-{uuid.uuid4().hex}{ext}")
        with open(path, "wb") as f:
            f.write(_frame_file(_varint(len(payload)) + payload,
                                self.compression))
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def write_otlp_proto_traces(ds: ray.data.Dataset, out_dir: str,
                            compression: "str | None" = None):
    manifest = ds.map_batches(
        _SignalProtoWrite(out_dir, encode_traces_data, compression),
        batch_format="pyarrow", zero_copy_batch=True)
    return manifest.materialize()


def write_otlp_proto_metrics(ds: ray.data.Dataset, out_dir: str,
                             compression: "str | None" = None):
    manifest = ds.map_batches(
        _SignalProtoWrite(out_dir, encode_metrics_data, compression),
        batch_format="pyarrow", zero_copy_batch=True)
    return manifest.materialize()


class _DecodeSignalBatch:
    def __init__(self, decode, schema):
        self.decode = decode
        self.schema = schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        paths = (batch.column("path").to_pylist()
                 if "path" in batch.column_names
                 else [None] * batch.num_rows)
        for payload, path in zip(batch.column("bytes").to_pylist(), paths):
            rows.extend(_decode_shard(payload, self.decode, path))
        return _flat_rows_to_table(rows, self.schema)


def read_otlp_proto_traces(paths: "str | list[str]") -> ray.data.Dataset:
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(
        _DecodeSignalBatch(decode_traces_data, SPAN_FLAT_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True)


def read_otlp_proto_metrics(paths: "str | list[str]") -> ray.data.Dataset:
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(
        _DecodeSignalBatch(decode_metrics_data, METRIC_FLAT_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True)
