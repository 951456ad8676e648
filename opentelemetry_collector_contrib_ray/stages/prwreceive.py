"""prometheusremotewritereceiver analog: Prometheus Remote-Write 2.0
(writev2) request decode → flat OTel metric datapoint rows.

Parity with receiver/prometheusremotewritereceiver/receiver.go:235-806:

- writev2 wire format (prompb/io/prometheus/write/v2/types.proto, the
  published PRW 2.0 spec): ``Request{symbols:4, timeseries:5}``,
  ``TimeSeries{labels_refs:1(packed u32), samples:2, histograms:3,
  exemplars:4, metadata:5, created_timestamp:6}``, ``Sample{value:1,
  timestamp:2}``, ``Metadata{type:1, help_ref:3, unit_ref:4}``,
  ``Histogram`` with the prompb field set 1-16 (oneof count/zero_count,
  sint schema/offsets/deltas, packed doubles, custom_values:16).
  Hand-rolled codec sharing the varint/field machinery with
  sources/otlpproto.py; snappy/HTTP content negotiation is the
  transport layer (confighttp middleware), out of batch scope.
- whole-request failure (handlePRW:186-191): ANY series with a missing
  ``__name__``, duplicate label names, or an out-of-bounds unit/help
  symbol ref — and any series with an unsupported metadata type
  (unspecified/gaugehistogram/info/stateset) — rejects the ENTIRE
  request (HTTP 400, metrics discarded).
- silent drops (no error): summary series (:358-360), classic
  histograms = histogram-typed series carrying samples (:397-402),
  gauge-reset-hint histograms (:410-412), invalid native schemas
  (:418-426), exponential histograms with negative counts (:536-542),
  NHCB histograms without custom_values (:716-719); exemplars are not
  translated (TODO in the reference).
- ``target_info`` series become resource attributes for their
  (job, instance) resource (:259-282): job/instance parse to
  service.namespace/service.name/service.instance.id (:505-518,
  "ns/name" split on exactly one "/"), remaining labels (except
  job/instance/__name__ — otel_scope_* is NOT excluded here) merge
  last-wins into the resource. The reference's rm LRU cache spans HTTP
  requests; the batch analog scopes it to one request row, documented.
- metric identity (:317-327): (resource identity, scope name/version,
  metric name, unit, metadata type[, histogram kind]) — resource
  identity is hashed over the attrs AT PROCESSING TIME, so a
  target_info arriving mid-request re-keys later series (reproduced
  via a resource version counter). Longest description wins per metric
  (:366-370, strictly-longer updates).
- number points (:521-534): one dp per sample, ms→ns timestamps,
  created_timestamp → start; gauge vs cumulative monotonic sum.
- exponential histograms (:536-585): scale=schema, span[0].offset-1,
  inter-span gaps zero-filled (spanIdx>0 only), integer deltas
  cumulative / float counts absolute (uint64-truncated), zero
  count/threshold, count/sum via the oneof.
- NHCB (schema -53, :716-788): custom_values → explicit bounds,
  len+1 bucket counts filled by span walk with bounds clipping,
  stale-NaN sum → NoRecordedValue flag with count/sum unset.
- label→attribute split (:686-697): job/instance/__name__/
  otel_scope_name/otel_scope_version excluded; Go iterates a map
  (random order) — emitted sorted by label name here, documented.

Execution: one task-based map_batches over a binary request column,
fan-out one row per datapoint; block-local, zero shuffle.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..sources.otlpproto import (
    _fields,
    _len_field,
    _signed64,
    _str_field,
    _tag,
    _varint,
)

STALE_NAN_BITS = 0x7FF0000000000002
_U64 = (1 << 64) - 1
_I64 = (1 << 63) - 1

# writev2.Metadata_MetricType
MT_UNSPECIFIED, MT_COUNTER, MT_GAUGE, MT_HISTOGRAM = 0, 1, 2, 3
MT_GAUGEHISTOGRAM, MT_SUMMARY, MT_INFO, MT_STATESET = 4, 5, 6, 7

RESET_HINT_GAUGE = 3


def is_stale_nan(v: float) -> bool:
    return struct.unpack("<Q", struct.pack("<d", v))[0] == STALE_NAN_BITS


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else (n << 1)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _double_field(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", float(v))


def _packed_varints(field: int, vals, zigzag=False) -> bytes:
    if not vals:
        return b""
    payload = b"".join(_varint(_zigzag(int(v)) if zigzag else int(v))
                       for v in vals)
    return _len_field(field, payload)


def _packed_doubles(field: int, vals) -> bytes:
    if not vals:
        return b""
    return _len_field(field, struct.pack(f"<{len(vals)}d", *vals))


# --------------------------------------------------------------------------
# writev2 encode (fixture/test side)

def encode_histogram(h: dict) -> bytes:
    """h keys: count_int|count_float, zero_count_int|zero_count_float,
    sum, schema, zero_threshold, negative_spans/positive_spans
    [(offset, length)], negative_deltas/positive_deltas,
    negative_counts/positive_counts, reset_hint, timestamp,
    custom_values."""
    out = bytearray()
    if "count_int" in h:
        out += _tag(1, 0) + _varint(int(h["count_int"]))
    if "count_float" in h:
        out += _double_field(2, h["count_float"])
    if "zero_count_int" in h:
        out += _tag(3, 0) + _varint(int(h["zero_count_int"]))
    if "zero_count_float" in h:
        out += _double_field(4, h["zero_count_float"])
    if h.get("sum") is not None:
        out += _double_field(5, h["sum"])
    if h.get("schema"):
        out += _tag(6, 0) + _varint(_zigzag(int(h["schema"])))
    if h.get("zero_threshold"):
        out += _double_field(7, h["zero_threshold"])
    for off, ln in h.get("negative_spans", ()):
        out += _len_field(8, _tag(1, 0) + _varint(_zigzag(int(off))) +
                          _tag(2, 0) + _varint(int(ln)))
    out += _packed_varints(9, h.get("negative_deltas", ()), zigzag=True)
    out += _packed_doubles(10, h.get("negative_counts", ()))
    for off, ln in h.get("positive_spans", ()):
        out += _len_field(11, _tag(1, 0) + _varint(_zigzag(int(off))) +
                          _tag(2, 0) + _varint(int(ln)))
    out += _packed_varints(12, h.get("positive_deltas", ()), zigzag=True)
    out += _packed_doubles(13, h.get("positive_counts", ()))
    if h.get("reset_hint"):
        out += _tag(14, 0) + _varint(int(h["reset_hint"]))
    if h.get("timestamp"):
        out += _tag(15, 0) + _varint(int(h["timestamp"]))
    out += _packed_doubles(16, h.get("custom_values", ()))
    return bytes(out)


def encode_timeseries(ts: dict) -> bytes:
    """ts keys: labels_refs, samples [(value, timestamp)], histograms
    [hist dict], metadata (type, help_ref, unit_ref),
    created_timestamp."""
    out = bytearray()
    out += _packed_varints(1, ts.get("labels_refs", ()))
    for v, t in ts.get("samples", ()):
        out += _len_field(2, _double_field(1, v) +
                          (_tag(2, 0) + _varint(int(t)) if t else b""))
    for h in ts.get("histograms", ()):
        out += _len_field(3, encode_histogram(h))
    mtype, help_ref, unit_ref = ts.get("metadata", (0, 0, 0))
    md = bytearray()
    if mtype:
        md += _tag(1, 0) + _varint(mtype)
    if help_ref:
        md += _tag(3, 0) + _varint(help_ref)
    if unit_ref:
        md += _tag(4, 0) + _varint(unit_ref)
    out += _len_field(5, bytes(md))
    if ts.get("created_timestamp"):
        out += _tag(6, 0) + _varint(int(ts["created_timestamp"]))
    return bytes(out)


def encode_writev2_request(symbols: list, timeseries: list) -> bytes:
    out = bytearray()
    for s in symbols:
        out += _str_field(4, s)
    for ts in timeseries:
        out += _len_field(5, encode_timeseries(ts))
    return bytes(out)


def build_symbolized_request(series: list) -> bytes:
    """series: list of dicts with ``labels`` [(name, value)] plus the
    encode_timeseries keys except labels_refs; builds the shared symbol
    table (symbol 0 = "", first-seen order) like prometheus'
    SymbolsTable does."""
    symbols = [""]
    index = {"": 0}

    def ref(s: str) -> int:
        if s not in index:
            index[s] = len(symbols)
            symbols.append(s)
        return index[s]

    enc = []
    for sr in series:
        ts = dict(sr)
        refs = []
        for k, v in ts.pop("labels", ()):
            refs.append(ref(k))
            refs.append(ref(v))
        md = ts.get("metadata")
        if md and (isinstance(md[1], str) or isinstance(md[2], str)):
            ts["metadata"] = (md[0],
                              ref(md[1]) if isinstance(md[1], str) else md[1],
                              ref(md[2]) if isinstance(md[2], str) else md[2])
        ts["labels_refs"] = refs
        enc.append(ts)
    return encode_writev2_request(symbols, enc)


# --------------------------------------------------------------------------
# writev2 decode

def _unpack_varints(wire, val, zigzag=False):
    if wire == 0:
        return [_unzigzag(val) if zigzag else val]
    out = []
    pos, end = 0, len(val)
    while pos < end:
        n = 0
        shift = 0
        while True:
            b = val[pos]
            pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        out.append(_unzigzag(n) if zigzag else n)
    return out


def _unpack_doubles(wire, val):
    if wire == 1:
        return [struct.unpack("<d", val)[0]]
    return list(struct.unpack(f"<{len(val) // 8}d", val))


def decode_histogram(buf: bytes) -> dict:
    h = {"negative_spans": [], "negative_deltas": [],
         "negative_counts": [], "positive_spans": [],
         "positive_deltas": [], "positive_counts": [],
         "custom_values": [], "sum": 0.0, "schema": 0,
         "zero_threshold": 0.0, "reset_hint": 0, "timestamp": 0,
         "count_kind": None, "count": 0, "zero_count_kind": None,
         "zero_count": 0}
    for field, wire, val in _fields(buf):
        if field == 1:
            h["count_kind"], h["count"] = "int", val
        elif field == 2:
            h["count_kind"] = "float"
            h["count"] = struct.unpack("<d", val)[0]
        elif field == 3:
            h["zero_count_kind"], h["zero_count"] = "int", val
        elif field == 4:
            h["zero_count_kind"] = "float"
            h["zero_count"] = struct.unpack("<d", val)[0]
        elif field == 5:
            h["sum"] = struct.unpack("<d", val)[0]
        elif field == 6:
            h["schema"] = _unzigzag(val)
        elif field == 7:
            h["zero_threshold"] = struct.unpack("<d", val)[0]
        elif field in (8, 11):
            off = ln = 0
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    off = _unzigzag(v2)
                elif f2 == 2:
                    ln = v2
            key = "negative_spans" if field == 8 else "positive_spans"
            h[key].append((off, ln))
        elif field == 9:
            h["negative_deltas"] += _unpack_varints(wire, val, zigzag=True)
        elif field == 10:
            h["negative_counts"] += _unpack_doubles(wire, val)
        elif field == 12:
            h["positive_deltas"] += _unpack_varints(wire, val, zigzag=True)
        elif field == 13:
            h["positive_counts"] += _unpack_doubles(wire, val)
        elif field == 14:
            h["reset_hint"] = val
        elif field == 15:
            h["timestamp"] = _signed64(val)
        elif field == 16:
            h["custom_values"] += _unpack_doubles(wire, val)
    return h


def decode_writev2_request(buf: bytes) -> tuple[list, list]:
    """-> (symbols, timeseries dicts)."""
    symbols: list[str] = []
    series: list[dict] = []
    for field, wire, val in _fields(buf):
        if field == 4:
            symbols.append(val.decode("utf-8"))
        elif field == 5:
            ts = {"labels_refs": [], "samples": [], "histograms": [],
                  "metadata": (0, 0, 0), "created_timestamp": 0}
            for f2, w2, v2 in _fields(val):
                if f2 == 1:
                    ts["labels_refs"] += _unpack_varints(w2, v2)
                elif f2 == 2:
                    sv, st = 0.0, 0
                    for f3, _, v3 in _fields(v2):
                        if f3 == 1:
                            sv = struct.unpack("<d", v3)[0]
                        elif f3 == 2:
                            st = _signed64(v3)
                    ts["samples"].append((sv, st))
                elif f2 == 3:
                    ts["histograms"].append(decode_histogram(v2))
                elif f2 == 4:
                    pass  # exemplars: not translated (reference TODO)
                elif f2 == 5:
                    mt = hr = ur = 0
                    for f3, _, v3 in _fields(v2):
                        if f3 == 1:
                            mt = v3
                        elif f3 == 3:
                            hr = v3
                        elif f3 == 4:
                            ur = v3
                    ts["metadata"] = (mt, hr, ur)
                elif f2 == 6:
                    ts["created_timestamp"] = _signed64(v2)
            series.append(ts)
    return symbols, series


# --------------------------------------------------------------------------
# translateV2

def _parse_job_and_instance(job: str, instance: str):
    """receiver.go:505-518."""
    ns = name = None
    if job:
        parts = job.split("/")
        if len(parts) == 2:
            ns, name = parts
        else:
            name = job
    return ns, name, (instance or None)


_EXCLUDED_ATTR = {"job", "instance", "__name__",
                  "otel_scope_name", "otel_scope_version"}


def _convert_delta_buckets(spans, deltas):
    """receiver.go:637-659 — cumulative deltas, inter-span zero fill."""
    out = []
    idx = 0
    count = 0
    for si, (off, ln) in enumerate(spans):
        if si > 0:
            out += [0] * max(0, off)
        for _ in range(ln):
            count += deltas[idx]
            idx += 1
            out.append(count & _U64)
    return out


def _convert_absolute_buckets(spans, counts):
    """receiver.go:663-683 — absolute float counts, uint64 truncation."""
    out = []
    idx = 0
    for si, (off, ln) in enumerate(spans):
        if si > 0:
            out += [0] * max(0, off)
        for _ in range(ln):
            out.append(int(counts[idx]) & _U64)
            idx += 1
    return out


def _has_negative_counts(h: dict) -> bool:
    """receiver.go:588-633."""
    if h["count_kind"] == "float":
        if h["count"] < 0 or (h["zero_count_kind"] == "float" and
                              h["zero_count"] < 0):
            return True
        return (any(c < 0 for c in h["positive_counts"]) or
                any(c < 0 for c in h["negative_counts"]))
    for deltas in (h["negative_deltas"], h["positive_deltas"]):
        acc = 0
        for d in deltas:
            acc += d
            if acc < 0:
                return True
    return False


def _convert_nhcb_buckets(h: dict) -> list:
    """receiver.go:740-788 — len(bounds)+1 buckets, span walk with
    clipping."""
    out = [0] * (len(h["custom_values"]) + 1)
    if not h["positive_spans"]:
        return out
    idx = 0
    if h["count_kind"] == "float":
        ci = 0
        for off, ln in h["positive_spans"]:
            idx += off
            i = 0
            while i < ln and idx < len(out) and i < len(h["positive_counts"]):
                if idx >= 0:
                    out[idx] = int(h["positive_counts"][i]) & _U64
                i += 1
                idx += 1
            ci += i
    else:
        acc = 0
        di = 0
        for off, ln in h["positive_spans"]:
            idx += off
            i = 0
            while i < ln and idx < len(out) and di < len(h["positive_deltas"]):
                acc += h["positive_deltas"][di]
                di += 1
                if idx >= 0:
                    out[idx] = acc & _U64
                i += 1
                idx += 1
    return out


def translate_v2_request(buf: bytes, *, scope_name_default: str = "",
                         scope_version_default: str = ""):
    """One writev2 request → (rows, None) or (None, error) under the
    whole-request 400 semantics. Row dicts use the flat output schema
    of ``parse_prometheus_remote_write``."""
    try:
        symbols, series = decode_writev2_request(buf)
    except Exception as e:  # noqa: BLE001
        return None, f"unmarshal: {e}"

    nsym = len(symbols)
    errors: list[str] = []
    rows: list[dict] = []
    resources: dict = {}     # (job, instance) -> [version, extras dict]
    metric_desc: dict = {}   # metric identity -> description
    metric_rows: dict = {}   # metric identity -> [row indices]

    def labels_of(ts):
        refs = ts["labels_refs"]
        if len(refs) % 2:
            raise ValueError("odd label refs")
        out = []
        for i in range(0, len(refs), 2):
            if refs[i] >= nsym or refs[i + 1] >= nsym:
                raise ValueError("label ref out of bounds")
            out.append((symbols[refs[i]], symbols[refs[i + 1]]))
        return out

    for ts in series:
        try:
            lbls = labels_of(ts)
        except ValueError as e:
            errors.append(str(e))
            continue
        lmap = dict(lbls)
        name = lmap.get("__name__", "")
        if not name:
            errors.append("missing metric name in labels")
            continue
        if len(lmap) != len(lbls):
            seen = set()
            dup = next(k for k, _ in lbls
                       if k in seen or seen.add(k))  # noqa: B023
            errors.append(f'duplicate label "{dup}" in labels')
            continue

        job, instance = lmap.get("job", ""), lmap.get("instance", "")
        rkey = (job, instance)

        if name == "target_info":
            ver, extras = resources.setdefault(rkey, [0, {}])
            changed = False
            for k, v in sorted(lmap.items()):
                if k not in ("job", "instance", "__name__"):
                    if extras.get(k) != v:
                        extras[k] = v
                        changed = True
            if changed:
                resources[rkey][0] = ver + 1
            continue

        scope_name = lmap.get("otel_scope_name") or scope_name_default
        scope_version = (lmap.get("otel_scope_version") or
                         scope_version_default)
        mtype, help_ref, unit_ref = ts["metadata"]
        if unit_ref >= nsym:
            errors.append(f"unit ref {unit_ref} is out of bounds "
                          "of symbolsTable")
            continue
        if help_ref >= nsym:
            errors.append(f"help ref {help_ref} is out of bounds "
                          "of symbolsTable")
            continue
        unit = symbols[unit_ref]
        description = symbols[help_ref]

        ns, svc, inst = _parse_job_and_instance(job, instance)
        rentry = resources.setdefault(rkey, [0, {}])
        attrs = sorted((k, v) for k, v in lmap.items()
                       if k not in _EXCLUDED_ATTR)

        base = {
            "service_namespace": ns, "service_name": svc,
            "service_instance_id": inst,
            "scope_name": scope_name, "scope_version": scope_version,
            "name": name, "unit": unit, "description": description,
            "attributes": attrs,
            "value_double": None, "start_time_ns": None,
            "time_ns": None, "scale": None, "zero_threshold": None,
            "zero_count": None, "count": None, "sum": None,
            "positive_offset": None, "positive_buckets": None,
            "negative_offset": None, "negative_buckets": None,
            "explicit_bounds": None, "bucket_counts": None,
            "no_recorded_value": False,
        }

        if mtype == MT_HISTOGRAM:
            if ts["samples"]:
                continue  # classic histogram series are dropped (:397)
            for h in ts["histograms"]:
                if h["reset_hint"] == RESET_HINT_GAUGE:
                    continue
                if h["schema"] == -53:
                    hkind = "nhcb"
                elif -4 <= h["schema"] <= 8:
                    hkind = "exponential"
                else:
                    continue  # invalid schema
                mid = (rkey, rentry[0], scope_name, scope_version,
                       name, unit, mtype, hkind)
                if mid not in metric_desc:
                    metric_desc[mid] = description
                elif len(metric_desc[mid]) < len(description):
                    metric_desc[mid] = description
                if hkind == "nhcb":
                    if not h["custom_values"]:
                        continue
                    row = dict(base)
                    row["mtype"] = "histogram"
                    row["start_time_ns"] = (ts["created_timestamp"] *
                                            1_000_000)
                    row["time_ns"] = h["timestamp"] * 1_000_000
                    if is_stale_nan(h["sum"]):
                        row["no_recorded_value"] = True
                    else:
                        row["sum"] = h["sum"]
                        row["count"] = int(h["count"]) & _U64
                    row["explicit_bounds"] = list(h["custom_values"])
                    row["bucket_counts"] = _convert_nhcb_buckets(h)
                else:
                    if _has_negative_counts(h):
                        continue
                    row = dict(base)
                    row["mtype"] = "exponential_histogram"
                    row["start_time_ns"] = (ts["created_timestamp"] *
                                            1_000_000)
                    row["time_ns"] = h["timestamp"] * 1_000_000
                    row["scale"] = h["schema"]
                    row["zero_threshold"] = h["zero_threshold"]
                    row["sum"] = h["sum"]
                    row["count"] = int(h["count"]) & _U64
                    row["zero_count"] = int(h["zero_count"]) & _U64
                    if h["count_kind"] == "float":
                        if h["positive_spans"]:
                            row["positive_offset"] = (
                                h["positive_spans"][0][0] - 1)
                            row["positive_buckets"] = (
                                _convert_absolute_buckets(
                                    h["positive_spans"],
                                    h["positive_counts"]))
                        if h["negative_spans"]:
                            row["negative_offset"] = (
                                h["negative_spans"][0][0] - 1)
                            row["negative_buckets"] = (
                                _convert_absolute_buckets(
                                    h["negative_spans"],
                                    h["negative_counts"]))
                    else:
                        if h["positive_spans"]:
                            row["positive_offset"] = (
                                h["positive_spans"][0][0] - 1)
                            row["positive_buckets"] = (
                                _convert_delta_buckets(
                                    h["positive_spans"],
                                    h["positive_deltas"]))
                        if h["negative_spans"]:
                            row["negative_offset"] = (
                                h["negative_spans"][0][0] - 1)
                            row["negative_buckets"] = (
                                _convert_delta_buckets(
                                    h["negative_spans"],
                                    h["negative_deltas"]))
                metric_rows.setdefault(mid, []).append(len(rows))
                rows.append(row)
            continue

        if mtype == MT_SUMMARY:
            continue  # summaries dropped silently (:358-360)
        if mtype not in (MT_GAUGE, MT_COUNTER):
            errors.append(f"unsupported metric type {mtype} for "
                          f'metric "{name}"')
            continue

        mid = (rkey, rentry[0], scope_name, scope_version, name, unit,
               mtype)
        if mid not in metric_desc:
            metric_desc[mid] = description
        elif len(metric_desc[mid]) < len(description):
            metric_desc[mid] = description
        for value, tstamp in ts["samples"]:
            row = dict(base)
            row["mtype"] = "gauge" if mtype == MT_GAUGE else "sum"
            row["start_time_ns"] = ts["created_timestamp"] * 1_000_000
            row["time_ns"] = tstamp * 1_000_000
            row["value_double"] = value
            metric_rows.setdefault(mid, []).append(len(rows))
            rows.append(row)

    if errors:
        return None, "; ".join(errors)

    # longest-description wins across each metric identity (:366-370)
    for mid, idxs in metric_rows.items():
        for i in idxs:
            rows[i]["description"] = metric_desc[mid]
    # stamp final per-(job,instance) target_info extras (the rm is
    # shared by pointer in the reference, so arrival order within the
    # request doesn't matter)
    for mid, idxs in metric_rows.items():
        extras = resources.get(mid[0], [0, {}])[1]
        ex = sorted(extras.items())
        for i in idxs:
            rows[i]["resource_attrs"] = ex
    return rows, None


_OUT_FIELDS = [
    ("service_namespace", pa.string()), ("service_name", pa.string()),
    ("service_instance_id", pa.string()),
    ("resource_attrs", pa.map_(pa.string(), pa.string())),
    ("scope_name", pa.string()), ("scope_version", pa.string()),
    ("name", pa.string()), ("unit", pa.string()),
    ("description", pa.string()), ("mtype", pa.string()),
    ("start_time_ns", pa.int64()), ("time_ns", pa.int64()),
    ("value_double", pa.float64()),
    ("attributes", pa.map_(pa.string(), pa.string())),
    ("scale", pa.int32()), ("zero_threshold", pa.float64()),
    ("zero_count", pa.int64()), ("count", pa.int64()),
    ("sum", pa.float64()),
    ("positive_offset", pa.int32()),
    ("positive_buckets", pa.list_(pa.int64())),
    ("negative_offset", pa.int32()),
    ("negative_buckets", pa.list_(pa.int64())),
    ("explicit_bounds", pa.list_(pa.float64())),
    ("bucket_counts", pa.list_(pa.int64())),
    ("no_recorded_value", pa.bool_()),
]


class PrwDecode:
    """writev2 request bytes column → flat datapoint rows.

    ``on_error="drop"`` mirrors handlePRW's 400: the whole request
    contributes zero rows when any series is invalid."""

    def __init__(self, body_col="body", id_cols=("doc_id",),
                 scope_name_default="", scope_version_default="",
                 on_error="drop"):
        self.body_col = body_col
        self.id_cols = tuple(id_cols)
        self.scope_name_default = scope_name_default
        self.scope_version_default = scope_version_default
        self.on_error = on_error

    def __call__(self, tab: pa.Table) -> pa.Table:
        bodies = tab.column(self.body_col).to_pylist()
        out_idx: list[int] = []
        out_rows: list[dict] = []
        for i, buf in enumerate(bodies):
            rows, err = translate_v2_request(
                buf or b"",
                scope_name_default=self.scope_name_default,
                scope_version_default=self.scope_version_default)
            if err is not None:
                if self.on_error == "raise":
                    raise ValueError(err)
                continue
            for r in rows:
                out_idx.append(i)
                out_rows.append(r)
        idx = pa.array(np.asarray(out_idx, np.int64), pa.int64())
        data = {c: tab.column(c).take(idx) for c in self.id_cols}

        def as_i64(v):
            # uint64 counts land in a signed arrow column; wrap like Go
            if v is None:
                return None
            if isinstance(v, list):
                return [x - (1 << 64) if x > _I64 else x for x in v]
            return v - (1 << 64) if v > _I64 else v

        wrap = {"count", "zero_count", "positive_buckets",
                "negative_buckets", "bucket_counts"}
        for cname, ctype in _OUT_FIELDS:
            vals = [r[cname] for r in out_rows]
            if cname in wrap:
                vals = [as_i64(v) for v in vals]
            data[cname] = pa.array(vals, ctype)
        return pa.table(data)


def parse_prometheus_remote_write(ds, body_col: str = "body", *,
                                  id_cols=("doc_id",),
                                  scope_name_default: str = "",
                                  scope_version_default: str = "",
                                  on_error: str = "drop"):
    """Decode PRW 2.0 (writev2) request payloads into flat OTel metric
    datapoint rows — one row per sample / native-histogram point."""
    return ds.map_batches(
        PrwDecode(body_col, id_cols, scope_name_default,
                  scope_version_default, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
