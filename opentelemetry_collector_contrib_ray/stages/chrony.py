"""chronyreceiver analog: chronyd binary tracking replies → the
7-metric ntp.* table.

Parity with receiver/chronyreceiver (scraper.go:31-68,
internal/chrony/types.go:47-181 — itself a cited port of the public
facebook/time chrony packet codec; the wire layout is chrony's public
candm.h protocol):

- reply = a 28-byte big-endian header (version, pkt_type, res1/res2,
  command u16, reply u16, status u16, pad1..3 u16, sequence u32,
  pad4/5 u32) followed by the tracking content: RefID u32, ipAddr
  (16-byte IP + family u16 + pad u16), Stratum u16, LeapStatus u16,
  timeSpec (sec_high/sec_low/nsec u32 — sec_high 0x7fffffff means a
  32-bit timestamp), then nine chrony binaryFloats.  A non-zero
  status or a reply code ≠ 5 fails the WHOLE scrape
  (types.go:150-158); the UDP/unixgram session is ingest transport.
- binaryFloat (types.go:97-115): a packed int32 with a 7-bit
  two's-complement exponent (top bits) and 25-bit two's-complement
  coefficient; value = coef × 2^(exp−25).
- metrics (scraper.go:39-65): ntp.stratum int Gauge; time.correction/
  time.last_offset/time.rms_offset/frequency.offset/time.root_delay
  double Gauges with the leap.status attr = enum(LeapStatus+1) →
  normal/insert_second/delete_second/unsynchronised; ntp.skew double
  Gauge without the attr.  Default-enabled set = skew + correction +
  last_offset (metadata.yaml).

Execution: per-reply binary decode task map (7 rows per reply),
block-local, zero shuffle.
"""

from __future__ import annotations

import struct

import pyarrow as pa

_FLOAT_EXP_BITS = 7
_FLOAT_COEF_BITS = 32 - _FLOAT_EXP_BITS  # 25

LEAP_STATUS = ("normal", "insert_second", "delete_second",
               "unsynchronised")

# name -> (default_enabled, has leap attr, field)
METRICS = (
    ("ntp.stratum", False, False, "stratum"),
    ("ntp.time.correction", True, True, "current_correction"),
    ("ntp.time.last_offset", True, True, "last_offset"),
    ("ntp.time.rms_offset", False, True, "rms_offset"),
    ("ntp.frequency.offset", False, True, "freq_ppm"),
    ("ntp.skew", True, False, "skew_ppm"),
    ("ntp.time.root_delay", False, True, "root_delay"),
)

DEFAULT_ENABLED = frozenset(n for n, d, _a, _f in METRICS if d)

_HEAD = struct.Struct(">BBBBHHHHHHIII")
_CONTENT = struct.Struct(">I16sHHHHIII9i")


def chrony_float(x: int) -> float:
    """types.go binaryFloat.Float — 7-bit exp / 25-bit coef, both
    two's complement."""
    x &= 0xFFFFFFFF
    exp = x >> _FLOAT_COEF_BITS
    if exp >= 1 << (_FLOAT_EXP_BITS - 1):
        exp -= 1 << _FLOAT_EXP_BITS
    exp -= _FLOAT_COEF_BITS
    coef = x % (1 << _FLOAT_COEF_BITS)
    if coef >= 1 << (_FLOAT_COEF_BITS - 1):
        coef -= 1 << _FLOAT_COEF_BITS
    return float(coef) * 2.0 ** exp


def pack_chrony_float(coef: int, exp: int) -> int:
    """Inverse helper for fixtures: value = coef * 2**exp."""
    return (((exp + _FLOAT_COEF_BITS) & 0x7F) << _FLOAT_COEF_BITS) \
        | (coef & ((1 << _FLOAT_COEF_BITS) - 1))


def decode_tracking(data: bytes) -> dict | None:
    """newTrackingData (types.go:144-181): header checks + content
    decode; None = the whole scrape errors."""
    if len(data) < _HEAD.size + _CONTENT.size:
        return None
    (_v, _pt, _r1, _r2, _cmd, reply, status, _p1, _p2, _p3, _seq,
     _p4, _p5) = _HEAD.unpack_from(data, 0)
    if status != 0 or reply != 5:
        return None
    (ref_id, ip_raw, family, _pad, stratum, leap, sec_high, sec_low,
     nsec, *floats) = _CONTENT.unpack_from(data, _HEAD.size)
    high = 0 if sec_high == 0x7FFFFFFF else sec_high
    names = ("current_correction", "last_offset", "rms_offset",
             "freq_ppm", "resid_freq_ppm", "skew_ppm", "root_delay",
             "root_dispersion", "last_update_interval")
    out = {"ref_id": ref_id,
           "ip": ip_raw[:4] if family == 1 else ip_raw,
           "stratum": stratum, "leap_status": leap,
           "ref_time_unix": (high << 32 | sec_low, nsec)}
    for n, f in zip(names, floats):
        out[n] = chrony_float(f)
    return out


def tracking_to_rows(data: bytes, *, enabled=None,
                     now_ns: int = 0) -> list[dict]:
    en = DEFAULT_ENABLED if enabled is None else set(enabled)
    t = decode_tracking(data)
    if t is None:
        return []
    leap = LEAP_STATUS[t["leap_status"]] \
        if 0 <= t["leap_status"] < 4 else ""
    rows = []
    for name, _d, has_leap, field in METRICS:
        if name not in en:
            continue
        rows.append({
            "name": name, "mtype": "gauge", "is_monotonic": None,
            "aggregation_temporality": 0,
            "value_int": (int(t[field]) if name == "ntp.stratum"
                          else None),
            "value_double": (None if name == "ntp.stratum"
                             else t[field]),
            "leap_status": leap if has_leap else None,
            "time_unix_nano": now_ns})
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("leap_status", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseChrony:
    def __init__(self, doc_col, enabled, now_ns):
        self.doc_col = doc_col
        self.enabled = enabled
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in tracking_to_rows(doc or b"",
                                        enabled=self.enabled,
                                        now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_chrony(ds, doc_col: str = "reply", *, enabled_metrics=None,
                 now_ns: int = 0):
    """chronyd binary tracking replies → ntp.* metric rows."""
    return ds.map_batches(
        _ParseChrony(doc_col,
                     None if enabled_metrics is None
                     else tuple(enabled_metrics), now_ns),
        batch_format="pyarrow", zero_copy_batch=True)
