"""chronyreceiver parity (internal/chrony/types.go + scraper.go) —
the client_test.go binary fixture decoded byte-for-byte, binaryFloat
vectors, header error gates."""

import math
import struct

from opentelemetry_collector_contrib_ray.stages.chrony import (
    DEFAULT_ENABLED,
    METRICS,
    chrony_float,
    decode_tracking,
    pack_chrony_float,
    tracking_to_rows,
)


def _go_float(bf: int) -> float:
    """Literal restatement of types.go binaryFloat.Float for
    cross-checking."""
    x = bf & 0xFFFFFFFF
    exp = x >> 25
    if exp >= 1 << 6:
        exp -= 1 << 7
    exp -= 25
    coef = x % (1 << 25)
    if coef >= 1 << 24:
        coef -= 1 << 25
    return float(coef) * math.pow(2.0, float(exp))


def _reply(status=0, reply=5, stratum=10, leap=0, floats=None):
    head = struct.pack(">BBBBHHHHHHIII", 6, 0, 0, 0, 0, reply, status,
                       0, 0, 0, 0, 0, 0)
    f = floats or [1300, 10000, 12000, 3300, 123456, 9943, -1220,
                   -1100000, 120]
    ip = bytes([127, 0, 0, 1]) + bytes(12)
    content = struct.pack(">I16sHHHHIII9i", 100, ip, 1, 0, stratum,
                          leap, 100, 10, 0, *f)
    return head + content


def test_client_test_binary_fixture():
    t = decode_tracking(_reply())
    assert t is not None
    assert t["ref_id"] == 100
    assert t["ip"] == bytes([127, 0, 0, 1])
    assert t["stratum"] == 10
    assert t["ref_time_unix"] == (100 << 32 | 10, 0)
    for field, bf in (("current_correction", 1300),
                      ("last_offset", 10000), ("rms_offset", 12000),
                      ("freq_ppm", 3300), ("resid_freq_ppm", 123456),
                      ("skew_ppm", 9943), ("root_delay", -1220),
                      ("root_dispersion", -1100000),
                      ("last_update_interval", 120)):
        assert t[field] == _go_float(bf), field


def test_binary_float_vectors_and_pack_roundtrip():
    for bf in (0, 1, -1, 1300, -1220, 123456, -1100000, 2**31 - 1,
               -(2**31), 0x7FFFFFF, 0x8000000):
        assert chrony_float(bf) == _go_float(bf), bf
    # fixture helper: value = coef * 2**exp exactly
    assert chrony_float(pack_chrony_float(999, -10)) == 999 / 1024.0
    assert chrony_float(pack_chrony_float(1, 0)) == 1.0


def test_rows_gates_and_enum():
    rows = tracking_to_rows(_reply(leap=3), enabled={n for n, *_ in
                                                     METRICS})
    assert len(rows) == 7
    by = {r["name"]: r for r in rows}
    assert by["ntp.stratum"]["value_int"] == 10
    assert by["ntp.stratum"]["leap_status"] is None
    assert by["ntp.skew"]["leap_status"] is None
    assert by["ntp.time.correction"]["leap_status"] == "unsynchronised"
    assert all(r["mtype"] == "gauge"
               and r["aggregation_temporality"] == 0 for r in rows)
    # default set
    assert {r["name"] for r in tracking_to_rows(_reply())} == \
        DEFAULT_ENABLED
    # whole-scrape failures: bad status / wrong reply code / short
    assert tracking_to_rows(_reply(status=1)) == []
    assert tracking_to_rows(_reply(reply=4)) == []
    assert tracking_to_rows(b"\x00" * 10) == []
