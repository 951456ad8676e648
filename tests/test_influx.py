"""influxdbreceiver analog: line-protocol decode parity.

Spec cases restate the public line-protocol v2 grammar the reference
decodes (receiver/influxdbreceiver/receiver.go:120-205); the naming
vector is the receiver's own test (receiver_test.go:52-86).
"""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.influx import (
    _F_BOOL,
    _F_DBL,
    _F_INT,
    _F_STR,
    decode_line,
    metric_name,
    parse_influx_batch,
)


def rows(lines, on_error="drop", precision="ns"):
    t = pa.table({"line": pa.array(lines, pa.string()),
                  "idx": pa.array(range(len(lines)), pa.int64())})
    return parse_influx_batch(t, "line", precision=precision,
                              on_error=on_error).to_pylist()


# ---------------------------------------------------------------------------
# decode_line — grammar


def test_basic_line():
    assert decode_line("cpu,host=a usage=0.5 123") == (
        "cpu", [("host", "a")], [("usage", _F_DBL, 0.5)], 123)


def test_no_tags_no_timestamp():
    assert decode_line("cpu usage=1i") == (
        "cpu", [], [("usage", _F_INT, 1)], None)


def test_measurement_escapes():
    meas, tags, fields, _ = decode_line("a\\ b\\,c,k=v f=1 1")
    assert meas == "a b,c"
    # backslash before a non-escapable char stays literal
    assert decode_line("a\\zb f=1")[0] == "a\\zb"


def test_tag_escapes():
    _, tags, _, _ = decode_line("m,k\\,1\\==v\\ 2 f=1")
    assert tags == [("k,1=", "v 2")]


def test_field_key_escapes():
    _, _, fields, _ = decode_line("m f\\ k=2i")
    assert fields == [("f k", _F_INT, 2)]


def test_string_field_escapes():
    _, _, fields, _ = decode_line('m f="a\\"b\\\\c,d e"')
    assert fields == [("f", _F_STR, 'a"b\\c,d e')]


def test_bool_spellings():
    for tok, want in [("t", True), ("T", True), ("true", True),
                      ("True", True), ("TRUE", True), ("f", False),
                      ("F", False), ("false", False), ("False", False),
                      ("FALSE", False)]:
        assert decode_line(f"m b={tok}") == (
            "m", [], [("b", _F_BOOL, want)], None)


def test_value_types():
    _, _, fields, _ = decode_line(
        'm a=1,b=-2i,c=3u,d=1.5e2,e="s",g=-0.25')
    assert fields == [("a", _F_DBL, 1.0), ("b", _F_INT, -2),
                      ("c", _F_INT, 3), ("d", _F_DBL, 150.0),
                      ("e", _F_STR, "s"), ("g", _F_DBL, -0.25)]


def test_int_range():
    assert decode_line(f"m v={2**63 - 1}i")[2] == [("v", _F_INT, 2**63 - 1)]
    assert decode_line(f"m v=-{2**63}i")[2] == [("v", _F_INT, -(2**63))]
    assert decode_line(f"m v={2**63}i") == "int field value out of range"
    assert decode_line(f"m v={2**63}u") == (
        "uint field value out of int64 range")


def test_multi_space_sections():
    assert decode_line("m,k=v   f=1   12") == (
        "m", [("k", "v")], [("f", _F_DBL, 1.0)], 12)
    assert decode_line("  m f=1") == ("m", [], [("f", _F_DBL, 1.0)], None)


def test_blank_and_comment():
    assert decode_line("") is None
    assert decode_line("   ") is None
    assert decode_line("# a comment") is None
    assert decode_line("   # indented") is None


def test_errors():
    assert decode_line(",k=v f=1") == "empty measurement"
    assert decode_line("m,=v f=1") == "invalid tag key"
    assert decode_line("m,k= f=1") == "empty tag value"
    assert decode_line("m,k=v") == "missing fields"
    assert decode_line("m") == "missing fields"
    assert decode_line("m f=") == "missing field value"
    assert decode_line("m f=nope") == "invalid field value"
    assert decode_line('m f="open') == "unterminated string field value"
    assert decode_line("m f=1 12x") == "trailing characters after timestamp"
    assert decode_line("m f=1 x") == "invalid timestamp"
    assert decode_line("m f=1 12 13") == (
        "trailing characters after timestamp")


def test_negative_timestamp():
    assert decode_line("m f=1 -5")[3] == -5


def test_literal_equals_in_tag_value():
    # '=' is a may-escape char in values; unescaped it reads literally
    assert decode_line("m,k=a=b f=1")[1] == [("k", "a=b")]


# ---------------------------------------------------------------------------
# batch parse — fan-out, naming, fast path ≡ scanner


def test_receiver_test_vector():
    out = rows(["cpu_temp,foo=bar gauge=87.332"])
    assert len(out) == 1
    r = out[0]
    assert r["name"] == "cpu_temp"
    assert r["metric_type"] == "gauge"
    assert r["value_double"] == pytest.approx(87.332)
    assert r["tags"] == [("foo", "bar")]


def test_naming_rules():
    assert metric_name("cpu", "gauge") == ("cpu", "gauge")
    assert metric_name("cpu", "counter") == ("cpu", "counter")
    assert metric_name("prometheus", "up") == ("up", "gauge")
    assert metric_name("prometheus", "gauge") == ("gauge", "gauge")
    assert metric_name("cpu", "usage") == ("cpu_usage", "gauge")


def test_fanout_order_and_dup_field_keys():
    out = rows(["m,k=v a=1,b=2i,a=9 5"])
    assert [(r["field_key"], r["value_double"], r["value_int"])
            for r in out] == [("b", None, 2), ("a", 9.0, None)]
    assert all(r["tags"] == [("k", "v")] for r in out)


def test_dup_tag_keys_last_wins():
    out = rows(["m,k=1,k=2 f=1"])
    assert out[0]["tags"] == [("k", "2")]


def test_precision_scaling():
    for prec, mult in [("ns", 1), ("us", 10**3), ("ms", 10**6),
                       ("s", 10**9), ("u", 10**3), ("n", 1)]:
        out = rows(["m f=1 7"], precision=prec)
        assert out[0]["timestamp_ns"] == 7 * mult


def test_on_error_keep_and_drop():
    lines = ["m f=1 1", ",bad f=1", "# c", ""]
    assert len(rows(lines)) == 1
    kept = rows(lines, on_error="keep")
    assert len(kept) == 2
    assert kept[1]["error"] == "empty measurement"
    assert kept[1]["name"] is None


def test_fast_path_equals_scanner():
    """Every non-error line's batch output must equal a per-line
    decode_line restatement (the fast path may not diverge)."""
    lines = [
        "cpu,host=h1 usage=0.5,load=3i 100",
        "mem used=12u",
        "prometheus up=t 5",
        "m,a=1,b=2 x=1,y=2.5,z=F 9",
        "m f=-3i -7",
        "srv counter=2 1",
        "one_field v=1e-3",
    ]
    got = rows(lines * 3)  # repeated: exercises dictionary paths
    exp = []
    for _ in range(3):
        for ln in lines:
            meas, tags, fields, ts = decode_line(ln)
            # dup-free here: emission order = occurrence order
            for k, code, v in fields:
                name, mtype = metric_name(meas, k)
                exp.append((meas, name, mtype, tuple(tags), k, code, v, ts))
    # batch output preserves input order, fan-out in occurrence order
    assert len(got) == len(exp)
    for r, (meas, name, mtype, tags, k, code, v, ts) in zip(got, exp):
        assert r["measurement"] == meas
        assert r["name"] == name
        assert r["metric_type"] == mtype
        assert tuple(r["tags"]) == tags
        assert r["field_key"] == k
        assert r["timestamp_ns"] == ts
        if code == _F_DBL:
            assert r["value_double"] == pytest.approx(v)
        elif code == _F_INT:
            assert r["value_int"] == v
        elif code == _F_BOOL:
            assert r["value_bool"] == v
        else:
            assert r["value_str"] == v


def test_slow_path_routing_matches_fast_semantics():
    # the same logical point spelled fast (no escapes) and slow (escaped)
    fast = rows(["m,dc=euw used=1i 5"])
    slow = rows(["m,dc=eu\\w used=1i 5"])  # backslash forces scanner
    assert fast[0]["value_int"] == slow[0]["value_int"] == 1
    assert fast[0]["tags"] == [("dc", "euw")]
    assert slow[0]["tags"] == [("dc", "eu\\w")]


def test_empty_batch_schema_stable():
    t = pa.table({"line": pa.array([], pa.string()),
                  "idx": pa.array([], pa.int64())})
    out = parse_influx_batch(t, "line")
    assert out.num_rows == 0
    assert set(out.column_names) >= {
        "measurement", "name", "metric_type", "tags", "field_key",
        "value_double", "value_int", "value_bool", "value_str",
        "timestamp_ns", "error"}


def test_all_comment_batch():
    assert rows(["# one", "", "   # two"]) == []


def test_scaled_timestamp_overflow_nulls():
    out = rows([f"m f=1 {2**62}"], precision="s")
    assert out[0]["timestamp_ns"] is None
