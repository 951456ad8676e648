"""Fluent Forward protocol decode parity
(receiver/fluentforwardreceiver/conversion.go, timeext.go)."""

import gzip
import struct

import msgpack
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.fluentforward import (
    decode_fluent_event,
    parse_fluent_events,
)


def ext_time(secs, nanos):
    return msgpack.ExtType(0, struct.pack(">II", secs, nanos))


def ok(ev):
    res = decode_fluent_event(msgpack.packb(ev))
    assert not isinstance(res, str), res
    return res


def test_message_mode():
    mode, chunk, rows = ok(["t1", 5, {"message": "hello", "a": 1}])
    assert mode == "message" and chunk is None
    assert rows == [{"time_ns": 5_000_000_000, "body": "hello",
                     "attrs": [("a", "1"), ("fluent.tag", "t1")]}]


def test_message_mode_log_key_and_options():
    mode, chunk, rows = ok(["t", 5, {"log": "x"}, {"chunk": "abc"}])
    assert chunk == "abc"
    assert rows[0]["body"] == "x"


def test_forward_mode_multiple_entries():
    mode, _, rows = ok(["t", [[1, {"message": "a"}],
                              [2, {"message": "b"}]]])
    assert mode == "forward"
    assert [r["body"] for r in rows] == ["a", "b"]
    assert [r["time_ns"] for r in rows] == [10**9, 2 * 10**9]


def test_event_time_ext():
    _, _, rows = ok(["t", [[ext_time(7, 123456789), {"log": "x"}]]])
    assert rows[0]["time_ns"] == 7 * 10**9 + 123_456_789


def test_packedforward_plain_and_gzip():
    entries = (msgpack.packb([1, {"message": "p1"}]) +
               msgpack.packb([2, {"log": "p2"}]))
    mode, _, rows = ok(["t", entries])
    assert mode == "packedforward"
    assert [r["body"] for r in rows] == ["p1", "p2"]
    mode, _, rows2 = ok(["t", gzip.compress(entries),
                         {"compressed": "gzip"}])
    assert [r["body"] for r in rows2] == ["p1", "p2"]


def test_value_typing():
    _, _, rows = ok(["t", 1, {"message": "m", "i": -3, "u": 2**40,
                              "f": 2.5, "b": True, "s": "x",
                              "by": b"raw", "n": None,
                              "lst": [1, "a"], "mp": {"k": 1}}])
    attrs = dict(rows[0]["attrs"])
    assert attrs["i"] == "-3" and attrs["u"] == str(2**40)
    assert attrs["f"] == "2.5" and attrs["b"] == "true"
    assert attrs["s"] == "x" and attrs["by"] == "raw"
    assert attrs["n"] == "<nil>"
    assert attrs["lst"] == "[1 a]" and attrs["mp"] == "map[k:1]"


def test_structured_body_canonical_json():
    _, _, rows = ok(["t", 1, {"message": {"z": 1, "a": "b"}}])
    assert rows[0]["body"] == '{"a":"b","z":1}'


def test_binary_map_keys():
    raw = msgpack.packb(["t", 1, {b"binkey": "v", "message": "m"}])
    _, _, rows = decode_fluent_event(raw)
    assert dict(rows[0]["attrs"])["binkey"] == "v"


def test_binary_tag():
    _, _, rows = ok([b"tagb", 1, {"message": "m"}])
    assert dict(rows[0]["attrs"])["fluent.tag"] == "tagb"


def test_errors():
    assert isinstance(decode_fluent_event(b"\x00garbage"), str)
    assert isinstance(decode_fluent_event(
        msgpack.packb("not an array")), str)
    assert isinstance(decode_fluent_event(
        msgpack.packb([5, 1, {}])), str)          # non-string tag
    assert isinstance(decode_fluent_event(
        msgpack.packb(["t", True, {}])), str)     # bool time
    assert isinstance(decode_fluent_event(
        msgpack.packb(["t", 1, {"m": 1}, {}, {}])), str)  # len 5
    assert isinstance(decode_fluent_event(
        msgpack.packb(["t", 1, "not a map"])), str)
    assert isinstance(decode_fluent_event(
        msgpack.packb(["t", [[1, {}, 3]]])), str)  # 3-elt entry
    # bad ext code
    bad = msgpack.packb(["t", msgpack.ExtType(7, b"12345678"), {}])
    assert isinstance(decode_fluent_event(bad), str)


def test_empty_forward_entries():
    mode, _, rows = ok(["t", []])
    assert mode == "forward" and rows == []


def test_stage_fanout(ray_session):
    import ray

    good = msgpack.packb(["t", [[1, {"message": "a"}],
                                [2, {"message": "b"}]]])
    bad = b"\xff\xff"
    ds = ray.data.from_arrow(pa.table({
        "event_msgpack": pa.array([good, bad], pa.binary()),
        "idx": pa.array([0, 1], pa.int64())}))
    out = parse_fluent_events(ds, "event_msgpack").to_pandas()
    assert list(out["idx"]) == [0, 0]
    kept = parse_fluent_events(ds, "event_msgpack",
                               on_error="keep").to_pandas()
    assert len(kept) == 3 and kept["error"].notna().sum() == 1
