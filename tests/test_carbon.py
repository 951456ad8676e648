"""carbonreceiver plaintext parse — parity with a literal restatement of
PathParserHelper.Parse (path_parser_helper.go:92-147) +
PlaintextPathParser.ParsePath (plaintext_parser.go:40-71)."""

import math

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.carbon import (
    parse_carbon_batch,
)


def _go_parse(line):
    parts = line.split(" ", 3)
    if len(parts) != 3:
        return "invalid carbon metric"
    path, valstr, tsstr = parts
    # ParsePath
    p = path.split(";", 1)
    if p[0] == "":
        return "empty metric name extracted from path"
    name = p[0]
    tags = {}
    if len(p) == 2 and p[1] != "":
        for tag in p[1].split(";"):
            idx = tag.find("=")
            if idx < 1:
                return "incorrect key value separator"
            tags[tag[:idx]] = tag[idx + 1:]
    # timestamp: int then float
    ts_s = ts_ns = 0
    try:
        ts_s = int(tsstr)
        if not (-2**63 <= ts_s < 2**63):
            raise ValueError
        if not tsstr.lstrip("+-").isdigit():
            raise ValueError
    except ValueError:
        try:
            f = float(tsstr)
            frac, sec = math.modf(f)
            ts_s, ts_ns = int(sec), int(frac * 1e9)
        except ValueError:
            return "invalid carbon metric time"
    # value: int then float
    vi = vd = None
    try:
        if not valstr.lstrip("+-").isdigit() or valstr in ("+", "-"):
            raise ValueError
        vi = int(valstr)
        if not (-2**63 <= vi < 2**63):
            vi = None
            raise ValueError
    except ValueError:
        try:
            vd = float(valstr)
        except ValueError:
            return "invalid carbon metric value"
    return {"name": name, "tags": tags, "value_int": vi,
            "value_double": vd, "timestamp_s": ts_s,
            "timestamp_extra_ns": ts_ns}


LINES = [
    "cpu.usage 42 1700000000",
    "cpu.usage 42.5 1700000000",
    "cpu.usage -7 1700000000.25",
    "mem;host=h1;dc=eu 3 1700000001",
    "mem;host=h1;host=h2 3 1700000001",     # dup key: last wins
    "mem;k= 3 1700000001",                  # empty tag value OK
    "mem; 3 1700000001",                    # empty tag section OK
    "mem;=v 3 1700000001",                  # empty key -> error
    "mem;kv 3 1700000001",                  # no '=' -> error
    ";a=1 3 1700000001",                    # empty name -> error
    "a b",                                  # 2 fields -> error
    "a 1 2 3",                              # 4 fields -> error
    "a  1 2",                               # double space -> 4 parts error
    "m abc 17",                             # bad value
    "m 1 abc",                              # bad time
    "m 1e3 1700000000",                     # scientific -> double
    "m +5 1700000000",                      # signed int
    "m 99999999999999999999 1700000000",    # int64 overflow -> double
]


def test_parse_matches_go_restatement():
    tbl = pa.table({"line": pa.array(LINES)})
    out = parse_carbon_batch(tbl, "line").to_pylist()
    for line, g in zip(LINES, out):
        e = _go_parse(line)
        if isinstance(e, str):
            assert g["error"] == e, (line, g["error"], e)
            continue
        assert g["error"] is None, (line, g["error"])
        assert g["name"] == e["name"], line
        assert dict(g["tags"]) == e["tags"], line
        assert g["value_int"] == e["value_int"], line
        if e["value_double"] is None:
            assert g["value_double"] is None, line
        else:
            assert g["value_double"] == pytest.approx(e["value_double"])
        assert g["timestamp_s"] == e["timestamp_s"], line
        assert g["timestamp_extra_ns"] == pytest.approx(
            e["timestamp_extra_ns"], abs=1), line


def test_drop_mode(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.carbon import (
        parse_carbon,
    )

    ds = ray.data.from_items([{"line": ln} for ln in LINES]).repartition(3)
    out = parse_carbon(ds, "line").take_all()
    expected_ok = [ln for ln in LINES
                   if not isinstance(_go_parse(ln), str)]
    assert len(out) == len(expected_ok)
    assert {r["name"] for r in out} <= {"cpu.usage", "mem", "m"}
