"""memcachedreceiver parity (receiver/memcachedreceiver/scraper.go,
metadata.yaml) — golden-pinned on testdata/fake_stats.json vs
testdata/scraper/expected.yaml, incl. the swapped-parameter hit-ratio
quirk (the emitted 'hit ratio' is the MISS percentage)."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.memcached import (
    calculate_hit_ratio,
    parse_stats_page,
    stats_to_rows,
)

REF = "/root/reference/receiver/memcachedreceiver/testdata"


def _golden():
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(REF, "scraper",
                                           "expected.yaml")))
    dps = {}
    for rm in exp["resourceMetrics"]:
        for m in rm["scopeMetrics"][0]["metrics"]:
            body = m.get("sum") or m.get("gauge")
            for dp in body["dataPoints"]:
                attrs = tuple(sorted(
                    (a["key"], list(a["value"].values())[0])
                    for a in dp.get("attributes", ())))
                val = (int(dp["asInt"]) if "asInt" in dp
                       else float(dp["asDouble"]))
                dps[(m["name"], attrs)] = (
                    "sum" if "sum" in m else "gauge",
                    body.get("isMonotonic"), val)
    return dps


def test_reference_golden():
    if not os.path.exists(os.path.join(REF, "fake_stats.json")):
        pytest.skip("reference testdata not present")
    fake = json.load(open(os.path.join(REF, "fake_stats.json")))
    (server_stats,) = fake.values()
    stats = server_stats["Stats"]
    # feed through the wire-page form to cover parse_stats_page too
    page = "".join(f"STAT {k} {v}\r\n" for k, v in stats.items()) + "END\r\n"
    rows = stats_to_rows(parse_stats_page(page))
    act = {}
    for r in rows:
        attrs = []
        for col, key in (("command", "command"),
                         ("direction", "direction"),
                         ("op_type", "type"), ("operation", "operation"),
                         ("state", "state")):
            if r[col] is not None:
                attrs.append((key, r[col]))
        act[(r["name"], tuple(sorted(attrs)))] = (
            r["mtype"], r["is_monotonic"],
            r["value_int"] if r["value_int"] is not None
            else r["value_double"])
    exp = _golden()
    assert set(act) == set(exp), set(act) ^ set(exp)
    for key, (mt, mono, val) in exp.items():
        amt, amono, aval = act[key]
        assert amt == mt and bool(amono) == bool(mono), key
        assert aval == pytest.approx(val, rel=0, abs=0), (key, aval, val)


def test_hit_ratio_swapped_args_quirk():
    # call convention is calculate_hit_ratio(hits, misses) landing in
    # (misses, hits): 1119 hits / 1120 misses -> 50.02233139794551
    assert calculate_hit_ratio(1119, 1120) == 1120 / 2239 * 100
    assert calculate_hit_ratio(0, 0) == 0.0


def test_ratio_requires_both_keys_and_parse_drops():
    rows = stats_to_rows({"get_hits": "10"})  # no get_misses
    assert all(r["name"] != "memcached.operation_hit_ratio"
               for r in rows)
    # unparseable value: the datapoint is dropped, others survive
    rows = stats_to_rows({"bytes": "abc", "threads": "4",
                          "rusage_user": "1.5",
                          "incr_hits": "1", "incr_misses": "x"})
    names = {r["name"] for r in rows}
    assert "memcached.bytes" not in names
    assert "memcached.threads" in names
    assert "memcached.operation_hit_ratio" not in names
    # Go strconv rejects what Python tolerates
    assert stats_to_rows({"threads": " 4"}) == []
    assert stats_to_rows({"threads": "1_0"}) == []


def test_page_parse():
    page = "STAT a 1\r\nGARBAGE\r\nSTAT b two words\r\nEND\r\nSTAT c 3\r\n"
    assert parse_stats_page(page) == {"a": "1"}  # stops at END, 3-field only
