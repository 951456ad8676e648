"""riakreceiver parity (receiver/riakreceiver/scraper.go, model.go,
metadata.yaml) — golden-pinned on get_stats_response.json vs
expected.yaml."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.riak import (
    riak_stats_to_rows,
)

REF = "/root/reference/receiver/riakreceiver/testdata"


def test_reference_golden():
    resp = os.path.join(REF, "apiresponses", "get_stats_response.json")
    if not os.path.exists(resp):
        pytest.skip("reference testdata not present")
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(REF, "scraper",
                                           "expected.yaml")))
    (rm,) = exp["resourceMetrics"]
    res = {a["key"]: list(a["value"].values())[0]
           for a in rm["resource"]["attributes"]}
    edps = {}
    for m in rm["scopeMetrics"][0]["metrics"]:
        body = m.get("sum") or m.get("gauge")
        for dp in body["dataPoints"]:
            attrs = tuple(sorted(
                (a["key"], list(a["value"].values())[0])
                for a in dp.get("attributes", ())))
            edps[(m["name"], attrs)] = (
                "sum" if "sum" in m else "gauge",
                body.get("isMonotonic"), int(dp["asInt"]))
    rows = riak_stats_to_rows(open(resp).read())
    assert rows and rows[0]["node_name"] == res["riak.node.name"]
    act = {}
    for r in rows:
        attrs = []
        if r["request"] is not None:
            attrs.append(("request", r["request"]))
        if r["operation"] is not None:
            attrs.append(("operation", r["operation"]))
        act[(r["name"], tuple(sorted(attrs)))] = (
            r["mtype"], r["is_monotonic"], r["value_int"])
    assert set(act) == set(edps), set(act) ^ set(edps)
    for k, (mt, mono, val) in edps.items():
        amt, amono, aval = act[k]
        assert amt == mt and bool(amono) == bool(mono) and aval == val, k


def test_go_int64_unmarshal_semantics():
    base = {"nodename": "n@h", "node_gets": 1}
    assert len(riak_stats_to_rows(json.dumps(base))) == 11
    # integral float is fine, fractional fails the WHOLE scrape
    assert len(riak_stats_to_rows(json.dumps(
        {**base, "node_puts": 2.0}))) == 11
    assert riak_stats_to_rows(json.dumps(
        {**base, "node_puts": 2.5})) == []
    assert riak_stats_to_rows(json.dumps(
        {**base, "mem_allocated": "1000"})) == []
    assert riak_stats_to_rows(json.dumps(
        {**base, "vnode_gets": True})) == []
    # missing fields read 0; undecodable body is a whole-scrape error
    rows = riak_stats_to_rows(json.dumps({"nodename": "n@h"}))
    assert all(r["value_int"] == 0 for r in rows)
    assert riak_stats_to_rows("nope") == []
