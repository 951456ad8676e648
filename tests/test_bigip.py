"""bigipreceiver parity (receiver/bigipreceiver/scraper.go:140-303,
metadata.yaml) — golden-pinned on the combined stats fixtures vs
metrics_golden.yaml, plus the one-hot/derived vectors."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.bigip import (
    entity_to_rows,
)

REF = "/root/reference/receiver/bigipreceiver/testdata"

_RES_KEYS = {
    "virtual_server": (("bigip.virtual_server.name", "entity_name"),
                       ("bigip.virtual_server.destination",
                        "destination"),
                       ("bigip.pool.name", "pool_name")),
    "pool": (("bigip.pool.name", "entity_name"),),
    "pool_member": (("bigip.pool_member.name", "entity_name"),
                    ("bigip.pool_member.ip_address", "ip_address"),
                    ("bigip.pool.name", "pool_name")),
    "node": (("bigip.node.name", "entity_name"),
             ("bigip.node.ip_address", "ip_address")),
}


def _entities():
    out = []
    for kind, files in (
            ("virtual_server", ["virtual_servers_combined.json"]),
            ("pool", ["get_pools_stats_response.json"]),
            ("pool_member", ["pool_members_combined.json"]),
            ("node", ["get_nodes_stats_response.json"])):
        for f in files:
            data = json.load(open(os.path.join(REF, "apiresponses",
                                               f)))
            for stats in data["entries"].values():
                out.append((kind,
                            stats["nestedStats"]["entries"]))
    return out


def _golden():
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(
        REF, "expected_metrics", "metrics_golden.yaml")))
    out = {}
    for rm in exp["resourceMetrics"]:
        res = tuple(sorted(
            (a["key"], list(a["value"].values())[0])
            for a in rm["resource"]["attributes"]))
        dps = {}
        for m in rm["scopeMetrics"][0]["metrics"]:
            body = m.get("sum") or m.get("gauge")
            for dp in body["dataPoints"]:
                attrs = tuple(sorted(
                    (a["key"], list(a["value"].values())[0])
                    for a in dp.get("attributes", ())))
                dps[(m["name"], attrs)] = (
                    "sum" if "sum" in m else "gauge",
                    body.get("isMonotonic"), int(dp["asInt"]))
        out[res] = dps
    return out


def test_reference_golden():
    if not os.path.isdir(os.path.join(REF, "apiresponses")):
        pytest.skip("reference testdata not present")
    exp = _golden()
    act = {}
    for kind, entries in _entities():
        rows = entity_to_rows(json.dumps({"kind": kind,
                                          "entries": entries}))
        r0 = rows[0]
        res = tuple(sorted((key, r0[col])
                           for key, col in _RES_KEYS[kind]))
        dps = {}
        for r in rows:
            attrs = []
            # metadata name_override: all three *_status attrs render
            # as wire key "status"
            for col, key in (("direction", "direction"),
                             ("active_status", "status"),
                             ("availability_status", "status"),
                             ("enabled_status", "status")):
                if r[col] is not None:
                    attrs.append((key, r[col]))
            dps[(r["name"], tuple(sorted(attrs)))] = (
                r["mtype"], r["is_monotonic"], r["value_int"])
        act[res] = dps
    assert set(act) == set(exp), set(act) ^ set(exp)
    for res, dps_exp in exp.items():
        dps_act = act[res]
        assert set(dps_act) == set(dps_exp), (
            res, set(dps_act) ^ set(dps_exp))
        for k, (mt, mono, val) in dps_exp.items():
            amt, amono, aval = dps_act[k]
            assert amt == mt and bool(amono) == bool(mono), (res, k)
            assert aval == val, (res, k, aval, val)


def test_one_hot_and_derived():
    rows = entity_to_rows(json.dumps({"kind": "pool", "entries": {
        "tmName": {"description": "/Common/p1"},
        "memberCnt": {"value": 5},
        "activeMemberCnt": {"value": 2},
        "status.availabilityState":
            {"description": "offline (enabled)"},
        "status.enabledState": {"description": "disabled-by-parent"},
    }}))
    by = {(r["name"], r["active_status"], r["availability_status"],
           r["enabled_status"]): r["value_int"] for r in rows}
    assert by[("bigip.pool.member.count", "active", None, None)] == 2
    assert by[("bigip.pool.member.count", "inactive", None,
               None)] == 3
    # HasPrefix matching: "offline (enabled)" -> offline one-hot
    assert by[("bigip.pool.availability", None, "offline", None)] == 1
    assert by[("bigip.pool.availability", None, "available",
               None)] == 0
    # "disabled-by-parent" does NOT start with "enabled"
    assert by[("bigip.pool.enabled", None, None, "disabled")] == 1
    assert by[("bigip.pool.enabled", None, None, "enabled")] == 0
    # missing statuses: unknown / disabled (Go zero values)
    rows2 = entity_to_rows(json.dumps({"kind": "node", "entries": {
        "tmName": {"description": "n"}}}))
    by2 = {(r["name"], r["availability_status"], r["enabled_status"]):
           r["value_int"] for r in rows2}
    assert by2[("bigip.node.availability", "unknown", None)] == 1
    assert by2[("bigip.node.enabled", None, "disabled")] == 1
    # pool members get sessions + the name:port resource
    rows3 = entity_to_rows(json.dumps({"kind": "pool_member",
                                       "entries": {
        "nodeName": {"description": "/Common/n1"},
        "port": {"value": 8080},
        "curSessions": {"value": 4}}}))
    assert rows3[0]["entity_name"] == "/Common/n1:8080"
    assert any(r["name"] == "bigip.pool_member.session.count"
               and r["value_int"] == 4 for r in rows3)
