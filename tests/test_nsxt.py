"""nsxtreceiver parity (receiver/nsxtreceiver/scraper.go, model,
metadata.yaml) — golden-pinned on the full fixture tree (transport +
cluster nodes, per-node status + interfaces) vs expected_metrics.yaml,
incl. the node.type inconsistency and derived success/available/
utilization math."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.nsxt import node_to_rows

REF = "/root/reference/receiver/nsxtreceiver/testdata/metrics"


def _node_docs():
    docs = []
    tn = json.load(open(os.path.join(REF, "transport_nodes.json")))
    for n in tn["results"]:
        docs.append(_assemble(n, "transport",
                              os.path.join(REF, "nodes", "transport",
                                           n["id"])))
    cn = json.load(open(os.path.join(REF, "cluster_nodes.json")))
    for n in cn["results"]:
        if "controller_role" in n:  # scraper.go:108 skips controllers
            continue
        docs.append(_assemble(n, "manager",
                              os.path.join(REF, "nodes", "cluster",
                                           n["id"])))
    return docs


def _assemble(n, cls, base):
    status = json.load(open(os.path.join(base, "status.json")))
    interfaces = []
    idx_path = os.path.join(base, "interfaces", "index.json")
    if os.path.exists(idx_path):
        for r in json.load(open(idx_path))["results"]:
            iid = r["interface_id"]
            stats = json.load(open(os.path.join(
                base, "interfaces", iid, "stats.json")))
            interfaces.append({"interface_id": iid, "stats": stats})
    return {"node": {"id": n["id"], "name": n["display_name"],
                     "resource_type": n["resource_type"]},
            "class": cls, "status": status, "interfaces": interfaces}


def _golden():
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(REF,
                                           "expected_metrics.yaml")))
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
                val = (int(dp["asInt"]) if "asInt" in dp
                       else float(dp["asDouble"]))
                dps[(m["name"], attrs)] = (
                    "sum" if "sum" in m else "gauge",
                    body.get("isMonotonic"), val)
        out[res] = dps
    return out


def test_reference_golden():
    if not os.path.isdir(REF):
        pytest.skip("reference testdata not present")
    exp = _golden()
    act = {}
    for doc in _node_docs():
        rows = node_to_rows(json.dumps(doc))
        by_res = {}
        for r in rows:
            res = [("nsxt.node.name", r["node_name"]),
                   ("nsxt.node.id", r["node_id"]),
                   ("nsxt.node.type", r["node_type"])]
            if r["device_id"] is not None:
                res.append(("device.id", r["device_id"]))
            res = tuple(sorted(res))
            attrs = []
            for col, key in (("direction", "direction"),
                             ("packet_type", "type"),
                             ("cpu_class", "class"),
                             ("disk_state", "state")):
                if r[col] is not None:
                    attrs.append((key, r[col]))
            by_res.setdefault(res, {})[
                (r["name"], tuple(sorted(attrs)))] = (
                r["mtype"], r["is_monotonic"],
                r["value_int"] if r["value_int"] is not None
                else r["value_double"])
        for res, dps in by_res.items():
            act[res] = dps
    assert set(act) == set(exp), set(act) ^ set(exp)
    for res, dps_exp in exp.items():
        dps_act = act[res]
        assert set(dps_act) == set(dps_exp), (
            res, set(dps_act) ^ set(dps_exp))
        for k, (mt, mono, val) in dps_exp.items():
            amt, amono, aval = dps_act[k]
            assert amt == mt and bool(amono) == bool(mono), (res, k)
            assert aval == pytest.approx(val, rel=1e-12), (res, k,
                                                           aval, val)


def test_derived_math_and_gates():
    doc = {"node": {"id": "n1", "name": "node-1",
                    "resource_type": "TransportNode"},
           "class": "transport",
           "status": {"node_status": {"system_status": {
               "cpu_usage": {"avg_cpu_core_usage_dpdk": 1.5,
                             "avg_cpu_core_usage_non_dpdk": 2.5},
               "mem_used": 100, "mem_cache": 7,
               "disk_space_used": 30, "disk_space_total": 0}}},
           "interfaces": [
               {"interface_id": "eth0",
                "stats": {"rx_packets": 10, "rx_dropped": 3,
                          "rx_errors": 9, "tx_packets": 5,
                          "tx_bytes": 77, "rx_bytes": 88}},
               {"interface_id": "broken", "stats": None},
           ]}
    rows = node_to_rows(json.dumps(doc))
    by = {(r["name"], r["direction"], r["packet_type"],
           r["disk_state"], r["cpu_class"]): r for r in rows}
    # success can go negative: 10 - 3 - 9 = -2
    assert by[("nsxt.node.network.packet.count", "received",
               "success", None, None)]["value_int"] == -2
    assert by[("nsxt.node.network.packet.count", "transmitted",
               "success", None, None)]["value_int"] == 5
    assert by[("nsxt.node.network.io", "received", None, None,
               None)]["value_int"] == 88
    # div-by-zero safeguard: used/max(total,1) = 30/1
    assert by[("nsxt.node.filesystem.utilization", None, None, None,
               None)]["value_double"] == 30.0
    assert by[("nsxt.node.filesystem.usage", None, None, "available",
               None)]["value_int"] == -30
    # node rows use class, interface rows use resource_type
    assert by[("nsxt.node.memory.usage", None, None, None,
               None)]["node_type"] == "transport"
    assert by[("nsxt.node.network.io", "received", None, None,
               None)]["node_type"] == "TransportNode"
    # null interface stats skipped
    assert all(r["device_id"] != "broken" for r in rows)
