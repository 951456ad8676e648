"""kubeletstatsreceiver parity (internal/kubelet) — golden-pinned on
stats-summary.json vs test_scraper_expected.yaml (all groups, default
metric config), plus utilization/uptime/interface vectors."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.kubeletstats import (
    summary_to_rows,
)

REF = "/root/reference/receiver/kubeletstatsreceiver/testdata"

_RES_COLS = (("node_name", "k8s.node.name"),
             ("pod_uid", "k8s.pod.uid"), ("pod_name", "k8s.pod.name"),
             ("namespace", "k8s.namespace.name"),
             ("container_name", "k8s.container.name"),
             ("volume_name", "k8s.volume.name"),
             ("volume_type", "k8s.volume.type"),
             ("pvc_name", "k8s.persistentvolumeclaim.name"))


def _golden():
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(
        REF, "scraper", "test_scraper_expected.yaml")))
    out = {}
    for rm in exp["resourceMetrics"]:
        res = tuple(sorted(
            (a["key"], list(a["value"].values())[0])
            for a in rm["resource"]["attributes"]))
        dps = out.setdefault(res, {})
        for sm in rm["scopeMetrics"]:
            for m in sm["metrics"]:
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
    return out


def test_reference_golden():
    summary = os.path.join(REF, "stats-summary.json")
    if not os.path.exists(summary):
        pytest.skip("reference testdata not present")
    rows = summary_to_rows(json.dumps(
        {"summary": json.load(open(summary))}),
        now_ns=1_690_000_000_000_000_000)
    act = {}
    for r in rows:
        res = tuple(sorted((key, r[col]) for col, key in _RES_COLS
                           if r[col] is not None))
        attrs = []
        if r["interface"] is not None:
            attrs.append(("interface", r["interface"]))
        if r["direction"] is not None:
            attrs.append(("direction", r["direction"]))
        act.setdefault(res, {})[(r["name"], tuple(sorted(attrs)))] = (
            r["mtype"], r["is_monotonic"],
            r["value_int"] if r["value_int"] is not None
            else r["value_double"])
    exp = _golden()
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


def test_utilization_gates_and_uptime():
    summary = {"node": {"nodeName": "n",
                        "startTime": "2023-01-01T00:00:00Z"},
               "pods": [{
        "podRef": {"uid": "u1", "name": "p", "namespace": "ns"},
        "startTime": "2023-01-01T00:00:10Z",
        "cpu": {"usageNanoCores": 500_000_000,
                "usageCoreNanoSeconds": 3_000_000_000},
        "memory": {"usageBytes": 100},
    }]}
    doc = {"summary": summary,
           "pod_resources": {"u1": {"cpu_limit": 2.0,
                                    "cpu_request": 0.25,
                                    "memory_limit": 400,
                                    "memory_request": 50}},
           "node_cpu_capacity": 4.0, "node_memory_capacity": 1000.0}
    now = 1_672_531_260 * 10**9  # 2023-01-01T00:01:00Z
    enabled = {"k8s.pod.cpu.usage", "k8s.pod.cpu.utilization",
               "k8s.pod.cpu.node.utilization",
               "k8s.pod.cpu_limit_utilization",
               "k8s.pod.cpu_request_utilization",
               "k8s.pod.memory.node.utilization",
               "k8s.pod.memory_limit_utilization",
               "k8s.pod.memory_request_utilization",
               "k8s.pod.cpu.time", "k8s.pod.uptime",
               "k8s.node.uptime"}
    rows = summary_to_rows(json.dumps(doc), enabled=enabled,
                           now_ns=now)
    by = {r["name"]: r for r in rows}
    assert by["k8s.pod.cpu.usage"]["value_double"] == 0.5
    assert by["k8s.pod.cpu.utilization"]["value_double"] == 0.5
    assert by["k8s.pod.cpu.node.utilization"]["value_double"] == \
        0.5 / 4.0
    assert by["k8s.pod.cpu_limit_utilization"]["value_double"] == 0.25
    assert by["k8s.pod.cpu_request_utilization"]["value_double"] == 2.0
    assert by["k8s.pod.memory_limit_utilization"]["value_double"] == \
        100 / 400
    assert by["k8s.pod.memory_request_utilization"][
        "value_double"] == 2.0
    assert by["k8s.pod.memory.node.utilization"]["value_double"] == \
        100 / 1000.0
    # cpu.time is a double monotonic sum with the entity start time
    ct = by["k8s.pod.cpu.time"]
    assert (ct["mtype"], ct["is_monotonic"],
            ct["value_double"]) == ("sum", True, 3.0)
    assert ct["start_time_unix_nano"] == 1_672_531_210 * 10**9
    # uptime: non-monotonic int sum, int(seconds since start)
    assert by["k8s.node.uptime"]["value_int"] == 60
    assert by["k8s.pod.uptime"]["value_int"] == 50
    assert by["k8s.pod.uptime"]["is_monotonic"] is False
    # default config: utilization family + uptime are OFF
    assert not [r for r in summary_to_rows(json.dumps(doc),
                                           now_ns=now)
                if "utilization" in r["name"] or "uptime" in r["name"]]


def test_interface_modes():
    net = {"name": "eth0", "rxBytes": 1, "txBytes": 2, "rxErrors": 3,
           "interfaces": [
               {"name": "eth0", "rxBytes": 1, "txBytes": 2},
               {"name": "lo", "rxBytes": 9}]}
    doc = {"summary": {"node": {"nodeName": "n", "network": net}}}
    rows = summary_to_rows(json.dumps(doc))
    got = {(r["name"], r["interface"], r["direction"]): r["value_int"]
           for r in rows}
    # default: ONLY the default interface, presence-gated tx errors
    assert got == {("k8s.node.network.io", "eth0", "receive"): 1,
                   ("k8s.node.network.io", "eth0", "transmit"): 2,
                   ("k8s.node.network.errors", "eth0", "receive"): 3}
    rows2 = summary_to_rows(json.dumps(doc),
                            all_network_interfaces={"node": True})
    got2 = {(r["name"], r["interface"], r["direction"]):
            r["value_int"] for r in rows2}
    # all-interfaces mode iterates the list ONLY (no default re-read)
    assert got2 == {("k8s.node.network.io", "eth0", "receive"): 1,
                    ("k8s.node.network.io", "eth0", "transmit"): 2,
                    ("k8s.node.network.io", "lo", "receive"): 9}
