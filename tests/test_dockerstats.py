"""dockerstatsreceiver parity (receiver/dockerstatsreceiver/
receiver.go + metric_helper.go, metadata.yaml) — golden-pinned on the
reference mock fixtures (stats.json + container.json vs
expected_metrics.yaml, allMetricsEnabled + withDefaultLabels, the
same IgnoreTimestamp / ignore-uptime-value comparison the reference
test uses), plus the metric_helper math branches."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.dockerstats import (
    METRICS,
    calculate_cpu_limit,
    calculate_cpu_percent,
    calculate_mem_usage_no_cache,
    container_stats_to_rows,
    env_to_map,
)

REF = "/root/reference/receiver/dockerstatsreceiver/testdata/mock"

ALL = frozenset(METRICS)

DEFAULT_LABELS = dict(
    env_vars_to_metric_labels={"ENV_VAR": "env-var-metric-label",
                               "ENV_VAR_2": "env-var-metric-label-2"},
    container_labels_to_metric_labels={
        "container.label": "container-metric-label",
        "container.label.2": "container-metric-label-2"},
)


def _expected(folder):
    """expected_metrics.yaml → {(name, attr tuple, resource id): value}
    per resource, plus the resource attr maps."""
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(REF, folder,
                                           "expected_metrics.yaml")))
    out = []
    for rm in exp["resourceMetrics"]:
        res = {a["key"]: list(a["value"].values())[0]
               for a in rm["resource"]["attributes"]}
        dps = {}
        for m in rm["scopeMetrics"][0]["metrics"]:
            body = m.get("sum") or m.get("gauge")
            for dp in body["dataPoints"]:
                attrs = tuple(sorted(
                    (a["key"], list(a["value"].values())[0])
                    for a in dp.get("attributes", ())))
                val = (int(dp["asInt"]) if "asInt" in dp
                       else float(dp["asDouble"]))
                key = (m["name"], attrs)
                assert key not in dps, key
                dps[key] = ("sum" if "sum" in m else "gauge",
                            body.get("isMonotonic"), val)
        out.append((res, dps))
    return out


def _actual(folder, stats_file="stats.json",
            container_file="container.json", now_ns=1_690_000_000 * 10**9):
    stats = open(os.path.join(REF, folder, stats_file)).read()
    cont = open(os.path.join(REF, folder, container_file)).read()
    rows = container_stats_to_rows(stats, cont, enabled=ALL,
                                   now_ns=now_ns, **DEFAULT_LABELS)
    dps = {}
    for r in rows:
        attrs = []
        for col, key in (("device_major", "device_major"),
                         ("device_minor", "device_minor"),
                         ("operation", "operation"),
                         ("interface", "interface"), ("core", "core")):
            if r[col] is not None:
                attrs.append((key, r[col]))
        key = (r["name"], tuple(sorted(attrs)))
        assert key not in dps, key
        dps[key] = (r["mtype"], r["is_monotonic"],
                    r["value_int"] if r["value_int"] is not None
                    else r["value_double"])
    return rows, dps


def _compare(folder, **kw):
    if not os.path.isdir(os.path.join(REF, folder)):
        pytest.skip("reference testdata not present")
    rows, act = _actual(folder, **kw)
    (res_exp, dps_exp), = _expected(folder)
    # resource attrs: reference always stamps runtime + the 4 identity
    # attrs + the configured label attrs
    r = rows[0]
    assert res_exp["container.id"] == r["container_id"]
    assert res_exp["container.name"] == r["container_name"]
    assert res_exp["container.hostname"] == r["container_hostname"]
    assert res_exp["container.image.name"] == r["container_image_name"]
    assert res_exp["container.runtime"] == "docker"
    extra = json.loads(r["resource_extra"])
    for k, v in res_exp.items():
        if not k.startswith("container."):
            assert extra.get(k) == v, (k, v, extra)
    # datapoints: same comparison the reference test runs —
    # IgnoreTimestamp (we fix now_ns) + IgnoreMetricValues(uptime)
    assert set(act) == set(dps_exp), (
        set(act) ^ set(dps_exp))
    for key, (mt, mono, val) in dps_exp.items():
        amt, amono, aval = act[key]
        assert amt == mt, key
        assert bool(amono) == bool(mono), key
        if key[0] == "container.uptime":
            assert aval > 0
        else:
            assert aval == pytest.approx(val, rel=1e-12), (key, aval, val)


def test_golden_single_container():
    _compare("single_container")


def test_golden_cgroups_v2():
    _compare("cgroups_v2")


def test_golden_no_pids_stats():
    _compare("no_pids_stats")


def test_golden_pids_stats_max():
    _compare("pids_stats_max")


def test_golden_cpu_limit():
    _compare("cpu_limit")


def test_cpu_percent_branches():
    # zero when either delta <= 0; onlineCPUs falls back to len(percpu)
    pre = {"cpu_usage": {"total_usage": 100}, "system_cpu_usage": 1000}
    cur = {"cpu_usage": {"total_usage": 300, "percpu_usage": [1, 2]},
           "system_cpu_usage": 2000}
    assert calculate_cpu_percent(pre, cur) == (200.0 / 1000.0) * 2 * 100.0
    cur2 = dict(cur, online_cpus=8)
    assert calculate_cpu_percent(pre, cur2) == (200.0 / 1000.0) * 8 * 100.0
    assert calculate_cpu_percent(cur, pre) == 0.0  # negative deltas
    assert calculate_cpu_percent(
        {"cpu_usage": {"total_usage": 300}, "system_cpu_usage": 2000},
        cur) == 0.0  # zero cpu delta


def test_mem_usage_no_cache_branches():
    # v1: total_inactive_file present and < usage
    assert calculate_mem_usage_no_cache(
        {"usage": 100, "stats": {"total_inactive_file": 30,
                                 "inactive_file": 99}}) == 70
    # v1 key present but >= usage -> falls through to v2 key
    assert calculate_mem_usage_no_cache(
        {"usage": 100, "stats": {"total_inactive_file": 200,
                                 "inactive_file": 40}}) == 60
    # v2 only
    assert calculate_mem_usage_no_cache(
        {"usage": 100, "stats": {"inactive_file": 40}}) == 60
    # v2 >= usage -> raw usage
    assert calculate_mem_usage_no_cache(
        {"usage": 100, "stats": {"inactive_file": 100}}) == 100
    # no stats at all: missing key reads 0 < usage -> usage - 0
    assert calculate_mem_usage_no_cache({"usage": 100}) == 100
    assert calculate_mem_usage_no_cache({"usage": 0}) == 0


def test_cpu_limit_branches():
    assert calculate_cpu_limit({"NanoCpus": 2_500_000_000}) == 2.5
    assert calculate_cpu_limit({"CpusetCpus": "0,2"}) == 2.0
    assert calculate_cpu_limit({"CpusetCpus": "0-3,7"}) == 5.0
    # single elements are counted WITHOUT parsing (Go quirk)
    assert calculate_cpu_limit({"CpusetCpus": "zzz"}) == 1.0
    # a malformed RANGE is the error branch
    assert calculate_cpu_limit({"CpusetCpus": "0-x"}) is None
    assert calculate_cpu_limit({"CpuQuota": 50000}) == 0.5
    assert calculate_cpu_limit(
        {"CpuQuota": 50000, "CpuPeriod": 25000}) == 2.0
    # precedence: nanocpus beats cpuset beats quota
    assert calculate_cpu_limit(
        {"NanoCpus": 10**9, "CpusetCpus": "0-7", "CpuQuota": 5}) == 1.0
    assert calculate_cpu_limit({}) == 0.0


def test_env_to_map_go_quirks():
    assert env_to_map(["A=1", "B=x=y", "C=", "D=  ", "=v", "bare"]) == {
        "A": "1", "B": "x",  # value truncated at the SECOND '='
        "": "v",
    }


def test_pids_gates_and_default_set():
    stats = json.dumps({"pids_stats": {"current": 0, "limit": 5},
                        "cpu_stats": {}, "precpu_stats": {},
                        "memory_stats": {}, "blkio_stats": {}})
    cont = json.dumps({"Config": {}, "State": {}, "HostConfig": {}})
    rows = container_stats_to_rows(stats, cont, enabled=ALL)
    names = {r["name"] for r in rows}
    assert "container.pids.count" not in names  # current == 0
    # default set: pids/uptime/restarts/shares/percpu all disabled
    rows_d = container_stats_to_rows(stats, cont)
    assert {r["name"] for r in rows_d} <= {
        n for n, s in METRICS.items() if s[3]}
    # undecodable json -> whole-container scrape failure
    assert container_stats_to_rows("{not json", cont) == []
