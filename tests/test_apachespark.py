"""apachesparkreceiver parity — CLUSTER_TABLE re-extracted from
scraper.go at test time and asserted equal, plus the full fixture
tree (apps/cluster/stages/executors/jobs apiresponses) golden-pinned
vs metrics_golden.yaml."""

import json
import os
import re

import pytest

from opentelemetry_collector_contrib_ray.stages.apachespark import (
    CLUSTER_TABLE,
    app_to_rows,
)

REF = "/root/reference/receiver/apachesparkreceiver"


def test_cluster_table_matches_reference_switch():
    scraper = os.path.join(REF, "scraper.go")
    if not os.path.exists(scraper):
        pytest.skip("reference not present")
    src = open(scraper).read()
    gen = open(os.path.join(
        REF, "internal/metadata/generated_metrics.go")).read()
    enum = dict(re.findall(
        r'case (Attribute\w+):\s*\n\s*return "([^"]+)"', gen))
    names = {"Record" + m + "DataPoint": n for m, n in re.findall(
        r"// Record(\w+)DataPoint adds a data point to ([\w.]+) "
        r"metric", gen)}
    body = src.split("func (s *sparkScraper) recordCluster")[1]
    body = body.split("\nfunc ")[0]
    ref = []
    pat = re.compile(
        r'if stat, ok := clusterStats\.(\w+)\[appID\+"([^"]+)"\]; '
        r"ok \{\n((?:\s*s\.mb\.Record\w+DataPoint\([^\n]*\n)+)")
    for m in pat.finditer(body):
        cont, key, recs = m.groups()
        for rm in re.finditer(
                r"s\.mb\.(Record\w+DataPoint)\(now, "
                r"(int64\(stat\.Value\)|stat\.Count|stat\.Mean)"
                r"((?:, metadata\.Attribute\w+)*)\)", recs):
            fn, val, attrs = rm.groups()
            alist = tuple(enum[a.strip().replace("metadata.", "")]
                          for a in attrs.split(",") if a.strip())
            vk = {"int64(stat.Value)": "gauge_int",
                  "stat.Count": "count", "stat.Mean": "mean"}[val]
            ref.append((cont.lower(), key, names[fn], vk, alist))
    assert list(CLUSTER_TABLE) == ref


def _golden():
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(
        REF, "testdata/expected_metrics/metrics_golden.yaml")))
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


_OVERRIDE = {"stage_active": "active", "stage_complete": "complete",
             "stage_pending": "pending", "stage_failed": "failed",
             "stage_task_result": "result",
             "executor_task_result": "result", "job_result": "result",
             "scheduler_status": "status", "pool_memory_type": "type",
             "direction": "direction", "source": "source",
             "location": "location", "state": "state",
             "gc_type": "gc_type"}


def test_reference_golden():
    api = os.path.join(REF, "testdata", "apiresponses")
    if not os.path.isdir(api):
        pytest.skip("reference testdata not present")

    def load(f):
        return json.load(open(os.path.join(api, f)))

    (app,) = load("apps_stats_response.json")
    doc = {"app_id": app["id"], "app_name": app["name"],
           "cluster": load("cluster_stats_response.json"),
           "stages": load("stages_stats_response.json"),
           "executors": load("executors_stats_response.json"),
           "jobs": load("jobs_stats_response.json")}
    rows = app_to_rows(json.dumps(doc))
    act = {}
    for r in rows:
        res = [("spark.application.id", r["app_id"]),
               ("spark.application.name", r["app_name"])]
        # spark.stage.attempt.id is a default-DISABLED resource attr
        # (metadata.yaml has no enabled flag) — absent from the golden
        if r["stage_id"] is not None:
            res += [("spark.stage.id", str(r["stage_id"]))]
        if r["executor_id"] is not None:
            res.append(("spark.executor.id", r["executor_id"]))
        if r["job_id"] is not None:
            res.append(("spark.job.id", str(r["job_id"])))
        attrs = []
        for col, key in _OVERRIDE.items():
            if col in ("stage_active", "stage_complete",
                       "stage_pending", "stage_failed"):
                if r[col] is not None:
                    attrs.append((key, r[col]))
            elif r.get(col) is not None:
                attrs.append((key, r[col]))
        act.setdefault(tuple(sorted(res)), {})[
            (r["name"], tuple(sorted(attrs)))] = (
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


def test_gates():
    doc = {"app_id": "a", "app_name": "x",
           "stages": [{"status": "SKIPPED", "numActiveTasks": 5},
                      {"status": "ACTIVE", "stageId": 3,
                       "attemptId": 1, "numActiveTasks": 5}],
           "executors": [], "jobs": []}
    rows = app_to_rows(json.dumps(doc))
    # unknown status skips the WHOLE stage
    assert all(r["stage_id"] == 3 for r in rows)
    st = [r for r in rows if r["name"] == "spark.stage.status"]
    assert len(st) == 1 and st[0]["value_int"] == 0
    assert (st[0]["stage_active"], st[0]["stage_complete"],
            st[0]["stage_pending"], st[0]["stage_failed"]) == (
        True, False, False, False)
    # app-name allow list
    assert app_to_rows(json.dumps(doc),
                       application_names=("other",)) == []
    assert app_to_rows(json.dumps(doc),
                       application_names=("x",)) != []
    # executor free = total - used derivation
    doc2 = {"app_id": "a", "app_name": "x", "executors": [
        {"id": "0", "usedOnHeapStorageMemory": 30,
         "totalOnHeapStorageMemory": 100}]}
    rows2 = app_to_rows(json.dumps(doc2))
    sm = {(r["location"], r["state"]): r["value_int"] for r in rows2
          if r["name"] == "spark.executor.storage_memory.usage"}
    assert sm[("on_heap", "used")] == 30
    assert sm[("on_heap", "free")] == 70
    assert sm[("off_heap", "free")] == 0
