"""flinkmetricsreceiver parity (receiver/flinkmetricsreceiver/
process.go + client.go, metadata.yaml) — golden-pinned on the four
mockresponses metric-value fixtures assembled exactly like
scraper_test.go (mock hosts/ids) vs metrics_golden.yaml."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.flinkmetrics import (
    instance_to_rows,
    taskmanager_host,
)

REF = "/root/reference/receiver/flinkmetricsreceiver/testdata"

_RES_KEYS = ("host.name", "flink.resource.type", "flink.taskmanager.id",
             "flink.job.name", "flink.task.name", "flink.subtask.index")


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
                val = (int(dp["asInt"]) if "asInt" in dp
                       else float(dp["asDouble"]))
                dps[(m["name"], attrs)] = (
                    "sum" if "sum" in m else "gauge",
                    body.get("isMonotonic"), val)
        out[res] = dps
    return out


def _instances():
    def vals(f):
        return json.load(open(os.path.join(REF, "mockresponses", f)))

    jm = vals("mock_jobmanager_metrics.json")
    tm = vals("mock_taskmanager_metrics.json")
    jb = vals("mock_jobs_metrics.json")
    st = vals("mock_subtask_metrics.json")
    return [
        {"kind": "jobmanager", "host": "mock-host", "metrics": jm},
        {"kind": "taskmanager", "host": "mock-host",
         "taskmanager_id": "mock-taskmanager-id", "metrics": tm},
        {"kind": "taskmanager", "host": "mock-host2",
         "taskmanager_id": "mock-taskmanager-id2", "metrics": tm},
        {"kind": "job", "host": "mock-host",
         "job_name": "mock-job-name", "metrics": jb},
        {"kind": "job", "host": "mock-host2",
         "job_name": "mock-job-name2", "metrics": jb},
        {"kind": "subtask", "host": "mock-host",
         "taskmanager_id": "mock-taskmanager-id",
         "job_name": "mock-job-name", "task_name": "mock-task-name",
         "subtask_index": "mock-subtask-index", "metrics": st},
    ]


def test_reference_golden():
    if not os.path.isdir(os.path.join(REF, "mockresponses")):
        pytest.skip("reference testdata not present")
    exp = _golden()
    act = {}
    for inst in _instances():
        rows = instance_to_rows(json.dumps(inst))
        res_map = {}
        dps = {}
        for r in rows:
            for col, key in (("host_name", "host.name"),
                             ("resource_type", "flink.resource.type"),
                             ("taskmanager_id", "flink.taskmanager.id"),
                             ("job_name", "flink.job.name"),
                             ("task_name", "flink.task.name"),
                             ("subtask_index", "flink.subtask.index")):
                if r[col] is not None:
                    res_map[key] = r[col]
            attrs = []
            # metadata.yaml name_override: both the GC and operator
            # name attrs render as wire key "name"
            for col, key in (
                    ("garbage_collector_name", "name"),
                    ("checkpoint", "checkpoint"), ("record", "record"),
                    ("operator_name", "name")):
                if r[col] is not None:
                    attrs.append((key, r[col]))
            dps[(r["name"], tuple(sorted(attrs)))] = (
                r["mtype"], r["is_monotonic"],
                r["value_int"] if r["value_int"] is not None
                else r["value_double"])
        act[tuple(sorted(res_map.items()))] = dps
    assert set(act) == set(exp), set(act) ^ set(exp)
    for res, dps_exp in exp.items():
        dps_act = act[res]
        assert set(dps_act) == set(dps_exp), (res,
                                              set(dps_act) ^ set(dps_exp))
        for k, (mt, mono, val) in dps_exp.items():
            amt, amono, aval = dps_act[k]
            assert amt == mt and bool(amono) == bool(mono), (res, k)
            assert aval == val, (res, k, aval, val)


def test_subtask_contains_quirk_and_ordering():
    inst = {"kind": "subtask", "host": "h", "taskmanager_id": "t",
            "job_name": "j", "task_name": "tn", "subtask_index": "0",
            "metrics": [
                # Contains, not HasSuffix: PerSecond variants match too
                {"id": "MyOp.numRecordsInPerSecond", "value": "5"},
                {"id": "numRecordsIn", "value": "7"},  # exact task case
                {"id": "A.B.numRecordsOut", "value": "3"},
                {"id": "W.currentOutputWatermark", "value": "11"},
                {"id": "unmatched.metric", "value": "1"},
                {"id": "X.numRecordsIn", "value": "bad"},  # parse drop
            ]}
    rows = instance_to_rows(json.dumps(inst))
    got = {(r["name"], r["operator_name"], r["record"]): r["value_int"]
           for r in rows}
    assert got == {
        ("flink.operator.record.count", "MyOp", "in"): 5,
        ("flink.task.record.count", None, "in"): 7,
        ("flink.operator.record.count", "A.B", "out"): 3,
        ("flink.operator.watermark.output", "W", None): 11,
    }


def test_gc_tables_differ_by_kind_and_host_split():
    gc = [{"id": "Status.JVM.GarbageCollector.PS_MarkSweep.Count",
           "value": "2"},
          {"id": "Status.JVM.GarbageCollector.G1_Old_Generation.Count",
           "value": "3"}]
    jm = instance_to_rows(json.dumps(
        {"kind": "jobmanager", "host": "h", "metrics": gc}))
    tm = instance_to_rows(json.dumps(
        {"kind": "taskmanager", "host": "h", "taskmanager_id": "t",
         "metrics": gc}))
    assert [(r["garbage_collector_name"], r["value_int"])
            for r in jm] == [("PS_MarkSweep", 2)]
    assert [(r["garbage_collector_name"], r["value_int"])
            for r in tm] == [("G1_Old_Generation", 3)]
    assert taskmanager_host("172.26.0.3:34457-7b2520") == "172.26.0.3"
    assert taskmanager_host("bare") == "bare"
