"""awsecscontainermetricsreceiver parity (internal/
awsecscontainermetrics metrics_helper.go + accumulator.go +
translator.go) — driven over the reference task_stats.json fixture
plus math-quirk vectors."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.ecsmetrics import (
    container_ecs_metrics,
    parse_image,
    task_to_rows,
)

REF = ("/root/reference/receiver/awsecscontainermetricsreceiver/"
       "testdata/task_stats.json")


def test_reference_task_stats_fixture():
    if not os.path.exists(REF):
        pytest.skip("reference testdata not present")
    stats_map = json.load(open(REF))
    containers = [{"Name": f"c{i}", "DockerId": did,
                   "DockerName": f"d{i}", "Image": "repo/img:1.2"}
                  for i, did in enumerate(stats_map)]
    md = {"TaskARN": "arn:aws:ecs:us-west-2:111122223333:task/"
                     "cls/tid123",
          "Cluster": "arn:aws:ecs:us-west-2:111122223333:cluster/cls",
          "Family": "fam", "Revision": "3", "LaunchType": "EC2",
          "Containers": containers,
          "Limits": {"CPU": 0.5, "Memory": 512}}
    rows = task_to_rows(json.dumps({"metadata": md,
                                    "stats": stats_map}))
    per_container = 26
    n_live = sum(1 for s in stats_map.values() if s.get("id"))
    assert len(rows) == per_container * (n_live + 1)
    # spot-check one container against an independent restatement
    did = next(d for d, s in stats_map.items() if s.get("id"))
    s = stats_map[did]
    crows = {r["name"]: r for r in rows if r["container_id"] == did}
    assert crows["container.memory.usage"]["value_int"] == \
        s["memory_stats"]["usage"]
    exp_util = (s["memory_stats"]["usage"]
                - s["memory_stats"]["stats"]["cache"]) // (1 << 20)
    assert crows["container.memory.utilized"]["value_int"] == exp_util
    # network sums across interfaces
    exp_rx = sum(n["rx_bytes"] for n in s["networks"].values())
    assert crows["container.network.io.usage.rx_bytes"][
        "value_int"] == exp_rx
    # storage: Read/Write ops only
    exp_read = sum(b["value"] for b in
                   s["blkio_stats"]["io_service_bytes_recursive"]
                   if b["op"] == "Read")
    assert crows["container.storage.read_bytes"]["value_int"] == \
        exp_read
    # resources
    r = crows["container.memory.usage"]
    assert (r["task_id"], r["region"], r["account_id"],
            r["cluster"]) == ("tid123", "us-west-2", "111122223333",
                              "cls")
    assert (r["image_name"], r["image_tag"]) == ("repo/img", "1.2")
    # task rows: sums + the limit overrides
    trows = {r["name"]: r for r in rows
             if r["name"].startswith("ecs.task.")}
    assert trows["ecs.task.memory.usage"]["value_int"] == sum(
        st["memory_stats"]["usage"] for st in stats_map.values()
        if st.get("id"))
    assert trows["ecs.task.memory.reserved"]["value_int"] == 512
    assert trows["ecs.task.cpu.reserved"]["value_double"] == 512.0
    vcpu = trows["ecs.task.cpu.usage.vcpu"]["value_double"]
    assert trows["ecs.task.cpu.utilized"]["value_double"] == \
        pytest.approx(vcpu * 1024, rel=1e-12)
    # typing
    assert trows["ecs.task.cpu.usage.total"]["mtype"] == "sum"
    assert trows["ecs.task.cpu.usage.total"]["is_monotonic"] is False
    assert trows["ecs.task.memory.usage"]["mtype"] == "gauge"


def test_math_quirks():
    # uint64 underflow wrap: cache > usage
    m = container_ecs_metrics({"memory_stats": {
        "usage": 10, "stats": {"cache": 20}}})
    assert m["MemoryUtilized"] == ((10 - 20) % (1 << 64)) // (1 << 20)
    # cpu needs BOTH cpu_stats and precpu_stats with cpu_usage
    m = container_ecs_metrics({
        "read": "2020-01-01T00:00:02Z",
        "preread": "2020-01-01T00:00:01Z",
        "cpu_stats": {"cpu_usage": {"total_usage": 3_000_000_000},
                      "online_cpus": 4},
        "precpu_stats": {"cpu_usage": {"total_usage": 1_000_000_000}}})
    assert m["CPUUsageInVCPU"] == 2.0  # 2e9 ns over 1e9 ns
    assert m["CPUUtilized"] == 200.0
    m2 = container_ecs_metrics({
        "cpu_stats": {"cpu_usage": {"total_usage": 5}}})
    assert m2["CPUTotalUsage"] == 0  # precpu missing -> block skipped


def test_stopped_container_duration_and_image():
    md = {"TaskARN": "arn:aws:ecs:r:1:task/t",
          "Containers": [{"Name": "c", "DockerId": "x",
                          "Image": "nginx",
                          "StartedAt": "2020-01-01T00:00:00Z",
                          "FinishedAt": "2020-01-01T00:01:30.5Z"}]}
    rows = task_to_rows(json.dumps({"metadata": md, "stats": {}}))
    dur = [r for r in rows if r["name"] == "container.duration"]
    assert len(dur) == 1 and dur[0]["value_double"] == 90.5
    assert parse_image("nginx") == ("nginx", "latest")
    assert parse_image("reg:5000/a/b:v2") == ("reg:5000/a/b", "v2")
    assert parse_image("repo@sha256:abcd") == ("repo", "latest")
    # task rows still emitted (all zeros)
    assert sum(1 for r in rows
               if r["name"].startswith("ecs.task.")) == 26
