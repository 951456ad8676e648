"""podmanreceiver parity (receiver/podmanreceiver/receiver.go:134-178)
— pinned on the reference record_metrics_test.go genContainerStats
vector incl. the rx←NetOutput/tx←NetInput swap and ns→s truncation."""

import json

from opentelemetry_collector_contrib_ray.stages.podman import (
    podman_stats_to_rows,
)

STATS = {
    "ContainerID": "abcd1234", "Name": "cntrA",
    "PerCPU": [40, 50, 20, 15], "CPU": 78.67,
    "CPUNano": 3451990, "CPUSystemNano": 4573681,
    "SystemNano": 3493456, "MemUsage": 87, "MemLimit": 200,
    "MemPerc": 43.5, "NetInput": 349323, "NetOutput": 762442,
    "BlockInput": 943894, "BlockOutput": 324234, "PIDs": 3,
}


def test_reference_vector():
    rows = podman_stats_to_rows(json.dumps(STATS), image="localimage")
    assert len(rows) == 10 + len(STATS["PerCPU"])
    by = {(r["name"], r["core"]): (r["value_int"], r["value_double"])
          for r in rows}
    # ns -> s integer truncation
    assert by[("container.cpu.usage.system", None)] == (
        4573681 // 10**9, None)  # 0
    assert by[("container.cpu.usage.total", None)] == (0, None)
    assert by[("container.cpu.percent", None)] == (None, 78.67)
    for i, v in enumerate(STATS["PerCPU"]):
        assert by[("container.cpu.usage.percpu", f"cpu{i}")] == (
            v // 10**9, None)
    # the reference's network swap: rx <- NetOutput, tx <- NetInput
    assert by[("container.network.io.usage.rx_bytes", None)] == (
        762442, None)
    assert by[("container.network.io.usage.tx_bytes", None)] == (
        349323, None)
    assert by[("container.memory.usage.total", None)] == (87, None)
    assert by[("container.memory.usage.limit", None)] == (200, None)
    assert by[("container.memory.percent", None)] == (None, 43.5)
    assert by[("container.blockio.io_service_bytes_recursive.read",
               None)] == (943894, None)
    assert by[("container.blockio.io_service_bytes_recursive.write",
               None)] == (324234, None)
    r = rows[0]
    assert (r["container_id"], r["container_name"],
            r["container_image_name"]) == ("abcd1234", "cntrA",
                                           "localimage")
    # metric typing per metadata.yaml
    typing = {r["name"]: (r["mtype"], r["is_monotonic"]) for r in rows}
    assert typing["container.cpu.usage.total"] == ("sum", True)
    assert typing["container.memory.usage.total"] == ("sum", False)
    assert typing["container.cpu.percent"] == ("gauge", None)


def test_case_insensitive_keys_and_failure():
    rows = podman_stats_to_rows(json.dumps(
        {"containerid": "x", "name": "y", "memusage": 5}))
    by = {r["name"]: r for r in rows}
    assert by["container.memory.usage.total"]["value_int"] == 5
    assert by["container.memory.usage.total"]["container_id"] == "x"
    assert podman_stats_to_rows("{nope") == []
