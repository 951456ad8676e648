"""awsecscontainermetricsreceiver analog: ECS task-metadata-endpoint
snapshots → the 26-metric container.* / ecs.task.* table.

Parity with receiver/awsecscontainermetricsreceiver
(internal/awsecscontainermetrics — accumulator.go:22-107,
metrics_helper.go:12-156, translator.go, resource.go, constant.go):

- input is one TASK document per row: ``{"metadata": <TaskMetadata
  JSON>, "stats": {dockerId: <docker ContainerStats JSON>}}`` — the
  task-metadata-endpoint HTTP fetch is ingest transport.
- per-container ECS math (metrics_helper.go): memory utilized =
  ``(usage − stats["cache"]) / MiB`` in uint64 (UNDERFLOW WRAPS — the
  Go subtraction is unsigned, reproduced); cpu usage-in-vCPU =
  ``(total − prev_total) / (read − preread ns)`` with the zero-diff
  gate, utilized = ×100 then DIVIDED by the container CPU limit when
  set (accumulator.go:70-72); network sums aggregate across
  interfaces; storage sums only the Read/Write blkio ops (Async/
  Total/... ignored).  CPU metrics emit only when cpu_stats AND
  precpu_stats (with cpu_usage) are both present; memory/network/rate
  blocks are presence-gated but the translator ALWAYS renders all 26
  metrics (zeros when a block was absent).
- task rows (accumulator.go:22-94): field-wise sums of the container
  metrics, memory reserved overridden by the task limit, CPU reserved
  = task CPU limit × 1024 (else the container-limit sum), and when
  reserved > 0 the task utilized = summed usage-in-vCPU × 1024.
- stopped containers (no/empty stats but Started+Finished set) emit
  ONE ``container.duration`` seconds gauge (parse errors record 0).
- typing (translator.go): int gauges (memory.* incl. utilized/
  reserved, cpu.cores/onlines), cumulative NON-monotonic int Sums
  (cpu.usage.total/kernelmode/usermode/system, the 8 network
  counters, storage read/write), double gauges (cpu.utilized/
  reserved/usage.vcpu, network.rate.rx/tx, duration); uint64 → int64
  wrap.
- resources (resource.go): task id = the last ``/`` segment of the
  ARN with region/account from the colon fields (non-``arn:aws:ecs``
  ARNs give empty strings), cluster name from the cluster ARN tail,
  the launch-type lowercased convention attr, container image
  repository/tag split with the ``latest`` default.

Execution: per-task JSON decode task map, block-local, zero shuffle.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_U64 = 1 << 64
_I63 = 1 << 63
_MIB = 1024 * 1024
_VCPU = 1024

_FIELDS = (
    # (suffix, ecs field, kind) kind: ig=int gauge, is=int sum,
    # dg=double gauge
    ("memory.usage", "MemoryUsage", "ig"),
    ("memory.usage.max", "MemoryMaxUsage", "ig"),
    ("memory.usage.limit", "MemoryLimit", "ig"),
    ("memory.utilized", "MemoryUtilized", "ig"),
    ("memory.reserved", "MemoryReserved", "ig"),
    ("cpu.usage.total", "CPUTotalUsage", "is"),
    ("cpu.usage.kernelmode", "CPUUsageInKernelmode", "is"),
    ("cpu.usage.usermode", "CPUUsageInUserMode", "is"),
    ("cpu.cores", "NumOfCPUCores", "ig"),
    ("cpu.onlines", "CPUOnlineCpus", "ig"),
    ("cpu.usage.system", "SystemCPUUsage", "is"),
    ("cpu.utilized", "CPUUtilized", "dg"),
    ("cpu.reserved", "CPUReserved", "dg"),
    ("cpu.usage.vcpu", "CPUUsageInVCPU", "dg"),
    ("network.rate.rx", "NetworkRateRxBytesPerSecond", "dg"),
    ("network.rate.tx", "NetworkRateTxBytesPerSecond", "dg"),
    ("network.io.usage.rx_bytes", "NetworkRxBytes", "is"),
    ("network.io.usage.rx_packets", "NetworkRxPackets", "is"),
    ("network.io.usage.rx_errors", "NetworkRxErrors", "is"),
    ("network.io.usage.rx_dropped", "NetworkRxDropped", "is"),
    ("network.io.usage.tx_bytes", "NetworkTxBytes", "is"),
    ("network.io.usage.tx_packets", "NetworkTxPackets", "is"),
    ("network.io.usage.tx_errors", "NetworkTxErrors", "is"),
    ("network.io.usage.tx_dropped", "NetworkTxDropped", "is"),
    ("storage.read_bytes", "StorageReadBytes", "is"),
    ("storage.write_bytes", "StorageWriteBytes", "is"),
)

_SUM_FIELDS = [f for _s, f, _k in _FIELDS if _k != "dg"] + [
    "CPUUsageInVCPU", "NetworkRateRxBytesPerSecond",
    "NetworkRateTxBytesPerSecond"]

_TS_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(Z|[+-]\d{2}:\d{2})$")


def _i64(v) -> int:
    v = int(v) & (_U64 - 1)
    return v - _U64 if v >= _I63 else v


def _u(v) -> int:
    return int(v) if isinstance(v, (int, float)) \
        and not isinstance(v, bool) else 0


def _parse_ns(s: str):
    m = _TS_RE.match(s or "")
    if not m:
        return None
    import calendar
    base = calendar.timegm(tuple(int(m.group(i))
                                 for i in range(1, 7)) + (0, 0, 0))
    frac = float(m.group(7) or 0.0)
    tz = m.group(8)
    off = 0
    if tz != "Z":
        off = int(tz[1:3]) * 3600 + int(tz[4:6]) * 60
        if tz[0] == "-":
            off = -off
    return (base - off) * 10**9 + int(round(frac * 1e9))


def parse_image(image: str) -> tuple[str, str]:
    """internal/common/docker ParseImageName essentials: strip a
    digest, split repository[:tag] with the ``latest`` default."""
    img = (image or "").split("@")[0]
    slash = img.rfind("/")
    colon = img.rfind(":")
    if colon > slash:
        return img[:colon], img[colon + 1:] or "latest"
    return img, "latest"


def container_ecs_metrics(stats: dict) -> dict:
    """getContainerMetrics (metrics_helper.go:12-123)."""
    m = {f: 0 for _s, f, _k in _FIELDS}
    for f in ("CPUUtilized", "CPUReserved", "CPUUsageInVCPU",
              "NetworkRateRxBytesPerSecond",
              "NetworkRateTxBytesPerSecond"):
        m[f] = 0.0
    mem = stats.get("memory_stats")
    if isinstance(mem, dict):
        m["MemoryUsage"] = _u(mem.get("usage"))
        m["MemoryMaxUsage"] = _u(mem.get("max_usage"))
        m["MemoryLimit"] = _u(mem.get("limit"))
        mstats = mem.get("stats")
        if isinstance(mstats, dict):
            # uint64 subtraction WRAPS when cache > usage
            m["MemoryUtilized"] = ((_u(mem.get("usage"))
                                    - _u(mstats.get("cache")))
                                   % _U64) // _MIB
    cpu = stats.get("cpu_stats")
    pre = stats.get("precpu_stats")
    if (isinstance(cpu, dict) and isinstance(cpu.get("cpu_usage"),
                                             dict)
            and isinstance(pre, dict)
            and isinstance(pre.get("cpu_usage"), dict)):
        usage = cpu["cpu_usage"]
        read = _parse_ns(stats.get("read", "")) or 0
        preread = _parse_ns(stats.get("preread", "")) or 0
        time_diff = float(read - preread)
        vcpu = 0.0
        if time_diff > 0:
            delta = float((_u(usage.get("total_usage"))
                           - _u(pre["cpu_usage"].get("total_usage")))
                          % _U64)
            vcpu = delta / time_diff
        m["CPUTotalUsage"] = _u(usage.get("total_usage"))
        m["CPUUsageInKernelmode"] = _u(usage.get("usage_in_kernelmode"))
        m["CPUUsageInUserMode"] = _u(usage.get("usage_in_usermode"))
        m["NumOfCPUCores"] = len(usage.get("percpu_usage") or ())
        m["CPUOnlineCpus"] = _u(cpu.get("online_cpus"))
        m["SystemCPUUsage"] = _u(cpu.get("system_cpu_usage"))
        m["CPUUsageInVCPU"] = vcpu
        m["CPUUtilized"] = vcpu * 100
    rate = stats.get("network_rate_stats")
    if isinstance(rate, dict):
        m["NetworkRateRxBytesPerSecond"] = float(
            _u(rate.get("rx_bytes_per_sec"))
            if not isinstance(rate.get("rx_bytes_per_sec"), float)
            else rate["rx_bytes_per_sec"])
        m["NetworkRateTxBytesPerSecond"] = float(
            _u(rate.get("tx_bytes_per_sec"))
            if not isinstance(rate.get("tx_bytes_per_sec"), float)
            else rate["tx_bytes_per_sec"])
    nets = stats.get("networks")
    if isinstance(nets, dict):
        for ns in nets.values():
            if not isinstance(ns, dict):
                continue
            for field, key in (("NetworkRxBytes", "rx_bytes"),
                               ("NetworkRxPackets", "rx_packets"),
                               ("NetworkRxErrors", "rx_errors"),
                               ("NetworkRxDropped", "rx_dropped"),
                               ("NetworkTxBytes", "tx_bytes"),
                               ("NetworkTxPackets", "tx_packets"),
                               ("NetworkTxErrors", "tx_errors"),
                               ("NetworkTxDropped", "tx_dropped")):
                m[field] += _u(ns.get(key))
    disk = stats.get("blkio_stats")
    if isinstance(disk, dict):
        for ent in disk.get("io_service_bytes_recursive") or ():
            if not isinstance(ent, dict):
                continue
            if ent.get("op") == "Read":
                m["StorageReadBytes"] += _u(ent.get("value"))
            elif ent.get("op") == "Write":
                m["StorageWriteBytes"] += _u(ent.get("value"))
    return m


def task_to_rows(doc: str, *, now_ns: int = 0) -> list[dict]:
    try:
        d = json.loads(doc)
        if not isinstance(d, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    md = d.get("metadata") or {}
    stats_map = d.get("stats") or {}
    arn = md.get("TaskARN", "") or ""
    region = account = task_id = ""
    if arn.startswith("arn:aws:ecs"):
        task_id = arn.split("/")[-1]
        sub = arn.split("/")[0].split(":")
        region, account = sub[3], sub[4]
    cluster = md.get("Cluster", "") or ""
    if cluster.startswith("arn:aws"):
        cluster = cluster.split("/")[-1]
    launch = md.get("LaunchType", "") or ""
    task_res = {"task_id": task_id, "task_arn": arn,
                "cluster": cluster, "family": md.get("Family", ""),
                "revision": md.get("Revision", ""),
                "launch_type": launch, "region": region,
                "account_id": account}
    rows: list[dict] = []

    def emit_block(prefix, m, cres):
        for suffix, field, kind in _FIELDS:
            rows.append({
                "name": prefix + suffix,
                "mtype": "sum" if kind == "is" else "gauge",
                "is_monotonic": False if kind == "is" else None,
                "aggregation_temporality": 2 if kind == "is" else 0,
                "value_int": (_i64(m[field]) if kind != "dg"
                              else None),
                "value_double": (float(m[field]) if kind == "dg"
                                 else None),
                "container_name": cres.get("container_name"),
                "container_id": cres.get("container_id"),
                "docker_name": cres.get("docker_name"),
                "image_name": cres.get("image_name"),
                "image_tag": cres.get("image_tag"),
                "time_unix_nano": now_ns, **task_res})

    task = {f: 0 for _s, f, _k in _FIELDS}
    for f in ("CPUUtilized", "CPUReserved", "CPUUsageInVCPU",
              "NetworkRateRxBytesPerSecond",
              "NetworkRateTxBytesPerSecond"):
        task[f] = 0.0
    for cm in md.get("Containers") or ():
        if not isinstance(cm, dict):
            continue
        repo, tag = parse_image(cm.get("Image", ""))
        cres = {"container_name": cm.get("Name", ""),
                "container_id": cm.get("DockerId", ""),
                "docker_name": cm.get("DockerName", ""),
                "image_name": repo, "image_tag": tag}
        stats = stats_map.get(cm.get("DockerId", ""))
        if isinstance(stats, dict) and stats.get("id"):
            m = container_ecs_metrics(stats)
            limits = cm.get("Limits") or {}
            if limits.get("Memory") is not None:
                m["MemoryReserved"] = _u(limits["Memory"])
            if limits.get("CPU") is not None:
                m["CPUReserved"] = float(limits["CPU"])
            if m["CPUReserved"] > 0:
                m["CPUUtilized"] = m["CPUUtilized"] / m["CPUReserved"]
            emit_block("container.", m, cres)
            for _s, f, _k in _FIELDS:
                task[f] += m[f]
        elif cm.get("FinishedAt") and cm.get("StartedAt"):
            s = _parse_ns(cm["StartedAt"])
            e = _parse_ns(cm["FinishedAt"])
            dur = (e - s) / 1e9 if s is not None and e is not None \
                else 0.0
            rows.append({
                "name": "container.duration", "mtype": "gauge",
                "is_monotonic": None, "aggregation_temporality": 0,
                "value_int": None, "value_double": dur,
                "time_unix_nano": now_ns, **cres, **task_res})
    limits = md.get("Limits") or {}
    if limits.get("Memory") is not None:
        task["MemoryReserved"] = _u(limits["Memory"])
    if limits.get("CPU") is not None:
        task["CPUReserved"] = float(limits["CPU"]) * _VCPU
    if task["CPUReserved"] > 0:
        task["CPUUtilized"] = task["CPUUsageInVCPU"] * _VCPU
    emit_block("ecs.task.", task, {})
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("container_name", pa.string()),
           ("container_id", pa.string()),
           ("docker_name", pa.string()), ("image_name", pa.string()),
           ("image_tag", pa.string()), ("task_id", pa.string()),
           ("task_arn", pa.string()), ("cluster", pa.string()),
           ("family", pa.string()), ("revision", pa.string()),
           ("launch_type", pa.string()), ("region", pa.string()),
           ("account_id", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseEcs:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in task_to_rows(doc, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row.get(k))
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_ecs_task_metrics(ds, doc_col: str = "task_json", *,
                           now_ns: int = 0):
    """ECS task snapshots → container./ecs.task. metric rows."""
    return ds.map_batches(_ParseEcs(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
