"""dockerstatsreceiver analog: container stats+inspect JSON → the
container.* metric table.

Parity with receiver/dockerstatsreceiver (receiver.go:131-318,
metric_helper.go:29-133, metadata.yaml, internal/docker/docker.go):

- one StatsResponse JSON (the ``/containers/<id>/stats`` body) plus one
  inspect JSON (``/containers/<id>/json``) per container per scrape;
  the Docker-daemon HTTP fetch and the container-event list loop are
  ingest transport, ``time.Now()`` is the ``now_ns`` config.
- CPU (receiver.go:269-283): system/total/kernelmode/usermode ns
  cumulative monotonic Sums, throttling periods/throttled_periods/
  throttled_time, utilization = the docker-cli percent math
  (metric_helper.go:29-46: ``(cpuDelta/systemDelta)*onlineCPUs*100``
  with zero when either delta ≤ 0 and the onlineCPUs→len(percpu_usage)
  fallback), logical.count from online_cpus, per-core ``cpuN`` fan-out.
- memory (receiver.go:172-226): usage.total = calculateMemUsageNoCache
  (metric_helper.go:60-70 — cgroup-v1 ``total_inactive_file`` rule
  when that key is present AND < usage, else the v2 ``inactive_file``
  subtraction, else raw usage), percent = used/limit*100 when limit≠0
  else 0, usage.limit/usage.max/fails unconditional, the 34-key stats
  map emitted only for PRESENT keys.
- blkio (receiver.go:230-250): per-entry fan-out with stringified
  major/minor and the LOWERCASED op attr, eight entry lists.
- network (receiver.go:252-267): per-interface fan-out of the eight
  rx/tx bytes/dropped/packets/errors Sums.
- pids (receiver.go:285-293): count only when current≠0, limit only
  when additionally limit≠0.
- base/hostconfig (receiver.go:295-318): uptime = (now − RFC3339
  State.StartedAt).seconds as a double Gauge only when positive (an
  unparseable StartedAt is a partial scrape error — the row set for
  the other metrics still emits), cpu.shares from HostConfig,
  cpu.limit = metric_helper.go:89-133 (nanocpus/1e9, else the
  cpuset-cpus range count, else quota/period-with-100000-default)
  only when > 0; restarts from RestartCount.
- resources (receiver.go:146-166): runtime=docker, hostname, id,
  image.name, name with the leading ``/`` trimmed, plus the
  default-disabled image.id (the inspect ``Image`` sha) and
  command_line (Cmd joined with spaces); ``env_vars_to_metric_labels``
  reads the inspect env via ContainerEnvToMap (docker.go:338-349 —
  ``strings.Split(v, "=")`` keeps only ``parts[1]``, so a value with
  a second ``=`` is TRUNCATED there, and whitespace-only first
  segments are skipped), ``container_labels_to_metric_labels`` reads
  Config.Labels; both skip empty values.
- per-metric gates mirror metadata.yaml defaults (14 enabled);
  ``enabled_metrics`` overrides the whole set (haproxy/expvar
  precedent).  uint64 JSON values wrap through int64 exactly like
  Go's ``int64(v)`` conversion.

Execution: per-container JSON decode in a task map fanning out one
row per (container, present metric datapoint), block-local, zero
shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# name -> (mtype, value_type, is_monotonic, default_enabled)
# transcribed from metadata.yaml (sum => cumulative, temporality 2)
METRICS: dict = {
    "container.blockio.io_merged_recursive": ("sum", "int", True, False),
    "container.blockio.io_queued_recursive": ("sum", "int", True, False),
    "container.blockio.io_service_bytes_recursive": ("sum", "int", True, True),
    "container.blockio.io_service_time_recursive": ("sum", "int", True, False),
    "container.blockio.io_serviced_recursive": ("sum", "int", True, False),
    "container.blockio.io_time_recursive": ("sum", "int", True, False),
    "container.blockio.io_wait_time_recursive": ("sum", "int", True, False),
    "container.blockio.sectors_recursive": ("sum", "int", True, False),
    "container.cpu.limit": ("gauge", "double", False, False),
    "container.cpu.logical.count": ("gauge", "int", False, False),
    "container.cpu.shares": ("gauge", "int", False, False),
    "container.cpu.throttling_data.periods": ("sum", "int", True, False),
    "container.cpu.throttling_data.throttled_periods": ("sum", "int", True, False),
    "container.cpu.throttling_data.throttled_time": ("sum", "int", True, False),
    "container.cpu.usage.kernelmode": ("sum", "int", True, True),
    "container.cpu.usage.percpu": ("sum", "int", True, False),
    "container.cpu.usage.system": ("sum", "int", True, False),
    "container.cpu.usage.total": ("sum", "int", True, True),
    "container.cpu.usage.usermode": ("sum", "int", True, True),
    "container.cpu.utilization": ("gauge", "double", False, True),
    "container.memory.active_anon": ("sum", "int", False, False),
    "container.memory.active_file": ("sum", "int", False, False),
    "container.memory.anon": ("sum", "int", False, False),
    "container.memory.cache": ("sum", "int", False, False),
    "container.memory.dirty": ("sum", "int", False, False),
    "container.memory.fails": ("sum", "int", True, False),
    "container.memory.file": ("sum", "int", False, True),
    "container.memory.hierarchical_memory_limit": ("sum", "int", False, False),
    "container.memory.hierarchical_memsw_limit": ("sum", "int", False, False),
    "container.memory.inactive_anon": ("sum", "int", False, False),
    "container.memory.inactive_file": ("sum", "int", False, False),
    "container.memory.mapped_file": ("sum", "int", False, False),
    "container.memory.percent": ("gauge", "double", False, True),
    "container.memory.pgfault": ("sum", "int", True, False),
    "container.memory.pgmajfault": ("sum", "int", True, False),
    "container.memory.pgpgin": ("sum", "int", True, False),
    "container.memory.pgpgout": ("sum", "int", True, False),
    "container.memory.rss": ("sum", "int", False, False),
    "container.memory.rss_huge": ("sum", "int", False, False),
    "container.memory.total_active_anon": ("sum", "int", False, False),
    "container.memory.total_active_file": ("sum", "int", False, False),
    "container.memory.total_cache": ("sum", "int", False, True),
    "container.memory.total_dirty": ("sum", "int", False, False),
    "container.memory.total_inactive_anon": ("sum", "int", False, False),
    "container.memory.total_inactive_file": ("sum", "int", False, False),
    "container.memory.total_mapped_file": ("sum", "int", False, False),
    "container.memory.total_pgfault": ("sum", "int", True, False),
    "container.memory.total_pgmajfault": ("sum", "int", True, False),
    "container.memory.total_pgpgin": ("sum", "int", True, False),
    "container.memory.total_pgpgout": ("sum", "int", True, False),
    "container.memory.total_rss": ("sum", "int", False, False),
    "container.memory.total_rss_huge": ("sum", "int", False, False),
    "container.memory.total_unevictable": ("sum", "int", False, False),
    "container.memory.total_writeback": ("sum", "int", False, False),
    "container.memory.unevictable": ("sum", "int", False, False),
    "container.memory.usage.limit": ("sum", "int", False, True),
    "container.memory.usage.max": ("sum", "int", False, False),
    "container.memory.usage.total": ("sum", "int", False, True),
    "container.memory.writeback": ("sum", "int", False, False),
    "container.network.io.usage.rx_bytes": ("sum", "int", True, True),
    "container.network.io.usage.rx_dropped": ("sum", "int", True, True),
    "container.network.io.usage.rx_errors": ("sum", "int", True, False),
    "container.network.io.usage.rx_packets": ("sum", "int", True, False),
    "container.network.io.usage.tx_bytes": ("sum", "int", True, True),
    "container.network.io.usage.tx_dropped": ("sum", "int", True, True),
    "container.network.io.usage.tx_errors": ("sum", "int", True, False),
    "container.network.io.usage.tx_packets": ("sum", "int", True, False),
    "container.pids.count": ("sum", "int", False, False),
    "container.pids.limit": ("sum", "int", False, False),
    "container.restarts": ("sum", "int", True, False),
    "container.uptime": ("gauge", "double", False, False),
}

DEFAULT_ENABLED = frozenset(n for n, s in METRICS.items() if s[3])

# recordMemoryMetrics' stats-map recorder switch (receiver.go:184-219):
# docker stat key -> metric suffix (identical except usage.* / fails)
_MEM_STAT_KEYS = (
    "cache", "total_cache", "rss", "total_rss", "rss_huge",
    "total_rss_huge", "dirty", "total_dirty", "writeback",
    "total_writeback", "mapped_file", "total_mapped_file", "pgpgin",
    "total_pgpgin", "pgpgout", "total_pgpgout", "pgfault",
    "total_pgfault", "pgmajfault", "total_pgmajfault", "inactive_anon",
    "total_inactive_anon", "active_anon", "total_active_anon",
    "inactive_file", "total_inactive_file", "active_file",
    "total_active_file", "unevictable", "total_unevictable",
    "hierarchical_memory_limit", "hierarchical_memsw_limit", "anon",
    "file",
)

# recordBlkioMetrics' entry lists (receiver.go:231-238): json field ->
# metric suffix (NOTE the queued list's json tag is io_queue_recursive)
_BLKIO_FIELDS = (
    ("io_merged_recursive", "io_merged_recursive"),
    ("io_queue_recursive", "io_queued_recursive"),
    ("io_service_bytes_recursive", "io_service_bytes_recursive"),
    ("io_service_time_recursive", "io_service_time_recursive"),
    ("io_serviced_recursive", "io_serviced_recursive"),
    ("io_time_recursive", "io_time_recursive"),
    ("io_wait_time_recursive", "io_wait_time_recursive"),
    ("sectors_recursive", "sectors_recursive"),
)

_NET_FIELDS = (("rx_bytes", "rx_bytes"), ("tx_bytes", "tx_bytes"),
               ("rx_dropped", "rx_dropped"), ("tx_dropped", "tx_dropped"),
               ("rx_packets", "rx_packets"), ("tx_packets", "tx_packets"),
               ("rx_errors", "rx_errors"), ("tx_errors", "tx_errors"))

_U64 = 1 << 64
_I63 = 1 << 63


def _i64(v) -> int:
    """Go ``int64(uint64(v))`` two's-complement wrap."""
    v = int(v) & (_U64 - 1)
    return v - _U64 if v >= _I63 else v


def env_to_map(env: list | None) -> dict:
    """internal/docker ContainerEnvToMap (docker.go:338-349): split on
    EVERY ``=`` but keep only parts[1] (a second ``=`` truncates the
    value), skip entries whose first segment is empty/whitespace."""
    out = {}
    for v in env or ():
        parts = (v or "").split("=")
        if len(parts) < 2 or not parts[1].strip():
            continue
        out[parts[0]] = parts[1]
    return out


def calculate_cpu_percent(pre: dict, cur: dict) -> float:
    """metric_helper.go:29-46 — the docker-cli percent math, float64
    ops in the reference's exact order."""
    cpu_delta = (float((cur.get("cpu_usage") or {}).get("total_usage", 0))
                 - float((pre.get("cpu_usage") or {}).get("total_usage", 0)))
    system_delta = (float(cur.get("system_cpu_usage", 0))
                    - float(pre.get("system_cpu_usage", 0)))
    online = float(cur.get("online_cpus", 0))
    if online == 0.0:
        online = float(len((cur.get("cpu_usage") or {})
                           .get("percpu_usage") or ()))
    if system_delta > 0.0 and cpu_delta > 0.0:
        return (cpu_delta / system_delta) * online * 100.0
    return 0.0


def calculate_mem_usage_no_cache(mem: dict) -> int:
    """metric_helper.go:60-70 (uint64 semantics: missing map keys read
    as 0, comparisons unsigned)."""
    usage = int(mem.get("usage", 0))
    stats = mem.get("stats") or {}
    if "total_inactive_file" in stats:  # cgroup v1
        v = int(stats["total_inactive_file"])
        if v < usage:
            return usage - v
    v = int(stats.get("inactive_file", 0))  # cgroup v2
    if v < usage:
        return usage - v
    return usage


def calculate_memory_percent(limit: int, used_no_cache: int) -> float:
    return (float(used_no_cache) / float(limit) * 100.0
            if limit != 0 else 0.0)


def calculate_cpu_limit(host_config: dict) -> float | None:
    """metric_helper.go:89-133; None = unparseable cpuset (the partial
    scrape error branch)."""
    nano = int(host_config.get("NanoCpus") or 0)
    cpuset = host_config.get("CpusetCpus") or ""
    quota = int(host_config.get("CpuQuota") or 0)
    if nano > 0:
        return float(nano) / 1e9
    if cpuset:
        n = 0
        for part in cpuset.split(","):
            bounds = part.split("-")
            try:
                if len(bounds) == 2:
                    n += int(bounds[1]) - int(bounds[0]) + 1
                elif len(bounds) == 1:
                    # Go increments without parsing a single element
                    n += 1
            except ValueError:
                return None
        return float(n)
    if quota > 0:
        period = int(host_config.get("CpuPeriod") or 0)
        if period == 0:
            period = 100000  # default CFS period
        return float(quota) / float(period)
    return 0.0


def _parse_rfc3339_ns(s: str):
    """time.RFC3339 parse → (unix_seconds_float) or None."""
    import re as _re
    m = _re.match(
        r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"
        r"(\.\d+)?(Z|[+-]\d{2}:\d{2})$", s or "")
    if not m:
        return None
    import calendar
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    try:
        base = calendar.timegm((y, mo, d, h, mi, sec, 0, 0, 0))
    except (ValueError, OverflowError):
        return None
    frac = float(m.group(7) or 0.0)
    tz = m.group(8)
    off = 0
    if tz != "Z":
        off = (int(tz[1:3]) * 3600 + int(tz[4:6]) * 60)
        if tz[0] == "-":
            off = -off
    return base - off + frac


def container_stats_to_rows(stats_doc: str, container_doc: str, *,
                            enabled=None, now_ns: int = 0,
                            env_vars_to_metric_labels: dict | None = None,
                            container_labels_to_metric_labels:
                            dict | None = None) -> list[dict]:
    """One (StatsResponse JSON, inspect JSON) pair → container.* metric
    rows (receiver.go:131-318).  Undecodable JSON fails the container's
    whole scrape (empty row set) — the reference's FetchContainerStats
    error branch."""
    en = DEFAULT_ENABLED if enabled is None else set(enabled)
    try:
        stats = json.loads(stats_doc)
        cont = json.loads(container_doc)
        if not isinstance(stats, dict) or not isinstance(cont, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []

    rows: list[tuple] = []  # (name, value_int, value_double, attrs)

    def rec(name, val, **attrs):
        if name not in en:
            return
        _mt, vt, _mono, _d = METRICS[name]
        if vt == "int":
            rows.append((name, _i64(val), None, attrs))
        else:
            rows.append((name, None, float(val), attrs))

    # --- CPU (receiver.go:269-283)
    cpu = stats.get("cpu_stats") or {}
    pre = stats.get("precpu_stats") or {}
    usage = cpu.get("cpu_usage") or {}
    throt = cpu.get("throttling_data") or {}
    rec("container.cpu.usage.system", cpu.get("system_cpu_usage", 0))
    rec("container.cpu.usage.total", usage.get("total_usage", 0))
    rec("container.cpu.usage.kernelmode", usage.get("usage_in_kernelmode", 0))
    rec("container.cpu.usage.usermode", usage.get("usage_in_usermode", 0))
    rec("container.cpu.throttling_data.throttled_periods",
        throt.get("throttled_periods", 0))
    rec("container.cpu.throttling_data.periods", throt.get("periods", 0))
    rec("container.cpu.throttling_data.throttled_time",
        throt.get("throttled_time", 0))
    rec("container.cpu.utilization", calculate_cpu_percent(pre, cpu))
    rec("container.cpu.logical.count", cpu.get("online_cpus", 0))
    for core_num, v in enumerate(usage.get("percpu_usage") or ()):
        rec("container.cpu.usage.percpu", v, core=f"cpu{core_num}")

    # --- memory (receiver.go:172-226)
    mem = stats.get("memory_stats") or {}
    total_usage = calculate_mem_usage_no_cache(mem)
    rec("container.memory.usage.total", total_usage)
    rec("container.memory.usage.limit", mem.get("limit", 0))
    rec("container.memory.percent",
        calculate_memory_percent(int(mem.get("limit", 0)), total_usage))
    rec("container.memory.usage.max", mem.get("max_usage", 0))
    rec("container.memory.fails", mem.get("failcnt", 0))
    mstats = mem.get("stats") or {}
    for key in _MEM_STAT_KEYS:
        if key in mstats:
            rec(f"container.memory.{key}", mstats[key])

    # --- blkio (receiver.go:230-250)
    blkio = stats.get("blkio_stats") or {}
    for field, suffix in _BLKIO_FIELDS:
        for ent in blkio.get(field) or ():
            rec(f"container.blockio.{suffix}", ent.get("value", 0),
                device_major=str(int(ent.get("major", 0))),
                device_minor=str(int(ent.get("minor", 0))),
                operation=str(ent.get("op", "")).lower())

    # --- network (receiver.go:252-267)
    for iface, ns in (stats.get("networks") or {}).items():
        for field, suffix in _NET_FIELDS:
            rec(f"container.network.io.usage.{suffix}",
                (ns or {}).get(field, 0), interface=iface)

    # --- pids (receiver.go:285-293)
    pids = stats.get("pids_stats") or {}
    if int(pids.get("current", 0)) != 0:
        rec("container.pids.count", pids["current"])
        if int(pids.get("limit", 0)) != 0:
            rec("container.pids.limit", pids["limit"])

    # --- base + host config (receiver.go:295-318)
    started = ((cont.get("State") or {}).get("StartedAt")) or ""
    t0 = _parse_rfc3339_ns(started)
    if t0 is not None:
        up = now_ns / 1e9 - t0
        if up > 0:
            rec("container.uptime", up)
    host_cfg = cont.get("HostConfig") or {}
    rec("container.cpu.shares", host_cfg.get("CpuShares") or 0)
    limit = calculate_cpu_limit(host_cfg)
    if limit is not None and limit > 0:
        rec("container.cpu.limit", limit)
    rec("container.restarts", cont.get("RestartCount") or 0)

    # --- resources (receiver.go:146-166)
    cfg = cont.get("Config") or {}
    extra = {}
    env_map = env_to_map(cfg.get("Env"))
    for k, label in (env_vars_to_metric_labels or {}).items():
        v = env_map.get(k, "")
        if v:
            extra[label] = v
    labels = cfg.get("Labels") or {}
    for k, label in (container_labels_to_metric_labels or {}).items():
        v = labels.get(k, "")
        if v:
            extra[label] = v
    name = cont.get("Name") or ""
    res = {
        "container_id": cont.get("Id") or "",
        "container_name": name[1:] if name.startswith("/") else name,
        "container_hostname": cfg.get("Hostname") or "",
        "container_image_name": cfg.get("Image") or "",
        "container_image_id": cont.get("Image") or "",
        "container_command_line": " ".join(cfg.get("Cmd") or ()),
        "resource_extra": json.dumps(extra, sort_keys=True,
                                     separators=(",", ":")),
    }

    out = []
    for mname, vi, vd, attrs in rows:
        mt, _vt, mono, _d = METRICS[mname]
        row = {"name": mname, "mtype": mt,
               "is_monotonic": mono if mt == "sum" else None,
               "aggregation_temporality": 2 if mt == "sum" else 0,
               "value_int": vi, "value_double": vd,
               "device_major": attrs.get("device_major"),
               "device_minor": attrs.get("device_minor"),
               "operation": attrs.get("operation"),
               "interface": attrs.get("interface"),
               "core": attrs.get("core"),
               "time_unix_nano": now_ns}
        row.update(res)
        out.append(row)
    return out


_SCHEMA = (
    ("name", pa.string()), ("mtype", pa.string()),
    ("is_monotonic", pa.bool_()),
    ("aggregation_temporality", pa.int32()),
    ("value_int", pa.int64()), ("value_double", pa.float64()),
    ("device_major", pa.string()), ("device_minor", pa.string()),
    ("operation", pa.string()), ("interface", pa.string()),
    ("core", pa.string()),
    ("container_id", pa.string()), ("container_name", pa.string()),
    ("container_hostname", pa.string()),
    ("container_image_name", pa.string()),
    ("container_image_id", pa.string()),
    ("container_command_line", pa.string()),
    ("resource_extra", pa.string()),
    ("time_unix_nano", pa.int64()),
)


class _ParseDockerStats:
    def __init__(self, stats_col, container_col, enabled, now_ns,
                 env_labels, cont_labels):
        self.stats_col = stats_col
        self.container_col = container_col
        self.enabled = enabled
        self.now_ns = now_ns
        self.env_labels = env_labels
        self.cont_labels = cont_labels

    def __call__(self, batch: pa.Table) -> pa.Table:
        stats = batch.column(self.stats_col).to_pylist()
        conts = batch.column(self.container_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, (sd, cd) in enumerate(zip(stats, conts)):
            for row in container_stats_to_rows(
                    sd, cd, enabled=self.enabled, now_ns=self.now_ns,
                    env_vars_to_metric_labels=self.env_labels,
                    container_labels_to_metric_labels=self.cont_labels):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_docker_stats(ds, stats_col: str = "stats_json",
                       container_col: str = "container_json", *,
                       enabled_metrics=None, now_ns: int = 0,
                       env_vars_to_metric_labels: dict | None = None,
                       container_labels_to_metric_labels:
                       dict | None = None):
    """Container stats+inspect JSON docs → container.* metric rows
    (one per present datapoint); original columns carried via take."""
    return ds.map_batches(
        _ParseDockerStats(stats_col, container_col,
                          None if enabled_metrics is None
                          else tuple(enabled_metrics),
                          now_ns, env_vars_to_metric_labels,
                          container_labels_to_metric_labels),
        batch_format="pyarrow", zero_copy_batch=True)
