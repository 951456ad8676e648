"""kubeletstatsreceiver analog: kubelet ``/stats/summary`` documents →
the 60-metric k8s.node./k8s.pod./container./k8s.volume. table.

Parity with receiver/kubeletstatsreceiver (internal/kubelet —
accumulator.go:54-144, cpu.go, mem.go, fs.go, network.go, volume.go,
metadata.yaml):

- input is one summary document per row: ``{"summary": <the
  /stats/summary JSON>, "pod_resources": {pod_uid: {"cpu_limit",
  "cpu_request", "memory_limit", "memory_request"}},
  "container_resources": {pod_uid + container_name: {...}},
  "node_cpu_capacity": f, "node_memory_capacity": f,
  "volume_types": {pod_uid + volume_name: {"type", "pvc_name"}}}`` —
  the kubelet HTTPS fetch and the k8s pods-API metadata crawl
  (limits/requests, volume specs) are ingest transport.
- groups gate via ``metric_groups`` (node/pod/container/volume,
  accumulator.go ValidMetricGroups); ``all_network_interfaces``
  per-group switches the network fan-out from the default interface
  (the embedded name/rxBytes fields) to the ``interfaces`` list
  (network.go:17-35 — the default interface is NOT re-read in that
  mode).
- cpu (cpu.go): usage = usageNanoCores/1e9 double gauge (+ the
  deprecated utilization alias, same value); node/limit/request
  utilization = usage ÷ the respective capacity, each emitted only
  when its denominator > 0 AND usageNanoCores is present; cpu.time =
  usageCoreNanoSeconds/1e9 double monotonic Sum.
- memory (mem.go): six presence-gated int gauges; the three memory
  utilization doubles gate on usageBytes presence + denominators.
- fs (fs.go): available/capacity/usage presence-gated int gauges;
  pods read ``ephemeral-storage``, containers ``rootfs``.
- uptime (accumulator.go:47-52): ``int(time.Since(start).Seconds())``
  only when startTime is non-zero — a NON-monotonic int Sum.
- volumes (volume.go): five presence-gated int gauges; resource adds
  the volume name + the pods-API-derived type/claim fields.
- sums carry the entity's start time (WithStartTimeOverride);
  gauges don't.

Execution: per-summary JSON decode task map, block-local, zero
shuffle.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_TS_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(Z|[+-]\d{2}:\d{2})$")

# default-DISABLED metrics (metadata.yaml): the utilization family
# plus the three uptime counters
_DEFAULT_OFF = frozenset({
    "k8s.node.uptime", "k8s.pod.uptime", "container.uptime",
    "k8s.node.cpu.utilization", "k8s.pod.cpu.utilization",
    "container.cpu.utilization",
    "k8s.pod.cpu.node.utilization", "k8s.pod.cpu_limit_utilization",
    "k8s.pod.cpu_request_utilization",
    "k8s.pod.memory.node.utilization",
    "k8s.pod.memory_limit_utilization",
    "k8s.pod.memory_request_utilization",
    "k8s.container.cpu.node.utilization",
    "k8s.container.cpu_limit_utilization",
    "k8s.container.cpu_request_utilization",
    "k8s.container.memory.node.utilization",
    "k8s.container.memory_limit_utilization",
    "k8s.container.memory_request_utilization",
})


def _parse_ns(s):
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


def _n(d, key):
    v = d.get(key) if isinstance(d, dict) else None
    return (int(v) if isinstance(v, (int, float))
            and not isinstance(v, bool) else None)


class _Emitter:
    def __init__(self, enabled, now_ns):
        self.enabled = enabled
        self.now_ns = now_ns
        self.rows: list[dict] = []

    def on(self, name):
        if self.enabled is not None:
            return name in self.enabled
        return name not in _DEFAULT_OFF

    def emit(self, name, vi, vd, *, mtype="gauge", mono=None,
             interface=None, direction=None, start_ns=None, res=None):
        if not self.on(name):
            return
        self.rows.append({
            "name": name, "mtype": mtype, "is_monotonic": mono,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vi, "value_double": vd,
            "interface": interface, "direction": direction,
            "start_time_unix_nano": (start_ns if mtype == "sum"
                                     else None),
            "time_unix_nano": self.now_ns, **(res or {})})

    def uptime(self, name, start_ns, res):
        if start_ns:
            secs = int((self.now_ns - start_ns) / 1e9)
            self.emit(name, secs, None, mtype="sum", mono=False,
                      start_ns=start_ns, res=res)

    def cpu(self, prefix, util_prefix, s, r, node_limit, start_ns,
            res):
        if not isinstance(s, dict):
            return
        nano = _n(s, "usageNanoCores")
        if nano is not None:
            usage = float(nano) / 1_000_000_000
            self.emit(prefix + "cpu.usage", None, usage, res=res)
            self.emit(prefix + "cpu.utilization", None, usage,
                      res=res)
            if node_limit > 0:
                self.emit(util_prefix + "cpu.node.utilization", None,
                          usage / node_limit, res=res)
            if r.get("cpu_limit", 0) > 0:
                self.emit(util_prefix + "cpu_limit_utilization", None,
                          usage / r["cpu_limit"], res=res)
            if r.get("cpu_request", 0) > 0:
                self.emit(util_prefix + "cpu_request_utilization",
                          None, usage / r["cpu_request"], res=res)
        core_ns = _n(s, "usageCoreNanoSeconds")
        if core_ns is not None:
            self.emit(prefix + "cpu.time", None,
                      float(core_ns) / 1_000_000_000, mtype="sum",
                      mono=True, start_ns=start_ns, res=res)

    def memory(self, prefix, util_prefix, s, r, node_limit, res):
        if not isinstance(s, dict):
            return
        for suffix, key in (("memory.available", "availableBytes"),
                            ("memory.usage", "usageBytes"),
                            ("memory.rss", "rssBytes"),
                            ("memory.working_set", "workingSetBytes"),
                            ("memory.page_faults", "pageFaults"),
                            ("memory.major_page_faults",
                             "majorPageFaults")):
            v = _n(s, key)
            if v is not None:
                self.emit(prefix + suffix, v, None, res=res)
        usage = _n(s, "usageBytes")
        if usage is not None:
            if r.get("memory_limit", 0) > 0:
                self.emit(util_prefix + "memory_limit_utilization",
                          None, float(usage) / float(r["memory_limit"]),
                          res=res)
            if r.get("memory_request", 0) > 0:
                self.emit(util_prefix + "memory_request_utilization",
                          None,
                          float(usage) / float(r["memory_request"]),
                          res=res)
            if node_limit > 0:
                self.emit(util_prefix + "memory.node.utilization",
                          None, float(usage) / node_limit, res=res)

    def fs(self, prefix, s, res):
        if not isinstance(s, dict):
            return
        for suffix, key in (("filesystem.available", "availableBytes"),
                            ("filesystem.capacity", "capacityBytes"),
                            ("filesystem.usage", "usedBytes")):
            v = _n(s, key)
            if v is not None:
                self.emit(prefix + suffix, v, None, res=res)

    def network(self, prefix, s, all_interfaces, start_ns, res):
        if not isinstance(s, dict):
            return
        ifaces = (s.get("interfaces") or () if all_interfaces
                  else (s,))
        for i in ifaces:
            if not isinstance(i, dict):
                continue
            name = i.get("name") or ""
            for suffix, rx_k, tx_k in (
                    ("network.io", "rxBytes", "txBytes"),
                    ("network.errors", "rxErrors", "txErrors")):
                for key, direction in ((rx_k, "receive"),
                                       (tx_k, "transmit")):
                    v = _n(i, key)
                    if v is not None:
                        self.emit(prefix + suffix, v, None,
                                  mtype="sum", mono=True,
                                  interface=name, direction=direction,
                                  start_ns=start_ns, res=res)


def summary_to_rows(doc: str, *, metric_groups=("container", "pod",
                                                "node", "volume"),
                    all_network_interfaces=None, enabled=None,
                    now_ns: int = 0) -> list[dict]:
    try:
        d = json.loads(doc)
        if not isinstance(d, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    summary = d.get("summary") or {}
    pod_res = d.get("pod_resources") or {}
    con_res = d.get("container_resources") or {}
    vol_types = d.get("volume_types") or {}
    node_cpu = float(d.get("node_cpu_capacity") or 0)
    node_mem = float(d.get("node_memory_capacity") or 0)
    groups = set(metric_groups)
    ani = all_network_interfaces or {}
    em = _Emitter(enabled, now_ns)

    base = {"node_name": None, "pod_uid": None, "pod_name": None,
            "namespace": None, "container_name": None,
            "volume_name": None, "volume_type": None,
            "pvc_name": None}

    node = summary.get("node")
    if "node" in groups and isinstance(node, dict):
        res = dict(base, node_name=node.get("nodeName", ""))
        start = _parse_ns(node.get("startTime"))
        em.uptime("k8s.node.uptime", start, res)
        em.cpu("k8s.node.", "k8s.node.", node.get("cpu"), {}, 0,
               start, res)
        em.memory("k8s.node.", "k8s.node.", node.get("memory"), {}, 0,
                  res)
        em.fs("k8s.node.", node.get("fs"), res)
        em.network("k8s.node.", node.get("network"),
                   ani.get("node", False), start, res)

    for pod in summary.get("pods") or ():
        if not isinstance(pod, dict):
            continue
        ref = pod.get("podRef") or {}
        uid = ref.get("uid", "")
        pres = dict(base, pod_uid=uid, pod_name=ref.get("name", ""),
                    namespace=ref.get("namespace", ""))
        pstart = _parse_ns(pod.get("startTime"))
        r = pod_res.get(uid) or {}
        if "pod" in groups:
            em.uptime("k8s.pod.uptime", pstart, pres)
            em.cpu("k8s.pod.", "k8s.pod.", pod.get("cpu"), r,
                   node_cpu, pstart, pres)
            em.memory("k8s.pod.", "k8s.pod.", pod.get("memory"), r,
                      node_mem, pres)
            em.fs("k8s.pod.", pod.get("ephemeral-storage"), pres)
            em.network("k8s.pod.", pod.get("network"),
                       ani.get("pod", False), pstart, pres)
        if "container" in groups:
            for c in pod.get("containers") or ():
                if not isinstance(c, dict):
                    continue
                cres = dict(pres, container_name=c.get("name", ""))
                cstart = _parse_ns(c.get("startTime"))
                cr = con_res.get(uid + c.get("name", "")) or {}
                em.uptime("container.uptime", cstart, cres)
                em.cpu("container.", "k8s.container.", c.get("cpu"),
                       cr, node_cpu, cstart, cres)
                em.memory("container.", "k8s.container.",
                          c.get("memory"), cr, node_mem, cres)
                em.fs("container.", c.get("rootfs"), cres)
        if "volume" in groups:
            for v in pod.get("volume") or ():
                if not isinstance(v, dict):
                    continue
                vt = vol_types.get(uid + v.get("name", "")) or {}
                vres = dict(pres, volume_name=v.get("name", ""),
                            volume_type=vt.get("type"),
                            pvc_name=vt.get("pvc_name"))
                for suffix, key in (
                        ("available", "availableBytes"),
                        ("capacity", "capacityBytes"),
                        ("inodes", "inodes"),
                        ("inodes.free", "inodesFree"),
                        ("inodes.used", "inodesUsed")):
                    val = _n(v, key)
                    if val is not None:
                        em.emit(f"k8s.volume.{suffix}", val, None,
                                res=vres)
    return em.rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("interface", pa.string()), ("direction", pa.string()),
           ("node_name", pa.string()), ("pod_uid", pa.string()),
           ("pod_name", pa.string()), ("namespace", pa.string()),
           ("container_name", pa.string()),
           ("volume_name", pa.string()), ("volume_type", pa.string()),
           ("pvc_name", pa.string()),
           ("start_time_unix_nano", pa.int64()),
           ("time_unix_nano", pa.int64()))


class _ParseKubelet:
    def __init__(self, doc_col, kw):
        self.doc_col = doc_col
        self.kw = kw

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in summary_to_rows(doc, **self.kw):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row.get(k))
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_kubeletstats(ds, doc_col: str = "summary_json", **kw):
    """kubelet summary documents → k8s.*/container.* metric rows."""
    return ds.map_batches(_ParseKubelet(doc_col, kw),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
