"""nsxtreceiver analog: NSX-T node status + interface stats → the
7-metric nsxt.node.* table.

Parity with receiver/nsxtreceiver (scraper.go:56-240,
internal/model/node.go, metadata.yaml):

- input is one NODE document per row: ``{"node": {"id", "name",
  "resource_type"}, "class": "transport" | "manager", "status":
  <raw node-status body>, "interfaces": [{"interface_id", "stats":
  {...} | null}]}`` — the pieces the client assembles; the
  transport-nodes/cluster-nodes/status/interfaces REST walk is ingest
  transport.  Controller cluster nodes (``controller_role`` present)
  are skipped by the CALLER per scraper.go:108-111 (clusterNodeType).
- status unwrap (client.go:87-105): a transport node's status body is
  wrapped as ``{"node_status": {...}}``; a manager node's body IS the
  NodeStatus.
- interface rows (scraper.go:186-206): per-direction packet counts
  with derived ``success = packets − dropped − errors`` (can go
  NEGATIVE — Go does the raw subtraction), network.io rx/tx bytes;
  resource = device.id + node name/id + nsxt.node.type =
  NodeProperties.ResourceType (e.g. ``TransportNode`` /
  ``ClusterNodeConfig``).  The reference nil-derefs stats when the
  per-interface status fetch failed (would panic); here a null stats
  skips that interface's rows — the only deliberate divergence.
- node rows (scraper.go:208-235): dpdk/non-dpdk avg CPU utilization
  gauges (class datapath/services), memory usage + cache int Sums,
  filesystem used/available Sums with derived ``available = total −
  used``, filesystem utilization = ``used / max(total, 1)``
  (div-by-zero safeguard); resource nsxt.node.type = the CLASS string
  (``transport``/``manager``) — NOT resource_type, the reference's
  inconsistency is kept and golden-pinned.

Execution: per-node JSON decode task map, block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa


def node_to_rows(doc: str, *, now_ns: int = 0) -> list[dict]:
    """One node document → nsxt.node.* rows."""
    try:
        info = json.loads(doc)
        if not isinstance(info, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    node = info.get("node") or {}
    cls = info.get("class") or ""
    node_id = node.get("id") or ""
    node_name = node.get("name") or ""
    res_type = node.get("resource_type") or ""
    rows: list[dict] = []

    def emit(name, mtype, mono, vi, vd, *, direction=None, ptype=None,
             cpu_class=None, disk_state=None, device_id=None,
             node_type=None):
        rows.append({
            "name": name, "mtype": mtype,
            "is_monotonic": mono,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vi, "value_double": vd,
            "direction": direction, "packet_type": ptype,
            "cpu_class": cpu_class, "disk_state": disk_state,
            "device_id": device_id, "node_name": node_name,
            "node_id": node_id, "node_type": node_type,
            "time_unix_nano": now_ns})

    # --- interface rows (scraper.go:186-206)
    for iface in info.get("interfaces") or ():
        if not isinstance(iface, dict):
            continue
        st = iface.get("stats")
        if not isinstance(st, dict):
            continue  # reference would nil-deref; we skip
        dev = iface.get("interface_id") or ""

        def g(k):
            v = st.get(k, 0)
            return int(v) if isinstance(v, (int, float)) else 0

        for pre, direction in (("rx", "received"),
                               ("tx", "transmitted")):
            emit("nsxt.node.network.packet.count", "sum", True,
                 g(f"{pre}_dropped"), None, direction=direction,
                 ptype="dropped", device_id=dev, node_type=res_type)
            emit("nsxt.node.network.packet.count", "sum", True,
                 g(f"{pre}_errors"), None, direction=direction,
                 ptype="errored", device_id=dev, node_type=res_type)
            success = (g(f"{pre}_packets") - g(f"{pre}_dropped")
                       - g(f"{pre}_errors"))
            emit("nsxt.node.network.packet.count", "sum", True,
                 success, None, direction=direction, ptype="success",
                 device_id=dev, node_type=res_type)
        emit("nsxt.node.network.io", "sum", True, g("rx_bytes"), None,
             direction="received", device_id=dev, node_type=res_type)
        emit("nsxt.node.network.io", "sum", True, g("tx_bytes"), None,
             direction="transmitted", device_id=dev,
             node_type=res_type)

    # --- node rows (scraper.go:208-235)
    status = info.get("status")
    if isinstance(status, dict):
        if cls == "transport":
            status = status.get("node_status")
        ss = (status or {}).get("system_status") \
            if isinstance(status, dict) else None
        if isinstance(ss, dict):
            cpu = ss.get("cpu_usage") or {}

            def f(d, k):
                v = d.get(k, 0)
                return float(v) if isinstance(v, (int, float)) \
                    and not isinstance(v, bool) else 0.0

            def n(k):
                v = ss.get(k, 0)
                return int(v) if isinstance(v, (int, float)) \
                    and not isinstance(v, bool) else 0

            emit("nsxt.node.cpu.utilization", "gauge", None, None,
                 f(cpu, "avg_cpu_core_usage_dpdk"),
                 cpu_class="datapath", node_type=cls)
            emit("nsxt.node.cpu.utilization", "gauge", None, None,
                 f(cpu, "avg_cpu_core_usage_non_dpdk"),
                 cpu_class="services", node_type=cls)
            emit("nsxt.node.memory.usage", "sum", False,
                 n("mem_used"), None, node_type=cls)
            emit("nsxt.node.memory.cache.usage", "sum", False,
                 n("mem_cache"), None, node_type=cls)
            used = n("disk_space_used")
            total = n("disk_space_total")
            emit("nsxt.node.filesystem.usage", "sum", False, used,
                 None, disk_state="used", node_type=cls)
            emit("nsxt.node.filesystem.usage", "sum", False,
                 total - used, None, disk_state="available",
                 node_type=cls)
            emit("nsxt.node.filesystem.utilization", "gauge", None,
                 None, float(used) / max(float(total), 1.0),
                 node_type=cls)
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("direction", pa.string()), ("packet_type", pa.string()),
           ("cpu_class", pa.string()), ("disk_state", pa.string()),
           ("device_id", pa.string()), ("node_name", pa.string()),
           ("node_id", pa.string()), ("node_type", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseNsxt:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in node_to_rows(doc, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_nsxt(ds, doc_col: str = "node_json", *, now_ns: int = 0):
    """NSX-T node documents → nsxt.node.* metric rows."""
    return ds.map_batches(_ParseNsxt(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
