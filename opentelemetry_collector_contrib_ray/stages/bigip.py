"""bigipreceiver analog: F5 iControl REST stats entries → the
26-metric bigip.* table.

Parity with receiver/bigipreceiver (scraper.go:140-303,
internal/models, metadata.yaml):

- input is one ENTITY document per row: ``{"kind": "virtual_server" |
  "pool" | "pool_member" | "node", "entries": {<the nestedStats
  entries object — "clientside.bitsIn": {"value": n},
  "status.availabilityState": {"description": "..."}, ...>}}``.
  The token login, the /virtual property merge (destination/pool
  enrichment) and the per-pool member crawl are ingest transport.
- per kind: bits in/out → data.transmitted (direction received/sent),
  curConns → connection.count, pkts in/out → packet.count,
  totRequests → request.count; pool_member/node add curSessions →
  session.count; pool adds member counts with the DERIVED inactive =
  memberCnt − activeMemberCnt (scraper.go:188-190).  Virtual servers
  read the clientside.* fields, everything else serverside.*.
- availability / enabled are int GAUGES (three/two one-hot rows, HasPrefix matching): a
  description starting ``available`` → available=1, ``offline`` →
  offline=1, anything else → unknown=1.  enabled (two rows):
  HasPrefix ``enabled`` → enabled=1 else disabled=1.  Missing
  descriptions behave as "" (unknown / disabled) — Go zero values.
- resources: virtual server name/destination/pool; pool tmName;
  pool member ``nodeName:port`` + addr + pool; node tmName + addr.

Execution: per-entity JSON decode task map, block-local, zero
shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# kind -> (metric prefix, side prefix for the counters)
_KINDS = {
    "virtual_server": ("bigip.virtual_server.", "clientside"),
    "pool": ("bigip.pool.", "serverside"),
    "pool_member": ("bigip.pool_member.", "serverside"),
    "node": ("bigip.node.", "serverside"),
}

_HAS_SESSIONS = {"pool_member", "node"}


def _v(entries: dict, key: str) -> int:
    e = entries.get(key)
    v = e.get("value") if isinstance(e, dict) else None
    return int(v) if isinstance(v, (int, float)) \
        and not isinstance(v, bool) else 0


def _d(entries: dict, key: str) -> str:
    e = entries.get(key)
    v = e.get("description") if isinstance(e, dict) else None
    return v if isinstance(v, str) else ""


def entity_to_rows(doc: str, *, now_ns: int = 0) -> list[dict]:
    try:
        d = json.loads(doc)
        if not isinstance(d, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    kind = d.get("kind") or ""
    spec = _KINDS.get(kind)
    entries = d.get("entries")
    if spec is None or not isinstance(entries, dict):
        return []
    prefix, side = spec
    rows: list[dict] = []
    name = _d(entries, "tmName")
    res = {
        "entity_name": (f"{_d(entries, 'nodeName')}:"
                        f"{_v(entries, 'port')}"
                        if kind == "pool_member" else name),
        "destination": (_d(entries, "destination")
                        if kind == "virtual_server" else None),
        "pool_name": (_d(entries, "poolName")
                      if kind in ("virtual_server", "pool_member")
                      else name if kind == "pool" else None),
        "ip_address": (_d(entries, "addr")
                       if kind in ("pool_member", "node") else None),
    }

    def emit(suffix, vi, *, direction=None, active=None, avail=None,
             enabled=None, mtype="sum", mono=False):
        rows.append({
            "name": prefix + suffix, "mtype": mtype,
            "is_monotonic": mono if mtype == "sum" else None,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vi, "direction": direction,
            "active_status": active, "availability_status": avail,
            "enabled_status": enabled, "kind": kind,
            "time_unix_nano": now_ns, **res})

    emit("data.transmitted", _v(entries, f"{side}.bitsIn"),
         direction="received", mono=True)
    emit("data.transmitted", _v(entries, f"{side}.bitsOut"),
         direction="sent", mono=True)
    emit("connection.count", _v(entries, f"{side}.curConns"))
    emit("packet.count", _v(entries, f"{side}.pktsIn"),
         direction="received", mono=True)
    emit("packet.count", _v(entries, f"{side}.pktsOut"),
         direction="sent", mono=True)
    emit("request.count", _v(entries, "totRequests"), mono=True)
    if kind in _HAS_SESSIONS:
        emit("session.count", _v(entries, "curSessions"))
    if kind == "pool":
        active = _v(entries, "activeMemberCnt")
        emit("member.count", active, active="active")
        emit("member.count", _v(entries, "memberCnt") - active,
             active="inactive")

    avail = _d(entries, "status.availabilityState")
    if avail.startswith("available"):
        one_hot = (0, 0, 1)
    elif avail.startswith("offline"):
        one_hot = (1, 0, 0)
    else:
        one_hot = (0, 1, 0)
    for val, st in zip(one_hot, ("offline", "unknown", "available")):
        emit("availability", val, avail=st, mtype="gauge")
    enabled = _d(entries, "status.enabledState")
    on = 1 if enabled.startswith("enabled") else 0
    emit("enabled", 1 - on, enabled="disabled", mtype="gauge")
    emit("enabled", on, enabled="enabled", mtype="gauge")
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("direction", pa.string()),
           ("active_status", pa.string()),
           ("availability_status", pa.string()),
           ("enabled_status", pa.string()), ("kind", pa.string()),
           ("entity_name", pa.string()), ("destination", pa.string()),
           ("pool_name", pa.string()), ("ip_address", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseBigip:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in entity_to_rows(doc, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_bigip(ds, doc_col: str = "entity_json", *, now_ns: int = 0):
    """F5 stats-entry documents → bigip.* metric rows."""
    return ds.map_batches(_ParseBigip(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
