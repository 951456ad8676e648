"""aerospikereceiver analog: node/namespace info string maps → the
14-metric aerospike.* table.

Parity with receiver/aerospikereceiver (scraper.go:112-401,
metadata.yaml):

- input: one info map per row as JSON — ``{"kind": "node" |
  "namespace", "info": {stat: "value", ...}}``; namespace maps carry
  the scraper-injected ``node``/``name`` keys (scraper.go:183-186).
  The aerospike client session (Info / NamespaceInfo) is ingest
  transport, ``time.Now().UTC()`` is ``now_ns``.
- the node 11-case and namespace 92-case key switches (extracted
  mechanically from scraper.go — connection type/op, memory
  component, scan type/result, query type/index/result incl. the
  pi_/si_ primary/secondary families and the legacy un-prefixed
  query_* secondary aliases, geojson counters, client transaction
  type/result).  Unknown keys are ignored; every metric value is
  strconv.ParseInt — a bad value drops that datapoint (partial
  error).
- attr wire keys are the metadata ``name_override``s: type /
  operation / component / index / result.
- typing: node.memory.free / namespace.memory.free / disk.available
  are int GAUGES (the *_pct stats); connection.open and memory.usage
  non-monotonic Sums; everything else monotonic Sums.
- resources: node → aerospike.node.name; namespace → node name +
  aerospike.namespace.

Execution: per-map JSON decode task map, block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# metric -> (mtype, monotonic|None, attr column names in order)
_TYPES = {
    "aerospike.node.memory.free": ("gauge", None, ()),
    "aerospike.node.connection.count": ("sum", True,
                                        ("type", "operation")),
    "aerospike.node.connection.open": ("sum", False, ("type",)),
    "aerospike.node.query.tracked": ("sum", True, ()),
    "aerospike.namespace.memory.usage": ("sum", False, ("component",)),
    "aerospike.namespace.memory.free": ("gauge", None, ()),
    "aerospike.namespace.disk.available": ("gauge", None, ()),
    "aerospike.namespace.scan.count": ("sum", True,
                                       ("type", "result")),
    "aerospike.namespace.query.count": ("sum", True,
                                        ("type", "index", "result")),
    "aerospike.namespace.geojson.region_query_cells":
        ("sum", True, ()),
    "aerospike.namespace.geojson.region_query_false_positive":
        ("sum", True, ()),
    "aerospike.namespace.geojson.region_query_points":
        ("sum", True, ()),
    "aerospike.namespace.geojson.region_query_requests":
        ("sum", True, ()),
    "aerospike.namespace.transaction.count": ("sum", True,
                                              ("type", "result")),
}

# the node switch (scraper.go:140-166): key -> (metric, attr values)
NODE_KEYS = {
    "client_connections": ("aerospike.node.connection.open",
                           ("client",)),
    "fabric_connections": ("aerospike.node.connection.open",
                           ("fabric",)),
    "heartbeat_connections": ("aerospike.node.connection.open",
                              ("heartbeat",)),
    "client_connections_closed": ("aerospike.node.connection.count",
                                  ("client", "close")),
    "client_connections_opened": ("aerospike.node.connection.count",
                                  ("client", "open")),
    "fabric_connections_closed": ("aerospike.node.connection.count",
                                  ("fabric", "close")),
    "fabric_connections_opened": ("aerospike.node.connection.count",
                                  ("fabric", "open")),
    "heartbeat_connections_closed":
        ("aerospike.node.connection.count", ("heartbeat", "close")),
    "heartbeat_connections_opened":
        ("aerospike.node.connection.count", ("heartbeat", "open")),
    "system_free_mem_pct": ("aerospike.node.memory.free", ()),
    "query_tracked": ("aerospike.node.query.tracked", ()),
}


def _scan(t, r):
    return ("aerospike.namespace.scan.count", (t, r))


def _qry(t, i, r):
    return ("aerospike.namespace.query.count", (t, i, r))


def _txn(t, r):
    return ("aerospike.namespace.transaction.count", (t, r))


NAMESPACE_KEYS = {
    "device_available_pct": ("aerospike.namespace.disk.available", ()),
    "memory_free_pct": ("aerospike.namespace.memory.free", ()),
    "memory_used_data_bytes": ("aerospike.namespace.memory.usage",
                               ("data",)),
    "memory_used_index_bytes": ("aerospike.namespace.memory.usage",
                                ("index",)),
    "memory_used_sindex_bytes": ("aerospike.namespace.memory.usage",
                                 ("secondary_index",)),
    "memory_used_set_index_bytes":
        ("aerospike.namespace.memory.usage", ("set_index",)),
    "geo_region_query_cells":
        ("aerospike.namespace.geojson.region_query_cells", ()),
    "geo_region_query_falsepos":
        ("aerospike.namespace.geojson.region_query_false_positive",
         ()),
    "geo_region_query_points":
        ("aerospike.namespace.geojson.region_query_points", ()),
    "geo_region_query_reqs":
        ("aerospike.namespace.geojson.region_query_requests", ()),
}
for _t in ("aggr", "basic", "ops_bg", "udf_bg"):
    _tn = {"aggr": "aggregation", "basic": "basic",
           "ops_bg": "ops_background", "udf_bg": "udf_background"}[_t]
    for _r in ("abort", "complete", "error"):
        NAMESPACE_KEYS[f"scan_{_t}_{_r}"] = _scan(_tn, _r)
        # legacy un-prefixed query_* keys are SECONDARY index
        NAMESPACE_KEYS[f"query_{_t}_{_r}"] = _qry(_tn, "secondary", _r)
# pi_/si_ families (scraper.go:264-340) — note the ops_bg_basic_*
# spellings and short_basic's timeout-instead-of-abort
for _pfx, _idx in (("pi", "primary"), ("si", "secondary")):
    for _t, _tn in (("aggr", "aggregation"),
                    ("long_basic", "long_basic"),
                    ("udf_bg", "udf_background")):
        for _r in ("abort", "complete", "error"):
            NAMESPACE_KEYS[f"{_pfx}_query_{_t}_{_r}"] = _qry(_tn, _idx,
                                                             _r)
    NAMESPACE_KEYS[f"{_pfx}_query_ops_bg_abort"] = _qry(
        "ops_background", _idx, "abort")
    NAMESPACE_KEYS[f"{_pfx}_query_ops_bg_basic_complete"] = _qry(
        "ops_background", _idx, "complete")
    NAMESPACE_KEYS[f"{_pfx}_query_ops_bg_basic_error"] = _qry(
        "ops_background", _idx, "error")
    for _r in ("timeout", "complete", "error"):
        NAMESPACE_KEYS[f"{_pfx}_query_short_basic_{_r}"] = _qry(
            "short_basic", _idx, _r)
for _t in ("delete", "read", "udf", "write"):
    for _r in ("error", "filtered_out", "not_found", "success",
               "timeout"):
        NAMESPACE_KEYS[f"client_{_t}_{_r}"] = _txn(_t, _r)


def _parse_int(v):
    s = v if isinstance(v, str) else ""
    if not s or s.strip() != s or "_" in s:
        return None
    try:
        n = int(s, 10)
    except ValueError:
        return None
    return n if -(1 << 63) <= n < (1 << 63) else None


def info_to_rows(doc: str, *, now_ns: int = 0) -> list[dict]:
    """One {kind, info} document → aerospike.* rows."""
    try:
        d = json.loads(doc)
        if not isinstance(d, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    kind = d.get("kind") or ""
    info = d.get("info") or {}
    if not isinstance(info, dict):
        return []
    table = NODE_KEYS if kind == "node" else NAMESPACE_KEYS
    node = str(info.get("node", "") or "")
    namespace = (str(info.get("name", "") or "")
                 if kind == "namespace" else None)
    rows = []
    for k, v in info.items():
        spec = table.get(k)
        if spec is None:
            continue
        name, attrs = spec
        val = _parse_int(v)
        if val is None:
            continue  # addPartialIfError: datapoint dropped
        mtype, mono, attr_cols = _TYPES[name]
        row = {"name": name, "mtype": mtype, "is_monotonic": mono,
               "aggregation_temporality": 2 if mtype == "sum" else 0,
               "value_int": val, "type": None, "operation": None,
               "component": None, "index": None, "result": None,
               "node_name": node, "namespace": namespace,
               "time_unix_nano": now_ns}
        for col, av in zip(attr_cols, attrs):
            row[col] = av
        rows.append(row)
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("type", pa.string()),
           ("operation", pa.string()), ("component", pa.string()),
           ("index", pa.string()), ("result", pa.string()),
           ("node_name", pa.string()), ("namespace", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseAerospike:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in info_to_rows(doc, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_aerospike(ds, doc_col: str = "info_json", *,
                    now_ns: int = 0):
    """Aerospike info-map documents → aerospike.* metric rows."""
    return ds.map_batches(_ParseAerospike(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
