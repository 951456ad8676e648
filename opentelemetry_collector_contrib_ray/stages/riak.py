"""riakreceiver analog: ``/stats`` JSON → the 6-metric riak.* table.

Parity with receiver/riakreceiver (scraper.go:66-95,
internal/model/model.go, metadata.yaml):

- input is the Riak ``/stats`` JSON body; Go unmarshals it into a
  struct of int64 fields (model.go:8-23), so a FRACTIONAL float or a
  string in any mapped field fails the WHOLE unmarshal → the whole
  scrape errors and emits nothing (the firehose-timestamp rule);
  integral floats (``1e3``) unmarshal fine; missing fields read 0.
- mapping (scraper.go:66-91): node_gets/node_puts →
  node.operation.count (monotonic, request=get/put);
  node_{get,put}_fsm_time_mean → node.operation.time.mean int Gauges;
  read_repairs_total → node.read_repair.count; mem_allocated →
  memory.limit (non-monotonic); vnode_gets/puts →
  vnode.operation.count (monotonic); vnode_index_{reads,writes,
  deletes} → vnode.index.operation.count (NON-monotonic,
  operation=read/write/delete).
- resource: riak.node.name = the ``nodename`` field.

Execution: per-doc JSON decode task map, 11 rows per node, block-local,
zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# (json field, metric, mtype, monotonic, request attr, operation attr)
_FIELDS = (
    ("node_gets", "riak.node.operation.count", "sum", True, "get",
     None),
    ("node_puts", "riak.node.operation.count", "sum", True, "put",
     None),
    ("node_get_fsm_time_mean", "riak.node.operation.time.mean",
     "gauge", None, "get", None),
    ("node_put_fsm_time_mean", "riak.node.operation.time.mean",
     "gauge", None, "put", None),
    ("read_repairs_total", "riak.node.read_repair.count", "sum", True,
     None, None),
    ("mem_allocated", "riak.memory.limit", "sum", False, None, None),
    ("vnode_gets", "riak.vnode.operation.count", "sum", True, "get",
     None),
    ("vnode_puts", "riak.vnode.operation.count", "sum", True, "put",
     None),
    ("vnode_index_reads", "riak.vnode.index.operation.count", "sum",
     False, None, "read"),
    ("vnode_index_writes", "riak.vnode.index.operation.count", "sum",
     False, None, "write"),
    ("vnode_index_deletes", "riak.vnode.index.operation.count", "sum",
     False, None, "delete"),
)

_INT_FIELDS = tuple(f for f, *_ in _FIELDS)


def riak_stats_to_rows(doc: str, *, now_ns: int = 0) -> list[dict]:
    """One /stats body → the 11 riak.* rows; any non-integral mapped
    field fails the whole scrape (Go int64-struct unmarshal)."""
    try:
        stats = json.loads(doc)
        if not isinstance(stats, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    vals = {}
    for f in _INT_FIELDS:
        v = stats.get(f, 0)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return []  # whole-unmarshal error
        if isinstance(v, float):
            if v != int(v):
                return []  # fractional float into int64 field
            v = int(v)
        vals[f] = v
    node = stats.get("nodename")
    node = node if isinstance(node, str) else ""

    rows = []
    for f, name, mtype, mono, req, op in _FIELDS:
        rows.append({
            "name": name, "mtype": mtype,
            "is_monotonic": mono,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vals[f], "request": req, "operation": op,
            "node_name": node, "time_unix_nano": now_ns})
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("request", pa.string()),
           ("operation", pa.string()), ("node_name", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseRiak:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in riak_stats_to_rows(doc, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_riak(ds, doc_col: str = "stats_json", *, now_ns: int = 0):
    """Riak /stats JSON docs → riak.* metric rows (11 per node)."""
    return ds.map_batches(_ParseRiak(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
