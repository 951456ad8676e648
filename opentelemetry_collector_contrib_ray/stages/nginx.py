"""nginxreceiver analog: stub_status pages → nginx.* metric rows.

Parity with receiver/nginxreceiver (scraper.go:49-67,
metadata.yaml):

- the page format is nginx's public stub_status module output::

    Active connections: 291
    server accepts handled requests
     16630948 16630948 31070465
    Reading: 6 Writing: 179 Waiting: 106

  parsed like the nginx-prometheus-exporter client the reference
  embeds (a Sscanf over exactly that template; a non-matching page
  fails the scrape and emits nothing).
- mapping (scraper.go:55-62): requests / connections_accepted /
  connections_handled are cumulative monotonic int Sums;
  connections_current is a NON-monotonic cumulative int Sum (not a
  gauge — metadata.yaml:50-56) emitted four times with state
  active/reading/writing/waiting.
- the HTTP GET is ingest transport; time.Now() is ``now_ns``.

Execution: per-doc regex decode in a task map fanning out 7 rows per
page, block-local, zero shuffle.
"""

from __future__ import annotations

import re

import pyarrow as pa

_STUB_RE = re.compile(
    r"Active connections:\s+(\d+)\s*\n"
    r"server accepts handled requests\s*\n"
    r"\s*(\d+)\s+(\d+)\s+(\d+)\s*\n"
    r"Reading:\s*(\d+)\s*Writing:\s*(\d+)\s*Waiting:\s*(\d+)")


def stub_stats_to_rows(page: str, *, now_ns: int = 0) -> list[dict]:
    """One stub_status page → the 7 nginx.* rows (empty when the page
    does not match the template — the scrape fails)."""
    m = _STUB_RE.search(page or "")
    if not m:
        return []
    active, accepted, handled, requests, reading, writing, waiting = (
        int(g) for g in m.groups())
    rows = [
        {"name": "nginx.requests", "is_monotonic": True,
         "value_int": requests, "state": None},
        {"name": "nginx.connections_accepted", "is_monotonic": True,
         "value_int": accepted, "state": None},
        {"name": "nginx.connections_handled", "is_monotonic": True,
         "value_int": handled, "state": None},
        {"name": "nginx.connections_current", "is_monotonic": False,
         "value_int": active, "state": "active"},
        {"name": "nginx.connections_current", "is_monotonic": False,
         "value_int": reading, "state": "reading"},
        {"name": "nginx.connections_current", "is_monotonic": False,
         "value_int": writing, "state": "writing"},
        {"name": "nginx.connections_current", "is_monotonic": False,
         "value_int": waiting, "state": "waiting"},
    ]
    for r in rows:
        r["mtype"] = "sum"
        r["aggregation_temporality"] = 2
        r["time_unix_nano"] = now_ns
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("state", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseNginx:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in stub_stats_to_rows(doc, now_ns=self.now_ns):
                parent.append(i)
                for k, v in row.items():
                    cols[k].append(v)
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_nginx(ds, doc_col: str = "stub_status", *, now_ns: int = 0):
    """stub_status pages → nginx.* metric rows (7 per page)."""
    return ds.map_batches(_ParseNginx(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
