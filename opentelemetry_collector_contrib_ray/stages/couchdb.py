"""couchdbreceiver analog: ``/_node/<n>/_stats/couchdb`` JSON →
the 8-metric couchdb.* table.

Parity with receiver/couchdbreceiver (scraper.go:46-77,
metrics.go:15-185, metadata.yaml):

- input is the node-stats JSON body (client.go:80-88 unmarshals into
  ``map[string]any`` — every JSON number lands as float64, so the
  reference's ``parseInt`` int64 branch is dead code and ints arrive
  via the float64→int64 TRUNCATION branch); the HTTP GET is ingest
  transport, ``time.Now()`` is ``now_ns``.
- nested-path reads (metrics.go:154-168 getValueFromBody): a missing
  key or non-map interior node is a PARTIAL scrape error — that
  datapoint is skipped, the rest still emit.
- the metric set: request_time.value.arithmetic_mean → double Gauge;
  httpd.bulk_requests; httpd_request_methods.{COPY,DELETE,GET,HEAD,
  OPTIONS,POST,PUT}.value → requests with http.method;
  httpd_status_codes.{24 codes}.value → responses with
  http.status_code; httpd.{temporary_view_reads,view_reads}.value →
  views; open_databases / open_os_files non-monotonic Sums;
  database_{reads,writes}.value → operations with the operation attr.
- non-numeric values fail parseInt/parseFloat (bool included — Go's
  ``any`` holds bool, not float64) and drop the datapoint.
- resource: couchdb.node.name = the configured endpoint.

Execution: per-doc JSON decode in a task map fanning out one row per
present metric, block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

HTTP_METHODS = ("COPY", "DELETE", "GET", "HEAD", "OPTIONS", "POST",
                "PUT")
STATUS_CODES = ("200", "201", "202", "204", "206", "301", "302", "304",
                "400", "401", "403", "404", "405", "406", "409", "412",
                "413", "414", "415", "416", "417", "500", "501", "503")
VIEWS = ("temporary_view_reads", "view_reads")


def get_value_from_body(keys, body):
    cur = body
    for k in keys:
        if not isinstance(cur, dict) or k not in cur:
            return None
        cur = cur[k]
    return cur


def _parse_int(v) -> int | None:
    """metrics.go:170-178 via Go json-any semantics: numbers are
    float64, int64(float64) truncates toward zero; bools/strings
    error."""
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    return int(v)  # Python int() on float truncates toward zero


def _parse_float(v) -> float | None:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return None
    return float(v)


def couchdb_stats_to_rows(doc: str, *, node_name: str = "",
                          now_ns: int = 0) -> list[dict]:
    """One node-stats JSON body → couchdb.* rows (scraper.go:65-72
    record order; per-datapoint skips on missing paths / bad types).
    An undecodable body fails the whole scrape (GetStats error)."""
    try:
        stats = json.loads(doc)
        if not isinstance(stats, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []

    rows: list[dict] = []

    def emit(name, mtype, mono, vi, vd, **attrs):
        rows.append({
            "name": name, "mtype": mtype,
            "is_monotonic": mono if mtype == "sum" else None,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vi, "value_double": vd,
            "http_method": attrs.get("http_method"),
            "http_status_code": attrs.get("http_status_code"),
            "view": attrs.get("view"),
            "operation": attrs.get("operation"),
            "node_name": node_name, "time_unix_nano": now_ns})

    v = _parse_float(get_value_from_body(
        ("request_time", "value", "arithmetic_mean"), stats))
    if v is not None:
        emit("couchdb.average_request_time", "gauge", None, None, v)

    i = _parse_int(get_value_from_body(
        ("httpd", "bulk_requests", "value"), stats))
    if i is not None:
        emit("couchdb.httpd.bulk_requests", "sum", True, i, None)

    for method in HTTP_METHODS:
        i = _parse_int(get_value_from_body(
            ("httpd_request_methods", method, "value"), stats))
        if i is not None:
            emit("couchdb.httpd.requests", "sum", True, i, None,
                 http_method=method)

    for code in STATUS_CODES:
        i = _parse_int(get_value_from_body(
            ("httpd_status_codes", code, "value"), stats))
        if i is not None:
            emit("couchdb.httpd.responses", "sum", True, i, None,
                 http_status_code=code)

    for view in VIEWS:
        i = _parse_int(get_value_from_body(("httpd", view, "value"),
                                           stats))
        if i is not None:
            emit("couchdb.httpd.views", "sum", True, i, None, view=view)

    i = _parse_int(get_value_from_body(("open_databases", "value"),
                                       stats))
    if i is not None:
        emit("couchdb.database.open", "sum", False, i, None)

    i = _parse_int(get_value_from_body(("open_os_files", "value"),
                                       stats))
    if i is not None:
        emit("couchdb.file_descriptor.open", "sum", False, i, None)

    for op, key in (("reads", "database_reads"),
                    ("writes", "database_writes")):
        i = _parse_int(get_value_from_body((key, "value"), stats))
        if i is not None:
            emit("couchdb.database.operations", "sum", True, i, None,
                 operation=op)
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("http_method", pa.string()),
           ("http_status_code", pa.string()), ("view", pa.string()),
           ("operation", pa.string()), ("node_name", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseCouchdb:
    def __init__(self, doc_col, node_name, now_ns):
        self.doc_col = doc_col
        self.node_name = node_name
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in couchdb_stats_to_rows(
                    doc, node_name=self.node_name, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_couchdb(ds, doc_col: str = "stats_json", *,
                  node_name: str = "", now_ns: int = 0):
    """couchdb node-stats JSON docs → couchdb.* metric rows."""
    return ds.map_batches(_ParseCouchdb(doc_col, node_name, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
