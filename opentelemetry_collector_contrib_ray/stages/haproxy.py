"""haproxyreceiver analog: `show stat` CSV pages → haproxy.* metric
rows.

Parity with receiver/haproxyreceiver (scraper.go:40-281,
metadata.yaml):

- ``readStats`` (scraper.go:259-281): Go encoding/csv over the
  trimmed page, first header cell strips the ``# `` prefix, every
  row keyed by header name; Go's csv rejects rows whose field count
  differs from the header's (the whole scrape errors).
- per record, each non-empty stat field emits its metric datapoint
  (scraper.go:83-245): scur/conn_rate int Gauges; req_rate/ttime/rate
  double Gauges; the rest cumulative monotonic int Sums;
  hrsp_1xx..hrsp_other all feed ``haproxy.requests.total`` with the
  status_code attribute; ``haproxy.responses.errors`` is the one
  DERIVED value — emitted only when BOTH ``eresp`` and ``srv_abrt``
  are non-empty, value = srv_abrt + eresp (scraper.go:163-175; a
  ParseInt failure contributes 0 and records a scrape error, the
  datapoint is still emitted).
- strconv parse failures on any other field record a scrape error
  and drop that one datapoint (generated MetricsBuilder semantics).
- default-disabled metrics (metadata.yaml ``enabled: false``):
  connections.total, clients.canceled, compression.{bypass,input,
  output,count}, downtime, failed_checks, sessions.total — recorded
  by the scraper but dropped by the builder unless enabled via the
  ``enabled_metrics`` config (expvar precedent).
- per-record resource: haproxy.proxy_name = pxname,
  haproxy.service_name = svname, haproxy.addr = the endpoint config
  (scraper.go:246-250); time.Now() becomes the ``now_ns`` config.
- the unix-socket/HTTP ``;csv`` fetch is the ingest transport (the
  scraper scope row); this stage starts at the page text.

Execution: per-doc CSV decode in a task map fanning out one row per
(record, present metric), block-local, zero shuffle.
"""

from __future__ import annotations

import csv
import io

import pyarrow as pa

# (csv field, metric suffix, mtype, monotonic, double, status_code,
#  default-enabled) in scraper.go emission order
_FIELDS = (
    ("scur", "sessions.count", "gauge", False, False, None, True),
    ("conn_rate", "connections.rate", "gauge", False, False, None,
     True),
    ("conn_tot", "connections.total", "sum", True, False, None,
     False),
    ("lbtot", "server_selected.total", "sum", True, False, None,
     True),
    ("bin", "bytes.input", "sum", True, False, None, True),
    ("bout", "bytes.output", "sum", True, False, None, True),
    ("cli_abrt", "clients.canceled", "sum", True, False, None, False),
    ("comp_byp", "compression.bypass", "sum", True, False, None,
     False),
    ("comp_in", "compression.input", "sum", True, False, None, False),
    ("comp_out", "compression.output", "sum", True, False, None,
     False),
    ("comp_rsp", "compression.count", "sum", True, False, None,
     False),
    ("dreq", "requests.denied", "sum", True, False, None, True),
    ("dresp", "responses.denied", "sum", True, False, None, True),
    ("downtime", "downtime", "sum", True, False, None, False),
    ("econ", "connections.errors", "sum", True, False, None, True),
    ("ereq", "requests.errors", "sum", True, False, None, True),
    # responses.errors (eresp + srv_abrt) is special-cased inline
    ("chkfail", "failed_checks", "sum", True, False, None, False),
    ("wredis", "requests.redispatched", "sum", True, False, None,
     True),
    ("hrsp_1xx", "requests.total", "sum", True, False, "1xx", True),
    ("hrsp_2xx", "requests.total", "sum", True, False, "2xx", True),
    ("hrsp_3xx", "requests.total", "sum", True, False, "3xx", True),
    ("hrsp_4xx", "requests.total", "sum", True, False, "4xx", True),
    ("hrsp_5xx", "requests.total", "sum", True, False, "5xx", True),
    ("hrsp_other", "requests.total", "sum", True, False, "other",
     True),
    ("wretr", "connections.retries", "sum", True, False, None, True),
    ("stot", "sessions.total", "sum", True, False, None, False),
    ("qcur", "requests.queued", "sum", True, False, None, True),
    ("req_rate", "requests.rate", "gauge", False, True, None, True),
    ("ttime", "sessions.average", "gauge", False, True, None, True),
    ("rate", "sessions.rate", "gauge", False, True, None, True),
)
PREFIX = "haproxy."
# where responses.errors sits in emission order (after ereq)
_RESP_ERRORS_AFTER = "ereq"


def read_stats(page: str) -> list[dict]:
    """CSV stats page → per-record field dicts (scraper.go readStats).

    Raises ValueError on an empty page or a row whose field count
    differs from the header's (Go csv.ReadAll semantics)."""
    reader = csv.reader(io.StringIO(page.strip()))
    try:
        headers = next(reader)
    except StopIteration:
        raise ValueError("EOF") from None
    if headers and headers[0].startswith("# "):
        headers[0] = headers[0][2:]
    out = []
    for row in reader:
        if len(row) != len(headers):
            raise ValueError(
                f"record on line {reader.line_num}: wrong number of "
                f"fields")
        out.append(dict(zip(headers, row)))
    return out


def stats_to_rows(page: str, *, endpoint: str = "",
                  enabled_metrics=(), now_ns: int = 0) -> list[dict]:
    """One stats page → flat metric rows (one per record × present
    enabled metric), with the derived responses.errors and the
    parse-failure drop semantics."""
    enabled = set(enabled_metrics)
    rows = []

    def emit(rec, suffix, mtype, mono, vi=None, vd=None, status=None):
        rows.append({
            "pxname": rec.get("pxname", ""),
            "svname": rec.get("svname", ""),
            "haproxy_addr": endpoint,
            "name": PREFIX + suffix, "mtype": mtype,
            "is_monotonic": mono,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vi, "value_double": vd,
            "status_code": status, "time_unix_nano": now_ns})

    for rec in read_stats(page):
        for (field, suffix, mtype, mono, dbl, status,
             default_on) in _FIELDS:
            if not default_on and (PREFIX + suffix not in enabled
                                   and suffix not in enabled):
                continue
            raw = rec.get(field, "")
            if raw != "":
                try:
                    if dbl:
                        emit(rec, suffix, mtype, mono, vd=float(raw),
                             status=status)
                    else:
                        emit(rec, suffix, mtype, mono, vi=int(raw),
                             status=status)
                except ValueError:
                    pass  # scrape error, datapoint dropped
            if field == _RESP_ERRORS_AFTER:
                # independent of ereq's own presence/parse
                # (scraper.go:163-175 is its own if block)
                eresp, aborts = rec.get("eresp", ""), rec.get(
                    "srv_abrt", "")
                if eresp != "" and aborts != "":
                    def _i(s):
                        try:
                            return int(s)
                        except ValueError:
                            return 0  # error recorded, 0 contributed
                    emit(rec, "responses.errors", "sum", True,
                         vi=_i(aborts) + _i(eresp))
    return rows


_SCHEMA = (("pxname", pa.string()), ("svname", pa.string()),
           ("haproxy_addr", pa.string()), ("name", pa.string()),
           ("mtype", pa.string()), ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("status_code", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseHaproxy:
    def __init__(self, doc_col, endpoint, enabled_metrics, now_ns,
                 on_error):
        self.doc_col = doc_col
        self.endpoint = endpoint
        self.enabled_metrics = tuple(enabled_metrics)
        self.now_ns = now_ns
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            try:
                rows = stats_to_rows(
                    doc if doc is not None else "",
                    endpoint=self.endpoint,
                    enabled_metrics=self.enabled_metrics,
                    now_ns=self.now_ns)
            except ValueError:
                if self.on_error == "raise":
                    raise
                continue  # whole scrape fails (scraper.go:52-55)
            for row in rows:
                parent.append(i)
                for k, v in row.items():
                    cols[k].append(v)
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_haproxy(ds, doc_col: str = "stats_csv", *,
                  endpoint: str = "", enabled_metrics=(),
                  now_ns: int = 0, on_error: str = "drop"):
    """`show stat` CSV pages → haproxy.* metric rows."""
    return ds.map_batches(
        _ParseHaproxy(doc_col, endpoint, enabled_metrics, now_ns,
                      on_error),
        batch_format="pyarrow", zero_copy_batch=True)
