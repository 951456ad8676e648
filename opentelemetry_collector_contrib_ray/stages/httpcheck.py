"""httpcheckreceiver analog: synthetic-check results → httpcheck.*
metric rows.

Parity with receiver/httpcheckreceiver (scraper.go:152-345,
metadata.yaml):

- the live HTTP probe (httptrace timings, TLS handshake, redirects) is
  ingest transport; the covered data path is the response→metrics
  mapping.  Input is one check-result record per row: endpoint,
  method, status_code (0 / absent on request error), error message,
  the six duration fields in ms, optional TLS certificate info.
- httpcheck.status (scraper.go:305-330): ALWAYS five rows, one per
  class 1xx..5xx — the matching class (statusCode/100) gets value 1
  with the http.status_code attr, every other class gets value 0 and
  the post-emit pass removeStatusCodeForZeroValues (scraper.go:347-373)
  STRIPS http.status_code from zero-valued points.  On a request error
  statusCode is 0, so all five rows are zero-valued and code-less.
  Non-monotonic cumulative int Sum.
- httpcheck.error: one row with error.message only when the request
  errored; httpcheck.duration: always.  The five timing gauges
  (dns.lookup/client.connection(+network.transport="tcp")/
  tls.handshake/client.request/response) are recorded unconditionally
  but default-DISABLED in metadata.yaml.
- httpcheck.tls.cert_remaining (default-disabled): when enabled and
  TLS info is present (issuer/cn/san non-empty) the reference records
  the datapoint TWICE — the identical block appears at
  scraper.go:253-267 AND :288-302 — so two identical rows emit; the
  quirk is reproduced and test-pinned.  http.tls.san is a slice attr
  (JSON string column here), ordered IPs → URIs → DNS names → emails
  (extractTLSInfo, scraper.go:76-106).

Execution: per-result decode in a task map fanning out ≤13 rows per
check, block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# name -> (mtype, monotonic, default_enabled)
METRICS = {
    "httpcheck.status": ("sum", False, True),
    "httpcheck.duration": ("gauge", None, True),
    "httpcheck.error": ("sum", False, True),
    "httpcheck.tls.cert_remaining": ("gauge", None, False),
    "httpcheck.dns.lookup.duration": ("gauge", None, False),
    "httpcheck.client.connection.duration": ("gauge", None, False),
    "httpcheck.tls.handshake.duration": ("gauge", None, False),
    "httpcheck.client.request.duration": ("gauge", None, False),
    "httpcheck.response.duration": ("gauge", None, False),
}

DEFAULT_ENABLED = frozenset(n for n, s in METRICS.items() if s[2])

_CLASSES = (("1xx", 1), ("2xx", 2), ("3xx", 3), ("4xx", 4), ("5xx", 5))


def check_to_rows(result: dict, *, enabled=None,
                  now_ns: int = 0) -> list[dict]:
    """One check result → httpcheck.* rows (scraper.go:252-345)."""
    en = DEFAULT_ENABLED if enabled is None else set(enabled)
    rows: list[dict] = []
    endpoint = result.get("endpoint") or ""
    method = result.get("method") or "GET"
    err = result.get("error")

    def emit(name, vi, **attrs):
        if name not in en:
            return
        mt, mono, _d = METRICS[name]
        rows.append({
            "name": name, "mtype": mt,
            "is_monotonic": mono,
            "aggregation_temporality": 2 if mt == "sum" else 0,
            "value_int": int(vi),
            "http_url": endpoint,
            "http_status_code": attrs.get("status_code"),
            "http_method": attrs.get("method"),
            "http_status_class": attrs.get("status_class"),
            "error_message": attrs.get("error_message"),
            "tls_issuer": attrs.get("tls_issuer"),
            "tls_cn": attrs.get("tls_cn"),
            "tls_san": attrs.get("tls_san"),
            "network_transport": attrs.get("network_transport"),
            "time_unix_nano": now_ns})

    def record_tls():
        # the duplicated block: fires twice per response when enabled
        tls = result.get("tls")
        if not isinstance(tls, dict):
            return
        issuer = tls.get("issuer") or ""
        cn = tls.get("cn") or ""
        san = tls.get("san") or []
        if issuer or cn or san:
            emit("httpcheck.tls.cert_remaining",
                 int(tls.get("time_left", 0)),
                 tls_issuer=issuer, tls_cn=cn,
                 tls_san=json.dumps(san, separators=(",", ":")))

    if err is None:
        record_tls()
    # timing breakdown (recorded unconditionally, default-disabled)
    emit("httpcheck.duration", int(result.get("duration_ms", 0)))
    emit("httpcheck.dns.lookup.duration", int(result.get("dns_ms", 0)))
    emit("httpcheck.client.connection.duration",
         int(result.get("tcp_ms", 0)), network_transport="tcp")
    emit("httpcheck.tls.handshake.duration",
         int(result.get("tls_ms", 0)))
    emit("httpcheck.client.request.duration",
         int(result.get("request_ms", 0)))
    emit("httpcheck.response.duration",
         int(result.get("response_ms", 0)))
    if err is None:
        record_tls()  # scraper.go:288-302 — the second identical record

    status_code = 0
    if err is not None:
        emit("httpcheck.error", 1, error_message=str(err))
    else:
        status_code = int(result.get("status_code", 0))

    for cls, ival in _CLASSES:
        if status_code // 100 == ival:
            emit("httpcheck.status", 1, status_code=status_code,
                 method=method, status_class=cls)
        else:
            # zero value: http.status_code REMOVED post-emit
            emit("httpcheck.status", 0, status_code=None,
                 method=method, status_class=cls)
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("http_url", pa.string()),
           ("http_status_code", pa.int64()),
           ("http_method", pa.string()),
           ("http_status_class", pa.string()),
           ("error_message", pa.string()),
           ("tls_issuer", pa.string()), ("tls_cn", pa.string()),
           ("tls_san", pa.string()),
           ("network_transport", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseHttpcheck:
    def __init__(self, doc_col, enabled, now_ns):
        self.doc_col = doc_col
        self.enabled = enabled
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            try:
                result = json.loads(doc)
            except (json.JSONDecodeError, TypeError):
                continue
            if not isinstance(result, dict):
                continue
            for row in check_to_rows(result, enabled=self.enabled,
                                     now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_httpcheck(ds, doc_col: str = "check_json", *,
                    enabled_metrics=None, now_ns: int = 0):
    """Check-result JSON docs → httpcheck.* metric rows."""
    return ds.map_batches(
        _ParseHttpcheck(doc_col,
                        None if enabled_metrics is None
                        else tuple(enabled_metrics), now_ns),
        batch_format="pyarrow", zero_copy_batch=True)
