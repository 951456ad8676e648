"""httpcheckreceiver parity (receiver/httpcheckreceiver/scraper.go,
metadata.yaml) — golden-pinned on metrics_golden.yaml (200 OK) and
invalid_endpoint.yaml (request error), plus the zero-value
status_code-removal pass and the duplicated TLS-record quirk."""

import os

import pytest

from opentelemetry_collector_contrib_ray.stages.httpcheck import (
    METRICS,
    check_to_rows,
)

REF = ("/root/reference/receiver/httpcheckreceiver/testdata/"
       "expected_metrics")

ALL = frozenset(METRICS)


def _golden(name):
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(REF, name)))
    dps = set()
    for rm in exp["resourceMetrics"]:
        for m in rm["scopeMetrics"][0]["metrics"]:
            body = m.get("sum") or m.get("gauge")
            for dp in body["dataPoints"]:
                attrs = tuple(sorted(
                    (a["key"], str(list(a["value"].values())[0]))
                    for a in dp.get("attributes", ())))
                dps.add((m["name"], int(dp.get("asInt", 0)), attrs))
    return dps


def _rows_as_set(rows):
    out = set()
    for r in rows:
        attrs = []
        for col, key in (("http_url", "http.url"),
                         ("http_status_code", "http.status_code"),
                         ("http_method", "http.method"),
                         ("http_status_class", "http.status_class"),
                         ("error_message", "error.message")):
            if r[col] is not None:
                attrs.append((key, str(r[col])))
        out.add((r["name"], r["value_int"], tuple(sorted(attrs))))
    return out


def test_golden_200():
    if not os.path.exists(os.path.join(REF, "metrics_golden.yaml")):
        pytest.skip("reference testdata not present")
    rows = check_to_rows({"endpoint": "http://127.0.0.1:8000",
                          "method": "GET", "status_code": 200,
                          "duration_ms": 0})
    assert _rows_as_set(rows) == _golden("metrics_golden.yaml")


def test_golden_request_error():
    if not os.path.exists(os.path.join(REF, "invalid_endpoint.yaml")):
        pytest.skip("reference testdata not present")
    msg = ('Get "http://invalid-endpoint": dial tcp: '
           "lookup invalid-endpoint: no such host")
    rows = check_to_rows({"endpoint": "http://invalid-endpoint",
                          "method": "GET", "error": msg,
                          "duration_ms": 0})
    assert _rows_as_set(rows) == _golden("invalid_endpoint.yaml")


def test_zero_value_statuscode_removed_and_match():
    rows = check_to_rows({"endpoint": "e", "method": "POST",
                          "status_code": 404, "duration_ms": 7})
    st = {r["http_status_class"]: r for r in rows
          if r["name"] == "httpcheck.status"}
    assert st["4xx"]["value_int"] == 1
    assert st["4xx"]["http_status_code"] == 404
    for cls in ("1xx", "2xx", "3xx", "5xx"):
        assert st[cls]["value_int"] == 0
        assert st[cls]["http_status_code"] is None  # removed post-emit
        assert st[cls]["http_method"] == "POST"
    # non-monotonic sum
    assert st["4xx"]["is_monotonic"] is False
    assert st["4xx"]["aggregation_temporality"] == 2


def test_tls_double_record_quirk_and_timing_gates():
    res = {"endpoint": "https://x", "status_code": 200,
           "duration_ms": 3, "dns_ms": 1, "tcp_ms": 2, "tls_ms": 3,
           "request_ms": 4, "response_ms": 5,
           "tls": {"issuer": "CN=ca", "cn": "x",
                   "san": ["1.2.3.4", "x"], "time_left": 86400}}
    # default set: tls + timing metrics disabled
    names = [r["name"] for r in check_to_rows(res)]
    assert "httpcheck.tls.cert_remaining" not in names
    assert "httpcheck.dns.lookup.duration" not in names
    # all enabled: the duplicated block emits the TLS point TWICE
    rows = check_to_rows(res, enabled=ALL)
    tls_rows = [r for r in rows
                if r["name"] == "httpcheck.tls.cert_remaining"]
    assert len(tls_rows) == 2
    assert tls_rows[0] == tls_rows[1]
    assert tls_rows[0]["tls_san"] == '["1.2.3.4","x"]'
    tcp = [r for r in rows
           if r["name"] == "httpcheck.client.connection.duration"]
    assert tcp[0]["network_transport"] == "tcp"
    # no TLS info -> no record even when enabled
    rows2 = check_to_rows({"endpoint": "https://x", "status_code": 200,
                           "tls": {"issuer": "", "cn": "", "san": []}},
                          enabled=ALL)
    assert all(r["name"] != "httpcheck.tls.cert_remaining"
               for r in rows2)
