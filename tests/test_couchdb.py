"""couchdbreceiver parity (receiver/couchdbreceiver/scraper.go +
metrics.go, metadata.yaml) — golden-pinned on BOTH reference response
fixtures (2.31 and 3.12) vs the shared expected.yaml."""

import json
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.couchdb import (
    couchdb_stats_to_rows,
    get_value_from_body,
)

REF = "/root/reference/receiver/couchdbreceiver/testdata/scraper"


def _golden():
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(REF, "expected.yaml")))
    (rm,) = exp["resourceMetrics"]
    res = {a["key"]: list(a["value"].values())[0]
           for a in rm["resource"]["attributes"]}
    dps = {}
    for m in rm["scopeMetrics"][0]["metrics"]:
        body = m.get("sum") or m.get("gauge")
        for dp in body["dataPoints"]:
            attrs = tuple(sorted(
                (a["key"], list(a["value"].values())[0])
                for a in dp.get("attributes", ())))
            val = (int(dp["asInt"]) if "asInt" in dp
                   else float(dp["asDouble"]))
            dps[(m["name"], attrs)] = ("sum" if "sum" in m else "gauge",
                                       body.get("isMonotonic"), val)
    return res, dps


@pytest.mark.parametrize("resp", ["response_2.31.json",
                                  "response_3.12.json"])
def test_reference_golden(resp):
    path = os.path.join(REF, resp)
    if not os.path.exists(path):
        pytest.skip("reference testdata not present")
    res, exp = _golden()
    node = res["couchdb.node.name"]
    rows = couchdb_stats_to_rows(open(path).read(), node_name=node)
    act = {}
    for r in rows:
        assert r["node_name"] == node
        attrs = []
        for col, key in (("http_method", "http.method"),
                         ("http_status_code", "http.status_code"),
                         ("view", "view"), ("operation", "operation")):
            if r[col] is not None:
                attrs.append((key, r[col]))
        act[(r["name"], tuple(sorted(attrs)))] = (
            r["mtype"], r["is_monotonic"],
            r["value_int"] if r["value_int"] is not None
            else r["value_double"])
    assert set(act) == set(exp), set(act) ^ set(exp)
    for key, (mt, mono, val) in exp.items():
        amt, amono, aval = act[key]
        assert amt == mt and bool(amono) == bool(mono), key
        assert aval == val, (key, aval, val)


def test_partial_skips_and_type_errors():
    doc = json.dumps({
        "request_time": {"value": {"arithmetic_mean": True}},  # bool
        "httpd": {"bulk_requests": {"value": 7},
                  "view_reads": "not-a-map"},
        "httpd_request_methods": {"GET": {"value": 5.9}},  # truncates
        "open_databases": {"value": "many"},  # string -> skip
        "database_reads": {"value": -3.7},  # toward-zero trunc
    })
    rows = {(r["name"], r["http_method"], r["operation"]):
            (r["value_int"], r["value_double"])
            for r in couchdb_stats_to_rows(doc)}
    assert ("couchdb.average_request_time", None, None) not in rows
    assert rows[("couchdb.httpd.bulk_requests", None, None)] == (7, None)
    assert rows[("couchdb.httpd.requests", "GET", None)] == (5, None)
    assert ("couchdb.database.open", None, None) not in rows
    assert rows[("couchdb.database.operations", None, "reads")] == (
        -3, None)
    # nested walker: non-map interior and missing keys are None
    assert get_value_from_body(("a", "b"), {"a": 3}) is None
    assert get_value_from_body(("a",), {}) is None
    # undecodable body = whole-scrape failure
    assert couchdb_stats_to_rows("{") == []
