"""haproxyreceiver parity (receiver/haproxyreceiver/scraper.go,
metadata.yaml) — golden-pinned on the reference's own stats.txt /
30252_stats.txt fixtures vs scraper/expected*.yaml."""

import collections
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.haproxy import (
    read_stats,
    stats_to_rows,
)

REF = "/root/reference/receiver/haproxyreceiver/testdata"


def _expected_set(path):
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(path))
    out = collections.Counter()
    for rm in exp["resourceMetrics"]:
        attrs = {a["key"]: a["value"]["stringValue"]
                 for a in rm["resource"]["attributes"]}
        for sm in rm["scopeMetrics"]:
            for m in sm["metrics"]:
                body = m.get("sum") or m.get("gauge")
                for dp in body["dataPoints"]:
                    vi = int(dp["asInt"]) if "asInt" in dp else None
                    vd = (float(dp["asDouble"])
                          if "asDouble" in dp else None)
                    sc = None
                    for a in dp.get("attributes", []):
                        if a["key"] == "status_code":
                            sc = a["value"]["stringValue"]
                    out[(attrs["haproxy.proxy_name"],
                         attrs["haproxy.service_name"], m["name"],
                         vi, vd, sc)] += 1
    return out


def _mine(page):
    rows = stats_to_rows(page, endpoint="E")
    return collections.Counter(
        (r["pxname"], r["svname"], r["name"], r["value_int"],
         r["value_double"], r["status_code"]) for r in rows)


@pytest.mark.parametrize("stats,golden", [
    ("stats.txt", "scraper/expected.yaml"),
    ("30252_stats.txt", "scraper/30252_expected.yaml"),
])
def test_reference_golden(stats, golden):
    if not os.path.exists(os.path.join(REF, stats)):
        pytest.skip("reference testdata not present")
    mine = _mine(open(os.path.join(REF, stats)).read())
    exp = _expected_set(os.path.join(REF, golden))
    assert mine == exp


HDR = "# pxname,svname,scur,ereq,eresp,srv_abrt,stot,req_rate\n"


def test_header_prefix_and_maps():
    recs = read_stats(HDR + "px,FRONTEND,1,2,3,4,5,6.5\n")
    assert recs == [{"pxname": "px", "svname": "FRONTEND",
                     "scur": "1", "ereq": "2", "eresp": "3",
                     "srv_abrt": "4", "stot": "5",
                     "req_rate": "6.5"}]


def test_wrong_field_count_fails_scrape():
    with pytest.raises(ValueError):
        read_stats(HDR + "px,FRONTEND,1\n")
    with pytest.raises(ValueError):
        read_stats("")


def test_responses_errors_independent_of_ereq():
    # ereq empty — the eresp+srv_abrt block still fires
    rows = stats_to_rows(HDR + "px,BACKEND,,,3,4,,\n")
    names = [r["name"] for r in rows]
    assert names == ["haproxy.responses.errors"]
    assert rows[0]["value_int"] == 7
    # one side empty — no derived datapoint
    rows = stats_to_rows(HDR + "px,BACKEND,,,3,,,\n")
    assert rows == []


def test_parse_error_drops_datapoint_but_derived_contributes_zero():
    rows = stats_to_rows(HDR + "px,F,x,2,bad,4,,\n")
    by = {r["name"]: r for r in rows}
    # scur unparseable -> dropped; ereq fine; derived = 0 + 4
    assert "haproxy.sessions.count" not in by
    assert by["haproxy.requests.errors"]["value_int"] == 2
    assert by["haproxy.responses.errors"]["value_int"] == 4


def test_disabled_metric_gate_and_typing():
    page = HDR + "px,F,7,,,,9,1.25\n"
    rows = stats_to_rows(page)
    names = {r["name"] for r in rows}
    assert "haproxy.sessions.total" not in names  # default-disabled
    rows = stats_to_rows(
        page, enabled_metrics=("haproxy.sessions.total",))
    by = {r["name"]: r for r in rows}
    stot = by["haproxy.sessions.total"]
    assert (stot["value_int"], stot["mtype"], stot["is_monotonic"],
            stot["aggregation_temporality"]) == (9, "sum", True, 2)
    scur = by["haproxy.sessions.count"]
    assert (scur["value_int"], scur["mtype"],
            scur["aggregation_temporality"]) == (7, "gauge", 0)
    rate = by["haproxy.requests.rate"]
    assert (rate["value_double"], rate["value_int"]) == (1.25, None)
