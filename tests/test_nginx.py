"""nginxreceiver parity (receiver/nginxreceiver/scraper.go,
metadata.yaml) — golden-pinned on the reference mock-server body vs
testdata/scraper/expected.yaml."""

import collections
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.nginx import (
    stub_stats_to_rows,
)

REF = "/root/reference/receiver/nginxreceiver"


def test_reference_golden():
    if not os.path.exists(f"{REF}/testdata/scraper/expected.yaml"):
        pytest.skip("reference testdata not present")
    yaml = pytest.importorskip("yaml")
    src = open(f"{REF}/scraper_test.go").read()
    s = src.index("Active connections: 291")
    body = src[s:src.index("`))", s)]
    rows = stub_stats_to_rows(body)
    mine = collections.Counter(
        (r["name"], r["value_int"], r["state"], r["is_monotonic"])
        for r in rows)
    exp = yaml.safe_load(
        open(f"{REF}/testdata/scraper/expected.yaml"))
    ex = collections.Counter()
    for rm in exp["resourceMetrics"]:
        for sm in rm["scopeMetrics"]:
            for m in sm["metrics"]:
                b = m.get("sum") or m.get("gauge")
                for dp in b["dataPoints"]:
                    a = {x["key"]: x["value"]["stringValue"]
                         for x in dp.get("attributes", [])}
                    ex[(m["name"], int(dp["asInt"]), a.get("state"),
                        b.get("isMonotonic", False))] += 1
    assert mine == ex


def test_non_matching_page_fails_scrape():
    assert stub_stats_to_rows("<html>502</html>") == []
    assert stub_stats_to_rows("") == []
    assert stub_stats_to_rows(None) == []


def test_current_connections_are_nonmonotonic_sums():
    rows = stub_stats_to_rows(
        "Active connections: 1\nserver accepts handled requests\n"
        " 2 3 4\nReading: 5 Writing: 6 Waiting: 7\n", now_ns=9)
    cur = [r for r in rows if r["name"] == "nginx.connections_current"]
    assert [(r["state"], r["value_int"]) for r in cur] == [
        ("active", 1), ("reading", 5), ("writing", 6), ("waiting", 7)]
    assert all(r["mtype"] == "sum" and not r["is_monotonic"]
               and r["aggregation_temporality"] == 2
               and r["time_unix_nano"] == 9 for r in cur)
