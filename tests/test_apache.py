"""apachereceiver parity (receiver/apachereceiver/scraper.go,
metadata.yaml) — golden-pinned on the reference's mock-server body
vs testdata/scraper/expected.yaml, plus the scraper_test.go
parseStats/parseScoreboard vectors."""

import collections
import os

import pytest

from opentelemetry_collector_contrib_ray.stages.apache import (
    parse_scoreboard,
    parse_stats,
    stats_to_rows,
)

REF = "/root/reference/receiver/apachereceiver/testdata/scraper"

SCRAPER_TEST = ("/root/reference/receiver/apachereceiver/"
                "scraper_test.go")


def _mock_body():
    """The reference scraper_test.go newMockServer body, extracted
    verbatim (the Scoreboard line is 400+ chars — retyping it is how
    you get it wrong)."""
    src = open(SCRAPER_TEST).read()
    start = src.index("ServerUptimeSeconds: 410")
    end = src.index("`))", start)
    return src[start:end]


def test_reference_golden():
    if not os.path.exists(os.path.join(REF, "expected.yaml")):
        pytest.skip("reference testdata not present")
    MOCK_BODY = _mock_body()
    yaml = pytest.importorskip("yaml")
    exp = yaml.safe_load(open(os.path.join(REF, "expected.yaml")))
    ex = collections.Counter()
    for rm in exp["resourceMetrics"]:
        for sm in rm["scopeMetrics"]:
            for m in sm["metrics"]:
                body = m.get("sum") or m.get("gauge")
                for dp in body["dataPoints"]:
                    vi = int(dp["asInt"]) if "asInt" in dp else None
                    vd = (float(dp["asDouble"])
                          if "asDouble" in dp else None)
                    a = {x["key"]: x["value"]["stringValue"]
                         for x in dp.get("attributes", [])}
                    ex[(m["name"], vi, vd, a.get("state"),
                        a.get("level"), a.get("mode"))] += 1
    rows = stats_to_rows(MOCK_BODY)
    mine = collections.Counter(
        (r["name"], r["value_int"], r["value_double"], r["state"],
         r["level"], r["mode"]) for r in rows)
    assert mine == ex


def test_parse_stats_vectors():
    # scraper_test.go TestParseStats
    assert parse_stats("") == {}
    assert parse_stats(
        "CurrentTime: Thursday, 17-Jun-2021 14:06:32 UTC") == {
        "CurrentTime": "Thursday, 17-Jun-2021 14:06:32 UTC"}
    got = parse_stats(
        "localhost\nReqPerSec: 719.771\nIdleWorkers: 227\n"
        "ConnsTotal: 110\nBytesPerSec: 73.12\n\t\t")
    assert got == {"ReqPerSec": "719.771", "IdleWorkers": "227",
                   "ConnsTotal": "110", "BytesPerSec": "73.12"}


def test_parse_scoreboard_unknown_and_defaults():
    # scraper_test.go TestParseScoreboard
    res = parse_scoreboard("qwertyuiopasdfghjklzxcvbnm")
    assert res["unknown"] == 26
    assert all(res[s] == 0 for s in res if s != "unknown")
    res = parse_scoreboard("")
    assert "unknown" not in res
    assert set(res) == {"waiting", "starting", "reading", "sending",
                        "keepalive", "dnslookup", "closing",
                        "logging", "finishing", "idle_cleanup",
                        "open"}
    assert all(v == 0 for v in res.values())


def test_traffic_scale_and_parse_drop():
    rows = stats_to_rows("Total kBytes: 3\nConnsTotal: x\n")
    by = {r["name"]: r for r in rows}
    assert by["apache.traffic"]["value_int"] == 3072
    assert "apache.current_connections" not in by
