"""bmchelixexporter stage parity (stages/bmchelix.py)."""

import json

from opentelemetry_collector_contrib_ray.stages.bmchelix import (
    _enrich_names, _percent_metric_name, bmchelix_payload)


def _mock_payload(mtype="gauge", monotonic=False):
    dps = []
    for i, (ent, inst, ts, v) in enumerate((
            ("test-entity-1", "test-entity-Name-1",
             1750926531000000000, 42.0),
            ("test-entity-2", "test-entity-Name-2",
             1750926532000000000, 84.0))):
        dps.append({"attributes": {
            "host.name": "test-hostname", "entityName": ent,
            "entityTypeId": "test-entity-type-id",
            "instanceName": inst},
            "timeUnixNano": ts, "asDouble": v})
    return [{"name": "test_metric", "unit": "s", "mtype": mtype,
             "is_monotonic": monotonic, "resource_attributes": {},
             "datapoints": dps}]


def test_produce_payload_reference_mock():
    # TestProduceHelixPayload SetGauge/SetSum expectations
    for mtype in ("gauge", "sum"):
        out = bmchelix_payload(_mock_payload(mtype))
        assert len(out) == 3
        parent, m1, m2 = out
        assert parent["labels"]["metricName"] == "identity"
        assert parent["labels"]["entityId"] == \
            ("OTEL:test-hostname:test-entity-type-id_container:"
             "test-entity-type-id_container")
        assert parent["samples"] == []
        assert m1["labels"]["entityId"] == \
            "OTEL:test-hostname:test-entity-type-id:test-entity-1"
        assert m1["labels"]["parentEntityName"] == \
            "test-entity-type-id_container"
        assert m1["labels"]["host.name"] == "test-hostname"
        assert m1["labels"]["instanceName"] == "test-entity-Name-1"
        assert m1["samples"] == [
            {"value": 42.0, "timestamp": 1750926531000}]
        assert m2["samples"] == [
            {"value": 84.0, "timestamp": 1750926532000}]
    assert bmchelix_payload([]) == []


def test_enrich_names_reference_case():
    # "Metrics with different state values"
    metrics = [
        {"labels": {"entityId": "host:cpu:core0",
                    "metricName": "system.cpu.time",
                    "cpu.mode": "idle"}, "samples": []},
        {"labels": {"entityId": "host:cpu:core0",
                    "metricName": "system.cpu.time",
                    "cpu.mode": "user"}, "samples": []},
    ]
    out = _enrich_names(metrics)
    labels = [m["labels"] for m in out]
    assert labels == [
        {"metricName": "system.cpu.time", "cpu.mode": "idle"},
        {"entityId": "host:cpu:core0",
         "metricName": "system.cpu.time.idle"},
        {"metricName": "system.cpu.time", "cpu.mode": "user"},
        {"entityId": "host:cpu:core0",
         "metricName": "system.cpu.time.user"},
    ]


def test_percent_name_vectors():
    # TestToPercentMetricName
    assert _percent_metric_name("memory.usage_ratio") \
        == "memory.usage_percent"
    assert _percent_metric_name("ratio_of_memory") \
        == "ratio_of_memory.percent"
    assert _percent_metric_name("cpu.usage") == "cpu.usage.percent"
    assert _percent_metric_name("disk.percent_used.percent") \
        == "disk.percent_used.percent"


def test_rate_and_percent_chain():
    # monotonic sum with unit "1": base + percent + rates for BOTH
    # (the percent clone copies the rate flag), then the raw-copy
    # drop never applies (entityTypeId present)
    dps = [{"attributes": {"host.name": "h", "entityName": "E",
                           "entityTypeId": "T"},
            "timeUnixNano": t * 1_000_000_000, "asInt": v}
           for t, v in ((100, 10), (160, 40))]
    payload = [{"name": "req", "unit": "1", "mtype": "sum",
                "is_monotonic": True, "resource_attributes": {},
                "datapoints": dps}]
    out = bmchelix_payload(payload)
    names = [(m["labels"]["metricName"], m["samples"][0]["value"])
             for m in out if m["labels"]["metricName"] != "identity"]
    # base×2, percent×2, rate, percent-rate
    assert ("req", 10.0) in names and ("req", 40.0) in names
    assert ("req.percent", 1000.0) in names
    assert ("req.percent", 4000.0) in names
    assert ("req.rate", 0.5) in names          # (40-10)/60s
    assert ("req.percent.rate", 50.0) in names
    # no metric keeps the rate flag label
    assert all("bmchelix.requiresRateMetric" not in m["labels"]
               for m in out)


def test_skips():
    # hostname / entityTypeId / entityName required per dp;
    # unsupported metric types skip the metric
    payload = [
        {"name": "x", "unit": "s", "mtype": "histogram",
         "resource_attributes": {}, "datapoints": [
             {"attributes": {"host.name": "h", "entityName": "E",
                             "entityTypeId": "T"},
              "timeUnixNano": 1, "asDouble": 1.0}]},
        {"name": "y", "unit": "s", "mtype": "gauge",
         "resource_attributes": {}, "datapoints": [
             {"attributes": {"entityName": "E",
                             "entityTypeId": "T"},
              "timeUnixNano": 1, "asDouble": 1.0},
             {"attributes": {"host.name": "h", "entityName": "E"},
              "timeUnixNano": 1, "asDouble": 1.0},
             {"attributes": {"host.name": "h",
                             "entityName": ":a:b:",
                             "entityTypeId": "T"},
              "timeUnixNano": 2_000_000_000, "asDouble": 3.0}]},
    ]
    out = bmchelix_payload(payload)
    real = [m for m in out
            if m["labels"]["metricName"] != "identity"]
    assert len(real) == 1
    # entityName colon-trim then colon-strip: ":a:b:" -> "ab"
    assert real[0]["labels"]["entityName"] == "ab"
    assert real[0]["labels"]["entityId"] == "OTEL:h:T:ab"
