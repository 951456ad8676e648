"""expvarreceiver parity (scraper.go:53-113, metadata.yaml)."""

import json

import pytest

from opentelemetry_collector_contrib_ray.stages.expvar import (
    memstats_to_rows,
)


def _doc(**over):
    ms = {"Sys": 1, "Mallocs": 2, "Frees": 3, "HeapAlloc": 4,
          "NumGC": 300, "PauseNs": [j * 10 for j in range(256)],
          "GCCPUFraction": 0.125, "TotalAlloc": 99, "Lookups": 7}
    ms.update(over)
    return json.dumps({"memstats": ms})


def test_metric_table_and_flags():
    rows = {r["name"]: r for r in memstats_to_rows(_doc())}
    assert len(rows) == 24  # optional two disabled by default
    s = rows["process.runtime.memstats.sys"]
    assert (s["mtype"], s["is_monotonic"],
            s["aggregation_temporality"], s["value_int"]) \
        == ("sum", False, 2, 1)
    m = rows["process.runtime.memstats.mallocs"]
    assert m["is_monotonic"] is True and m["value_int"] == 2
    g = rows["process.runtime.memstats.gc_cpu_fraction"]
    assert (g["mtype"], g["value_double"]) == ("gauge", 0.125)
    assert "process.runtime.memstats.total_alloc" not in rows
    assert "process.runtime.memstats.lookups" not in rows


def test_optional_metrics_enabled():
    rows = {r["name"]: r for r in memstats_to_rows(
        _doc(), enabled_metrics=("total_alloc", "lookups"))}
    assert rows["process.runtime.memstats.total_alloc"][
        "value_int"] == 99
    assert rows["process.runtime.memstats.lookups"][
        "is_monotonic"] is False


def test_last_pause_circular_buffer():
    # scraper.go:109-111 — PauseNs[(NumGC+255)%256]
    rows = {r["name"]: r for r in memstats_to_rows(_doc(NumGC=300))}
    assert rows["process.runtime.memstats.last_pause"][
        "value_int"] == ((300 + 255) % 256) * 10
    assert rows["process.runtime.memstats.num_gc"][
        "value_int"] == 300


def test_nil_memstats_errors():
    with pytest.raises(ValueError, match="memstats data is nil"):
        memstats_to_rows(json.dumps({"cmdline": ["x"]}))


def test_stage_drop_and_fanout(ray_session):
    import pyarrow as pa
    import ray

    from opentelemetry_collector_contrib_ray.stages.expvar import (
        parse_expvar,
    )

    ds = ray.data.from_arrow(pa.table({
        "expvar_json": pa.array([_doc(), json.dumps({})],
                                pa.string())}))
    out = parse_expvar(ds, now_ns=5).take_all()
    assert len(out) == 24
    assert all(r["time_unix_nano"] == 5 for r in out)
