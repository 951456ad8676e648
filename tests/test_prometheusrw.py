"""prometheusremotewrite translator parity — semantics pinned to
pkg/translator/prometheusremotewrite helper.go / metrics_to_prw.go /
number_data_points.go (v1 path)."""

import json
import math
import struct

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.prometheusrw import (
    STALE_NAN,
    _MetricsToPRW,
    create_attributes,
    prom_exemplars,
    serialize_labels,
)

SCHEMA_FIELDS = [
    ("name", pa.string()), ("unit", pa.string()),
    ("mtype", pa.string()), ("aggregation_temporality", pa.int32()),
    ("is_monotonic", pa.bool_()), ("time_ns", pa.int64()),
    ("value_int", pa.int64()), ("value_double", pa.float64()),
    ("count", pa.int64()), ("hsum", pa.float64()),
    ("explicit_bounds", pa.list_(pa.float64())),
    ("bucket_counts", pa.list_(pa.int64())),
    ("ssum", pa.float64()), ("quantiles", pa.list_(pa.float64())),
    ("quantile_values", pa.list_(pa.float64())),
    ("attributes", pa.map_(pa.string(), pa.string())),
    ("resource", pa.map_(pa.string(), pa.string())),
    ("no_recorded_value", pa.bool_()),
    ("exemplars", pa.string()),
]
BASE = {name: None for name, _ in SCHEMA_FIELDS}
BASE["time_ns"] = 1_600_000_000_123_456_789


def mk(*rows):
    full = [dict(BASE, **r) for r in rows]
    return pa.table({name: pa.array([r[name] for r in full], typ)
                     for name, typ in SCHEMA_FIELDS})


def run(tab, **kw):
    opts = dict(namespace="", external_labels=None,
                add_metric_suffixes=True, id_cols=())
    opts.update(kw)
    return _MetricsToPRW(**opts)(tab).to_pylist()


def test_create_attributes_semantics():
    # helper.go:99-186: stable sort by original key, sanitize-collision
    # merge with ";", job = ns/name, instance, external loses to
    # existing, dunder extras skip sanitization
    labels = create_attributes(
        resource=[("service.name", "svc"), ("service.namespace", "ns"),
                  ("service.instance.id", "inst"), ("host.name", "h")],
        attributes=[("a_b", "y"), ("a.b", "x"), ("ok", "v")],
        external_labels={"cluster": "c", "job": "ext"},
        extras=("__name__", "m", "le", "0.5"))
    # a.b sorts before a_b ('.' < '_'), both sanitize to a_b → "x;y"
    assert labels["a_b"] == "x;y"
    assert labels["job"] == "ns/svc"          # external "job" lost
    assert labels["instance"] == "inst"
    assert labels["cluster"] == "c"
    assert labels["__name__"] == "m" and labels["le"] == "0.5"
    assert "host_name" not in labels  # resource attrs are not labels
    # identical values do not double-merge
    same = create_attributes([], [("a.b", "x"), ("a_b", "x")], None)
    assert same["a_b"] == "x"


def test_gauge_sum_and_temporality_gate():
    out = run(mk(
        {"name": "g", "mtype": "gauge", "value_int": 5,
         "attributes": [("k", "v")]},
        {"name": "requests", "unit": "1", "mtype": "sum",
         "aggregation_temporality": 2, "is_monotonic": True,
         "value_double": 2.5},
        {"name": "bad", "mtype": "sum", "aggregation_temporality": 1,
         "is_monotonic": True, "value_int": 1},
        {"name": "weird", "mtype": "exotic"}))
    assert out[0]["metric_name"] == "g" and out[0]["value"] == 5.0
    assert out[0]["labels"] == "__name__=g,k=v"
    assert out[0]["timestamp_ms"] == 1_600_000_000_123  # ns → ms trunc
    assert out[1]["metric_name"] == "requests_total"
    assert out[2]["error"] == ('invalid temporality and type '
                               'combination for metric "bad"')
    assert out[3]["error"] == "unsupported metric type"


def test_histogram_reference_semantics():
    out = run(mk({
        "name": "latency", "mtype": "histogram",
        "aggregation_temporality": 2, "count": 16, "hsum": 100.0,
        "explicit_bounds": [0.5, 1.0, 2.5],
        "bucket_counts": [4, 2, 3, 7]}))
    names = [(r["metric_name"], r["value"]) for r in out]
    assert names == [
        ("latency_sum", 100.0), ("latency_count", 16.0),
        ("latency_bucket", 4.0), ("latency_bucket", 6.0),
        ("latency_bucket", 9.0),
        ("latency_bucket", 16.0)]  # +Inf = TOTAL count
    les = [dict(p.split("=") for p in r["labels"].split(",")).get("le")
           for r in out[2:]]
    assert les == ["0.5", "1", "2.5", "+Inf"]
    # no sum → no _sum series; partial zip over min(bounds, counts)
    out2 = run(mk({
        "name": "h", "mtype": "histogram",
        "aggregation_temporality": 2, "count": 9,
        "explicit_bounds": [1.0, 2.0],
        "bucket_counts": [5]}))
    assert [(r["metric_name"], r["value"]) for r in out2] == [
        ("h_count", 9.0), ("h_bucket", 5.0), ("h_bucket", 9.0)]


def test_summary_quantiles_on_base_name():
    out = run(mk({
        "name": "rpc.duration", "mtype": "summary", "count": 11,
        "ssum": 12.5, "quantiles": [0.5, 0.99],
        "quantile_values": [1.0, 2.0]}))
    assert [(r["metric_name"], r["value"]) for r in out] == [
        ("rpc_duration_sum", 12.5), ("rpc_duration_count", 11.0),
        ("rpc_duration", 1.0), ("rpc_duration", 2.0)]
    assert "quantile=0.5" in out[2]["labels"]
    assert "quantile=0.99" in out[3]["labels"]


def test_stale_nan_bits():
    out = run(mk({"name": "g", "mtype": "gauge", "value_double": 7.0,
                  "no_recorded_value": True}))
    bits = struct.unpack("<Q", struct.pack("<d", out[0]["value"]))[0]
    assert bits == 0x7FF0000000000002
    assert struct.unpack(
        "<Q", struct.pack("<d", STALE_NAN))[0] == 0x7FF0000000000002


def test_exemplar_bucket_assignment_and_cap():
    exs = json.dumps([
        {"value": 0.7, "time_ns": 1_000_000,
         "trace_id": "0" * 31 + "1", "span_id": "0" * 15 + "2",
         "attributes": {"k": "v"}},
        {"value": 99.0, "time_ns": 2_000_000},
        {"int_value": 2, "time_ns": 3_000_000,
         "attributes": {"long": "x" * 200}}])
    out = run(mk({
        "name": "h", "mtype": "histogram",
        "aggregation_temporality": 2, "count": 10, "hsum": 1.0,
        "explicit_bounds": [0.5, 1.0, 2.5],
        "bucket_counts": [1, 2, 3, 4], "exemplars": exs}))
    by_le = {}
    for r in out:
        lbl = dict(p.split("=") for p in r["labels"].split(","))
        if "le" in lbl:
            by_le[lbl["le"]] = r["exemplars"]
    # 0.7 → first bound ≥ 0.7 is le=1; 99 → +Inf; 2 → le=2.5
    ex1 = json.loads(by_le["1"])
    assert len(ex1) == 1 and ex1[0]["value"] == 0.7
    assert ex1[0]["labels"]["trace_id"] == "0" * 31 + "1"
    assert ex1[0]["labels"]["k"] == "v"
    assert ex1[0]["timestamp"] == 1
    exinf = json.loads(by_le["+Inf"])
    assert exinf[0]["value"] == 99.0
    ex25 = json.loads(by_le["2.5"])
    # >128 runes → filtered attributes dropped
    assert ex25[0]["value"] == 2.0 and ex25[0]["labels"] == {}
    assert by_le["0.5"] is None


def test_exemplar_rune_counting():
    # runes include trace/span contributions (helper.go:296-320)
    exs = prom_exemplars([{"value": 1.0, "time_ns": 0,
                           "trace_id": "a" * 32, "span_id": "b" * 16,
                           "attributes": {"k": "v" * 70}}])
    # 8+32 + 7+16 + 1+70 = 134 > 128 → attrs dropped, ids kept
    assert "k" not in exs[0]["labels"]
    assert exs[0]["labels"]["trace_id"] == "a" * 32


def test_namespace_and_suffix_flags():
    out = run(mk({"name": "m.x", "unit": "s", "mtype": "gauge",
                  "value_int": 1}),
              namespace="ns", add_metric_suffixes=False)
    assert out[0]["metric_name"] == "ns_m_x"


def test_serialize_labels_sorted():
    assert serialize_labels({"b": "2", "a": "1", "__name__": "m"}) == \
        "__name__=m,a=1,b=2"


def test_target_info(ray_session):
    import ray

    from opentelemetry_collector_contrib_ray.stages.prometheusrw import (
        prw_target_info,
    )

    tab = mk(
        {"name": "a", "mtype": "gauge", "value_int": 1,
         "time_ns": 5_000_000,
         "resource": [("service.name", "s"), ("host.name", "h")]},
        {"name": "b", "mtype": "gauge", "value_int": 2,
         "time_ns": 9_000_000,
         "resource": [("service.name", "s"), ("host.name", "h")]},
        # only identifying attrs → skipped (helper.go:500-512)
        {"name": "c", "mtype": "gauge", "value_int": 3,
         "time_ns": 1_000_000, "resource": [("service.name", "x")]},
        # no job/instance → skipped (helper.go:521-530)
        {"name": "d", "mtype": "gauge", "value_int": 4,
         "time_ns": 1_000_000, "resource": [("host.name", "o")]},
    )
    ds = ray.data.from_arrow(tab)
    out = prw_target_info(ds)
    rows = out.to_pylist()
    assert len(rows) == 1
    assert rows[0]["metric_name"] == "target_info"
    assert rows[0]["labels"] == "__name__=target_info,host_name=h,job=s"
    assert rows[0]["value"] == 1.0
    assert rows[0]["timestamp_ms"] == 9  # max ts in the group
    ns = prw_target_info(ds, namespace="ns").to_pylist()
    assert ns[0]["metric_name"] == "ns_target_info"
    assert prw_target_info(ds, disable_target_info=True).num_rows == 0
