"""signalfx translator parity — pinned to the reference translator's
own vectors (pkg/translator/signalfx/from_metrics_test.go:27-420,
to_metrics_test.go) and the helper formats (from_metrics.go:296-318)."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.signalfx import (
    MAP_TYPE,
    _MetricsToSignalFx,
    _SignalFxToMetrics,
    float64_to_dim_value,
    go_fmt_float_f,
)

# from_metrics_test.go:21-24
TS_NS = 1574092046 * 10**9 + 11 * 10**6
TS_MS = 1574092046 * 10**3 + 11
LABELS = [("k0", "v0"), ("k1", "v1")]

BASE = {
    "name": None, "mtype": None, "aggregation_temporality": None,
    "is_monotonic": None, "time_ns": TS_NS, "value_int": None,
    "value_double": None, "count": None, "hsum": None, "hmin": None,
    "hmax": None, "explicit_bounds": None, "bucket_counts": None,
    "ssum": None, "quantiles": None, "quantile_values": None,
    "attributes": LABELS,
}

SCHEMA = pa.schema([
    ("name", pa.string()), ("mtype", pa.string()),
    ("aggregation_temporality", pa.int32()),
    ("is_monotonic", pa.bool_()), ("time_ns", pa.int64()),
    ("value_int", pa.int64()), ("value_double", pa.float64()),
    ("count", pa.int64()), ("hsum", pa.float64()),
    ("hmin", pa.float64()), ("hmax", pa.float64()),
    ("explicit_bounds", pa.list_(pa.float64())),
    ("bucket_counts", pa.list_(pa.int64())),
    ("ssum", pa.float64()), ("quantiles", pa.list_(pa.float64())),
    ("quantile_values", pa.list_(pa.float64())),
    ("attributes", MAP_TYPE),
])


def mk(*rows):
    full = [dict(BASE, **r) for r in rows]
    return pa.table(
        {f.name: pa.array([r[f.name] for r in full], f.type)
         for f in SCHEMA})


def encode(tab, **kw):
    opts = dict(attrs_col="attributes", resource_cols=(), id_cols=(),
                drop_histogram_buckets=False, process_histograms=True)
    opts.update(kw)
    return _MetricsToSignalFx(**opts)(tab)


def rows_of(tab):
    return tab.to_pylist()


def test_dim_value_format():
    # from_metrics.go:296-318 fast paths + strconv 'g'
    assert float64_to_dim_value(0.0) == "0"
    assert float64_to_dim_value(1.0) == "1"
    assert float64_to_dim_value(float("inf")) == "+Inf"
    assert float64_to_dim_value(0.25) == "0.25"
    assert float64_to_dim_value(1234.5678) == "1234.5678"
    assert float64_to_dim_value(2.5e-7) == "2.5e-07"


def test_quantile_format_f():
    # strconv.FormatFloat(q, 'f', -1, 64) — always decimal
    assert go_fmt_float_f(0.25) == "0.25"
    assert go_fmt_float_f(0.5) == "0.5"
    assert go_fmt_float_f(1.0) == "1"
    assert go_fmt_float_f(2.5e-7) == "0.00000025"
    assert go_fmt_float_f(1.5e7) == "15000000"


def test_number_points_reference_vectors():
    # from_metrics_test.go "no_resources_with_attributes"
    out = encode(mk(
        {"name": "gauge_double_with_dims", "mtype": "gauge",
         "value_double": 1234.5678},
        {"name": "gauge_int_with_dims", "mtype": "gauge",
         "value_int": 123},
        {"name": "cumulative_double_with_dims", "mtype": "sum",
         "is_monotonic": True, "aggregation_temporality": 2,
         "value_double": 1234.5678},
        {"name": "cumulative_int_with_dims", "mtype": "sum",
         "is_monotonic": True, "aggregation_temporality": 2,
         "value_int": 123},
        {"name": "delta_double", "mtype": "sum", "is_monotonic": True,
         "aggregation_temporality": 1, "value_double": 1234.5678},
        {"name": "gauge_sum", "mtype": "sum", "is_monotonic": False,
         "aggregation_temporality": 2, "value_int": 4},
    ))
    r = rows_of(out)
    assert [(x["metric"], x["sfx_type"]) for x in r] == [
        ("gauge_double_with_dims", "GAUGE"),
        ("gauge_int_with_dims", "GAUGE"),
        ("cumulative_double_with_dims", "CUMULATIVE_COUNTER"),
        ("cumulative_int_with_dims", "CUMULATIVE_COUNTER"),
        ("delta_double", "COUNTER"),
        ("gauge_sum", "GAUGE"),
    ]
    assert all(x["timestamp_ms"] == TS_MS for x in r)
    assert r[0]["value_double"] == 1234.5678
    assert r[1]["value_int"] == 123
    assert r[0]["dimensions"] == LABELS


def test_resource_dims_merge_first():
    # from_metrics_test.go "with_resources_with_attributes":
    # extraDims (resource) precede the datapoint attributes
    tab = mk({"name": "g", "mtype": "gauge", "value_int": 1})
    tab = tab.append_column("k_r0", pa.array(["v_r0"]))
    out = _MetricsToSignalFx("attributes", ("k_r0",), (), False, True)(tab)
    assert out.to_pylist()[0]["dimensions"] == \
        [("k_r0", "v_r0")] + LABELS


def test_histogram_reference_vector():
    # from_metrics_test.go "histogram": cumulative counts + le dims
    out = encode(mk(
        {"name": "histogram", "mtype": "histogram",
         "aggregation_temporality": 2, "count": 16, "hsum": 100.0,
         "hmin": 0.1, "hmax": 11.11,
         "explicit_bounds": [1.0, 2.0, 4.0],
         "bucket_counts": [4, 2, 3, 7]}))
    r = rows_of(out)
    assert [(x["metric"], x["sfx_type"], x["value_int"],
             x["value_double"]) for x in r] == [
        ("histogram_count", "CUMULATIVE_COUNTER", 16, None),
        ("histogram_sum", "CUMULATIVE_COUNTER", None, 100.0),
        ("histogram_min", "GAUGE", None, 0.1),
        ("histogram_max", "GAUGE", None, 11.11),
        ("histogram_bucket", "CUMULATIVE_COUNTER", 4, None),
        ("histogram_bucket", "CUMULATIVE_COUNTER", 6, None),
        ("histogram_bucket", "CUMULATIVE_COUNTER", 9, None),
        ("histogram_bucket", "CUMULATIVE_COUNTER", 16, None),
    ]
    les = [dict(x["dimensions"]).get("le") for x in r[4:]]
    assert les == ["1", "2", "4", "+Inf"]


def test_histogram_variants():
    # delta → COUNTER; unspecified temporality → CUMULATIVE_COUNTER;
    # no buckets → only count+sum; mismatched counts → buckets skipped
    out = encode(mk(
        {"name": "delta_histogram", "mtype": "histogram",
         "aggregation_temporality": 1, "count": 16,
         "explicit_bounds": [1.0], "bucket_counts": [4, 12]},
        {"name": "no_bucket_histo", "mtype": "histogram",
         "count": 2, "hsum": 10.0},
        {"name": "bad", "mtype": "histogram",
         "aggregation_temporality": 2, "count": 5,
         "explicit_bounds": [1.0, 2.0], "bucket_counts": [5]}))
    r = rows_of(out)
    assert [(x["metric"], x["sfx_type"]) for x in r] == [
        ("delta_histogram_count", "COUNTER"),
        ("delta_histogram_bucket", "COUNTER"),
        ("delta_histogram_bucket", "COUNTER"),
        ("no_bucket_histo_count", "CUMULATIVE_COUNTER"),
        ("no_bucket_histo_sum", "CUMULATIVE_COUNTER"),
        ("bad_count", "CUMULATIVE_COUNTER"),
    ]


def test_histogram_flags():
    row = {"name": "h", "mtype": "histogram",
           "aggregation_temporality": 2, "count": 3,
           "explicit_bounds": [1.0], "bucket_counts": [1, 2]}
    dropped = encode(mk(row), drop_histogram_buckets=True)
    assert [x["metric"] for x in rows_of(dropped)] == ["h_count"]
    off = encode(mk(row), process_histograms=False)
    assert off.num_rows == 0


def test_summary_reference_vector():
    # from_metrics_test.go "summaries": count/sum CUMULATIVE_COUNTER,
    # per-quantile GAUGE with strconv-'f' dims
    out = encode(mk(
        {"name": "summary", "mtype": "summary", "count": 111,
         "ssum": 123.4, "quantiles": [0.25, 0.5, 0.75, 1.0],
         "quantile_values": [0.0, 1.0, 2.0, 3.0]},
        {"name": "empty_summary", "mtype": "summary", "count": 11,
         "ssum": 12.3}))
    r = rows_of(out)
    assert [(x["metric"], x["sfx_type"]) for x in r] == [
        ("summary_count", "CUMULATIVE_COUNTER"),
        ("summary_sum", "CUMULATIVE_COUNTER"),
        ("summary_quantile", "GAUGE"),
        ("summary_quantile", "GAUGE"),
        ("summary_quantile", "GAUGE"),
        ("summary_quantile", "GAUGE"),
        ("empty_summary_count", "CUMULATIVE_COUNTER"),
        ("empty_summary_sum", "CUMULATIVE_COUNTER"),
    ]
    qdims = [dict(x["dimensions"])["quantile"] for x in r[2:6]]
    assert qdims == ["0.25", "0.5", "0.75", "1"]
    assert [x["value_double"] for x in r[2:6]] == [0.0, 1.0, 2.0, 3.0]


def test_decode_reference_semantics():
    enc = encode(mk(
        {"name": "g", "mtype": "gauge", "value_double": 1.5},
        {"name": "c", "mtype": "sum", "is_monotonic": True,
         "aggregation_temporality": 1, "value_int": 9},
        {"name": "cc", "mtype": "sum", "is_monotonic": True,
         "aggregation_temporality": 2, "value_int": 10}))
    dec = _SignalFxToMetrics("dp_json", ())(enc)
    r = dec.to_pylist()
    assert [(x["name"], x["otel_type"], x["aggregation_temporality"],
             x["is_monotonic"]) for x in r] == [
        ("g", "gauge", 0, False),
        ("c", "sum", 1, True),
        ("cc", "sum", 2, True)]
    assert all(x["time_ns"] == TS_MS * 10**6 for x in r)
    assert r[0]["value_double"] == 1.5 and r[1]["value_int"] == 9
    assert r[0]["attributes"] == LABELS
    assert all(x["error"] is None for x in r)


def test_decode_errors():
    # to_metrics.go:46-48 nil value, :90-96 enum/unknown
    tab = pa.table({"dp_json": pa.array([
        '{"metric":"m1","timestamp":5,"value":{}}',
        '{"metric":"m2","timestamp":5,"value":{"intValue":1},'
        '"metricType":"ENUM"}',
        '{"metric":"m3","timestamp":5,"value":{"intValue":1},'
        '"metricType":"BOGUS"}',
        '{"metric":"m4","timestamp":5,"value":{"intValue":1}}'])})
    r = _SignalFxToMetrics("dp_json", ())(tab).to_pylist()
    assert 'nil datum value for data-point in metric "m1"' == r[0]["error"]
    assert "unsupported enum data-point (2)" in r[1]["error"]
    assert "unknown data-point type" in r[2]["error"]
    # missing metricType defaults to GAUGE (proto3 zero value)
    assert r[3]["error"] is None and r[3]["otel_type"] == "gauge"
    dropped = _SignalFxToMetrics("dp_json", (), "drop")(tab)
    assert dropped.num_rows == 1


def test_roundtrip_identity():
    src = mk(
        {"name": "a", "mtype": "gauge", "value_int": 7},
        {"name": "b", "mtype": "sum", "is_monotonic": True,
         "aggregation_temporality": 2, "value_double": 2.25})
    dec = _SignalFxToMetrics("dp_json", ())(encode(src)).to_pylist()
    assert [x["name"] for x in dec] == ["a", "b"]
    assert dec[0]["value_int"] == 7
    assert dec[1]["value_double"] == 2.25
    assert all(x["time_ns"] == (TS_NS // 10**6) * 10**6 for x in dec)
