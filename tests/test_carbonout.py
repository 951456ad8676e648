"""carbonexporter parity: flat datapoints → Carbon plaintext lines.

Vectors from exporter/carbonexporter/metricdata_to_plaintext_test.go
(TestToPlaintext, TestBuildPath/TestSanitizeTagKey tables) — timestamps,
tag rendering, number/histogram/summary fan-out, skip rules.
"""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.carbonout import (
    CarbonEncode, build_path, sanitize_tag_key)

TS = 1574092046 * 1_000_000_000 + 11_000_000  # tsUnix in the Go test
TS_S = "1574092046"


def _table(rows):
    """rows: list of dicts over the flat datapoint schema."""
    fields = {
        "doc_id": pa.int64(), "name": pa.string(), "mtype": pa.string(),
        "time_ns": pa.int64(),
        "attributes": pa.map_(pa.string(), pa.string()),
        "value_int": pa.int64(), "value_double": pa.float64(),
        "count": pa.int64(), "sum": pa.float64(),
        "explicit_bounds": pa.list_(pa.float64()),
        "bucket_counts": pa.list_(pa.int64()),
        "quantiles": pa.list_(pa.float64()),
        "quantile_values": pa.list_(pa.float64()),
    }
    return pa.table({k: pa.array([r.get(k) for r in rows], t)
                     for k, t in fields.items()})


def _lines(rows, **kw):
    out = CarbonEncode(**kw)(_table(rows))
    return out.column("carbon_line").to_pylist()


def test_sanitize_tag_key():
    # TestSanitizeTagKey table
    assert sanitize_tag_key("a;b!c^d=e") == "a_b_c_d_e"
    assert sanitize_tag_key("clean_key") == "clean_key"


def test_build_path_empty_value_placeholder_and_unsanitized_value():
    # buildPath never calls sanitizeTagValue; empty value -> <empty>
    p = build_path("m", [("k0", ""), ("k;1", "v;~x")])
    assert p == "m;k0=<empty>;k_1=v;~x"


def test_gauge_and_sum_number_points():
    rows = [
        {"doc_id": 0, "name": "gauge_double_no_dims", "mtype": "gauge",
         "time_ns": TS, "value_double": 1234.5678},
        {"doc_id": 1, "name": "gauge_int_no_dims", "mtype": "gauge",
         "time_ns": TS, "value_int": 123},
        {"doc_id": 2, "name": "gauge_double_with_dims", "mtype": "gauge",
         "time_ns": TS, "value_double": 1234.5678,
         "attributes": [("k0", "v0"), ("k1", "v1")]},
        {"doc_id": 3, "name": "gauge_int_with_dims", "mtype": "sum",
         "time_ns": TS, "value_int": 123,
         "attributes": [("k0", "v0"), ("k1", "v1")]},
        # NumberDataPointValueTypeEmpty -> skipped entirely
        {"doc_id": 4, "name": "gauge_no_value", "mtype": "gauge",
         "time_ns": TS},
        # empty metric name -> skipped
        {"doc_id": 5, "name": "", "mtype": "gauge", "time_ns": TS,
         "value_int": 7},
    ]
    assert _lines(rows) == [
        f"gauge_double_no_dims 1234.5678 {TS_S}",
        f"gauge_int_no_dims 123 {TS_S}",
        f"gauge_double_with_dims;k0=v0;k1=v1 1234.5678 {TS_S}",
        f"gauge_int_with_dims;k0=v0;k1=v1 123 {TS_S}",
    ]


def test_histogram_fanout():
    rows = [{
        "doc_id": 0, "name": "distrib", "mtype": "histogram",
        "time_ns": TS, "attributes": [("k0", "v0"), ("k1", "v1")],
        "count": 16, "sum": 34.56,
        "explicit_bounds": [1.5, 2.0, 4.0],
        "bucket_counts": [4, 2, 3, 7],
    }]
    tags = ";k0=v0;k1=v1"
    assert _lines(rows) == [
        f"distrib.count{tags} 16 {TS_S}",
        f"distrib{tags} 34.56 {TS_S}",
        f"distrib.bucket{tags};upper_bound=1.5 4 {TS_S}",
        f"distrib.bucket{tags};upper_bound=2 2 {TS_S}",
        f"distrib.bucket{tags};upper_bound=4 3 {TS_S}",
        f"distrib.bucket{tags};upper_bound=inf 7 {TS_S}",
    ]


def test_histogram_no_bounds_no_bucket_lines():
    rows = [{"doc_id": 0, "name": "h", "mtype": "histogram",
             "time_ns": TS, "count": 3, "sum": 1.5,
             "explicit_bounds": [], "bucket_counts": [3]}]
    assert _lines(rows) == [f"h.count 3 {TS_S}", f"h 1.5 {TS_S}"]


def test_summary_fanout():
    rows = [{
        "doc_id": 0, "name": "summary", "mtype": "summary",
        "time_ns": TS, "attributes": [("k0", "v0"), ("k1", "v1")],
        "count": 11, "sum": 111.0,
        "quantiles": [0.9, 0.95, 0.99, 0.999],
        "quantile_values": [100.0, 6.0, 4.0, 1.0],
    }]
    tags = ";k0=v0;k1=v1"
    assert _lines(rows) == [
        f"summary.count{tags} 11 {TS_S}",
        f"summary{tags} 111 {TS_S}",
        f"summary.quantile{tags};quantile=90 100 {TS_S}",
        f"summary.quantile{tags};quantile=95 6 {TS_S}",
        f"summary.quantile{tags};quantile=99 4 {TS_S}",
        f"summary.quantile{tags};quantile=99.9 1 {TS_S}",
    ]


def test_float_value_never_scientific():
    # formatFloatForValue is 'f' (no exponent); labels are 'g'
    rows = [{"doc_id": 0, "name": "m", "mtype": "gauge",
             "time_ns": TS, "value_double": 1e21}]
    assert _lines(rows) == [f"m 1000000000000000000000 {TS_S}"]


def test_negative_timestamp_wraps_uint64():
    rows = [{"doc_id": 0, "name": "m", "mtype": "gauge",
             "time_ns": -1_000_000_000, "value_int": 1}]
    # uint64(-1e9) // 1e9 in Go
    want = ((-1_000_000_000) & 0xFFFFFFFFFFFFFFFF) // 1_000_000_000
    assert _lines(rows) == [f"m 1 {want}"]


def test_id_carry_and_seq():
    rows = [{"doc_id": 7, "name": "s", "mtype": "summary", "time_ns": TS,
             "count": 1, "sum": 2.0, "quantiles": [0.5],
             "quantile_values": [3.0]}]
    out = CarbonEncode()(_table(rows))
    assert out.column("doc_id").to_pylist() == [7, 7, 7]
    assert out.column("line_seq").to_pylist() == [0, 1, 2]


def test_roundtrip_through_carbon_receiver():
    """Rendered number lines parse back exactly through the
    carbonreceiver analog (stages/carbon.py)."""
    from opentelemetry_collector_contrib_ray.stages.carbon import (
        parse_carbon_batch)
    rows = [
        {"doc_id": 0, "name": "cpu.load", "mtype": "gauge",
         "time_ns": TS, "value_double": 10.25,
         "attributes": [("host", "h1"), ("dc", "east")]},
        {"doc_id": 1, "name": "reqs", "mtype": "sum",
         "time_ns": TS, "value_int": 42},
    ]
    enc = CarbonEncode()(_table(rows))
    parsed = parse_carbon_batch(
        pa.table({"line": enc.column("carbon_line")}))
    assert parsed.column("error").to_pylist() == [None, None]
    assert parsed.column("name").to_pylist() == ["cpu.load", "reqs"]
    assert parsed.column("value_double").to_pylist()[0] == 10.25
    assert parsed.column("value_int").to_pylist()[1] == 42
    assert parsed.column("timestamp_s").to_pylist() == [1574092046] * 2
    tags = parsed.column("tags").to_pylist()[0]
    assert dict(tags) == {"host": "h1", "dc": "east"}
