"""Prometheus translator + text exposition parity.

Name/trim/unit vectors restate the translator's own tests
(pkg/translator/prometheus/normalize_name_test.go,
normalize_label_test.go, unit_to_ucum_test.go); the exposition
grammar cases follow the classic text format (prometheus/common
expfmt) including the prometheus.io docs example.
"""

import math

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.prometheus import (
    build_compliant_name,
    build_compliant_prometheus_unit,
    decode_exposition,
    normalize_prom_label,
    parse_float_go,
    parse_label_blob,
    parse_prometheus_text,
    scan_sample_line,
    trim_prom_suffixes,
    unit_word_to_ucum,
)


# ---------------------------------------------------------------------------
# normalize_name_test.go vectors


@pytest.mark.parametrize("name,unit,mtype,mono,ns,want", [
    ("system.filesystem.usage", "By", "gauge", False, "",
     "system_filesystem_usage_bytes"),
    ("system.io", "By", "sum", True, "", "system_io_bytes_total"),
    ("network_transmitted_bytes_total", "By", "sum", True, "",
     "network_transmitted_bytes_total"),
    ("\t system.filesystem.usage       ", "  By\t", "gauge", False, "",
     "system_filesystem_usage_bytes"),
    ("system.network.dropped", "{packets}", "gauge", False, "",
     "system_network_dropped"),
    ("system.network.dropped", "packets", "gauge", False, "",
     "system_network_dropped_packets"),
    ("hw.gpu.memory.utilization", "1", "gauge", False, "",
     "hw_gpu_memory_utilization_ratio"),
    ("hw.fan.speed_ratio", "1", "gauge", False, "", "hw_fan_speed_ratio"),
    ("objects", "1", "sum", True, "", "objects_total"),
    ("broken.metric.speed", "km/h", "gauge", False, "",
     "broken_metric_speed_km_per_hour"),
    ("astro.light.speed_limit", "m/s", "gauge", False, "",
     "astro_light_speed_limit_meters_per_second"),
    ("broken.metric.success_percent", "%", "gauge", False, "",
     "broken_metric_success_percent"),
    ("unsupported.metric.temperature", "°F", "gauge", False, "",
     "unsupported_metric_temperature_F"),
    ("unsupported.metric.weird", "+=.:,!* & #", "gauge", False, "",
     "unsupported_metric_weird"),
    ("unsupported.metric.redundant", "__test $/°C", "gauge", False, "",
     "unsupported_metric_redundant_test_per_C"),
    ("test", "", "gauge", False, "space", "space_test"),
    ("#test", "", "gauge", False, "space", "space_test"),
    ("3.14 digits", "", "gauge", False, "", "_3_14_digits"),
    (":foo::bar", "", "sum", True, "", "foo_bar_total"),
    ("envoy__rule_engine_zlib_buf_error", "", "gauge", False, "",
     "envoy_rule_engine_zlib_buf_error"),
])
def test_build_compliant_name(name, unit, mtype, mono, ns, want):
    assert build_compliant_name(name, unit, mtype, mono, ns) == want


def test_build_compliant_name_no_suffixes():
    assert build_compliant_name(
        "system.io", "By", "sum", True,
        add_metric_suffixes=False) == "system_io"
    assert build_compliant_name(
        ":foo::bar", "", "gauge", False,
        add_metric_suffixes=False) == ":foo::bar"


# normalize_name_test.go:103-130
@pytest.mark.parametrize("name,mtype,unit,want", [
    ("active_directory_ds_replication_network_io_bytes_total", "sum",
     "bytes", "active_directory_ds_replication_network_io"),
    ("apache_requests_total", "sum", "1", "apache_requests"),
    ("system_cpu_utilization_ratio", "gauge", "ratio",
     "system_cpu_utilization"),
    ("mongodbatlas_process_oplog_rate_gibibytes_per_hour", "gauge",
     "gibibytes_per_hour", "mongodbatlas_process_oplog_rate"),
    ("up", "gauge", "", "up"),
    ("system_cpu_load_average_15m_ratio", "gauge", "1",
     "system_cpu_load_average_15m_ratio"),
    ("memcached_operation_hit_ratio_percent", "gauge", "%",
     "memcached_operation_hit_ratio_percent"),
    ("system_disk_operation_time_seconds_total", "sum", "s",
     "system_disk_operation_time_seconds"),
    ("nginx_requests", "gauge", "requests", "nginx"),
    ("apache_workers_connections", "gauge", "connections",
     "apache_workers"),
])
def test_trim_prom_suffixes(name, mtype, unit, want):
    assert trim_prom_suffixes(name, mtype, unit) == want


@pytest.mark.parametrize("label,want", [
    ("", ""), ("label:with:colons", "label_with_colons"),
    ("LabelName", "LabelName"), ("label.name", "label_name"),
    ("0label", "key_0label"), ("_label", "key_label"),
    ("__label", "__label"),
])
def test_normalize_prom_label(label, want):
    assert normalize_prom_label(label) == want


@pytest.mark.parametrize("unit,want", [
    ("meters_per_second", "m/s"), ("ratio", "1"), ("bytes", "By"),
    ("faults_per_second", "faults/s"), ("seconds", "s"),
    ("gibibytes_per_hour", "GiBy/h"),
])
def test_unit_word_to_ucum(unit, want):
    assert unit_word_to_ucum(unit) == want


def test_build_compliant_prometheus_unit():
    assert build_compliant_prometheus_unit("By/s") == "bytes_per_second"
    assert build_compliant_prometheus_unit("1") == ""
    assert build_compliant_prometheus_unit("{objects}/s") == "per_second"


# ---------------------------------------------------------------------------
# value parsing


@pytest.mark.parametrize("s,want", [
    ("1027", 1027.0), ("-3.5", -3.5), ("1.458255915e9", 1458255915.0),
    ("+Inf", math.inf), ("-Inf", -math.inf), ("Inf", math.inf),
    ("infinity", math.inf), ("1e-3", 0.001),
])
def test_parse_float_go(s, want):
    assert parse_float_go(s) == want


def test_parse_float_nan_and_invalid():
    assert math.isnan(parse_float_go("NaN"))
    assert parse_float_go("abc") is None
    assert parse_float_go("") is None


# ---------------------------------------------------------------------------
# sample line / label blob grammar


def test_label_blob_escapes():
    assert parse_label_blob(
        'path="C:\\\\DIR",error="line1\\nline2\\"q\\""') == [
        ("path", "C:\\DIR"), ("error", 'line1\nline2"q"')]


def test_label_blob_invalid_escape():
    assert parse_label_blob('a="bad\\t"') is None


def test_label_blob_spaces_and_trailing_comma():
    assert parse_label_blob(' a = "1" , b="2" ,') == [
        ("a", "1"), ("b", "2")]


def test_scan_sample_line_variants():
    assert scan_sample_line("m 1") == ("m", [], "1", None)
    assert scan_sample_line("m\t1\t5") == ("m", [], "1", "5")
    assert scan_sample_line('m{a="}"} 2') == ("m", [("a", "}")], "2",
                                              None)
    assert scan_sample_line("m 1 2 3") == "trailing characters"
    assert scan_sample_line("m{a=} 1") == "invalid label set"
    assert scan_sample_line("m") == "expected value"


# ---------------------------------------------------------------------------
# document decode — the prometheus.io docs example


DOCS_EXAMPLE = """\
# HELP http_requests_total The total number of HTTP requests.
# TYPE http_requests_total counter
http_requests_total{method="post",code="200"} 1027 1395066363000
http_requests_total{method="post",code="400"}    3 1395066363000

# Escaping in label values:
msdos_file_access_time_seconds{path="C:\\\\DIR\\\\FILE.TXT",error="Cannot find file:\\n\\"FILE.TXT\\""} 1.458255915e9

# Minimalistic line:
metric_without_timestamp_and_labels 12.47

# A weird metric from before the epoch:
something_weird{problem="division by zero"} +Inf -3982045

# A histogram, which has a pretty complex representation in the text format:
# HELP http_request_duration_seconds A histogram of the request duration.
# TYPE http_request_duration_seconds histogram
http_request_duration_seconds_bucket{le="0.05"} 24054
http_request_duration_seconds_bucket{le="+Inf"} 144320
http_request_duration_seconds_sum 53423
http_request_duration_seconds_count 144320

# Finally a summary, which has a complex representation, too:
# HELP rpc_duration_seconds A summary of the RPC duration in seconds.
# TYPE rpc_duration_seconds summary
rpc_duration_seconds{quantile="0.01"} 3102
rpc_duration_seconds_sum 1.7560473e+07
rpc_duration_seconds_count 2693
"""


def test_docs_example():
    rows = decode_exposition(DOCS_EXAMPLE)
    assert not isinstance(rows, str)
    assert len(rows) == 12
    by_name = {}
    for r in rows:
        by_name.setdefault(r["name"], []).append(r)
    assert by_name["http_requests_total"][0]["type"] == "counter"
    assert by_name["http_requests_total"][0]["timestamp_ms"] == \
        1395066363000
    esc = by_name["msdos_file_access_time_seconds"][0]
    assert esc["labels"] == [("path", "C:\\DIR\\FILE.TXT"),
                             ("error", 'Cannot find file:\n"FILE.TXT"')]
    assert esc["type"] == "untyped"
    assert by_name["something_weird"][0]["value"] == math.inf
    assert by_name["something_weird"][0]["timestamp_ms"] == -3982045
    buckets = by_name["http_request_duration_seconds_bucket"]
    assert all(b["family"] == "http_request_duration_seconds" and
               b["type"] == "histogram" for b in buckets)
    assert by_name["rpc_duration_seconds"][0]["family"] == \
        "rpc_duration_seconds"
    assert by_name["rpc_duration_seconds_count"][0]["type"] == "summary"


def test_type_state_errors():
    assert decode_exposition(
        "# TYPE a counter\n# TYPE a gauge\na 1\n") == \
        "second TYPE line for metric a"
    assert decode_exposition(
        "a 1\n# TYPE a counter\n") == "TYPE reported after samples for a"
    assert decode_exposition(
        "# HELP a x\n# HELP a y\n") == "second HELP line for metric a"
    assert decode_exposition("# TYPE a nonsense\n") == \
        "malformed TYPE line"


def test_summary_bucket_not_associated():
    # _bucket only maps to histogram families, not summaries
    rows = decode_exposition(
        "# TYPE s summary\ns_bucket{le=\"1\"} 2\n")
    assert rows[0]["family"] == "s_bucket"
    assert rows[0]["type"] == "untyped"


def test_whole_doc_fails_on_bad_line():
    assert isinstance(decode_exposition("good 1\nbad{x=} 1\n"), str)


def test_parse_stage_fanout_and_drop(ray_session):
    import ray

    docs = ["# TYPE c counter\nc 1\nc 2\n", "bad{ 1\n"]
    ds = ray.data.from_arrow(pa.table({
        "exposition": pa.array(docs, pa.string()),
        "idx": pa.array([0, 1], pa.int64())}))
    out = parse_prometheus_text(ds, "exposition").to_pandas()
    assert list(out["idx"]) == [0, 0]
    assert list(out["value"]) == [1.0, 2.0]
