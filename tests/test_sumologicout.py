"""sumologicexporter parity: prometheus-format metric lines, text/json
log lines, X-Sumo-Fields strings.

Vectors from prometheus_formatter_test.go, sender_test.go and
fields_test.go.
"""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.sumologicout import (
    SumoPrometheusEncode,
    _merge_tags,
    log_to_json,
    sanitize_key,
    sanitize_value,
    sumo_fields,
)

TS1 = 1618124444169000000
TS2 = 1608424699186000000


def _table(rows):
    fields = {
        "doc_id": pa.int64(), "name": pa.string(), "mtype": pa.string(),
        "time_ns": pa.int64(),
        "resource_attrs": pa.map_(pa.string(), pa.string()),
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


def _lines(rows):
    return SumoPrometheusEncode()(_table(rows)).column(
        "sumo_line").to_pylist()


def test_sanitize_key():
    # TestSanitizeKey
    assert (sanitize_key("&^*123-abc-ABC!./?_:\n\r")
            == "___123-abc-ABC_./__:__")


def test_sanitize_value():
    # TestSanitizeValue — `\`, `"`, `\n` escaped, \r left as-is
    assert (sanitize_value('&^*123-abc-ABC!?./"\\' + "\n\r")
            == '&^*123-abc-ABC!?./\\"\\\\\\n' + "\r")


def test_tags2string_merge_order_and_int_values():
    # TestTags2String: attributes then labels, AsString values
    tags = _merge_tags(
        [("test", "test_value"), ("test2", "second_value"), ("int", 200)],
        None,
        [("l_int", 200), ("l_str", "two")])
    assert tags == ('{test="test_value",test2="second_value",int="200",'
                    'l_int="200",l_str="two"}')
    assert _merge_tags([], None, []) == ""


def test_gauge_and_sum_lines():
    # TestPrometheusMetricDataTypeIntGauge etc. (single dp each here)
    rows = [
        {"doc_id": 0, "name": "gauge_metric_name", "mtype": "gauge",
         "time_ns": 1608124661166000000, "value_int": 124,
         "resource_attrs": [("foo", "bar")],
         "attributes": [("remote_name", "156920"),
                        ("url", "http://example_url")]},
        {"doc_id": 1, "name": "sum_metric_double_test", "mtype": "sum",
         "time_ns": 1618124444169000000, "value_double": 45.6,
         "resource_attrs": [("foo", "bar")],
         "attributes": [("pod_name", "lorem"),
                        ("namespace", "default")]},
    ]
    assert _lines(rows) == [
        'gauge_metric_name{foo="bar",remote_name="156920",'
        'url="http://example_url"} 124 1608124661166',
        'sum_metric_double_test{foo="bar",pod_name="lorem",'
        'namespace="default"} 45.6 1618124444169',
    ]


def test_summary_vector():
    # TestPrometheusMetricDataTypeSummary (two datapoints)
    rows = [
        {"doc_id": 0, "name": "summary_metric_double_test",
         "mtype": "summary", "time_ns": TS1, "sum": 45.6, "count": 3,
         "resource_attrs": [("foo", "bar")],
         "attributes": [("pod_name", "dolor"),
                        ("namespace", "sumologic")],
         "quantiles": [0.6, 2.6], "quantile_values": [0.7, 4.0]},
        {"doc_id": 1, "name": "summary_metric_double_test",
         "mtype": "summary", "time_ns": TS2, "sum": 1238.1, "count": 7,
         "resource_attrs": [("foo", "bar")],
         "attributes": [("pod_name", "sit"), ("namespace", "main")]},
    ]
    assert _lines(rows) == [
        'summary_metric_double_test{foo="bar",quantile="0.6",'
        'pod_name="dolor",namespace="sumologic"} 0.7 1618124444169',
        'summary_metric_double_test{foo="bar",quantile="2.6",'
        'pod_name="dolor",namespace="sumologic"} 4 1618124444169',
        'summary_metric_double_test_sum{foo="bar",pod_name="dolor",'
        'namespace="sumologic"} 45.6 1618124444169',
        'summary_metric_double_test_count{foo="bar",pod_name="dolor",'
        'namespace="sumologic"} 3 1618124444169',
        'summary_metric_double_test_sum{foo="bar",pod_name="sit",'
        'namespace="main"} 1238.1 1608424699186',
        'summary_metric_double_test_count{foo="bar",pod_name="sit",'
        'namespace="main"} 7 1608424699186',
    ]


def test_histogram_vector():
    # TestPrometheusMetricDataTypeHistogram, first datapoint
    rows = [{
        "doc_id": 0, "name": "histogram_metric_double_test",
        "mtype": "histogram", "time_ns": TS1, "sum": 45.6, "count": 7,
        "resource_attrs": [("bar", "foo")],
        "attributes": [("container", "dolor"), ("branch", "sumologic")],
        "explicit_bounds": [0.1, 0.2, 0.5, 0.8, 1.0],
        "bucket_counts": [0, 12, 7, 5, 8, 13],
    }]
    tags = ',container="dolor",branch="sumologic"}'
    assert _lines(rows) == [
        'histogram_metric_double_test_bucket{bar="foo",le="0.1"' + tags +
        " 0 1618124444169",
        'histogram_metric_double_test_bucket{bar="foo",le="0.2"' + tags +
        " 12 1618124444169",
        'histogram_metric_double_test_bucket{bar="foo",le="0.5"' + tags +
        " 19 1618124444169",
        'histogram_metric_double_test_bucket{bar="foo",le="0.8"' + tags +
        " 24 1618124444169",
        'histogram_metric_double_test_bucket{bar="foo",le="1"' + tags +
        " 32 1618124444169",
        'histogram_metric_double_test_bucket{bar="foo",le="+Inf"' + tags +
        " 45 1618124444169",
        'histogram_metric_double_test_sum{bar="foo",container="dolor",'
        'branch="sumologic"} 45.6 1618124444169',
        'histogram_metric_double_test_count{bar="foo",'
        'container="dolor",branch="sumologic"} 7 1618124444169',
    ]


def test_histogram_no_sum_no_buckets():
    # TestEmptyPrometheusMetrics: only the count line survives
    rows = [{"doc_id": 0, "name": "histogram_metric_double_test",
             "mtype": "histogram", "time_ns": 0, "count": 0,
             "resource_attrs": [("bar", "foo")]}]
    assert _lines(rows) == [
        'histogram_metric_double_test_count{bar="foo"} 0 0']


def test_empty_value_number_point_renders_empty_line():
    rows = [{"doc_id": 0, "name": "g", "mtype": "gauge", "time_ns": 0}]
    assert _lines(rows) == [""]


def test_log_to_json():
    # sender.go logToJSON: body under "log", sorted keys, no HTML escape
    assert (log_to_json([("b", "x"), ("a", 1)], "msg & <tag>")
            == '{"a":1,"b":"x","log":"msg & <tag>"}')
    # empty body omitted
    assert log_to_json([("a", "v")], "") == '{"a":"v"}'
    assert log_to_json(None, None) == "{}"


def test_sumo_fields():
    # fields.go: sorted k=v, sanitized, source attrs + empties skipped
    attrs = [("_sourceCategory", "cat"), ("z,key", "a=b\nc"),
             ("empty", ""), ("a", "1")]
    assert sumo_fields(attrs) == "a=1, z_key=a:b_c"
    assert sumo_fields([]) == ""
