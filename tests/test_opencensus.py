"""opencensus translator parity (pkg/translator/opencensus) — decode
and encode, traces and metrics."""

import base64
import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.opencensus import (
    attrs_to_oc_node_resource,
    flat_metric_points_to_oc,
    flat_span_to_oc,
    metrics_to_oc,
    ns_to_rfc3339,
    ns_to_rfc3339_nano,
    oc_metric_rows,
    oc_node_resource_attrs,
    oc_span_to_flat,
    parse_oc_metrics,
    parse_oc_traces,
    rfc3339_to_ns,
    spans_to_oc,
)


def b64(hexstr):
    return base64.b64encode(bytes.fromhex(hexstr)).decode("ascii")


BASE = {"traceId": b64("ab" * 16), "spanId": b64("cd" * 8),
        "name": {"value": "op"},
        "startTime": "2020-01-02T03:04:05Z",
        "endTime": "2020-01-02T03:04:06Z"}


def flat(sp, res="{}"):
    return oc_span_to_flat(sp, res)


# --- timestamps (protojson / RFC3339Nano emission) -----------------------

def test_timestamp_codecs():
    assert rfc3339_to_ns("2020-01-02T03:04:05.000000064Z") == \
        1577934245000000064
    assert ns_to_rfc3339(1577934245000000064) == \
        "2020-01-02T03:04:05.000000064Z"
    assert ns_to_rfc3339(1577934245123000000) == "2020-01-02T03:04:05.123Z"
    assert ns_to_rfc3339(1577934245123456000) == \
        "2020-01-02T03:04:05.123456Z"
    assert ns_to_rfc3339(1577934245000000000) == "2020-01-02T03:04:05Z"
    # Go RFC3339Nano trims trailing zeros instead of 3/6/9 groups
    assert ns_to_rfc3339_nano(1577934245120000000) == \
        "2020-01-02T03:04:05.12Z"
    assert rfc3339_to_ns("2020-01-02T04:04:05+01:00") == \
        rfc3339_to_ns("2020-01-02T03:04:05Z")


# --- tracestate (TestOcTraceStateToInternal vectors) ----------------------

def test_tracestate_join():
    assert flat(dict(BASE))["trace_state"] is None
    sp = {**BASE, "tracestate": {"entries": [
        {"key": "abc", "value": "def"}]}}
    assert flat(sp)["trace_state"] == "abc=def"
    sp["tracestate"]["entries"].append({"key": "123", "value": "4567"})
    assert flat(sp)["trace_state"] == "abc=def,123=4567"


# --- attributes (TestInitAttributeMapFromOC vectors) ----------------------

def test_attribute_typing():
    sp = {**BASE, "attributes": {"attributeMap": {
        "abc": {"stringValue": {"value": "def"}},
        "intval": {"intValue": "345"},
        "boolval": {"boolValue": True},
        "doubleval": {"doubleValue": 4.5},
        "unknown": {}}}}
    attrs = json.loads(flat(sp)["attributes"])
    assert attrs == {"abc": "def", "intval": 345, "boolval": True,
                     "doubleval": 4.5,
                     "unknown":
                         "<Unknown OpenCensus attribute value type>"}


# --- span kind (TestOcSpanKindToInternal semantics) -----------------------

def test_kind_field_and_attr_fallback():
    assert flat({**BASE, "kind": "SERVER"})["span_kind"] == 2
    assert flat({**BASE, "kind": "CLIENT"})["span_kind"] == 3
    assert flat({**BASE, "kind": 1})["span_kind"] == 2
    for name, want in (("consumer", 5), ("producer", 4), ("internal", 1)):
        row = flat({**BASE, "attributes": {"attributeMap": {
            "span.kind": {"stringValue": {"value": name}}}}})
        assert row["span_kind"] == want
        assert json.loads(row["attributes"]) == {}    # attr deleted
    # unknown value: kind stays 0, attr stays
    row = flat({**BASE, "attributes": {"attributeMap": {
        "span.kind": {"stringValue": {"value": "weird"}}}}})
    assert row["span_kind"] == 0
    assert json.loads(row["attributes"]) == {"span.kind": "weird"}
    # SERVER kind field wins; attr remains an ordinary attribute
    row = flat({**BASE, "kind": "SERVER", "attributes": {"attributeMap": {
        "span.kind": {"stringValue": {"value": "consumer"}}}}})
    assert row["span_kind"] == 2
    assert json.loads(row["attributes"]) == {"span.kind": "consumer"}


# --- status (ocStatusToInternal incl. the nil-status quirk) ---------------

def test_status_mapping_and_override():
    assert flat({**BASE, "status": {"code": 0}})["status_code"] == 0
    row = flat({**BASE, "status": {"code": 9, "message": "boom"}})
    assert (row["status_code"], row["status_message"]) == (2, "boom")
    # otel.status_code overrides verbatim and is consumed
    row = flat({**BASE, "status": {"code": 9},
                "attributes": {"attributeMap": {
                    "otel.status_code": {"intValue": "1"}}}})
    assert row["status_code"] == 1
    assert json.loads(row["attributes"]) == {}
    # ... but ONLY when a status is present (Go returns early on nil)
    row = flat({**BASE, "attributes": {"attributeMap": {
        "otel.status_code": {"intValue": "1"}}}})
    assert row["status_code"] == 0
    assert json.loads(row["attributes"]) == {"otel.status_code": 1}


# --- ids (truncate / zero-pad copy semantics) -----------------------------

def test_id_copy_semantics():
    row = flat({**BASE, "traceId": b64("ab"), "spanId": b64("cd"),
                "parentSpanId": None})
    assert row["trace_id"] == "ab" + "00" * 15
    assert row["span_id"] == "cd" + "00" * 7
    assert row["parent_span_id"] is None
    long = flat({**BASE, "traceId": b64("ab" * 20)})
    assert long["trace_id"] == "ab" * 16


# --- node/resource (ocNodeResourceToInternal / internalResourceToOC) ------

def test_node_resource_precedence_and_langmap():
    attrs = oc_node_resource_attrs(
        {"serviceInfo": {"name": "svc"},
         "identifier": {"hostName": "h", "pid": "0",
                        "startTimestamp": "2020-01-02T03:04:05.120Z"},
         "libraryInfo": {"language": "LANGUAGE_PYTHON"},
         "attributes": {"service.name": "stale", "na": "nv"}},
        {"type": "container",
         "labels": {"cloud.zone": "z", "host.name": "stale2"}})
    assert attrs["service.name"] == "svc"          # special overwrites
    assert attrs["host.name"] == "h"
    assert attrs["cloud.availability_zone"] == "z"
    assert "process.pid" not in attrs              # pid 0 skipped
    assert attrs["opencensus.starttime"] == "2020-01-02T03:04:05.12Z"
    assert attrs["telemetry.sdk.language"] == "python"
    assert attrs["opencensus.resourcetype"] == "container"
    assert attrs["na"] == "nv"


def test_resource_type_inference_first_match():
    # container.name > k8s.pod.name > host.name(label) > cloud.provider
    _, res = attrs_to_oc_node_resource(
        {"container.name": "c", "k8s.pod.name": "p"})
    assert res["type"] == "container"
    _, res = attrs_to_oc_node_resource({"k8s.pod.name": "p"})
    assert res["type"] == "k8s"
    _, res = attrs_to_oc_node_resource({"cloud.provider": "aws"})
    assert res["type"] == "cloud"
    # host.name is a node special, never a label → no inference
    node, res = attrs_to_oc_node_resource({"host.name": "h"})
    assert res.get("type") is None
    assert node["identifier"]["hostName"] == "h"
    # explicit type wins over inference
    _, res = attrs_to_oc_node_resource(
        {"opencensus.resourcetype": "x", "container.name": "c"})
    assert res["type"] == "x"


def test_node_resource_roundtrip():
    attrs = oc_node_resource_attrs(
        {"serviceInfo": {"name": "svc"},
         "identifier": {"startTimestamp": "2020-01-02T03:04:05.120Z",
                        "hostName": "h1", "pid": "77"},
         "libraryInfo": {"language": 8, "coreLibraryVersion": "1.2",
                         "exporterVersion": "0.9"}},
        {"type": "container", "labels": {"cloud.zone": "z1", "l1": "v1"}})
    node, res = attrs_to_oc_node_resource(attrs)
    assert oc_node_resource_attrs(node, res) == attrs


# --- events / links -------------------------------------------------------

def test_message_event_and_annotation():
    sp = {**BASE, "timeEvents": {"timeEvent": [
        {"time": "2020-01-02T03:04:05.5Z",
         "annotation": {"description": {"value": "ann"},
                        "attributes": {
                            "attributeMap": {"k": {"intValue": 7}},
                            "droppedAttributesCount": 3}}},
        {"time": "2020-01-02T03:04:05.6Z",
         "messageEvent": {"type": "RECEIVED", "id": "3",
                          "uncompressedSize": "10",
                          "compressedSize": "9"}},
        {"time": "2020-01-02T03:04:05.7Z"},
        None]}}
    events = json.loads(flat(sp)["events"])
    assert len(events) == 3                       # nil event skipped
    assert events[0] == {"name": "ann", "attributes": {"k": 7},
                         "droppedAttributesCount": 3,
                         "timeUnixNano": 1577934245500000000}
    assert events[1]["name"] == "message"
    assert events[1]["attributes"]["message.type"] == "RECEIVED"
    assert events[1]["attributes"]["messaging.message.id"] == 3
    assert events[2]["name"].startswith("An unknown OpenCensus")


def test_span_roundtrip_all_surfaces():
    sp = {**BASE, "kind": "CLIENT",
          "parentSpanId": b64("ef" * 8),
          "tracestate": {"entries": [{"key": "a", "value": "b"}]},
          "status": {"code": 5, "message": "bad"},
          "sameProcessAsParentSpan": {"value": True},
          "attributes": {"attributeMap": {
              "s": {"stringValue": {"value": "x"}},
              "i": {"intValue": "42"}, "b": {"boolValue": False},
              "d": {"doubleValue": 1.5}}},
          "timeEvents": {"timeEvent": [
              {"time": "2020-01-02T03:04:05.5Z",
               "annotation": {"description": {"value": "ann"},
                              "attributes": {"attributeMap": {
                                  "k": {"intValue": "7"}}}}},
              {"time": "2020-01-02T03:04:05.6Z",
               "messageEvent": {"type": "SENT", "id": "3",
                                "uncompressedSize": "10",
                                "compressedSize": "9"}}]},
          "links": {"link": [{
              "traceId": b64("12" * 16), "spanId": b64("34" * 8),
              "tracestate": {"entries": [{"key": "x", "value": "y"}]},
              "attributes": {"attributeMap": {
                  "lk": {"boolValue": True}}}}]}}
    row = flat(sp, json.dumps({"service.name": "svc"}, sort_keys=True))
    row2 = oc_span_to_flat(flat_span_to_oc(row),
                           row["resource_attributes"])
    assert row == row2


def test_consumer_kind_roundtrips_via_attr():
    sp = {**BASE, "attributes": {"attributeMap": {
        "span.kind": {"stringValue": {"value": "producer"}}}}}
    row = flat(sp)
    assert row["span_kind"] == 4
    oc = flat_span_to_oc(row)
    assert "kind" not in oc
    assert oc["attributes"]["attributeMap"]["span.kind"] == \
        {"stringValue": {"value": "producer"}}
    assert oc_span_to_flat(oc, "{}") == row


# --- metrics ---------------------------------------------------------------

MDESC = {"name": "m", "unit": "ms",
         "labelKeys": [{"key": "k1"}, {"key": "k2"}]}


def test_metric_label_zip_rules():
    metric = {"metricDescriptor": {**MDESC, "type": "GAUGE_INT64"},
              "timeseries": [{
                  "startTimestamp": "2020-01-02T03:04:00Z",
                  # value list SHORTER than key list → keys truncated
                  "labelValues": [{"value": "a", "hasValue": True}],
                  "points": [{"timestamp": "2020-01-02T03:04:01Z",
                              "int64Value": "5"}]}]}
    rows = oc_metric_rows(metric, "{}")
    assert json.loads(rows[0]["attributes"]) == {"k1": "a"}
    # hasValue=false skipped
    metric["timeseries"][0]["labelValues"] = [
        {"hasValue": False}, {"value": "b", "hasValue": True}]
    rows = oc_metric_rows(metric, "{}")
    assert json.loads(rows[0]["attributes"]) == {"k2": "b"}


def test_metric_descriptor_drops():
    for typ in (0, "UNSPECIFIED", "GAUGE_DISTRIBUTION", 3):
        metric = {"metricDescriptor": {**MDESC, "type": typ},
                  "timeseries": [{"points": [
                      {"timestamp": "2020-01-02T03:04:01Z",
                       "int64Value": "5"}]}]}
        assert oc_metric_rows(metric, "{}") == []
    assert oc_metric_rows({"timeseries": []}, "{}") == []


def test_non_monotonic_sum_encodes_as_gauge_type():
    rows = [{"metric_name": "m", "metric_description": "",
             "metric_unit": "", "metric_type": "sum",
             "aggregation_temporality": 1, "is_monotonic": True,
             "start_time_unix_nano": 0,
             "time_unix_nano": 1577934245000000000,
             "value_int": 5, "value_double": None,
             "attributes": "{}"}]
    oc = flat_metric_points_to_oc(rows)
    assert oc["metricDescriptor"]["type"] == "GAUGE_INT64"
    rows[0]["aggregation_temporality"] = 2
    assert flat_metric_points_to_oc(rows)["metricDescriptor"]["type"] \
        == "CUMULATIVE_INT64"
    rows.append({**rows[0], "value_int": None, "value_double": 1.5})
    assert flat_metric_points_to_oc(rows)["metricDescriptor"]["type"] \
        == "CUMULATIVE_DOUBLE"        # any non-int point → double


def test_metric_full_roundtrip():
    metric = {"metricDescriptor": {**MDESC,
                                   "type": "CUMULATIVE_DISTRIBUTION"},
              "timeseries": [{
                  "startTimestamp": "2020-01-02T03:04:00Z",
                  "labelValues": [{"value": "a", "hasValue": True},
                                  {"hasValue": False}],
                  "points": [{
                      "timestamp": "2020-01-02T03:04:01Z",
                      "distributionValue": {
                          "count": "5", "sum": 10.5,
                          "bucketOptions": {"explicit": {
                              "bounds": [1, 2]}},
                          "buckets": [
                              {"count": "1"},
                              {"count": "2", "exemplar": {
                                  "value": 1.5,
                                  "timestamp": "2020-01-02T03:04:01Z",
                                  "attachments": {"e": "x"}}},
                              {"count": "2"}]}}]}]}
    rows = oc_metric_rows(metric, "{}")
    assert oc_metric_rows(flat_metric_points_to_oc(rows), "{}") == rows


# --- Ray stages end-to-end --------------------------------------------------

def _trace_doc():
    return json.dumps({
        "node": {"serviceInfo": {"name": "svc"}},
        "resource": {"labels": {"l": "v"}},
        "spans": [dict(BASE), None,
                  {**BASE, "resource": {"labels": {"own": "r"}}}]})


def test_parse_oc_traces_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([7, 8], pa.int64()),
        "oc_json": pa.array([_trace_doc(), "{bad"], pa.string())}))
    out = parse_oc_traces(ds, "oc_json").to_pandas()
    assert len(out) == 2                      # nil span skipped, bad doc dropped
    assert list(out["event_id"]) == [7, 7]
    res = [json.loads(r) for r in out["resource_attributes"]]
    assert {"l": "v", "service.name": "svc"} in res
    assert {"own": "r", "service.name": "svc"} in res
    kept = parse_oc_traces(ds, "oc_json", on_error="keep").to_pandas()
    assert kept["error"].notna().sum() == 1


def test_oc_dataset_roundtrip(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "oc_json": pa.array([_trace_doc()] * 2, pa.string())}))
    first = parse_oc_traces(ds, "oc_json")
    fdf = first.to_pandas()
    second = parse_oc_traces(spans_to_oc(first, "event_id"), "oc_json")
    sdf = second.to_pandas()
    key = ["event_id", "span_id", "resource_attributes"]
    # the carried oc_json provenance column legitimately differs
    f = fdf.drop(columns=["oc_json"]).sort_values(key) \
        .reset_index(drop=True)
    s = sdf.drop(columns=["oc_json"]).sort_values(key) \
        .reset_index(drop=True)
    assert f.equals(s)


def test_oc_metrics_dataset_roundtrip(ray_session):
    import ray

    doc = json.dumps({
        "node": {"serviceInfo": {"name": "svc"}},
        "metrics": [
            {"metricDescriptor": {**MDESC, "type": "SUMMARY"},
             "timeseries": [{
                 "startTimestamp": "2020-01-02T03:04:00Z",
                 "labelValues": [{"value": "a", "hasValue": True},
                                 {"hasValue": False}],
                 "points": [{"timestamp": "2020-01-02T03:04:01Z",
                             "summaryValue": {
                                 "sum": {"value": 2.5},
                                 "count": {"value": "3"},
                                 "snapshot": {"percentileValues": [
                                     {"percentile": 50,
                                      "value": 1.5}]}}}]}]}]})
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "oc_json": pa.array([doc], pa.string())}))
    first = parse_oc_metrics(ds, "oc_json")
    second = parse_oc_metrics(metrics_to_oc(first, "event_id"),
                              "oc_json")
    assert first.to_pandas().drop(columns=["oc_json"]).equals(
        second.to_pandas().drop(columns=["oc_json"]))
