"""awsemfexporter parity — grouped metrics, dimension rollups, metric
declarations, EMF v0/v1 envelopes, Go json.Marshal shape."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.awsemf import (
    GoStruct,
    MetricDeclaration,
    dimension_rollup,
    get_namespace,
    go_json,
    go_json_float,
    metrics_to_emf,
    replace_patterns,
    translate_unit,
)

K8S = ("{\"container_name\":\"cloudwatch-agent\",\"docker\":"
       "{\"container_id\":\"fc1b0a4c3faaa1808e187486a3a90cbea883dccaf2"
       "e2c46d4069d663b032a1ca\"},\"host\":\"ip-192-168-58-245.ec2."
       "internal\",\"labels\":{\"controller-revision-hash\":"
       "\"5bdbf497dc\",\"name\":\"cloudwatch-agent\","
       "\"pod-template-generation\":\"1\"},\"namespace_name\":"
       "\"amazon-cloudwatch\",\"pod_id\":"
       "\"e23f3413-af2e-4a98-89e0-5df2251e7f05\",\"pod_name\":"
       "\"cloudwatch-agent-26bl6\",\"pod_owners\":[{\"owner_kind\":"
       "\"DaemonSet\",\"owner_name\":\"cloudwatch-agent\"}]}")


def test_go_json_float_rules():
    assert go_json_float(5.0) == "5"
    assert go_json_float(0.5) == "0.5"
    assert go_json_float(1e7) == "10000000"          # json uses 'f', not 'g'
    assert go_json_float(1e21) == "1e+21"
    assert go_json_float(1.5e22) == "1.5e+22"
    assert go_json_float(1e-7) == "1e-7"             # e-0X cleanup
    assert go_json_float(2.5e-8) == "2.5e-8"
    assert go_json_float(123456789.25) == "123456789.25"


def test_translate_cw_metric_to_emf_v1_golden():
    # TestTranslateCWMetricToEMF "WithMeasurementAndEMFV1" byte-exact
    fields = {"OTelLib": "cloudwatch-otel", "spanName": "test",
              "spanCounter": 0, "kubernetes": json.loads(K8S),
              "Sources": ["cadvisor", "pod", "calculated"],
              "Version": "1",
              "_aws": {"CloudWatchMetrics": [GoStruct([
                  ("Namespace", "test-emf"),
                  ("Dimensions", [["OTelLib"], ["OTelLib", "spanName"]]),
                  ("Metrics", [GoStruct([("Name", "spanCounter"),
                                         ("Unit", "Count"),
                                         ("StorageResolution", 1)])])])],
                       "Timestamp": 1596151098037}}
    want = ("{\"OTelLib\":\"cloudwatch-otel\",\"Sources\":[\"cadvisor\","
            "\"pod\",\"calculated\"],\"Version\":\"1\",\"_aws\":"
            "{\"CloudWatchMetrics\":[{\"Namespace\":\"test-emf\","
            "\"Dimensions\":[[\"OTelLib\"],[\"OTelLib\",\"spanName\"]],"
            "\"Metrics\":[{\"Name\":\"spanCounter\",\"Unit\":\"Count\","
            "\"StorageResolution\":1}]}],\"Timestamp\":1596151098037},"
            "\"kubernetes\":" + K8S +
            ",\"spanCounter\":0,\"spanName\":\"test\"}")
    assert go_json(fields) == want


def test_namespace_resolution():
    assert get_namespace({"service.name": "n",
                          "service.namespace": "s"}, None) == "s/n"
    assert get_namespace({"service.name": "n"}, None) == "n"
    assert get_namespace({"service.namespace": "s"}, None) == "s"
    assert get_namespace({}, None) == "default"
    assert get_namespace({"service.name": "n"}, "cfg") == "cfg"


def test_replace_patterns():
    attrs = {"aws.ecs.cluster.name": "c1", "service.name": "svc"}
    s, ok = replace_patterns("/aws/{ClusterName}/{ServiceName}", attrs)
    assert (s, ok) == ("/aws/c1/svc", True)
    s, ok = replace_patterns("/aws/{TaskId}", attrs)
    assert (s, ok) == ("/aws/undefined", False)
    s, ok = replace_patterns("/aws/{ClusterName}",
                             {"ClusterName": "direct"})
    assert (s, ok) == ("/aws/direct", True)
    s, ok = replace_patterns("/aws/{ClusterName}",
                             {"aws.ecs.cluster.name": ""})
    assert (s, ok) == ("/aws/undefined", False)


def test_dimension_rollup():
    labels = {"OTelLib": "lib", "b": "2", "a": "1"}
    rolled = dimension_rollup("ZeroAndSingleDimensionRollup", labels)
    assert rolled == [["OTelLib"], ["OTelLib", "a"], ["OTelLib", "b"]]
    rolled = dimension_rollup("SingleDimensionRollupOnly", labels)
    assert rolled == [["OTelLib", "a"], ["OTelLib", "b"]]
    # no labels beyond OTelLib: no zero rollup
    assert dimension_rollup("ZeroAndSingleDimensionRollup",
                            {"OTelLib": "x"}) == []
    assert dimension_rollup("NoDimensionRollup", labels) == []


def test_unit_translation():
    assert translate_unit("m", "ms", {}) == "Milliseconds"
    assert translate_unit("m", "1", {}) == ""
    assert translate_unit("m", "ns", {}) == ""
    assert translate_unit("m", "By", {}) == "Bytes"
    assert translate_unit("m", "Custom", {}) == "Custom"
    d = {"m": {"metric_name": "m", "unit": "Count", "overwrite": False}}
    assert translate_unit("m", "", d) == "Count"
    assert translate_unit("m", "ms", d) == "Milliseconds"
    d["m"]["overwrite"] = True
    assert translate_unit("m", "ms", d) == "Count"


def test_metric_declaration_matching():
    decl = MetricDeclaration({
        "metric_name_selectors": ["^a", "b$"],
        "dimensions": [["x"], ["x", "y"], ["z"]],
        "label_matchers": [{"label_names": ["x", "y"],
                            "separator": ";", "regex": "^v;w$"}]})
    assert decl.matches_name("abc") and decl.matches_name("cb")
    assert not decl.matches_name("c")
    assert decl.matches_labels({"x": "v", "y": "w"})
    assert not decl.matches_labels({"x": "v"})
    assert decl.extract_dimensions({"x": "1", "y": "2"}) == \
        [["x"], ["x", "y"]]


def _mk_rows(**over):
    base = {
        "metric_name": ["m1"], "metric_unit": [""],
        "metric_type": ["sum"], "aggregation_temporality": [2],
        "time_unix_nano": [1_596_151_098_037_000_000],
        "value_int": [5], "value_double": [None], "count": [None],
        "dist_sum": [None], "dist_min": [None], "dist_max": [None],
        "quantiles": [None],
        "attributes": [json.dumps({"a": "1"})],
        "resource_attributes": [json.dumps({"service.name": "s"})],
        "scope_name": ["lib"],
    }
    base.update(over)
    n = max(len(v) for v in base.values())
    for k, v in base.items():
        if len(v) == 1:
            base[k] = v * n
    typed = {"aggregation_temporality": pa.int64(),
             "time_unix_nano": pa.int64(), "value_int": pa.int64(),
             "value_double": pa.float64(), "count": pa.int64(),
             "dist_sum": pa.float64(), "dist_min": pa.float64(),
             "dist_max": pa.float64()}
    return pa.table({k: pa.array(v, typed.get(k, pa.string()))
                     for k, v in base.items()})


def test_cumulative_delta_first_point_dropped(ray_session):
    import ray

    t = _mk_rows(value_int=[10, 25, 20],
                 time_unix_nano=[10 ** 18, 2 * 10 ** 18, 3 * 10 ** 18])
    out = metrics_to_emf(ray.data.from_arrow(t)).to_pandas()
    vals = sorted(json.loads(d)["m1"] for d in out["emf_json"])
    # first point dropped; 25-10=15; 20<25 → reset keeps raw 20
    assert vals == [15, 20]
    kept = metrics_to_emf(ray.data.from_arrow(t),
                          retain_initial_value_of_delta_metric=True
                          ).to_pandas()
    vals = sorted(json.loads(d)["m1"] for d in kept["emf_json"])
    assert vals == [10, 15, 20]


def test_nan_dropped_and_same_group_merges(ray_session):
    import ray

    t = _mk_rows(metric_name=["g1", "g2", "g3"],
                 metric_type=["gauge"] * 3,
                 aggregation_temporality=[0] * 3,
                 value_int=[1, None, 3],
                 value_double=[None, float("nan"), None])
    out = metrics_to_emf(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1        # same labels+type+ts → one document
    doc = json.loads(out["emf_json"].iloc[0])
    assert doc["g1"] == 1 and doc["g3"] == 3 and "g2" not in doc
    names = [m["Name"] for m in
             doc["_aws"]["CloudWatchMetrics"][0]["Metrics"]]
    assert names == ["g1", "g3"]


def test_detailed_summary_quantile_fanout(ray_session):
    import ray

    t = _mk_rows(metric_type=["summary"], aggregation_temporality=[0],
                 value_int=[None], count=[6], dist_sum=[20.5],
                 quantiles=[json.dumps([{"quantile": 0, "value": 1.5},
                                        {"quantile": 0.5, "value": 3.0},
                                        {"quantile": 1, "value": 5.5}])])
    out = metrics_to_emf(ray.data.from_arrow(t),
                         detailed_metrics=True).to_pandas()
    docs = [json.loads(d) for d in out["emf_json"]]
    flat = {}
    for d in docs:
        for k, v in d.items():
            if k in ("m1_sum", "m1_count"):
                flat[k] = v
            if k == "m1":
                flat[f"q{d['quantile']}"] = v
    assert flat == {"m1_sum": 20.5, "m1_count": 6,
                    "q0": 1.5, "q0.5": 3.0, "q1": 5.5}


def test_log_group_stream_patterns(ray_session):
    import ray

    t = _mk_rows(resource_attributes=[json.dumps(
        {"service.name": "s", "aws.ecs.cluster.name": "c9"})])
    out = metrics_to_emf(
        ray.data.from_arrow(t),
        retain_initial_value_of_delta_metric=True,
        log_group_name="/aws/ecs/{ClusterName}",
        log_stream_name="{TaskId}").to_pandas()
    assert out["log_group"].iloc[0] == "/aws/ecs/c9"
    # TaskId missing in resource AND labels → literal undefined
    assert out["log_stream"].iloc[0] == "undefined"


def test_declarations_drop_unmatched_group(ray_session):
    import ray

    t = _mk_rows(metric_name=["keep", "drop"],
                 metric_type=["gauge"] * 2,
                 aggregation_temporality=[0] * 2,
                 value_int=[1, 2])
    out = metrics_to_emf(
        ray.data.from_arrow(t), version="0",
        metric_declarations=[{
            "metric_name_selectors": ["^keep$"],
            "dimensions": [["a"]]}]).to_pandas()
    assert len(out) == 1
    doc = json.loads(out["emf_json"].iloc[0])
    # both fields present (fields are the group), only keep measured
    assert doc["keep"] == 1 and doc["drop"] == 2
    assert doc["CloudWatchMetrics"][0]["Metrics"] == \
        [{"Name": "keep", "Unit": "", "StorageResolution": 60}]
    assert doc["Timestamp"] == "1596151098037"
    assert doc["Version"] == "0"
