"""awscloudwatchlogsexporter parity — pinned on the reference's own
TestLogToCWLog vectors (exporter_test.go:46-246) plus the
getLogInfo/replacePatterns rules (util.go, util_test.go)."""

import json

import pytest

from opentelemetry_collector_contrib_ray.stages.cwlogsout import (
    log_to_cw_event,
    replace_patterns,
)

# exporter_test.go testResource/testScope/testLogRecord
RESOURCE = {"host": "abc123", "node": 5}
BASE = {
    "body": "hello world",
    "severity_number": 5,
    "severity_text": "debug",
    "dropped_attributes_count": 4,
    "flags": 1,
    "trace_id": "0102030405060708090a0b0c0d0e0f10",
    "span_id": "0102030405060708",
    "attributes": json.dumps({"key1": 1, "key2": "attr2"}),
    "resource_attributes": json.dumps(RESOURCE),
    "scope_name": "test-scope",
    "scope_version": "1.0.0",
    "scope_attributes": json.dumps({"scope-attr": "value"}),
    "time_unix_nano": 1609719139 * 1_000_000,
}


def _event(row, **cfg):
    opts = {"log_group_name": "", "log_stream_name": "",
            "raw_log": False}
    opts.update(cfg)
    return log_to_cw_event(row, **opts)


def test_basic_golden():
    ev = _event(dict(BASE))
    assert ev["timestamp"] == 1609719139
    assert ev["message"] == (
        '{"body":"hello world","severity_number":5,"severity_text":'
        '"debug","dropped_attributes_count":4,"flags":1,"trace_id":'
        '"0102030405060708090a0b0c0d0e0f10","span_id":'
        '"0102030405060708","attributes":{"key1":1,"key2":"attr2"},'
        '"scope":{"name":"test-scope","version":"1.0.0","attributes":'
        '{"scope-attr":"value"}},"resource":{"host":"abc123","node":5}}')
    assert ev["log_group"] == "" and ev["log_stream"] == ""


def test_no_resource_golden():
    row = dict(BASE, resource_attributes="{}")
    assert _event(row)["message"].endswith(
        '"scope":{"name":"test-scope","version":"1.0.0","attributes":'
        '{"scope-attr":"value"}}}')


def test_no_scope_golden():
    row = dict(BASE, scope_name="", scope_version="",
               scope_attributes="{}")
    msg = _event(row)["message"]
    assert '"scope"' not in msg
    assert msg.endswith('"resource":{"host":"abc123","node":5}}')


def test_no_trace_golden():
    row = dict(BASE, trace_id="", span_id="", flags=0)
    ev = _event(row, log_group_name="tLogGroup",
                log_stream_name="tStreamName")
    assert ev["message"] == (
        '{"body":"hello world","severity_number":5,"severity_text":'
        '"debug","dropped_attributes_count":4,"attributes":'
        '{"key1":1,"key2":"attr2"},"scope":{"name":"test-scope",'
        '"version":"1.0.0","attributes":{"scope-attr":"value"}},'
        '"resource":{"host":"abc123","node":5}}')
    assert ev["log_group"] == "tLogGroup"
    assert ev["log_stream"] == "tStreamName"


def test_all_zero_ids_omitted():
    row = dict(BASE, trace_id="0" * 32, span_id="0" * 16)
    msg = _event(row)["message"]
    assert '"trace_id"' not in msg and '"span_id"' not in msg


def test_raw():
    row = dict(BASE, trace_id="", span_id="", flags=0)
    ev = _event(row, log_group_name="tLogGroup",
                log_stream_name="tStreamName", raw_log=True)
    assert ev["message"] == "hello world"
    assert ev["log_group"] == "tLogGroup"


EMF_V1 = ('{"_aws":{"Timestamp":1574109732004,"LogGroupName":"Foo",'
          '"CloudWatchMetrics":[{"Namespace":"MyApp","Dimensions":'
          '[["Operation"]],"Metrics":[{"Name":"ProcessingLatency",'
          '"Unit":"Milliseconds","StorageResolution":60}]}]},'
          '"Operation":"Aggregator","ProcessingLatency":100}')
EMF_V1_STREAM = EMF_V1.replace('"LogGroupName":"Foo",',
                               '"LogGroupName":"Foo",'
                               '"LogStreamName":"Foo",')
EMF_V0 = ('{"Timestamp":1574109732004,"log_group_name":"Foo",'
          '"CloudWatchMetrics":[],"Operation":"Aggregator"}')
EMF_V0_STREAM = EMF_V0.replace('"log_group_name":"Foo",',
                               '"log_group_name":"Foo",'
                               '"log_stream_name":"Foo",')


@pytest.mark.parametrize("body,group,stream", [
    (EMF_V1, "Foo", "tStreamName"),          # raw emf v1
    (EMF_V1_STREAM, "Foo", "Foo"),           # raw emf v1 with stream
    (EMF_V0, "Foo", "tStreamName"),          # raw emf v0
    (EMF_V0_STREAM, "Foo", "Foo"),           # raw emf v0 with stream
    ("hello world", "tLogGroup", "tStreamName"),  # not JSON
    ('{"_aws":"nope"}', "tLogGroup", "tStreamName"),  # type error
    ('{"_aws":{"logGroupName":5}}', "tLogGroup",
     "tStreamName"),                          # field type error
    ('{"log_group_name":""}', "tLogGroup", "tStreamName"),  # empty
    ("null", "tLogGroup", "tStreamName"),    # nil struct, no override
])
def test_raw_emf_overrides(body, group, stream):
    row = dict(BASE, body=body)
    ev = _event(row, log_group_name="tLogGroup",
                log_stream_name="tStreamName", raw_log=True)
    assert ev["message"] == body
    assert ev["log_group"] == group
    assert ev["log_stream"] == stream


def test_replace_patterns_raw_key_wins_then_mapped():
    # util.go:57-69 — raw pattern key first, then the mapped attr name
    attrs = {"ClusterName": "raw-c", "aws.ecs.cluster.name": "mapped-c",
             "aws.ecs.task.id": "t1"}
    assert replace_patterns("/logs/{ClusterName}/{TaskId}", attrs) \
        == "/logs/raw-c/t1"
    assert replace_patterns("{PodName}", attrs) == "undefined"
    assert replace_patterns("{NodeName}", {"k8s.node.name": ""}) \
        == "undefined"
    # FaasName/FaasVersion exist only in this exporter's table
    assert replace_patterns("{FaasName}", {"faas.name": "fn"}) == "fn"


def test_stage_end_to_end(ray_session):
    import ray

    from opentelemetry_collector_contrib_ray.stages.cwlogsout import (
        logs_to_cwlogs,
    )

    rows = [dict(BASE), dict(BASE, body="x", severity_number=0,
                             severity_text="", trace_id="",
                             span_id="", flags=0,
                             dropped_attributes_count=0,
                             attributes="{}", scope_name="",
                             resource_attributes="{}",
                             time_unix_nano=2_000_000_123)]
    ds = ray.data.from_items(rows)
    out = logs_to_cwlogs(ds, log_group_name="/g/{ClusterName}",
                         log_stream_name="s").take_all()
    assert out[0]["log_group"] == "/g/undefined"
    assert out[0]["timestamp"] == 1609719139
    assert out[1]["timestamp"] == 2000
    assert out[1]["message"] == '{"body":"x"}'
