"""awsfirehosereceiver cwmetrics/cwlogs decode parity
(internal/unmarshaler/cwmetricstream/unmarshaler.go,
internal/unmarshaler/cwlog/unmarshaler.go)."""

import gzip
import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.firehose import (
    decode_cwlogs_record,
    decode_cwmetrics_record,
    parse_cwlogs,
    parse_cwmetrics,
    to_service_attributes,
)

DATUM = {"metric_stream_name": "s", "account_id": "a",
         "region": "r", "namespace": "AWS/EC2", "metric_name": "cpu",
         "unit": "Percent", "timestamp": 1700000000000,
         "dimensions": {"InstanceId": "i-1", "az": "use1-az1"},
         "value": {"count": 3, "sum": 6.0, "min": 1.0, "max": 3.0,
                   "p99": 2.9, "p50": 2.0, "pxx": 1.0, "other": 5}}


def test_namespace_split():
    assert to_service_attributes("AWS/EC2") == ("AWS", "EC2")
    assert to_service_attributes("aws/Lambda") == ("aws", "Lambda")
    assert to_service_attributes("MyApp") == (None, "MyApp")
    assert to_service_attributes("Custom/Thing") == (None, "Custom/Thing")


def test_cwmetrics_basic():
    rows = decode_cwmetrics_record(json.dumps(DATUM))
    assert not isinstance(rows, str)
    r = rows[0]
    assert r["service_namespace"] == "AWS" and r["service_name"] == "EC2"
    assert r["dimensions"] == [("service.instance.id", "i-1"),
                               ("az", "use1-az1")]
    assert r["count"] == 3.0 and r["sum"] == 6.0
    assert r["percentiles"] == [("p50", 2.0), ("p99", 2.9)]
    assert r["timestamp_ms"] == 1700000000000


def test_cwmetrics_invalid_datums_skipped_not_fatal():
    bad = {**DATUM}
    del bad["unit"]
    rec = "\n".join([json.dumps(bad), "not json", json.dumps(DATUM)])
    rows = decode_cwmetrics_record(rec)
    assert len(rows) == 1


def test_cwmetrics_all_invalid_is_error():
    assert decode_cwmetrics_record("not json\n{}") == \
        "record format invalid"
    assert decode_cwmetrics_record("") == "record format invalid"


def test_cwmetrics_missing_value_invalid():
    d = {**DATUM}
    del d["value"]
    assert isinstance(decode_cwmetrics_record(json.dumps(d)), str)


def test_cwmetrics_empty_value_object_is_set():
    # UnmarshalJSON sets isSet even for {} — zeros everywhere
    d = {**DATUM, "value": {}}
    rows = decode_cwmetrics_record(json.dumps(d))
    assert rows[0]["count"] == 0.0 and rows[0]["percentiles"] == []


def test_cwmetrics_fractional_timestamp_fails_datum():
    d = {**DATUM, "timestamp": 17.5}
    assert isinstance(decode_cwmetrics_record(json.dumps(d)), str)


def gz(doc):
    return gzip.compress(json.dumps(doc).encode())


CWLOG = {"messageType": "DATA_MESSAGE", "owner": "acct1",
         "logGroup": "g", "logStream": "s",
         "logEvents": [{"id": "1", "timestamp": 1700000000000,
                        "message": "hello"}]}


def test_cwlogs_basic():
    rows = decode_cwlogs_record(gz(CWLOG))
    assert rows == [{"owner": "acct1", "log_group": "g",
                     "log_stream": "s",
                     "time_ns": 1700000000000 * 1_000_000,
                     "body": "hello"}]


def test_cwlogs_control_message_yields_nothing():
    assert decode_cwlogs_record(gz(
        {"messageType": "CONTROL_MESSAGE",
         "logEvents": [{"timestamp": 1, "message": "x"}]})) == []


def test_cwlogs_missing_field_errors():
    for field, msg in [("owner", "owner"), ("logGroup", "logGroup"),
                       ("logStream", "logStream")]:
        doc = {**CWLOG}
        del doc[field]
        err = decode_cwlogs_record(gz(doc))
        assert isinstance(err, str) and msg in err


def test_cwlogs_bad_message_type_and_gzip():
    err = decode_cwlogs_record(gz({**CWLOG, "messageType": "WEIRD"}))
    assert "invalid message type" in err
    assert decode_cwlogs_record(b"not gzip") == \
        "failed to decompress record"


def test_stages(ray_session):
    import ray

    mrec = json.dumps(DATUM)
    ds = ray.data.from_arrow(pa.table({
        "record": pa.array([mrec, "junk"], pa.string()),
        "idx": pa.array([0, 1], pa.int64())}))
    out = parse_cwmetrics(ds, "record").to_pandas()
    assert list(out["idx"]) == [0]
    lds = ray.data.from_arrow(pa.table({
        "record_gz": pa.array([gz(CWLOG), b"x"], pa.binary()),
        "idx": pa.array([0, 1], pa.int64())}))
    lout = parse_cwlogs(lds, "record_gz").to_pandas()
    assert list(lout["body"]) == ["hello"]
