"""mongodbatlasreceiver logs parity (log_decoder.go,
mongodb_event_to_logdata.go)."""

import json

from opentelemetry_collector_contrib_ray.stages.mongodbatlas import (
    SEVERITY_MAP,
    decode_audit_line,
    decode_log_line,
)


def test_severity_table():
    # D5 also maps to Debug4 (mongodb_event_to_logdata.go:44)
    assert SEVERITY_MAP["D5"] == 8 and SEVERITY_MAP["D4"] == 8
    assert SEVERITY_MAP["F"] == 21 and SEVERITY_MAP["I"] == 9


def test_json_line_attr_overwrite_order():
    line = json.dumps({
        "t": {"$date": "2024-05-29T16:16:28.063+00:00"},
        "s": "I", "c": "NETWORK", "id": 22943, "ctx": "conn1",
        "msg": "hi",
        "attr": {"message": "will-be-overwritten", "port": 9}})
    rec = decode_log_line(line, console=False, log_name="ln")
    attrs = json.loads(rec["attributes"])
    assert attrs["message"] == "hi"        # record field overwrites
    assert attrs["port"] == 9
    assert attrs["id"] == 22943
    assert rec["severity_text"] == "I"
    assert rec["severity_number"] == 9
    assert rec["body"] == line
    assert rec["time_unix_nano"] == 1716999388063000000


def test_console_line_no_id_and_regex():
    line = ("2024-05-29T16:16:28.063+0000 W NETWORK [conn5] "
            "listening on 27017")
    rec = decode_log_line(line, console=True, log_name="ln")
    attrs = json.loads(rec["attributes"])
    assert "id" not in attrs
    assert attrs["component"] == "NETWORK"
    assert attrs["context"] == "conn5"
    assert attrs["message"] == "listening on 27017"
    assert rec["severity_number"] == 13
    assert decode_log_line("garbage line", console=True,
                           log_name="ln") is None


def test_unknown_severity_and_bad_ts():
    line = json.dumps({"t": {"$date": "not-a-time"}, "s": "ZZ",
                       "msg": "x"})
    rec = decode_log_line(line, console=False, log_name="ln")
    assert rec["severity_number"] == 0
    assert rec["severity_text"] == ""
    assert rec["time_unix_nano"] == 0  # zero-time parse fallback
    assert decode_log_line("{bad json", console=False,
                           log_name="ln") is None


def test_audit_line():
    line = json.dumps({
        "atype": "authenticate",
        "ts": {"$date": "2024-05-29T16:16:28.063+00:00"},
        "local": {"ip": "1.2.3.4", "isSystemUser": True},
        "remote": {"unix": "/tmp/sock"},
        "uuid": {"$binary": "ab", "$type": "04"},
        "result": 0,
        "users": [{"user": "u", "db": "admin"}],
        "roles": []})
    rec = decode_audit_line(line, log_name="audit.gz")
    assert rec["severity_number"] == 9
    assert rec["severity_text"] == "INFO"
    attrs = json.loads(rec["attributes"])
    assert attrs["local.ip"] == "1.2.3.4"
    assert attrs["local.isSystemUser"] is True
    assert "local.port" not in attrs       # optional omitted
    assert attrs["remote.unix"] == "/tmp/sock"
    assert attrs["uuid.binary"] == "ab"
    assert attrs["users"] == [{"user": "u", "db": "admin"}]
    assert attrs["roles"] == []
    assert attrs["result"] == 0


def test_stage_multiline_doc(ray_session):
    import pyarrow as pa
    import ray

    from opentelemetry_collector_contrib_ray.stages.mongodbatlas import (
        parse_mongodb_atlas_logs,
    )

    good = json.dumps({"t": {"$date": "2024-05-29T16:16:28.063+00:00"},
                       "s": "E", "msg": "boom"})
    doc = good + "\nnot json\n" + good
    ds = ray.data.from_arrow(pa.table(
        {"log_doc": pa.array([doc], pa.string())}))
    out = parse_mongodb_atlas_logs(ds, org="o", project="p",
                                   cluster="c", region="r",
                                   provider="aws",
                                   hostname="h").take_all()
    assert len(out) == 2
    assert json.loads(out[0]["resource_attributes"])[
        "mongodb_atlas.org"] == "o"
