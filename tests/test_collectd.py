"""collectdreceiver JSON decode — checked against the reference's own
testdata payload (receiver/collectdreceiver/testdata/collectd.json) and
the documented expected.yaml facts (collectd.go:19-232)."""

import json

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.collectdjson import (
    record_to_rows,
)

REF = "/root/reference/receiver/collectdreceiver/testdata/collectd.json"


def _rows():
    recs = json.load(open(REF))
    out = []
    cache = {}
    for rec in recs:
        out.extend(record_to_rows(rec, {}, cache))
    return out


def test_reference_payload_names_and_fanout():
    rows = _rows()
    # 7 metric records fan out per-dsname: 2 + 3 + 1 + 1 + 1 + 1 + 1 = 10;
    # the 2 event records (severity+message+time) are ignored
    assert len(rows) == 10
    assert [r["name"] for r in rows] == [
        "load.low", "load.high",
        "load.shortterm", "load.midterm", "load.longterm",
        "memory.used", "df_complex.free",
        "memory.old_gen_end", "memory.total_heap_space",
        "gauge.page.loadtime"]


def test_values_types_and_time():
    rows = _rows()
    by = {r["name"]: r for r in rows}
    assert by["load.low"]["value_double"] == 0.2
    assert by["load.low"]["value_int"] is None
    assert not by["load.low"]["is_cumulative"]
    # derive -> monotonic cumulative sum
    assert by["df_complex.free"]["is_cumulative"]
    assert by["df_complex.free"]["value_double"] == 1962600000.0
    # integral JSON number -> int datapoint (json.Number Int64-first)
    assert by["memory.old_gen_end"]["value_int"] == 26790
    assert by["memory.old_gen_end"]["value_double"] is None
    assert by["gauge.page.loadtime"]["value_double"] == 12.0
    assert by["load.low"]["time_ns"] == int(1415062577.4960001 * 1e9)


def test_labels_rules():
    rows = _rows()
    by = {r["name"]: dict(r["labels"]) for r in rows}
    # multi-dsname: dsname goes into the NAME, not the labels
    assert "dsname" not in by["load.low"]
    assert by["load.low"] == {"host": "i-b13d1e5f", "plugin": "fake"}
    # single dsname becomes the dsname label
    assert by["memory.used"]["dsname"] == "value"
    assert by["memory.used"]["plugin"] == "memory"
    # [k=v] extraction from type_instance, plugin_instance and host
    g = by["memory.old_gen_end"]
    assert g["k1"] == "v1" and g["k2"] == "v2"          # type_instance
    assert g["f"] == "x" and g["plugin_instance"] == "analytics"
    assert g["a"] == "b" and g["host"] == "mwp-signalbox"
    # dogstatsd record: plugin_instance is ONLY brackets -> no
    # plugin_instance label (stripped name empty), dims extracted
    d = by["gauge.page.loadtime"]
    assert d["env"] == "dev" and d["k1"] == "v1"
    assert "plugin_instance" not in d
    assert d["host"] == "some-host"


def test_event_ignored_and_labels_cumulative():
    event = {"time": 1.0, "severity": "OKAY", "message": "m",
             "host": "h", "plugin": "p"}
    assert record_to_rows(event) == []
    # labels map is created once per record and mutates across the
    # dsname loop — later datapoints inherit earlier additions
    rec = {"dsnames": ["a", "b"], "dstypes": ["gauge", "gauge"],
           "values": [1, 2], "type": "t", "plugin": "p", "host": "h"}
    rows = record_to_rows(rec)
    assert dict(rows[0]["labels"]) == {"plugin": "p", "host": "h"}
    assert dict(rows[1]["labels"]) == {"plugin": "p", "host": "h"}


def test_skip_rules_and_defaults():
    rec = {"dsnames": ["a", "b", "c"], "dstypes": ["gauge", "gauge"],
           "values": [1, None, 3], "type": "t", "time": None}
    rows = record_to_rows(rec, {"dc": "eu"})
    # b: null value skipped; c: no dstype at index 2 skipped
    assert len(rows) == 1
    assert rows[0]["name"] == "t.a"
    assert rows[0]["time_ns"] == 0
    assert dict(rows[0]["labels"])["dc"] == "eu"


def test_stage(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.collectdjson import (
        parse_collectd,
    )

    payload = open(REF).read()
    recs = json.load(open(REF))
    ds = ray.data.from_items(
        [{"record": payload}] +
        [{"record": json.dumps(r)} for r in recs]).repartition(3)
    out = parse_collectd(ds, "record").take_all()
    assert len(out) == 20  # the array payload + each record singly
    tbl = pa.Table.from_pylist(out)
    assert tbl.column("name").to_pylist().count("load.low") == 2
