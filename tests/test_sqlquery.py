"""internal/sqlquery + sqlqueryreceiver parity — the config-driven
row→metric/log mapping engine (metrics.go:16-124, row_scanner.go,
logs_receiver.go:282-345)."""

import json

import pyarrow as pa
import ray

from opentelemetry_collector_contrib_ray.stages.sqlquery import (
    rows_to_logs,
    rows_to_metrics,
)

NS = 1_700_000_000_000_000_000


def _tbl():
    return pa.table({
        "val_i": pa.array([1, None, 3], pa.int64()),
        "val_s": pa.array(["42", " 7", "9"], pa.string()),
        "val_f": pa.array([4.0, 4.5, -2.0], pa.float64()),
        "genre": pa.array(["SF", None, "horror"], pa.string()),
        "count": pa.array([100, 200, 300], pa.int64()),
        "myts": pa.array(["123", "zzz", None], pa.string()),
    })


def _run(stage):
    out = stage.to_arrow_refs()
    return pa.concat_tables(ray.get(out)).to_pylist()


def test_gauge_int_with_attrs_and_null_value():
    ds = ray.data.from_arrow(_tbl())
    rows = _run(rows_to_metrics(ds, [{
        "metric_name": "db.count", "value_column": "val_i",
        "value_type": "int", "data_type": "gauge",
        "attribute_columns": ["genre"],
        "static_attributes": {"env": "prod"},
    }], ts_ns=NS))
    assert [r["value_int"] for r in rows] == [1, None, 3]
    # NULL value_column: datapoint still emitted, value empty
    # (scraper appends before validation); attrs still attach
    assert json.loads(rows[0]["attrs"]) == {"env": "prod",
                                            "genre": "SF"}
    # NULL attribute cell = missing from row map -> attr skipped
    assert json.loads(rows[1]["attrs"]) == {"env": "prod"}
    assert all(r["mtype"] == "gauge"
               and r["aggregation_temporality"] == 0
               and r["is_monotonic"] is None
               and r["start_time_unix_nano"] == 0
               and r["time_unix_nano"] == NS for r in rows)


def test_strconv_and_float_to_int_semantics():
    ds = ray.data.from_arrow(_tbl())
    rows = _run(rows_to_metrics(ds, [
        {"metric_name": "m1", "value_column": "val_s",
         "value_type": "int", "data_type": "gauge"},
        {"metric_name": "m2", "value_column": "val_f",
         "value_type": "int", "data_type": "gauge"},
        {"metric_name": "m3", "value_column": "val_i",
         "value_type": "double", "data_type": "gauge"},
    ], ts_ns=NS))
    by = {}
    for r in rows:
        by.setdefault(r["name"], []).append(
            r["value_int"] if r["value_int"] is not None
            else r["value_double"])
    # " 7" fails Atoi (Go rejects spaces)
    assert by["m1"] == [42, None, 9]
    # integral floats stringify without ".0" -> Atoi ok; 4.5 fails
    assert by["m2"] == [4, None, -2]
    assert by["m3"] == [1.0, None, 3.0]


def test_sum_temporality_and_ts_columns():
    ds = ray.data.from_arrow(_tbl())
    rows = _run(rows_to_metrics(ds, [
        {"metric_name": "cum", "value_column": "count",
         "value_type": "int", "data_type": "sum", "monotonic": True,
         "aggregation": "cumulative"},
        {"metric_name": "del", "value_column": "count",
         "value_type": "int", "data_type": "sum",
         "aggregation": "delta", "ts_column": "myts"},
    ], start_ts_ns=500, ts_ns=NS, collection_interval_ns=1000))
    cum = [r for r in rows if r["name"] == "cum"]
    assert all(r["aggregation_temporality"] == 2
               and r["is_monotonic"] is True
               and r["start_time_unix_nano"] == 500
               and r["time_unix_nano"] == NS for r in cum)
    dl = [r for r in rows if r["name"] == "del"]
    # ts overrides: "123" parses; "zzz" -> Timestamp(0) QUIRK;
    # NULL cell = missing from row map -> keeps the scrape clock
    assert [r["time_unix_nano"] for r in dl] == [123, 0, NS]
    # delta start = ts - interval
    assert [r["start_time_unix_nano"] for r in dl] == [
        123 - 1000, -1000, NS - 1000]
    assert all(r["aggregation_temporality"] == 1
               and r["is_monotonic"] is False for r in dl)


def test_rows_to_logs():
    ds = ray.data.from_arrow(pa.table({
        "body": pa.array(["hello", None], pa.string()),
        "level": pa.array(["info", "warn"], pa.string()),
    }))
    rows = _run(rows_to_logs(ds, [
        {"body_column": "body", "attribute_columns": ["level",
                                                      "missing"]},
    ], observed_ns=NS))
    # missing body -> empty body, record still emitted
    assert [r["body"] for r in rows] == ["hello", ""]
    assert json.loads(rows[0]["attrs"]) == {"level": "info"}
    assert all(r["observed_time_unix_nano"] == NS for r in rows)
