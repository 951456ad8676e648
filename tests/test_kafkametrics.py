"""kafkametricsreceiver consumer-scraper parity
(consumer_scraper.go:53-166) — lag math, isConsumed gate, −1
semantics, filters."""

import pyarrow as pa
import ray

from opentelemetry_collector_contrib_ray.stages.kafkametrics import (
    consumer_lag_metrics,
)


def _run(offsets_rows, hwm_rows, members, **kw):
    ds = ray.data.from_arrow(pa.table({
        "group": pa.array([r[0] for r in offsets_rows], pa.string()),
        "topic": pa.array([r[1] for r in offsets_rows], pa.string()),
        "partition": pa.array([r[2] for r in offsets_rows],
                              pa.int64()),
        "offset": pa.array([r[3] for r in offsets_rows], pa.int64()),
    }))
    hwm = pa.table({
        "topic": pa.array([r[0] for r in hwm_rows], pa.string()),
        "partition": pa.array([r[1] for r in hwm_rows], pa.int64()),
        "offset": pa.array([r[2] for r in hwm_rows], pa.int64()),
    })
    out = consumer_lag_metrics(ds, hwm, members, **kw)
    return pa.concat_tables(ray.get(out.to_arrow_refs())).to_pylist()


def test_lag_math_and_gates():
    rows = _run(
        [("g1", "t1", 0, 100), ("g1", "t1", 1, -1),
         ("g1", "t1", 2, 50),          # no hwm for partition 2
         ("g1", "dead", 0, -1),        # never consumed -> gated out
         ("g1", "_internal", 0, 5),    # topic filter
         ("g2", "t1", 0, 301)],        # measured lag == -1 (300-301)
        [("t1", 0, 300), ("t1", 1, 400), ("_internal", 0, 9)],
        {"g1": 3, "g2": 1})
    def pick(name, g=None, t=None, p=None):
        return [r["value_int"] for r in rows
                if r["name"] == name
                and (g is None or r["group"] == g)
                and (t is None or r["topic"] == t)
                and (p is None or r["partition"] == p)]

    assert pick("kafka.consumer_group.lag", "g1", "t1", 0) == [200]
    # offset -1: offset row emitted, lag -1
    assert pick("kafka.consumer_group.offset", "g1", "t1", 1) == [-1]
    assert pick("kafka.consumer_group.lag", "g1", "t1", 1) == [-1]
    # no hwm: lag -1, offset still emitted
    assert pick("kafka.consumer_group.lag", "g1", "t1", 2) == [-1]
    # offset_sum includes the -1; lag_sum only measured (200)
    assert pick("kafka.consumer_group.offset_sum", "g1", "t1") == [149]
    assert pick("kafka.consumer_group.lag_sum", "g1", "t1") == [200]
    # a MEASURED lag of -1 still lands in lag_sum (Go adds inside if)
    assert pick("kafka.consumer_group.lag", "g2", "t1", 0) == [-1]
    assert pick("kafka.consumer_group.lag_sum", "g2", "t1") == [-1]
    # never-consumed (g1, dead): nothing at all
    assert not [r for r in rows if r["topic"] == "dead"]
    # internal topic excluded by the default ^[^_].*$ filter
    assert not [r for r in rows if r["topic"] == "_internal"]
    # members: one non-monotonic sum per group
    mem = {r["group"]: r for r in rows
           if r["name"] == "kafka.consumer_group.members"}
    assert mem["g1"]["value_int"] == 3
    assert mem["g1"]["mtype"] == "sum"
    assert mem["g1"]["is_monotonic"] is False
    # gauges everywhere else
    assert all(r["mtype"] == "gauge" for r in rows
               if r["name"] != "kafka.consumer_group.members")


def test_merge_gate_paths_identical():
    rows_data = [("g1", "t1", 0, 100), ("g1", "t1", 1, -1),
                 ("g2", "t1", 0, 301), ("g1", "t2", 3, 7)]
    hwm = [("t1", 0, 300), ("t1", 1, 400), ("t2", 3, 10)]

    def norm(rows):
        return sorted((r["name"], r["group"], r["topic"],
                       r["partition"], r["value_int"]) for r in rows)

    driver = norm(_run(rows_data, hwm, {"g1": 1}))
    # merge_driver_rows=0 forces the distributed groupby-sum path
    dist = norm(_run(rows_data, hwm, {"g1": 1}, merge_driver_rows=0))
    assert driver == dist


def test_group_filter_search_semantics():
    rows = _run([("prod-app", "t", 0, 10), ("staging", "t", 0, 10)],
                [("t", 0, 100)], {}, group_match="prod")
    # MatchString = search, not fullmatch
    assert {r["group"] for r in rows} == {"prod-app"}
