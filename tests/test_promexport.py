"""prometheusexporter parity — accumulator fold + expfmt text render,
pinned on the reference's own TestPrometheusExporter_endToEnd /
endToEndWithResource golden lines (prometheus_test.go:164-175,
290-301, 431-438) and a literal accumulator.go replay on random
sequences."""

import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_contrib_ray.stages.promexport import (
    _aslist,
    _fold_series,
    _series_labels,
    _series_lines,
    _family_of,
    extract_job_instance,
    timeseries_signature,
)


def _row(**kw):
    base = {
        "name": "m", "description": "", "unit": "", "mtype": "gauge",
        "aggregation_temporality": 0, "is_monotonic": False,
        "time_ns": 0, "start_time_ns": 0, "seq": 0,
        "value_int": None, "value_double": None, "count": None,
        "hsum": None, "explicit_bounds": None, "bucket_counts": None,
        "quantiles": None, "quantile_values": None, "ssum": None,
        "attributes": {}, "resource": {}, "scope_name": "",
        "scope_version": "", "scope_schema_url": "",
        "scope_attributes": {}, "flags_no_recorded": False,
    }
    base.update(kw)
    return base


def _fold(rows):
    g = pd.DataFrame([_row(**r) for r in rows])
    return _fold_series(g)


# --- accumulator semantics (accumulator.go) -------------------------------

def test_gauge_last_timestamp_wins():
    out = _fold([
        dict(time_ns=5, value_double=1.0, seq=0),
        dict(time_ns=3, value_double=2.0, seq=1),   # earlier → dropped
        dict(time_ns=5, value_double=3.0, seq=2),   # equal → replaces
    ])
    assert len(out) == 1
    assert out["value_double"].iloc[0] == 3.0


def test_stale_marker_deletes_series():
    out = _fold([
        dict(time_ns=1, value_double=1.0, seq=0),
        dict(time_ns=2, flags_no_recorded=True, seq=1),
    ])
    assert len(out) == 0
    out = _fold([
        dict(time_ns=1, value_double=1.0, seq=0),
        dict(time_ns=2, flags_no_recorded=True, seq=1),
        dict(time_ns=1, value_double=9.0, seq=2),   # re-registers
    ])
    assert out["value_double"].iloc[0] == 9.0


def test_delta_sum_chain():
    # accumulator.go:206-215 — start == stored ts joins the chain
    rows = [
        dict(mtype="sum", aggregation_temporality=1, is_monotonic=True,
             time_ns=10, start_time_ns=5, value_int=3, seq=0),
        dict(mtype="sum", aggregation_temporality=1, is_monotonic=True,
             time_ns=20, start_time_ns=10, value_int=4, seq=1),
        dict(mtype="sum", aggregation_temporality=1, is_monotonic=True,
             time_ns=30, start_time_ns=20, value_int=5, seq=2),
    ]
    out = _fold(rows)
    assert int(out["value_int"].iloc[0]) == 12
    assert int(out["start_time_ns"].iloc[0]) == 5
    assert int(out["aggregation_temporality"].iloc[0]) == 2
    # a break resets the chain
    rows[2]["start_time_ns"] = 19
    out = _fold(rows)
    assert int(out["value_int"].iloc[0]) == 5
    assert int(out["start_time_ns"].iloc[0]) == 19


def test_delta_hist_drop_reset_merge():
    h = dict(mtype="histogram", aggregation_temporality=1)
    out = _fold([
        dict(**h, time_ns=10, start_time_ns=5, count=2, hsum=1.0,
             explicit_bounds=[1.0], bucket_counts=[1, 1], seq=0),
        # aligned → merge
        dict(**h, time_ns=20, start_time_ns=10, count=3, hsum=2.0,
             explicit_bounds=[1.0], bucket_counts=[2, 1], seq=1),
        # misaligned, not after stored ts → dropped
        dict(**h, time_ns=25, start_time_ns=15, count=9, hsum=9.0,
             explicit_bounds=[1.0], bucket_counts=[9, 0], seq=2),
    ])
    assert int(out["count"].iloc[0]) == 5
    assert float(out["hsum"].iloc[0]) == 3.0
    assert _aslist(out["bucket_counts"].iloc[0]) == [3, 2]
    assert int(out["start_time_ns"].iloc[0]) == 5
    # misaligned start AFTER stored ts → reset
    out = _fold([
        dict(**h, time_ns=10, start_time_ns=5, count=2, hsum=1.0,
             explicit_bounds=[1.0], bucket_counts=[1, 1], seq=0),
        dict(**h, time_ns=40, start_time_ns=30, count=7, hsum=7.0,
             explicit_bounds=[1.0], bucket_counts=[4, 3], seq=1),
    ])
    assert int(out["count"].iloc[0]) == 7
    # bounds mismatch on an aligned merge → newer wins
    out = _fold([
        dict(**h, time_ns=10, start_time_ns=5, count=2, hsum=1.0,
             explicit_bounds=[1.0], bucket_counts=[1, 1], seq=0),
        dict(**h, time_ns=20, start_time_ns=10, count=3, hsum=2.5,
             explicit_bounds=[2.0], bucket_counts=[2, 1], seq=1),
    ])
    assert int(out["count"].iloc[0]) == 3
    assert float(out["hsum"].iloc[0]) == 2.5
    assert int(out["start_time_ns"].iloc[0]) == 5


def _go_replay(rows):
    """Literal accumulator.go gauge/sum state machine."""
    stored = None
    for r in rows:
        if r["flags_no_recorded"]:
            stored = None
            continue
        if stored is not None and r["time_ns"] < stored["time_ns"]:
            continue
        r = dict(r)
        if (r["mtype"] == "sum" and r["aggregation_temporality"] == 1
                and stored is not None
                and r["start_time_ns"] == stored["time_ns"]):
            r["value_int"] = (r["value_int"] or 0) + \
                (stored["value_int"] or 0)
            r["start_time_ns"] = stored["start_time_ns"]
        stored = r
    return stored


@pytest.mark.parametrize("mtype,temp", [("gauge", 0), ("sum", 1),
                                        ("sum", 2)])
def test_fold_matches_literal_replay(mtype, temp):
    rng = np.random.RandomState(7)
    for trial in range(30):
        n = rng.randint(1, 12)
        rows = []
        prev_ts = 0
        for i in range(n):
            ts = int(rng.randint(0, 40))
            start = prev_ts if rng.rand() < 0.6 else int(
                rng.randint(0, 40))
            rows.append(_row(
                mtype=mtype, aggregation_temporality=temp,
                is_monotonic=True, time_ns=ts, start_time_ns=start,
                value_int=int(rng.randint(0, 100)), seq=i,
                flags_no_recorded=bool(rng.rand() < 0.08)))
            prev_ts = ts
        want = _go_replay(rows)
        got = _fold(rows)
        if want is None:
            assert len(got) == 0, rows
        else:
            assert len(got) == 1, rows
            assert int(got["value_int"].iloc[0]) == want["value_int"]
            assert int(got["time_ns"].iloc[0]) == want["time_ns"]
            if temp == 1:
                assert int(got["start_time_ns"].iloc[0]) == \
                    want["start_time_ns"]


# --- render golden lines (prometheus_test.go) -----------------------------

def _render_row(row, *, namespace="", const_labels=None,
                add_metric_suffixes=True, send_timestamps=False):
    fam, tstr = _family_of(row, namespace=namespace,
                           add_metric_suffixes=add_metric_suffixes)
    pairs = _series_labels(row, const_labels or {})
    return fam, tstr, _series_lines(row, fam, tstr, pairs,
                                    send_timestamps)


def test_end_to_end_with_resource_golden():
    # TestPrometheusExporter_endToEndWithResource:431-438 — namespace
    # test, const labels, send_timestamps, resource_to_telemetry puts
    # the resource attr into the datapoint attrs, suffixes legacy-off
    row = _row(name="counter-int", mtype="sum", is_monotonic=True,
               aggregation_temporality=2, value_int=123,
               time_ns=1581452773000000789,
               attributes={"label-1": "label-value-1",
                           "resource-attr": "resource-attr-val-1"})
    fam, tstr, lines = _render_row(
        row, namespace="test",
        const_labels={"foo2": "bar2", "code2": "one2"},
        add_metric_suffixes=False, send_timestamps=True)
    assert fam == "test_counter_int" and tstr == "counter"
    assert lines == [
        'test_counter_int{code2="one2",foo2="bar2",'
        'label_1="label-value-1",otel_scope_name="",'
        'otel_scope_schema_url="",otel_scope_version="",'
        'resource_attr="resource-attr-val-1"} 123 1581452773000']


def test_end_to_end_multiple_targets_golden():
    # prometheus_test.go:218-233 — job/instance labels from the
    # resource, tokenized name with namespace, value 99+128
    row = _row(name="metric_1_this/one/there(where)", unit="By",
               description="Extra ones", mtype="sum",
               is_monotonic=True, aggregation_temporality=2,
               value_int=99 + 128,
               attributes={"os": "windows", "arch": "x86"},
               resource={"service.name": "cpu-exporter",
                         "service.instance.id": "localhost:8080"})
    fam, tstr, lines = _render_row(
        row, namespace="test",
        const_labels={"foo1": "bar1", "code1": "one1"},
        add_metric_suffixes=False)
    assert fam == "test_metric_1_this_one_there_where"
    assert lines == [
        'test_metric_1_this_one_there_where{arch="x86",code1="one1",'
        'foo1="bar1",instance="localhost:8080",job="cpu-exporter",'
        'os="windows",otel_scope_name="",otel_scope_schema_url="",'
        'otel_scope_version=""} 227']


def test_histogram_first_slot_quirk_and_inf():
    # collector.go:332-354 — duplicate bound counts only its FIRST slot
    row = _row(name="lat", mtype="histogram",
               aggregation_temporality=2, count=100, hsum=12.5,
               explicit_bounds=[1.0, 2.5, 1.0],
               bucket_counts=[3, 4, 9, 5])
    fam, tstr, lines = _render_row(row)
    assert tstr == "histogram"
    assert lines == [
        'lat_bucket{otel_scope_name="",otel_scope_schema_url="",'
        'otel_scope_version="",le="1"} 3',
        'lat_bucket{otel_scope_name="",otel_scope_schema_url="",'
        'otel_scope_version="",le="2.5"} 7',
        'lat_bucket{otel_scope_name="",otel_scope_schema_url="",'
        'otel_scope_version="",le="+Inf"} 100',
        'lat_sum{otel_scope_name="",otel_scope_schema_url="",'
        'otel_scope_version=""} 12.5',
        'lat_count{otel_scope_name="",otel_scope_schema_url="",'
        'otel_scope_version=""} 100']


def test_summary_quantiles_ascending():
    row = _row(name="rpc.duration", mtype="summary", count=9,
               ssum=4.5, quantiles=[0.99, 0.5],
               quantile_values=[2.0, 1.0])
    fam, _, lines = _render_row(row)
    assert fam == "rpc_duration"
    assert lines[0].endswith('quantile="0.5"} 1')
    assert lines[1].endswith('quantile="0.99"} 2')
    assert lines[2] == ('rpc_duration_sum{otel_scope_name="",'
                        'otel_scope_schema_url="",'
                        'otel_scope_version=""} 4.5')


def test_label_escaping_and_scope_labels():
    row = _row(name="g", value_double=1.5,
               attributes={"a": 'x"y\\z\nw'},
               scope_name="lib", scope_version="1.0",
               scope_attributes={"sa": "v"})
    _, _, lines = _render_row(row)
    assert lines == [
        'g{a="x\\"y\\\\z\\nw",otel_scope_name="lib",'
        'otel_scope_sa="v",otel_scope_schema_url="",'
        'otel_scope_version="1.0"} 1.5']


def test_duplicate_label_drops_series():
    row = _row(name="g", value_double=1.0,
               attributes={"a.b": "x", "a_b": "y"})
    assert _series_labels(row, {}) is None


def test_job_instance_extraction():
    assert extract_job_instance({"service.name": "s"}) == ("s", None)
    assert extract_job_instance(
        {"service.name": "s", "service.namespace": "ns",
         "service.instance.id": "i"}) == ("ns/s", "i")
    assert extract_job_instance({}) == (None, None)


def test_signature_separates_series():
    a = _row(name="m", attributes={"k": "1"})
    b = _row(name="m", attributes={"k": "2"})
    c = _row(name="m", attributes={"k": "1"}, mtype="sum")
    assert timeseries_signature(a) != timeseries_signature(b)
    assert timeseries_signature(a) != timeseries_signature(c)
    assert timeseries_signature(a) == timeseries_signature(dict(a))


def test_stage_end_to_end(ray_session):
    import ray

    from opentelemetry_collector_contrib_ray.stages.promexport import (
        metrics_to_prometheus_text,
    )

    import pyarrow as pa

    res = [("service.name", "svc"), ("service.instance.id", "i1"),
           ("host.name", "h1")]
    tab = pa.table({
        "name": pa.array(["req"] * 3, pa.string()),
        "description": pa.array(["Reqs"] * 3, pa.string()),
        "unit": pa.array(["1"] * 3, pa.string()),
        "mtype": pa.array(["sum"] * 3, pa.string()),
        "aggregation_temporality": pa.array([2, 2, 2], pa.int32()),
        "is_monotonic": pa.array([True] * 3, pa.bool_()),
        "time_ns": pa.array([10, 20, 5], pa.int64()),
        "start_time_ns": pa.array([0, 0, 0], pa.int64()),
        "seq": pa.array([0, 1, 2], pa.int64()),
        "value_int": pa.array([5, 7, 1], pa.int64()),
        "value_double": pa.array([None] * 3, pa.float64()),
        "count": pa.array([None] * 3, pa.int64()),
        "hsum": pa.array([None] * 3, pa.float64()),
        "explicit_bounds": pa.array([None] * 3,
                                    pa.list_(pa.float64())),
        "bucket_counts": pa.array([None] * 3, pa.list_(pa.int64())),
        "quantiles": pa.array([None] * 3, pa.list_(pa.float64())),
        "quantile_values": pa.array([None] * 3,
                                    pa.list_(pa.float64())),
        "ssum": pa.array([None] * 3, pa.float64()),
        "attributes": pa.array([[], [], [("x", "1")]],
                               pa.map_(pa.string(), pa.string())),
        "resource": pa.array([res, res, []],
                             pa.map_(pa.string(), pa.string())),
        "scope_name": pa.array([""] * 3, pa.string()),
        "scope_version": pa.array([""] * 3, pa.string()),
        "scope_schema_url": pa.array([""] * 3, pa.string()),
        "scope_attributes": pa.array([[], [], []],
                                     pa.map_(pa.string(), pa.string())),
        "flags_no_recorded": pa.array([False] * 3, pa.bool_()),
    })
    ds = ray.data.from_arrow(tab)
    out = metrics_to_prometheus_text(ds).take_all()
    lines = sorted(r["line"] for r in out)
    assert "# HELP req_total Reqs" in lines
    assert "# TYPE req_total counter" in lines
    assert "# HELP target_info Target metadata" in lines
    assert ('req_total{instance="i1",job="svc",otel_scope_name="",'
            'otel_scope_schema_url="",otel_scope_version=""} 7'
            in lines)
    assert ('req_total{otel_scope_name="",otel_scope_schema_url="",'
            'otel_scope_version="",x="1"} 1' in lines)
    assert ('target_info{host_name="h1",instance="i1",job="svc"} 1'
            in lines)
