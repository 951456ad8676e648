"""OTLP-JSON traces/metrics — round-trip identity and JSON↔proto format
interchange (otlpjsonfilereceiver handles all three signals;
receiver/otlpjsonfilereceiver/file.go:41-95)."""

import pyarrow as pa

import ray.data

from opentelemetry_collector_contrib_ray.sources.otlpjson import (
    read_otlp_json_metrics,
    read_otlp_json_traces,
    write_otlp_json_metrics,
    write_otlp_json_traces,
)
from opentelemetry_collector_contrib_ray.sources.otlpproto import (
    METRIC_FLAT_SCHEMA,
    SPAN_FLAT_SCHEMA,
    read_otlp_proto_metrics,
    read_otlp_proto_traces,
    write_otlp_proto_metrics,
    write_otlp_proto_traces,
)

from .test_otlp_proto import _metric_table, _span_table


def _norm(rows, keys=("trace_state", "metric_unit")):
    # proto3/JSON cannot represent unset-vs-empty strings distinctly
    for r in rows:
        for k in keys:
            if k in r and r[k] == "":
                r[k] = None
        if r.get("value_double") == 0.0 and r.get("value_int") is None \
                and "metric_name" in r:
            r["value_double"] = None  # unset value oneof
    return rows


def _sorted_rows(t: pa.Table, col: str):
    return sorted(_norm(t.to_pylist()), key=lambda r: (str(r[col]), str(r)))


def test_traces_json_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "traces_json")
    src = _span_table()
    manifest = write_otlp_json_traces(
        ray.data.from_arrow(src).repartition(2), out)
    assert sum(r["rows"] for r in manifest.take_all()) == src.num_rows
    back = pa.Table.from_pylist(read_otlp_json_traces(out).take_all(),
                                schema=SPAN_FLAT_SCHEMA)
    assert _sorted_rows(back, "span_name") == _sorted_rows(src, "span_name")


def test_metrics_json_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "metrics_json")
    src = _metric_table()
    write_otlp_json_metrics(ray.data.from_arrow(src), out)
    back = pa.Table.from_pylist(read_otlp_json_metrics(out).take_all(),
                                schema=METRIC_FLAT_SCHEMA)
    assert _sorted_rows(back, "time_unix_nano") == \
        _sorted_rows(src, "time_unix_nano")


def test_json_proto_interchange_traces_metrics(ray_session, tmp_path):
    """Reading either export format yields the same flat rows — a user
    can switch fileexporter `format:` without changing the pipeline."""
    src_t, src_m = _span_table(), _metric_table()
    dirs = {n: str(tmp_path / n) for n in
            ("tj", "tp", "mj", "mp")}
    write_otlp_json_traces(ray.data.from_arrow(src_t), dirs["tj"])
    write_otlp_proto_traces(ray.data.from_arrow(src_t), dirs["tp"])
    write_otlp_json_metrics(ray.data.from_arrow(src_m), dirs["mj"])
    write_otlp_proto_metrics(ray.data.from_arrow(src_m), dirs["mp"])
    tj = pa.Table.from_pylist(read_otlp_json_traces(dirs["tj"]).take_all(),
                              schema=SPAN_FLAT_SCHEMA)
    tp = pa.Table.from_pylist(read_otlp_proto_traces(dirs["tp"]).take_all(),
                              schema=SPAN_FLAT_SCHEMA)
    assert _sorted_rows(tj, "span_name") == _sorted_rows(tp, "span_name")
    mj = pa.Table.from_pylist(read_otlp_json_metrics(dirs["mj"]).take_all(),
                              schema=METRIC_FLAT_SCHEMA)
    mp = pa.Table.from_pylist(read_otlp_proto_metrics(dirs["mp"]).take_all(),
                              schema=METRIC_FLAT_SCHEMA)
    assert _sorted_rows(mj, "time_unix_nano") == \
        _sorted_rows(mp, "time_unix_nano")


def test_empty_signal_datasets_write_nothing(ray_session, tmp_path):
    for name, write, schema in [
        ("t_json", write_otlp_json_traces, SPAN_FLAT_SCHEMA),
        ("m_json", write_otlp_json_metrics, METRIC_FLAT_SCHEMA),
        ("t_pb", write_otlp_proto_traces, SPAN_FLAT_SCHEMA),
        ("m_pb", write_otlp_proto_metrics, METRIC_FLAT_SCHEMA),
    ]:
        manifest = write(ray.data.from_arrow(schema.empty_table()),
                         str(tmp_path / name))
        assert manifest.count() == 0, name
