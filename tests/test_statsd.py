"""statsdreceiver parse + aggregate — parity with a literal restatement of
parseMessageToMetric (statsd_parser.go:346-463) and the sequential
Aggregate flow (:260-330, metric_translator.go:145-172)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.statsd import (
    FULL_NAMES,
    parse_statsd_batch,
    serialize_tags,
)


def _cut(s, sep):
    i = s.find(sep)
    if i < 0:
        return s, "", False
    return s[:i], s[i + 1:], True


def _go_parse(line, enable_metric_type=False, enable_simple_tags=False):
    """parseMessageToMetric restated literally. Returns dict or error str."""
    out = {"addition": False, "sample_rate": None, "timestamp_ns": None,
           "tags": []}
    namevalue, rest, found = _cut(line, "|")
    if not found:
        return "invalid message format"
    name, valstr, found_v = _cut(namevalue, ":")
    if not found_v:
        return "invalid <name>:<value> format"
    if name == "":
        return "empty metric name"
    out["name"] = name
    if valstr == "":
        return "empty metric value"
    if valstr.startswith(("-", "+")):
        out["addition"] = True
    mtype, additional, _ = _cut(rest, "|")
    if mtype not in ("c", "g", "h", "ms", "d"):
        return "unsupported metric type"
    out["metric_type"] = mtype

    part, additional, _ = _cut(additional, "|")
    while part != "":
        if part.startswith("@"):
            try:
                out["sample_rate"] = float(part[1:])
            except ValueError:
                return "parse sample rate"
        elif part.startswith("#"):
            tags_str = part[1:]
            if tags_str != "":
                tag_set, tags_str, _ = _cut(tags_str, ",")
                while tag_set != "":
                    k, v, _ = _cut(tag_set, ":")
                    if k == "":
                        return "invalid tag format"
                    if v == "" and not enable_simple_tags:
                        return "invalid tag format"
                    out["tags"].append((k, v))
                    tag_set, tags_str, _ = _cut(tags_str, ",")
        elif part.startswith("c:"):
            if part[2:] != "":
                out["tags"].append(("container.id", part[2:]))
        elif part.startswith("T"):
            if mtype not in ("c", "g"):
                return "only GAUGE and COUNT metrics support a timestamp"
            if not part[1:].isdigit() or part[1:] == "":
                return "invalid timestamp"
            out["timestamp_ns"] = int(part[1:]) * 10**9
        else:
            return "unrecognized message part"
        part, additional, _ = _cut(additional, "|")
    try:
        out["value"] = float(valstr)
    except ValueError:
        return "parse metric value string"
    if enable_metric_type:
        out["tags"].append(("metric_type", FULL_NAMES[mtype]))
    return out


LINES = [
    "cpu:1|c",
    "cpu:1|c|@0.5",
    "cpu:-3|c",
    "mem:42.5|g",
    "mem:+2|g",
    "mem:-1.5|g",
    "lat:3.2|ms|@0.1|#env:prod,region:eu",
    "lat:3.2|h|#a:1",
    "d1:9|d",
    "x:1|c|#env:prod|c:abc123",
    "x:1|g|T1700000000",
    "x:1|ms|T1700000000",            # timestamp on timer -> error
    "x:1|c|Tnot_a_number",           # invalid timestamp
    "noval|c",                       # no colon
    ":5|c",                          # empty name
    "x:|c",                          # empty value
    "x:abc|c",                       # bad value
    "x:1|q",                         # bad type
    "x:1",                           # no pipe
    "x:1|c|@bad",                    # bad rate
    "x:1|c|#:v",                     # empty tag key
    "x:1|c|#k",                      # bare key, simple tags off
    "x:1|c||#env:prod",              # empty part stops processing
    "x:1|c|#env:prod,,k:v",          # empty tagset stops inner loop
    "x:1|c|zzz",                     # unrecognized part
    "x:1|c|c:",                      # empty container id -> skipped
    "x:1|c|@0.25|@0.5",              # last rate wins
    "a.b-c_d:+0.5|g|#k1:v1|#k2:v2",  # two tag parts append in order
]


@pytest.mark.parametrize("emt,est", [(False, False), (True, False),
                                     (False, True), (True, True)])
def test_parse_matches_go_restatement(emt, est):
    tbl = pa.table({"line": pa.array(LINES), "i": pa.array(range(len(LINES)))})
    out = parse_statsd_batch(tbl, "line", enable_metric_type=emt,
                             enable_simple_tags=est)
    got = out.to_pylist()
    for line, g in zip(LINES, got):
        e = _go_parse(line, emt, est)
        if isinstance(e, str):
            assert g["error"] == e, (line, g["error"], e)
            continue
        assert g["error"] is None, (line, g["error"])
        assert g["name"] == e["name"]
        assert g["metric_type"] == e["metric_type"]
        assert g["value"] == pytest.approx(e["value"])
        assert g["addition"] == e["addition"]
        if e["sample_rate"] is None:
            assert g["sample_rate"] is None
        else:
            assert g["sample_rate"] == pytest.approx(e["sample_rate"])
        assert g["timestamp_ns"] == e["timestamp_ns"]
        assert [(k, v) for k, v in g["tags"]] == e["tags"], line


def test_serialize_tags():
    tbl = pa.table({"line": pa.array(
        ["x:1|c|#a:1,b:2", "x:1|c", "x:1|c|#k:v|c:id9"])})
    out = parse_statsd_batch(tbl, "line")
    s = serialize_tags(out.column("tags")).to_pylist()
    assert s == ["a:1,b:2", "", "k:v,container.id:id9"]


def _go_aggregate(rows):
    """StatsDParser.Aggregate restated sequentially (single instrument)."""
    counters, gauges = {}, {}
    for r in rows:
        p = _go_parse(r["line"])
        if isinstance(p, str):
            continue
        key = (p["name"], ",".join(f"{k}:{v}" for k, v in p["tags"]))
        if p["metric_type"] == "c":
            x = p["value"]
            sr = p["sample_rate"]
            if sr is not None and 0 < sr < 1:
                x /= sr
            counters[key] = counters.get(key, 0) + int(x)
        elif p["metric_type"] == "g":
            if key not in gauges or not p["addition"]:
                gauges[key] = p["value"]
            else:
                gauges[key] += p["value"]
    return counters, gauges


def test_aggregate_matches_sequential(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.statsd import (
        statsd_aggregate,
    )

    rng = np.random.RandomState(7)
    rows = []
    names = ["cpu", "mem", "net"]
    for i in range(600):
        name = names[i % 3]
        kind = rng.randint(0, 6)
        v = int(rng.randint(-20, 80))
        tag = "|#env:prod" if i % 4 == 0 else ""
        if kind == 0:
            line = f"{name}:{v}|c{tag}"
        elif kind == 1:
            line = f"{name}:{v}|c|@0.5{tag}"
        elif kind == 2:
            line = f"{name}:{v}|g{tag}"
        elif kind == 3:
            line = f"{name}:+{abs(v)}|g{tag}"
        elif kind == 4:
            line = f"{name}:-{abs(v)}|g{tag}"
        else:
            line = f"{name}:{abs(v)}|ms{tag}"
        rows.append({"line": line, "order": i})

    ds = ray.data.from_items(rows).repartition(7)
    out = statsd_aggregate(ds, "line", "order")
    got = {(r["name"], r["tags"], r["metric_type"]): r["value"]
           for r in out.take_all()}

    counters, gauges = _go_aggregate(rows)
    expected = {(k[0], k[1], "counter"): float(v)
                for k, v in counters.items()}
    expected.update({(k[0], k[1], "gauge"): float(v)
                     for k, v in gauges.items()})
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k]), k


def test_aggregate_partitioning_invariance(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.statsd import (
        statsd_aggregate,
    )

    rows = [{"line": f"m:{'+' if i % 3 == 1 else ''}{i % 7}|g", "order": i}
            for i in range(100)]
    ref = None
    for parts in (1, 13):
        ds = ray.data.from_items(rows).repartition(parts)
        out = sorted(statsd_aggregate(ds, "line", "order").take_all(),
                     key=lambda r: (r["name"], r["tags"]))
        if ref is None:
            ref = out
        else:
            assert out == ref
