"""syslogexporter RFC5424/RFC3164 rendering parity
(exporter/syslogexporter/rfc5424_formatter.go, rfc3164_formatter.go)."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.syslogout import (
    _ToSyslog,
    render_structured_data,
)


def render(rows, protocol="rfc5424", octet=False):
    cols = {"priority": [], "version": [], "hostname": [],
            "appname": [], "proc_id": [], "msg_id": [], "message": [],
            "structured_data": [], "time_ns": []}
    for r in rows:
        for k in cols:
            cols[k].append(r.get(k))
    t = pa.table({k: pa.array(v, pa.int64() if k == "time_ns"
                              else pa.string())
                  for k, v in cols.items()})
    colmap = {k: k for k in cols}
    out = _ToSyslog(protocol, colmap, octet, "syslog")(t)
    return out.column("syslog").to_pylist()


TS = 1_700_000_000 * 10**9  # 2023-11-14T22:13:20Z


def test_rfc5424_full_frame():
    [line] = render([{"priority": "34", "hostname": "h", "appname": "a",
                      "proc_id": "p", "msg_id": "m",
                      "message": "hi there", "time_ns": TS}])
    assert line == "<34>1 2023-11-14T22:13:20Z h a p m - hi there\n"


def test_rfc5424_defaults():
    [line] = render([{"time_ns": TS}])
    assert line == "<165>1 2023-11-14T22:13:20Z - - - - -\n"


def test_rfc3339nano_fraction_trimming():
    [a, b, c] = render([{"time_ns": TS + 120_000_000},
                        {"time_ns": TS + 1},
                        {"time_ns": TS + 500_000}])
    assert "T22:13:20.12Z" in a
    assert "T22:13:20.000000001Z" in b
    assert "T22:13:20.0005Z" in c


def test_structured_data_rendering():
    sd = '{"ex@1":{"b":"2","a":"1"},"zz@9":{"k":"v w"}}'
    assert render_structured_data(sd) == \
        '[ex@1 a="1" b="2"][zz@9 k="v w"]'
    assert render_structured_data(None) == "-"
    assert render_structured_data('{"x": "not-a-map"}') == "-"
    assert render_structured_data('{"x": {"n": 5}}') == "[x]"
    [line] = render([{"structured_data": sd, "message": "m",
                      "time_ns": TS}])
    assert '[ex@1 a="1" b="2"][zz@9 k="v w"] m\n' in line


def test_octet_counting():
    [line] = render([{"message": "x", "time_ns": TS}], octet=True)
    n, rest = line.split(" ", 1)
    assert int(n) == len(rest.encode())


def test_rfc3164_frames():
    [a, b, c] = render([
        {"priority": "34", "hostname": "h", "appname": "ap",
         "message": "msg", "time_ns": TS},
        {"hostname": "h", "message": "msg", "time_ns": TS},
        {"hostname": "h", "appname": "ap", "time_ns": TS,
         "message": ""}], protocol="rfc3164")
    assert a == "<34>Nov 14 22:13:20 h ap: msg\n"
    assert b == "<165>Nov 14 22:13:20 h msg\n"
    # empty message: appname keeps its colon, no delimiter space
    assert c == "<165>Nov 14 22:13:20 h ap:\n"


def test_rfc3164_no_appname_no_message():
    [line] = render([{"time_ns": TS}], protocol="rfc3164")
    assert line == "<165>Nov 14 22:13:20 - \n"
