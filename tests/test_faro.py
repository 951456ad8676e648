"""Faro translator parity (pkg/translator/faro) — both directions,
pinned against the reference's own testdata."""

import json
import os

import pyarrow as pa
import pytest
import yaml

from opentelemetry_collector_contrib_ray.functions.hashing import xxh3_64
from opentelemetry_collector_contrib_ray.stages.faro import (
    faro_payload_to_log_rows,
    faro_payload_trace_rows,
    go_strconv_quote,
    go_unquote,
    log_row_to_faro,
    logfmt_line,
    logfmt_parse,
    logs_to_faro_payloads,
    parse_faro_payloads,
    rfc3339_milli,
    rows_to_faro_payloads,
)

TESTDATA = "/root/reference/pkg/translator/faro/testdata"

RES_KEY = {"service.name": "service_name",
           "service.version": "service_version",
           "deployment.environment": "deployment_environment",
           "service.namespace": "service_namespace",
           "app_bundle_id": "app_bundle_id", "app": "app"}


# --- xxh3 ---------------------------------------------------------------

def test_xxh3_vectors():
    # published empty-input vector + the reference testdata's own
    # exception-hash vectors (general/plogs.yaml:43, actions-payload)
    assert xxh3_64(b"") == 0x2D06800538D394C2
    assert xxh3_64(b"Cannot read property 'find' of undefined") == \
        2735541995122471342
    assert xxh3_64(b"Exception related to user action") == \
        17187077909215573004


def test_xxh3_all_length_paths_deterministic():
    buf = bytes(range(256)) * 20
    seen = set()
    for ln in (0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 64, 96, 128, 129,
               160, 240, 241, 1024, 1025, 2048, 5000):
        v = xxh3_64(buf[:ln])
        assert v == xxh3_64(buf[:ln])
        assert 0 <= v < 2 ** 64
        seen.add(v)
    assert len(seen) == 22          # no collisions across paths


# --- logfmt / quote helpers ---------------------------------------------

def test_logfmt_quoting_rules():
    # quoted iff a rune <= ' ', '=', '"' or empty (go-logfmt)
    assert logfmt_line([("k", "plain")]) == "k=plain"
    assert logfmt_line([("k", "a b")]) == 'k="a b"'
    assert logfmt_line([("k", "a=b")]) == 'k="a=b"'
    assert logfmt_line([("k", 'a"b')]) == 'k="a\\"b"'
    assert logfmt_line([("k", "a\nb")]) == 'k="a\\nb"'
    assert logfmt_line([("k", "")]) == 'k=""'
    assert logfmt_line([("k", 3.5), ("j", 14.0)]) == "k=3.5 j=14"
    with pytest.raises(ValueError):
        logfmt_line([("bad key", "v")])
    with pytest.raises(ValueError):
        logfmt_line([("", "v")])


def test_quote_unquote_roundtrip():
    for s in ("", "plain", "a b", 'say "hi"', "tab\there", "nl\nthere",
              "back\\slash", "\x01ctl", "unicode é ↦", "mixed=stuff"):
        assert go_unquote(go_strconv_quote(s)) == s


def test_logfmt_parse_semantics():
    kv = logfmt_parse('a=1 b="x y" c c2= d="q\\"z"')
    assert kv == {"a": "1", "b": "x y", "c": "", "c2": "", "d": 'q"z'}
    assert logfmt_parse("dup=1 dup=2")["dup"] == "2"
    with pytest.raises(ValueError):
        logfmt_parse('k="unterminated')


def test_rfc3339_milli():
    assert rfc3339_milli("2021-09-30T10:46:17.680Z") == \
        "2021-09-30T10:46:17.68Z"
    assert rfc3339_milli("2023-11-16T10:00:55.995Z") == \
        "2023-11-16T10:00:55.995Z"
    assert rfc3339_milli("2021-01-02T03:04:05Z") == "2021-01-02T03:04:05Z"
    assert rfc3339_milli("2021-01-02T03:04:05.000Z") == \
        "2021-01-02T03:04:05Z"
    assert rfc3339_milli(None) == "0001-01-01T00:00:00Z"
    assert rfc3339_milli("2021-01-02T03:04:05.5+02:00") == \
        "2021-01-02T03:04:05.5+02:00"


# --- forward direction vs reference testdata ----------------------------

def _expected_log_rows(plogs_path):
    exp = yaml.safe_load(open(plogs_path))
    rows = []
    for rl in (exp or {}).get("resourceLogs") or []:
        res = {kv["key"]: kv["value"].get("stringValue")
               for kv in rl.get("resource", {}).get("attributes", [])}
        for sl in rl.get("scopeLogs", []):
            for lr in sl.get("logRecords", []):
                attrs = {kv["key"]: kv["value"].get("stringValue")
                         for kv in lr.get("attributes", [])}
                rows.append((lr.get("body", {}).get("stringValue"),
                             attrs.get("kind"), attrs.get("hash"), res))
    return rows


FORWARD_DIRS = ("standard-payload", "browser-brand-slice-payload",
                "browser-brand-string-payload", "actions-payload",
                "general")


@pytest.mark.parametrize("d", FORWARD_DIRS)
def test_faro_to_logs_reference_testdata(d):
    payload = json.load(open(os.path.join(TESTDATA, d, "payload.json")))
    rows = faro_payload_to_log_rows(payload)
    exp = _expected_log_rows(os.path.join(TESTDATA, d, "plogs.yaml"))
    assert len(rows) == len(exp)
    for r, (body, kind, h, res) in zip(rows, exp):
        assert r["body"] == body
        assert r["kind"] == kind
        assert (r["hash"] or None) == (h or None)
        got_res = {"service.name": r["service_name"],
                   "service.version": r["service_version"],
                   "deployment.environment": r["deployment_environment"]}
        if r["service_namespace"]:
            got_res["service.namespace"] = r["service_namespace"]
        if r["app_bundle_id"]:
            got_res["app_bundle_id"] = r["app_bundle_id"]
        assert got_res == res


def test_faro_to_logs_empty_payload():
    # the reference's empty-payload case: a zero-item payload emits no
    # log records at all (faro_to_logs.go:65-67)
    assert faro_payload_to_log_rows({"meta": {"app": {"name": "x"}}}) == []


def test_faro_to_traces_reference_testdata():
    payload = json.load(open(os.path.join(TESTDATA, "standard-payload",
                                          "payload.json")))
    rows = faro_payload_trace_rows(payload)
    exp = yaml.safe_load(open(os.path.join(TESTDATA, "standard-payload",
                                           "ptraces.yaml")))
    exp_spans = []
    for rs in exp.get("resourceSpans", []):
        res = {kv["key"]: list(kv["value"].values())[0]
               for kv in rs.get("resource", {}).get("attributes", [])}
        for ss in rs.get("scopeSpans", []):
            for sp in ss.get("spans", []):
                exp_spans.append((sp.get("traceId"), sp.get("spanId"),
                                  sp.get("name"), res))
    assert len(rows) == len(exp_spans)
    for r, (tid, sid, name, res) in zip(rows, exp_spans):
        assert r["trace_id"] == tid
        assert r["span_id"] == sid
        assert r["span_name"] == name
        assert json.loads(r["resource_attributes"]) == res


def test_faro_to_traces_no_traces():
    assert faro_payload_trace_rows({"meta": {"app": {"name": "x"}}}) == []


# --- reverse direction vs reference testdata ----------------------------

def _norm(p):
    """Go-struct-equality normalization: drop empties, strip the JSON
    fields the Go Frame struct doesn't carry (in_app), canonicalize
    timestamps."""
    if isinstance(p, dict):
        out = {}
        for k, v in p.items():
            if k == "in_app":
                continue
            nv = _norm(v)
            if nv in ("", None, {}, []):
                continue
            if k == "timestamp" and isinstance(nv, str):
                nv = rfc3339_milli(nv)
            out[k] = nv
        return out
    if isinstance(p, list):
        return [_norm(x) for x in p]
    return p


def _reverse_rows(plogs_path):
    rows = []
    exp = yaml.safe_load(open(plogs_path))
    for rl in (exp or {}).get("resourceLogs") or []:
        res_raw = {kv["key"]: kv["value"].get("stringValue")
                   for kv in rl.get("resource", {}).get("attributes", [])}
        res = {RES_KEY.get(k, k): v for k, v in res_raw.items()}
        for sl in rl.get("scopeLogs", []):
            for lr in sl.get("logRecords", []):
                rows.append((lr.get("body", {}).get("stringValue"), res))
    return rows


REVERSE_CASES = (
    ("two-identical-log-records-different-service-name-resource-attribute",
     ("payload-1.json", "payload-2.json")),
    ("two-log-records-same-resource", ("payload.json",)),
    ("two-log-records-different-app-release",
     ("payload-1.json", "payload-2.json")),
    ("multiple-log-records-same-resource", ("payload.json",)),
    ("actions-payload", ("payload.json",)),
    ("browser-brand-slice-payload", ("payload.json",)),
    ("browser-brand-string-payload", ("payload.json",)),
)


@pytest.mark.parametrize("d,expfiles", REVERSE_CASES)
def test_logs_to_faro_reference_testdata(d, expfiles):
    rows = _reverse_rows(os.path.join(TESTDATA, d, "plogs.yaml"))
    got, errs = rows_to_faro_payloads(rows)
    assert errs == []
    exp = [_norm({k: v for k, v in
                  json.load(open(os.path.join(TESTDATA, d, f))).items()
                  if k != "traces"}) for f in expfiles]
    assert [_norm(p) for p in got] == exp


def test_logs_to_faro_kind_errors():
    for f, want in (("plogs-record-missing-kind.yaml",
                     "doesn't contain kind"),
                    ("plogs-record-unknown-kind.yaml", "not supported")):
        rows = _reverse_rows(os.path.join(TESTDATA, f))
        got, errs = rows_to_faro_payloads(rows)
        assert got == [] and len(errs) == 1 and want in errs[0]


def test_app_name_resolution_precedence():
    # service.name > custom "app" resource attr > body app_name
    body = "kind=log message=m app_name=fromline"
    meta, _, _ = log_row_to_faro(body, {"service_name": "fromres"})
    assert meta["app"]["name"] == "fromres"
    meta, _, _ = log_row_to_faro(body, {"app": "custom"})
    assert meta["app"]["name"] == "custom"
    meta, _, _ = log_row_to_faro(body, {})
    assert meta["app"]["name"] == "fromline"


# --- Ray stage end-to-end -----------------------------------------------

def _payload_doc():
    return json.dumps({
        "logs": [{"message": "hello world", "level": "warning",
                  "context": {"a": "1"},
                  "timestamp": "2021-09-30T10:46:17.680Z",
                  "trace": {"trace_id": "t1", "span_id": "s1"}}],
        "exceptions": [{"type": "Error", "value": "boom boom",
                        "timestamp": "2021-09-30T10:46:17.680Z",
                        "stacktrace": {"frames": [
                            {"function": "f", "filename": "a.js",
                             "lineno": 3, "colno": 4}]}}],
        "meta": {"app": {"name": "app1", "version": "2",
                         "environment": "dev"}},
    })


def test_parse_faro_payloads_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b"], pa.string()),
        "payload_json": pa.array([_payload_doc(), "{not json"],
                                 pa.string())}))
    out = parse_faro_payloads(ds, "payload_json").to_pandas()
    assert len(out) == 2                       # bad doc dropped
    assert set(out["kind"]) == {"log", "exception"}
    assert list(out["doc_id"]) == ["a", "a"]   # parent carry
    assert out[out["kind"] == "exception"]["hash"].iloc[0] == \
        str(xxh3_64(b"boom boom"))
    kept = parse_faro_payloads(ds, "payload_json",
                               on_error="keep").to_pandas()
    assert len(kept) == 3
    assert kept["error"].notna().sum() == 1


def test_faro_roundtrip_dataset(ray_session):
    import ray

    docs = [_payload_doc()] * 3
    ds = ray.data.from_arrow(pa.table({
        "payload_json": pa.array(docs, pa.string())}))
    first = parse_faro_payloads(ds, "payload_json")
    first_bodies = sorted(first.to_pandas()["body"])
    payloads = logs_to_faro_payloads(first, "body")
    pdf = payloads.to_pandas()
    # identical meta for all rows → exactly one payload document
    assert len(pdf) == 1
    second = parse_faro_payloads(
        ray.data.from_arrow(pa.table({
            "payload_json": pa.array(list(pdf["payload_json"]),
                                     pa.string())})), "payload_json")
    assert sorted(second.to_pandas()["body"]) == first_bodies


def test_logs_to_faro_max_items_slices(ray_session):
    import ray

    n = 10
    ds = ray.data.from_arrow(pa.table({
        "payload_json": pa.array([_payload_doc()] * n, pa.string())}))
    first = parse_faro_payloads(ds, "payload_json")
    sliced = logs_to_faro_payloads(first, "body", max_items=7).to_pandas()
    # 20 items / 7 per payload → 3 slices of one meta
    assert len(sliced) == 3
    total = sum(len(v) for p in sliced["payload_json"]
                for k, v in json.loads(p).items() if k != "meta")
    assert total == 2 * n
