"""datadogsemanticsprocessor — per-row rule parity with the Go logic.

``_reference_row`` restates processor.go's per-span derivation (service/
version/env defaults, insertAttrIfMissingOrShouldOverride, span-kind
names, http code fallback chain, status2Error status-message fallback,
VCS protocol strip) literally over dicts.
"""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.stages.datadog import (
    NO_SERVICE,
    SPAN_KIND_NAMES,
    DatadogSemantics,
    strip_protocol,
)


def _reference_row(r, override=False):
    out = dict(r)

    def put(key, val):
        if override:
            out[key] = val
        elif out.get(key) is None:
            out[key] = val

    put("datadog_service", r.get("service_name") or NO_SERVICE)
    put("datadog_version", r.get("service_version") or "")
    put("datadog_env", r.get("deployment_environment") or "default")
    put("datadog_name", r.get("name"))
    put("datadog_span_kind", SPAN_KIND_NAMES.get(r.get("span_kind"), "unspecified"))
    code = r.get("http_response_status_code") or r.get("http_status_code")
    if code:
        put("datadog_http_status_code", str(code))
    err = 1 if r.get("status_code") == 2 else 0
    put("datadog_error", err)
    if err == 1:
        put("datadog_error_msg", r.get("status_message") or "")
    if r.get("vcs_ref_head_revision") is not None:
        put("git_commit_sha", r["vcs_ref_head_revision"])
    if r.get("vcs_repository_url_full") is not None:
        u = r["vcs_repository_url_full"]
        import re

        put("git_repository_url",
            re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", u, count=1))
    return out


ROWS = [
    dict(service_name="svc", service_version="1.2",
         deployment_environment="prod", name="op", span_kind=2,
         status_code=0, status_message=None,
         http_response_status_code=200, http_status_code=None,
         vcs_ref_head_revision="abc",
         vcs_repository_url_full="https://github.com/o/r",
         datadog_service=None),
    # empty service -> default; env missing -> default; error status
    dict(service_name="", service_version=None,
         deployment_environment=None, name="op2", span_kind=5,
         status_code=2, status_message="boom",
         http_response_status_code=None, http_status_code=404,
         vcs_ref_head_revision=None,
         vcs_repository_url_full="git@host:repo",
         datadog_service=None),
    # pre-existing datadog_service honored when not overriding
    dict(service_name="real", service_version="2",
         deployment_environment="stage", name="op3", span_kind=9,
         status_code=2, status_message=None,
         http_response_status_code=0, http_status_code=None,
         vcs_ref_head_revision=None, vcs_repository_url_full=None,
         datadog_service="pre"),
]


def _tbl(rows):
    cols = {}
    types = {"span_kind": pa.int64(), "status_code": pa.int64(),
             "http_response_status_code": pa.int64(),
             "http_status_code": pa.int64()}
    for k in rows[0]:
        cols[k] = pa.array([r.get(k) for r in rows],
                           types.get(k, pa.string()))
    return pa.table(cols)


def _check(rows, out, override):
    got = out.to_pylist()
    for r, g in zip(rows, got):
        e = _reference_row(r, override)
        for k in ("datadog_service", "datadog_version", "datadog_env",
                  "datadog_name", "datadog_span_kind",
                  "datadog_http_status_code", "datadog_error",
                  "datadog_error_msg", "git_commit_sha",
                  "git_repository_url"):
            assert g.get(k) == e.get(k), (k, g.get(k), e.get(k), r)


def test_matches_reference_rules():
    out = DatadogSemantics()(_tbl(ROWS))
    _check(ROWS, out, override=False)
    got = out.to_pylist()
    assert got[0]["datadog_service"] == "svc"
    assert got[1]["datadog_service"] == NO_SERVICE
    assert got[1]["datadog_error_msg"] == "boom"
    assert got[1]["datadog_http_status_code"] == "404"
    assert got[1]["git_repository_url"] == "git@host:repo"
    assert got[0]["git_repository_url"] == "github.com/o/r"
    assert got[2]["datadog_service"] == "pre"          # insert-if-missing
    assert got[2]["datadog_span_kind"] == "unspecified"  # out-of-range kind
    assert got[2]["datadog_http_status_code"] is None    # code 0 = no insert


def test_override_incoming():
    out = DatadogSemantics(override_incoming=True)(_tbl(ROWS))
    _check(ROWS, out, override=True)
    assert out.to_pylist()[2]["datadog_service"] == "real"


def test_strip_protocol():
    col = pa.array(["https://a/b", "ssh://u@h/r", "git@host:repo",
                    "a+b-c.d://x", "://weird"])
    assert strip_protocol(col).to_pylist() == [
        "a/b", "u@h/r", "git@host:repo", "x", "://weird"]
