"""datadogsemanticsprocessor: Datadog-convention span attributes.

Reference semantics (processor/datadogsemanticsprocessor/processor.go):

- ``insertAttrIfMissingOrShouldOverride`` (:20-32): derived values are
  written only where the attribute is MISSING unless
  ``override_incoming_datadog_fields`` (config default false) is set.
- ``datadog.service`` = non-empty ``service.name`` else the documented
  ``otlpresourcenoservicename`` default; ``datadog.version`` =
  ``service.version`` else ""; ``datadog.env`` = non-empty deployment
  environment else ``default`` (:42-63).
- ``datadog.span.kind`` = lowercase span-kind name; ``datadog.error`` =
  1 iff status code is ERROR, with ``datadog.error.msg`` falling back
  to the status message (status2Error, :169-207 — the exception-event
  scan applies when event columns exist; the flat model carries the
  status fallback).
- ``datadog.http_status_code`` = stringified status code when non-zero
  (:136-141; ``http.response.status_code`` with the pre-1.23
  ``http.status_code`` fallback).
- ``git.commit.sha`` from ``vcs.ref.head.revision``;
  ``git.repository_url`` = ``vcs.repository.url.full`` with the URL
  scheme stripped (stripProtocolFromURL, :210-219 — Go url.Parse +
  TrimPrefix(scheme + "://"), restated as an anchored scheme regex).

The operation/resource-name helpers (GetOTelOperationNameV2 /
GetOTelResourceV2) live in the external datadog-agent library, not in
the reference tree; their documented fallback — the span name — stands
in for them here (``datadog.name``).

Flat-column model: dotted attribute names map to ``_``-joined columns.
One vectorized map_batches — block-local, zero shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

NO_SERVICE = "otlpresourcenoservicename"
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"

SPAN_KIND_NAMES = {
    0: "unspecified", 1: "internal", 2: "server",
    3: "client", 4: "producer", 5: "consumer",
}


def strip_protocol(col):
    """stripProtocolFromURL over a string column (anchored scheme regex =
    url.Parse scheme grammar; unparsable strings pass through, as Go)."""
    return pc.replace_substring_regex(col, _SCHEME_RE, "",
                                      max_replacements=1)


class DatadogSemantics:
    """Batch callable deriving the datadog.* / git.* columns.

    ``columns`` maps semantic inputs to column names; any may be absent
    from the batch (treated as all-missing). Existing ``datadog_*``
    output columns are honored per insertAttrIfMissingOrShouldOverride.
    """

    def __init__(
        self,
        service_col: str = "service_name",
        version_col: str = "service_version",
        env_col: str = "deployment_environment",
        name_col: str = "name",
        kind_col: str = "span_kind",
        status_code_col: str = "status_code",
        status_msg_col: str = "status_message",
        http_status_col: str = "http_response_status_code",
        http_status_fallback_col: str = "http_status_code",
        vcs_revision_col: str = "vcs_ref_head_revision",
        vcs_repo_col: str = "vcs_repository_url_full",
        override_incoming: bool = False,
    ):
        self.c = dict(
            service=service_col, version=version_col, env=env_col,
            name=name_col, kind=kind_col, status=status_code_col,
            status_msg=status_msg_col, http=http_status_col,
            http_fb=http_status_fallback_col, vcs_rev=vcs_revision_col,
            vcs_repo=vcs_repo_col)
        self.override = override_incoming

    def _get(self, batch, key):
        name = self.c[key]
        if name in batch.column_names:
            col = batch.column(name)
            return col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
        return None

    def _put(self, batch, out_name, derived):
        """insertAttrIfMissingOrShouldOverride on a flat column: without
        override, keep the incoming value where present; with override,
        the derived value wins wherever it was actually derived (a null
        derived value = "no insert happened for this row" — the
        conditional vcs/http inserts), the incoming value survives
        elsewhere."""
        if out_name in batch.column_names:
            old = batch.column(out_name)
            if isinstance(old, pa.ChunkedArray):
                old = old.combine_chunks()
            old = old.cast(derived.type if not isinstance(derived, pa.ChunkedArray)
                           else derived.combine_chunks().type)
            if self.override:
                merged = pc.if_else(pc.is_valid(derived), derived, old)
            else:
                merged = pc.if_else(pc.is_valid(old), old, derived)
            i = batch.column_names.index(out_name)
            return batch.set_column(i, out_name, merged)
        return batch.append_column(out_name, derived)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.scalar("", pa.string())

        def nonempty_or(col, default):
            if col is None:
                return pa.array([default] * n, pa.string())
            s = col.cast(pa.string())
            ok = pc.and_(pc.is_valid(s), pc.not_equal(
                pc.fill_null(s, ""), ""))
            return pc.if_else(ok, s, pa.scalar(default, pa.string()))

        svc = nonempty_or(self._get(batch, "service"), NO_SERVICE)
        ver = self._get(batch, "version")
        ver = (pc.fill_null(ver.cast(pa.string()), "") if ver is not None
               else pa.array([""] * n, pa.string()))
        env = nonempty_or(self._get(batch, "env"), "default")

        batch = self._put(batch, "datadog_service", svc)
        batch = self._put(batch, "datadog_version", ver)
        batch = self._put(batch, "datadog_env", env)

        name = self._get(batch, "name")
        if name is not None:
            batch = self._put(batch, "datadog_name",
                              name.cast(pa.string()))

        kind = self._get(batch, "kind")
        if kind is not None:
            k = kind.cast(pa.int64())
            names = pa.array([SPAN_KIND_NAMES[i] for i in range(6)])
            idx = pc.if_else(
                pc.and_(pc.greater_equal(k, 0), pc.less_equal(k, 5)),
                k, pa.scalar(0, pa.int64()))
            batch = self._put(batch, "datadog_span_kind",
                              pc.take(names, pc.fill_null(idx, 0)))

        http = self._get(batch, "http")
        http_fb = self._get(batch, "http_fb")
        code = None
        if http is not None and http_fb is not None:
            code = pc.coalesce(http.cast(pa.int64()),
                               http_fb.cast(pa.int64()))
        elif http is not None:
            code = http.cast(pa.int64())
        elif http_fb is not None:
            code = http_fb.cast(pa.int64())
        if code is not None:
            nz = pc.and_(pc.is_valid(code),
                         pc.not_equal(pc.fill_null(code, 0), 0))
            batch = self._put(
                batch, "datadog_http_status_code",
                pc.if_else(nz, pc.cast(code, pa.string()),
                           pa.scalar(None, pa.string())))

        status = self._get(batch, "status")
        if status is not None:
            is_err = pc.equal(pc.fill_null(status.cast(pa.int64()), 0), 2)
            batch = self._put(
                batch, "datadog_error",
                pc.if_else(is_err, pa.scalar(1, pa.int64()),
                           pa.scalar(0, pa.int64())))
            msg = self._get(batch, "status_msg")
            msg = (pc.fill_null(msg.cast(pa.string()), "")
                   if msg is not None else pa.array([""] * n, pa.string()))
            batch = self._put(
                batch, "datadog_error_msg",
                pc.if_else(is_err, msg, pa.scalar(None, pa.string())))

        rev = self._get(batch, "vcs_rev")
        if rev is not None:
            batch = self._put(
                batch, "git_commit_sha",
                pc.if_else(pc.is_valid(rev), rev.cast(pa.string()),
                           pa.scalar(None, pa.string())))
        repo = self._get(batch, "vcs_repo")
        if repo is not None:
            s = repo.cast(pa.string())
            batch = self._put(
                batch, "git_repository_url",
                pc.if_else(pc.is_valid(s), strip_protocol(
                    pc.fill_null(s, empty)), pa.scalar(None, pa.string())))
        return batch
