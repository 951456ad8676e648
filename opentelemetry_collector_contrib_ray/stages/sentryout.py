"""sentryexporter analog: flat span rows → Sentry transactions,
member spans, and exception events.

Parity with exporter/sentryexporter/sentry_exporter.go:

- a span is a TRANSACTION root when its parent id is empty or its
  kind is Server/Consumer (spanIsTransaction:430-433); every other
  span attaches to the FIRST root reached by following parent links
  (the two-pass idMap + classifyAsOrphanSpans fixpoint:86-246 is
  exactly ancestor reachability that STOPS at roots — a root inside
  another root's subtree keeps its own transaction); spans whose
  chain dead-ends (missing parent, or a chain into an orphan) become
  transactions of their own, and their descendants stay orphans too
  (orphans never enter idMap).
- span descriptors (generateSpanDescriptors:297-366): http.method →
  op "http[.client/.server/.internal/.producer/.consumer]" with
  description "<METHOD> <name>"; db.system → op "db" with the
  db.statement (else name); rpc.service → "rpc"; messaging.system →
  "message"; faas.trigger → op = the trigger value; else op "" and
  description = the span name.  First match wins in that order.
- tags (generateTagsFromAttributes:372-393): str/bool/int/double
  ('g' shortest) attribute values, map/slice/bytes/empty skipped;
  resource tags OVERWRITE span tags; non-empty status message adds
  ``status_message``; a non-unspecified kind adds ``span_kind`` =
  SPAN_KIND_* (traceutil.SpanKindStr); library_name/library_version
  always stamped (even empty).
- span status (statusFromSpanStatus:395-426): Unset and Ok BOTH map
  to "ok"; Error consults tags["http.status_code"] then
  tags["rpc.grpc.status_code"] against the canonical tables, else
  "unknown"; out-of-range codes → "unknown" with an
  "error code %d" message.
- exception span events (convertEventsToSentryExceptions:163-224):
  events literally named "exception" with at least one of
  exception.type/exception.message become error-level Sentry events
  carrying the owning span's trace context, tags, times, and
  description as the transaction name.
- the reference's whole-request early return when a push carries ZERO
  root spans (:128-130 — dropping even orphans and exceptions) is a
  request-batching artifact, not data semantics; the batch engine has
  no request boundary and always emits.
- Sentry EventIDs draw crypto/rand uuid4 in Go — replaced by
  deterministic md5(trace_id:span_id[:exc:<n>]) stand-ins so the
  output is reproducible (the SQL oracle uses DuckDB md5()).

Execution: spans group per trace (one hash shuffle, the
tail-sampling convention); within a group the root resolution is a
dict walk over that trace's spans only.  Emits one row per
transaction / member span / exception event.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from .splunkhec import go_fmt_float

HTTP_STATUS_MAP = {
    "400": "failed_precondition", "401": "unauthenticated",
    "403": "permission_denied", "404": "not_found", "409": "aborted",
    "429": "resource_exhausted", "499": "cancelled",
    "500": "internal_error", "501": "unimplemented",
    "503": "unavailable", "504": "deadline_exceeded",
}

GRPC_STATUS_MAP = {
    "1": "cancelled", "2": "unknown", "3": "invalid_argument",
    "4": "deadline_exceeded", "5": "not_found", "6": "already_exists",
    "7": "permission_denied", "8": "resource_exhausted",
    "9": "failed_precondition", "10": "aborted", "11": "out_of_range",
    "12": "unimplemented", "13": "internal_error",
    "14": "unavailable", "15": "data_loss", "16": "unauthenticated",
}

_KIND_STR = ("SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
             "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
             "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER")


def _event_id(trace_id: str, span_id: str, suffix: str = "") -> str:
    basis = f"{trace_id}:{span_id}{suffix}"
    return hashlib.md5(basis.encode()).hexdigest()


def generate_span_descriptors(name: str, attrs: dict,
                              kind: int) -> tuple[str, str]:
    """generateSpanDescriptors:297-366."""
    if "http.method" in attrs:
        op = "http"
        op += {1: ".internal", 2: ".server", 3: ".client",
               4: ".producer", 5: ".consumer"}.get(kind, "")
        return op, f"{attrs['http.method']} {name}"
    if "db.system" in attrs:
        return "db", str(attrs.get("db.statement") or name)
    if "rpc.service" in attrs:
        return "rpc", name
    if "messaging.system" in attrs:
        return "message", name
    if "faas.trigger" in attrs:
        return str(attrs["faas.trigger"]), name
    return "", name


def tags_from_attributes(attrs: dict) -> dict:
    """generateTagsFromAttributes:372-393 — scalar values only."""
    tags = {}
    for k, v in attrs.items():
        if isinstance(v, bool):
            tags[k] = "true" if v else "false"
        elif isinstance(v, float):
            tags[k] = go_fmt_float(v)
        elif isinstance(v, int):
            tags[k] = str(v)
        elif isinstance(v, str):
            tags[k] = v
        # map/slice/bytes/empty skipped
    return tags


def status_from_span_status(code: int, message: str,
                            tags: dict) -> tuple[str, str]:
    """statusFromSpanStatus:395-426."""
    if code < 0 or code > 2:
        return "unknown", f"error code {code}"
    if code in (0, 1):
        return "ok", message
    if "http.status_code" in tags:
        return HTTP_STATUS_MAP.get(tags["http.status_code"],
                                   "unknown"), message
    if "rpc.grpc.status_code" in tags:
        return GRPC_STATUS_MAP.get(tags["rpc.grpc.status_code"],
                                   "unknown"), message
    return "unknown", message


def convert_span(row: dict) -> dict:
    """convertToSentrySpan:248-289 over one flat span row."""
    attrs = json.loads(row.get("attributes") or "{}") or {}
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    kind = int(row.get("span_kind") or 0)
    name = row.get("span_name") or ""
    op, description = generate_span_descriptors(name, attrs, kind)
    tags = tags_from_attributes(attrs)
    tags.update(tags_from_attributes(resource))
    status, message = status_from_span_status(
        int(row.get("status_code") or 0),
        row.get("status_message") or "", tags)
    if message:
        tags["status_message"] = message
    if kind != 0:
        tags["span_kind"] = _KIND_STR[kind]
    tags["library_name"] = row.get("scope_name") or ""
    tags["library_version"] = row.get("scope_version") or ""
    return {
        "trace_id": row.get("trace_id") or "",
        "span_id": row.get("span_id") or "",
        "parent_span_id": row.get("parent_span_id") or "",
        "op": op, "description": description, "status": status,
        "tags": json.dumps(tags, sort_keys=True),
        "start_time_unix_nano": int(
            row.get("start_time_unix_nano") or 0),
        "end_time_unix_nano": int(row.get("end_time_unix_nano") or 0),
    }


def _is_root(row: dict) -> bool:
    pid = row.get("parent_span_id") or ""
    return (not pid or set(pid) <= {"0"}
            or int(row.get("span_kind") or 0) in (2, 5))


def trace_to_sentry_rows(rows: list[dict], environment: str,
                         out: dict) -> None:
    """One trace's spans → transaction/span/exception output rows."""
    converted = [convert_span(r) for r in rows]
    roots = [_is_root(r) for r in rows]
    by_id = {c["span_id"]: i for i, c in enumerate(converted)}

    def resolve_root(i: int) -> int | None:
        """First root ancestor, walking parent links; None = orphan."""
        seen = set()
        j = i
        while True:
            pid = converted[j]["parent_span_id"]
            if pid not in by_id or pid in seen:
                return None
            seen.add(pid)
            j = by_id[pid]
            if roots[j]:
                return j

    def emit(kind: str, c: dict, event_id: str, root_span: str,
             exc_type: str = "", exc_msg: str = ""):
        out["kind"].append(kind)
        out["event_id"].append(event_id)
        out["root_span_id"].append(root_span)
        for k in ("trace_id", "span_id", "parent_span_id", "op",
                  "description", "status", "tags",
                  "start_time_unix_nano", "end_time_unix_nano"):
            out[k].append(c[k])
        out["transaction"].append(c["description"])
        out["environment"].append(environment)
        out["exception_type"].append(exc_type)
        out["exception_message"].append(exc_msg)

    for i, (row, c) in enumerate(zip(rows, converted)):
        if roots[i]:
            emit("transaction", c,
                 _event_id(c["trace_id"], c["span_id"]), c["span_id"])
        else:
            r = resolve_root(i)
            if r is None:  # orphan → its own transaction
                emit("transaction", c,
                     _event_id(c["trace_id"], c["span_id"]),
                     c["span_id"])
            else:
                emit("span", c, "", converted[r]["span_id"])
        # exception events ride every span, root or not
        events = json.loads(row.get("events") or "[]")
        n = 0
        for ev in events:
            if (ev.get("name") or "") != "exception":
                continue
            attrs = ev.get("attributes") or {}
            msg = str(attrs.get("exception.message") or "")
            typ = str(attrs.get("exception.type") or "")
            if not msg and not typ:
                continue  # both required-one-of absent → skipped
            emit("exception", c,
                 _event_id(c["trace_id"], c["span_id"],
                           f":exc:{n}"),
                 "", exc_type=typ, exc_msg=msg)
            n += 1


_OUT_COLS = ("kind", "event_id", "root_span_id", "trace_id",
             "span_id", "parent_span_id", "op", "description",
             "status", "tags", "start_time_unix_nano",
             "end_time_unix_nano", "transaction", "environment",
             "exception_type", "exception_message")


def spans_to_sentry(ds, *, environment: str = ""):
    """Flat span rows → Sentry transaction/span/exception rows.

    One hash shuffle groups spans per trace (parent chains never
    cross traces); root resolution walks each trace's own spans."""
    import pandas as pd

    def per_trace(g: pd.DataFrame) -> pd.DataFrame:
        out: dict = {k: [] for k in _OUT_COLS}
        trace_to_sentry_rows(g.to_dict("records"), environment, out)
        return pd.DataFrame(out, columns=list(_OUT_COLS))

    return ds.groupby("trace_id").map_groups(
        per_trace, batch_format="pandas")


def spans_to_sentry_table(rows: list[dict],
                          environment: str = "") -> pa.Table:
    """Driver-side helper for tests: all rows as one trace group."""
    out: dict = {k: [] for k in _OUT_COLS}
    by_trace: dict = {}
    for r in rows:
        by_trace.setdefault(r.get("trace_id") or "", []).append(r)
    for rows_t in by_trace.values():
        trace_to_sentry_rows(rows_t, environment, out)
    return pa.table({k: pa.array(v) for k, v in out.items()})
