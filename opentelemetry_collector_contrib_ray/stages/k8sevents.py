"""k8seventsreceiver analog: Kubernetes Event objects (JSON) → flat
log rows.

Parity with receiver/k8seventsreceiver/k8s_event_to_logdata.go +
receiver.go:138-161:

- resource attrs: k8s.node.name = source.host, plus the SIX
  involvedObject attrs (kind/name/uid/fieldpath/api_version/
  resource_version) — ALL stamped even when empty (PutStr of "").
- record timestamp: EventTime > LastTimestamp > FirstTimestamp
  (getEventTimestamp; all three zero → 0).
- body = message; severity only for the KNOWN types — lowercase
  "normal"→Info(9) / "warning"→Warn(13) set both number and the
  ORIGINAL (uncased) type as text; anything else leaves severity
  unset (the debug-logged fallthrough).
- log attrs: k8s.event.reason/action, k8s.event.start_time =
  metadata.creationTimestamp rendered with Go time.Time.String()
  ("2006-01-02 15:04:05 +0000 UTC"; the zero time prints
  "0001-01-01 00:00:00 +0000 UTC"), k8s.event.name/uid (metadata),
  k8s.namespace.name = involvedObject.namespace, and k8s.event.count
  as an INT attr only when non-zero.
- the receiver's allowEvent startup-flood filter compares the event
  timestamp against the receiver start wall-clock (receiver.go:141) —
  exposed as the optional ``not_before_ns`` config instead; namespace
  selection is the ``namespaces`` config.

Execution: per-row JSON decode in a task map (the watch/informer
plumbing is the ingest transport), block-local, zero shuffle.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa

SEVERITY_MAP = {"normal": (9, "Info"), "warning": (13, "Warn")}


def _parse_rfc3339_ns(s: str | None) -> int:
    if not s:
        return 0
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        return 0
    sec = int(dt.replace(microsecond=0).timestamp())
    return sec * 1_000_000_000 + dt.microsecond * 1000


def go_time_string(ns: int) -> str:
    """time.Time.String() of a UTC instant (zero → year-1 form)."""
    if ns == 0:
        return "0001-01-01 00:00:00 +0000 UTC"
    sec, frac = divmod(int(ns), 1_000_000_000)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    base = (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d} "
            f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}")
    if frac:
        base += ("." + f"{frac:09d}").rstrip("0")
    return base + " +0000 UTC"


def k8s_event_to_row(ev: dict) -> dict:
    obj = ev.get("involvedObject") or {}
    meta = ev.get("metadata") or {}
    resource = {
        "k8s.node.name": (ev.get("source") or {}).get("host") or "",
        "k8s.object.kind": obj.get("kind") or "",
        "k8s.object.name": obj.get("name") or "",
        "k8s.object.uid": obj.get("uid") or "",
        "k8s.object.fieldpath": obj.get("fieldPath") or "",
        "k8s.object.api_version": obj.get("apiVersion") or "",
        "k8s.object.resource_version": obj.get("resourceVersion")
        or "",
    }
    ts = (_parse_rfc3339_ns(ev.get("eventTime"))
          or _parse_rfc3339_ns(ev.get("lastTimestamp"))
          or _parse_rfc3339_ns(ev.get("firstTimestamp")))
    typ = ev.get("type") or ""
    sev_num, sev_text = 0, ""
    if typ.lower() in SEVERITY_MAP:
        sev_num, _ = SEVERITY_MAP[typ.lower()]
        sev_text = typ  # the ORIGINAL casing is stamped
    creation_ns = _parse_rfc3339_ns(meta.get("creationTimestamp"))
    attrs: dict = {
        "k8s.event.reason": ev.get("reason") or "",
        "k8s.event.action": ev.get("action") or "",
        "k8s.event.start_time": go_time_string(creation_ns),
        "k8s.event.name": meta.get("name") or "",
        "k8s.event.uid": meta.get("uid") or "",
        "k8s.namespace.name": obj.get("namespace") or "",
    }
    count = int(ev.get("count") or 0)
    if count != 0:
        attrs["k8s.event.count"] = count
    return {
        "time_unix_nano": ts,
        "severity_number": sev_num,
        "severity_text": sev_text,
        "body": ev.get("message") or "",
        "attributes": json.dumps(attrs),
        "resource_attributes": json.dumps(resource),
    }


class _ParseK8sEvents:
    def __init__(self, doc_col: str, namespaces, not_before_ns: int):
        self.doc_col = doc_col
        self.namespaces = set(namespaces or ())
        self.not_before_ns = not_before_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k in (
            "time_unix_nano", "severity_number", "severity_text",
            "body", "attributes", "resource_attributes")}
        for i, doc in enumerate(docs):
            try:
                ev = json.loads(doc if doc is not None else "")
            except ValueError:
                continue
            if not isinstance(ev, dict):
                continue
            if self.namespaces:
                ns = (ev.get("involvedObject") or {}).get("namespace")
                if ns not in self.namespaces:
                    continue
            row = k8s_event_to_row(ev)
            # allowEvent: !eventTimestamp.Before(startTime)
            if row["time_unix_nano"] < self.not_before_ns:
                continue
            parent.append(i)
            for k, v in row.items():
                cols[k].append(v)
        out = batch.take(pa.array(parent, pa.int64()))
        out = out.append_column(
            "time_unix_nano", pa.array(cols["time_unix_nano"],
                                       pa.int64()))
        out = out.append_column(
            "severity_number", pa.array(cols["severity_number"],
                                        pa.int32()))
        for k in ("severity_text", "body", "attributes",
                  "resource_attributes"):
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        return out


def parse_k8s_events(ds, doc_col: str = "event_json", *,
                     namespaces=(), not_before_ns: int = 0):
    """K8s Event JSON docs → flat log rows (≤1 per doc)."""
    return ds.map_batches(
        _ParseK8sEvents(doc_col, namespaces, not_before_ns),
        batch_format="pyarrow", zero_copy_batch=True)
