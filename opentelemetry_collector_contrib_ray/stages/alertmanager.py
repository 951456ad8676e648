"""alertmanagerexporter analog: span events → Alertmanager alerts.

Parity with exporter/alertmanagerexporter/alertmanager_exporter.go:

- one alert per SPAN EVENT (extractEvents:71-97): labels = the
  configured event_labels attribute subset + severity (the
  severity_attribute's AsString value, else the default) + event_name;
  annotations = ALL event attributes AsString plus TraceID/SpanID hex
  (createAnnotations/createLabels:99-119).
- payload rows are prometheus common model.Alert JSON objects
  ({labels, annotations, startsAt, endsAt, generatorURL}, sorted map
  keys — Go json.Marshal of model.LabelSet maps).  The reference
  stamps StartsAt = time.Now() (:132) — the batch engine uses the
  event's own timestamp instead (deterministic refinement; a zero
  event time marshals as the Go zero time), endsAt stays the Go zero
  time, generatorURL from config.
- api version v1/v2 changes only the HTTP path (postAlert) — the
  payload shape is identical; the HTTP transport is Ray's write layer.

Execution: per-row fan-out in a task-based map_batches over the flat
span rows' events column — block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import GoStruct, go_json
from .splunkhec import go_fmt_float

GO_ZERO_TIME = "0001-01-01T00:00:00Z"


def _as_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_fmt_float(v)
    return "" if v is None else str(v)


def _rfc3339_nano(ns: int) -> str:
    if not ns:
        return GO_ZERO_TIME
    from datetime import datetime, timezone
    sec, frac = divmod(int(ns), 1_000_000_000)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    base = (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
            f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}")
    if frac:
        base += ("." + f"{frac:09d}").rstrip("0")
    return base + "Z"


def span_events_to_alerts(row: dict, *, severity_attribute: str,
                          default_severity: str, event_labels,
                          generator_url: str) -> list[str]:
    events = json.loads(row.get("events") or "[]")
    out = []
    for ev in events:
        attrs = ev.get("attributes") or {}
        severity = default_severity
        if severity_attribute in attrs:
            severity = _as_string(attrs[severity_attribute])
        labels = {k: _as_string(v) for k, v in attrs.items()
                  if k in event_labels}
        labels["severity"] = severity
        labels["event_name"] = ev.get("name") or ""
        annotations = {k: _as_string(v) for k, v in attrs.items()}
        annotations["TraceID"] = row.get("trace_id") or ""
        annotations["SpanID"] = row.get("span_id") or ""
        alert = GoStruct([
            ("labels", labels),
            ("annotations", annotations),
            ("startsAt", _rfc3339_nano(ev.get("timeUnixNano") or 0)),
            ("endsAt", GO_ZERO_TIME),
            ("generatorURL", generator_url)])
        out.append(go_json(alert))
    return out


class _SpansToAlerts:
    def __init__(self, opts):
        self.opts = opts

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        parent, alerts = [], []
        for i, row in enumerate(rows):
            for alert in span_events_to_alerts(row, **self.opts):
                parent.append(i)
                alerts.append(alert)
        out = batch.take(pa.array(parent, pa.int64()))
        return out.append_column("alert_json",
                                 pa.array(alerts, pa.string()))


def spans_to_alertmanager(ds, *, severity_attribute: str = "severity",
                          default_severity: str = "info",
                          event_labels=(), generator_url: str = ""):
    """Flat span rows → one Alertmanager alert row per span event."""
    opts = {"severity_attribute": severity_attribute,
            "default_severity": default_severity,
            "event_labels": tuple(event_labels),
            "generator_url": generator_url}
    return ds.map_batches(_SpansToAlerts(opts),
                          batch_format="pyarrow", zero_copy_batch=True)
