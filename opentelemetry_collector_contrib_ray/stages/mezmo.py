"""mezmoexporter analog: flat log rows → Mezmo (LogDNA) line objects.

Parity with exporter/mezmoexporter/exporter.go:75-165 + utils.go:

- one line per log record: Go-JSON of ``mezmoLogLine`` in struct
  order (timestamp, line, app, level, meta):
  timestamp = ts ms (a ZERO timestamp draws time.Now() in Go —
  replaced by the configured ``now_ms`` so the batch is
  deterministic); line = the body STRING (Str() of a non-string body
  is empty) truncated to 16 KiB; app = the ``appname`` attribute's
  Str() truncated to 512; level = severity text truncated to 80,
  defaulting to "info" when empty; meta = hostname (resource
  host.name AsString, when present) + non-empty trace.id/span.id hex
  + EVERY log attribute's Str() (non-strings become "") truncated to
  32 KiB — attrs overwrite the hostname/trace/span keys on collision
  (the Go map assignment order :94-110).
- ``truncateString`` keeps strings strictly SHORTER than max
  (``len(s) < maxLen`` — a string exactly maxLen long is cut,
  utils.go:7-13).
- the 10 MB body batching and the lines POST are the HTTP transport —
  Ray's write layer splits by block instead.

Execution: 1:1 per-row encode in a task map, block-local, zero
shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import GoStruct, go_json
from .splunkhec import go_fmt_float

MAX_MESSAGE_SIZE = 16 * 1024
MAX_META_DATA_SIZE = 32 * 1024
MAX_APPNAME_LEN = 512
MAX_LOG_LEVEL_LEN = 80


def truncate_string(s: str, max_len: int) -> str:
    """utils.go:7-13 — note: strictly-less, so len == max is cut."""
    return s if len(s) < max_len else s[:max_len]


def _as_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_fmt_float(v)
    return "" if v is None else str(v)


def _str_only(v) -> str:
    """pcommon.Value.Str() — empty for non-string values."""
    return v if isinstance(v, str) else ""


def log_to_mezmo_line(row: dict, *, now_ms: int = 0) -> str:
    attrs_in = json.loads(row.get("attributes") or "{}") or {}
    resource = json.loads(row.get("resource_attributes") or "{}") or {}
    meta = {}
    if "host.name" in resource:
        meta["hostname"] = _as_string(resource["host.name"])
    tid = row.get("trace_id") or ""
    if tid and set(tid) != {"0"}:
        meta["trace.id"] = tid
    sid = row.get("span_id") or ""
    if sid and set(sid) != {"0"}:
        meta["span.id"] = sid
    for k, v in attrs_in.items():
        meta[k] = truncate_string(_str_only(v), MAX_META_DATA_SIZE)
    app = _str_only(attrs_in.get("appname"))
    ts = int(row.get("time_unix_nano") or 0) // 1_000_000
    if ts == 0:
        ts = now_ms
    level = truncate_string(row.get("severity_text") or "",
                            MAX_LOG_LEVEL_LEN) or "info"
    line = GoStruct([
        ("timestamp", ts),
        ("line", truncate_string(_str_only(row.get("body")),
                                 MAX_MESSAGE_SIZE)),
        ("app", truncate_string(app, MAX_APPNAME_LEN)),
        ("level", level),
        ("meta", meta)])
    return go_json(line)


class _LogsToMezmo:
    def __init__(self, now_ms: int):
        self.now_ms = now_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = [log_to_mezmo_line(r, now_ms=self.now_ms)
                 for r in batch.to_pylist()]
        return batch.append_column("mezmo_line",
                                   pa.array(lines, pa.string()))


def logs_to_mezmo(ds, *, now_ms: int = 0):
    """Flat log rows → one Mezmo line JSON per row (1:1)."""
    return ds.map_batches(_LogsToMezmo(now_ms),
                          batch_format="pyarrow", zero_copy_batch=True)
