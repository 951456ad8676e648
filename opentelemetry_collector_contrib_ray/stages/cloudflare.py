"""cloudflarereceiver analog: Logpush NDJSON payloads → flat log rows.

Parity with receiver/cloudflarereceiver/logs.go:

- one payload = newline-delimited JSON objects; ANY malformed line
  fails the whole request (parsePayload:210-225 — the receiver 400s).
- records group by the ZoneName field → the ``cloudflare.zone``
  resource attribute (empty/missing zone → no attribute); scope name =
  the receiver's metadata scope.
- timestamp from the configured timestamp_field (default
  EdgeStartTimestamp) in unix / unixnano / rfc3339 (default) form —
  and the reference's ``continue`` on an unparseable value fires the
  OUTER record loop, so the already-appended record ships with ONLY
  its observed timestamp (no severity, attrs, or body).  Mirrored
  exactly.  ObservedTimestamp = arrival wall clock → 0 here
  (batch decode, documented).
- severity from EdgeResponseStatus: <300 Info(9), <400 Info2(10),
  <500 Warn(13), <600 Error(17), severity text = the pdata enum name;
  out-of-range/unparseable leaves severity unset.
- attributes: with an ``attributes`` mapping configured only the mapped
  fields land (renamed); otherwise every field keeps its name; values
  typed str/int/float/bool; nested maps flatten with
  ``prefix<sep>key`` joins (default "."); arrays/unsupported types are
  skipped with a warning in Go — skipped here.
- body = the whole record as a map body (FromRaw) — canonical JSON
  text in the flat model.

Execution: per-row decode in a task-based map_batches, fan-out one row
per NDJSON record, block-local, zero shuffle.
"""

from __future__ import annotations

import json
from datetime import datetime

import pyarrow as pa

SCOPE_NAME = ("github.com/open-telemetry/opentelemetry-collector-"
              "contrib/receiver/cloudflarereceiver")

_SEVERITIES = ((300, 9, "Info"), (400, 10, "Info2"), (500, 13, "Warn"),
               (600, 17, "Error"))


def severity_from_status(code: int):
    for bound, num, text in _SEVERITIES:
        if code < bound:
            return num, text
    return 0, None


def _flatten(d: dict, prefix: str, sep: str, out: dict):
    for k, v in d.items():
        key = prefix + k
        if isinstance(v, dict):
            _flatten(v, key + sep, sep, out)
        else:
            out[key] = v
    return out


def _parse_ts(v, fmt: str):
    """→ unix ns, or None for the reference's continue-skip path."""
    if fmt in ("unix", "unixnano"):
        if isinstance(v, bool):
            return None
        if isinstance(v, (int, float)):
            n = int(v)
        elif isinstance(v, str):
            try:
                n = int(v)
            except ValueError:
                return None
        else:
            return None
        return n * 1_000_000_000 if fmt == "unix" else n
    if fmt == "rfc3339":
        if not isinstance(v, str):
            return None
        s = v
        try:
            if s.endswith(("Z", "z")):
                s, tz = s[:-1], "+00:00"
            else:
                tz, s = s[-6:], s[:-6]
            frac = 0
            if "." in s:
                s, _, f = s.partition(".")
                frac = int(f.ljust(9, "0")[:9])
            dt = datetime.fromisoformat(s + tz)
            return int(dt.timestamp()) * 1_000_000_000 + frac
        except (ValueError, IndexError):
            return None
    return 0          # unknown format: Go warns, timestamp stays 0


def cloudflare_payload_to_rows(payload: str, *,
                               timestamp_field="EdgeStartTimestamp",
                               timestamp_format="rfc3339",
                               attributes: dict | None = None,
                               separator=".") -> list[dict]:
    records = []
    for line in (payload or "").split("\n"):
        if not line:
            continue
        rec = json.loads(line)       # any bad line fails the payload
        if not isinstance(rec, dict):
            raise ValueError("cloudflare log line must be an object")
        records.append(rec)

    rows = []
    for rec in records:
        zone = rec.get("ZoneName")
        zone = zone if isinstance(zone, str) else ""
        res = {"cloudflare.zone": zone} if zone else {}
        row = {"time_unix_nano": 0, "severity_number": 0,
               "severity_text": None, "attributes": "{}",
               "body": None,
               "resource_attributes": json.dumps(res, sort_keys=True),
               "scope_name": SCOPE_NAME}
        rows.append(row)

        ts_val = rec.get(timestamp_field)
        if timestamp_field in rec:
            ts = _parse_ts(ts_val, timestamp_format)
            if ts is None:
                continue          # Go: record stays, processing stops
            row["time_unix_nano"] = ts

        status = rec.get("EdgeResponseStatus")
        code = None
        if isinstance(status, bool):
            code = None
        elif isinstance(status, (int, float)):
            code = int(status)
        elif isinstance(status, str):
            try:
                code = int(status)
            except ValueError:
                code = None
        if code is not None:
            num, text = severity_from_status(code)
            if num:
                row["severity_number"] = num
                row["severity_text"] = text

        attrs: dict = {}
        for field, v in rec.items():
            name = field
            if attributes:
                if field not in attributes:
                    continue
                name = attributes[field]
            if isinstance(v, (str, bool)) or (
                    isinstance(v, (int, float))
                    and not isinstance(v, bool)):
                attrs[name] = v
            elif isinstance(v, dict):
                flat = _flatten(v, name + separator, separator, {})
                for k, fv in flat.items():
                    if isinstance(fv, (str, bool)) or (
                            isinstance(fv, (int, float))
                            and not isinstance(fv, bool)):
                        attrs[k] = fv
            # arrays / null: unsupported, skipped
        row["attributes"] = json.dumps(attrs, sort_keys=True)
        row["body"] = json.dumps(rec, sort_keys=True)
    return rows


_COLS = (("time_unix_nano", pa.int64()), ("severity_number", pa.int64()),
         ("severity_text", pa.string()), ("attributes", pa.string()),
         ("body", pa.string()), ("resource_attributes", pa.string()),
         ("scope_name", pa.string()))


class _ParseCloudflare:
    def __init__(self, payload_col, opts, on_error):
        self.payload_col = payload_col
        self.opts = opts
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.payload_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                rows = cloudflare_payload_to_rows(doc, **self.opts)
            except (ValueError, TypeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(None)
                cols["error"].append(str(e))
                continue
            for row in rows:
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(row[name])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in _COLS + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_cloudflare_logs(ds, payload_col: str = "payload", *,
                          timestamp_field: str = "EdgeStartTimestamp",
                          timestamp_format: str = "rfc3339",
                          attributes: dict | None = None,
                          separator: str = ".",
                          on_error: str = "drop"):
    """Cloudflare Logpush NDJSON payloads → flat log rows."""
    opts = {"timestamp_field": timestamp_field,
            "timestamp_format": timestamp_format,
            "attributes": attributes, "separator": separator}
    return ds.map_batches(
        _ParseCloudflare(payload_col, opts, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
