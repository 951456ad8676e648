"""mongodbatlasreceiver analog (logs path): MongoDB Atlas host/audit
log documents → flat log rows.

Parity with receiver/mongodbatlasreceiver
(log_decoder.go, mongodb_event_to_logdata.go):

- JSON mode (4.4+, decodeJSON:29-54): one structured line per record
  ({t.$date, s, c, id, ctx, msg, attr}); unparseable lines are
  SKIPPED, the raw line becomes the body.
- console mode (4.2, decode4_2:56-93): the
  ``ts severity component [context] message`` regex; non-matching
  lines skipped; NO ``id`` attribute on 4.2
  (mongodb_event_to_logdata.go:193-195).
- timestamps parse with the version layout —
  ``2006-01-02T15:04:05.000-07:00`` (JSON) vs ``...-0700`` (console)
  — and a parse failure keeps the record with the zero time
  (the reference logs a warning, :170-175).
- severity map F/E/W/I/D/D1..D5 → Fatal/Error/Warn/Info/Debug…
  (D5 ALSO maps to Debug4, :34-45); unknown severities leave the
  record unset.
- record attrs: the raw ``attr`` map FIRST, then message/component/
  context/[id]/log_name OVERWRITE same-named keys
  (:185-196); resource attrs = the six mongodb_atlas.* identities
  from the poller context (config here).
- audit mode (decodeAuditJSON + mongodbAuditEventToLogData:48-146):
  always INFO/"INFO"; atype, optional local/remote ip/port/
  isSystemUser/unix, uuid.binary/type, result, param map,
  users/roles arrays of {user|role, db} maps, log_name.
- the gzip wrapper, Atlas API pagination and disk checkpointing are
  ingest transport (the repo's lineage layer); time.Now() observed
  stamps are the ``observed_ns`` config.

Execution: per-document line decode in a task map fanning out one
row per log line, block-local, zero shuffle.
"""

from __future__ import annotations

import json
import re
from datetime import datetime

import pyarrow as pa

SEVERITY_MAP = {"F": 21, "E": 17, "W": 13, "I": 9, "D": 5, "D1": 5,
                "D2": 6, "D3": 7, "D4": 8, "D5": 8}

_CONSOLE_RE = re.compile(
    r"^(?P<timestamp>\S+)\s+(?P<severity>\w+)\s+"
    r"(?P<component>[\w-]+)\s+\[(?P<context>\S+)\]\s+(?P<message>.*)$")


def _parse_ts(date: str, console: bool) -> int:
    """Go time.Parse with the version layout; failure → zero time."""
    if not date:
        return 0
    try:
        dt = datetime.strptime(
            date, "%Y-%m-%dT%H:%M:%S.%f%z")
    except ValueError:
        return 0
    # Go's .000 layout requires exactly three fractional digits;
    # the console layout differs only in the ±HHMM offset form,
    # which %z accepts either way
    sec = int(dt.replace(microsecond=0).timestamp())
    return sec * 1_000_000_000 + dt.microsecond * 1000


def _resource(cfg: dict) -> str:
    return json.dumps({
        "mongodb_atlas.org": cfg.get("org") or "",
        "mongodb_atlas.project": cfg.get("project") or "",
        "mongodb_atlas.cluster": cfg.get("cluster") or "",
        "mongodb_atlas.region.name": cfg.get("region") or "",
        "mongodb_atlas.provider.name": cfg.get("provider") or "",
        "mongodb_atlas.host.name": cfg.get("hostname") or "",
    })


def decode_log_line(line: str, *, console: bool,
                    log_name: str) -> dict | None:
    if console:
        m = _CONSOLE_RE.match(line)
        if not m:
            return None
        sev = m.group("severity")
        attrs = {"message": m.group("message"),
                 "component": m.group("component"),
                 "context": m.group("context"),
                 "log_name": log_name}
        ts = _parse_ts(m.group("timestamp"), True)
    else:
        try:
            entry = json.loads(line)
        except ValueError:
            return None
        if not isinstance(entry, dict):
            return None
        sev = entry.get("s") or ""
        attrs = dict(entry.get("attr") or {})
        attrs["message"] = entry.get("msg") or ""
        attrs["component"] = entry.get("c") or ""
        attrs["context"] = entry.get("ctx") or ""
        attrs["id"] = int(entry.get("id") or 0)
        attrs["log_name"] = log_name
        ts = _parse_ts((entry.get("t") or {}).get("$date") or "",
                       False)
    sev_num = SEVERITY_MAP.get(sev, 0)
    return {"time_unix_nano": ts,
            "severity_number": sev_num,
            "severity_text": sev if sev_num else "",
            "body": line,
            "attributes": json.dumps(attrs)}


def decode_audit_line(line: str, *, log_name: str) -> dict | None:
    try:
        entry = json.loads(line)
    except ValueError:
        return None
    if not isinstance(entry, dict):
        return None
    attrs: dict = {"atype": entry.get("atype") or ""}
    for side in ("local", "remote"):
        addr = entry.get(side) or {}
        if addr.get("ip") is not None:
            attrs[side + ".ip"] = addr["ip"]
        if addr.get("port") is not None:
            attrs[side + ".port"] = int(addr["port"])
        if addr.get("isSystemUser") is not None:
            attrs[side + ".isSystemUser"] = bool(addr["isSystemUser"])
        if addr.get("unix") is not None:
            attrs[side + ".unix"] = addr["unix"]
    uuid = entry.get("uuid")
    if isinstance(uuid, dict):
        attrs["uuid.binary"] = uuid.get("$binary") or ""
        attrs["uuid.type"] = uuid.get("$type") or ""
    attrs["result"] = int(entry.get("result") or 0)
    attrs["param"] = entry.get("param") or {}
    attrs["users"] = [{"user": u.get("user") or "",
                       "db": u.get("db") or ""}
                      for u in (entry.get("users") or [])]
    attrs["roles"] = [{"role": r.get("role") or "",
                       "db": r.get("db") or ""}
                      for r in (entry.get("roles") or [])]
    attrs["log_name"] = log_name
    ts = _parse_ts((entry.get("ts") or {}).get("$date") or "", False)
    return {"time_unix_nano": ts, "severity_number": 9,
            "severity_text": "INFO", "body": line,
            "attributes": json.dumps(attrs)}


class _ParseAtlas:
    def __init__(self, doc_col, mode, log_name, observed_ns, cfg):
        self.doc_col = doc_col
        self.mode = mode
        self.log_name = log_name
        self.observed_ns = observed_ns
        self.res = _resource(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k in (
            "time_unix_nano", "observed_time_unix_nano",
            "severity_number", "severity_text", "body", "attributes",
            "resource_attributes")}
        for i, doc in enumerate(docs):
            for line in (doc or "").splitlines():
                if self.mode == "audit":
                    rec = decode_audit_line(line,
                                            log_name=self.log_name)
                else:
                    rec = decode_log_line(
                        line, console=(self.mode == "console"),
                        log_name=self.log_name)
                if rec is None:
                    continue
                parent.append(i)
                for k, v in rec.items():
                    cols[k].append(v)
                cols["observed_time_unix_nano"].append(
                    self.observed_ns)
                cols["resource_attributes"].append(self.res)
        out = batch.take(pa.array(parent, pa.int64()))
        for k in ("time_unix_nano", "observed_time_unix_nano"):
            out = out.append_column(k, pa.array(cols[k], pa.int64()))
        out = out.append_column(
            "severity_number", pa.array(cols["severity_number"],
                                        pa.int32()))
        for k in ("severity_text", "body", "attributes",
                  "resource_attributes"):
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        return out


def parse_mongodb_atlas_logs(ds, doc_col: str = "log_doc", *,
                             mode: str = "json",
                             log_name: str = "mongodb.gz",
                             observed_ns: int = 0, **cfg):
    """Atlas log documents → flat log rows.

    mode: "json" (4.4+ structured), "console" (4.2), "audit"."""
    return ds.map_batches(
        _ParseAtlas(doc_col, mode, log_name, observed_ns, cfg),
        batch_format="pyarrow", zero_copy_batch=True)
