"""apachereceiver analog: mod_status ``?auto`` pages → apache.*
metric rows.

Parity with receiver/apachereceiver (scraper.go:60-225,
metadata.yaml):

- ``parseStats`` (scraper.go:158-170): split on newlines, key = text
  before the FIRST ``": "``, value = the rest (multi-colon values
  keep their colons); lines without ``": "`` are skipped; duplicate
  keys last-wins (Go map overwrite).
- the 16-key switch (scraper.go:74-131): uptime/current_connections/
  workers(busy|idle)/requests int cumulative Sums (uptime/requests
  monotonic), ``Total kBytes`` × 1024 → apache.traffic,
  CPU{Children,}{System,User} → apache.cpu.time double monotonic Sum
  with level(self|children)/mode(system|user), CPULoad + Load1/5/15
  double Gauges, ``Total Duration`` → apache.request.time int
  monotonic Sum, Scoreboard → per-state counts.
- ``parseScoreboard`` (scraper.go:175-221): the 11 known states
  ALWAYS emit (zero-initialized) — ``_ S R W K D C L G I .`` →
  waiting starting reading sending keepalive dnslookup closing
  logging finishing idle_cleanup open; any other rune counts into
  ``unknown`` (emitted only when hit, it is not pre-initialized).
- strconv failures record a partial scrape error and drop that one
  datapoint; resource = apache.server.name / apache.server.port from
  the endpoint config; the HTTP GET is ingest transport.

Execution: per-doc text decode in a task map fanning out one row per
present metric, block-local, zero shuffle.
"""

from __future__ import annotations

import pyarrow as pa

_SCOREBOARD = (("_", "waiting"), ("S", "starting"), ("R", "reading"),
               ("W", "sending"), ("K", "keepalive"),
               ("D", "dnslookup"), ("C", "closing"), ("L", "logging"),
               ("G", "finishing"), ("I", "idle_cleanup"),
               (".", "open"))
_SB_ORDER = ("waiting", "starting", "reading", "sending", "keepalive",
             "dnslookup", "closing", "logging", "finishing",
             "idle_cleanup", "open")


def parse_stats(page: str) -> dict:
    """mod_status page → key/value map (scraper.go parseStats)."""
    out = {}
    for line in page.split("\n"):
        idx = line.find(": ")
        if idx == -1:
            continue
        out[line[:idx]] = line[idx + 2:]
    return out


def parse_scoreboard(values: str) -> dict:
    counts = {state: 0 for state in _SB_ORDER}
    table = dict(_SCOREBOARD)
    for ch in values:
        counts[table.get(ch, "unknown")] = counts.get(
            table.get(ch, "unknown"), 0) + 1
    return counts


def stats_to_rows(page: str, *, server_name: str = "",
                  port: str = "", now_ns: int = 0) -> list[dict]:
    stats = parse_stats(page)
    rows = []

    def emit(suffix, mtype, mono, vi=None, vd=None, state=None,
             level=None, mode=None):
        rows.append({
            "server_name": server_name, "server_port": port,
            "name": "apache." + suffix, "mtype": mtype,
            "is_monotonic": mono,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vi, "value_double": vd, "state": state,
            "level": level, "mode": mode, "time_unix_nano": now_ns})

    def as_int(key, suffix, mono, state=None, scale=1):
        try:
            emit(suffix, "sum", mono, vi=int(stats[key]) * scale,
                 state=state)
        except ValueError:
            pass  # partial scrape error, datapoint dropped

    def as_double(key, suffix, mtype, mono, level=None, mode=None):
        try:
            emit(suffix, mtype, mono, vd=float(stats[key]),
                 level=level, mode=mode)
        except ValueError:
            pass

    for key in stats:
        if key == "ServerUptimeSeconds":
            as_int(key, "uptime", True)
        elif key == "ConnsTotal":
            as_int(key, "current_connections", False)
        elif key == "BusyWorkers":
            as_int(key, "workers", False, state="busy")
        elif key == "IdleWorkers":
            as_int(key, "workers", False, state="idle")
        elif key == "Total Accesses":
            as_int(key, "requests", True)
        elif key == "Total kBytes":
            as_int(key, "traffic", True, scale=1024)
        elif key == "CPUChildrenSystem":
            as_double(key, "cpu.time", "sum", True, level="children",
                      mode="system")
        elif key == "CPUChildrenUser":
            as_double(key, "cpu.time", "sum", True, level="children",
                      mode="user")
        elif key == "CPUSystem":
            as_double(key, "cpu.time", "sum", True, level="self",
                      mode="system")
        elif key == "CPUUser":
            as_double(key, "cpu.time", "sum", True, level="self",
                      mode="user")
        elif key == "CPULoad":
            as_double(key, "cpu.load", "gauge", False)
        elif key == "Load1":
            as_double(key, "load.1", "gauge", False)
        elif key == "Load5":
            as_double(key, "load.5", "gauge", False)
        elif key == "Load15":
            as_double(key, "load.15", "gauge", False)
        elif key == "Total Duration":
            as_int(key, "request.time", True)
        elif key == "Scoreboard":
            for state, score in parse_scoreboard(
                    stats[key]).items():
                emit("scoreboard", "sum", False, vi=score,
                     state=state)
    return rows


_SCHEMA = (("server_name", pa.string()), ("server_port", pa.string()),
           ("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("state", pa.string()), ("level", pa.string()),
           ("mode", pa.string()), ("time_unix_nano", pa.int64()))


class _ParseApache:
    def __init__(self, doc_col, server_name, port, now_ns):
        self.doc_col = doc_col
        self.server_name = server_name
        self.port = port
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in stats_to_rows(
                    doc if doc is not None else "",
                    server_name=self.server_name, port=self.port,
                    now_ns=self.now_ns):
                parent.append(i)
                for k, v in row.items():
                    cols[k].append(v)
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_apache(ds, doc_col: str = "status_page", *,
                 server_name: str = "", port: str = "",
                 now_ns: int = 0):
    """mod_status ``?auto`` pages → apache.* metric rows."""
    return ds.map_batches(
        _ParseApache(doc_col, server_name, port, now_ns),
        batch_format="pyarrow", zero_copy_batch=True)
