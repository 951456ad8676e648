"""memcachedreceiver analog: ``stats`` text-protocol pages → the
11-metric memcached.* table.

Parity with receiver/memcachedreceiver (scraper.go:38-211,
metadata.yaml):

- input is the memcached ASCII ``stats`` response (``STAT <name>
  <value>\\r\\n`` lines terminated by ``END``) — the wire format the
  embedded gomemcache client parses; the TCP session is ingest
  transport, ``time.Now()`` is ``now_ns``.
- the 20-key switch (scraper.go:56-147): bytes gauge;
  curr/total_connections; cmd_get/set/flush/touch → commands with the
  command attr; curr_items/threads/evictions; bytes_read/written →
  network received/sent; {get,incr,decr}_{hits,misses} → operations
  with (type, operation); rusage_system/user → cpu.usage doubles with
  the state attr.  Unparseable values are logged and SKIPPED
  per-datapoint (strconv semantics), unknown keys ignored.
- derived hit ratios (scraper.go:150-169 + 175-182): emitted only when
  BOTH hits and misses parse; ``calculateHitRatio(misses, hits)`` has
  its parameters SWAPPED at every call site
  (``calculateHitRatio(parsedHit, parsedMiss)``), so the emitted
  "hit ratio" is really ``misses/(hits+misses)*100`` — the Go bug is
  reproduced faithfully and golden-pinned
  (testdata/scraper/expected.yaml: decr 1119 hits/1120 misses →
  50.02233139794551).  Zero when hits+misses == 0.  NOTE Go map
  access: a MISSING key reads "" which fails ParseInt → no ratio row
  unless both keys are present.
- no resource attributes (metadata.yaml has none — multiple servers'
  stats all land in one flat metric set).

Execution: per-page text decode in a task map fanning out one row per
present metric, block-local, zero shuffle.
"""

from __future__ import annotations

import pyarrow as pa

# stats key -> (metric, mtype, value_type, monotonic, attrs)
_SWITCH = {
    "bytes": ("memcached.bytes", "gauge", "int", False, {}),
    "curr_connections": ("memcached.connections.current", "sum", "int",
                         False, {}),
    "total_connections": ("memcached.connections.total", "sum", "int",
                          True, {}),
    "cmd_get": ("memcached.commands", "sum", "int", True,
                {"command": "get"}),
    "cmd_set": ("memcached.commands", "sum", "int", True,
                {"command": "set"}),
    "cmd_flush": ("memcached.commands", "sum", "int", True,
                  {"command": "flush"}),
    "cmd_touch": ("memcached.commands", "sum", "int", True,
                  {"command": "touch"}),
    "curr_items": ("memcached.current_items", "sum", "int", False, {}),
    "threads": ("memcached.threads", "sum", "int", False, {}),
    "evictions": ("memcached.evictions", "sum", "int", True, {}),
    "bytes_read": ("memcached.network", "sum", "int", True,
                   {"direction": "received"}),
    "bytes_written": ("memcached.network", "sum", "int", True,
                      {"direction": "sent"}),
    "get_hits": ("memcached.operations", "sum", "int", True,
                 {"type": "hit", "operation": "get"}),
    "get_misses": ("memcached.operations", "sum", "int", True,
                   {"type": "miss", "operation": "get"}),
    "incr_hits": ("memcached.operations", "sum", "int", True,
                  {"type": "hit", "operation": "increment"}),
    "incr_misses": ("memcached.operations", "sum", "int", True,
                    {"type": "miss", "operation": "increment"}),
    "decr_hits": ("memcached.operations", "sum", "int", True,
                  {"type": "hit", "operation": "decrement"}),
    "decr_misses": ("memcached.operations", "sum", "int", True,
                    {"type": "miss", "operation": "decrement"}),
    "rusage_system": ("memcached.cpu.usage", "sum", "double", True,
                      {"state": "system"}),
    "rusage_user": ("memcached.cpu.usage", "sum", "double", True,
                    {"state": "user"}),
}


def parse_stats_page(page: str) -> dict:
    """``STAT <name> <value>`` lines → {name: value} (string values,
    exactly what the gomemcache Stats map holds).  Lines that aren't
    three space-separated fields starting with STAT are ignored."""
    out = {}
    for line in (page or "").splitlines():
        parts = line.strip().split(" ")
        if len(parts) == 3 and parts[0] == "STAT":
            out[parts[1]] = parts[2]
        elif line.strip() == "END":
            break
    return out


def _parse_int(v) -> int | None:
    """strconv.ParseInt(v, 10, 64) — no spaces/underscores, range
    checked (Python's int() accepts both, Go's does not)."""
    s = v if isinstance(v, str) else ""
    if not s or s.strip() != s or "_" in s:
        return None
    try:
        n = int(s, 10)
    except ValueError:
        return None
    return n if -(1 << 63) <= n < (1 << 63) else None


def _parse_float(v) -> float | None:
    """strconv.ParseFloat(v, 64) — accepts inf/nan spellings like Go,
    rejects the space/underscore forms Python's float() tolerates."""
    s = v if isinstance(v, str) else ""
    if not s or s.strip() != s or "_" in s:
        return None
    try:
        return float(s)
    except ValueError:
        return None


def calculate_hit_ratio(misses: int, hits: int) -> float:
    """scraper.go:175-182 — NOTE every call site passes (hits, misses)
    into (misses, hits), so callers get the MISS percentage; we keep
    the reference's signature and its call convention."""
    if misses + hits == 0:
        return 0.0
    return float(hits) / (float(hits) + float(misses)) * 100.0


def stats_to_rows(stats: dict, *, now_ns: int = 0) -> list[dict]:
    """One parsed stats map → memcached.* rows (scraper.go:55-169).
    Iteration order follows the reference's deterministic OUTPUT
    identity (metric, attrs), not Go's random map order — each
    (metric, attrs) pair appears at most once so order carries no
    semantics."""
    rows = []

    def emit(name, mtype, mono, vi, vd, attrs):
        rows.append({
            "name": name, "mtype": mtype,
            "is_monotonic": mono if mtype == "sum" else None,
            "aggregation_temporality": 2 if mtype == "sum" else 0,
            "value_int": vi, "value_double": vd,
            "command": attrs.get("command"),
            "direction": attrs.get("direction"),
            "op_type": attrs.get("type"),
            "operation": attrs.get("operation"),
            "state": attrs.get("state"),
            "time_unix_nano": now_ns})

    for k, v in stats.items():
        spec = _SWITCH.get(k)
        if spec is None:
            continue
        name, mtype, vt, mono, attrs = spec
        if vt == "int":
            pv = _parse_int(v)
            if pv is not None:
                emit(name, mtype, mono, pv, None, attrs)
        else:
            pv = _parse_float(v)
            if pv is not None:
                emit(name, mtype, mono, None, pv, attrs)

    # derived ratios (scraper.go:150-169): the swapped-arg call
    for op, hk, mk in (("increment", "incr_hits", "incr_misses"),
                       ("decrement", "decr_hits", "decr_misses"),
                       ("get", "get_hits", "get_misses")):
        h = _parse_int(stats.get(hk, ""))
        m = _parse_int(stats.get(mk, ""))
        if h is not None and m is not None:
            emit("memcached.operation_hit_ratio", "gauge", False, None,
                 calculate_hit_ratio(h, m),  # (hits, misses) -> swapped
                 {"operation": op})
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("command", pa.string()), ("direction", pa.string()),
           ("op_type", pa.string()), ("operation", pa.string()),
           ("state", pa.string()), ("time_unix_nano", pa.int64()))


class _ParseMemcached:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            stats = parse_stats_page(doc)
            for row in stats_to_rows(stats, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_memcached(ds, doc_col: str = "stats_page", *,
                    now_ns: int = 0):
    """memcached ``stats`` pages → memcached.* metric rows."""
    return ds.map_batches(_ParseMemcached(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
