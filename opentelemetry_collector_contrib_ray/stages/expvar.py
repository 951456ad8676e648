"""expvarreceiver analog: Go /debug/vars documents → memstats metric
rows.

Parity with receiver/expvarreceiver (scraper.go:53-113,
metadata.yaml / documentation.md):

- the document's ``memstats`` object (decoded like Go json into
  runtime.MemStats — unknown fields ignored) maps to the 26
  process.runtime.memstats.* metrics with the generated metadata's
  types: cumulative Sums (monotonic only for total_alloc, mallocs,
  frees, pause_total, num_gc, num_forced_gc), gc_cpu_fraction a
  DOUBLE Gauge, last_pause an Int Gauge read from the PauseNs
  circular buffer at ``(NumGC+255)%256`` (scraper.go:109-111).
- total_alloc and lookups are DISABLED by default
  (metadata.yaml ``enabled: false``) — the ``enabled_metrics``
  config adds them.
- a document without memstats errors the scrape ("unmarshalled
  memstats data is nil"); the HTTP GET/200 handling is transport;
  time.Now() stamps become the ``now_ns`` config.

Execution: per-doc JSON decode in a task map fanning out one row per
enabled metric, block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# (metric suffix, memstats JSON field, monotonic) — cumulative int
# sums per documentation.md; value = int64(field)
_INT_SUMS = (
    ("sys", "Sys", False),
    ("mallocs", "Mallocs", True),
    ("frees", "Frees", True),
    ("heap_alloc", "HeapAlloc", False),
    ("heap_sys", "HeapSys", False),
    ("heap_idle", "HeapIdle", False),
    ("heap_inuse", "HeapInuse", False),
    ("heap_released", "HeapReleased", False),
    ("heap_objects", "HeapObjects", False),
    ("stack_inuse", "StackInuse", False),
    ("stack_sys", "StackSys", False),
    ("mspan_inuse", "MSpanInuse", False),
    ("mspan_sys", "MSpanSys", False),
    ("mcache_inuse", "MCacheInuse", False),
    ("mcache_sys", "MCacheSys", False),
    ("buck_hash_sys", "BuckHashSys", False),
    ("gc_sys", "GCSys", False),
    ("other_sys", "OtherSys", False),
    ("next_gc", "NextGC", False),
    ("pause_total", "PauseTotalNs", True),
    ("num_gc", "NumGC", True),
    ("num_forced_gc", "NumForcedGC", True),
)
_OPTIONAL_SUMS = (
    ("total_alloc", "TotalAlloc", True),
    ("lookups", "Lookups", False),
)
PREFIX = "process.runtime.memstats."


def memstats_to_rows(doc: str, *, enabled_metrics=(),
                     now_ns: int = 0) -> list[dict]:
    """One /debug/vars document → metric rows (raises on nil
    memstats, mirroring the scrape error)."""
    var = json.loads(doc)
    ms = var.get("memstats") if isinstance(var, dict) else None
    if not isinstance(ms, dict):
        raise ValueError("unmarshalled memstats data is nil")
    enabled = set(enabled_metrics)
    rows = []

    def emit(suffix, mtype, monotonic, vi=None, vd=None):
        rows.append({"name": PREFIX + suffix, "mtype": mtype,
                     "is_monotonic": monotonic,
                     "aggregation_temporality":
                     2 if mtype == "sum" else 0,
                     "value_int": vi, "value_double": vd,
                     "time_unix_nano": now_ns})

    for suffix, field, mono in _INT_SUMS:
        emit(suffix, "sum", mono, vi=int(ms.get(field) or 0))
    for suffix, field, mono in _OPTIONAL_SUMS:
        if PREFIX + suffix in enabled or suffix in enabled:
            emit(suffix, "sum", mono, vi=int(ms.get(field) or 0))
    emit("gc_cpu_fraction", "gauge", False,
         vd=float(ms.get("GCCPUFraction") or 0.0))
    num_gc = int(ms.get("NumGC") or 0)
    pause_ns = ms.get("PauseNs") or []
    idx = (num_gc + 255) % 256
    last = int(pause_ns[idx]) if idx < len(pause_ns) else 0
    emit("last_pause", "gauge", False, vi=last)
    return rows


class _ParseExpvar:
    def __init__(self, doc_col, enabled_metrics, now_ns, on_error):
        self.doc_col = doc_col
        self.enabled_metrics = tuple(enabled_metrics)
        self.now_ns = now_ns
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k in (
            "name", "mtype", "is_monotonic",
            "aggregation_temporality", "value_int", "value_double",
            "time_unix_nano")}
        for i, doc in enumerate(docs):
            try:
                rows = memstats_to_rows(
                    doc if doc is not None else "",
                    enabled_metrics=self.enabled_metrics,
                    now_ns=self.now_ns)
            except ValueError:
                if self.on_error == "raise":
                    raise
                continue
            for row in rows:
                parent.append(i)
                for k, v in row.items():
                    cols[k].append(v)
        out = batch.take(pa.array(parent, pa.int64()))
        out = out.append_column("name",
                                pa.array(cols["name"], pa.string()))
        out = out.append_column("mtype",
                                pa.array(cols["mtype"], pa.string()))
        out = out.append_column(
            "is_monotonic", pa.array(cols["is_monotonic"], pa.bool_()))
        out = out.append_column(
            "aggregation_temporality",
            pa.array(cols["aggregation_temporality"], pa.int32()))
        out = out.append_column(
            "value_int", pa.array(cols["value_int"], pa.int64()))
        out = out.append_column(
            "value_double", pa.array(cols["value_double"],
                                     pa.float64()))
        return out.append_column(
            "time_unix_nano", pa.array(cols["time_unix_nano"],
                                       pa.int64()))


def parse_expvar(ds, doc_col: str = "expvar_json", *,
                 enabled_metrics=(), now_ns: int = 0,
                 on_error: str = "drop"):
    """/debug/vars documents → memstats metric rows (24-26 per doc)."""
    return ds.map_batches(
        _ParseExpvar(doc_col, enabled_metrics, now_ns, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
