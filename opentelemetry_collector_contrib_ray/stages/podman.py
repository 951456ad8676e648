"""podmanreceiver analog: libpod stats JSON → the 11-metric
container.* table.

Parity with receiver/podmanreceiver (receiver.go:103-178,
libpod_data.go:42-62, metadata.yaml):

- input is one libpod containerStats JSON object per row (untagged Go
  struct fields — the API's capitalized keys, matched
  case-insensitively like json.Unmarshal) plus the inspected
  container's image name; the unix-socket libpod session and the
  container event loop are ingest transport.
- CPU (receiver.go:149-157): CPUSystemNano / CPUNano →
  usage.system/total in SECONDS via ``ns / 1e9`` integer division
  (toSecondsWithNanosecondPrecision, :176-178); CPU → the percent
  double gauge; PerCPU fans out ``cpu<i>`` cores (seconds, same
  truncation).
- network (receiver.go:159-162): the reference assigns rx_bytes ←
  NetOutput and tx_bytes ← NetInput — SWAPPED relative to the field
  names; the quirk is reproduced and test-pinned.
- memory: MemUsage/MemLimit Sums + MemPerc double gauge; blkio:
  BlockInput → .read, BlockOutput → .write.
- resource: runtime=podman, name/id from the STATS, image from the
  container record.

Execution: per-row JSON decode task map, block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

_U64 = 1 << 64
_I63 = 1 << 63


def _i64(v) -> int:
    v = int(v) & (_U64 - 1)
    return v - _U64 if v >= _I63 else v


def _ci_get(d: dict, key: str, default=0):
    """json.Unmarshal field matching is case-insensitive."""
    if key in d:
        return d[key]
    lk = key.lower()
    for k, v in d.items():
        if isinstance(k, str) and k.lower() == lk:
            return v
    return default


def podman_stats_to_rows(stats_doc: str, *, image: str = "",
                         now_ns: int = 0) -> list[dict]:
    """One libpod containerStats JSON → container.* rows; an
    undecodable document fails that container's scrape (the
    fetchContainerStats error branch)."""
    try:
        st = json.loads(stats_doc)
        if not isinstance(st, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []

    def u(key):
        v = _ci_get(st, key, 0)
        return int(v) if isinstance(v, (int, float)) \
            and not isinstance(v, bool) else 0

    def f(key):
        v = _ci_get(st, key, 0.0)
        return float(v) if isinstance(v, (int, float)) \
            and not isinstance(v, bool) else 0.0

    res = {"container_id": str(_ci_get(st, "ContainerID", "") or ""),
           "container_name": str(_ci_get(st, "Name", "") or ""),
           "container_image_name": image, "time_unix_nano": now_ns}
    rows: list[dict] = []

    def emit(name, mtype, mono, vi, vd, core=None):
        rows.append({"name": name, "mtype": mtype,
                     "is_monotonic": mono,
                     "aggregation_temporality": 2 if mtype == "sum"
                     else 0,
                     "value_int": vi, "value_double": vd,
                     "core": core, **res})

    emit("container.cpu.usage.system", "sum", True,
         _i64(u("CPUSystemNano") // 10**9), None)
    emit("container.cpu.usage.total", "sum", True,
         _i64(u("CPUNano") // 10**9), None)
    emit("container.cpu.percent", "gauge", None, None, f("CPU"))
    per_cpu = _ci_get(st, "PerCPU", None)
    for i, cpu in enumerate(per_cpu or ()):
        v = int(cpu) if isinstance(cpu, (int, float)) else 0
        emit("container.cpu.usage.percpu", "sum", True,
             _i64(v // 10**9), None, core=f"cpu{i}")
    # network: rx <- NetOutput, tx <- NetInput (reference swap quirk)
    emit("container.network.io.usage.rx_bytes", "sum", True,
         _i64(u("NetOutput")), None)
    emit("container.network.io.usage.tx_bytes", "sum", True,
         _i64(u("NetInput")), None)
    emit("container.memory.usage.total", "sum", False,
         _i64(u("MemUsage")), None)
    emit("container.memory.usage.limit", "sum", False,
         _i64(u("MemLimit")), None)
    emit("container.memory.percent", "gauge", None, None,
         f("MemPerc"))
    emit("container.blockio.io_service_bytes_recursive.read", "sum",
         True, _i64(u("BlockInput")), None)
    emit("container.blockio.io_service_bytes_recursive.write", "sum",
         True, _i64(u("BlockOutput")), None)
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("core", pa.string()), ("container_id", pa.string()),
           ("container_name", pa.string()),
           ("container_image_name", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParsePodman:
    def __init__(self, stats_col, image_col, now_ns):
        self.stats_col = stats_col
        self.image_col = image_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.stats_col).to_pylist()
        images = (batch.column(self.image_col).to_pylist()
                  if self.image_col in batch.column_names
                  else [""] * len(docs))
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, (doc, img) in enumerate(zip(docs, images)):
            for row in podman_stats_to_rows(doc, image=img or "",
                                            now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_podman(ds, stats_col: str = "stats_json",
                 image_col: str = "image", *, now_ns: int = 0):
    """libpod stats JSON docs → container.* metric rows."""
    return ds.map_batches(_ParsePodman(stats_col, image_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
