"""flinkmetricsreceiver analog: Flink REST metric instances → the
29-metric flink.* table.

Parity with receiver/flinkmetricsreceiver (process.go:15-194,
client.go:117-354, metadata.yaml):

- input is one instance document per row: ``{"kind": "jobmanager" |
  "taskmanager" | "job" | "subtask", "host", "taskmanager_id",
  "job_name", "task_name", "subtask_index", "metrics": [{"id",
  "value"}]}`` — exactly the models the client assembles; the REST
  crawl (names → ?get= values, taskmanagers/jobs/vertices walks) is
  ingest transport.  ``getTaskmanagerHost`` (client.go:339-347 —
  split the raw taskmanager id on ``:`` and keep the first part) is
  exposed as :func:`taskmanager_host` for callers that carry raw ids.
- every metric VALUE is a string; the generated Record*DataPoint
  parses with strconv and the scraper IGNORES the error (process.go
  ``_ =``) — unparseable values drop that datapoint only.
- jobmanager (process.go:15-73): the 24-case ID switch incl. the
  PS_MarkSweep/PS_Scavenge GC attrs; resource = host.name +
  flink.resource.type=jobmanager.
- taskmanager (process.go:75-133): same common set but the G1
  Young/Old GC attrs; resource adds flink.taskmanager.id and
  resource.type=taskmanager.
- job (process.go:135-158): the 6-case checkpoint/restart switch with
  the completed/failed checkpoint attr; resource = host + job name.
- attr naming: metadata.yaml ``name_override: name`` renders BOTH the
  garbage_collector_name and operator_name attrs as wire key ``name``
  (kept as separate flat columns here; the golden test maps both).
- subtask (process.go:160-194): exact-match task record counts
  (in/out/dropped), then ``strings.Contains`` operator cases — the
  operator name is everything before the FIRST occurrence of the
  suffix (``strings.Split(id, ".numRecordsIn")[0]``), so
  ``op.numRecordsInPerSecond`` ALSO matches ``.numRecordsIn`` (quirk
  kept); resource = host + taskmanager id + job/task/subtask names.

Execution: per-instance JSON decode task map, block-local, zero
shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# metric name -> (mtype, monotonic or None for gauges)
_TYPES = {
    "flink.jvm.cpu.load": ("gauge", None),
    "flink.jvm.cpu.time": ("sum", True),
    "flink.jvm.memory.heap.used": ("sum", False),
    "flink.jvm.memory.heap.committed": ("sum", False),
    "flink.jvm.memory.heap.max": ("sum", False),
    "flink.jvm.memory.nonheap.used": ("sum", False),
    "flink.jvm.memory.nonheap.committed": ("sum", False),
    "flink.jvm.memory.nonheap.max": ("sum", False),
    "flink.jvm.memory.metaspace.used": ("sum", False),
    "flink.jvm.memory.metaspace.committed": ("sum", False),
    "flink.jvm.memory.metaspace.max": ("sum", False),
    "flink.jvm.memory.direct.used": ("sum", False),
    "flink.jvm.memory.direct.total_capacity": ("sum", False),
    "flink.jvm.memory.mapped.used": ("sum", False),
    "flink.jvm.memory.mapped.total_capacity": ("sum", False),
    "flink.memory.managed.used": ("sum", False),
    "flink.memory.managed.total": ("sum", False),
    "flink.jvm.threads.count": ("sum", False),
    "flink.jvm.gc.collections.count": ("sum", True),
    "flink.jvm.gc.collections.time": ("sum", True),
    "flink.jvm.class_loader.classes_loaded": ("sum", True),
    "flink.job.restart.count": ("sum", True),
    "flink.job.last_checkpoint.time": ("gauge", None),
    "flink.job.last_checkpoint.size": ("sum", False),
    "flink.job.checkpoint.count": ("sum", True),
    "flink.job.checkpoint.in_progress": ("sum", False),
    "flink.task.record.count": ("sum", True),
    "flink.operator.record.count": ("sum", True),
    "flink.operator.watermark.output": ("sum", False),
}

_DOUBLE = frozenset({"flink.jvm.cpu.load"})

# the jobmanager/taskmanager COMMON id switch (GC cases differ)
_COMMON = {
    "Status.JVM.CPU.Load": "flink.jvm.cpu.load",
    "Status.Flink.Memory.Managed.Used": "flink.memory.managed.used",
    "Status.Flink.Memory.Managed.Total": "flink.memory.managed.total",
    "Status.JVM.Memory.Mapped.TotalCapacity":
        "flink.jvm.memory.mapped.total_capacity",
    "Status.JVM.Memory.Mapped.MemoryUsed": "flink.jvm.memory.mapped.used",
    "Status.JVM.CPU.Time": "flink.jvm.cpu.time",
    "Status.JVM.Threads.Count": "flink.jvm.threads.count",
    "Status.JVM.Memory.Heap.Committed":
        "flink.jvm.memory.heap.committed",
    "Status.JVM.Memory.Metaspace.Committed":
        "flink.jvm.memory.metaspace.committed",
    "Status.JVM.Memory.NonHeap.Max": "flink.jvm.memory.nonheap.max",
    "Status.JVM.Memory.NonHeap.Committed":
        "flink.jvm.memory.nonheap.committed",
    "Status.JVM.Memory.NonHeap.Used": "flink.jvm.memory.nonheap.used",
    "Status.JVM.Memory.Metaspace.Max":
        "flink.jvm.memory.metaspace.max",
    "Status.JVM.Memory.Direct.MemoryUsed":
        "flink.jvm.memory.direct.used",
    "Status.JVM.Memory.Direct.TotalCapacity":
        "flink.jvm.memory.direct.total_capacity",
    "Status.JVM.ClassLoader.ClassesLoaded":
        "flink.jvm.class_loader.classes_loaded",
    "Status.JVM.Memory.Metaspace.Used":
        "flink.jvm.memory.metaspace.used",
    "Status.JVM.Memory.Heap.Max": "flink.jvm.memory.heap.max",
    "Status.JVM.Memory.Heap.Used": "flink.jvm.memory.heap.used",
}

_JM_GC = {
    "Status.JVM.GarbageCollector.PS_MarkSweep.Time":
        ("flink.jvm.gc.collections.time", "PS_MarkSweep"),
    "Status.JVM.GarbageCollector.PS_Scavenge.Time":
        ("flink.jvm.gc.collections.time", "PS_Scavenge"),
    "Status.JVM.GarbageCollector.PS_MarkSweep.Count":
        ("flink.jvm.gc.collections.count", "PS_MarkSweep"),
    "Status.JVM.GarbageCollector.PS_Scavenge.Count":
        ("flink.jvm.gc.collections.count", "PS_Scavenge"),
}

_TM_GC = {
    "Status.JVM.GarbageCollector.G1_Young_Generation.Count":
        ("flink.jvm.gc.collections.count", "G1_Young_Generation"),
    "Status.JVM.GarbageCollector.G1_Old_Generation.Count":
        ("flink.jvm.gc.collections.count", "G1_Old_Generation"),
    "Status.JVM.GarbageCollector.G1_Old_Generation.Time":
        ("flink.jvm.gc.collections.time", "G1_Old_Generation"),
    "Status.JVM.GarbageCollector.G1_Young_Generation.Time":
        ("flink.jvm.gc.collections.time", "G1_Young_Generation"),
}

_JOB = {
    "numRestarts": ("flink.job.restart.count", None),
    "lastCheckpointSize": ("flink.job.last_checkpoint.size", None),
    "lastCheckpointDuration": ("flink.job.last_checkpoint.time", None),
    "numberOfInProgressCheckpoints":
        ("flink.job.checkpoint.in_progress", None),
    "numberOfCompletedCheckpoints":
        ("flink.job.checkpoint.count", "completed"),
    "numberOfFailedCheckpoints": ("flink.job.checkpoint.count",
                                  "failed"),
}

# subtask operator cases IN REFERENCE ORDER (process.go:160-184)
_SUBTASK_TASK = {"numRecordsIn": "in", "numRecordsOut": "out",
                 "numLateRecordsDropped": "dropped"}
_SUBTASK_OP = ((".numRecordsIn", "record", "in"),
               (".numRecordsOut", "record", "out"),
               (".numLateRecordsDropped", "record", "dropped"),
               (".currentOutputWatermark", "watermark", None))


def taskmanager_host(raw_id: str) -> str:
    """client.go:339-343 — the host part of a raw taskmanager id."""
    return (raw_id or "").split(":")[0]


def _parse(name, value):
    """generated Record*DataPoint strconv; errors drop the point."""
    s = value if isinstance(value, str) else ""
    if not s or s.strip() != s or "_" in s:
        return None
    try:
        if name in _DOUBLE:
            return float(s)
        return int(s, 10)
    except ValueError:
        return None


def instance_to_rows(doc: str, *, now_ns: int = 0) -> list[dict]:
    """One instance document → flink.* rows (process.go switches)."""
    try:
        inst = json.loads(doc)
        if not isinstance(inst, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    kind = inst.get("kind") or ""
    metrics = inst.get("metrics") or ()
    rows: list[dict] = []

    def emit(name, val, gc=None, checkpoint=None, record=None,
             operator_name=None):
        mt, mono = _TYPES[name]
        rows.append({
            "name": name, "mtype": mt, "is_monotonic": mono,
            "aggregation_temporality": 2 if mt == "sum" else 0,
            "value_int": None if name in _DOUBLE else val,
            "value_double": val if name in _DOUBLE else None,
            "garbage_collector_name": gc, "checkpoint": checkpoint,
            "record": record, "operator_name": operator_name,
            "host_name": inst.get("host") or "",
            "resource_type": ("jobmanager" if kind == "jobmanager"
                              else "taskmanager"
                              if kind == "taskmanager" else None),
            "taskmanager_id": (inst.get("taskmanager_id")
                               if kind in ("taskmanager", "subtask")
                               else None),
            "job_name": (inst.get("job_name")
                         if kind in ("job", "subtask") else None),
            "task_name": (inst.get("task_name")
                          if kind == "subtask" else None),
            "subtask_index": (inst.get("subtask_index")
                              if kind == "subtask" else None),
            "time_unix_nano": now_ns})

    for m in metrics:
        if not isinstance(m, dict):
            continue
        mid = m.get("id") or ""
        raw = m.get("value")
        if kind in ("jobmanager", "taskmanager"):
            gc_table = _JM_GC if kind == "jobmanager" else _TM_GC
            if mid in gc_table:
                name, gc = gc_table[mid]
                v = _parse(name, raw)
                if v is not None:
                    emit(name, v, gc=gc)
                continue
            name = _COMMON.get(mid)
            if name is not None:
                v = _parse(name, raw)
                if v is not None:
                    emit(name, v)
        elif kind == "job":
            spec = _JOB.get(mid)
            if spec is not None:
                name, cp = spec
                v = _parse(name, raw)
                if v is not None:
                    emit(name, v, checkpoint=cp)
        elif kind == "subtask":
            if mid in _SUBTASK_TASK:
                v = _parse("flink.task.record.count", raw)
                if v is not None:
                    emit("flink.task.record.count", v,
                         record=_SUBTASK_TASK[mid])
                continue
            for suffix, which, rec in _SUBTASK_OP:
                if suffix in mid:  # strings.Contains — quirk kept
                    op = mid.split(suffix)[0]
                    if which == "record":
                        name = "flink.operator.record.count"
                        v = _parse(name, raw)
                        if v is not None:
                            emit(name, v, record=rec,
                                 operator_name=op)
                    else:
                        name = "flink.operator.watermark.output"
                        v = _parse(name, raw)
                        if v is not None:
                            emit(name, v, operator_name=op)
                    break
    return rows


_SCHEMA = (("name", pa.string()), ("mtype", pa.string()),
           ("is_monotonic", pa.bool_()),
           ("aggregation_temporality", pa.int32()),
           ("value_int", pa.int64()), ("value_double", pa.float64()),
           ("garbage_collector_name", pa.string()),
           ("checkpoint", pa.string()), ("record", pa.string()),
           ("operator_name", pa.string()), ("host_name", pa.string()),
           ("resource_type", pa.string()),
           ("taskmanager_id", pa.string()), ("job_name", pa.string()),
           ("task_name", pa.string()), ("subtask_index", pa.string()),
           ("time_unix_nano", pa.int64()))


class _ParseFlink:
    def __init__(self, doc_col, now_ns):
        self.doc_col = doc_col
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in instance_to_rows(doc, now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_flink(ds, doc_col: str = "instance_json", *,
                now_ns: int = 0):
    """Flink metric-instance JSON docs → flink.* metric rows."""
    return ds.map_batches(_ParseFlink(doc_col, now_ns),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
