"""apachesparkreceiver analog: Spark REST application snapshots → the
64-metric spark.* table.

Parity with receiver/apachesparkreceiver (scraper.go:46-350,
internal/models, metadata.yaml):

- input is one APPLICATION document per row: ``{"app_id", "app_name",
  "cluster": <the /metrics json — gauges/counters/histograms/timers
  maps>, "stages": [...], "executors": [...], "jobs": [...]}`` — the
  applications/environment REST crawl is ingest transport.  The
  ``application_names`` allow-list (scraper.go:64-86) gates per doc:
  empty list allows all.
- cluster metrics (recordCluster, scraper.go:128-259): a 40-entry
  presence-gated key-lookup table over ``appID + ".driver..."``
  (extracted MECHANICALLY from the switch and re-verified at test
  time) — gauge float64 values through Go's int64() truncation,
  counter counts, histogram/timer count+mean pairs (the mean rows are
  the only double gauges), location/state/status/pool/gc attrs.
- stages (recordStages, :261-306): the status row FIRST — value 0
  with FOUR bool attrs (active/complete/pending/failed) keyed on the
  ACTIVE/COMPLETE/PENDING/FAILED enum; an unknown status SKIPS the
  whole stage.  Then 25 per-stage counters incl. direction/source
  fan-outs; resource adds stage id + attempt id.
- executors (recordExecutors, :308-329): 15 rows per executor incl.
  the DERIVED free = total − used storage-memory pairs for both
  heaps; resource adds executor id.
- jobs (recordJobs, :331-350): task/stage active + completed/skipped/
  failed result fan-outs; resource adds job id.

Execution: per-app JSON decode task map, block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa

# --- cluster key table: (container, key suffix, metric, value kind,
# attr values). Extracted from scraper.go:128-259; test re-verifies.
CLUSTER_TABLE = (
    ("gauges", ".driver.BlockManager.disk.diskSpaceUsed_MB",
     "spark.driver.block_manager.disk.usage", "gauge_int", ()),
    ("gauges", ".driver.BlockManager.memory.offHeapMemUsed_MB",
     "spark.driver.block_manager.memory.usage", "gauge_int",
     ("off_heap", "used")),
    ("gauges", ".driver.BlockManager.memory.onHeapMemUsed_MB",
     "spark.driver.block_manager.memory.usage", "gauge_int",
     ("on_heap", "used")),
    ("gauges", ".driver.BlockManager.memory.remainingOffHeapMem_MB",
     "spark.driver.block_manager.memory.usage", "gauge_int",
     ("off_heap", "free")),
    ("gauges", ".driver.BlockManager.memory.remainingOnHeapMem_MB",
     "spark.driver.block_manager.memory.usage", "gauge_int",
     ("on_heap", "free")),
    ("counters", ".driver.HiveExternalCatalog.fileCacheHits",
     "spark.driver.hive_external_catalog.file_cache_hits", "count",
     ()),
    ("counters", ".driver.HiveExternalCatalog.filesDiscovered",
     "spark.driver.hive_external_catalog.files_discovered", "count",
     ()),
    ("counters", ".driver.HiveExternalCatalog.hiveClientCalls",
     "spark.driver.hive_external_catalog.hive_client_calls", "count",
     ()),
    ("counters", ".driver.HiveExternalCatalog.parallelListingJobCount",
     "spark.driver.hive_external_catalog.parallel_listing_jobs",
     "count", ()),
    ("counters", ".driver.HiveExternalCatalog.partitionsFetched",
     "spark.driver.hive_external_catalog.partitions_fetched", "count",
     ()),
    ("histograms", ".driver.CodeGenerator.compilationTime",
     "spark.driver.code_generator.compilation.count", "count", ()),
    ("histograms", ".driver.CodeGenerator.compilationTime",
     "spark.driver.code_generator.compilation.average_time", "mean",
     ()),
    ("histograms", ".driver.CodeGenerator.generatedClassSize",
     "spark.driver.code_generator.generated_class.count", "count",
     ()),
    ("histograms", ".driver.CodeGenerator.generatedClassSize",
     "spark.driver.code_generator.generated_class.average_size",
     "mean", ()),
    ("histograms", ".driver.CodeGenerator.generatedMethodSize",
     "spark.driver.code_generator.generated_method.count", "count",
     ()),
    ("histograms", ".driver.CodeGenerator.generatedMethodSize",
     "spark.driver.code_generator.generated_method.average_size",
     "mean", ()),
    ("histograms", ".driver.CodeGenerator.sourceCodeSize",
     "spark.driver.code_generator.source_code.operations", "count",
     ()),
    ("histograms", ".driver.CodeGenerator.sourceCodeSize",
     "spark.driver.code_generator.source_code.average_size", "mean",
     ()),
    ("gauges", ".driver.DAGScheduler.job.activeJobs",
     "spark.driver.dag_scheduler.job.active", "gauge_int", ()),
    ("gauges", ".driver.DAGScheduler.job.allJobs",
     "spark.driver.dag_scheduler.job.count", "gauge_int", ()),
    ("gauges", ".driver.DAGScheduler.stage.failedStages",
     "spark.driver.dag_scheduler.stage.failed", "gauge_int", ()),
    ("gauges", ".driver.DAGScheduler.stage.runningStages",
     "spark.driver.dag_scheduler.stage.count", "gauge_int",
     ("running",)),
    ("gauges", ".driver.DAGScheduler.stage.waitingStages",
     "spark.driver.dag_scheduler.stage.count", "gauge_int",
     ("waiting",)),
    ("counters", ".driver.LiveListenerBus.numEventsPosted",
     "spark.driver.live_listener_bus.posted", "count", ()),
    ("timers",
     ".driver.LiveListenerBus.queue.appStatus.listenerProcessingTime",
     "spark.driver.live_listener_bus.processing_time.average", "mean",
     ()),
    ("counters",
     ".driver.LiveListenerBus.queue.appStatus.numDroppedEvents",
     "spark.driver.live_listener_bus.dropped", "count", ()),
    ("gauges", ".driver.LiveListenerBus.queue.appStatus.size",
     "spark.driver.live_listener_bus.queue_size", "gauge_int", ()),
    ("gauges", ".driver.JVMCPU.jvmCpuTime",
     "spark.driver.jvm_cpu_time", "gauge_int", ()),
    ("gauges", ".driver.ExecutorMetrics.JVMOffHeapMemory",
     "spark.driver.executor.memory.jvm", "gauge_int", ("off_heap",)),
    ("gauges", ".driver.ExecutorMetrics.JVMHeapMemory",
     "spark.driver.executor.memory.jvm", "gauge_int", ("on_heap",)),
    ("gauges", ".driver.ExecutorMetrics.OffHeapExecutionMemory",
     "spark.driver.executor.memory.execution", "gauge_int",
     ("off_heap",)),
    ("gauges", ".driver.ExecutorMetrics.OnHeapExecutionMemory",
     "spark.driver.executor.memory.execution", "gauge_int",
     ("on_heap",)),
    ("gauges", ".driver.ExecutorMetrics.OffHeapStorageMemory",
     "spark.driver.executor.memory.storage", "gauge_int",
     ("off_heap",)),
    ("gauges", ".driver.ExecutorMetrics.OnHeapStorageMemory",
     "spark.driver.executor.memory.storage", "gauge_int",
     ("on_heap",)),
    ("gauges", ".driver.ExecutorMetrics.DirectPoolMemory",
     "spark.driver.executor.memory.pool", "gauge_int", ("direct",)),
    ("gauges", ".driver.ExecutorMetrics.MappedPoolMemory",
     "spark.driver.executor.memory.pool", "gauge_int", ("mapped",)),
    ("gauges", ".driver.ExecutorMetrics.MinorGCCount",
     "spark.driver.executor.gc.operations", "gauge_int", ("minor",)),
    ("gauges", ".driver.ExecutorMetrics.MajorGCCount",
     "spark.driver.executor.gc.operations", "gauge_int", ("major",)),
    ("gauges", ".driver.ExecutorMetrics.MinorGCTime",
     "spark.driver.executor.gc.time", "gauge_int", ("minor",)),
    ("gauges", ".driver.ExecutorMetrics.MajorGCTime",
     "spark.driver.executor.gc.time", "gauge_int", ("major",)),
)

# metric -> attr COLUMN names, positionally zipped with the tuples
ATTR_COLS = {
    "spark.driver.block_manager.memory.usage": ("location", "state"),
    "spark.driver.dag_scheduler.stage.count": ("scheduler_status",),
    "spark.driver.executor.memory.jvm": ("location",),
    "spark.driver.executor.memory.execution": ("location",),
    "spark.driver.executor.memory.storage": ("location",),
    "spark.driver.executor.memory.pool": ("pool_memory_type",),
    "spark.driver.executor.gc.operations": ("gc_type",),
    "spark.driver.executor.gc.time": ("gc_type",),
    "spark.stage.task.result": ("stage_task_result",),
    "spark.stage.io.size": ("direction",),
    "spark.stage.io.records": ("direction",),
    "spark.stage.shuffle.blocks_fetched": ("source",),
    "spark.stage.shuffle.io.read.size": ("source",),
    "spark.stage.shuffle.io.records": ("direction",),
    "spark.executor.task.result": ("executor_task_result",),
    "spark.executor.shuffle.io.size": ("direction",),
    "spark.executor.storage_memory.usage": ("location", "state"),
    "spark.job.task.result": ("job_result",),
    "spark.job.stage.result": ("job_result",),
}

# double gauges; everything else is an int Sum; the non-monotonic set
_DOUBLE_GAUGES = frozenset({
    "spark.driver.code_generator.compilation.average_time",
    "spark.driver.code_generator.generated_class.average_size",
    "spark.driver.code_generator.generated_method.average_size",
    "spark.driver.code_generator.source_code.average_size",
    "spark.driver.live_listener_bus.processing_time.average",
})
_NON_MONO = frozenset({
    "spark.stage.status", "spark.stage.task.active",
    "spark.executor.memory.usage", "spark.executor.disk.usage",
    "spark.executor.task.limit", "spark.executor.task.active",
    "spark.executor.storage_memory.usage", "spark.job.task.active",
    "spark.job.stage.active",
    "spark.driver.block_manager.disk.usage",
    "spark.driver.block_manager.memory.usage",
    "spark.driver.dag_scheduler.job.active",
    "spark.driver.dag_scheduler.stage.count",
    "spark.driver.live_listener_bus.queue_size",
    "spark.driver.executor.memory.jvm",
    "spark.driver.executor.memory.execution",
    "spark.driver.executor.memory.storage",
    "spark.driver.executor.memory.pool",
})

_STAGE_FIELDS = (
    ("spark.stage.task.active", "numActiveTasks", ()),
    ("spark.stage.task.result", "numCompleteTasks", ("completed",)),
    ("spark.stage.task.result", "numFailedTasks", ("failed",)),
    ("spark.stage.task.result", "numKilledTasks", ("killed",)),
    ("spark.stage.executor.run_time", "executorRunTime", ()),
    ("spark.stage.executor.cpu_time", "executorCpuTime", ()),
    ("spark.stage.task.result_size", "resultSize", ()),
    ("spark.stage.jvm_gc_time", "jvmGcTime", ()),
    ("spark.stage.memory.spilled", "memoryBytesSpilled", ()),
    ("spark.stage.disk.spilled", "diskBytesSpilled", ()),
    ("spark.stage.memory.peak", "peakExecutionMemory", ()),
    ("spark.stage.io.size", "inputBytes", ("in",)),
    ("spark.stage.io.size", "outputBytes", ("out",)),
    ("spark.stage.io.records", "inputRecords", ("in",)),
    ("spark.stage.io.records", "outputRecords", ("out",)),
    ("spark.stage.shuffle.blocks_fetched",
     "shuffleRemoteBlocksFetched", ("remote",)),
    ("spark.stage.shuffle.blocks_fetched", "shuffleLocalBlocksFetched",
     ("local",)),
    ("spark.stage.shuffle.fetch_wait_time", "shuffleFetchWaitTime",
     ()),
    ("spark.stage.shuffle.io.disk", "shuffleRemoteBytesReadToDisk",
     ()),
    ("spark.stage.shuffle.io.read.size", "shuffleLocalBytesRead",
     ("local",)),
    ("spark.stage.shuffle.io.read.size", "shuffleRemoteBytesRead",
     ("remote",)),
    ("spark.stage.shuffle.io.write.size", "shuffleWriteBytes", ()),
    ("spark.stage.shuffle.io.records", "shuffleReadRecords", ("in",)),
    ("spark.stage.shuffle.io.records", "shuffleWriteRecords",
     ("out",)),
    ("spark.stage.shuffle.write_time", "shuffleWriteTime", ()),
)

_EXECUTOR_FIELDS = (
    ("spark.executor.memory.usage", "memoryUsed", ()),
    ("spark.executor.disk.usage", "diskUsed", ()),
    ("spark.executor.task.limit", "maxTasks", ()),
    ("spark.executor.task.active", "activeTasks", ()),
    ("spark.executor.task.result", "failedTasks", ("failed",)),
    ("spark.executor.task.result", "completedTasks", ("completed",)),
    ("spark.executor.time", "totalDuration", ()),
    ("spark.executor.gc_time", "totalGCTime", ()),
    ("spark.executor.input_size", "totalInputBytes", ()),
    ("spark.executor.shuffle.io.size", "totalShuffleRead", ("in",)),
    ("spark.executor.shuffle.io.size", "totalShuffleWrite", ("out",)),
)

_JOB_FIELDS = (
    ("spark.job.task.active", "numActiveTasks", ()),
    ("spark.job.task.result", "numCompletedTasks", ("completed",)),
    ("spark.job.task.result", "numSkippedTasks", ("skipped",)),
    ("spark.job.task.result", "numFailedTasks", ("failed",)),
    ("spark.job.stage.active", "numActiveStages", ()),
    ("spark.job.stage.result", "numCompletedStages", ("completed",)),
    ("spark.job.stage.result", "numSkippedStages", ("skipped",)),
    ("spark.job.stage.result", "numFailedStages", ("failed",)),
)

_STATUS_FLAGS = {"ACTIVE": (True, False, False, False),
                 "COMPLETE": (False, True, False, False),
                 "PENDING": (False, False, True, False),
                 "FAILED": (False, False, False, True)}

_ATTR_NAMES = ("location", "state", "source", "direction",
               "scheduler_status", "pool_memory_type", "gc_type",
               "stage_task_result", "executor_task_result",
               "job_result")


def _i(v) -> int:
    return int(v) if isinstance(v, (int, float)) \
        and not isinstance(v, bool) else 0


def app_to_rows(doc: str, *, application_names=(),
                now_ns: int = 0) -> list[dict]:
    """One application snapshot → spark.* rows."""
    try:
        d = json.loads(doc)
        if not isinstance(d, dict):
            return []
    except (json.JSONDecodeError, TypeError):
        return []
    app_id = str(d.get("app_id", "") or "")
    app_name = str(d.get("app_name", "") or "")
    if application_names and app_name not in set(application_names):
        return []
    rows: list[dict] = []

    def emit(name, vi, vd, attrs=(), stage=None, executor=None,
             job=None, status=None):
        mtype = "gauge" if name in _DOUBLE_GAUGES else "sum"
        row = {"name": name, "mtype": mtype,
               "is_monotonic": (None if mtype == "gauge"
                                else name not in _NON_MONO),
               "aggregation_temporality": 2 if mtype == "sum" else 0,
               "value_int": vi, "value_double": vd,
               "app_id": app_id, "app_name": app_name,
               "stage_id": None, "attempt_id": None,
               "executor_id": None, "job_id": None,
               "stage_active": None, "stage_complete": None,
               "stage_pending": None, "stage_failed": None,
               "time_unix_nano": now_ns}
        for a in _ATTR_NAMES:
            row[a] = None
        for col, av in zip(ATTR_COLS.get(name, ()), attrs):
            row[col] = av
        if stage is not None:
            row["stage_id"] = _i(stage.get("stageId"))
            row["attempt_id"] = _i(stage.get("attemptId"))
        if executor is not None:
            row["executor_id"] = str(executor.get("id", "") or "")
        if job is not None:
            row["job_id"] = _i(job.get("jobId"))
        if status is not None:
            (row["stage_active"], row["stage_complete"],
             row["stage_pending"], row["stage_failed"]) = status
        rows.append(row)

    cluster = d.get("cluster")
    if isinstance(cluster, dict):
        for container, suffix, name, vkind, attrs in CLUSTER_TABLE:
            stat = (cluster.get(container) or {}).get(app_id + suffix)
            if not isinstance(stat, dict):
                continue
            if vkind == "gauge_int":
                emit(name, _i(stat.get("value")), None, attrs)
            elif vkind == "count":
                emit(name, _i(stat.get("count")), None, attrs)
            else:  # mean -> double gauge
                v = stat.get("mean")
                emit(name, None, float(v)
                     if isinstance(v, (int, float)) else 0.0, attrs)

    for stage in d.get("stages") or ():
        if not isinstance(stage, dict):
            continue
        flags = _STATUS_FLAGS.get(stage.get("status"))
        if flags is None:
            continue  # unknown status skips the whole stage
        emit("spark.stage.status", 0, None, stage=stage, status=flags)
        for name, field, attrs in _STAGE_FIELDS:
            emit(name, _i(stage.get(field)), None, attrs, stage=stage,
                 status=None)

    for ex in d.get("executors") or ():
        if not isinstance(ex, dict):
            continue
        for name, field, attrs in _EXECUTOR_FIELDS:
            emit(name, _i(ex.get(field)), None, attrs, executor=ex)
        for loc, used_f, total_f in (
                ("on_heap", "usedOnHeapStorageMemory",
                 "totalOnHeapStorageMemory"),
                ("off_heap", "usedOffHeapStorageMemory",
                 "totalOffHeapStorageMemory")):
            used = _i(ex.get(used_f))
            emit("spark.executor.storage_memory.usage", used, None,
                 (loc, "used"), executor=ex)
            emit("spark.executor.storage_memory.usage",
                 _i(ex.get(total_f)) - used, None, (loc, "free"),
                 executor=ex)

    for job in d.get("jobs") or ():
        if not isinstance(job, dict):
            continue
        for name, field, attrs in _JOB_FIELDS:
            emit(name, _i(job.get(field)), None, attrs, job=job)
    return rows


_SCHEMA = tuple(
    [("name", pa.string()), ("mtype", pa.string()),
     ("is_monotonic", pa.bool_()),
     ("aggregation_temporality", pa.int32()),
     ("value_int", pa.int64()), ("value_double", pa.float64())]
    + [(a, pa.string()) for a in _ATTR_NAMES]
    + [("stage_active", pa.bool_()), ("stage_complete", pa.bool_()),
       ("stage_pending", pa.bool_()), ("stage_failed", pa.bool_()),
       ("app_id", pa.string()), ("app_name", pa.string()),
       ("stage_id", pa.int64()), ("attempt_id", pa.int64()),
       ("executor_id", pa.string()), ("job_id", pa.int64()),
       ("time_unix_nano", pa.int64())])


class _ParseSpark:
    def __init__(self, doc_col, app_names, now_ns):
        self.doc_col = doc_col
        self.app_names = app_names
        self.now_ns = now_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.doc_col).to_pylist()
        parent, cols = [], {k: [] for k, _t in _SCHEMA}
        for i, doc in enumerate(docs):
            for row in app_to_rows(doc,
                                   application_names=self.app_names,
                                   now_ns=self.now_ns):
                parent.append(i)
                for k, _t in _SCHEMA:
                    cols[k].append(row[k])
        out = batch.take(pa.array(parent, pa.int64()))
        for k, t in _SCHEMA:
            out = out.append_column(k, pa.array(cols[k], t))
        return out


def parse_apachespark(ds, doc_col: str = "app_json", *,
                      application_names=(), now_ns: int = 0):
    """Spark application snapshots → spark.* metric rows."""
    return ds.map_batches(
        _ParseSpark(doc_col, tuple(application_names), now_ns),
        batch_format="pyarrow", zero_copy_batch=True)
