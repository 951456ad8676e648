"""Per-partition lineage manifest — checkpoint/resume without recompute.

The reference persists file read offsets + fingerprints per poll so a
restart resumes where it left off (pkg/stanza/fileconsumer/internal/
checkpoint/checkpoint.go:22-49, fingerprint.go:19-21).  The batch-engine
equivalent (SURVEY.md §4 "Checkpoint / resume" row): one lineage record per
INPUT SHARD — (shard id, input path, operator-chain hash, rows in/out,
status) — written next to the partitioned output.  On resume:

1. shards whose manifest entry is complete AND matches the current chain
   hash are skipped entirely;
2. output directories for unfinished shards are deleted (they may hold
   partial files from a killed run) and those shards are reprocessed;
3. outputs are partitioned by ``shard`` (+ downstream keys), so skipping a
   finished shard never touches its files — exactly-once per shard,
   at-least-once per row within a retried shard.

The whole remaining-shard set runs as ONE streaming Dataset job (not a
per-shard loop): resume granularity is the input shard, execution
granularity stays the block.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def shard_id_for(path: str) -> str:
    """Stable shard id: basename + short content-address of the full path."""
    base = os.path.splitext(os.path.basename(path))[0]
    return f"{base}-{hashlib.md5(path.encode()).hexdigest()[:8]}"


def chain_hash(chain_desc: str) -> str:
    """Operator-chain fingerprint; a changed pipeline invalidates old runs."""
    return hashlib.sha256(chain_desc.encode()).hexdigest()[:16]


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, shard: str) -> str:
        return os.path.join(self.dir, f"{shard}.json")

    def read(self, shard: str) -> dict | None:
        try:
            with open(self._path(shard)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def is_complete(self, shard: str, chash: str) -> bool:
        rec = self.read(shard)
        return bool(rec) and rec.get("status") == "complete" and rec.get("chain_hash") == chash

    def write(self, record: dict) -> None:
        # atomic single-file write: tmp + rename
        path = self._path(record["shard"])
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
        os.replace(tmp, path)

    def records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out


class AddShardColumn:
    """map_batches callable deriving the ``shard`` column from file paths
    (requires ``read_parquet(..., include_paths=True)``)."""

    def __init__(self, id_by_path: dict[str, str]):
        self.id_by_path = id_by_path

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        shards = [self.id_by_path[p] for p in paths]
        return batch.drop_columns(["path"]).append_column(
            "shard", pa.array(shards, pa.string())
        )


def run_resumable(
    input_paths: list[str],
    out_dir: str,
    pipeline_fn,
    chain_desc: str,
    extra_partition_cols: list[str] | None = None,
    run_ts: float | None = None,
    wave_size: int | None = None,
) -> dict:
    """Run ``pipeline_fn(ds) -> ds`` over input shards with shard-level resume.

    ``pipeline_fn`` receives a Dataset carrying a ``shard`` column and must
    preserve it.  Output is written to ``out_dir`` partitioned by
    ``["shard"] + extra_partition_cols``.  Returns a summary dict with
    ``processed`` / ``skipped`` shard lists and per-shard row counts.

    ``wave_size`` bounds the CHECKPOINT granularity under a mid-run kill:
    ``None`` runs all remaining shards as one streaming job and commits
    every manifest at the end (max pipelining, but a kill loses the whole
    submission); an integer processes remaining shards in waves of that
    many, committing manifests after each wave — a killed job keeps every
    completed wave, so resubmission reprocesses only the unfinished tail
    (verified with a real SIGKILL by scripts/resume_check.py). Each wave
    is still one streaming Dataset job over many shards; pick wave_size ≫
    cluster cores / blocks-per-shard so intra-wave pipelining stays full.
    """
    manifest = Manifest(out_dir)
    chash = chain_hash(chain_desc)
    id_by_path = {p: shard_id_for(p) for p in input_paths}

    skipped, remaining = [], []
    for p in input_paths:
        (skipped if manifest.is_complete(id_by_path[p], chash) else remaining).append(p)

    # partial outputs from a killed run are deleted before reprocessing
    for p in remaining:
        shard_dir = os.path.join(out_dir, f"shard={id_by_path[p]}")
        if os.path.exists(shard_dir):
            shutil.rmtree(shard_dir)

    waves = ([remaining] if not remaining or wave_size is None
             else [remaining[i:i + wave_size]
                   for i in range(0, len(remaining), wave_size)])

    for wave in waves:
        if not wave:
            continue
        ds = ray.data.read_parquet(wave, include_paths=True)
        ds = ds.map_batches(
            AddShardColumn(id_by_path), batch_format="pyarrow", zero_copy_batch=True
        )
        out = pipeline_fn(ds)
        out.write_parquet(
            out_dir, partition_cols=["shard"] + list(extra_partition_cols or [])
        )

        rows_in = {
            id_by_path[p]: pq.read_metadata(p).num_rows for p in wave
        }
        ts = run_ts if run_ts is not None else time.time()
        for p in wave:
            sid = id_by_path[p]
            rows_out = _count_output_rows(os.path.join(out_dir, f"shard={sid}"))
            manifest.write(
                {
                    "shard": sid,
                    "input_path": p,
                    "chain_hash": chash,
                    "chain_desc": chain_desc,
                    "rows_in": rows_in[sid],
                    "rows_out": rows_out,
                    "status": "complete",
                    "run_ts": ts,
                }
            )

    return {
        "processed": [id_by_path[p] for p in remaining],
        "skipped": [id_by_path[p] for p in skipped],
        "manifest": manifest.records(),
    }


def _count_output_rows(shard_dir: str) -> int:
    """Row count from Parquet footers only (no data read)."""
    total = 0
    for root, _dirs, files in os.walk(shard_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total
