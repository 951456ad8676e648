"""Shard-level checkpoint/resume: kill-and-resume semantics via the manifest."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opentelemetry_collector_contrib_ray.sources.corpus import BuildCorpus
from opentelemetry_collector_contrib_ray.stages.parse import (
    CORPUS_PATTERN,
    CORPUS_TYPES,
    RegexParse,
)
from opentelemetry_collector_contrib_ray.stages.route import Route
from opentelemetry_collector_contrib_ray.state import lineage

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    """Split documents.parquet into 4 input shards."""
    src = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    d = tmp_path_factory.mktemp("shards")
    paths = []
    n = src.num_rows // 4
    for i in range(4):
        part = src.slice(i * n, n if i < 3 else src.num_rows - 3 * n)
        p = str(d / f"part-{i:02d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def corpus_route_pipeline(ds):
    def build_keep_shard(batch: pa.Table) -> pa.Table:
        out = BuildCorpus()(batch)
        return out.append_column("shard", batch.column("shard"))

    ds = ds.map_batches(build_keep_shard, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        RegexParse(CORPUS_PATTERN, parse_from="raw", types=CORPUS_TYPES, keep_input=False),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.map_batches(
        Route([("n_tok < 40", "sink-short")], default_sink="sink-long"),
        batch_format="pyarrow", zero_copy_batch=True,
    )


CHAIN = "corpus->parse->route[v1]"


def test_resume_skips_completed_shards(shards, tmp_path):
    out = str(tmp_path / "out")

    # first run: only the first two shards exist yet
    r1 = lineage.run_resumable(shards[:2], out, corpus_route_pipeline, CHAIN,
                               extra_partition_cols=["sink"])
    assert len(r1["processed"]) == 2 and not r1["skipped"]

    # simulate a killed run: partial garbage output for shard 2, no manifest
    sid2 = lineage.shard_id_for(shards[2])
    partial = os.path.join(out, f"shard={sid2}", "sink=sink-short")
    os.makedirs(partial)
    pq.write_table(pa.table({"junk": [1]}), os.path.join(partial, "partial.parquet"))

    # resume with all four shards: two skipped, two processed, garbage gone
    r2 = lineage.run_resumable(shards, out, corpus_route_pipeline, CHAIN,
                               extra_partition_cols=["sink"])
    assert sorted(r2["skipped"]) == sorted(r1["processed"])
    assert len(r2["processed"]) == 2

    total = pq.read_table(out, columns=["doc_id"])
    assert total.num_rows == 500
    assert len(set(total.column("doc_id").to_pylist())) == 500

    recs = {m["shard"]: m for m in r2["manifest"]}
    assert len(recs) == 4
    assert sum(m["rows_in"] for m in recs.values()) == 500
    assert sum(m["rows_out"] for m in recs.values()) == 500
    assert all(m["status"] == "complete" for m in recs.values())


def test_chain_change_invalidates(shards, tmp_path):
    out = str(tmp_path / "out")
    r1 = lineage.run_resumable(shards[:1], out, corpus_route_pipeline, CHAIN,
                               extra_partition_cols=["sink"])
    assert len(r1["processed"]) == 1
    # same shard, new operator chain -> reprocess
    r2 = lineage.run_resumable(shards[:1], out, corpus_route_pipeline, CHAIN + "-v2",
                               extra_partition_cols=["sink"])
    assert len(r2["processed"]) == 1 and not r2["skipped"]


def test_run_job_cli_shard_failure_resume(tmp_path):
    """The ray-job entrypoint (scripts/run_job.py): full run, then a
    simulated mid-run shard failure (manifest entry + partial output
    dropped) — resubmission reprocesses EXACTLY that shard and the final
    per-sink aggregate is unchanged."""
    import importlib.util
    import os
    import shutil

    spec = importlib.util.spec_from_file_location(
        "run_job", "/root/repo/scripts/run_job.py")
    run_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_job)

    out = str(tmp_path / "out")
    args = ["--sf", "/root/testdata/sf0.001",
            "--corpus-cache", str(tmp_path / "corpus"),
            "--out", out, "--shards", "4"]
    r1 = run_job.main(args)
    assert len(r1["processed"]) == 4 and not r1["skipped"]
    total = sum(s["row_count"] for s in r1["sinks"])
    assert total == 500

    sid = r1["processed"][0]
    os.remove(os.path.join(out, "_lineage", f"{sid}.json"))
    shutil.rmtree(os.path.join(out, f"shard={sid}"))

    r2 = run_job.main(args)
    assert r2["processed"] == [sid]
    assert sorted(r2["skipped"]) == sorted(r1["processed"][1:])
    assert r2["sinks"] == r1["sinks"]
