#!/usr/bin/env python
"""Flagship pipeline as a ``ray job submit`` entrypoint with shard-level
resume (the north-star launch contract):

    ray job submit --working-dir . -- \\
        python scripts/run_job.py --input-dir /data/corpus --out /data/routed

    # sandbox / standalone (synthesizes the tokenized corpus first):
    python scripts/run_job.py --sf /root/testdata/sf0.001 --out /tmp/job_out

Behavior:
- input = a directory of pre-tokenized Parquet shards with columns
  (doc_id, tokens, n_tok?, source, raw) — the input_hint contract; with
  ``--sf`` the corpus is synthesized from ``documents.parquet`` into
  ``--corpus-cache`` first (idempotent).
- the parse → enrich → route pipeline runs as ONE streaming Dataset job;
  output Parquet is partitioned by (shard, sink) and a per-shard lineage
  manifest (state/lineage.py) records input path, operator-chain hash and
  row counts, so re-submitting after a failure skips finished shards and
  reprocesses only unfinished ones.
- prints one JSON summary line: shards processed/skipped + per-sink
  aggregate (row_count, tok_sum).

Owns its Ray session (guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_pipeline(ds):
    """parse → enrich → route, preserving the ``shard`` column."""
    from opentelemetry_collector_contrib_ray.sources import corpus as C
    from opentelemetry_collector_contrib_ray.stages.enrich import (
        enrich_dataset,
    )
    from opentelemetry_collector_contrib_ray.stages.parse import (
        CORPUS_PATTERN,
        CORPUS_TYPES,
        RegexParse,
    )
    from opentelemetry_collector_contrib_ray.stages.route import Route

    ds = ds.map_batches(
        RegexParse(CORPUS_PATTERN, parse_from="raw", types=CORPUS_TYPES),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ds = enrich_dataset(ds, C.enrich_lookup(), key="source")
    return ds.map_batches(
        Route(C.ROUTING_RULES, default_sink=C.DEFAULT_SINK),
        batch_format="pyarrow", zero_copy_batch=True,
    )


CHAIN_DESC = "read_parquet|RegexParse(corpus)|Enrich(source)|Route(v1)"


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", help="directory of tokenized corpus "
                    "Parquet shards (doc_id, tokens, source, raw)")
    ap.add_argument("--sf", help="testdata sf dir: synthesize the corpus "
                    "from documents.parquet first")
    ap.add_argument("--corpus-cache", default="/tmp/job_corpus",
                    help="where --sf materializes corpus shards")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--shards", type=int, default=8,
                    help="corpus shard count for --sf synthesis")
    ap.add_argument("--wave-size", type=int, default=None,
                    help="commit lineage manifests every N shards so a "
                    "killed job keeps completed waves (default: one wave)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    input_dir = args.input_dir
    if input_dir is None:
        if args.sf is None:
            ap.error("one of --input-dir / --sf is required")
        from opentelemetry_collector_contrib_ray.sources.corpus import (
            corpus_dataset,
        )

        done = os.path.join(args.corpus_cache, "_DONE")
        if not os.path.exists(done):
            import shutil

            shutil.rmtree(args.corpus_cache, ignore_errors=True)
            ds = corpus_dataset(args.sf, with_raw=True)
            ds.repartition(args.shards).write_parquet(args.corpus_cache)
            with open(done, "w") as f:
                f.write("ok")
        input_dir = args.corpus_cache

    paths = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not paths:
        raise SystemExit(f"no parquet shards under {input_dir}")

    from opentelemetry_collector_contrib_ray.state.lineage import (
        run_resumable,
    )

    summary = run_resumable(
        paths, args.out, build_pipeline, CHAIN_DESC,
        extra_partition_cols=["sink"], wave_size=args.wave_size,
    )

    # per-sink aggregate over the full (old + new) partitioned output
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.aggregate import (
        count_sum,
    )

    routed = rd.read_parquet(args.out, columns=["sink", "source", "n_tok"])
    agg = count_sum(routed, keys=["sink"], sum_cols={"n_tok": "tok_sum"})
    out = {
        "processed": summary["processed"],
        "skipped": summary["skipped"],
        "sinks": sorted(agg.take_all(), key=lambda r: r["sink"]),
    }
    print(json.dumps(out, default=str))
    return out


if __name__ == "__main__":
    main()
    import ray

    ray.shutdown()
