#!/usr/bin/env python
"""Benchmark: headline parse→enrich→route→aggregate pipeline + operator suite.

Prints ONE JSON line:
  {"metric": "e2e_seconds", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "num_cpus": N,
   "rows": R, "tokens": T, "rows_per_sec": ..., "tokens_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32),
GRAFT_REPLICATE (corpus replication factor, default 1000 → 5M docs at sf0.1;
valid range 1..1000 — doc ids stay unique per replica at any factor since
the U20 id-format fix).

--scaling runs the headline twice in FRESH subprocesses at GRAFT_SCALE_LOW/
GRAFT_SCALE_HIGH cpus (default 4 and 16 — the 8→32 pair saturates this
box's memory bus, see BASELINE.md) with GRAFT_SCALING_REPLICATE (default
5000) on the same materialized corpus and reports both throughputs +
scaling efficiency (the sandbox stand-in for the N→4N-node criterion).

Setup (untimed): the tokenized corpus is synthesized from documents.parquet
and materialized to /tmp ONCE per (sf, replicate) — the production pipeline
starts at ray.data.read_parquet over pre-tokenized shards.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "1000"))
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


CORPUS_SHARDS = int(os.environ.get("GRAFT_CORPUS_SHARDS", "128"))


def corpus_cache_dir(sf_dir: str, replicate: int) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    # v2: doc_id width fix (round-2) — v1 caches hold collided ids
    return f"/tmp/graft_corpus_{tag}_r{replicate}_s{CORPUS_SHARDS}_v2"


def ensure_corpus(sf_dir: str, replicate: int) -> str:
    """Materialize the tokenized-sequence corpus Parquet shards (idempotent)."""
    out = corpus_cache_dir(sf_dir, replicate)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    import shutil

    from opentelemetry_collector_contrib_ray.sources.corpus import corpus_dataset

    shutil.rmtree(out, ignore_errors=True)
    # many output shards -> read parallelism at bench time is never capped
    # by file count (one read task per file/row-group)
    ds = corpus_dataset(sf_dir, with_raw=True, replicate=replicate)
    ds = ds.repartition(CORPUS_SHARDS)
    ds.write_parquet(out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def headline(corpus_dir: str) -> dict:
    """Timed: read corpus parquet → parse → enrich → route → aggregate."""
    import ray
    import ray.data

    from opentelemetry_collector_contrib_ray.sources import corpus as C
    from opentelemetry_collector_contrib_ray.stages.aggregate import count_sum
    from opentelemetry_collector_contrib_ray.stages.enrich import enrich_dataset
    from opentelemetry_collector_contrib_ray.stages.parse import (
        CORPUS_PATTERN,
        CORPUS_TYPES,
        RegexParse,
    )
    from opentelemetry_collector_contrib_ray.stages.route import Route

    # measured sweet spot on this corpus: ~256 blocks, 8k-row batches
    # (fewer blocks -> straggler waves; more -> per-task overhead)
    nblocks = max(256, 4 * NUM_CPUS)
    bs = 8192
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(corpus_dir, columns=["raw", "tokens"],
                               override_num_blocks=nblocks)
    ds = ds.map_batches(
        RegexParse(CORPUS_PATTERN, parse_from="raw", types=CORPUS_TYPES),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=bs,
    )
    ds = enrich_dataset(ds, C.enrich_lookup(), key="source", batch_size=bs)
    ds = ds.map_batches(Route(C.ROUTING_RULES, default_sink=C.DEFAULT_SINK),
                        batch_format="pyarrow", zero_copy_batch=True, batch_size=bs)
    agg = count_sum(ds, keys=["sink", "source"], sum_cols={"n_tok": "tok_sum"},
                    batch_size=bs)
    result = agg.take_all()
    secs = time.perf_counter() - t0
    rows = sum(r["row_count"] for r in result)
    tokens = sum(r["tok_sum"] for r in result)
    return {"seconds": secs, "rows": rows, "tokens": tokens,
            "rows_per_sec": rows / secs, "tokens_per_sec": tokens / secs}


OPERATOR_QUERIES = [
    "dedup_docs",
    "group_by_attrs",
    "token_counts",
    "sampled_events",
    "routing_events",
    "delta_cumsum",
    "knn_vec0",
    "minhash_pairs",
    "simhash_pairs",
    # round-3 additions
    "value_quantiles",
    "repeated_ngrams",
    "lang_id_model",
    "sliding_window",
    "map_editors",
    "ottl_path_index",
    # round-4 additions
    "asof_join_sorted",
    "session_tag_sorted",
    "schema_translate",
    "ottl_cache",
    "range_join",
    "remap_tokens",
    "token_rarity",
    "cluster_reps",
    "quantile_band",
    "segment_dedup",
    "perplexity_filter",
    "text_dedup_reps",
    "repetition_filter",
    "dataset_split",
    "token_bigrams",
    "top_bigram",
    # round-5 additions — the designated scale paths (VERDICT r4 #4)
    "decontaminate_bloom",
    "decontaminate",
    "embed_neardup_ivf",
    "token_budget",
    "refresh_pipeline",
    "approx_distinct_users",
    "substring_dedup",
    # round-5 wire-format stages (line parsers vectorized; JSON/exposition
    # decodes are per-row wire codecs — benched honestly as such)
    "statsd_metrics",
    "carbon_parse",
    "wavefront_parse",
    "collectd_parse",
    "influx_parse",
    "prom_text_parse",
    "splunk_hec_roundtrip",
    "loki_roundtrip",
    "zipkin_parse",
    "fluent_parse",
    "cwmetrics_parse",
    "cwlogs_parse",
    "syslog_render",
    "bpe_encode",
    # round-5 late additions: faro/opencensus translators, elasticsearch
    # and EMF exporter documents (all per-row codecs, block-local)
    "faro_roundtrip",
    "oc_roundtrip",
    "es_logs_ecs",
    "emf_export",
    "xray_export",
    "xray_parse",
    "datadog_series",
    "libhoney_parse",
    "azuremonitor_export",
    "cloudflare_parse",
    "github_parse",
    "gitlab_parse",
    "url_filter",
    # round-5 continuation: the two new stages with real exchanges
    # (prometheus accumulate groupby, sentry per-trace grouping) plus
    # representative per-row codecs from the final batch
    "prom_render",
    "sentry_export",
    "opensearch_logs",
    "logservice_metrics",
    "mongodb_atlas_logs",
    # round-5 final session: the new training-data scale ops (broadcast
    # -verdict shapes) and the batchpersignal first-seen rank exchange
    "boilerplate_filter",
    "dsir_select",
    "batch_per_signal",
    # round-5 continuation session 2: the biggest new scraper decode
    # (docker stats JSON), the row->telemetry mapping engine (fully
    # vectorized fan-out), and the kafka lag math (broadcast hwm +
    # partial/merge + gated second pass — one real exchange)
    "docker_stats",
    "sqlquery_metrics",
    "kafka_consumer_lag",
    "spark_app_stats",
    "ecs_task_metrics",
    "aerospike_stats",
    "c4_filter",
    "kubelet_stats",
    "bigip_stats",
]


def run_suite(sf_dir: str) -> tuple[dict, dict]:
    """(best-of-N, median-of-N) per query — both reported so cross-round
    deltas are interpretable under the host's ±30% load noise
    (VERDICT r2 #8)."""
    import statistics

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    import gc

    # repeats back-to-back (queries outer): Ray reaps idle workers within
    # seconds, so a query's SECOND run is only warm if it follows the
    # first immediately — an interleaved-rounds variant left every run
    # cold and inflated the whole suite ~3x (r4 measurement: same query
    # 25x back-to-back holds 0.3s; first-after-other-queries pays 2-4s
    # of worker respawn + reimport)
    best_t, med_t = {}, {}
    for name in OPERATOR_QUERIES:
        runs = []
        # one untimed warm-up first: worker spawn + imports + actor pools
        # cost 2-4 s and land entirely on a query's FIRST run (r5
        # measurement: suite-cold perplexity_filter read 6.1 s vs 2.1 s
        # isolated best-of-3) — without this, per-query numbers mix
        # steady-state compute with one-off session effects
        res = QUERIES[name](sf_dir)
        if hasattr(res, "materialize"):
            res.materialize()
        del res
        gc.collect()
        for _ in range(max(1, BENCH_REPEAT - 1)):  # N-1 timed runs per query
            t0 = time.perf_counter()
            res = QUERIES[name](sf_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            runs.append(time.perf_counter() - t0)
            # drop the materialized refs NOW: ~30 queries x N runs in one
            # session otherwise accumulate plasma objects until late
            # queries pay spill/eviction (measured 0.85s -> 5.3s drift on
            # the 25th query, r4)
            del res
            gc.collect()
        best_t[name] = round(min(runs), 3)
        med_t[name] = round(statistics.median(runs), 3)
    return best_t, med_t


def init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        # log_to_driver=False: worker prints otherwise interleave with
        # the ONE json line the driver parses from stdout (a stray
        # _block_rows task log corrupted a bench capture this round)
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR", ignore_reinit_error=True,
                 log_to_driver=False)
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.preserve_order = False


# 4 => headline best-of-4; suite = 1 warm-up + best-of-3 per query.  This
# box's steal bursts hit random queries for 2-4x (r4/r5 measurements);
# more minima is the only structural defense.
BENCH_REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "4"))


def main_single(num_cpus: int, headline_only: bool) -> dict:
    init_ray(num_cpus)
    corpus_dir = ensure_corpus(SF_DIR, REPLICATE)
    # warm-up primes actor pools / JIT paths; then best-of-N steady-state
    # runs — this box's background load varies ±30%, so a single shot can
    # misreport a regression that isn't there (GRAFT_BENCH_REPEAT, default 3)
    import statistics

    headline(corpus_dir)
    h_runs = [headline(corpus_dir) for _ in range(BENCH_REPEAT)]
    h = min(h_runs, key=lambda r: r["seconds"])
    h_med = statistics.median(r["seconds"] for r in h_runs)
    queries = {"headline": round(h["seconds"], 3)}
    queries_median = {"headline": round(h_med, 3)}
    if not headline_only:
        best_t, med_t = run_suite(SF_DIR)
        queries.update(best_t)
        queries_median.update(med_t)
    out = {
        "metric": "e2e_seconds",
        "value": round(h["seconds"], 3),
        "unit": "sec",
        "queries": queries,
        "queries_median": queries_median,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "rows": h["rows"],
        "tokens": h["tokens"],
        "rows_per_sec": round(h["rows_per_sec"], 1),
        "tokens_per_sec": round(h["tokens_per_sec"], 1),
    }
    import ray

    ray.shutdown()
    return out


def run_subprocess(num_cpus: int, extra_env: dict | None = None) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus), **(extra_env or {}))
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--headline-only"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench subprocess failed:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


SCALING_REPLICATE = int(os.environ.get("GRAFT_SCALING_REPLICATE", "5000"))


def main_scaling() -> dict:
    # bigger corpus for scaling so per-run compute dominates fixed overhead
    global REPLICATE
    REPLICATE = SCALING_REPLICATE
    # materialize the corpus once before timing either configuration
    init_ray(NUM_CPUS)
    ensure_corpus(SF_DIR, REPLICATE)
    import ray

    ray.shutdown()

    # Default pair is 4 -> 16 (N -> 4N): at 32 cores this single box
    # saturates the shared memory bus (total core-seconds inflate ~1.5x),
    # which a real 4N-node cluster would not — each node brings its own
    # memory bandwidth and storage path. 8->32 numbers are also recorded
    # in BASELINE.md for reference.
    low_cpus = int(os.environ.get("GRAFT_SCALE_LOW", "4"))
    high_cpus = int(os.environ.get("GRAFT_SCALE_HIGH", "16"))
    env_rep = {"GRAFT_REPLICATE": str(REPLICATE)}
    low = run_subprocess(low_cpus, extra_env=env_rep)
    high = run_subprocess(high_cpus, extra_env=env_rep)
    ratio = high["rows_per_sec"] / low["rows_per_sec"]
    efficiency = ratio / (high_cpus / low_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "sf": SF_DIR,
        "low": {"num_cpus": low_cpus, "rows_per_sec": low["rows_per_sec"],
                "tokens_per_sec": low["tokens_per_sec"], "seconds": low["value"]},
        "high": {"num_cpus": high_cpus, "rows_per_sec": high["rows_per_sec"],
                 "tokens_per_sec": high["tokens_per_sec"], "seconds": high["value"]},
        "speedup": round(ratio, 2),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(main_scaling()))
    else:
        print(json.dumps(main_single(NUM_CPUS, "--headline-only" in sys.argv)))
