"""End-to-end flagship pipeline tests vs the DuckDB oracle + token invariant."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opentelemetry_collector_contrib_ray.pipelines import flagship
from opentelemetry_collector_contrib_ray.sources import corpus

from .conftest import SF_SMOKE
from .util import assert_frames_equal_unordered

FLAGSHIP_ORACLE = f"""
WITH {corpus.RAW_SQL_CTE.strip()}, {corpus.ENRICH_SQL_CTE.strip()},
routed AS (
    SELECT *, {corpus.ROUTE_SQL_CASE.strip()} AS sink FROM enriched
)
SELECT sink, source, count(*) AS row_count, CAST(sum(n_tok) AS BIGINT) AS tok_sum
FROM routed GROUP BY sink, source
"""


def test_parse_reextracts_ground_truth(oracle_smoke):
    """Regex parse over raw must reproduce every derived scalar column."""
    parsed = flagship.parsed_corpus(SF_SMOKE).select_columns(
        ["doc_id", "source", "n_tok", "ts", "severity"]
    )
    oracle = oracle_smoke.sql(
        f"WITH {corpus.RAW_SQL_CTE.strip()} "
        "SELECT doc_id, source, n_tok, ts, severity FROM corpus"
    ).df()
    assert_frames_equal_unordered(parsed, oracle, keys=["doc_id"])


def test_tokens_survive_parse_byte_identical():
    """Per-row token-array equality through the parse stage (north rule)."""
    truth = corpus.corpus_dataset(SF_SMOKE, with_raw=False).to_pandas()
    parsed = flagship.parsed_corpus(SF_SMOKE).to_pandas()
    truth = truth.set_index("doc_id").sort_index()
    parsed = parsed.set_index("doc_id").sort_index()
    assert len(truth) == len(parsed) == 500
    for did in truth.index:
        assert list(truth.loc[did, "tokens"]) == list(parsed.loc[did, "tokens"])


def test_flagship_aggregate_matches_oracle(oracle_smoke):
    agg = flagship.flagship_aggregate(SF_SMOKE)
    oracle = oracle_smoke.sql(FLAGSHIP_ORACLE).df()
    assert_frames_equal_unordered(agg, oracle, keys=["sink", "source"])


def test_routed_rows_exactly_one_sink(oracle_smoke, tmp_path):
    """Fan-out write: every doc in exactly one sink partition, tokens intact."""
    out = tmp_path / "routed"
    flagship.run_flagship(SF_SMOKE, out_dir=str(out)).materialize()
    written = pq.read_table(str(out))
    assert written.num_rows == 500
    ids = written.column("doc_id").to_pylist()
    assert len(set(ids)) == 500  # no duplication across sinks

    # sink assignment matches the oracle's first-match-wins CASE
    oracle = oracle_smoke.sql(
        f"WITH {corpus.RAW_SQL_CTE.strip()}, {corpus.ENRICH_SQL_CTE.strip()} "
        f"SELECT doc_id, {corpus.ROUTE_SQL_CASE.strip()} AS sink FROM enriched"
    ).df()
    got = written.select(["doc_id", "sink"]).to_pandas()
    assert_frames_equal_unordered(got, oracle, keys=["doc_id"])

    # tokens byte-identical after the partitioned write round-trip
    truth = {
        r["doc_id"]: r["tokens"]
        for r in corpus.corpus_dataset(SF_SMOKE, with_raw=False)
        .select_columns(["doc_id", "tokens"])
        .take_all()
    }
    toks = written.column("tokens").to_pylist()
    for did, t in zip(ids, toks):
        assert truth[did] == t


def test_enrich_unknown_sources_null_passthrough():
    ds = flagship.routed_corpus(SF_SMOKE)
    df = ds.to_pandas()
    unknown = df[df["source"].isin(["src18", "src19"])]
    assert len(unknown) > 0
    assert unknown["team"].isna().all()
    assert unknown["env"].isna().all()
    known = df[~df["source"].isin(["src18", "src19"])]
    assert known["team"].notna().all()


def test_builder_round2_stages():
    """Config-driven DAG covering the round-2 stage registrations:
    severity_parse, tail_sample (declarative policy set), exp_histogram
    terminal, geoip/dns actor stages (§2.10 registry surface)."""
    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_and_run,
        build_pipeline,
    )
    from opentelemetry_collector_contrib_ray.stages.geo import (
        build_demo_dnsdb,
        build_demo_geodb,
    )

    cfg = {
        "source": {"type": "parquet",
                   "path": f"{SF_SMOKE}/events.parquet",
                   "columns": ["event_id", "user_id", "event_type", "value"]},
        "stages": [
            {"type": "severity_parse", "parse_from": "event_type",
             "mapping": {"error": "error"}, "text_out": None},
            {"type": "tail_sample", "group_key": "user_id",
             "policies": [{"type": "ottl_condition",
                           "condition": 'event_type == "error"'}]},
        ],
        "aggregate": {"type": "exp_histogram", "value_col": "value",
                      "keys": ["event_type"], "scale": 0,
                      "idx_lo": -8, "idx_hi": 10},
    }
    out = build_and_run(cfg).to_pandas()
    assert {"event_type", "bucket", "row_count"} <= set(out.columns)
    assert out["row_count"].sum() > 0

    import numpy as np

    build_demo_geodb("/tmp/t_geo.parquet")
    build_demo_dnsdb("/tmp/t_dns.parquet")
    cfg2 = {
        "source": {"type": "parquet",
                   "path": f"{SF_SMOKE}/events.parquet",
                   "columns": ["event_id"]},
        "stages": [
            {"type": "transform", "statements": [
                {"editor": "set", "target": "ip", "value": "10.0.0.7"},
                {"editor": "set", "target": "host", "value": "host-3"},
            ]},
            {"type": "geoip", "db_path": "/tmp/t_geo.parquet"},
            {"type": "dns_lookup", "db_path": "/tmp/t_dns.parquet"},
        ],
    }
    df = build_pipeline(cfg2).limit(5).to_pandas()
    assert (df["geo_country"] == "C00").all()
    assert (df["resolved_ip"] == "10.0.0.3").all()


def test_builder_training_data_stages():
    """Config-driven training-data curation chain: decontaminate ->
    mixture-sample -> pack (the §2.10 registry covering the LLM ops)."""
    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_pipeline,
    )

    cfg = {
        "source": {"type": "corpus", "sf_dir": SF_SMOKE, "with_raw": False},
        "stages": [
            {"type": "sample_mixture", "group_col": "source",
             "key": "doc_id", "rates": {"src0": 100.0},
             "default_rate": 50.0},
            {"type": "pack_sequences", "max_len": 256},
        ],
    }
    out = build_pipeline(cfg).to_pandas()
    assert (out["n_tok"] <= 256).all()
    assert out["n_tok"].sum() > 0

    cfg2 = {
        "source": {"type": "parquet",
                   "path": f"{SF_SMOKE}/documents.parquet",
                   "columns": ["doc_id", "text"]},
        "stages": [
            {"type": "decontaminate",
             "bench_parquet": f"{SF_SMOKE}/documents.parquet",
             "bench_filter": [["doc_id", "<", 20]]},
        ],
    }
    out2 = build_pipeline(cfg2).to_pandas()
    assert {"overlap", "contaminated"} <= set(out2.columns)
    # the benchmark docs themselves are fully contaminated
    assert out2[out2["doc_id"] < 20]["contaminated"].all()


def test_builder_round3_stages():
    """Config-driven DAG builder drives the round-3 stages: ring routing,
    map editors, bucketed c2d terminal quantiles."""
    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_and_run,
        build_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    cfg = {
        "source": {"type": "parquet", "path": f"{sf}/events.parquet",
                   "columns": ["event_id", "event_type", "user_id"]},
        "stages": [
            {"type": "ring_route", "endpoints": ["c0:4317", "c1:4317"],
             "key": "user_id"},
        ],
        "aggregate": {"type": "count_sum", "keys": ["endpoint"]},
    }
    out = build_and_run(cfg).to_pandas()
    assert set(out["endpoint"]) == {"c0:4317", "c1:4317"}
    assert out["row_count"].sum() == 1000

    cfg2 = {
        "source": {"type": "parquet", "path": f"{sf}/events.parquet",
                   "columns": ["event_type", "value"]},
        "aggregate": {"type": "group_quantiles", "keys": ["event_type"],
                      "value_col": "value", "qs": [0.5]},
    }
    q = build_and_run(cfg2).to_pandas()
    assert len(q) == 5 and "q50" in q.columns

    cfg3 = {
        "source": {"type": "parquet", "path": f"{sf}/documents.parquet",
                   "columns": ["doc_id", "text"]},
        "stages": [{"type": "lang_id_model"}],
    }
    ds = build_pipeline(cfg3)
    assert "lang_model" in ds.schema().names
