"""Flagship pipeline: parse → enrich → route → aggregate (SURVEY.md §7.0).

Mirrors the reference's logs pipeline lifecycle (SURVEY.md §3.2): receiver
(corpus raw lines) → transform/filter processors (regex parse) →
k8sattributes-style enrich (broadcast lookup actor pool) → routingconnector
(first-match sink column, partitioned fan-out write) → count/sum connectors
(two-phase groupby aggregate per (sink, source)).

Everything is one lazy Dataset graph: streaming execution end-to-end, the
``tokens`` list<int32> column rides through every stage zero-copy and is
never touched (per-row token-array equality invariant).
"""

from __future__ import annotations

import ray.data

from ..sources import corpus
from ..stages.aggregate import count_sum
from ..stages.enrich import enrich_dataset
from ..stages.parse import CORPUS_PATTERN, CORPUS_TYPES, RegexParse
from ..stages.route import Route, write_routed


def parsed_corpus(
    sf_dir: str,
    replicate: int = 1,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Corpus raw lines + tokens -> parsed/typed records (parse stage only).

    The pipeline input is (raw, tokens) ONLY — every scalar column the later
    stages consume is re-extracted from the raw line by the regex parser, as
    the filelog-receiver chain would.
    """
    ds = corpus.corpus_dataset(
        sf_dir, with_raw=True, replicate=replicate, override_num_blocks=override_num_blocks
    )
    ds = ds.select_columns(["raw", "tokens"])
    return ds.map_batches(
        RegexParse(CORPUS_PATTERN, parse_from="raw", types=CORPUS_TYPES, on_error="drop"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def routed_corpus(
    sf_dir: str,
    replicate: int = 1,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """parse → enrich → route: records with enrich columns + ``sink``."""
    ds = parsed_corpus(sf_dir, replicate=replicate, override_num_blocks=override_num_blocks)
    ds = enrich_dataset(ds, corpus.enrich_lookup(), key="source")
    return ds.map_batches(
        Route(corpus.ROUTING_RULES, default_sink=corpus.DEFAULT_SINK),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def flagship_aggregate(
    sf_dir: str,
    replicate: int = 1,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Per-(sink, source) row_count + tok_sum — the count/sum connector output."""
    ds = routed_corpus(sf_dir, replicate=replicate, override_num_blocks=override_num_blocks)
    return count_sum(ds, keys=["sink", "source"], sum_cols={"n_tok": "tok_sum"})


def run_flagship(
    sf_dir: str,
    out_dir: str | None = None,
    replicate: int = 1,
    override_num_blocks: int | None = None,
):
    """Full pipeline; optionally fan out routed rows to per-sink Parquet.

    Returns the aggregate Dataset (small: |sinks| × |sources| rows).
    """
    ds = routed_corpus(sf_dir, replicate=replicate, override_num_blocks=override_num_blocks)
    if out_dir is not None:
        write_routed(ds, out_dir)
        # aggregate over what was written so sinks and aggregates agree
        ds = ray.data.read_parquet(out_dir)
    return count_sum(ds, keys=["sink", "source"], sum_cols={"n_tok": "tok_sum"})
