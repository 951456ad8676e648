"""Perplexity scoring + CCNet band filter (stages/perplexity.py).

The query is rows-only (float log-prob model), so these tests ARE its
correctness contract: partitioning determinism, garbage-vs-corpus score
ordering, exact quantile-band membership, degenerate-doc handling.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from opentelemetry_collector_contrib_ray.stages.perplexity import (
    HashedCharLM,
    fit_char_lm,
    perplexity_filter,
    perplexity_score,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


def test_score_deterministic_under_partitioning():
    """Per-doc bpb must be bit-identical no matter how rows are blocked
    (the scoring windows of one doc are contiguous in its batch; fit
    sample is hash-order, partitioning-independent)."""
    a = perplexity_score(_docs(), "doc_id").to_pandas()
    b = perplexity_score(_docs().repartition(7), "doc_id").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (a["bpb"].to_numpy() == b["bpb"].to_numpy()).all()  # EXACT
    assert (a["bpb_mdb"] == b["bpb_mdb"]).all()
    assert (a["n_ctx"] == b["n_ctx"]).all()


def test_garbage_scores_worse_than_corpus_median():
    """An LM fit on the corpus must assign higher bits/byte to byte noise
    than to typical corpus text — the property the CCNet filter relies
    on."""
    lm = fit_char_lm(_docs(), "doc_id", "text", fit_sample=512)
    corpus_texts = (
        _docs().limit(200).to_pandas()["text"].fillna("").tolist()
    )
    rng = np.random.default_rng(3)
    garbage = ["".join(chr(c) for c in rng.integers(33, 127, size=400))
               for _ in range(50)]
    bpb_c, _ = lm.score(corpus_texts)
    bpb_g, _ = lm.score(garbage)
    assert np.median(bpb_g) > np.median(bpb_c) + 1.0  # clear separation


def test_band_filter_exact_membership():
    """perplexity_filter == driver-side quantile_disc band over the same
    scores (the scored set is deterministic, so the kept doc_id set is
    exactly reproducible)."""
    q_lo, q_hi = 0.05, 0.90
    scored = perplexity_score(_docs(), "doc_id").to_pandas()
    scored = scored[scored["n_ctx"] > 0]
    v = np.sort(scored["bpb_mdb"].to_numpy())
    n = len(v)
    lo = v[max(int(np.ceil(q_lo * n)) - 1, 0)]
    hi = v[max(int(np.ceil(q_hi * n)) - 1, 0)]
    expect = set(scored[(scored["bpb_mdb"] >= lo)
                        & (scored["bpb_mdb"] <= hi)]["doc_id"])

    kept = perplexity_filter(_docs(), "doc_id", q_lo=q_lo,
                             q_hi=q_hi).to_pandas()
    assert set(kept["doc_id"]) == expect
    frac = len(kept) / n
    assert q_hi - q_lo - 0.02 <= frac <= q_hi - q_lo + 0.07


def test_degenerate_docs_dropped_and_scored_zero():
    lm = HashedCharLM.fit(["hello world common text sample"])
    bpb, vcnt = lm.score(["", "ab", "abc"])
    assert vcnt.tolist() == [0, 0, 1]
    assert bpb[0] == 0.0 and bpb[1] == 0.0 and bpb[2] > 0.0

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "ab", "a perfectly ordinary sentence here"]),
    }))
    kept = perplexity_filter(ds, "doc_id", q_lo=0.0, q_hi=1.0,
                             fit_sample=8).to_pandas()
    assert set(kept["doc_id"]) == {3}  # degenerate rows never survive


def test_builder_stage_registered():
    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        STAGE_REGISTRY,
    )

    assert "perplexity_filter" in STAGE_REGISTRY


def test_filter_slim_output_equals_rows_output():
    """output='slim' (score-once materialized projection) must keep the
    identical doc set and scores as the streaming rows path."""
    rows = perplexity_filter(_docs(), "doc_id").to_pandas()
    slim = perplexity_filter(_docs(), "doc_id", output="slim").to_pandas()
    r = rows.sort_values("doc_id").reset_index(drop=True)
    s = slim.sort_values("doc_id").reset_index(drop=True)
    assert (r["doc_id"] == s["doc_id"]).all()
    assert (r["bpb_mdb"] == s["bpb_mdb"]).all()
