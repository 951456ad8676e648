"""End-to-end text dedup decision (q_text_dedup_reps): the MinHash →
exact-verify → components → keep-best composition. The candidate set is
sketch-bounded (rows-only query), so these invariants are the contract.
"""

import pandas as pd
import pyarrow as pa
import pytest
import ray

from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reps():
    out = QUERIES["text_dedup_reps"](SF)
    return out.to_pandas() if hasattr(out, "to_pandas") else out


def _docs():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"]).to_pandas()


def test_one_rep_per_cluster_and_reps_are_members(reps):
    docs = _docs()
    assert reps["cluster"].is_unique  # exactly one survivor per cluster
    assert set(reps["doc_id"]) <= set(docs["doc_id"])
    # every doc is accounted for: sum of cluster sizes == corpus size
    assert int(reps["n_members"].sum()) == len(docs)


def test_verified_duplicates_collapse_and_rep_is_best(reps):
    """Rebuild the exact decision on the driver from the same verified
    pair set and require identical survivors (the distributed composition
    must equal the reference union-find + argmax)."""
    from opentelemetry_collector_contrib_ray.stages.neardup import (
        exact_jaccard_verify,
        minhash_lsh_pairs,
    )

    docs_ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                                    columns=["doc_id", "text"])
    cands = minhash_lsh_pairs(docs_ds, threshold=0.5)
    pairs = exact_jaccard_verify(cands.drop_columns(["jaccard_est"]),
                                 docs_ds, threshold=0.5).to_pandas()
    docs = _docs().set_index("doc_id")

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict = {}
    for d in docs.index:
        clusters.setdefault(find(d), []).append(d)
    expect = {}
    for c, members in clusters.items():
        # best = greatest n_chars, ties to least doc_id
        best = min(members, key=lambda d: (-docs.loc[d, "n_chars"], d))
        expect[c] = (best, len(members))

    got = {row.cluster: (row.doc_id, row.n_members)
           for row in reps.itertuples()}
    assert got == expect


def test_repetition_stats_counts_exact():
    """RepetitionStats vs hand counts, including empty-string segments
    from consecutive separators (DuckDB string_split parity)."""
    from opentelemetry_collector_contrib_ray.stages.textstats import (
        RepetitionStats,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b a", "x  x", "unique words only here"]),
    })
    out = RepetitionStats(text_col="text", sep=" ")(t)
    # "a b a b a" -> 5 segs, 2 distinct; "x  x" -> ["x","","x"] 3 segs,
    # 2 distinct; last -> 4/4
    assert out.column("n_seg").to_pylist() == [5, 3, 4]
    assert out.column("n_uniq").to_pylist() == [2, 2, 4]


def test_hash_split_partitioning_invariance_and_fractions():
    from opentelemetry_collector_contrib_ray.stages.sample import hash_split

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id"])
    splits = {"train": 0.90, "val": 0.05, "test": 0.05}
    a = hash_split(ds, "doc_id", splits).to_pandas()
    b = hash_split(ds.repartition(7), "doc_id", splits).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()
    frac = a["split"].value_counts(normalize=True)
    assert 0.85 <= frac["train"] <= 0.95  # md5-uniform, 500 docs

    with pytest.raises(ValueError):
        hash_split(ds, "doc_id", {"train": 0.5, "val": 0.4})  # != 1


def test_token_bigram_counts_matches_reference():
    """token_bigram_counts vs a Python Counter over the same lists,
    including doc-boundary masking and single-token docs."""
    from collections import Counter

    from opentelemetry_collector_contrib_ray.stages.tokenstats import (
        token_bigram_counts,
    )

    docs = [[1, 2, 3, 2, 3], [7], [], [2, 3], [3, 3, 3]]
    ds = ray.data.from_arrow(pa.table({
        "tokens": pa.array(docs, pa.list_(pa.int32())),
    })).repartition(3)
    out = token_bigram_counts(ds).to_pandas()
    got = {(r.t1, r.t2): r.n for r in out.itertuples()}
    ref = Counter()
    for d in docs:
        for a, b in zip(d, d[1:]):
            ref[(a, b)] += 1
    assert got == dict(ref)


def test_top_bigram_stats_hand_counts():
    """TopBigramStats vs hand counts: tie-break to lexicographically
    least gram, <2-word docs excluded, char coverage = len(gram)*m."""
    from opentelemetry_collector_contrib_ray.stages.textstats import (
        TopBigramStats,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b a b a",        # "a b" x2, "b a" x2 -> tie: "a b" wins
            "xx yy xx yy xx",   # "xx yy" x2 -> 5*2=10 chars
            "solo",             # <2 words: excluded
            "p q",              # single bigram m=1, 3 chars
        ]),
    })
    out = TopBigramStats()(t)
    got = {r.doc_id: (r.m, r.top2_chars) for r in out.to_pandas().itertuples()}
    assert got == {1: (2, 6), 2: (2, 10), 4: (1, 3)}
