"""best_per_group distributed argmax + cluster_representatives paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.aggregate import best_per_group
from opentelemetry_collector_contrib_ray.stages.cluster import (
    cluster_representatives,
)


def _items(n=500, groups=23, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.integers(0, groups, n).astype(np.int64),
        "score": rng.integers(0, 50, n).astype(np.int64),  # frequent ties
    })


def _reference(df):
    out = df.sort_values(["g", "score", "id"],
                         ascending=[True, False, True]).groupby("g")
    best = out.first().reset_index()
    best["n_members"] = df.groupby("g").size().values
    return {(r.g, r.id, r.score, r.n_members) for r in best.itertuples()}


def _got(ds):
    return {(r["g"], r["id"], r["score"], r["n_members"])
            for r in ds.take_all()}


def test_best_per_group_driver_and_shuffle_agree():
    df = _items()
    ds = rd.from_pandas(df, override_num_blocks=7)
    expect = _reference(df)
    for final in ("driver", "shuffle", "auto"):
        out = best_per_group(ds, keys=["g"], score_col="score",
                             tiebreak_col="id", count_name="n_members",
                             final=final)
        assert _got(out) == expect, final


def test_best_per_group_without_count():
    df = _items(80, 5)
    ds = rd.from_pandas(df, override_num_blocks=3)
    out = best_per_group(ds, keys=["g"], score_col="score",
                         tiebreak_col="id").to_pandas()
    assert set(out.columns) == {"g", "id", "score"}
    assert len(out) == df["g"].nunique()


def _rep_set(ds):
    return {(r["cluster"], r["id"], r["score"], r["n_members"])
            for r in ds.take_all()}


def test_cluster_representatives_singletons_and_paths():
    items = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "score": np.array([5, 1, 9, 9, 2, 7, 3, 3], dtype=np.int64),
    })
    # components: {0,1,2} (rep 2: score 9), {3,4} (rep 3), singletons 5,6,7
    pairs = pa.table({"id_a": pa.array([0, 1, 3], pa.int64()),
                      "id_b": pa.array([1, 2, 4], pa.int64())})
    expect = {(0, 2, 9, 3), (3, 3, 9, 2), (5, 5, 7, 1),
              (6, 6, 3, 1), (7, 7, 3, 1)}
    items_ds = rd.from_pandas(items, override_num_blocks=3)
    pairs_ds = rd.from_arrow(pairs)
    # broadcast-attach path
    got_b = cluster_representatives(items_ds, pairs_ds, id_col="id",
                                    score_col="score")
    assert _rep_set(got_b) == expect
    # forced distributed left-join path
    got_j = cluster_representatives(items_ds, pairs_ds, id_col="id",
                                    score_col="score",
                                    broadcast_threshold=0)
    assert _rep_set(got_j) == expect


def test_cluster_representatives_no_pairs_all_singletons():
    items = pd.DataFrame({"id": np.arange(4, dtype=np.int64),
                          "score": np.arange(4, dtype=np.int64)})
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    got = cluster_representatives(rd.from_pandas(items),
                                  rd.from_arrow(empty),
                                  id_col="id", score_col="score")
    assert _rep_set(got) == {(i, i, i, 1) for i in range(4)}


def test_topk_per_group_matches_reference_and_paths_agree():
    from opentelemetry_collector_contrib_ray.stages.aggregate import (
        topk_per_group,
    )

    df = _items(600, 17, seed=21)
    k = 3
    ref = df.sort_values(["g", "score", "id"],
                         ascending=[True, False, True]).groupby("g").head(k)
    expect = {(r.g, r.id, r.score) for r in ref.itertuples()}
    ds = rd.from_pandas(df, override_num_blocks=6)
    for final in ("driver", "shuffle"):
        out = topk_per_group(ds, keys=["g"], k=k, score_col="score",
                             tiebreak_col="id", final=final)
        got = {(r["g"], r["id"], r["score"]) for r in out.take_all()}
        assert got == expect, final
    # k larger than any group: everything survives
    out = topk_per_group(ds, keys=["g"], k=10_000, score_col="score",
                         tiebreak_col="id")
    assert out.count() == len(df)
