"""Regression pins for the three ADVICE-r4 edge cases fixed in round 5's
opening commit (3df9f53): NUL-bearing perplexity input, range-join suffix
collision with an unrelated left column, and the Bloom empty path's id
dtype on string-keyed corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def test_perplexity_nul_in_text_does_not_shift_neighbors():
    """A document containing \\x00 must not mis-assign window counts of any
    OTHER document in the batch (the NUL is the blob separator)."""
    from opentelemetry_collector_contrib_ray.stages.perplexity import (
        HashedCharLM,
    )

    fit_texts = ["the quick brown fox jumps over the lazy dog",
                 "pack my box with five dozen liquor jugs"]
    lm = HashedCharLM.fit(fit_texts)

    a, b = "hello world wide web", "grumpy wizards make toxic brew"
    nul_doc = "foo\x00bar\x00\x00baz"
    with_nul, n_with = lm.score([a, nul_doc, b])
    clean, n_clean = lm.score([a, nul_doc.replace("\x00", ""), b])
    # neighbors identical, NUL doc scores as its stripped self
    assert np.array_equal(with_nul, clean)
    assert np.array_equal(n_with, n_clean)
    # and fitting on NUL-bearing text matches fitting on stripped text
    lm2 = HashedCharLM.fit([nul_doc])
    lm3 = HashedCharLM.fit([nul_doc.replace("\x00", "")])
    assert np.array_equal(lm2.logc3, lm3.logc3)
    assert np.array_equal(lm2.logc2, lm3.logc2)


def test_range_join_left_column_named_like_right_start(ray_session):
    """An UNRELATED left column named exactly like right_start must not be
    read by the containment filter (Ray suffixes the right column on any
    collision with the full left schema)."""
    from opentelemetry_collector_contrib_ray.stages.rangejoin import (
        range_join,
    )

    ts = pd.to_datetime([10, 25, 40, 55, 70], unit="s", utc=True)
    left = ray.data.from_arrow(pa.table({
        "key": pa.array([1, 1, 2, 2, 1], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us", "UTC")),
        # decoy: same NAME as right_start, values that would pass the
        # containment check for every row if read by mistake
        "s": pa.array(pd.to_datetime([0] * 5, unit="s", utc=True),
                      pa.timestamp("us", "UTC")),
    }))
    rs = pd.to_datetime([20, 50], unit="s", utc=True)
    re_ = pd.to_datetime([45, 60], unit="s", utc=True)
    right = ray.data.from_arrow(pa.table({
        "key": pa.array([1, 2], pa.int64()),
        "s": pa.array(rs, pa.timestamp("us", "UTC")),
        "e": pa.array(re_, pa.timestamp("us", "UTC")),
    }))
    out = range_join(left, right, left_ts="ts", right_start="s",
                     right_end="e", key_cols=["key"]).take_all()
    got = sorted((r["key"], r["ts"].timestamp()) for r in out)
    # brute force: (key=1, ts=25) in [20,45); (key=2, ts=55) in [50,60);
    # (key=2, ts=40) not in [50,60); decoy "s"=epoch-0 would admit ALL rows
    assert got == [(1, 25.0), (2, 55.0)]
    # only the COLLIDING right column is suffixed; "e" has no left
    # counterpart and keeps its name
    names = set(out[0].keys())
    assert "s_r" in names and "e" in names and "e_r" not in names


def test_bloom_empty_path_preserves_string_id_dtype(ray_session):
    """Zero candidates on a string-keyed corpus: the empty result must
    carry the string id dtype so unions/joins against the populated path
    don't break (ADVICE r4: was hardcoded int64)."""
    from opentelemetry_collector_contrib_ray.stages.decontaminate import (
        decontaminate_bloom,
    )

    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta",
                          "eta theta iota kappa lambda mu"]),
    }))
    bench = pa.array(["completely disjoint benchmark sentence tokens here"])
    out = decontaminate_bloom(corpus, bench, id_col="doc_id")
    tbl = pa.Table.from_pylist(out.take_all()) if out.count() else None
    assert out.count() == 0
    sch = out.schema()
    assert sch.types[sch.names.index("doc_id")] == pa.string()
