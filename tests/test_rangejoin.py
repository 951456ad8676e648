"""range_join: brute-force equivalence, keyless path, skew, and guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.rangejoin import range_join

_US = 1_000_000


def _mk(left_rows, right_rows):
    left = pd.DataFrame(left_rows, columns=["lid", "k", "ts"])
    right = pd.DataFrame(right_rows, columns=["rid", "k", "s", "e"])
    for df, cols in ((left, ["ts"]), (right, ["s", "e"])):
        for c in cols:
            df[c] = pd.to_datetime(df[c] * _US, unit="us")
    return left, right


def _brute(left, right, keyed=True):
    out = left.merge(right, on="k" if keyed else None,
                     how="cross" if not keyed else "inner")
    out = out[(out["ts"] >= out["s"]) & (out["ts"] < out["e"])]
    return set(zip(out["lid"], out["rid"]))


def _run(left, right, key_cols, **kw):
    got = range_join(
        rd.from_pandas(left, override_num_blocks=3),
        rd.from_pandas(right, override_num_blocks=2),
        left_ts="ts", right_start="s", right_end="e",
        key_cols=key_cols, **kw,
    ).to_pandas()
    return set(zip(got["lid"], got["rid"]))


def test_random_matches_bruteforce():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 120
    left_rows = [(i, int(rng.integers(0, 5)), int(rng.integers(0, 10_000)))
                 for i in range(n_l)]
    right_rows = []
    for j in range(n_r):
        s = int(rng.integers(0, 10_000))
        right_rows.append((j, int(rng.integers(0, 5)), s,
                           s + int(rng.integers(0, 800))))
    left, right = _mk(left_rows, right_rows)
    assert _run(left, right, ["k"]) == _brute(left, right)
    # bucket width must not change the answer
    assert _run(left, right, ["k"], bucket_s=13.0) == _brute(left, right)
    assert _run(left, right, ["k"], bucket_s=5000.0) == _brute(left, right)


def test_keyless_and_hot_key():
    rng = np.random.default_rng(11)
    # every row on ONE key: the join spreads over time buckets, not keys
    left_rows = [(i, 0, int(rng.integers(0, 2_000))) for i in range(300)]
    right_rows = [(j, 0, int(rng.integers(0, 2_000)),
                   int(rng.integers(0, 2_000)) + 50) for j in range(40)]
    left, right = _mk(left_rows, right_rows)
    expect = _brute(left, right)
    assert _run(left, right, ["k"]) == expect
    assert _run(left, right, None) == expect  # keyless bucket-only join


def test_empty_and_inverted_intervals_drop():
    left, right = _mk([(0, 0, 100), (1, 0, 200)],
                      [(0, 0, 100, 100),   # empty: s == e
                       (1, 0, 300, 250),   # inverted
                       (2, 0, 150, 201)])  # matches lid=1 only
    assert _run(left, right, ["k"]) == {(1, 2)}


def test_half_open_boundaries():
    left, right = _mk([(0, 0, 100), (1, 0, 200)], [(0, 0, 100, 200)])
    # ts == start matches, ts == end does not
    assert _run(left, right, ["k"]) == {(0, 0)}


def test_max_expand_raises_with_guidance():
    left, right = _mk([(0, 0, 5)], [(0, 0, 0, 10_000)])
    # the ValueError raised in the map task surfaces wrapped in Ray's
    # RayTaskError; match on the message
    with pytest.raises(Exception, match="max_expand"):
        _run(left, right, ["k"], bucket_s=1.0, max_expand=100)


def test_expansion_factor_bounded_by_mean_sizing():
    """Auto bucket = mean interval length: expansion stays ~2/interval."""
    rng = np.random.default_rng(3)
    rows = []
    for j in range(200):
        s = int(rng.integers(0, 100_000))
        rows.append((j, 0, s, s + int(rng.integers(50, 150))))
    _, right = _mk([], rows)
    from opentelemetry_collector_contrib_ray.stages.rangejoin import (
        mean_interval_seconds,
    )
    r_ds = rd.from_pandas(right, override_num_blocks=2)
    m = mean_interval_seconds(r_ds, "s", "e")
    lens = (right["e"] - right["s"]).dt.total_seconds()
    assert m == pytest.approx(lens.mean())
    # worst-case buckets per interval at that width
    assert (lens.max() / m) + 1 <= 4
