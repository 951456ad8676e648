"""metricstarttimeprocessor stage: sorted-scan vs a literal restatement of
the reference's per-point loop (truereset/adjuster.go:181-212,
subtractinitial/adjuster.go:198-239), across block counts, hot keys, and
boundary resets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.starttime import (
    SUBTRACT_INITIAL,
    TRUE_RESET,
    metric_start_time,
)

BACKOFF = 1000


def ref_adjust(df: pd.DataFrame, strategy: str) -> pd.DataFrame:
    """Brute-force single-threaded restatement of the Go adjuster loops."""
    out = []
    state = {}
    for r in df.sort_values(["k", "ts", "eid"]).itertuples():
        cents = int(round(r.value * 100))
        st = state.get(r.k)
        if st is None:
            state[r.k] = {"prev": cents, "ref": cents, "start": r.ts}
            if strategy == TRUE_RESET:
                # first point KEPT, start = own timestamp
                out.append((r.eid, r.k, r.ts, cents))
            continue  # subtract_initial: first point dropped
        if cents < st["prev"]:  # IsResetSum
            st["start"] = r.ts - BACKOFF
            st["prev"] = cents
            st["ref"] = 0
            out.append((r.eid, r.k, st["start"], cents))
        else:
            st["prev"] = cents
            out.append((r.eid, r.k, st["start"],
                        cents - (0 if strategy == TRUE_RESET else st["ref"])))
    res = pd.DataFrame(out, columns=["eid", "k", "start_us", "adj_cents"])
    if strategy == TRUE_RESET:
        res = res.drop(columns=["adj_cents"])
    return res.sort_values("eid").reset_index(drop=True)


def run_stage(df: pd.DataFrame, strategy: str, blocks: int,
              target_rows: int) -> pd.DataFrame:
    t = pa.table({
        "k": pa.array(df["k"], pa.string()),
        "ts": pa.array(df["ts"].to_numpy(np.int64), pa.int64()),
        "eid": pa.array(df["eid"].to_numpy(np.int64), pa.int64()),
        "value": pa.array(df["value"].to_numpy(np.float64), pa.float64()),
    })
    out = metric_start_time(
        rd.from_arrow(t).repartition(blocks), key_cols=["k"],
        order_cols=["ts", "eid"], ts_col="ts", value_col="value",
        strategy=strategy, reset_backoff_us=BACKOFF,
        target_rows=target_rows,
    ).to_pandas()
    cols = ["eid", "k", "start_us"]
    if strategy == SUBTRACT_INITIAL:
        cols.append("adj_cents")
    return out[cols].sort_values("eid").reset_index(drop=True)


def check(df: pd.DataFrame, strategy: str, blocks: int, target_rows: int):
    want = ref_adjust(df, strategy)
    got = run_stage(df, strategy, blocks, target_rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def random_corpus(seed: int, n: int, n_keys: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    keys = np.array([f"s{i}" for i in range(n_keys)])[rng.integers(0, n_keys, n)]
    value = np.round(rng.random(n) * 50, 2)
    value = np.where(rng.random(n) < 0.7, value + 50, value)
    return pd.DataFrame({
        "k": keys,
        "ts": np.arange(n, dtype=np.int64) * 7_000,  # unique, > backoff apart
        "eid": np.arange(n, dtype=np.int64),
        "value": value,
    })


def test_both_strategies_match_reference_across_block_counts():
    df = random_corpus(7, 600, 5)
    for strategy in (TRUE_RESET, SUBTRACT_INITIAL):
        for blocks, target in ((1, 1 << 20), (4, 100), (9, 40)):
            check(df, strategy, blocks, target)


def test_hot_key_monotonic_continuation_carry():
    """One strictly-INCREASING series over many tiny blocks: every block
    boundary continues the series with NO reset, so every block's prefix is
    rewritten from the carried (start, ref) — the continuation branch."""
    n = 300
    df = pd.DataFrame({
        "k": ["hot"] * n,
        "ts": np.arange(n, dtype=np.int64) * 5_000,
        "eid": np.arange(n, dtype=np.int64),
        "value": np.arange(n, dtype=np.float64) + 1.0,
    })
    for strategy in (TRUE_RESET, SUBTRACT_INITIAL):
        check(df, strategy, 10, 30)
    got = run_stage(df, SUBTRACT_INITIAL, 10, 30)
    assert (got["start_us"] == 0).all()  # all rebased to the first point
    assert got["adj_cents"].tolist() == (np.arange(1, n) * 100).tolist()


def test_hot_key_every_point_resets_boundary_reset_carry():
    """One strictly-DECREASING series: every point after the first is a
    reset, so every block boundary hits the boundary-reset branch
    (start = own ts - backoff, raw value)."""
    n = 300
    df = pd.DataFrame({
        "k": ["hot"] * n,
        "ts": np.arange(n, dtype=np.int64) * 5_000,
        "eid": np.arange(n, dtype=np.int64),
        "value": np.arange(n, 0, -1, dtype=np.float64),
    })
    for strategy in (TRUE_RESET, SUBTRACT_INITIAL):
        check(df, strategy, 10, 30)
    got = run_stage(df, SUBTRACT_INITIAL, 10, 30)
    tail = got[got.eid > 0]
    assert (tail["start_us"].to_numpy() ==
            tail["eid"].to_numpy() * 5_000 - BACKOFF).all()
    assert (tail["adj_cents"].to_numpy() ==
            (n - tail["eid"].to_numpy()) * 100).all()


def test_periodic_resets_mixed_blocks():
    """Counter that resets every 40 points — anchors both inside blocks and
    (for some block layouts) at boundaries; semantics must be identical to
    the reference loop regardless of partitioning."""
    n = 240
    df = pd.DataFrame({
        "k": ["hot"] * n,
        "ts": np.arange(n, dtype=np.int64) * 5_000,
        "eid": np.arange(n, dtype=np.int64),
        "value": np.tile(np.arange(40, dtype=np.float64) + 1.0, 6),
    })
    for strategy in (TRUE_RESET, SUBTRACT_INITIAL):
        for blocks, target in ((1, 1 << 20), (6, 40), (8, 25)):
            check(df, strategy, blocks, target)


def test_single_point_series_and_monotonic_series():
    df = pd.DataFrame({
        "k": ["a", "b", "b", "b"],
        "ts": np.array([10_000, 20_000, 30_000, 40_000], dtype=np.int64),
        "eid": np.array([0, 1, 2, 3], dtype=np.int64),
        "value": [5.0, 1.0, 2.0, 3.0],
    })
    t = run_stage(df, TRUE_RESET, 1, 1 << 20)
    assert t.loc[t.eid == 0, "start_us"].item() == 10_000  # own ts
    assert (t[t.k == "b"]["start_us"] == 20_000).all()
    s = run_stage(df, SUBTRACT_INITIAL, 1, 1 << 20)
    assert 0 not in s["eid"].to_numpy()  # single-point series fully dropped
    assert s[s.k == "b"]["adj_cents"].tolist() == [100, 200]
    assert (s[s.k == "b"]["start_us"] == 20_000).all()


def test_start_time_metric_resolve_and_fallback():
    """start_time_metric: series firsts get the batch-resolved constant
    (earliest matching row's value, seconds→µs), resets still re-anchor at
    ts-1ms, matching rows are excluded; fallback when nothing matches."""
    from opentelemetry_collector_contrib_ray.stages.starttime import (
        start_time_from_metric,
    )

    t = pa.table({
        "name": ["process_start", "m", "m", "m", "process_start"],
        "ts": pa.array([5_000, 10_000, 20_000, 30_000, 1_000], pa.int64()),
        "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
        # earliest matching row (ts=1000, eid=4) has value 7.5 → 7_500_000 µs
        "value": pa.array([9.0, 2.0, 3.0, 1.0, 7.5], pa.float64()),
    })
    out = start_time_from_metric(
        rd.from_arrow(t), name_col="name", pattern="^process_start$",
        key_cols=["name"], order_cols=["ts", "eid"], ts_col="ts",
        value_col="value", fallback_us=42,
    ).to_pandas().sort_values("eid")
    assert out["eid"].tolist() == [1, 2, 3]  # matching rows excluded
    # first point of series 'm' → resolved constant; second continues it;
    # third (3.0 → 1.0) is a reset → own ts - 1ms
    assert out["start_us"].tolist() == [7_500_000, 7_500_000,
                                        30_000 - BACKOFF]

    out2 = start_time_from_metric(
        rd.from_arrow(t), name_col="name", pattern="^nothing_matches$",
        key_cols=["name"], order_cols=["ts", "eid"], ts_col="ts",
        value_col="value", fallback_us=42,
    ).to_pandas().sort_values("eid")
    assert len(out2) == 5  # nothing excluded
    assert out2.loc[out2.eid == 1, "start_us"].item() == 42  # fallback


def test_start_time_metric_constant_anchor_across_blocks():
    """first_start_us constant must survive the cross-block continuation
    carry: a monotonic hot series over many blocks keeps the constant on
    every row."""
    from opentelemetry_collector_contrib_ray.stages.starttime import (
        metric_start_time,
    )

    n = 200
    t = pa.table({
        "k": pa.array(["hot"] * n),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 5_000, pa.int64()),
        "eid": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "value": pa.array(np.arange(n, dtype=np.float64) + 1.0,
                          pa.float64()),
    })
    out = metric_start_time(
        rd.from_arrow(t).repartition(8), key_cols=["k"],
        order_cols=["ts", "eid"], ts_col="ts", value_col="value",
        strategy=TRUE_RESET, first_start_us=777, target_rows=30,
    ).to_pandas()
    assert (out["start_us"] == 777).all()


def test_timestamp_typed_ts_column():
    """timestamp[us] inputs cast to int64 µs starts (the events-table path
    the oracle checks end-to-end)."""
    t = pa.table({
        "k": ["a", "a"],
        "ts": pa.array(np.array([1_000_000, 2_000_000], np.int64),
                       pa.timestamp("us")),
        "eid": pa.array([0, 1], pa.int64()),
        "value": pa.array([2.0, 1.0], pa.float64()),
    })
    out = metric_start_time(
        rd.from_arrow(t), key_cols=["k"], order_cols=["ts", "eid"],
        ts_col="ts", value_col="value", strategy=TRUE_RESET,
    ).to_pandas().sort_values("eid")
    assert out["start_us"].tolist() == [1_000_000, 2_000_000 - BACKOFF]
