"""global_quantiles / quantile_band_filter: path parity + edge cases."""

import numpy as np
import pandas as pd
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.quantile import (
    global_quantiles,
    quantile_band_filter,
)


def test_global_quantiles_matches_numpy_disc_and_paths_agree():
    rng = np.random.default_rng(2)
    v = rng.integers(0, 100, 1000).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": v}), override_num_blocks=5)
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    driver = global_quantiles(ds, "v", qs)
    shuffled = global_quantiles(ds, "v", qs, shuffle_threshold=0)
    s = np.sort(v)
    for q in qs:
        rank = max(int(np.ceil(q * len(s))) - 1, 0)
        assert driver[q] == s[rank] == shuffled[q], q


def test_band_filter_keeps_exact_band():
    v = np.arange(100, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"id": v, "v": v}),
                        override_num_blocks=4)
    out = quantile_band_filter(ds, "v", 0.10, 0.90).to_pandas()
    # quantile_disc(0.10) of 0..99 = 9, (0.90) = 89 — inclusive band
    assert out["v"].min() == 9 and out["v"].max() == 89
    assert len(out) == 81


def test_empty_dataset_passthrough():
    ds = rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="int64")}))
    assert global_quantiles(ds, "v", [0.5]) == {0.5: None}
    assert quantile_band_filter(ds, "v", 0.1, 0.9).count() == 0
