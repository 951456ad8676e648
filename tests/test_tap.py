"""remotetapprocessor analog — rate-limited tee semantics.

The main stream must pass through untouched; the tap keeps at most
``limit`` rows per event-time window, first-by-order, identically for
any block layout (processor/remotetapprocessor: pass-through +
throttled duplicate stream).
"""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.tap import remote_tap


def _tbl(n=500, seed=3):
    rng = np.random.RandomState(seed)
    ts = np.sort(rng.randint(0, 40, size=n).astype(np.int64) * 1_000_000
                 + rng.randint(0, 1_000_000, size=n))
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.int64()),
    })


def _reference_tap(tbl, limit, window_us):
    rows = sorted(tbl.to_pylist(), key=lambda r: (r["ts"], r["event_id"]))
    seen = {}
    out = []
    for r in rows:
        w = (r["ts"] // window_us) * window_us
        if seen.get(w, 0) < limit:
            seen[w] = seen.get(w, 0) + 1
            out.append((r["event_id"], w))
    return sorted(out)


@pytest.mark.parametrize("blocks", [1, 7])
def test_tap_limit_and_determinism(ray_session, blocks):
    import ray
    import ray.data as rd

    tbl = _tbl()
    ds = rd.from_arrow(tbl).repartition(blocks)
    passthrough, tapped = remote_tap(
        ds, ts_col="ts", order_cols=["ts", "event_id"],
        limit=2, window_us=5_000_000)
    # pass-through untouched: same rows, same schema
    assert passthrough.count() == tbl.num_rows
    assert passthrough.schema().names == ["event_id", "ts"]
    got = pa.concat_tables(ray.get(tapped.to_arrow_refs()))
    got_pairs = sorted(zip(got.column("event_id").to_pylist(),
                           got.column("tap_window").to_pylist()))
    assert got_pairs == _reference_tap(tbl, 2, 5_000_000)
    # limit honored per window
    import collections

    counts = collections.Counter(w for _, w in got_pairs)
    assert max(counts.values()) <= 2


def test_tap_rejects_bad_limit(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl(10))
    with pytest.raises(ValueError):
        remote_tap(ds, ts_col="ts", order_cols=["event_id"], limit=0)
