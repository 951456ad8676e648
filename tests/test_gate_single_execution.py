"""Auto-gates must NEVER re-execute a lazy upstream just to pick a path
(VERDICT r4 #1): ``ds.count()`` on a mapped dataset is a full pipeline
run. Each gated operator is fed a MAPPED upstream instrumented with a
row-counting spy actor; the spy must see every input row exactly ONCE
when the operator's output is consumed — seeing 2N rows means the gate
probed the input with an extra execution."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
class _RowSpy:
    def __init__(self):
        self.rows = 0

    def add(self, n: int):
        self.rows += int(n)

    def get(self) -> int:
        return self.rows


def _spied(tbl: pa.Table, spy, blocks: int = 4):
    """A lazy MAPPED dataset over ``tbl`` (cheap_rows => None) whose
    execution streams every row past ``spy``."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="gate_spy_", dir="/tmp")
    import pyarrow.parquet as pq

    pq.write_table(tbl, os.path.join(d, "part.parquet"))

    def count_rows(t: pa.Table) -> pa.Table:
        ray.get(spy.add.remote(t.num_rows))
        return t

    return rd.read_parquet(d, override_num_blocks=blocks).map_batches(
        count_rows, batch_format="pyarrow", zero_copy_batch=True)


def _events(n: int = 3_000) -> pa.Table:
    rng = np.random.RandomState(11)
    ts = pd.Timestamp("2025-01-01").value // 1000 + np.sort(
        rng.randint(0, 86_400_000_000, n))
    return pa.table({
        "user_id": pa.array(rng.randint(0, 40, n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(np.round(rng.rand(n) * 100, 2), pa.float64()),
        "row_id": pa.array(np.arange(n), pa.int64()),
    })


def test_delta_to_cumulative_single_execution(ray_session):
    from opentelemetry_collector_contrib_ray.stages.window import (
        delta_to_cumulative,
    )

    tbl = _events()
    spy = _RowSpy.remote()
    out = delta_to_cumulative(
        _spied(tbl, spy), ["user_id"], ["ts", "row_id"], "value"
    ).to_pandas()
    assert ray.get(spy.get.remote()) == tbl.num_rows  # exactly one pass
    # values still exact: pandas reference cumsum of integer cents
    ref = tbl.to_pandas().sort_values(["ts", "row_id"])
    ref["cum_value"] = (
        np.rint(ref["value"].to_numpy() * 100).astype(np.int64))
    ref["cum_value"] = ref.groupby("user_id")["cum_value"].cumsum()
    got = out.set_index("row_id")["cum_value"]
    want = ref.set_index("row_id")["cum_value"]
    assert got.sort_index().equals(want.sort_index())


def test_cumulative_to_delta_single_execution(ray_session):
    from opentelemetry_collector_contrib_ray.stages.window import (
        cumulative_to_delta,
    )

    tbl = _events()
    spy = _RowSpy.remote()
    out = cumulative_to_delta(
        _spied(tbl, spy), ["user_id"], ["ts", "row_id"], "value"
    ).to_pandas()
    assert ray.get(spy.get.remote()) == tbl.num_rows
    assert len(out) == tbl.num_rows


def test_sessionize_single_execution(ray_session):
    from opentelemetry_collector_contrib_ray.stages.window import sessionize

    tbl = _events()
    for agg in ("summary", "tag"):
        spy = _RowSpy.remote()
        out = sessionize(
            _spied(tbl, spy), ["user_id"], ["ts", "row_id"], "ts",
            gap_seconds=600.0, agg=agg,
        ).to_pandas()
        assert ray.get(spy.get.remote()) == tbl.num_rows, agg
        assert len(out) > 0


def test_asof_join_single_execution(ray_session):
    from opentelemetry_collector_contrib_ray.stages.asof import asof_join

    left = _events(2_000)
    rng = np.random.RandomState(5)
    right = pa.table({
        "user_id": pa.array(rng.randint(0, 40, 500), pa.int64()),
        "r_ts": pa.array(
            pd.Timestamp("2025-01-01").value // 1000
            + np.sort(rng.randint(0, 86_400_000_000, 500)),
            pa.timestamp("us")),
        "r_val": pa.array(np.arange(500), pa.int64()),
    })
    spy_l, spy_r = _RowSpy.remote(), _RowSpy.remote()
    out = asof_join(
        _spied(left, spy_l), _spied(right, spy_r),
        key="user_id", left_ts="ts", right_ts="r_ts", right_cols=["r_val"],
    ).to_pandas()
    assert ray.get(spy_l.get.remote()) == left.num_rows
    assert ray.get(spy_r.get.remote()) == right.num_rows
    assert len(out) == left.num_rows


def test_lang_id_model_single_execution(ray_session):
    from opentelemetry_collector_contrib_ray.stages.textstats import (
        lang_id_model_stage,
    )

    tbl = pa.table({"text": pa.array(
        [f"the quick brown fox number {i}" for i in range(400)])})
    spy = _RowSpy.remote()
    out = lang_id_model_stage(_spied(tbl, spy)).to_pandas()
    assert ray.get(spy.get.remote()) == tbl.num_rows
    assert len(out) == tbl.num_rows
