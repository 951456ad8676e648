"""Exact distributed per-group quantiles — the spanmetrics latency
percentile analog (p50/p90/p99 over R.E.D. streams).

The reference exports explicit/exponential histogram buckets and leaves
percentile math to the backend (connector/spanmetricsconnector README
"Exemplars"/bucket config); a training-data/telemetry engine also wants the
percentile itself. Shape (SURVEY.md §4 partial-then-merge):

1. per-block combiner: ``(keys, value) -> count`` via pyarrow group_by —
   the shuffle then moves one row per DISTINCT (key, value) pair, bounded
   by value cardinality, never input rows;
2. hash-shuffle groupby merges pair counts;
3. per-key ``map_groups`` finish: sort the key's distinct values, cumsum
   counts, select ``rank = max(ceil(q·n) - 1, 0)`` — DuckDB
   ``quantile_disc`` parity (verified empirically: n=4 q=.5 -> idx 1,
   q=.25 -> idx 0, q=0 -> idx 0, q=1 -> idx n-1), so the whole operator
   is value-hash-checkable by SQL.

Partitioning assumption: one key's DISTINCT values fit one task (integer
cents over bounded-range metrics; for unbounded high-precision doubles,
pre-round to the precision the percentile needs — the discrete quantile of
the rounded multiset is the rounded quantile — or fall back to a mergeable
sketch, which trades the exact oracle for fixed memory).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


class _PairCounts:
    """Per-block combiner: (keys..., value) -> partial count."""

    def __init__(self, keys: list[str], value_col: str):
        self.keys = keys
        self.value_col = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = batch.select(self.keys + [self.value_col]).group_by(
            self.keys + [self.value_col], use_threads=False
        ).aggregate([([], "count_all")])
        return g.rename_columns(
            ["_cnt" if n == "count_all" else n for n in g.column_names]
        )


def group_quantiles(ds, keys: list[str], value_col: str,
                    qs: list[float], prefix: str = "q",
                    driver_threshold: int = 5_000_000):
    """One row per key group with columns ``{prefix}{int(q*100)}`` holding
    the exact discrete quantiles of ``value_col``.

    Size-gated final like :func:`~.aggregate.count_sum`: at or below
    ``driver_threshold`` PARTIAL rows (distinct (key, value) pairs ×
    blocks — the actual driver-funnel hazard; gating on ``ds.count()``
    also re-executed the upstream once just for the gate, r4) the
    per-block pair partials merge with one driver-side pyarrow group_by
    and finish in pandas; above it the merge is a Ray hash-shuffle
    groupby and each key finishes in its own task."""
    from ray.data.aggregate import Sum

    names = [f"{prefix}{int(round(q * 100))}" for q in qs]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="mergesort")
        vals = g[value_col].to_numpy()
        cum = g["_cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        out = {k: [g[k].iloc[0]] for k in keys}
        for q, name in zip(qs, names):
            rank = max(math.ceil(q * n) - 1, 0)  # quantile_disc parity
            out[name] = [vals[np.searchsorted(cum, rank, side="right")]]
        return pd.DataFrame(out)

    pairs = ds.map_batches(
        _PairCounts(keys, value_col), batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if pairs.count() <= driver_threshold:
        import ray.data as rd

        from .aggregate import _collect_partials

        tbl = _collect_partials(pairs)
        merged = tbl.group_by(keys + [value_col]).aggregate([("_cnt", "sum")])
        merged = merged.rename_columns(
            ["_cnt" if n == "_cnt_sum" else n for n in merged.column_names])
        df = merged.to_pandas()
        out = pd.concat(
            [finish(g) for _, g in df.groupby(keys, sort=False)],
            ignore_index=True,
        )
        return rd.from_pandas(out)

    merged = pairs.groupby(keys + [value_col]).aggregate(
        Sum("_cnt", alias_name="_cnt"))
    return merged.groupby(keys).map_groups(finish, batch_format="pandas")


def global_quantiles(ds, value_col: str, qs: list[float],
                     shuffle_threshold: int = 5_000_000) -> dict[float, object]:
    """Exact discrete quantiles of ``value_col`` over the WHOLE dataset —
    scalars on the driver (quantile_disc parity, same rank math as
    :func:`group_quantiles`).

    Per-block distinct-(value, count) partials; above ``shuffle_threshold``
    PARTIAL rows (distinct × blocks — the actual driver-funnel hazard, not
    input rows) the pair counts pre-merge in a distributed groupby so the
    driver only ever sees one row per DISTINCT value (the documented
    partitioning assumption: the signal's distinct values fit one task —
    integer quality counters, cents, ranks; pre-round unbounded doubles).
    The global cumsum finish is O(distinct) on the driver.

    The upstream pipeline executes exactly ONCE here: gating on
    ``ds.count()`` would run it a second time just for a row count — for
    an expensive upstream (perplexity scoring) that doubled the whole
    operator (r4 measurement).
    """
    import ray

    pairs = ds.map_batches(
        _PairCounts([], value_col), batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    if pairs.count() > shuffle_threshold:
        from ray.data.aggregate import Sum

        pairs = pairs.groupby(value_col).aggregate(
            Sum("_cnt", alias_name="_cnt")).materialize()
    nonempty = [t for t in ray.get(pairs.to_arrow_refs())
                if t.num_rows]
    if not nonempty:
        return {q: None for q in qs}
    merged = pa.concat_tables(nonempty).group_by([value_col]).aggregate(
        [("_cnt", "sum")])
    vals = merged.column(value_col).to_numpy(zero_copy_only=False)
    cnts = merged.column("_cnt_sum").to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="stable")
    vals, cum = vals[order], cnts[order].cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for q in qs:
        if not n:
            out[q] = None
            continue
        rank = max(math.ceil(q * n) - 1, 0)
        out[q] = vals[np.searchsorted(cum, rank, side="right")].item()
    return out


def quantile_band_filter(ds, value_col: str, q_lo: float, q_hi: float,
                         shuffle_threshold: int = 5_000_000):
    """Keep rows with ``q_lo-quantile <= value_col <= q_hi-quantile`` —
    the percentile-trim data-selection op (drop the degenerate tails of a
    quality signal, CCNet-style band selection).

    Two STREAMING passes: pass 1 computes the two exact global quantiles
    (bounded driver state, see :func:`global_quantiles`), pass 2 filters
    with the broadcast scalar thresholds — no materialization of ``ds``.
    """
    import pyarrow.compute as pc

    bounds = global_quantiles(ds, value_col, [q_lo, q_hi],
                              shuffle_threshold=shuffle_threshold)
    lo, hi = bounds[q_lo], bounds[q_hi]
    if lo is None:
        return ds

    def keep(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        return t.filter(pc.and_(pc.greater_equal(v, lo),
                                pc.less_equal(v, hi)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
