"""Keyed count/sum aggregation — the count/sum connector analog.

Reference semantics (connector/countconnector/counter.go:38-128,
connector/sumconnector/sum.go:40-130): per batch, extract the configured
attribute set per record and increment ``counts[MapHash(attrs)]`` /
``sums[...] += value``; flush one datapoint per attribute-set.

Ray-Data-first, two-phase: a vectorized *partial* aggregate runs inside
``map_batches`` (pyarrow ``Table.group_by`` per block — the combiner), then
only the tiny per-block partials go through the Ray Data hash-shuffle
``groupby().aggregate()`` for the final merge.  At 100 TB this moves
``num_blocks × num_groups`` rows through the shuffle instead of every input
row — the partial-then-merge shape called out in SURVEY.md §4 (skew row):
a hot key costs a few extra partial rows, never a hot shuffle partition.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Max, Min, Sum


class _PartialCountSum:
    """Per-block combiner: groupby keys -> (row_count, sum cols)."""

    def __init__(self, keys: list[str], sum_cols: dict[str, str]):
        self.keys = keys
        self.sum_cols = sum_cols  # {input_col: output_name}

    def __call__(self, batch: pa.Table) -> pa.Table:
        aggs = [([], "count_all")] + [(c, "sum") for c in self.sum_cols]
        grouped = batch.select(self.keys + list(self.sum_cols)).group_by(
            self.keys, use_threads=False
        ).aggregate(aggs)
        rename = {"count_all": "row_count"}
        rename.update({f"{c}_sum": out for c, out in self.sum_cols.items()})
        return grouped.rename_columns(
            [rename.get(name, name) for name in grouped.column_names]
        )


def _collect_partials(partial) -> pa.Table:
    """Materialize the (tiny) per-block partial table on the driver.

    Size is bounded by num_blocks × num_groups — at 100 TB with 64 MB blocks
    and a low-cardinality key set this is a few million short rows, far below
    driver memory; the heavy reduction already happened inside map_batches.
    For high-cardinality keys use ``final="shuffle"`` instead.
    """
    import ray

    # materialize() executes the plan exactly once; a bare to_arrow_refs()
    # triggers an extra schema-fetch execution of the whole upstream pipeline
    tables = ray.get(partial.materialize().to_arrow_refs())
    return pa.concat_tables([t for t in tables if t.num_rows], promote_options="default")


def count_sum(
    ds,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    count_name: str = "row_count",
    batch_size: int | None = None,
    final: str = "driver",
    auto_shuffle_threshold: int = 5_000_000,
):
    """groupby(keys) -> count(*) AS count_name, sum(col) AS name per sum_cols.

    Returns a Dataset with columns keys + [count_name] + sum names.

    ``final="driver"`` (default) merges the per-block partials with one
    pyarrow group_by on the driver — right for low-cardinality keys where
    the partial table is tiny; ``final="shuffle"`` keeps the merge as a Ray
    hash-shuffle groupby for high-cardinality keys. ``final="auto"``
    materializes the partials and gates on their ACTUAL row count
    (groups × blocks) — callers that can't know key cardinality up front
    (sliding windows: keys × time range) use this instead of a
    ``ds.count()`` pre-scan, which re-executes the upstream once just to
    guess (r4)."""
    import ray.data

    sum_cols = sum_cols or {}
    partial = ds.map_batches(
        _PartialCountSum(keys, sum_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    if final == "auto":
        partial = partial.materialize()
        final = ("shuffle" if partial.count() > auto_shuffle_threshold
                 else "driver")
    if final == "shuffle":
        final_aggs = [Sum("row_count", alias_name=count_name)] + [
            Sum(out, alias_name=out) for out in sum_cols.values()
        ]
        return partial.groupby(keys).aggregate(*final_aggs)

    tbl = _collect_partials(partial)
    cols = ["row_count"] + list(sum_cols.values())
    merged = tbl.group_by(keys).aggregate([(c, "sum") for c in cols])
    rename = {f"row_count_sum": count_name}
    rename.update({f"{c}_sum": c for c in sum_cols.values()})
    merged = merged.rename_columns([rename.get(n, n) for n in merged.column_names])
    return ray.data.from_arrow(merged)


def distinct_count(ds, keys: list[str], col: str, out_name: str = "distinct_count",
                   batch_size: int | None = None):
    """Exact COUNT(DISTINCT col) per key group, two-level.

    Level 1 dedupes (keys, col) pairs per block (vectorized pyarrow
    group_by), level 2 is a hash groupby over the deduped pairs counting
    rows per key.  The shuffle moves one row per distinct (key, value) pair
    — bounded by cardinality, not input size.  (For 100 TB-scale
    ultra-high-cardinality columns swap level 2 for an HLL sketch merge;
    exact is right while pair cardinality fits the shuffle.)
    """
    from ray.data.aggregate import Count

    def level1(batch: pa.Table) -> pa.Table:
        return batch.select(keys + [col]).group_by(
            keys + [col], use_threads=False
        ).aggregate([])

    pairs = ds.map_batches(level1, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=batch_size)
    # cross-block duplicates of the same pair must collapse before counting
    pairs = pairs.groupby(keys + [col]).aggregate(Count(alias_name="_n"))
    def level2(t: pa.Table) -> pa.Table:
        g = t.select(keys).group_by(keys, use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(
            [out_name if n == "count_all" else n for n in g.column_names]
        )

    partial = pairs.map_batches(level2, batch_format="pyarrow")
    tbl = _collect_partials(partial)
    merged = tbl.group_by(keys).aggregate([(out_name, "sum")])
    merged = merged.rename_columns(
        [out_name if n == f"{out_name}_sum" else n for n in merged.column_names]
    )
    import ray.data

    return ray.data.from_arrow(merged)


class _PartialMultiAgg:
    """Per-block combiner for {sum, count, min, max} over one value column."""

    def __init__(self, keys: list[str], col: str):
        self.keys = keys
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.col
        grouped = batch.select(self.keys + [c]).group_by(
            self.keys, use_threads=False
        ).aggregate([(c, "sum"), (c, "min"), (c, "max"), ([], "count_all")])
        rename = {f"{c}_sum": "psum", f"{c}_min": "pmin", f"{c}_max": "pmax",
                  "count_all": "pcnt"}
        return grouped.rename_columns(
            [rename.get(n, n) for n in grouped.column_names]
        )


def multi_agg(
    ds,
    keys: list[str],
    col: str,
    ops: list[str],
    prefix: str | None = None,
    batch_size: int | None = None,
    final: str = "driver",
):
    """metricstransform aggregate_labels analog: {sum, count, min, max, mean}
    over ``col`` grouped by the kept label set ``keys``
    (processor/metricstransformprocessor/README.md:84-111).

    Two-phase like :func:`count_sum`; mean is derived exactly as
    total_sum / total_count in the final (tiny) table.  Output columns:
    ``{prefix}_sum`` etc. (prefix defaults to ``col``).
    """
    import ray.data

    prefix = prefix or col
    partial = ds.map_batches(
        _PartialMultiAgg(keys, col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    if final == "shuffle":
        merged_ds = partial.groupby(keys).aggregate(
            Sum("psum", alias_name=f"{prefix}_sum"),
            Min("pmin", alias_name=f"{prefix}_min"),
            Max("pmax", alias_name=f"{prefix}_max"),
            Sum("pcnt", alias_name=f"{prefix}_count"),
        )
        merged = _collect_partials(merged_ds)
    else:
        tbl = _collect_partials(partial)
        merged = tbl.group_by(keys).aggregate(
            [("psum", "sum"), ("pmin", "min"), ("pmax", "max"), ("pcnt", "sum")]
        )
        merged = merged.rename_columns(
            [
                {
                    "psum_sum": f"{prefix}_sum",
                    "pmin_min": f"{prefix}_min",
                    "pmax_max": f"{prefix}_max",
                    "pcnt_sum": f"{prefix}_count",
                }.get(n, n)
                for n in merged.column_names
            ]
        )

    wanted = set(ops)
    if "mean" in wanted:
        mean = pc.divide(
            pc.cast(merged.column(f"{prefix}_sum"), pa.float64()),
            pc.cast(merged.column(f"{prefix}_count"), pa.float64()),
        )
        merged = merged.append_column(f"{prefix}_mean", mean)
    drop = [f"{prefix}_{op}" for op in ("sum", "min", "max", "count") if op not in wanted]
    merged = merged.drop_columns(drop)
    return ray.data.from_arrow(merged)


class _PartialBest:
    """Per-block combiner: the single best row per key group.

    Best = max ``score_col``, ties to min ``tiebreak_col`` — one
    vectorized ``sort_by`` then a single-threaded ``group_by(..,
    use_threads=False).aggregate(first)`` (Arrow's hash_first respects
    table order when single-threaded, so the sorted-first row IS the
    argmax). Also carries the group's row count so the final merge can
    report member counts without a second pass.
    """

    def __init__(self, keys: list[str], order_by: list[tuple[str, str]],
                 count_name: str | None):
        self.keys = keys
        self.order_by = order_by
        self.count_name = count_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = self.keys
        ordered = batch.sort_by(
            [(k, "ascending") for k in keys] + self.order_by)
        others = [c for c in batch.column_names if c not in keys]
        g = ordered.group_by(keys, use_threads=False).aggregate(
            [(c, "first") for c in others] + [([], "count_all")])
        rename = {f"{c}_first": c for c in others}
        rename["count_all"] = self.count_name or "_n"
        return g.rename_columns(
            [rename.get(n, n) for n in g.column_names])


def best_per_group(
    ds,
    keys: list[str],
    score_col: str | None = None,
    tiebreak_col: str | None = None,
    count_name: str | None = None,
    batch_size: int | None = None,
    final: str = "auto",
    auto_shuffle_threshold: int = 5_000_000,
    order_by: list[tuple[str, str]] | None = None,
):
    """Distributed argmax: the one row per key group with the greatest
    ``score_col`` (ties -> least ``tiebreak_col``); optionally the group's
    row count as ``count_name``. For other orderings (e.g. lexicographic
    argmin) pass ``order_by`` — a pyarrow sort spec — instead of
    score/tiebreak.

    Partial-then-merge like :func:`count_sum`: each block reduces to at
    most one row per key (bounded by groups x blocks, never input size),
    then ``final="driver"`` re-runs the same reduction once on the driver
    or ``final="shuffle"`` runs it per hash partition. ``"auto"`` picks
    driver below ``auto_shuffle_threshold`` partial rows — the repo's
    driver-funnel gate.
    """
    import ray.data

    if order_by is None:
        if score_col is None or tiebreak_col is None:
            raise ValueError("pass score_col+tiebreak_col or order_by")
        order_by = [(score_col, "descending"), (tiebreak_col, "ascending")]

    partial = ds.map_batches(
        _PartialBest(keys, order_by, count_name),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    ).materialize()

    if final == "auto":
        final = ("shuffle" if partial.count() > auto_shuffle_threshold
                 else "driver")

    cnt = count_name or "_n"

    def merge(t: pa.Table) -> pa.Table:
        ordered = t.sort_by(
            [(k, "ascending") for k in keys] + order_by)
        others = [c for c in t.column_names if c not in keys and c != cnt]
        g = ordered.group_by(keys, use_threads=False).aggregate(
            [(c, "first") for c in others] + [(cnt, "sum")])
        rename = {f"{c}_first": c for c in others}
        rename[f"{cnt}_sum"] = cnt
        out = g.rename_columns([rename.get(n, n) for n in g.column_names])
        return out if count_name else out.drop_columns([cnt])

    if final == "shuffle":
        # hash-shuffle co-locates each key and merge runs per whole group
        # (batch_format="pyarrow" skips map_groups' pandas-construction
        # cost; group count here is PARTIAL-row cardinality, already
        # block-reduced)
        from .blocks import nonempty_blocks

        return nonempty_blocks(partial).groupby(keys).map_groups(
            merge, batch_format="pyarrow")

    import ray

    # len() not .num_rows: 0-row input blocks can skip the fused map and
    # surface as raw pandas blocks (see stages/blocks.py docstring)
    nonempty = [t for t in ray.get(partial.to_arrow_refs()) if len(t)]
    if not nonempty:
        return partial
    tbl = pa.concat_tables(nonempty, promote_options="default")
    return ray.data.from_arrow(merge(tbl))


def _rank_in_group(tbl: pa.Table, keys: list[str]) -> "np.ndarray":
    """0-based rank of each row within its key group — table must already
    be sorted by keys (+ the desired order); vectorized run-length pass."""
    import numpy as np

    n = tbl.num_rows
    starts = np.zeros(n, dtype=bool)
    if n:
        starts[0] = True
    for k in keys:
        col = tbl.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        a = col.to_numpy(zero_copy_only=False)
        starts[1:] |= a[1:] != a[:-1]
    seg_id = starts.cumsum() - 1
    start_idx = np.nonzero(starts)[0]
    return np.arange(n, dtype=np.int64) - start_idx[seg_id]


def topk_per_group(
    ds,
    keys: list[str],
    k: int,
    score_col: str | None = None,
    tiebreak_col: str | None = None,
    order_by: list[tuple[str, str]] | None = None,
    batch_size: int | None = None,
    final: str = "auto",
    auto_shuffle_threshold: int = 5_000_000,
):
    """Distributed per-group top-k: the k best rows per key group
    (``score_col`` descending, ties to ``tiebreak_col`` ascending, or an
    explicit ``order_by``) — the training-data selection primitive
    ("3 longest docs per source") without per-group pandas tasks.

    Same shape as :func:`best_per_group`: each block reduces to ≤ k rows
    per key (sort + vectorized run-length rank filter — no row loop), so
    the exchange carries at most groups × blocks × k rows; the size-gated
    final re-runs the identical rank filter once on the driver or per
    hash partition.
    """
    import numpy as np  # noqa: F401  (used via _rank_in_group)

    import ray.data

    if order_by is None:
        if score_col is None or tiebreak_col is None:
            raise ValueError("pass score_col+tiebreak_col or order_by")
        order_by = [(score_col, "descending"), (tiebreak_col, "ascending")]
    if k <= 0:
        raise ValueError("k must be positive")
    sort_spec = [(c, "ascending") for c in keys] + order_by

    def reduce_topk(t: pa.Table) -> pa.Table:
        ordered = t.sort_by(sort_spec)
        return ordered.filter(pa.array(_rank_in_group(ordered, keys) < k))

    partial = ds.map_batches(reduce_topk, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=batch_size).materialize()
    if final == "auto":
        final = ("shuffle" if partial.count() > auto_shuffle_threshold
                 else "driver")
    if final == "shuffle":
        from .blocks import nonempty_blocks

        return nonempty_blocks(partial).groupby(keys).map_groups(
            reduce_topk, batch_format="pyarrow")

    import ray

    nonempty = [t for t in ray.get(partial.to_arrow_refs()) if len(t)]
    if not nonempty:
        return partial
    return ray.data.from_arrow(
        reduce_topk(pa.concat_tables(nonempty, promote_options="default")))
