"""Range (interval-containment) join — left rows matched to right
intervals with ``start <= ts < end`` (half-open), optionally also on
equality keys.

The telemetry shape this serves is the reference's span/incident
correlation pattern (match log records into the time window opened by an
error / incident event — the same store-keyed matching family as
connector/servicegraphconnector/internal/store/store.go:19-133, extended
from point-equality to interval containment).

Ray-Data-first plan — NO all-pairs, NO per-key single task:

1. pick a bucket width (caller-supplied, else the right side's mean
   interval length — any width is CORRECT, width only tunes the
   expansion/selectivity trade);
2. left: one vectorized pass appends ``_bucket = epoch_us // bucket_us``;
3. right: one vectorized pass EXPANDS each interval to one row per
   overlapped bucket (``np.repeat`` + arange offsets, the same k-fold
   expansion trick as window.sliding_window_counts) — expansion factor is
   ``len/bucket + 1``, ~2 when the bucket is sized to the mean length;
4. native hash-shuffle ``Dataset.join`` on ``key_cols + [_bucket]``
   (both sides partitioned by hash — a hot key spreads over its buckets);
5. exact containment filter ``start <= ts < end``.

Each matching (left, right) pair meets in EXACTLY one joined row — the
left row's own bucket (the right side covers every bucket it overlaps,
the left row sits in one) — so no post-join dedup is needed.

Skew: a hot equality key is spread across its time buckets by
construction. The residual hazard is one giant interval (expands to
``time_range / bucket_s`` rows); ``max_expand`` bounds it and raises with
guidance rather than silently capping (repo convention: no silent caps).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US = 1_000_000


def _epoch_us(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type) and col.type.unit != "us":
        # normalize s/ms/ns-resolution timestamps (pandas emits ns)
        col = col.cast(pa.timestamp("us", tz=col.type.tz))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def mean_interval_seconds(right, start_col: str, end_col: str) -> float:
    """Deterministic mean interval length (seconds) via a partial-sum
    aggregate — used only to SIZE buckets, never in results."""

    def partial(t: pa.Table) -> pa.Table:
        s = _epoch_us(t.column(start_col))
        e = _epoch_us(t.column(end_col))
        d = np.maximum(e - s, 0)
        return pa.table({"sum_us": pa.array([int(d.sum())], pa.int64()),
                         "n": pa.array([len(d)], pa.int64())})

    parts = right.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    tot = parts.sum(["sum_us", "n"])
    n = tot["sum(n)"] or 0
    if not n:
        return 1.0
    return max(tot["sum(sum_us)"] / n / _US, 1e-6)


def range_join(
    left,
    right,
    left_ts: str,
    right_start: str,
    right_end: str,
    key_cols: list[str] | None = None,
    bucket_s: float | None = None,
    num_partitions: int | None = None,
    max_expand: int = 65_536,
    right_suffix: str = "_r",
):
    """Inner-join ``left`` rows to ``right`` intervals containing them.

    Match condition: ``right_start <= left_ts < right_end`` AND equality
    on ``key_cols`` (columns present on BOTH sides; optional — without
    keys the join runs on the time bucket alone, which is correct but
    concentrates load on hot buckets; prefer a key when one exists).

    ``bucket_s`` — time-bucket width in seconds; default = the right
    side's mean interval length (expansion ≈ 2 rows/interval). Any value
    gives identical results. ``max_expand`` bounds the bucket expansion
    of a single interval; exceeding it raises with the offending count
    (raise, don't silently drop — repo convention).
    """
    key_cols = list(key_cols or [])

    if bucket_s is None:
        # materialize the right side ONCE — the mean pass and the
        # expansion both read it; without this the interval pipeline
        # executes twice
        right = right.materialize()
        bucket_s = mean_interval_seconds(right, right_start, right_end)
    bucket_us = max(int(bucket_s * _US), 1)

    def tag_left(t: pa.Table) -> pa.Table:
        b = _epoch_us(t.column(left_ts)) // bucket_us
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def expand_right(t: pa.Table) -> pa.Table:
        s = _epoch_us(t.column(right_start))
        e = _epoch_us(t.column(right_end))
        # half-open [s, e): last containable instant is e-1; empty or
        # inverted intervals expand to zero buckets
        sb = s // bucket_us
        eb = (e - 1) // bucket_us
        nb = np.maximum(eb - sb + 1, 0) * (e > s)
        worst = int(nb.max()) if len(nb) else 0
        if worst > max_expand:
            raise ValueError(
                f"range_join: an interval spans {worst} buckets "
                f"(> max_expand={max_expand}); raise bucket_s "
                f"(now {bucket_us / _US:g}s) or max_expand")
        idx = np.repeat(np.arange(len(nb), dtype=np.int64), nb)
        off = np.arange(int(nb.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(nb)[:-1])), nb)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(
            "_bucket", pa.array(sb[idx] + off, pa.int64()))

    l_tagged = left.map_batches(tag_left, batch_format="pyarrow",
                                zero_copy_batch=True)
    r_tagged = right.map_batches(expand_right, batch_format="pyarrow",
                                 zero_copy_batch=True)

    # coalesce tiny blocks + scrub empties before the shuffle: join task
    # count follows block count, and its fixed dispatch cost dominated the
    # whole operator on small inputs (measured 4.6 s for a 140k-row join
    # across 128 read-sized blocks)
    from .blocks import join_ready

    sized_l = join_ready(l_tagged)
    sized_r = join_ready(r_tagged)

    if num_partitions is None:
        # scale with actual rows (counts are free post-materialize); cap
        # at cluster CPUs — partitions beyond cores only add dispatch
        try:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        rows = sized_l.count() + sized_r.count()
        num_partitions = int(max(2, min(cpus, rows // 150_000 + 1)))

    joined = sized_l.join(
        sized_r,
        join_type="inner",
        num_partitions=num_partitions,
        on=tuple(key_cols + ["_bucket"]),
        right_suffix=right_suffix,
    )

    # Ray suffixes a right column when it collides with ANY left column —
    # compute the collision set from the full (materialized, so free)
    # tagged-left schema, not just {left_ts} | key_cols (ADVICE r4: a left
    # column independently named like right_start made the containment
    # filter read the unsuffixed LEFT column). Join keys are merged, not
    # suffixed, so they are excluded.
    keyset = set(key_cols) | {"_bucket"}
    left_names = set(sized_l.schema().names) - keyset
    start_out = (right_start + right_suffix if right_start in left_names
                 else right_start)
    end_out = (right_end + right_suffix if right_end in left_names
               else right_end)

    def contains(t: pa.Table) -> pa.Table:
        ts = _epoch_us(t.column(left_ts))
        s = _epoch_us(t.column(start_out))
        e = _epoch_us(t.column(end_out))
        return t.filter(pa.array((ts >= s) & (ts < e))).drop_columns(
            ["_bucket"])

    return joined.map_batches(contains, batch_format="pyarrow",
                              zero_copy_batch=True)
