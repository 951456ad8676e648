"""Block-level hygiene helpers.

Ray Data emits 0-row blocks whose schema degrades (a fused projection skips
them; pandas-format groupby partitions can come back with NO columns).
Downstream native joins feed blocks to Arrow acero, which rejects a block
missing the key column — so iterative join pipelines (connected
components) must scrub empty blocks between rounds.
"""

from __future__ import annotations

import pyarrow as pa

import ray


@ray.remote
def _block_rows(t) -> int:
    # blocks may arrive as pa.Table OR pandas.DataFrame (to_arrow_refs can
    # hand back the raw block for pandas-format datasets); len() covers both
    return len(t)


def rightsize_blocks(ds, target_rows: int = 262_144,
                     max_blocks: int | None = None) -> "ray.data.Dataset":
    """Materialize ``ds`` and REDUCE its block count to ~rows/target_rows.

    Ray keeps the read parallelism's block count (often 100-200) through
    narrow transforms; a distributed sort then launches that many
    map+reduce tasks and every downstream per-block pass inherits the
    count. For the sorted-scan operators the per-task fixed cost (pandas
    conversion, task dispatch, driver carry tuple) dominates when blocks
    are tiny — measured 128 blocks for a 250k-row as-of join input.
    Only ever COALESCES (never splits): big data keeps its read-sized
    blocks, small data collapses to a handful of tasks. The repartition
    runs on materialized blocks, so upstream stages do not re-execute.
    """
    mat = ds.materialize()
    total = mat.count()
    cur = mat.num_blocks()
    want = max(1, min(cur, total // target_rows + 1))
    if max_blocks is not None:
        want = min(want, max_blocks)
    if want >= cur:
        return mat
    return mat.repartition(want)


def nonempty_blocks(ds) -> "ray.data.Dataset":
    """Materialize ``ds`` and rebuild it from its non-empty blocks only.

    Driver traffic is one int per block (row counts are computed remotely
    next to the data); block payloads never move. Returns an empty
    single-block dataset if every block is empty.
    """
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c]
    if not keep:
        return mat
    return ray.data.from_arrow_refs(keep)


def join_ready(ds, target_rows: int = 262_144) -> "ray.data.Dataset":
    """Prep a dataset for a native (acero) hash join: coalesce tiny blocks
    (shuffle task count follows block count — 128 1.5k-row blocks cost
    more in dispatch than the join itself) AND scrub 0-row blocks (acero
    rejects empty join inputs). ONE materialization barrier: the coalesce
    path's repartition merges-and-drops empties itself; the no-op path
    scrubs the already-materialized refs."""
    mat = ds.materialize()
    total = mat.count()
    cur = mat.num_blocks()
    want = max(1, min(cur, total // target_rows + 1))
    if want < cur:
        return mat.repartition(want)
    refs = mat.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c]
    return ray.data.from_arrow_refs(keep) if keep else mat


def cheap_rows(ds) -> int | None:
    """Row count ONLY when it is free — parquet footer metadata on a plain
    read, or cached block metadata on an already-executed plan.

    Returns ``None`` instead of triggering execution: ``ds.count()`` on a
    mapped/selected dataset re-runs the whole upstream pipeline just to
    produce an int (measured 1.9 s on 100k mapped events vs 3 ms on the
    plain read). Auto-gates must treat ``None`` as "unknown — pick the
    scale-safe path", never probe.
    """
    try:
        if ds._plan.has_computed_output():
            return ds.count()  # cached block metadata — no execution
        meta = ds._meta_count()
        return int(meta) if meta is not None else None
    except Exception:
        return None
