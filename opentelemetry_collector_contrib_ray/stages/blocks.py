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
