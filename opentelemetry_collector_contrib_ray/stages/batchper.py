"""pkg/batchpersignal — one output batch per (resource, scope, trace).

Reference: ``pkg/batchpersignal/batchpersignal.go:14-155`` —
``SplitTraces``/``SplitLogs`` regroup an input batch into one output
payload per trace, where a batch is CREATED at the trace id's first
appearance while scanning resource-spans → scope-spans → spans in order
(same trace id under a different scope ⇒ a different batch). In the
flat-column model the split is an assignment: every row gets the dense
first-seen rank of its (resource, scope, trace) triple under an explicit
row-order column; the fan-out itself is then any keyed consumer
(``write_routed``, ``groupby``) over that index.

Scale shape: per-block distinct-triple partials (bounded by
blocks × groups-per-block) → size-gated finish. Below the gate the
partial GROUP table merges on the driver and the rank map broadcasts via
``ray.put`` (one ``index_in`` gather per block — no shuffle of the data).
Above it: hash groupby → sort by first-seen → O(blocks) driver carry
enumeration (``num_returns=2`` keeps payload tables in the object store)
→ distributed join back on the packed key. Both paths return identical
indexes; the golden test pins them against each other.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_SEP = "\x1f"


def _pack_key(t: pa.Table, keys: tuple[str, ...]) -> pa.Array:
    """One string key per row: columns cast to string, joined on the unit
    separator (assumes key values don't contain \\x1f — true for ids)."""
    cols = [pc.cast(t.column(k), pa.string()) for k in keys]
    packed = cols[0]
    for c in cols[1:]:
        packed = pc.binary_join_element_wise(packed, c, _SEP)
    if isinstance(packed, pa.ChunkedArray):
        packed = packed.combine_chunks()
    return packed


class _AssignBroadcast:
    """Task-based lookup: packed key → first-seen rank via ``index_in``
    against the broadcast rank-ordered key array (cheap-state rule:
    lazy zero-copy ``ray.get`` per task, no actor pool)."""

    def __init__(self, keys_ref, keys: tuple[str, ...], out_col: str):
        self.keys_ref = keys_ref
        self._keys = None
        self.keys = keys
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._keys is None:
            self._keys = (ray.get(self.keys_ref)
                          if isinstance(self.keys_ref, ray.ObjectRef)
                          else self.keys_ref)
        idx = pc.index_in(_pack_key(t, self.keys), value_set=self._keys)
        return t.append_column(self.out_col, idx.cast(pa.int64()))


def batch_per_signal_index(ds, keys: tuple[str, ...],
                           order_col: str, out_col: str = "batch_idx",
                           gate: int = 5_000_000):
    """Append ``out_col`` = dense first-seen rank of the ``keys`` triple
    ordered by ``order_col`` (must be unique; ties would make "first"
    ambiguous across partitions). See module docstring for the reference
    semantics and the scale shape."""

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "k": _pack_key(t, keys),
            "o": pc.cast(t.column(order_col), pa.int64()),
        })
        g = tbl.group_by("k").aggregate([("o", "min")])
        return g.rename_columns(["k", "first_seen"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    # materialized ⇒ metadata-only count (r4 rule: never count a lazy map)
    if parts.count() <= gate:
        merged = pa.concat_tables(
            [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows])
        g = merged.group_by("k").aggregate([("first_seen", "min")])
        order = pc.sort_indices(g.column("first_seen_min"))
        ranked = g.column("k").take(order)
        if isinstance(ranked, pa.ChunkedArray):
            ranked = ranked.combine_chunks()
        ref = ray.put(ranked)
        return ds.map_batches(_AssignBroadcast(ref, keys, out_col),
                              batch_format="pyarrow", zero_copy_batch=True)

    # scale path: shuffle-final min + sorted enumeration + join back
    groups = (parts.groupby("k")
              .min("first_seen")
              .sort("min(first_seen)")
              .materialize())
    refs = groups.to_arrow_refs()

    @ray.remote(num_returns=2)
    def enumerate_block(tbl, offset: int):
        if not isinstance(tbl, pa.Table):  # pandas block from a shuffle
            tbl = pa.Table.from_pandas(tbl)
        idx = pa.array(offset + np.arange(tbl.num_rows, dtype=np.int64))
        out = pa.table({"k": tbl.column("k"), out_col: idx})
        return out, tbl.num_rows

    out_refs, off = [], 0
    for r in refs:
        out, n = enumerate_block.remote(r, off)
        out_refs.append(out)
        off += ray.get(n)
    rank_ds = rd.from_arrow_refs(out_refs)

    def with_key(t: pa.Table) -> pa.Table:
        return t.append_column("k", _pack_key(t, keys))

    from .blocks import join_ready
    keyed = ds.map_batches(with_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    # partitions sized to the GROUP count (cluster.py convention) — a
    # fixed large value deadlocks small sessions (32 hash-join actors on
    # 4 cpus block each other in ray.get)
    nparts = int(min(32, max(2, off // 50_000 + 2)))
    joined = join_ready(keyed).join(join_ready(rank_ds), join_type="inner",
                                    num_partitions=nparts, on=("k",))
    return joined.drop_columns(["k"])
