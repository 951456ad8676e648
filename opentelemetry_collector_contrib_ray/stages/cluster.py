"""Connected components over near-dup pairs — dedup cluster assignment.

After MinHash/SimHash/embedding near-dup stages emit verified pairs
(id_a, id_b), deduplication needs CLUSTERS (keep one canonical doc per
component).  Distributed min-label propagation (the guide's recipe):

    label(x) = min(x, all neighbors' labels); iterate to fixed point.

Each round is one flat edge expansion + one hash-shuffle groupby(min) —
rounds needed = graph diameter (near-dup clusters are shallow; typically
≤ 3-5 rounds).  Falls back to a driver-side union-find only when the pair
set is provably small (``driver_threshold``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Min


def connected_components_driver(pairs: pa.Table) -> pa.Table:
    """Union-find on the driver (small candidate sets only)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    a_col = pairs.column("id_a").to_pylist()
    b_col = pairs.column("id_b").to_pylist()
    for a, b in zip(a_col, b_col):
        union(a, b)
    nodes = sorted({*a_col, *b_col})
    return pa.table(
        {
            "id": pa.array(nodes),
            "cluster": pa.array([find(n) for n in nodes]),
        }
    )


def connected_components(pairs_ds, driver_threshold: int = 1_000_000,
                         max_rounds: int = 50):
    """Cluster ids for every node appearing in a pairs Dataset.

    Returns a Dataset/Table (id, cluster) where cluster = min node id of the
    component.  Iterates min-label propagation until labels stop changing.
    """
    pairs_tables = ray.get(pairs_ds.materialize().to_arrow_refs())
    total = sum(t.num_rows for t in pairs_tables)
    if total <= driver_threshold:
        pairs = pa.concat_tables([t for t in pairs_tables if t.num_rows])
        if pairs.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return connected_components_driver(pairs.select(["id_a", "id_b"]))

    # distributed min-label propagation
    def explode(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a")
        b = batch.column("id_b")
        return pa.table(
            {
                "id": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                        b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]),
                "label": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                                           a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
            }
        )

    # edges in both directions; materialized ONCE and reused every round
    edges = pairs_ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    labels = edges.groupby("id").aggregate(Min("label", alias_name="label"))

    def self_min(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        return pa.table({"id": batch.column("id"),
                         "label": pa.array(np.minimum(ids, lab))})

    # each round MATERIALIZES its labels — without this the lazy lineage
    # re-executes every prior round (exponential blowup)
    labels = labels.map_batches(self_min, batch_format="pyarrow").materialize()
    old_sum = sum(r["label"] for r in labels.take_all())

    class _Relabel:
        """Per-batch: neighbor inherits this node's current label (broadcast
        sorted label arrays + searchsorted — the node→label table is the
        small side relative to the edge set)."""

        def __init__(self, ref):
            self.ids, self.labels = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            src = batch.column("id").to_numpy(zero_copy_only=False)
            dst = batch.column("label").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.ids, src)
            return pa.table({"id": pa.array(dst),
                             "label": pa.array(self.labels[pos])})

    def snapshot(lbl_ds):
        t = pa.concat_tables(
            [x for x in ray.get(lbl_ds.to_arrow_refs()) if x.num_rows]
        )
        ids = t.column("id").to_numpy(zero_copy_only=False)
        lab = t.column("label").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        return ids[order], lab[order]

    for _ in range(max_rounds):
        ref = ray.put(snapshot(labels))
        prop = edges.map_batches(
            _Relabel, fn_constructor_kwargs=dict(ref=ref),
            batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
        )
        labels = (
            labels.union(prop)
            .groupby("id")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new_sum = sum(r["label"] for r in labels.take_all())
        if new_sum == old_sum:  # fixed point: no label decreased
            break
        old_sum = new_sum
    return labels.map_batches(
        lambda t: t.rename_columns(["id", "cluster"]), batch_format="pyarrow"
    )