"""Broadcast-lookup enrich stage — the k8sattributes/resource-enrich analog.

Reference semantics (processor/k8sattributesprocessor/processor.go:141-360):
an in-memory metadata table keyed by an association key; for every record,
look up the key and stamp the metadata columns onto the record; records with
no association pass through unmodified (null enrich columns here).

Ray-Data-first: the lookup table is shipped ONCE per worker — pass either a
plain dict (serialized into the actor task spec) or a ``ray.ObjectRef`` from
``ray.put`` (fetched zero-copy from the local object store in ``__init__``,
never re-shipped per batch).  Use as::

    ref = ray.put(lookup)        # once, on the driver
    ds.map_batches(Enrich, fn_constructor_kwargs=dict(lookup=ref, key="source"),
                   batch_format="pyarrow", concurrency=(2, 8))

Per batch the key column is dictionary-encoded first so the Python dict is
probed once per *unique* key (low-cardinality keys: ~20 probes per batch,
not one per row), then values are gathered with a vectorized ``take``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray


class Enrich:
    """Actor-pool map_batches callable adding lookup columns by key."""

    def __init__(
        self,
        lookup: "dict | ray.ObjectRef",
        key: str = "source",
        columns: list[str] | None = None,
        types: dict[str, pa.DataType] | None = None,
    ):
        if isinstance(lookup, ray.ObjectRef):
            lookup = ray.get(lookup)  # zero-copy from local object store
        self.lookup: dict[str, dict[str, str]] = lookup
        self.key = key
        if columns is None:
            first = next(iter(lookup.values()))
            columns = list(first.keys())
        self.columns = columns
        self.types = types or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        dict_arr = pc.dictionary_encode(keys)
        uniques = dict_arr.dictionary.to_pylist()
        indices = dict_arr.indices

        out = batch
        for col in self.columns:
            # one probe per unique key, then vectorized gather
            per_unique = pa.array(
                [self.lookup.get(u, {}).get(col) if u is not None else None for u in uniques],
                self.types.get(col, pa.string()),
            )
            out = out.append_column(col, per_unique.take(indices))
        return out


def enrich_dataset(
    ds,
    lookup: dict,
    key: str = "source",
    columns: list[str] | None = None,
    types: dict | None = None,
    concurrency=(1, 8),
    batch_size: int | None = None,
    use_actors: bool = False,
):
    """Attach the enrich stage to a Dataset.

    ``use_actors=False`` (default): the small lookup is embedded in a plain
    callable shipped with each task — no actor-pool spin-up, right for
    dictionary-sized tables.  ``use_actors=True``: actor pool with the table
    shipped once per actor via ``ray.put`` — right for big lookup tables
    (the k8s-informer-cache scale) where per-task serialization would hurt.
    """
    if not use_actors:
        fn = Enrich(lookup, key=key, columns=columns, types=types)
        return ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
        )
    ref = ray.put(lookup)
    return ds.map_batches(
        Enrich,
        fn_constructor_kwargs=dict(lookup=ref, key=key, columns=columns, types=types),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def resource_to_telemetry(ds, attr_col: str, resource_col: str):
    """pkg/resourcetotelemetry (resource_to_telemetry.go:49-112): copy
    every RESOURCE attribute into each datapoint's attribute map —
    ``PutEmpty`` overwrite semantics (an existing datapoint key keeps its
    position but takes the resource value; new resource keys append in
    resource-entry order). Applies uniformly to all five metric types —
    the Go switch fans out only because pdata has five datapoint slices.
    Block-local single vectorized pass (functions/maps.map_merge), zero
    shuffle."""
    from ..functions.maps import map_merge

    def apply(t: pa.Table) -> pa.Table:
        merged = map_merge(t.column(attr_col), t.column(resource_col))
        i = t.schema.get_field_index(attr_col)
        return t.set_column(i, attr_col, merged)

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)
