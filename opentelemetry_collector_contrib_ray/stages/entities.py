"""pkg/experimentalmetricmetadata — entity events + metadata deltas.

Reference: ``pkg/experimentalmetricmetadata/entity_events.go:14-212`` —
entity state/delete events ride inside log records under the
``otel.entity.*`` semconv attributes, with the scope marked
``otel.entity.event_as_log = true`` (ConvertAndMoveToLogs:62-75); the
interval is stored as integer MILLISECONDS (SetInterval:181). And
``metadata.go:38-59`` — ``MetadataDelta`` describes a resource's
metadata change between two revisions as add/remove/update key sets
(k8sclusterreceiver's metadata feed to MetadataExporters).

Both are block-local vectorized passes (functions/maps machinery),
zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EVENT_TYPE_ATTR = "otel.entity.event.type"
EVENT_STATE = "entity_state"
EVENT_DELETE = "entity_delete"
SCOPE_MARKER = "otel.entity.event_as_log"


def entity_events_to_logs(ds, event_col: str = "event",
                          entity_type_col: str = "entity_type",
                          id_col: str = "entity_id",
                          attrs_col: str = "entity_attrs",
                          interval_ms_col: str | None = "interval_ms",
                          ts_col: str = "time_unix_nano"):
    """Encode entity events as flat log rows (entity_events.go:62-75 +
    the accessor semantics): ``otel.entity.event.type`` is
    ``entity_state``/``entity_delete`` from ``event_col``; state rows
    carry the attributes map and the int-milliseconds interval, delete
    rows carry neither (EntityDeleteDetails exposes only id + type); the
    constant ``scope_entity_event_as_log`` marker column mirrors the
    scope attribute set by ConvertAndMoveToLogs."""

    from ..functions.maps import _map_parts, _rebuild

    def encode(t: pa.Table) -> pa.Table:
        ev = t.column(event_col)
        is_state = pc.equal(ev, "state")
        etype_val = pc.if_else(is_state, pa.scalar(EVENT_STATE),
                               pa.scalar(EVENT_DELETE))
        n = t.num_rows
        state_np = pc.fill_null(is_state, False).to_numpy(
            zero_copy_only=False)
        if attrs_col in t.column_names:
            # delete rows drop their attributes map (if_else has no map
            # kernel — entry-mask rebuild instead)
            col, lens, keys, items, nulls = _map_parts(t.column(attrs_col))
            keep = np.repeat(state_np, lens)
            attrs = _rebuild(lens, keep, keys, items, nulls, col.type)
        else:
            attrs = pa.array([[]] * n, pa.map_(pa.string(), pa.string()))
        cols = {
            "time_unix_nano": t.column(ts_col),
            EVENT_TYPE_ATTR: etype_val,
            "otel.entity.type": t.column(entity_type_col),
            "otel.entity.id": t.column(id_col),
            "otel.entity.attributes": attrs,
            "scope_entity_event_as_log": pa.array(
                np.ones(n, dtype=bool)),
        }
        if interval_ms_col is not None and interval_ms_col in t.column_names:
            cols["otel.entity.interval"] = pc.if_else(
                is_state, pc.cast(t.column(interval_ms_col), pa.int64()),
                pa.scalar(None, pa.int64()))
        passthrough = [c for c in t.column_names
                       if c not in (event_col, entity_type_col, id_col,
                                    attrs_col, interval_ms_col, ts_col)]
        for c in passthrough:
            cols[c] = t.column(c)
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def metadata_delta(ds, old_col: str, new_col: str,
                   prefix: str = "metadata_to_"):
    """Append ``<prefix>add`` / ``<prefix>remove`` / ``<prefix>update``
    map columns — the MetadataDelta of ``new_col`` vs ``old_col``
    (metadata.go:38-48, including the documented example's semantics:
    removed entries keep their OLD value, updated entries carry the NEW
    one)."""
    from ..functions.maps import map_diff

    def apply(t: pa.Table) -> pa.Table:
        added, removed, updated = map_diff(t.column(old_col),
                                           t.column(new_col))
        t = t.append_column(prefix + "add", added)
        t = t.append_column(prefix + "remove", removed)
        return t.append_column(prefix + "update", updated)

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)
