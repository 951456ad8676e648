"""Vectorized operations over map<k,v>-typed columns.

The flat-column corpus maps OTTL's ``attributes`` map to top-level columns
(so the §2.5 editors operate on column names); real OTLP payloads carry
map-typed attribute columns too. These helpers give the same editors over
an actual Arrow MapArray, fully vectorized over the flattened entry
children — no per-row Python:

- :func:`map_from_columns` — build a map column from flat columns (one
  ``concat + take`` interleave, no row loop);
- :func:`map_delete_matching_keys` / :func:`map_keep_matching_keys` —
  OTTL func_delete_matching_keys.go:36-51 over the entry keys;
- :func:`map_limit` — OTTL func_limit.go:36-47: at most ``n`` entries per
  row, priority keys first, then original entry order.

All rebuilds share one shape: an entry-level keep mask → per-row kept
counts via ``np.add.reduceat`` → new offsets → ``MapArray.from_arrays``
on the filtered children. Null rows round-trip as null (offset-mask
encoding). Offset-aware: children are read through ``flatten()``-style
slices, so zero-copy sliced batches are safe (ADVICE r2 hazard class).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _map_parts(col):
    """(normalized MapArray, per-row entry counts int64, flat keys, flat
    items, null-row mask). Handles ChunkedArray and sliced arrays."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_map(col.type):
        raise ValueError(f"expected a map column, got {col.type}")
    if col.offset != 0:
        # normalize a sliced array: .keys/.items of a slice can expose the
        # full child; a take() rebuilds compact offsets
        col = col.take(pa.array(np.arange(len(col), dtype=np.int64)))
    # list_value_length has no map kernel in this pyarrow; diff the offsets
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(off)
    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    return col, lens, col.keys, col.items, nulls


def _rebuild(lens: np.ndarray, keep: np.ndarray, keys, items,
             nulls: np.ndarray, map_type: pa.DataType) -> pa.MapArray:
    """Filtered MapArray from an entry-level keep mask (null rows stay
    null via the offsets validity-mask encoding)."""
    row_off = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    # reduceat over NONEMPTY segments only: empty segments would duplicate
    # the next segment's sum, and clipping their offsets would corrupt the
    # previous segment's range instead
    nz = lens > 0
    new_cnt = np.zeros(len(lens), dtype=np.int64)
    if nz.any():
        new_cnt[nz] = np.add.reduceat(keep.astype(np.int64), row_off[nz])
    offsets = np.concatenate(([0], np.cumsum(new_cnt))).astype(np.int32)
    keep_pa = pa.array(keep)
    out = pa.MapArray.from_arrays(
        pa.array(offsets, pa.int32()),
        keys.filter(keep_pa), items.filter(keep_pa), type=map_type)
    if nulls.any():
        # a null-masked OFFSETS buffer corrupts the adjacent list's
        # boundary; inject null rows with a take on a null-masked index
        idx = pa.array(np.arange(len(lens), dtype=np.int64), pa.int64(),
                       mask=nulls)
        out = out.take(idx)
    return out


def map_from_columns(batch: pa.Table, fields: dict[str, str]) -> pa.MapArray:
    """map<string, string> column from flat columns: ``fields`` maps entry
    key -> source column name. One interleave ``take`` builds the child;
    source nulls become absent entries (OTTL maps have no null values)."""
    n = batch.num_rows
    k = len(fields)
    cols = []
    for name in fields.values():
        c = batch.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(c.cast(pa.string()))
    perm = np.empty(n * k, dtype=np.int64)
    for j in range(k):
        perm[j::k] = np.arange(n) + j * n
    items = pa.concat_arrays(cols).take(pa.array(perm))
    keys = pa.array(list(fields.keys()) * n, pa.string())
    present = pc.is_valid(items).to_numpy(zero_copy_only=False)
    lens = np.full(n, k, dtype=np.int64)
    return _rebuild(lens, present, keys, items,
                    np.zeros(n, dtype=bool),
                    pa.map_(pa.string(), pa.string()))


def _row_mask_to_entries(row_mask, lens: np.ndarray) -> np.ndarray:
    """Expand a per-ROW boolean mask to the flat entry level (None -> all
    rows selected); null mask values count as NOT selected (OTTL where)."""
    if row_mask is None:
        return np.ones(int(lens.sum()), dtype=bool)
    if isinstance(row_mask, (pa.Array, pa.ChunkedArray)):
        if isinstance(row_mask, pa.ChunkedArray):
            row_mask = row_mask.combine_chunks()
        row_mask = pc.fill_null(row_mask, False).to_numpy(
            zero_copy_only=False)
    return np.repeat(np.asarray(row_mask, dtype=bool), lens)


def map_delete_matching_keys(col, pattern: str,
                             row_mask=None) -> pa.MapArray:
    """Drop entries whose KEY matches the regex (func_delete_matching_keys
    semantics, applied to a map column). ``row_mask`` (a per-row boolean,
    the statement's ``where``) limits the edit to selected rows."""
    col, lens, keys, items, nulls = _map_parts(col)
    hit = pc.match_substring_regex(keys, pattern).to_numpy(
        zero_copy_only=False)
    sel = _row_mask_to_entries(row_mask, lens)
    return _rebuild(lens, ~(hit & sel), keys, items, nulls, col.type)


def map_keep_matching_keys(col, pattern: str,
                           row_mask=None) -> pa.MapArray:
    """Keep only entries whose KEY matches the regex (rows outside
    ``row_mask`` keep all their entries)."""
    col, lens, keys, items, nulls = _map_parts(col)
    hit = pc.match_substring_regex(keys, pattern).to_numpy(
        zero_copy_only=False)
    sel = _row_mask_to_entries(row_mask, lens)
    return _rebuild(lens, hit | ~sel, keys, items, nulls, col.type)


def map_limit(col, n: int, priority_keys: tuple = (),
              row_mask=None) -> pa.MapArray:
    """At most ``n`` entries per row: priority keys survive first, then
    first-seen order; kept entries keep their ORIGINAL order
    (func_limit.go:36-47). Rows outside ``row_mask`` are left intact."""
    if n < 0:
        raise ValueError(f"limit cannot be negative, got {n}")
    if n < len(priority_keys):
        raise ValueError(
            f"limit {n} cannot be less than the number of priority keys "
            f"{len(priority_keys)}"
        )
    col, lens, keys, items, nulls = _map_parts(col)
    total = int(lens.sum())
    if total == 0:
        return col
    row_idx = np.repeat(np.arange(len(lens)), lens)
    pos = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    prio = np.full(total, len(priority_keys), dtype=np.int64)
    for rank, pk in enumerate(priority_keys):
        m = pc.equal(keys, pk).to_numpy(zero_copy_only=False)
        prio[m] = rank
    # within-row rank under (priority, original position)
    order = np.lexsort((pos, prio, row_idx))
    row_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
    within = np.arange(total) - np.repeat(row_off, lens)
    rank_sorted = within  # after the stable lexsort, rows are contiguous
    keep = np.zeros(total, dtype=bool)
    keep[order] = rank_sorted < n
    keep |= ~_row_mask_to_entries(row_mask, lens)  # unselected rows intact
    return _rebuild(lens, keep, keys, items, nulls, col.type)


def map_rename_keys(col, mapping: dict[str, str], row_mask=None):
    """Rename entry KEYS per ``mapping`` (old -> new), vectorized over the
    flat key child: one ``index_in`` + ``take`` + ``if_else`` per call, no
    row loop. Entries whose key is absent from ``mapping`` — and every
    entry of rows outside ``row_mask`` — are untouched. This is the
    schemaprocessor's attribute-rename Migrator applied to a map column
    (processor/schemaprocessor/internal/migrate/attributes.go semantics:
    a plain old->new key substitution, values untouched)."""
    col, lens, keys, items, nulls = _map_parts(col)
    if not mapping or int(lens.sum()) == 0:
        return col
    old = pa.array(list(mapping.keys())).cast(keys.type)
    new = pa.array(list(mapping.values())).cast(keys.type)
    repl = pc.take(new, pc.index_in(keys, value_set=old))
    cond = pc.is_valid(repl)
    sel = _row_mask_to_entries(row_mask, lens)
    if not sel.all():
        cond = pc.and_(cond, pa.array(sel))
    new_keys = pc.if_else(cond, repl, keys)
    # identity keep-mask: same offsets, nulls re-injected by _rebuild
    return _rebuild(lens, np.ones(len(new_keys), dtype=bool), new_keys,
                    items, nulls, col.type)


def map_merge(to_col, from_col) -> pa.MapArray:
    """Merge ``from_col`` entries into ``to_col`` row-wise with the
    pcommon.Map ``PutEmpty`` overwrite semantics of
    pkg/resourcetotelemetry/resource_to_telemetry.go:107-112
    (joinAttributeMaps): for each ``from`` entry, an existing ``to`` key
    keeps its ORIGINAL position but takes the ``from`` value; new keys
    append in ``from`` entry order. Fully vectorized: one
    dictionary-encode over both key children, (row, code) int64 packing,
    searchsorted match, one interleaving lexsort — no row loop.

    Null rows: a null/empty ``from`` row leaves ``to`` untouched; a null
    ``to`` row is treated as an empty map (output null only when both
    sides are null). Assumes unique keys per row on both sides (an OTLP
    map invariant).
    """
    to_col, to_lens, to_keys, to_items, to_nulls = _map_parts(to_col)
    from_col, fr_lens, fr_keys, fr_items, fr_nulls = _map_parts(from_col)
    n = len(to_lens)
    if len(fr_lens) != n:
        raise ValueError("map_merge: column length mismatch")
    fr_items = fr_items.cast(to_items.type)
    fr_keys = fr_keys.cast(to_keys.type)
    tot_to, tot_fr = int(to_lens.sum()), int(fr_lens.sum())
    if tot_fr == 0:
        return to_col
    # (row, key-code) ids over one shared dictionary
    both = pa.concat_arrays([to_keys, fr_keys]).dictionary_encode()
    codes = both.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(both.dictionary)
    to_row = np.repeat(np.arange(n, dtype=np.int64), to_lens)
    fr_row = np.repeat(np.arange(n, dtype=np.int64), fr_lens)
    to_ids = to_row * k + codes[:tot_to]
    fr_ids = fr_row * k + codes[tot_to:]
    fr_order = np.argsort(fr_ids, kind="stable")
    fr_sorted = fr_ids[fr_order]
    # to-entries whose key exists in the same row of `from`
    pos = np.searchsorted(fr_sorted, to_ids)
    pos_c = np.minimum(pos, len(fr_sorted) - 1)
    matched = fr_sorted[pos_c] == to_ids
    match_src = fr_order[pos_c]  # from-entry index supplying the value
    # from-entries NOT present in `to` (these append)
    to_sorted = np.sort(to_ids)
    ins = np.searchsorted(to_sorted, fr_ids)
    ins_c = np.minimum(ins, max(len(to_sorted) - 1, 0))
    fr_new = (len(to_sorted) == 0) | (to_sorted[ins_c] != fr_ids)
    # gather items: to entries take from's value when matched
    item_idx = np.arange(tot_to, dtype=np.int64)
    item_idx[matched] = tot_to + match_src[matched]
    all_items = pa.concat_arrays([to_items, fr_items])
    out_keys = pa.concat_arrays([to_keys, fr_keys.filter(pa.array(fr_new))])
    out_items = pa.concat_arrays([
        all_items.take(pa.array(item_idx)),
        fr_items.filter(pa.array(fr_new)),
    ])
    # interleave: to entries first (original order), appended after
    app_row = fr_row[fr_new]
    within = np.arange(tot_fr, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(fr_lens)[:-1])), fr_lens)
    seq = np.concatenate([
        np.arange(tot_to, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(to_lens)[:-1])), to_lens),
        within[fr_new] + np.repeat(to_lens, fr_lens)[fr_new],
    ])
    rows = np.concatenate([to_row, app_row])
    order = np.lexsort((seq, rows))
    new_lens = to_lens + np.bincount(app_row, minlength=n).astype(np.int64)
    out_nulls = to_nulls & fr_nulls
    return _rebuild(new_lens, np.ones(len(rows), dtype=bool),
                    out_keys.take(pa.array(order)),
                    out_items.take(pa.array(order)),
                    out_nulls, to_col.type)


def map_diff(old_col, new_col):
    """Per-row map delta with the pkg/experimentalmetricmetadata
    ``MetadataDelta`` semantics (metadata.go:38-48): returns
    ``(added, removed, updated)`` map arrays where *added* holds keys
    present only in ``new`` (new-entry order), *removed* keys present
    only in ``old`` with their OLD values (old-entry order), and
    *updated* keys present in both whose value changed, carrying the NEW
    value. Same vectorized shape as :func:`map_merge` (shared
    dictionary-encode, (row, code) packing, searchsorted matches); null
    rows are treated as empty maps and come back empty.
    """
    old_col, o_lens, o_keys, o_items, _ = _map_parts(old_col)
    new_col, n_lens, n_keys, n_items, _ = _map_parts(new_col)
    n = len(o_lens)
    if len(n_lens) != n:
        raise ValueError("map_diff: column length mismatch")
    o_items_c = o_items.cast(n_items.type)
    tot_o, tot_n = int(o_lens.sum()), int(n_lens.sum())
    both = pa.concat_arrays(
        [o_keys.cast(pa.string()), n_keys.cast(pa.string())]
    ).dictionary_encode()
    codes = both.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    k = max(len(both.dictionary), 1)
    o_row = np.repeat(np.arange(n, dtype=np.int64), o_lens)
    n_row = np.repeat(np.arange(n, dtype=np.int64), n_lens)
    o_ids = o_row * k + codes[:tot_o]
    n_ids = n_row * k + codes[tot_o:]
    o_order = np.argsort(o_ids, kind="stable")
    o_sorted = o_ids[o_order]
    # match each new entry to the old entry with the same (row, key)
    if tot_o == 0:
        in_old = np.zeros(tot_n, dtype=bool)
        match_old = np.zeros(tot_n, dtype=np.int64)
    else:
        pos_c = np.minimum(np.searchsorted(o_sorted, n_ids),
                           len(o_sorted) - 1)
        in_old = o_sorted[pos_c] == n_ids
        match_old = o_order[pos_c]
    # old entries present in new
    if tot_n == 0:
        in_new = np.zeros(tot_o, dtype=bool)
    else:
        n_sorted = np.sort(n_ids)
        ins_c = np.minimum(np.searchsorted(n_sorted, o_ids),
                           len(n_sorted) - 1)
        in_new = n_sorted[ins_c] == o_ids

    added = in_old == False  # noqa: E712 — numpy elementwise
    removed = in_new == False  # noqa: E712
    # updated: in both, value differs (string compare on the item child)
    if tot_o == 0 or tot_n == 0:
        updated = np.zeros(tot_n, dtype=bool)
    else:
        old_vals = o_items_c.take(pa.array(np.where(in_old, match_old, 0)))
        same = pc.fill_null(pc.equal(n_items, old_vals), False).to_numpy(
            zero_copy_only=False)
        updated = in_old & ~same

    def build(mask, row, keys, items, item_type):
        lens = np.bincount(row[mask], minlength=n).astype(np.int64)
        m = pa.array(mask)
        return _rebuild(lens, np.ones(int(mask.sum()), dtype=bool),
                        keys.filter(m), items.filter(m),
                        np.zeros(n, dtype=bool),
                        pa.map_(pa.string(), item_type))

    return (
        build(added, n_row, n_keys.cast(pa.string()), n_items,
              n_items.type),
        build(removed, o_row, o_keys.cast(pa.string()), o_items,
              o_items.type),
        build(updated, n_row, n_keys.cast(pa.string()), n_items,
              n_items.type),
    )
