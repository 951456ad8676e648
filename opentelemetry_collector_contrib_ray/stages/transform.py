"""Transform / filter / attribute-action stages — transformprocessor,
filterprocessor and attributesprocessor analogs.

Reference semantics:

- transformprocessor executes an ordered OTTL statement list per record;
  each statement is ``editor(args) [where condition]``
  (pkg/ottl/parser.go:394-408 StatementSequence, processor/transformprocessor/
  internal/logs/processor.go:53-67).  Statements run SEQUENTIALLY — later
  statements see earlier mutations — so we compile the list to sequential
  column rewrites inside ONE ``map_batches`` callable (SURVEY.md §7.4).
- filterprocessor drops records where any condition matches
  (processor/filterprocessor/logs.go:41-99).
- attributesprocessor applies {insert, update, upsert, delete, hash,
  extract, convert} actions (internal/coreinternal/attraction/
  attraction.go:111-300) — expressed here as Transform statements.

Vectorization: a ``where`` clause becomes a boolean mask; a guarded ``set``
is one ``pc.if_else`` merge — never a row loop.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.converters import get_converter
from ..functions.expr import compile_condition


def _as_array(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


@dataclass
class C:
    """Converter call spec: C("ToUpperCase", "severity") or nested C args."""

    name: str
    args: tuple = ()

    def __init__(self, name: str, *args):
        self.name = name
        self.args = args

    def evaluate(self, table: pa.Table):
        fn = get_converter(self.name)
        vals = [_resolve(a, table) for a in self.args]
        return fn(*vals)


@dataclass
class Col:
    """Column reference in a statement value position."""

    name: str


def _resolve(value: Any, table: pa.Table):
    if isinstance(value, C):
        return value.evaluate(table)
    if isinstance(value, Col):
        return _as_array(table.column(value.name))
    if callable(value):
        return value(table)
    return value  # literal


@dataclass
class Statement:
    """One editor application: editor name, args, optional where condition."""

    editor: str
    args: tuple = ()
    where: str | None = None
    _cond: Any = field(default=None, repr=False)

    def __post_init__(self):
        if self.where is not None:
            self._cond = compile_condition(self.where)


_CACHE_TARGET_RE = re.compile(r'^cache\[\s*"([^"]+)"\s*\]$')


def _norm_target(name: str) -> str:
    """``cache["k"]`` as a SET target -> the scratch column ``cache.k``
    (the OTTL per-record cache path; see functions/expr.py _postfix)."""
    m = _CACHE_TARGET_RE.match(name)
    return f"cache.{m.group(1)}" if m else name


def set_(target: str, value, where: str | None = None) -> Statement:
    return Statement("set", (_norm_target(target), value), where)


def delete_keys(*cols: str, where: str | None = None) -> Statement:
    return Statement("delete_keys", cols, where)


def keep_keys(*cols: str) -> Statement:
    return Statement("keep_keys", cols)


def rename_key(old: str, new: str) -> Statement:
    return Statement("rename", (old, new))


def truncate_all(limit: int, columns: list[str] | None = None) -> Statement:
    return Statement("truncate_all", (limit, columns))


def replace_pattern(target: str, pattern: str, replacement: str,
                    where: str | None = None) -> Statement:
    return Statement("replace_pattern", (target, pattern, replacement), where)


def hash_attribute(target: str, algo: str = "sha256") -> Statement:
    """attributesprocessor hash action (SHA-256 of the value, attraction.go)."""
    return Statement("hash", (target, algo))


def unquote(target: str) -> Statement:
    """stanza unquote transformer: strip one layer of matching quotes."""
    return Statement("unquote", (target,))


def flatten_struct(target: str, prefix: str | None = None) -> Statement:
    """stanza flatten transformer: promote a struct column's fields to
    top-level columns ``{prefix}{field}`` (one-level flatten)."""
    return Statement("flatten", (target, prefix))


def assign_keys(targets: list[str], keys: list[str]) -> Statement:
    """stanza assign_keys: positional rename of a column list."""
    return Statement("assign_keys", (tuple(targets), tuple(keys)))


def merge_maps(source: str, strategy: str = "upsert") -> Statement:
    """OTTL merge_maps (pkg/ottl/ottlfuncs/func_merge_maps.go:40-45): merge a
    struct column's fields into the top-level columns. Per-row key presence
    maps to value validity: insert fills only where the target is null (or
    the column is absent), update overwrites only existing columns where the
    source field is valid, upsert does both."""
    if strategy not in ("insert", "update", "upsert"):
        raise ValueError(
            f"invalid merge_maps strategy {strategy!r}: must be "
            "'insert', 'update' or 'upsert'"
        )
    return Statement("merge_maps", (source, strategy))


def limit_keys(limit: int, priority_keys: tuple = ()) -> Statement:
    """OTTL limit (func_limit.go:36-47): keep at most ``limit`` columns —
    priority keys always survive, then first-seen order."""
    if limit < 0:
        raise ValueError(f"limit cannot be negative, got {limit}")
    if limit < len(priority_keys):
        raise ValueError(
            f"limit {limit} cannot be less than the number of priority "
            f"keys {len(priority_keys)}"
        )
    return Statement("limit", (limit, tuple(priority_keys)))


def delete_matching_keys(pattern: str) -> Statement:
    """OTTL delete_matching_keys (func_delete_matching_keys.go:36-51):
    drop columns whose NAME matches the regex."""
    import re

    re.compile(pattern)  # validate eagerly, like the reference factory
    return Statement("delete_matching_keys", (pattern,))


def keep_matching_keys(pattern: str) -> Statement:
    """OTTL keep_matching_keys: keep only columns whose NAME matches."""
    import re

    re.compile(pattern)
    return Statement("keep_matching_keys", (pattern,))


def map_delete_keys(target: str, pattern: str,
                    where: str | None = None) -> Statement:
    """OTTL delete_matching_keys over a MAP-TYPED column
    (func_delete_matching_keys.go:36-51): drop map ENTRIES whose key
    matches the regex (the flat-column variant above drops columns)."""
    import re

    re.compile(pattern)
    return Statement("map_delete_keys", (target, pattern), where)


def map_keep_keys(target: str, pattern: str,
                  where: str | None = None) -> Statement:
    """OTTL keep_matching_keys over a map-typed column."""
    import re

    re.compile(pattern)
    return Statement("map_keep_keys", (target, pattern), where)


def map_limit_keys(target: str, limit: int, priority_keys: tuple = (),
                   where: str | None = None) -> Statement:
    """OTTL limit over a map-typed column (func_limit.go:36-47): at most
    ``limit`` entries, priority keys first, original order preserved."""
    if limit < 0:
        raise ValueError(f"limit cannot be negative, got {limit}")
    if limit < len(priority_keys):
        raise ValueError(
            f"limit {limit} cannot be less than the number of priority "
            f"keys {len(priority_keys)}"
        )
    return Statement("map_limit_keys", (target, limit, tuple(priority_keys)),
                     where)


def append_to(target: str, value=None, values: tuple = ()) -> Statement:
    """OTTL append (func_append.go:36-41): target becomes a list with the
    given value(s) appended per row; a scalar target contributes its value
    as the first element, a null list target contributes nothing."""
    if value is None and not values:
        raise ValueError(
            "at least one of 'value' or 'values' must be provided"
        )
    vals = tuple(values) if value is None else (value,) + tuple(values)
    return Statement("append", (target, vals))


def replace_match(target: str, pattern: str, replacement: str,
                  where: str | None = None) -> Statement:
    """OTTL replace_match (func_replace_match.go:43-47): glob full-match on
    the value -> replace the WHOLE value."""
    return Statement("replace_match", (target, pattern, replacement), where)


def replace_all_matches(pattern: str, replacement: str) -> Statement:
    """OTTL replace_all_matches: replace_match over every string column."""
    return Statement("replace_all_matches", (pattern, replacement))


def replace_all_patterns(pattern: str, replacement: str) -> Statement:
    """OTTL replace_all_patterns: replace_pattern over every string column."""
    return Statement("replace_all_patterns", (pattern, replacement))


def _glob_to_regex(pattern: str) -> str:
    """Translate a glob (* ?) to an anchored RE2 regex (fnmatch dialect,
    no char classes — matching the gobwas/glob subset the reference uses)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append("\\" + ch if ch in r"\.^$+{}[]|()" else ch)
    return "^" + "".join(out) + "$"


def _elementwise_list_concat(segments: list, n: int) -> pa.Array:
    """Concatenate per-row segments into one list array, fully vectorized.

    Each segment is a pa.Array of length n: list-typed (contributes its
    elements; null rows contribute none) or flat (contributes one element,
    null included). One arrow ``take`` + numpy index arithmetic — no row
    loop.
    """
    import numpy as np

    lens_parts, vals_parts = [], []
    for seg in segments:
        seg = _as_array(seg)
        if pa.types.is_list(seg.type) or pa.types.is_large_list(seg.type):
            lens = pc.fill_null(pc.list_value_length(seg), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            vals_parts.append(seg.flatten())  # skips null rows' values
            lens_parts.append(lens)
        else:
            vals_parts.append(seg)
            lens_parts.append(np.ones(n, dtype=np.int64))

    # unify value types (appended literals cast to the first segment's type)
    common = vals_parts[0].type
    vals_parts = [v if v.type == common else v.cast(common) for v in vals_parts]

    row_lens = np.sum(lens_parts, axis=0)
    offsets = np.concatenate(([0], np.cumsum(row_lens)))
    total = int(offsets[-1])
    idx = np.empty(total, dtype=np.int64)
    pos = offsets[:-1].copy()
    base = 0
    for vals, lens in zip(vals_parts, lens_parts):
        part_total = int(lens.sum())
        if part_total:
            starts_rel = np.concatenate(([0], np.cumsum(lens)[:-1]))
            within = np.arange(part_total) - np.repeat(starts_rel, lens)
            dest = np.repeat(pos, lens) + within
            idx[dest] = base + np.arange(part_total)
        pos += lens
        base += len(vals)
    flat = pa.concat_arrays([_as_array(v) for v in vals_parts]).take(
        pa.array(idx, pa.int64())
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)


class Transform:
    """map_batches callable executing an ordered statement list per batch.

    ``error_mode`` follows the transformprocessor statement-group modes
    (processor/transformprocessor README "error_mode" /
    pkg/ottl/parser.go error handling): ``propagate`` re-raises a failing
    statement (fails the task), ``ignore`` logs the error and continues
    with the next statement, ``silent`` continues without logging. The unit
    of failure here is a statement×batch (the batch engine's record-set
    analog of the reference's per-record evaluation)."""

    def __init__(self, statements: list[Statement],
                 error_mode: str = "propagate"):
        if error_mode not in ("propagate", "ignore", "silent"):
            raise ValueError(
                f"error_mode must be propagate|ignore|silent, got {error_mode!r}"
            )
        self.statements = statements
        self.error_mode = error_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        for st in self.statements:
            try:
                batch = self._apply(batch, st)
            except Exception as e:  # noqa: BLE001
                if self.error_mode == "propagate":
                    raise
                if self.error_mode == "ignore":
                    import logging

                    logging.getLogger(__name__).warning(
                        "statement %s failed (%s); continuing (error_mode="
                        "ignore)", st.editor, e
                    )
        # the OTTL scratch cache lives only for the statement sequence
        # (ottllog/log.go:182): set_('cache["k"]', ...) writes cache.k,
        # later statements read it, nothing leaves the stage — the
        # cache.* column namespace is reserved for this
        scratch = [c for c in batch.column_names
                   if c == "cache" or c.startswith("cache.")]
        if scratch:
            batch = batch.drop_columns(scratch)
        return batch

    def _apply(self, batch: pa.Table, st: Statement) -> pa.Table:
        mask = st._cond(batch) if st._cond is not None else None
        ed = st.editor

        if ed == "set":
            target, value = st.args
            new = _resolve(value, batch)
            if not isinstance(new, (pa.Array, pa.ChunkedArray)):
                typ = pa.scalar(new).type if new is not None else pa.string()
                new = pa.array([new] * batch.num_rows, typ)
            new = _as_array(new)
            if target in batch.column_names:
                if mask is not None:
                    old = _as_array(batch.column(target))
                    new = pc.if_else(mask, new.cast(old.type), old)
                i = batch.column_names.index(target)
                return batch.set_column(i, target, new)
            if mask is not None:
                new = pc.if_else(mask, new, pa.nulls(batch.num_rows, new.type))
            return batch.append_column(target, new)

        if ed == "delete_keys":
            cols = [c for c in st.args if c in batch.column_names]
            return batch.drop_columns(cols)

        if ed == "keep_keys":
            return batch.select([c for c in st.args if c in batch.column_names])

        if ed == "rename":
            old, new = st.args
            names = [new if n == old else n for n in batch.column_names]
            return batch.rename_columns(names)

        if ed in ("map_delete_keys", "map_keep_keys", "map_limit_keys"):
            from ..functions import maps as _maps

            target = st.args[0]
            i = batch.column_names.index(target)
            col = batch.column(target)
            if ed == "map_delete_keys":
                new = _maps.map_delete_matching_keys(col, st.args[1],
                                                     row_mask=mask)
            elif ed == "map_keep_keys":
                new = _maps.map_keep_matching_keys(col, st.args[1],
                                                   row_mask=mask)
            else:
                new = _maps.map_limit(col, st.args[1], st.args[2],
                                      row_mask=mask)
            return batch.set_column(i, target, new)

        if ed == "truncate_all":
            limit, columns = st.args
            cols = columns or [
                f.name for f in batch.schema if pa.types.is_string(f.type)
            ]
            for cname in cols:
                i = batch.column_names.index(cname)
                sliced = pc.utf8_slice_codeunits(batch.column(i), 0, limit)
                batch = batch.set_column(i, cname, _as_array(sliced))
            return batch

        if ed == "replace_pattern":
            target, pattern, replacement = st.args
            i = batch.column_names.index(target)
            old = _as_array(batch.column(i))
            new = _as_array(pc.replace_substring_regex(old, pattern, replacement))
            if mask is not None:
                new = pc.if_else(mask, new, old)
            return batch.set_column(i, target, new)

        if ed == "hash":
            target, algo = st.args
            i = batch.column_names.index(target)
            hashed = get_converter(algo)(batch.column(i))
            return batch.set_column(i, target, _as_array(hashed))

        if ed == "unquote":
            (target,) = st.args
            i = batch.column_names.index(target)
            col = _as_array(batch.column(i))
            col = pc.replace_substring_regex(col, r'^"(.*)"$', r"\1")
            col = pc.replace_substring_regex(col, r"^'(.*)'$", r"\1")
            return batch.set_column(i, target, _as_array(col))

        if ed == "flatten":
            target, prefix = st.args
            i = batch.column_names.index(target)
            col = _as_array(batch.column(i))
            batch = batch.remove_column(i)
            pre = prefix if prefix is not None else ""
            for field in col.type:
                batch = batch.append_column(
                    f"{pre}{field.name}", pc.struct_field(col, field.name)
                )
            return batch

        if ed == "assign_keys":
            targets, keys = st.args
            mapping = dict(zip(targets, keys))
            return batch.rename_columns(
                [mapping.get(n, n) for n in batch.column_names]
            )

        if ed == "merge_maps":
            source, strategy = st.args
            src = _as_array(batch.column(source))
            for f in src.type:
                vals = _as_array(pc.struct_field(src, f.name))
                if f.name in batch.column_names:
                    i = batch.column_names.index(f.name)
                    tgt = _as_array(batch.column(i))
                    sv, tv = pc.is_valid(vals), pc.is_valid(tgt)
                    if strategy == "insert":
                        # fill only rows where the target key is absent
                        merged = pc.if_else(tv, tgt, vals.cast(tgt.type))
                    elif strategy == "update":
                        merged = pc.if_else(
                            pc.and_(sv, tv), vals.cast(tgt.type), tgt
                        )
                    else:  # upsert
                        merged = pc.if_else(sv, vals.cast(tgt.type), tgt)
                    batch = batch.set_column(i, f.name, merged)
                elif strategy in ("insert", "upsert"):
                    batch = batch.append_column(f.name, vals)
            return batch

        if ed == "limit":
            limit, priority = st.args
            if batch.num_columns <= limit:
                return batch
            keep = [c for c in priority if c in batch.column_names]
            for c in batch.column_names:
                if len(keep) >= limit:
                    break
                if c not in keep:
                    keep.append(c)
            # preserve original column order like the reference map
            ordered = [c for c in batch.column_names if c in set(keep)]
            return batch.select(ordered)

        if ed == "delete_matching_keys":
            import re

            (pattern,) = st.args
            rx = re.compile(pattern)
            return batch.drop_columns(
                [c for c in batch.column_names if rx.search(c)]
            )

        if ed == "keep_matching_keys":
            import re

            (pattern,) = st.args
            rx = re.compile(pattern)
            return batch.select(
                [c for c in batch.column_names if rx.search(c)]
            )

        if ed == "append":
            target, values = st.args
            segments = []
            if target in batch.column_names:
                segments.append(_as_array(batch.column(target)))
            for v in values:
                r = _resolve(v, batch)
                if not isinstance(r, (pa.Array, pa.ChunkedArray)):
                    r = pa.array([r] * batch.num_rows)
                segments.append(r)
            new = _elementwise_list_concat(segments, batch.num_rows)
            if target in batch.column_names:
                i = batch.column_names.index(target)
                return batch.set_column(i, target, new)
            return batch.append_column(target, new)

        if ed == "replace_match":
            target, pattern, replacement = st.args
            i = batch.column_names.index(target)
            old = _as_array(batch.column(i))
            hit = pc.fill_null(
                pc.match_substring_regex(old, _glob_to_regex(pattern)), False
            )
            if mask is not None:
                hit = pc.and_(hit, mask)
            new = pc.if_else(hit, pa.scalar(replacement, old.type), old)
            return batch.set_column(i, target, _as_array(new))

        if ed in ("replace_all_matches", "replace_all_patterns"):
            pattern, replacement = st.args
            rx = (_glob_to_regex(pattern) if ed == "replace_all_matches"
                  else pattern)
            for i, f in enumerate(batch.schema):
                if not pa.types.is_string(f.type):
                    continue
                old = _as_array(batch.column(i))
                if ed == "replace_all_matches":
                    hit = pc.fill_null(pc.match_substring_regex(old, rx), False)
                    new = pc.if_else(hit, pa.scalar(replacement, old.type), old)
                else:
                    new = pc.replace_substring_regex(old, rx, replacement)
                batch = batch.set_column(i, f.name, _as_array(new))
            return batch

        raise ValueError(f"unknown editor {ed!r}")


class Filter:
    """map_batches callable keeping rows where the condition holds.

    ``drop_matches=True`` inverts (filterprocessor drops matches;
    stanza filter transformer keeps non-matching entries).

    ``drop_ratio`` ∈ [0,1] with ``ratio_key``: only that fraction of
    matching rows is dropped — the stanza filter transformer's probabilistic
    drop (pkg/stanza/operator/transformer/filter/config.go:46,62), but
    DETERMINISTIC: the draw is ``md5(key) % 10000 < ratio*10000`` instead of
    an RNG, so reruns and the oracle reproduce the exact row set.
    """

    def __init__(self, condition: str, drop_matches: bool = False,
                 drop_ratio: float = 1.0, ratio_key: str | None = None):
        self.condition = compile_condition(condition)
        self.drop_matches = drop_matches
        if drop_ratio < 1.0 and ratio_key is None:
            raise ValueError("drop_ratio < 1 requires ratio_key")
        self.drop_ratio_bp = int(round(drop_ratio * 10_000))
        self.ratio_key = ratio_key

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self.condition(batch)  # True = match
        if self.drop_ratio_bp < 10_000:
            from ..functions.hashing import md5_u64_col
            import numpy as np

            drawn = pa.array(
                (md5_u64_col(batch.column(self.ratio_key))
                 % np.uint64(10_000)) < self.drop_ratio_bp
            )
            mask = pc.and_(mask, drawn)  # match "sticks" only for drawn rows
        if self.drop_matches:
            mask = pc.invert(mask)
        return batch.filter(mask)


def filter_dataset(ds, condition: str, drop_matches: bool = False,
                   drop_ratio: float = 1.0, ratio_key: str | None = None):
    return ds.map_batches(
        Filter(condition, drop_matches=drop_matches,
               drop_ratio=drop_ratio, ratio_key=ratio_key),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def round_robin_split(ds, n: int):
    """roundrobinconnector analog: uniform split into n pipelines
    (connector/roundrobinconnector) — ``Dataset.split`` preserves rows,
    balances blocks."""
    return ds.split(n, equal=True)


def transform_dataset(ds, statements: list[Statement]):
    return ds.map_batches(
        Transform(statements), batch_format="pyarrow", zero_copy_batch=True
    )
