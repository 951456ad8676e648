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


def set_(target: str, value, where: str | None = None) -> Statement:
    return Statement("set", (target, value), where)


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


class Transform:
    """map_batches callable executing an ordered statement list per batch."""

    def __init__(self, statements: list[Statement]):
        self.statements = statements

    def __call__(self, batch: pa.Table) -> pa.Table:
        for st in self.statements:
            batch = self._apply(batch, st)
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
            from ..functions.hashing import md5_u64_many
            import numpy as np

            keys = batch.column(self.ratio_key).cast(pa.string()).to_pylist()
            drawn = pa.array(
                (md5_u64_many(keys) % np.uint64(10_000)) < self.drop_ratio_bp
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
