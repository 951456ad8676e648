"""Multiline merge — the stanza ``recombine`` transformer analog.

Reference semantics (pkg/stanza/operator/transformer/recombine/
transformer.go:29-60, config.go:46-91): buffer consecutive entries PER
SOURCE (default key = log.file.path) until ``is_first_entry`` (marks the
start of a new combined record — flush the buffer first) or
``is_last_entry`` (marks the end — flush including this entry) fires; the
``combine_field`` values are joined with ``combine_with``; bounded by
``max_batch_size``.

Order-sensitive: depends on per-source ordering (one goroutine per file in
the reference).  Batch reformulation: ``groupby(source_key).map_groups``
with an explicit in-group sort on ``order_cols`` — within-shard order made
explicit instead of implicit read order (SURVEY.md §4 "Ordering" row).
"""

from __future__ import annotations

import pandas as pd

from ..functions.expr import compile_condition


class Recombine:
    """Group-level merge function for ``groupby(key).map_groups``.

    Output: one row per combined record with the group key, ``combine_field``
    joined by ``combine_with``, ``n_merged``, and first/last of order cols.
    """

    def __init__(
        self,
        source_key: str,
        order_cols: list[str],
        combine_field: str,
        combine_with: str = "\n",
        is_first_entry: str | None = None,
        is_last_entry: str | None = None,
        max_batch_size: int = 1000,
        first_cols: list[str] | None = None,
    ):
        if (is_first_entry is None) == (is_last_entry is None):
            raise ValueError("exactly one of is_first_entry / is_last_entry required")
        self.source_key = source_key
        self.order_cols = order_cols
        self.combine_field = combine_field
        self.combine_with = combine_with
        self.first_cond = compile_condition(is_first_entry) if is_first_entry else None
        self.last_cond = compile_condition(is_last_entry) if is_last_entry else None
        self.max_batch_size = max_batch_size
        self.first_cols = first_cols or []

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        group = group.sort_values(self.order_cols, kind="mergesort").reset_index(drop=True)
        tbl = pa.Table.from_pandas(group, preserve_index=False)
        if self.first_cond is not None:
            marks = self.first_cond(tbl).to_pylist()
        else:
            marks = self.last_cond(tbl).to_pylist()

        records = []
        buf: list[int] = []

        def flush():
            if not buf:
                return
            rows = group.iloc[buf]
            rec = {self.source_key: rows[self.source_key].iloc[0]}
            for c in self.first_cols:
                rec[c] = rows[c].iloc[0]
            rec["combined"] = self.combine_with.join(
                "" if v is None else str(v) for v in rows[self.combine_field]
            )
            rec["n_merged"] = len(rows)
            records.append(rec)
            buf.clear()

        for i in range(len(group)):
            if self.first_cond is not None:
                if marks[i]:
                    flush()  # new record starts here; previous buffer flushes
                buf.append(i)
            else:
                buf.append(i)
                if marks[i]:
                    flush()  # record ends with this entry
            if len(buf) >= self.max_batch_size:
                flush()
        flush()
        return pd.DataFrame(records)


def recombine(ds, **kwargs):
    rec = Recombine(**kwargs)

    def recombine_group(group: pd.DataFrame) -> pd.DataFrame:
        return rec(group)

    return ds.groupby(kwargs["source_key"]).map_groups(
        recombine_group, batch_format="pandas"
    )
