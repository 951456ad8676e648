"""Text-line file source — the filelog receiver / stanza split-func analog.

Reference semantics (pkg/stanza/fileconsumer/file.go:44-176 +
pkg/stanza/split/split.go:17-21,142): glob-match files, read each to end,
tokenize into entries by a split function — newline (default),
``line_start_pattern`` (a new entry begins where the pattern matches) or
``line_end_pattern``.

Ray-Data-first: ``ray.data.read_text`` handles the newline split natively
(one read task per file, per-file order preserved within a block sequence);
multiline regrouping composes the :class:`~..stages.recombine.Recombine`
stage keyed on the source file (``include_paths=True``), which makes the
per-file ordering assumption explicit instead of goroutine-implicit.
Checkpoint/resume is the lineage manifest (state/lineage.py), the
fingerprint+offset store analog.
"""

from __future__ import annotations

import ray.data


def read_lines(paths: "str | list[str]", include_path: bool = True) -> ray.data.Dataset:
    """Read newline-split log lines; ``path`` column identifies the source file."""
    ds = ray.data.read_text(paths, include_paths=include_path)
    if include_path:
        ds = ds.map_batches(
            lambda t: t.rename_columns(
                ["raw" if c == "text" else ("source_file" if c == "path" else c)
                 for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    else:
        ds = ds.map_batches(
            lambda t: t.rename_columns(
                ["raw" if c == "text" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return ds


def read_multiline(
    paths: "str | list[str]",
    line_start_pattern: str | None = None,
    line_end_pattern: str | None = None,
    combine_with: str = "\n",
    order_col: str = "_line_no",
):
    """Multiline entries: lines are regrouped per source file on a start/end
    marker (split.go line_start_pattern / line_end_pattern semantics).

    Within-file line order is reconstructed explicitly with a per-batch line
    counter (read_text preserves order inside each file's block sequence).
    Returns rows (source_file, combined, n_merged).
    """
    import pyarrow as pa

    from ..stages.recombine import recombine

    ds = read_lines(paths, include_path=True)

    class AddLineNo:
        def __init__(self):
            self.counters: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            files = batch.column("source_file").to_pylist()
            nos = []
            for f in files:
                n = self.counters.get(f, 0)
                nos.append(n)
                self.counters[f] = n + 1
            return batch.append_column(order_col, pa.array(nos, pa.int64()))

    # single-actor counter keeps global per-file line numbers consistent
    ds = ds.map_batches(AddLineNo, batch_format="pyarrow", concurrency=1)

    kwargs = dict(
        source_key="source_file",
        order_cols=[order_col],
        combine_field="raw",
        combine_with=combine_with,
    )
    if line_start_pattern is not None:
        kwargs["is_first_entry"] = f'IsMatch(raw, "{line_start_pattern}")'
    elif line_end_pattern is not None:
        kwargs["is_last_entry"] = f'IsMatch(raw, "{line_end_pattern}")'
    else:
        raise ValueError("need line_start_pattern or line_end_pattern")
    return recombine(ds, **kwargs)
