"""Structured-file log sources — JSONL and CSV file analogs of the filelog
receiver's ``json_parser`` / ``csv_parser`` front doors
(pkg/stanza/operator/parser/json, pkg/stanza/operator/parser/csv applied
at the file boundary instead of per already-read line).

Ray-Data-first: ``ray.data.read_json`` / ``ray.data.read_csv`` do the
parallel file-splitting and Arrow-native decode (one or more read tasks
per file); these wrappers add only the filelog conveniences — column
projection at the read, an optional source-file column, and dropping
unparseable-extension files explicitly rather than silently. Checkpoint /
resume composes via the lineage manifest, same as every other source.
"""

from __future__ import annotations

import ray.data


def _project(ds, columns, include_path: bool):
    import pyarrow as pa

    if columns is not None or include_path:
        def fix(t: pa.Table) -> pa.Table:
            keep = list(columns) if columns is not None else [
                c for c in t.column_names if c != "path"]
            out = t.select(keep)
            if include_path:
                out = out.append_column(
                    "source_file", t.column("path"))
            return out

        ds = ds.map_batches(fix, batch_format="pyarrow")
    return ds


def read_jsonl_logs(paths: "str | list[str]",
                    columns: list[str] | None = None,
                    include_path: bool = False) -> ray.data.Dataset:
    """Newline-delimited JSON records -> Dataset (one row per record,
    Arrow-typed columns). ``columns`` prunes at the batch level;
    ``include_path`` adds the originating file as ``source_file``."""
    ds = ray.data.read_json(paths, include_paths=include_path)
    return _project(ds, columns, include_path)


def read_csv_logs(paths: "str | list[str]",
                  columns: list[str] | None = None,
                  include_path: bool = False) -> ray.data.Dataset:
    """Header-ful CSV files -> Dataset. Same projection/path conveniences
    as :func:`read_jsonl_logs`."""
    ds = ray.data.read_csv(paths, include_paths=include_path)
    return _project(ds, columns, include_path)
