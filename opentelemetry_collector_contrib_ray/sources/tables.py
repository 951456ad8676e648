"""Thin read helpers over the driver-generated Parquet tables.

Always pass ``columns=`` so only the needed columns leave storage
(projection pushdown at the read — a read that loads all columns for a
2-column transform is wrong at 100 TB).
"""

from __future__ import annotations

import os

import ray.data


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    return ray.data.read_parquet(
        table_path(sf_dir, name),
        columns=columns,
        override_num_blocks=override_num_blocks,
    )


def auto_blocks(sf_dir: str, name: str,
                rows_per_block: int = 250_000) -> int | None:
    """Block count from parquet FOOTER metadata: ceil(rows/rows_per_block).

    Ray's parallelism floor (~2×CPUs) splits a 100k-row table into ~64
    blocks of ~1.5k rows; for sort-fed operators the per-task fixed cost
    (dispatch + sample + per-block pandas pass) then dominates — measured
    2.4× end-to-end on the as-of join at sf0.1. One driver-side footer
    read decides; at scale, when the computed count reaches Ray's own
    floor, returns None and defers to Ray's byte-based sizing (which is
    right for big inputs). Use for reads feeding sorts / sorted-scans —
    NOT for reads feeding compute-heavy per-row stages, which want
    CPU-count parallelism regardless of row count.
    """
    import pyarrow.parquet as pq

    import ray

    rows = pq.read_metadata(table_path(sf_dir, name)).num_rows
    want = rows // rows_per_block + 1
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    if want >= 2 * cpus:
        return None
    return want


def read_table_sortfeed(sf_dir: str, name: str,
                        columns: list[str] | None = None,
                        rows_per_block: int = 250_000) -> ray.data.Dataset:
    """read_table with auto_blocks — for inputs whose next wide step is a
    sort / sorted-scan (as-of join, windowed cumsum, sessionize)."""
    return read_table(sf_dir, name, columns=columns,
                      override_num_blocks=auto_blocks(
                          sf_dir, name, rows_per_block))
