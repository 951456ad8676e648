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
