"""First-match-wins routing — the routingconnector analog.

Reference semantics (connector/routingconnector/logs.go:62-107 +
config.go:83-101): an ordered table of (condition, route); each record is
MOVED to the first route whose condition matches; the remainder goes to
``default_pipelines``.  Every record lands in exactly one route, none are
duplicated.

Ray-Data-first: routing itself is a narrow map — compute a ``sink`` column
per batch by evaluating all compiled conditions as vectorized masks and
taking the first match (priority encoded by fill order).  No shuffle is
needed for the routing decision; only the per-sink *write* partitions by
the sink column (``write_parquet(partition_cols=["sink"])``), which is the
fan-out the reference implements as per-pipeline exporters
(exporter/fileexporter group_by semantics, config.go:31-47).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.expr import CompiledCondition, compile_condition


class Route:
    """map_batches callable adding a first-match ``sink`` column."""

    def __init__(
        self,
        rules: list[tuple[str, str]],
        default_sink: str = "sink-default",
        sink_column: str = "sink",
    ):
        # compile once per stage object (per actor/task, not per batch)
        self.rules: list[tuple[CompiledCondition, str]] = [
            (compile_condition(cond), sink) for cond, sink in rules
        ]
        self.default_sink = default_sink
        self.sink_column = sink_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sink = pa.nulls(n, pa.string())
        assigned = pa.array([False] * n, pa.bool_())
        for cond, target in self.rules:
            mask = cond(batch)
            take = pc.and_not(mask, assigned)  # first match wins
            sink = pc.if_else(take, pa.scalar(target, pa.string()), sink)
            assigned = pc.or_(assigned, take)
        sink = pc.fill_null(sink, self.default_sink)
        return batch.append_column(self.sink_column, sink)


def write_routed(ds, out_dir: str, sink_column: str = "sink") -> None:
    """Per-sink partitioned Parquet fan-out (one directory per sink)."""
    ds.write_parquet(out_dir, partition_cols=[sink_column])


class HashPartitioner:
    """Stable key -> partition assignment — the loadbalancingexporter
    consistent-hash-ring / kafka partition-by-key analog
    (exporter/loadbalancingexporter/consistent_hashing.go:12-40,
    exporter/kafkaexporter/config.go:59-73).

    ``partition = md5_u64(key) % n`` gives every record of a key the same
    partition on every node and every run (DuckDB-reproducible); use the
    resulting column with ``write_parquet(partition_cols=["partition"])``
    or as an explicit shuffle key.
    """

    def __init__(self, key: str, num_partitions: int, out: str = "partition"):
        self.key = key
        self.num_partitions = num_partitions
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64_col
        import numpy as np

        # unique-gather md5: routing keys repeat heavily (md5_u64_col)
        part = md5_u64_col(batch.column(self.key)) % np.uint64(self.num_partitions)
        return batch.append_column(
            self.out, pa.array(part.astype(np.int32), pa.int32())
        )
