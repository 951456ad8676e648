"""Keyed joins — the servicegraphconnector self-join analog.

Reference semantics (connector/servicegraphconnector/internal/store/
store.go:19-133): client spans and server spans are matched on
(trace_id, span_id)/(trace_id, parent_span_id) in a keyed in-memory store to
emit edges — i.e. a hash join keyed on the pairing key.

Ray-Data-first: use the native hash-shuffle ``Dataset.join`` (both sides
partitioned by key hash; Ray 2.49 hash-join aggregators).  ``num_partitions``
should scale with the larger side (≈ 2× total cores at minimum); the join
key should be a narrow column.  For small dimension sides prefer the
broadcast :class:`~.enrich.Enrich` stage instead — a shuffle join of a
100-row table is the canonical anti-pattern at 100 TB.
"""

from __future__ import annotations


def hash_join(
    left,
    right,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
    left_suffix: str | None = None,
    right_suffix: str | None = "_r",
):
    if num_partitions is None:
        num_partitions = 16
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )
