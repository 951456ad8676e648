"""Exact deduplication — logdedupprocessor analog (plus key-hash variant).

Reference semantics (processor/logdedupprocessor/counter.go:26-130): records
are keyed by the canonical hash of (body + attributes) or a configured field
subset; per key the processor keeps a count and first/last observed
timestamps and emits ONE record per key with a ``log_count`` attribute.

Ray-Data-first: dedup IS a keyed aggregation — hash-shuffle ``groupby`` on
the key columns with (count, min, max, first-representative) aggregates.
Scale note: the shuffle key should be a fixed-width hash of wide text keys
(``key_hash`` variant) so the all-to-all exchange moves 8-byte keys, not
document bodies; collisions are broken by the exact key inside each group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.hashing import md5_u64_col, md5_u64_many


def exact_dedup(
    ds,
    key_cols: list[str],
    order_col: str,
    count_name: str = "log_count",
    salt: int | None = None,
):
    """One row per distinct key: count + first/last of ``order_col``.

    Output columns: key_cols + [count_name, "first_observed", "last_observed"].

    ``salt=k`` enables the skew-safe two-phase variant (SURVEY.md §4 skew
    row): phase 1 groups by (key, hash(order_col) % k) so a pathologically
    hot key (one doc duplicated millions of times) spreads over k shuffle
    partitions; phase 2 merges the ≤k partials per key.  Counts/min/max
    compose associatively, so results are identical to the unsalted path.
    """
    if salt is None:
        return ds.groupby(key_cols).aggregate(
            Count(alias_name=count_name),
            Min(order_col, alias_name="first_observed"),
            Max(order_col, alias_name="last_observed"),
        )

    def add_salt(batch: pa.Table) -> pa.Table:
        h = md5_u64_many(
            str(v) for v in batch.column(order_col).to_pylist()
        ) % np.uint64(salt)
        return batch.append_column("_salt", pa.array(h.astype(np.int64)))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    phase1 = salted.groupby(key_cols + ["_salt"]).aggregate(
        Count(alias_name=count_name),
        Min(order_col, alias_name="first_observed"),
        Max(order_col, alias_name="last_observed"),
    )
    return phase1.groupby(key_cols).aggregate(
        Sum(count_name, alias_name=count_name),
        Min("first_observed", alias_name="first_observed"),
        Max("last_observed", alias_name="last_observed"),
    )


class AddKeyHash:
    """map_batches callable adding an md5-based 64-bit key hash column.

    The reference's canonical ``pdatautil.MapHash`` analog: tag each row with
    a fixed-width hash of the concatenated key fields so downstream shuffles
    move 8 bytes per row instead of the full key tuple.
    """

    def __init__(self, key_cols: list[str], out: str = "key_hash", sep: str = "\x1f"):
        self.key_cols = key_cols
        self.out = out
        self.sep = sep

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = [pc.fill_null(batch.column(c).cast(pa.string()), "")
                for c in self.key_cols]
        joined = cols[0] if len(cols) == 1 else \
            pc.binary_join_element_wise(*cols, self.sep)
        h = md5_u64_col(joined).view("int64")
        return batch.append_column(self.out, pa.array(h, pa.int64()))


def dedup_distinct_rows(ds, key_cols: list[str], keep_cols: list[str]):
    """First-representative dedup: one surviving row per key.

    Implemented as groupby(key).aggregate(min over a deterministic
    representative column) — callers pick ``keep_cols`` whose min defines
    the canonical survivor (e.g. smallest doc_id).
    """
    aggs = [Min(c, alias_name=c) for c in keep_cols]
    return ds.groupby(key_cols).aggregate(*aggs)
