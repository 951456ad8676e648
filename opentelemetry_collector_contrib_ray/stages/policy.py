"""Group-level decision stages — tailsampling / groupbytrace analogs.

Reference semantics (processor/tailsamplingprocessor/processor.go:48-68 +
internal/sampling/*.go): spans are buffered per trace id; after the decision
wait, a POLICY SET evaluates over the whole trace (always / attribute match
/ status code / probabilistic / span_count / and-or composites) and the
whole trace is kept or dropped atomically.  groupbytraceprocessor is the
keep-everything variant (buffer + release whole groups).

Batch reformulation: ``groupby(group_key).map_groups(decide)`` — the policy
sees the complete group (the decision-wait analog: a batch job always has
the whole key group co-located after the hash shuffle).  Policies are
vectorized predicates over the group's pandas frame.

Partitioning assumption: one group (trace) fits in memory — same constraint
the reference has (it buffers whole traces; tailsampling README requires
all spans of a trace on one instance).
"""

from __future__ import annotations

import pandas as pd

from ..functions.hashing import md5_u64


def policy_any_match(column: str, values: set):
    """Keep the group if ANY row's column is in values (string-attribute policy)."""

    def decide(group: pd.DataFrame) -> bool:
        return group[column].isin(values).any()

    return decide


def policy_numeric_range(column: str, lo: float, hi: float):
    """Keep if any value falls in [lo, hi] (numeric-attribute policy)."""

    def decide(group: pd.DataFrame) -> bool:
        return group[column].between(lo, hi).any()

    return decide


def policy_min_count(n: int):
    """span_count policy: keep groups with at least n rows."""

    def decide(group: pd.DataFrame) -> bool:
        return len(group) >= n

    return decide


def policy_hash_probabilistic(key_col: str, percentage: float):
    """probabilistic policy: deterministic md5 threshold on the group key."""
    bp = int(round(percentage * 100))

    def decide(group: pd.DataFrame) -> bool:
        return md5_u64(str(group[key_col].iloc[0])) % 10_000 < bp

    return decide


def all_of(*policies):
    def decide(group: pd.DataFrame) -> bool:
        return all(p(group) for p in policies)

    return decide


def any_of(*policies):
    def decide(group: pd.DataFrame) -> bool:
        return any(p(group) for p in policies)

    return decide


def tail_sample(ds, group_key: str, policy):
    """Keep or drop whole key groups by policy decision."""

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        return group if policy(group) else group.iloc[0:0]

    return ds.groupby(group_key).map_groups(apply, batch_format="pandas")
