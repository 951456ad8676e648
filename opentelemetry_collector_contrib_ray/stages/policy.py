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


def policy_latency(start_col: str, end_col: str, threshold_ms: float,
                   upper_threshold_ms: float = 0):
    """latency policy (internal/sampling/latency.go:33-58): keep if the
    trace's (max end − min start) duration ≥ threshold; with an upper
    bound, keep when threshold < duration ≤ upper. Times are epoch
    seconds (float) or datetimes."""

    def decide(group: pd.DataFrame) -> bool:
        lo, hi = group[start_col].min(), group[end_col].max()
        dur = hi - lo
        ms = (dur.total_seconds() if hasattr(dur, "total_seconds")
              else float(dur)) * 1000.0
        if upper_threshold_ms == 0:
            return ms >= threshold_ms
        return threshold_ms < ms <= upper_threshold_ms

    return decide


_STATUS_CODES = {"OK", "ERROR", "UNSET"}


def policy_status_code(column: str, codes: list[str]):
    """status_code policy (status_code.go:26-63): keep if any span's status
    is one of the given codes; unknown codes are a config error."""
    if not codes:
        raise ValueError("expected at least one status code to filter on")
    bad = [c for c in codes if c not in _STATUS_CODES]
    if bad:
        raise ValueError(
            f"unknown status code {bad[0]!r}, supported: OK, ERROR, UNSET"
        )
    wanted = set(codes)

    def decide(group: pd.DataFrame) -> bool:
        return group[column].isin(wanted).any()

    return decide


def policy_trace_state(column: str, key: str, values: list[str]):
    """trace_state policy (trace_state_filter.go:25-63): parse W3C
    ``k1=v1,k2=v2`` strings, keep if any span's state[key] matches one of
    the values (empty values and oversize pairs are dropped at build)."""
    values_set = {v for v in values if v and len(key) + len(v) < 256}

    def decide(group: pd.DataFrame) -> bool:
        for raw in group[column]:
            if not isinstance(raw, str) or not raw:
                continue
            for member in raw.split(","):
                k, _, v = member.strip().partition("=")
                if k == key and v in values_set:
                    return True
        return False

    return decide


def policy_ottl_condition(condition: str):
    """ottl_condition policy (internal/sampling/ottl.go): keep the group if
    ANY row satisfies the compiled OTTL condition (ErrorMode=ignore: rows
    the condition cannot evaluate simply don't match)."""
    from ..functions.expr import compile_condition

    cond = compile_condition(condition)

    def decide(group: pd.DataFrame) -> bool:
        import pyarrow as pa

        mask = cond(pa.Table.from_pandas(group, preserve_index=False))
        import pyarrow.compute as pc

        return bool(pc.any(mask).as_py())

    return decide


def invert(policy):
    """invert_match modifier (policy.go InvertSampled semantics)."""

    def decide(group: pd.DataFrame) -> bool:
        return not policy(group)

    return decide


def drop_when(*subpolicies):
    """drop policy (drop.go:29-44): veto — the group is DROPPED iff ALL
    subpolicies would sample. Compose via ``all_of(keep, invert(drop))``
    shapes, or pass to :func:`tail_sample` directly (True = drop)."""

    def decide(group: pd.DataFrame) -> bool:
        return not all(p(group) for p in subpolicies)

    return decide


class RateBudget:
    """Actor-held spans-per-second budget (rate_limiting.go:33-48).

    First-come admission, like the reference's wall-clock counter — keyed
    by the trace's event-time second so replays are stable when arrival
    order is stable. One actor per policy; map_groups tasks call it
    remotely."""

    def __init__(self, spans_per_second: int):
        self.sps = spans_per_second
        self.used: dict[int, int] = {}

    def try_admit(self, second: int, n_spans: int,
                  limit: int | None = None) -> bool:
        """Admit if the lane's usage stays under ``limit`` (default: the
        actor-wide sps) — composite passes each sub-policy's allocation."""
        cap = self.sps if limit is None else limit
        used = self.used.get(second, 0)
        # reference rejects only when used + n > cap (strict greater), so an
        # exact-fit trace IS admitted (rate_limiting.go; ADVICE r2)
        if used + n_spans <= cap:
            self.used[second] = used + n_spans
            return True
        return False


def policy_rate_limiting(budget_handle, ts_col: str):
    """rate_limiting policy: admit whole traces until the per-second span
    budget is exhausted (budget held in a RateBudget actor; pass
    ``ray.remote(RateBudget).remote(sps)``)."""
    import ray as _ray

    def decide(group: pd.DataFrame) -> bool:
        ts = group[ts_col].min()
        second = int(ts.timestamp() if hasattr(ts, "timestamp") else ts)
        return _ray.get(budget_handle.try_admit.remote(second, len(group)))

    return decide


def composite(max_total_sps: int, subpolicy_params: list, budget_handle=None):
    """composite policy (composite.go:46-135, simplified): evaluate
    subpolicies IN ORDER; the first that samples wins, subject to its rate
    allocation. ``subpolicy_params`` = [(policy, pct_allocation)]; with
    ``max_total_sps=0`` no rate limiting applies (deterministic — SQL-
    expressible). With a budget, pass ONE RateBudget actor handle; each
    sub-policy draws from its pct share (tracked per second)."""
    import ray as _ray

    def decide(group: pd.DataFrame) -> bool:
        for i, (pol, pct) in enumerate(subpolicy_params):
            if not pol(group):
                continue
            if max_total_sps == 0 or budget_handle is None:
                return True
            # per-sub lane keyed (second, sub index); each lane capped at
            # its percentage share of the total budget (composite.go's
            # rateAllocation), drawn from the shared actor
            sub_sps = max(1, int(max_total_sps * pct / 100))
            ts = group.iloc[0].get("ts")
            second = int(ts.timestamp() if hasattr(ts, "timestamp") else 0)
            lane = second * 1000 + i
            return _ray.get(
                budget_handle.try_admit.remote(lane, len(group),
                                               limit=sub_sps)
            )
        return False

    return decide


def tail_sample(ds, group_key: str, policy):
    """Keep or drop whole key groups by policy decision."""

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        return group if policy(group) else group.iloc[0:0]

    return ds.groupby(group_key).map_groups(apply, batch_format="pandas")
