"""Tail-sampling policy-set tests (VERDICT r1 #6): latency, status_code,
trace_state, rate_limiting (actor budget), drop / invert / composite
combinators — mirroring processor/tailsamplingprocessor/internal/sampling/
*_test.go shapes."""

import pandas as pd
import pytest

import ray

from opentelemetry_collector_contrib_ray.stages.policy import (
    RateBudget,
    all_of,
    composite,
    drop_when,
    invert,
    policy_latency,
    policy_min_count,
    policy_rate_limiting,
    policy_status_code,
    policy_trace_state,
    tail_sample,
)


def _trace(**cols):
    return pd.DataFrame(cols)


def test_latency_policy():
    g = _trace(start=[0.0, 1.0], end=[2.0, 5.5])  # window = 5.5s = 5500ms
    assert policy_latency("start", "end", 5000)(g)
    assert not policy_latency("start", "end", 6000)(g)
    # upper bound: threshold < dur <= upper (latency.go:52-56)
    assert policy_latency("start", "end", 5000, 6000)(g)
    assert not policy_latency("start", "end", 5500, 6000)(g)  # not strict >
    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:03"])
    g2 = _trace(start=ts, end=ts)
    assert policy_latency("start", "end", 3000)(g2)


def test_status_code_policy():
    g = _trace(status=["OK", "UNSET", "ERROR"])
    assert policy_status_code("status", ["ERROR"])(g)
    assert policy_status_code("status", ["OK", "ERROR"])(g)
    assert not policy_status_code("status", ["OK"])(_trace(status=["UNSET"]))
    with pytest.raises(ValueError, match="at least one"):
        policy_status_code("status", [])
    with pytest.raises(ValueError, match="unknown status code"):
        policy_status_code("status", ["FATAL"])


def test_trace_state_policy():
    g = _trace(state=["a=1,vendor=x", "b=2", None])
    assert policy_trace_state("state", "vendor", ["x", "y"])(g)
    assert not policy_trace_state("state", "vendor", ["z"])(g)
    # empty values and oversize pairs are discarded at build
    assert not policy_trace_state("state", "vendor", [""])(g)
    assert not policy_trace_state("state", "k", ["v" * 300])(
        _trace(state=["k=" + "v" * 300])
    )


def test_drop_and_invert():
    g_err = _trace(status=["ERROR"], n=[1])
    keep_err = policy_status_code("status", ["ERROR"])
    # drop_when: group dropped iff ALL subpolicies sample (drop.go:29-44)
    assert not drop_when(keep_err)(g_err)
    assert drop_when(keep_err, policy_min_count(5))(g_err)
    assert invert(keep_err)(_trace(status=["OK"]))


def test_rate_limiting_budget_bound():
    """rate_limiting.go:33-48: total admitted spans per second stays under
    the budget; admission is first-come."""
    budget = ray.remote(RateBudget).remote(spans_per_second=10)
    pol = policy_rate_limiting(budget, "ts")
    admitted_spans = 0
    for start in (0, 4, 8, 3):  # four 4-span traces in the same second
        g = _trace(ts=[100.0] * 4, x=list(range(start, start + 4)))
        if pol(g):
            admitted_spans += len(g)
    assert admitted_spans == 8  # 4 + 4 admitted, third/fourth rejected
    # a new second resets the budget
    assert pol(_trace(ts=[101.0] * 4, x=[0, 1, 2, 3]))


def test_composite_order_and_tail_sample():
    first = policy_status_code("status", ["ERROR"])
    second = policy_min_count(2)
    comp = composite(0, [(first, 50), (second, 50)])
    assert comp(_trace(status=["ERROR"]))          # first wins
    assert comp(_trace(status=["OK", "UNSET"]))    # falls to second
    assert not comp(_trace(status=["OK"]))         # neither

    ds = ray.data.from_pandas(pd.DataFrame({
        "trace": ["t1"] * 3 + ["t2"],
        "status": ["OK", "OK", "ERROR", "OK"],
    }))
    kept = tail_sample(ds, "trace", all_of(first)).to_pandas()
    assert set(kept["trace"]) == {"t1"}
    assert len(kept) == 3  # whole group kept atomically


def test_ottl_condition_policy():
    from opentelemetry_collector_contrib_ray.stages.policy import (
        policy_ottl_condition,
    )

    g = _trace(status=["OK", "ERROR"], value=[10.0, 200.0])
    assert policy_ottl_condition('status == "ERROR" and value > 100')(g)
    assert not policy_ottl_condition('status == "UNSET"')(g)
    # unknown columns evaluate to no-match, not an error (ignore mode)
    assert not policy_ottl_condition("missing_col > 5")(g)


def test_composite_rate_allocation_lanes():
    """composite.go rateAllocation: each sub-policy draws from ITS pct
    share of max_total_sps, lanes tracked per (second, sub)."""
    from opentelemetry_collector_contrib_ray.stages.policy import (
        policy_status_code,
    )

    budget = ray.remote(RateBudget).remote(spans_per_second=10**9)
    first = policy_status_code("status", ["ERROR"])
    comp = composite(20, [(first, 50)], budget_handle=budget)  # 50% of 20 = 10
    admitted = 0
    for k in range(5):  # 4-span traces, same second
        g = _trace(status=["ERROR"] * 4,
                   ts=pd.to_datetime(["2024-01-01 00:00:00"] * 4))
        if comp(g):
            admitted += 4
    assert admitted == 8  # two 4-span traces fit under the 10-sps lane
