"""Property tests (hypothesis) for the continuation-session bit-level
helpers — each checked against a literal restatement of the Go code
or an algebraic invariant."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.stages.chrony import (
    chrony_float,
    pack_chrony_float,
)
from opentelemetry_collector_contrib_ray.stages.dockerstats import (
    _i64,
    calculate_cpu_limit,
    calculate_mem_usage_no_cache,
)
from opentelemetry_collector_contrib_ray.stages.memcached import (
    calculate_hit_ratio,
)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_chrony_float_matches_go(bf):
    x = bf & 0xFFFFFFFF
    exp = x >> 25
    if exp >= 1 << 6:
        exp -= 1 << 7
    exp -= 25
    coef = x % (1 << 25)
    if coef >= 1 << 24:
        coef -= 1 << 25
    assert chrony_float(bf) == float(coef) * math.pow(2.0, float(exp))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**24), max_value=2**24 - 1),
       st.integers(min_value=-40, max_value=38))
def test_chrony_pack_roundtrip(coef, exp):
    assert chrony_float(pack_chrony_float(coef, exp)) == \
        float(coef) * 2.0 ** exp


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_i64_is_twos_complement(v):
    out = _i64(v)
    assert -(2**63) <= out < 2**63
    assert out % (2**64) == v % (2**64)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**63 - 1),
       st.integers(min_value=0, max_value=2**63 - 1),
       st.booleans())
def test_mem_usage_no_cache_go_semantics(usage, inactive, v1):
    stats = ({"total_inactive_file": inactive}
             if v1 else {"inactive_file": inactive})
    got = calculate_mem_usage_no_cache({"usage": usage,
                                        "stats": stats})
    # literal Go restatement (uint64 compares; missing keys read 0)
    if v1 and inactive < usage:
        want = usage - inactive
    elif v1:
        want = usage - 0 if 0 < usage else usage  # falls to v2 key=0
    elif inactive < usage:
        want = usage - inactive
    else:
        want = usage
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**31),
       st.integers(min_value=0, max_value=2**31))
def test_hit_ratio_swapped_and_bounded(h, m):
    r = calculate_hit_ratio(h, m)
    if h + m == 0:
        assert r == 0.0
    else:
        # the swapped-arg quirk: value is the MISS share
        assert r == m / (h + m) * 100
        assert 0.0 <= r <= 100.0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 63), st.integers(0, 63)),
                min_size=1, max_size=5))
def test_cpuset_ranges(parts):
    line = ",".join(f"{min(a, b)}-{max(a, b)}" for a, b in parts)
    want = float(sum(abs(a - b) + 1 for a, b in parts))
    assert calculate_cpu_limit({"CpusetCpus": line}) == want
