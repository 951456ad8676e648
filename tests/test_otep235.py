"""OTEP-235 consistent sampling — parity with pkg/sampling test vectors
and a literal Go-restatement of the processor decision flow.

Vector sources: pkg/sampling/probability_test.go:14-31 (precision-3
thirds), :37-57 (full-precision 1/3 rounding), :190-278 (kase table),
threshold_test.go:32-86 (ShouldSample examples, trace-id extraction).
"""

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.otep235 import (
    ALWAYS_SAMPLE,
    MAX_ADJUSTED_COUNT,
    NEVER_SAMPLE,
    ConsistentSampler,
    ProbabilityRangeError,
    parse_tvalue,
    probability_to_threshold,
    threshold_probability,
    tvalue,
)


# --- scalar parity with pkg/sampling -----------------------------------

def test_thirds_precision3():
    # probability_test.go ExampleProbabilityToThresholdWithPrecision
    assert tvalue(probability_to_threshold(1 / 3, 3)) == "aab"
    assert tvalue(probability_to_threshold(2 / 3, 3)) == "555"
    assert tvalue(probability_to_threshold(3 / 3, 3)) == "0"


def test_one_third_full_precision():
    # probability_test.go ExampleProbabilityToThreshold_rounding
    assert tvalue(probability_to_threshold(1 / 3)) == "aaaaaaaaaaaaac"


KASES = [
    (1 - 0x456789A * 2**-28, "456789a",
     ["45678a", "45679", "4568", "456", "45", "4"]),
    (1 - 0x456789A * 2**-40, "000456789a",
     ["00045678a", "00045679", "0004568", "000456", "00045", "0004"]),
    (1 - 0x789ABCDEF * 2**-40, "0789abcdef",
     ["0789abcdef", "0789abcdf", "0789abce", "0789abd", "0789ac",
      "0789b", "078a", "079", "08"]),
    (1 - 0x12345678 * 2**-32, "12345678",
     ["1234568", "123456", "12345", "1234", "123", "12", "1"]),
    (1 - 0x80801 * 2**-28, "0080801", ["00808", "008"]),
    (1, "0", ["0"]),
]


@pytest.mark.parametrize("prob,exact,rounded", KASES)
def test_precision_table(prob, exact, rounded):
    # probability_test.go TestProbabilityToThresholdWithPrecision
    assert tvalue(probability_to_threshold(prob)) == exact
    for r in rounded:
        precision = len(r.lstrip("0")) or len(r)
        assert tvalue(probability_to_threshold(prob, precision)) == r


def test_tvalue_roundtrip_and_specials():
    assert parse_tvalue("c") == 0xC0000000000000
    assert parse_tvalue("8") == 1 << 55
    assert tvalue(ALWAYS_SAMPLE) == "0"
    assert tvalue(NEVER_SAMPLE) == ""
    for th in (0xC0000000000000, 0x456789A0000000, 1 << 52):
        assert parse_tvalue(tvalue(th)) == th
    with pytest.raises(ValueError):
        parse_tvalue("")
    with pytest.raises(ValueError):
        parse_tvalue("f" * 15)
    with pytest.raises(ProbabilityRangeError):
        probability_to_threshold(0.5 / MAX_ADJUSTED_COUNT)


def test_probability_roundtrip():
    for p in (1.0, 0.5, 0.25, 1 / 3, 0.09375):
        assert threshold_probability(
            probability_to_threshold(p)) == pytest.approx(p, rel=1e-12)


# --- the Go decision flow, restated literally over dicts ----------------

def _go_decide(row, *, percent, mode, precision=4, fail_closed=True):
    """commonShouldSampleLogic (sampler_mode.go:469-527) for one item.
    Returns (sampled, new_tracestate)."""
    ts = row.get("tracestate")
    tid = row.get("trace_id")
    th_m = re.search(r"(?:^|;)th:([0-9a-f]{1,14})(?:;|$)", ts or "")
    rv_m = re.search(r"(?:^|;)rv:([0-9a-f]{14})(?:;|$)", ts or "")
    incoming = parse_tvalue(th_m.group(1)) if th_m else None
    if rv_m:
        rnd = int(rv_m.group(1), 16)
    elif tid and len(tid) == 32:
        rnd = int(tid[16:], 16) & (MAX_ADJUSTED_COUNT - 1)
    else:
        rnd = None

    err = rnd is None
    if not err and incoming is not None and incoming > rnd:
        incoming = None  # clearThreshold
        err = True

    if err:
        decided = NEVER_SAMPLE if fail_closed else ALWAYS_SAMPLE
    else:
        pct = min(percent, 100)
        ratio = max(pct / 100.0, 1.0 / MAX_ADJUSTED_COUNT)
        if pct == 0:
            decided = NEVER_SAMPLE
        elif mode == "equalizing":
            fixed = probability_to_threshold(ratio, precision)
            decided = incoming if (incoming is not None
                                   and incoming > fixed) else fixed
        else:
            prob = (threshold_probability(incoming)
                    if incoming is not None else 1.0)
            try:
                decided = probability_to_threshold(prob * ratio, precision)
            except ProbabilityRangeError:
                decided = NEVER_SAMPLE

    sampled = decided <= (rnd if rnd is not None else 0)
    if not sampled:
        return False, ts
    new_th = incoming if (incoming is not None
                          and incoming > decided) else decided
    rest = re.sub(r"(?:^|;)th:[0-9a-f]{1,14}(?:;|$)", ";", ts or "",
                  count=1).strip(";")
    new_ts = f"th:{tvalue(new_th)}" + (";" + rest if rest else "")
    return True, new_ts


def _rows():
    rows = []
    for i in range(400):
        tid = hashlib.md5(str(i).encode()).hexdigest()
        ts = [None, "", "th:8", "th:e8", "th:c",
              "rv:00000000000001;th:c", "rv:ffffffffffffff;th:c",
              "rv:ffffffffffffff", "vendor:x;th:aab;other:y"][i % 9]
        if i % 13 == 0:
            tid = None  # missing randomness path
        rows.append({"event_id": i, "trace_id": tid, "tracestate": ts})
    return rows


@pytest.mark.parametrize("mode", ["equalizing", "proportional"])
@pytest.mark.parametrize("percent,fail_closed",
                         [(25.0, True), (50.0, False), (100.0, True)])
def test_batch_matches_go_restatement(mode, percent, fail_closed):
    rows = _rows()
    tbl = pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "trace_id": pa.array([r["trace_id"] for r in rows], pa.string()),
        "tracestate": pa.array([r["tracestate"] for r in rows],
                               pa.string()),
    })
    out = ConsistentSampler(percent, mode, fail_closed=fail_closed)(tbl)
    got = {r["event_id"]: r for r in out.to_pylist()}
    n_sampled = 0
    for r in rows:
        sampled, new_ts = _go_decide(r, percent=percent, mode=mode,
                                     fail_closed=fail_closed)
        g = got[r["event_id"]]
        assert g["_sampled"] == sampled, (r, mode, percent)
        if sampled:
            n_sampled += 1
            assert g["tracestate"] == new_ts, (r, mode, percent)
    assert 0 < n_sampled < len(rows) or percent == 100.0


def test_shouldsample_examples():
    # threshold_test.go ExampleTValueToThreshold / _traceid
    th = parse_tvalue("c")
    assert th <= int("d29d6a7215ced0", 16)
    tid = "abababababababababd29d6a7215ced0"
    rnd = int(tid[16:], 16) & (MAX_ADJUSTED_COUNT - 1)
    assert rnd == int("d29d6a7215ced0", 16)
    assert th <= rnd


def test_oracle_sql_constants():
    """The integer constants embedded in the datadog-style SQL oracles
    must equal the engine's own threshold math (drift guard)."""
    assert probability_to_threshold(0.25, 4) == 0xC0000000000000
    assert parse_tvalue("e8") == 0xE8000000000000
    # proportional at ratio 0.5, precision 4:
    assert probability_to_threshold(1.0 * 0.5, 4) == parse_tvalue("8")
    assert probability_to_threshold(0.5 * 0.5, 4) == parse_tvalue("c")
    assert probability_to_threshold(0.09375 * 0.5, 4) == parse_tvalue("f4")
    assert probability_to_threshold(0.25 * 0.5, 4) == parse_tvalue("e")


def test_never_and_empty():
    tbl = pa.table({"trace_id": pa.array([], pa.string()),
                    "tracestate": pa.array([], pa.string())})
    out = ConsistentSampler(25.0, "equalizing")(tbl)
    assert out.num_rows == 0 and "_sampled" in out.column_names
    tbl2 = pa.table({
        "trace_id": pa.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in range(50)]),
        "tracestate": pa.array([None] * 50, pa.string())})
    out2 = ConsistentSampler(0.0, "proportional")(tbl2)
    assert not any(out2.column("_sampled").to_pylist())
