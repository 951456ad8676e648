"""OTEP-235 consistent probability sampling (pkg/sampling parity).

The probabilisticsamplerprocessor's ``equalizing`` and ``proportional``
modes (the modern, tracestate-aware path — the legacy ``hash_seed`` mode
lives in stages/sample.py as FnvHashSampler). Semantics restated from:

- pkg/sampling/threshold.go:24-122 — Threshold = rejections out of 2^56;
  T-value = 14-hex-digit encoding with trailing zeros trimmed ("0" =
  always sample, "" = never sample); ShouldSample = T <= R.
- pkg/sampling/randomness.go:46-56 — TraceIDToRandomness = big-endian
  uint64 of trace-id bytes 8..16 masked to the low 56 bits; an explicit
  ``rv`` tracestate value (exactly 14 hex digits) overrides it.
- pkg/sampling/probability.go:33-78 — ProbabilityToThresholdWithPrecision:
  Frexp-based automatic precision widening near the extremes, round-half-
  away scaling, half-up rounding to the requested hex-digit precision.
- processor/probabilisticsamplerprocessor/sampler_mode.go:259-296,350-373,
  469-527 — consistencyCheck (incoming th inconsistent with randomness is
  cleared + fail-open/closed), equalizing decide = max(fixed, incoming),
  proportional decide = P2T(incoming_prob × ratio, precision) with
  range-underflow → never; updateThreshold never lowers a threshold.
- factory.go:20,34-36 — defaults: precision 4, fail_closed true.

Flat-column model: the operator reads the OTel tracestate SECTION (the
value of the W3C ``ot`` entry, e.g. ``"th:8;rv:0123456789abcd"``) from a
string column and rewrites its ``th`` entry on sampled rows. Everything
is one vectorized task-based map_batches — block-local, zero shuffle;
per-row hex parsing is a numpy nibble-LUT gather, threshold encoding
goes through the distinct-value vocabulary trick (bounded by the number
of DISTINCT incoming thresholds, not rows).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_ADJUSTED_COUNT = 1 << 56  # pkg/sampling/threshold.go:14
NUM_HEX_DIGITS = 14
NEVER_SAMPLE = MAX_ADJUSTED_COUNT  # sentinel: rejects every randomness
ALWAYS_SAMPLE = 0
MIN_SAMPLING_PROBABILITY = 1.0 / MAX_ADJUSTED_COUNT

_TH_RE = r"(?:^|;)th:(?P<v>[0-9a-f]{1,14})(?:;|$)"
_RV_RE = r"(?:^|;)rv:(?P<v>[0-9a-f]{14})(?:;|$)"
_TH_STRIP_RE = r"(?:^|;)th:[0-9a-f]{1,14}(?:;|$)"

_HEX_LUT = np.full(256, 255, np.uint8)
for _i, _c in enumerate("0123456789abcdef"):
    _HEX_LUT[ord(_c)] = _i


class ProbabilityRangeError(ValueError):
    """probability.go ErrProbabilityRange."""


def probability_to_threshold(fraction: float, precision: int = 0) -> int:
    """ProbabilityToThresholdWithPrecision (probability.go:33-78), exact.

    Returns the unsigned threshold (rejections out of 2^56). Raises
    ProbabilityRangeError outside [1/2^56, 1].
    """
    if precision == 0:
        precision = NUM_HEX_DIGITS
    if not (MIN_SAMPLING_PROBABILITY <= fraction <= 1):
        raise ProbabilityRangeError(fraction)
    if fraction == 1:
        return ALWAYS_SAMPLE

    # Frexp returns exponent <= 0 here; every multiple of -4 adds a
    # leading hex '0' (or 'f'), which is discounted from the precision.
    _, exp_f = math.frexp(fraction)
    _, exp_r = math.frexp(1 - fraction)
    precision = min(NUM_HEX_DIGITS,
                    max(precision + (-exp_f) // 4, precision + (-exp_r) // 4))

    # Go math.Round = half away from zero; values are positive here.
    scaled = math.floor(fraction * MAX_ADJUSTED_COUNT + 0.5)
    threshold = MAX_ADJUSTED_COUNT - scaled

    shift = 4 * (NUM_HEX_DIGITS - precision)
    if shift:
        threshold += 1 << (shift - 1)
        threshold >>= shift
        threshold <<= shift
    return threshold


def tvalue(threshold: int) -> str:
    """Threshold.TValue (threshold.go:97-116): trailing zeros trimmed."""
    if threshold == ALWAYS_SAMPLE:
        return "0"
    if threshold >= NEVER_SAMPLE:
        return ""
    return f"{threshold:014x}".rstrip("0")


def parse_tvalue(s: str) -> int:
    """TValueToThreshold (threshold.go:62-85): right-pad trailing zeros."""
    if not s or len(s) > NUM_HEX_DIGITS:
        raise ValueError(f"t-value must be 1..14 hex digits: {s!r}")
    return int(s, 16) << (4 * (NUM_HEX_DIGITS - len(s)))


def threshold_probability(threshold: int) -> float:
    """Threshold.Probability (probability.go:81-83)."""
    return float(MAX_ADJUSTED_COUNT - threshold) / MAX_ADJUSTED_COUNT


def _hex14_to_u64(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 14-hex-char parse -> (uint64 values, valid mask).

    ``arr`` must be a string array whose non-null values are exactly 14
    chars (enforced upstream via rpad/slice); nulls and non-hex chars
    yield valid=False.
    """
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, bool)
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    filled = pc.fill_null(arr, "0" * NUM_HEX_DIGITS)
    b = pc.cast(filled, pa.binary()).combine_chunks() if isinstance(
        filled, pa.ChunkedArray) else pc.cast(filled, pa.binary())
    offsets = np.frombuffer(b.buffers()[1], np.int32,
                            count=n + 1, offset=4 * b.offset)
    flat = np.frombuffer(b.buffers()[2], np.uint8)[
        offsets[0]:offsets[-1]].reshape(n, NUM_HEX_DIGITS)
    nib = _HEX_LUT[flat]
    bad = (nib == 255).any(axis=1)
    shifts = (4 * np.arange(NUM_HEX_DIGITS - 1, -1, -1)).astype(np.uint64)
    vals = (nib.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
    vals[bad | null_mask] = 0
    return vals, ~(bad | null_mask)


def _extract_hex(col: pa.Array, pattern: str, pad: bool):
    """Regex-extract one hex capture; optionally right-pad to 14 digits
    (t-value trailing-zero semantics). Returns (uint64, valid)."""
    m = pc.extract_regex(col, pattern)
    cap = pc.struct_field(m, "v")
    if pad:
        cap = pc.utf8_rpad(cap, NUM_HEX_DIGITS, padding="0")
    return _hex14_to_u64(cap)


class ConsistentSampler:
    """Vectorized equalizing/proportional consistent sampler.

    Emits a boolean ``_sampled`` column plus the rewritten tracestate for
    sampled rows; ``consistent_sample`` filters and drops the marker.
    """

    def __init__(self, percent: float, mode: str = "equalizing", *,
                 trace_id_col: str = "trace_id",
                 tracestate_col: str = "tracestate",
                 precision: int = 4, fail_closed: bool = True):
        if mode not in ("equalizing", "proportional"):
            raise ValueError(f"unsupported consistent sampler mode {mode!r}")
        self.mode = mode
        self.tid_col = trace_id_col
        self.ts_col = tracestate_col
        self.precision = precision
        self.fail_closed = fail_closed

        pct = min(float(percent), 100.0)
        self.never = pct == 0
        self.ratio = max(pct / 100.0, MIN_SAMPLING_PROBABILITY)
        # equalizing: one fixed threshold (makeSampler, sampler_mode.go:415)
        self.fixed = (probability_to_threshold(self.ratio, precision)
                      if not self.never else NEVER_SAMPLE)
        self._prop_cache: dict[int, int] = {}

    def _proportional_threshold(self, incoming: int) -> int:
        th = self._prop_cache.get(incoming)
        if th is None:
            try:
                th = probability_to_threshold(
                    threshold_probability(incoming) * self.ratio,
                    self.precision)
            except ProbabilityRangeError:
                th = NEVER_SAMPLE  # underflow -> unsampled (:296-302)
            self._prop_cache[incoming] = th
        return th

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("_sampled", pa.array([], pa.bool_()))

        # --- randomness: rv overrides trace-id low-56 bits ------------
        if self.ts_col in batch.column_names:
            ts = batch.column(self.ts_col)
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            ts = ts.cast(pa.string())
        else:
            ts = pa.nulls(n, pa.string())
        rv_val, rv_ok = _extract_hex(ts, _RV_RE, pad=False)

        if self.tid_col in batch.column_names:
            tid = batch.column(self.tid_col)
            if isinstance(tid, pa.ChunkedArray):
                tid = tid.combine_chunks()
            low14 = pc.utf8_slice_codeunits(tid.cast(pa.string()), 18, 32)
            ok_len = pc.fill_null(
                pc.equal(pc.utf8_length(low14), NUM_HEX_DIGITS), False)
            low14 = pc.if_else(ok_len, low14, pa.scalar(None, pa.string()))
            tid_val, tid_ok = _hex14_to_u64(low14)
        else:
            tid_val = np.zeros(n, np.uint64)
            tid_ok = np.zeros(n, bool)

        rnd = np.where(rv_ok, rv_val, tid_val)
        has_rnd = rv_ok | tid_ok

        # --- incoming th + consistency check ---------------------------
        th_val, has_th = _extract_hex(ts, _TH_RE, pad=True)
        # consistencyCheck returns ErrMissingRandomness BEFORE the
        # threshold check (:352-354) — a missing-randomness row keeps its
        # incoming th (it participates in updateThreshold on fail-open).
        inconsistent = has_th & has_rnd & (th_val > rnd)
        has_th = has_th & ~inconsistent  # clearThreshold (:367)
        err = ~has_rnd | inconsistent

        # --- decide -----------------------------------------------------
        if self.never:
            decided = np.full(n, NEVER_SAMPLE, np.uint64)
        elif self.mode == "equalizing":
            decided = np.where(has_th & (th_val > np.uint64(self.fixed)),
                               th_val, np.uint64(self.fixed))
        else:
            inc = np.where(has_th, th_val, np.uint64(ALWAYS_SAMPLE))
            uniq, inv = np.unique(inc, return_inverse=True)
            per = np.array([self._proportional_threshold(int(u))
                            for u in uniq], np.uint64)
            decided = per[inv]
        fail_th = np.uint64(NEVER_SAMPLE if self.fail_closed
                            else ALWAYS_SAMPLE)
        decided = np.where(err, fail_th, decided)

        sampled = decided <= rnd  # ShouldSample; NEVER_SAMPLE > max(rnd)

        # --- updateThreshold + reserialize (sampled rows only) ----------
        # never lower an existing threshold (sampler_mode.go:507-513)
        new_th = np.where(has_th & (th_val > decided), th_val, decided)
        uniq, inv = np.unique(new_th, return_inverse=True)
        tvals = np.array([tvalue(int(u)) for u in uniq], object)
        th_entry = pa.array(
            np.char.add("th:", tvals.astype(str))[inv], pa.string())

        rest = pc.replace_substring_regex(
            pc.fill_null(ts, ""), _TH_STRIP_RE, ";", max_replacements=1)
        rest = pc.utf8_trim(rest, ";")
        new_ts = pc.if_else(
            pc.equal(rest, ""), th_entry,
            pc.binary_join_element_wise(th_entry, rest, ";"))
        out_ts = pc.if_else(pa.array(sampled), new_ts, ts)

        if self.ts_col in batch.column_names:
            i = batch.column_names.index(self.ts_col)
            batch = batch.set_column(i, self.ts_col, out_ts)
        else:
            batch = batch.append_column(self.ts_col, out_ts)
        return batch.append_column("_sampled", pa.array(sampled))


def consistent_sample(ds, percent: float, mode: str = "equalizing", *,
                      trace_id_col: str = "trace_id",
                      tracestate_col: str = "tracestate",
                      precision: int = 4, fail_closed: bool = True):
    """Filter ``ds`` to the consistent-sampling keep set, rewriting the
    tracestate ``th`` entry on kept rows (block-local, zero shuffle)."""
    fn = ConsistentSampler(percent, mode, trace_id_col=trace_id_col,
                           tracestate_col=tracestate_col,
                           precision=precision, fail_closed=fail_closed)

    def apply(batch: pa.Table) -> pa.Table:
        out = fn(batch)
        return out.filter(out.column("_sampled")).drop_columns(["_sampled"])

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)
