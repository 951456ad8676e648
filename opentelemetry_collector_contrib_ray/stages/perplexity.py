"""Char-n-gram LM perplexity scoring + CCNet-style band filtering.

The canonical LLM-data quality op (Wenzek et al. 2019 "CCNet"; Rae et al.
2021 "Gopher" §A.1.2): score every document with a small language model's
perplexity and keep a quantile band (CCNet keeps the low-perplexity
head/middle; the high tail is noise, the extreme low tail is boilerplate).

Engine shape (the repo's size-gated model idiom, cf. lang_id_model_stage):

- **fit on the driver** over the deterministic hash-order sample
  (``sample_fixed_n`` — partitioning-independent, no RNG), one vectorized
  pass: NUL-joined byte blob → rolling 3-byte windows → two ``bincount``s.
  The model is two hashed count tables (trigram ``DIM3`` + bigram-context
  ``DIM2``), Laplace-smoothed — a hashed back-off-free KN-lite LM, the
  same family CCNet's KenLM stands in for.
- **score distributed** via task-based ``map_batches`` (cheap state: two
  float32 log tables ≈ 4.3 MB travel ONCE via ``ray.put``, zero-copy
  plasma read per task). Per batch: one blob, two gathers, one
  ``np.add.reduceat`` — no per-row Python (NBCharLangModel's featurize
  recipe, textstats.py).
- **filter** via the exact global-quantile band machinery
  (``quantile.quantile_band_filter``) over an INTEGER decimillibit column
  (``round(bits_per_byte * 10000)``): distinct values are bounded by the
  bpb range (< ~240k for bpb ∈ [0, 24]), so the distinct-(value, count)
  quantile path stays scale-safe where raw float64 scores would not
  (SCALE.md "global quantile band" row's documented double hazard).

Determinism: counts, log, gather and reduceat are elementwise /
fixed-order within each document's contiguous window segment, so per-doc
scores are bit-identical under ANY partitioning (pinned by test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

DIM3 = 1 << 20  # hashed trigram space
DIM2 = 1 << 16  # hashed bigram-context space
_ALPHA = 0.5  # Laplace mass per trigram bucket
_V = 256  # byte alphabet (context normalizer: alpha * V)
_LN2 = float(np.log(2.0))


def _windows(texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """(tri hash, ctx hash, valid mask, per-doc window counts) for a list
    of texts, via ONE NUL-separated blob + vectorized rolling windows
    (textstats.NBCharLangModel._featurize recipe). NUL is the separator,
    so embedded \\x00 bytes in a document are stripped first (ADVICE r4:
    a NUL-bearing text would add phantom separators and mis-assign every
    later document's window counts)."""
    blob = ("\x00" + "\x00".join(
        (t or "").replace("\x00", "") for t in texts)
        + "\x00\x00").encode("utf-8", errors="replace")
    b = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
    w3 = b[:-2] * 65536 + b[1:-1] * 256 + b[2:]
    w2 = b[:-2] * 256 + b[1:-1]
    valid = (b[:-2] != 0) & (b[1:-1] != 0) & (b[2:] != 0)
    h3 = w3 % DIM3
    h2 = w2 % DIM2
    nuls = np.nonzero(b == 0)[0]
    cnt = np.diff(nuls)[:len(texts)]  # L_i + 1 windows start in segment i
    return h3, h2, valid, cnt


class HashedCharLM:
    """Two log-count tables; window log-prob = logc3[h3] - logc2[h2]."""

    def __init__(self, logc3: np.ndarray, logc2: np.ndarray):
        self.logc3 = logc3
        self.logc2 = logc2

    @classmethod
    def fit(cls, texts: list) -> "HashedCharLM":
        h3, h2, valid, _ = _windows(texts)
        c3 = np.bincount(h3[valid], minlength=DIM3).astype(np.float64)
        c2 = np.bincount(h2[valid], minlength=DIM2).astype(np.float64)
        return cls(np.log(c3 + _ALPHA).astype(np.float32),
                   np.log(c2 + _ALPHA * _V).astype(np.float32))

    def score(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        """(bits-per-byte float64, valid-window count int64) per text.
        Documents too short for one full trigram window score 0.0 with
        n_ctx 0 — callers decide their fate (the band filter drops them,
        CCNet-style)."""
        if not texts:
            return (np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int64))
        h3, h2, valid, cnt = _windows(texts)
        # invalid windows contribute exactly 0 to the segment sum
        logp = np.where(
            valid,
            self.logc3[h3].astype(np.float64)
            - self.logc2[h2].astype(np.float64),
            0.0,
        )
        offsets = np.concatenate(([0], np.cumsum(cnt)[:-1])).astype(np.int64)
        ssum = np.add.reduceat(logp, offsets)
        vcnt = np.add.reduceat(valid.astype(np.int64), offsets)
        bpb = np.where(vcnt > 0, -ssum / np.maximum(vcnt, 1) / _LN2, 0.0)
        return bpb.astype(np.float64), vcnt.astype(np.int64)


def fit_char_lm(ds, id_col: str, text_col: str,
                fit_sample: int = 4096) -> HashedCharLM:
    """Driver-fit on the deterministic hash-order sample (same
    partitioning-independence contract as kmeans._fit_sample_matrix:
    ``sample_fixed_n`` is md5-hash-order, no RNG; counts are
    order-insensitive so no sort is needed)."""
    from .sample import sample_fixed_n

    sample = sample_fixed_n(ds.select_columns([id_col, text_col]),
                            id_col, fit_sample)
    if not isinstance(sample, pa.Table):
        sample = pa.Table.from_pylist(sample.take_all())
    if sample.num_rows == 0:
        raise ValueError("char-LM fit: empty input dataset")
    texts = pc.fill_null(sample.column(text_col), "").to_pylist()
    return HashedCharLM.fit(texts)


class _ScoreBatch:
    """Task-based scorer: ships two ray refs, resolves them zero-copy in
    the worker on first batch (cheap state → no actor pool; CLAUDE.md
    round-3 convention)."""

    def __init__(self, logc3_ref, logc2_ref, text_col: str, out: str):
        self._r3, self._r2 = logc3_ref, logc2_ref
        self.text_col = text_col
        self.out = out
        self._lm = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._lm is None:
            self._lm = HashedCharLM(ray.get(self._r3), ray.get(self._r2))
        texts = pc.fill_null(batch.column(self.text_col), "").to_pylist()
        bpb, vcnt = self._lm.score(texts)
        # integer decimillibits: the quantile-band column (bounded distinct
        # values — see module docstring); float bpb kept for consumers
        mdb = np.round(bpb * 10000.0).astype(np.int64)
        batch = batch.append_column(self.out, pa.array(bpb, pa.float64()))
        batch = batch.append_column(self.out + "_mdb",
                                    pa.array(mdb, pa.int64()))
        return batch.append_column("n_ctx", pa.array(vcnt, pa.int64()))


def perplexity_score(ds, id_col: str, text_col: str = "text",
                     fit_sample: int = 4096, out: str = "bpb",
                     lm: HashedCharLM | None = None):
    """Append ``out`` (bits/byte float64), ``out + \"_mdb\"``
    (decimillibits int64) and ``n_ctx`` (valid window count)."""
    if lm is None:
        lm = fit_char_lm(ds, id_col, text_col, fit_sample=fit_sample)
    r3, r2 = ray.put(lm.logc3), ray.put(lm.logc2)
    return ds.map_batches(_ScoreBatch(r3, r2, text_col, out),
                          batch_format="pyarrow", zero_copy_batch=True)


def perplexity_filter(ds, id_col: str, text_col: str = "text",
                      q_lo: float = 0.05, q_hi: float = 0.90,
                      fit_sample: int = 4096, out: str = "bpb",
                      output: str = "rows"):
    """CCNet-style perplexity band selection: score, drop degenerate
    docs (< 1 trigram window), keep rows whose decimillibit score sits
    inside the exact global [q_lo, q_hi] quantile band.

    ``output="rows"`` (default): full surviving rows — STREAMING, the
    scoring map executes in both the quantile pass and the filter pass
    (recompute beats materializing the text corpus at 10^12 rows).
    ``output="slim"``: only (id, score) columns — the slim scored
    projection (~24 B/row) materializes ONCE and both the quantile and
    the filter read it, so scoring executes exactly once; right when the
    caller feeds a dedup/selection decision rather than the text itself.
    """
    scored = perplexity_score(ds, id_col, text_col,
                              fit_sample=fit_sample, out=out)

    def nondegenerate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n_ctx"), 0))

    from .quantile import quantile_band_filter

    if output == "slim":
        def slim(t: pa.Table) -> pa.Table:
            return nondegenerate(t).select(
                [id_col, out, out + "_mdb", "n_ctx"])

        scored = scored.map_batches(slim, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
        return quantile_band_filter(scored, out + "_mdb", q_lo, q_hi)

    scored = scored.map_batches(nondegenerate, batch_format="pyarrow",
                                zero_copy_batch=True)
    return quantile_band_filter(scored, out + "_mdb", q_lo, q_hi)
