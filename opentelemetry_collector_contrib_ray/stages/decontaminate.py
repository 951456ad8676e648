"""Benchmark decontamination — flag training docs overlapping an eval set.

The canonical LLM-data hygiene op: any document sharing ≥ ``min_overlap``
distinct word n-grams with a benchmark/eval document is contamination and
must be dropped before training.

Shape: the benchmark's distinct n-grams are a SMALL side (eval sets are
thousands of docs) — collected once and broadcast via ``ray.put``; each
batch builds its documents' n-gram strings VECTORIZED (three shifted
slices of the flat word array joined per position, doc boundaries masked),
dedupes per doc, and counts membership hits with one ``pc.is_in`` — no
per-row Python, no shuffle. String n-grams (not hashes) keep the result
bit-identical to a SQL join on the same n-grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _doc_ngrams(texts_col, n: int) -> tuple[pa.Array, np.ndarray]:
    """(flat n-gram strings, doc index per n-gram) — vectorized: words are
    flattened once; n-gram i joins word slices [i, i+1, .. i+n-1]; n-grams
    crossing doc boundaries are masked out. Docs with < n words contribute
    nothing (matching the SQL list_transform(range(...)) shape)."""
    if isinstance(texts_col, pa.ChunkedArray):
        texts_col = texts_col.combine_chunks()
    split = pc.split_pattern(pc.fill_null(texts_col, ""), " ")
    lens = pc.list_value_length(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    words = split.flatten()
    total = len(words)
    m = total - n + 1
    if m <= 0:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    parts = []
    for k in range(n):
        parts.append(words.slice(k, m))
        if k < n - 1:
            parts.append(" ")
    grams = pc.binary_join_element_wise(*parts, "")
    doc_of_word = np.repeat(np.arange(len(lens)), lens)
    valid = doc_of_word[:m] == doc_of_word[n - 1:total]
    return grams.filter(pa.array(valid)), doc_of_word[:m][valid]


def benchmark_ngrams(bench_texts: pa.Array, n: int = 3) -> pa.Array:
    """Distinct n-grams of the benchmark set (driver-side; eval sets are
    small by nature — broadcast the result with ray.put)."""
    grams, _ = _doc_ngrams(bench_texts, n)
    return pc.unique(grams)


class Decontaminate:
    """map_batches callable: adds ``overlap`` (distinct shared n-grams with
    the benchmark) and ``contaminated`` per document."""

    def __init__(self, bench_ref, n: int = 3, min_overlap: int = 3,
                 text_col: str = "text"):
        self.bench = (ray.get(bench_ref)
                      if isinstance(bench_ref, ray.ObjectRef) else bench_ref)
        self.n = n
        self.min_overlap = min_overlap
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, doc_of = _doc_ngrams(batch.column(self.text_col), self.n)
        overlap = np.zeros(batch.num_rows, dtype=np.int64)
        if len(grams):
            # dedupe (doc, gram) then count benchmark membership per doc
            import pandas as pd

            df = pd.DataFrame({"d": doc_of,
                               "g": grams.to_pandas().to_numpy()})
            df = df.drop_duplicates()
            hit = pc.is_in(pa.array(df["g"].to_numpy(), pa.string()),
                           value_set=self.bench).to_numpy(
                zero_copy_only=False)
            counts = np.bincount(df["d"].to_numpy()[hit],
                                 minlength=batch.num_rows)
            overlap = counts.astype(np.int64)
        batch = batch.append_column("overlap", pa.array(overlap, pa.int64()))
        return batch.append_column(
            "contaminated", pa.array(overlap >= self.min_overlap)
        )


def decontaminate(ds, bench_texts: pa.Array, n: int = 3,
                  min_overlap: int = 3, text_col: str = "text"):
    ref = ray.put(benchmark_ngrams(bench_texts, n))
    return ds.map_batches(
        Decontaminate,
        fn_constructor_kwargs=dict(bench_ref=ref, n=n,
                                   min_overlap=min_overlap,
                                   text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# Bloom-filter scale path — same EXACT answer, bounded broadcast
# ---------------------------------------------------------------------------

def bloom_build(grams: pa.Array, m_bits: int = 1 << 23,
                k: int = 7) -> np.ndarray:
    """m-bit double-hashed Bloom filter over the gram set -> packed uint8
    bitmap (m_bits/8 bytes). Deterministic (md5-derived h1/h2 per gram,
    bit_i = (h1 + i*h2) mod m), mergeable by bitwise OR. No false
    negatives by construction."""
    from ..functions.hashing import md5_2x64_many

    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(grams) == 0:
        return bits
    h1, h2 = md5_2x64_many(grams.to_pylist())
    m = np.uint64(m_bits)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (pos & np.uint64(7)).astype(np.uint8)))
    return bits


def bloom_contains(bits: np.ndarray, grams: pa.Array, k: int = 7) -> np.ndarray:
    """Vectorized membership test -> bool ndarray (true = maybe present)."""
    from ..functions.hashing import md5_2x64_many

    if len(grams) == 0:
        return np.empty(0, dtype=bool)
    h1, h2 = md5_2x64_many(grams.to_pylist())
    m = np.uint64(len(bits) * 8)
    out = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return out


class _BloomCandidates:
    """map_batches callable: per block, distinct (doc, gram) pairs passing
    the Bloom filter -> candidate rows (id, gram). The broadcast is the
    BITMAP (m_bits/8 bytes — fixed, e.g. 1 MiB at m=2^23), not the gram
    strings; candidate volume is bounded by true hits + FPR x corpus
    grams."""

    def __init__(self, bits_ref, n: int, k: int, id_col: str,
                 text_col: str):
        self.bits_ref = bits_ref
        self._bits = None
        self.n, self.k = n, k
        self.id_col, self.text_col = id_col, text_col

    @property
    def bits(self):
        # lazy zero-copy plasma read per worker — cheap enough that the
        # stage runs TASK-based (the r3 cheap-state rule: an actor pool's
        # ~2 s spin-up dominated this stage at bench scale, r5)
        if self._bits is None:
            self._bits = (ray.get(self.bits_ref)
                          if isinstance(self.bits_ref, ray.ObjectRef)
                          else self.bits_ref)
        return self._bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        grams, doc_of = _doc_ngrams(batch.column(self.text_col), self.n)
        if not len(grams):
            return pa.table({self.id_col: ids.slice(0, 0),
                             "gram": pa.array([], pa.string())})
        import pandas as pd

        df = pd.DataFrame({"d": doc_of,
                           "g": grams.to_pandas().to_numpy()})
        df = df.drop_duplicates()
        g = pa.array(df["g"].to_numpy(), pa.string())
        maybe = bloom_contains(self.bits, g, self.k)
        return pa.table({
            self.id_col: ids.take(pa.array(df["d"].to_numpy()[maybe],
                                           pa.int64())),
            "gram": g.filter(pa.array(maybe)),
        })


def decontaminate_bloom(ds, bench_texts: pa.Array, n: int = 3,
                        min_overlap: int = 3, id_col: str = "doc_id",
                        text_col: str = "text", m_bits: int = 1 << 23,
                        k: int = 7, join_partitions: int | None = None):
    """EXACT decontamination via a Bloom prefilter + exact verify join —
    the bounded-broadcast scale path beside :func:`decontaminate`.

    :func:`decontaminate` broadcasts the eval set's distinct n-gram
    STRINGS — bounded by the eval set, but a large benchmark suite (many
    GB of grams) would ship to every task. This path broadcasts a fixed
    ``m_bits/8``-byte bitmap instead and recovers exactness with a
    distributed inner join of the (small) candidate pair set against the
    true gram set:

    1. build the Bloom bitmap from the benchmark grams (no false
       negatives → no contaminated doc can be missed);
    2. per corpus block, emit distinct (doc, gram) pairs whose gram the
       filter accepts (true hits + ~FPR of corpus grams);
    3. inner-join candidates against the true gram Dataset (hash join,
       no broadcast) and count verified grams per doc — false positives
       die here, so overlap counts equal the exact path's.

    Returns (id_col, overlap) for docs with overlap >= min_overlap —
    bit-identical to the exact path's flagged set.
    """
    import ray.data as rd

    from .blocks import nonempty_blocks

    true_grams = benchmark_ngrams(bench_texts, n)
    bits_ref = ray.put(bloom_build(true_grams, m_bits, k))

    cands = ds.map_batches(
        _BloomCandidates,
        fn_constructor_kwargs=dict(bits_ref=bits_ref, n=n, k=k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    ).materialize()

    def _empty_result() -> pa.Table:
        # derive the id dtype from the materialized candidate schema (free)
        # so a string doc-id corpus gets the same empty-path schema as the
        # populated path (ADVICE r4: hardcoded int64 broke schema-sensitive
        # consumers like union/join)
        id_type = pa.int64()
        try:
            sch = cands.schema(fetch_if_missing=False)
            if sch is not None and id_col in sch.names:
                id_type = sch.types[sch.names.index(id_col)]
        except Exception:
            pass
        return pa.table({id_col: pa.array([], id_type),
                         "overlap": pa.array([], pa.int64())})

    if cands.count() == 0:
        return rd.from_arrow(_empty_result())

    truth = rd.from_arrow(pa.table({"gram": true_grams}))
    if join_partitions is None:
        join_partitions = int(min(64, max(2, cands.count() // 100_000)))
    verified = nonempty_blocks(cands).join(
        truth, join_type="inner", num_partitions=join_partitions,
        on=("gram",)).materialize()
    if verified.count() == 0:  # every candidate was a false positive
        return rd.from_arrow(_empty_result())

    from .aggregate import count_sum

    # candidate volume (true hits + FPR×corpus grams) is known post-
    # materialize: driver-merge the per-doc counts while the partial set is
    # small, hash-shuffle above the usual gate (CLAUDE.md driver-funnel rule)
    overlap = count_sum(verified.select_columns([id_col]), keys=[id_col],
                        count_name="overlap",
                        final="shuffle" if cands.count() > 5_000_000
                        else "driver")

    def _flagged(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("overlap"), min_overlap)
        return t.select([id_col, "overlap"]).filter(keep)

    return overlap.map_batches(_flagged, batch_format="pyarrow",
                               zero_copy_batch=True)
