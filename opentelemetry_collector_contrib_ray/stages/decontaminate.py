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


def _distinct_doc_grams(texts_col, n: int
                        ) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """DISTINCT (doc, gram) pairs of a batch, zero-loop: dictionary-encode
    the flat gram stream, pack (doc, code) into one int64 and np.unique it.
    Returns (doc index, gram code, distinct gram strings) — exact (no
    hashing); the earlier pandas drop_duplicates on raw strings was the
    hot spot of both decontamination paths."""
    grams, doc_of = _doc_ngrams(texts_col, n)
    if not len(grams):
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                pa.array([], pa.string()))
    denc = grams.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = denc.dictionary
    packed = np.unique(doc_of * np.int64(len(uniq)) + codes)
    return packed // len(uniq), packed % len(uniq), uniq


class Decontaminate:
    """map_batches callable: adds ``overlap`` (distinct shared n-grams with
    the benchmark) and ``contaminated`` per document."""

    def __init__(self, bench_ref, n: int = 3, min_overlap: int = 3,
                 text_col: str = "text"):
        self.bench_ref = bench_ref
        self._bench = None
        self.n = n
        self.min_overlap = min_overlap
        self.text_col = text_col

    @property
    def bench(self):
        # lazy zero-copy plasma read — cheap enough to run TASK-based
        # (r3 cheap-state rule; the actor pool's ~2 s spin-up dominated)
        if self._bench is None:
            self._bench = (ray.get(self.bench_ref)
                           if isinstance(self.bench_ref, ray.ObjectRef)
                           else self.bench_ref)
        return self._bench

    def __call__(self, batch: pa.Table) -> pa.Table:
        overlap = np.zeros(batch.num_rows, dtype=np.int64)
        d, c, uniq = _distinct_doc_grams(batch.column(self.text_col), self.n)
        if len(uniq):
            # membership test once per DISTINCT gram, gathered back by code
            # (vocabulary trick, CLAUDE.md r2) — then count hits per doc
            hit_u = pc.is_in(uniq, value_set=self.bench).to_numpy(
                zero_copy_only=False)
            counts = np.bincount(d[hit_u[c]], minlength=batch.num_rows)
            overlap = counts.astype(np.int64)
        batch = batch.append_column("overlap", pa.array(overlap, pa.int64()))
        return batch.append_column(
            "contaminated", pa.array(overlap >= self.min_overlap)
        )


def decontaminate(ds, bench_texts: pa.Array, n: int = 3,
                  min_overlap: int = 3, text_col: str = "text"):
    ref = ray.put(benchmark_ngrams(bench_texts, n))
    # task-based: per-task state is one lazy zero-copy ray.get of the gram
    # set ref (r3 cheap-state rule — see _BloomCandidates)
    return ds.map_batches(
        Decontaminate(bench_ref=ref, n=n, min_overlap=min_overlap,
                      text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True,
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
        d, c, uniq = _distinct_doc_grams(batch.column(self.text_col), self.n)
        if not len(uniq):
            return pa.table({self.id_col: ids.slice(0, 0),
                             "gram": pa.array([], pa.string())})
        # one md5 pass per DISTINCT gram (not per (doc, gram) pair),
        # verdicts gathered back by dictionary code
        maybe_u = bloom_contains(self.bits, uniq, self.k)
        keep = maybe_u[c]
        return pa.table({
            self.id_col: ids.take(pa.array(d[keep], pa.int64())),
            "gram": uniq.take(pa.array(c[keep], pa.int64())),
        })


def decontaminate_bloom(ds, bench_texts: pa.Array, n: int = 3,
                        min_overlap: int = 3, id_col: str = "doc_id",
                        text_col: str = "text", m_bits: int = 1 << 23,
                        k: int = 7, join_partitions: int | None = None,
                        verify_driver_rows: int = 5_000_000):
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

    # TASK-based on purpose (r3 cheap-state rule): the per-worker state is
    # one lazy zero-copy ray.get of the bitmap ref — an actor pool's ~2 s
    # spin-up dominated this stage at bench scale (measured 4.3 s -> ~2 s
    # isolated best-of-3 at sf0.1 after the switch, r5)
    cands = ds.map_batches(
        _BloomCandidates(bits_ref=bits_ref, n=n, k=k,
                         id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True,
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

    if cands.count() <= verify_driver_rows:
        # driver-verify path (CLAUDE.md size-gate convention — the
        # distributed hash join costs ~2 s FIXED at small scale): the
        # candidate set is bounded by the gate, the true gram set already
        # lives on this driver (it built the bitmap), so one vectorized
        # is_in + bincount replaces the shuffle join + grouped count.
        # Candidates are DISTINCT (doc, gram) pairs, so hits-per-doc is
        # exactly the overlap count.
        tbl = pa.concat_tables(ray.get(cands.to_arrow_refs()))
        if tbl.num_rows == 0:
            return rd.from_arrow(_empty_result())
        hit = pc.is_in(tbl.column("gram").combine_chunks(),
                       value_set=true_grams)
        ver = tbl.filter(hit)
        if ver.num_rows == 0:  # every candidate was a false positive
            return rd.from_arrow(_empty_result())
        denc = ver.column(id_col).combine_chunks().dictionary_encode()
        counts = np.bincount(
            denc.indices.to_numpy(zero_copy_only=False),
            minlength=len(denc.dictionary)).astype(np.int64)
        flag = counts >= min_overlap
        out = pa.table({
            id_col: denc.dictionary.filter(pa.array(flag)),
            "overlap": pa.array(counts[flag], pa.int64()),
        })
        return rd.from_arrow(out)

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
