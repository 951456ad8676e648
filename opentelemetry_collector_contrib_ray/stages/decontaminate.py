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
