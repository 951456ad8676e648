"""Near-duplicate detection over text: MinHash+LSH, SimHash, n-gram Jaccard.

Core training-data-pipeline operators (MMDS ch.3 / Broder '97 resemblance
sketches, public algorithms).  Shape:

1. ``map_batches`` computes per-doc sketches (shingle hashes -> minhash
   signature / simhash) — stateful permutation tables built once per actor.
2. ``flat_map``-style band expansion emits (band, bucket, doc) rows.
3. ``groupby(band, bucket)`` co-locates LSH candidates (the ONLY shuffle;
   its key is a fixed-width int pair, never document text).
4. ``map_groups`` scores candidate pairs (estimated or exact Jaccard /
   hamming) and emits verified pairs; a final groupby dedupes pairs found
   in multiple bands.

Partitioning assumption (documented per SURVEY.md custom-operator rule):
near-dup pairs share ≥1 band bucket with probability 1-(1-s^r)^b; bucket
group sizes stay bounded because banded keys spread uniformly — a
pathological bucket (all-identical boilerplate docs) is capped by
``max_bucket`` to keep the O(n²) within-bucket step bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Min

from ..functions.hashing import fnv1a64

MERSENNE_P = (1 << 61) - 1


_COMBINE = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles -> uint64 hashes (unique, sorted).

    Per-word fnv1a64 is LRU-cached (small vocab amortizes to dict hits);
    the n-gram combine is a vectorized rolling mix over the word-hash array
    (multiply-xor, wraparound mod 2^64) — no n-gram string materialization.
    """
    words = text.split(" ")
    h = np.fromiter((fnv1a64(w) for w in words), dtype=np.uint64, count=len(words))
    if len(h) == 0:
        return h
    if len(h) < n:
        out = h[0]
        for x in h[1:]:
            out = out * _COMBINE ^ x
        return np.array([out], dtype=np.uint64)
    acc = h[: len(h) - n + 1].copy()
    for k in range(1, n):
        acc = acc * _COMBINE ^ h[k : len(h) - n + 1 + k]
    return np.unique(acc)


class MinHashSketch:
    """Per-doc minhash signature + banded LSH bucket rows.

    Emits one row per (doc, band): (doc_id, band, bucket, sig list<int64>).
    Permutation tables (a*h+b mod p, universal hashing) are built once per
    actor in ``__init__``.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_perm: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        seed: int = 42,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col
        self.text_col = text_col
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle_n)
        # (a*h + b) % p vectorized in uint64 with silent wraparound mod 2^64 —
        # still a deterministic universal-ish family (datasketch-style)
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % np.uint64(MERSENNE_P)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_bucket, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = self.signature(t or "")
            sig_list = sig.view(np.int64).tolist()
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                bucket = int(fnv1a64(",".join(map(str, chunk.tolist()))))
                out_id.append(i)
                out_band.append(b)
                out_bucket.append(np.int64(np.uint64(bucket)))
                out_sig.append(sig_list)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int64()),
                "sig": pa.array(out_sig, pa.list_(pa.int64())),
            }
        )


def _pairs_from_bucket(group: pd.DataFrame, id_col: str, threshold: float,
                       max_bucket: int) -> pd.DataFrame:
    n = len(group)
    if n < 2 or n > max_bucket:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_est": []})
    ids = group[id_col].to_numpy()
    sigs = np.stack(group["sig"].to_numpy())
    rows = []
    for i in range(n):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for off, j_est in enumerate(eq, start=i + 1):
            if j_est >= threshold:
                a, b = ids[i], ids[off]
                if a > b:
                    a, b = b, a
                if a != b:
                    rows.append((a, b, float(j_est)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard_est"])


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 500,
):
    """Candidate near-dup pairs with estimated Jaccard ≥ threshold."""
    sketched = ds.map_batches(
        MinHashSketch,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm,
            bands=bands, shingle_n=shingle_n,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    pairs = sketched.groupby(["band", "bucket"]).map_groups(
        lambda g: _pairs_from_bucket(g, id_col, threshold, max_bucket),
        batch_format="pandas",
    )
    # same pair can surface from several bands -> dedupe
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("jaccard_est", alias_name="jaccard_est")
    )


# --- SimHash -----------------------------------------------------------------

class SimHashSketch:
    """64-bit simhash per doc + 4×16-bit chunk keys for hamming-≤3 search.

    Pigeonhole: hamming(a,b) ≤ 3 over 64 bits ⇒ at least one of the 4
    16-bit chunks is identical, so candidates co-locate on (chunk, value).
    """

    N_CHUNKS = 4

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.bit_shifts = np.arange(64, dtype=np.uint64)
        self.bit_weights = np.uint64(1) << self.bit_shifts

    def simhash(self, text: str) -> int:
        words = text.split(" ")
        hs = np.fromiter((fnv1a64(w) for w in words), dtype=np.uint64, count=len(words))
        if len(hs) == 0:
            return 0
        bits = ((hs[:, None] >> self.bit_shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        return int((self.bit_weights[acc > 0]).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_chunk, out_val, out_hash = [], [], [], []
        for i, t in zip(ids, texts):
            sh = self.simhash(t or "")
            for c in range(self.N_CHUNKS):
                out_id.append(i)
                out_chunk.append(c)
                out_val.append((sh >> (16 * c)) & 0xFFFF)
                out_hash.append(np.int64(np.uint64(sh)))
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "chunk": pa.array(out_chunk, pa.int32()),
                "chunk_val": pa.array(out_val, pa.int32()),
                "simhash": pa.array(out_hash, pa.int64()),
            }
        )


def _simhash_pairs(group: pd.DataFrame, id_col: str, max_hamming: int,
                   max_bucket: int) -> pd.DataFrame:
    n = len(group)
    if n < 2 or n > max_bucket:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    ids = group[id_col].to_numpy()
    hashes = group["simhash"].to_numpy().astype(np.uint64)
    rows = []
    for i in range(n):
        x = hashes[i] ^ hashes[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for off, d in enumerate(ham, start=i + 1):
            if d <= max_hamming and ids[i] != ids[off]:
                a, b = sorted((ids[i], ids[off]))
                rows.append((a, b, int(d)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, max_bucket: int = 500):
    sketched = ds.map_batches(
        SimHashSketch,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    pairs = sketched.groupby(["chunk", "chunk_val"]).map_groups(
        lambda g: _simhash_pairs(g, id_col, max_hamming, max_bucket),
        batch_format="pandas",
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# --- exact n-gram Jaccard verification ---------------------------------------

def exact_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa = set(_shingle_hashes(text_a or "", n).tolist())
    sb = set(_shingle_hashes(text_b or "", n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_exact(pairs_table: pa.Table, texts_by_id: dict, n: int = 3,
                       threshold: float = 0.7) -> pa.Table:
    """Exact n-gram Jaccard over candidate pairs (verification join).

    ``texts_by_id`` is the small candidate-side lookup (only docs appearing
    in pairs — fetched once, broadcastable via ``ray.put`` at scale).
    """
    rows = []
    for r in pairs_table.to_pylist():
        j = exact_jaccard(texts_by_id[r["id_a"]], texts_by_id[r["id_b"]], n)
        if j >= threshold:
            rows.append({"id_a": r["id_a"], "id_b": r["id_b"], "jaccard": j})
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]),
    )
