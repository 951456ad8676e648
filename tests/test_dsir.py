"""DSIR importance-resampling selection (stages/dsir.py).

No SQL oracle (float ln LUT fit — the perplexity_filter precedent);
these tests pin: exact parity with a pure-Python reference
implementation of the same math, partition invariance (the int64 LUT
makes accumulation exact), and the selection-quality property that
target-like docs outrank off-target ones.
"""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from opentelemetry_collector_contrib_ray.functions.hashing import md5_u64
from opentelemetry_collector_contrib_ray.stages.dsir import (
    _QUANT,
    dsir_select,
    dsir_weights,
    fit_target_counts,
)

B = 512


def _ref_grams(text):
    words = text.split(" ")
    grams = list(words)
    grams += [a + "\x1f" + b for a, b in zip(words, words[1:])]
    return [md5_u64(g) % B for g in grams]


def _ref_weights(raw, target):
    cnt_p = np.zeros(B)
    for t in target:
        for b in _ref_grams(t):
            cnt_p[b] += 1
    cnt_q = np.zeros(B)
    for t in raw:
        for b in _ref_grams(t):
            cnt_q[b] += 1
    lut = np.rint(_QUANT * (
        np.log((cnt_p + 1.0) / (cnt_p.sum() + B))
        - np.log((cnt_q + 1.0) / (cnt_q.sum() + B)))).astype(np.int64)
    return [int(sum(lut[b] for b in _ref_grams(t))) for t in raw]


RAW = [
    "the quick brown fox jumps over the lazy dog",
    "import numpy as np and compute the matrix product",
    "stocks rallied today as markets digested the jobs report",
    "def main prints hello world and returns zero",
    "the cat sat on the mat",
    "parallel matrix kernels and numpy broadcasting tricks",
]
TARGET = [
    "import numpy as np",
    "def main returns zero exit code",
    "numpy broadcasting and matrix kernels",
    "compute the matrix product with numpy",
]


def _mk_ds(nparts=3):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(RAW)), pa.int64()),
        "text": RAW,
    })).repartition(nparts)


def _weights_dict(ds):
    out = dsir_weights(ds, pa.array(TARGET), n_buckets=B)
    t = pa.concat_tables([b for b in ray.get(out.to_arrow_refs())
                          if b.num_rows])
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("weight").to_pylist()))


def test_matches_pure_python_reference():
    got = _weights_dict(_mk_ds())
    exp = _ref_weights(RAW, TARGET)
    assert [got[i] for i in range(len(RAW))] == exp


def test_partition_invariant():
    assert _weights_dict(_mk_ds(1)) == _weights_dict(_mk_ds(6))


def test_fit_counts_include_bigrams():
    cnt = fit_target_counts(pa.array(["a b"]), n_buckets=B)
    # unigrams a, b + bigram a\x1fb = 3 grams
    assert cnt.sum() == 3


def test_select_prefers_target_like_docs():
    sel = dsir_select(_mk_ds(), pa.array(TARGET), k=3, n_buckets=B)
    t = pa.concat_tables([b for b in ray.get(sel.to_arrow_refs())
                          if b.num_rows])
    picked = set(t.column("doc_id").to_pylist())
    # the three code/numpy docs outrank prose/news
    assert picked == {1, 3, 5}
    # ordering: weight desc within the selection
    w = t.column("weight").to_pylist()
    assert w == sorted(w, reverse=True)
