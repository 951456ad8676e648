"""Property-based tests (hypothesis) for the vectorized kernels whose
correctness rests on index arithmetic — each checked against a simple
per-row reference implementation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=5)
TEXT = st.lists(WORD, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_minhash_batch_matches_per_doc(texts):
    from opentelemetry_collector_contrib_ray.stages.neardup import MinHashSketch

    sk = MinHashSketch()
    batch = sk.signatures_batch(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        assert np.array_equal(batch[i], sk.signature(t)), (i, t)


@settings(max_examples=40, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_simhash_batch_matches_scalar(texts):
    from opentelemetry_collector_contrib_ray.stages.neardup import SimHashSketch

    sk = SimHashSketch()
    batch = sk.simhash_batch(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        assert int(batch[i]) == sk.simhash(t), (i, t)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=64))
def test_popcount64_matches_bin(vals):
    from opentelemetry_collector_contrib_ray.stages.neardup import popcount64

    arr = np.array(vals, dtype=np.uint64)
    assert popcount64(arr).tolist() == [bin(v).count("1") for v in vals]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.one_of(st.none(),
                       st.lists(st.integers(-50, 50), max_size=4)),
             min_size=1, max_size=10),
    st.lists(st.integers(-9, 9), min_size=1, max_size=3),
)
def test_append_editor_matches_reference(lists, appended):
    from opentelemetry_collector_contrib_ray.stages.transform import (
        Statement,
        Transform,
    )

    t = pa.table({"l": pa.array(lists, pa.list_(pa.int64()))})
    out = Transform([Statement("append", ("l", tuple(appended)))])(t)
    expect = [(x or []) + appended for x in lists]
    assert out.column("l").to_pylist() == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abc XYZ012", max_size=14), min_size=1,
                max_size=12))
def test_stop_count_matches_split_semantics(texts):
    from opentelemetry_collector_contrib_ray.stages.textstats import (
        STOPWORDS,
        _count_token_occurrences,
        _space_padded_tokens,
    )

    col = pa.array(texts, pa.string())
    got = _count_token_occurrences(_space_padded_tokens(col),
                                   sorted(STOPWORDS)).tolist()
    expect = [sum(1 for w in t.split(" ") if w in STOPWORDS) for t in texts]
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(1, 10**6), min_size=1, max_size=30),
       st.integers(1, 9), st.integers(0, 4))
def test_expr_math_matches_python(nums, mul, add):
    from opentelemetry_collector_contrib_ray.functions.expr import (
        compile_condition,
    )

    t = pa.table({"a": pa.array(nums, pa.int64())})
    cond = compile_condition(f"a * {mul} + {add} > 500000")
    expect = [n * mul + add > 500000 for n in nums]
    assert cond(t).to_pylist() == expect


@settings(max_examples=30, deadline=None)
@given(st.lists(st.sampled_from(
    ["trace", "DEBUG3", "warning", "err4", "17", "24", "bogus", "", "403"]),
    min_size=1, max_size=15))
def test_severity_parser_matches_dict(vals):
    from opentelemetry_collector_contrib_ray.stages.parsers import (
        SeverityParser,
        _builtin_severity_mapping,
    )

    table = _builtin_severity_mapping("default")
    p = SeverityParser("s", text_out=None)
    got = p(pa.table({"s": pa.array(vals, pa.string())}))[
        "severity_number"].to_pylist()
    assert got == [table.get(v.lower(), 0) for v in vals]


_map_entries = st.lists(
    st.tuples(st.text(alphabet="abcs", min_size=1, max_size=3),
              st.text(max_size=4)),
    max_size=6, unique_by=lambda kv: kv[0])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), _map_entries), min_size=1, max_size=8))
def test_map_delete_keep_partition_roundtrip(rows):
    """delete_matching_keys(p) ∪ keep_matching_keys(p) == original entries
    per row (order preserved within each side); nulls stay null."""
    from opentelemetry_collector_contrib_ray.functions.maps import (
        map_delete_matching_keys,
        map_keep_matching_keys,
    )

    col = pa.array(rows, pa.map_(pa.string(), pa.string()))
    deleted = map_delete_matching_keys(col, "^s").to_pylist()
    kept = map_keep_matching_keys(col, "^s").to_pylist()
    for orig, d, k in zip(rows, deleted, kept):
        if orig is None:
            assert d is None and k is None
            continue
        assert d == [kv for kv in orig if not kv[0].startswith("s")]
        assert k == [kv for kv in orig if kv[0].startswith("s")]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), _map_entries), min_size=1, max_size=8),
       st.integers(0, 5))
def test_map_limit_matches_reference_semantics(rows, n):
    """limit keeps ≤ n entries, priority key first then first-seen, in
    ORIGINAL order — checked against a per-row Python reference."""
    from opentelemetry_collector_contrib_ray.functions.maps import map_limit

    col = pa.array(rows, pa.map_(pa.string(), pa.string()))
    got = map_limit(col, n, ("a",)) if n >= 1 else map_limit(col, n)
    for orig, g in zip(rows, got.to_pylist()):
        if orig is None:
            assert g is None
            continue
        prio = [kv for kv in orig if kv[0] == "a"] if n >= 1 else []
        rest = [kv for kv in orig if not (n >= 1 and kv[0] == "a")]
        chosen = (prio + rest)[:n]
        keep_keys = {kv[0] for kv in chosen}
        assert g == [kv for kv in orig if kv[0] in keep_keys]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.lists(st.integers(-5, 5), max_size=5)),
                min_size=1, max_size=10),
       st.integers(0, 6))
def test_list_index_matches_python(rows, i):
    """body[i] over arbitrary list columns == Python indexing with nil
    for out-of-range / null rows."""
    from opentelemetry_collector_contrib_ray.functions.expr import (
        compile_value,
    )

    t = pa.table({"body": pa.array(rows, pa.list_(pa.int64()))})
    got = compile_value(f"body[{i}]")(t).to_pylist()
    expect = [r[i] if r is not None and len(r) > i else None for r in rows]
    assert got == expect


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3),            # band
                  st.integers(0, 4),            # bucket
                  st.integers(0, 30)),          # doc id (dupes possible)
        min_size=0, max_size=60,
    ),
    st.integers(2, 6),                          # max_bucket
)
def test_candidate_pairs_vectorized_matches_per_group(rows, max_bucket):
    """The r4 run-length pair builder vs the per-group reference
    (_candidate_pairs) over random bucket layouts, including oversize
    buckets and duplicate ids."""
    import pandas as pd

    from opentelemetry_collector_contrib_ray.stages.neardup import (
        _candidate_pairs,
        _candidate_pairs_vectorized,
    )

    tbl = pa.table({
        "band": pa.array([r[0] for r in rows], pa.int32()),
        "bucket": pa.array([r[1] for r in rows], pa.int64()),
        "doc_id": pa.array([r[2] for r in rows], pa.int64()),
    })
    fast = _candidate_pairs_vectorized(tbl, "doc_id", max_bucket,
                                       ["band", "bucket"])
    got = sorted(zip(fast.column("id_a").to_pylist(),
                     fast.column("id_b").to_pylist()))

    df = tbl.to_pandas()
    expect = []
    for _, g in df.groupby(["band", "bucket"], sort=False):
        p = _candidate_pairs(g, "doc_id", max_bucket)
        expect.extend(zip(p["id_a"].tolist(), p["id_b"].tolist()))
    assert got == sorted(expect)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3),                    # chunk
                  st.integers(0, 4),                    # chunk_val
                  st.integers(0, 30),                   # doc id
                  st.integers(0, 2**63 - 1)),           # simhash
        min_size=0, max_size=60,
    ),
    st.integers(2, 6),
    st.integers(0, 8),
)
def test_simhash_pairs_vectorized_matches_per_group(rows, max_bucket,
                                                    max_hamming):
    import pandas as pd

    from opentelemetry_collector_contrib_ray.stages.neardup import (
        _simhash_pairs,
        _simhash_pairs_vectorized,
    )

    tbl = pa.table({
        "chunk": pa.array([r[0] for r in rows], pa.int32()),
        "chunk_val": pa.array([r[1] for r in rows], pa.int64()),
        "doc_id": pa.array([r[2] for r in rows], pa.int64()),
        "simhash": pa.array([r[3] for r in rows], pa.uint64()),
    })
    fast = _simhash_pairs_vectorized(tbl, "doc_id", max_hamming, max_bucket)
    got = sorted(zip(fast.column("id_a").to_pylist(),
                     fast.column("id_b").to_pylist(),
                     fast.column("hamming").to_pylist()))

    df = tbl.to_pandas()
    expect = []
    for _, g in df.groupby(["chunk", "chunk_val"], sort=False):
        p = _simhash_pairs(g, "doc_id", max_hamming, max_bucket)
        expect.extend(zip(p["id_a"].astype(int).tolist(),
                          p["id_b"].astype(int).tolist(),
                          p["hamming"].astype(int).tolist()))
    assert got == sorted(expect)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=200),
       st.integers(1, 5))
def test_hll_fold_grouped_matches_per_key(hashes, n_keys):
    """Vectorized grouped register scatter ≡ per-key fold_hashes, and the
    frexp-based clz is exact (the r5 HLL vectorization must not move any
    estimate)."""
    from opentelemetry_collector_contrib_ray.stages.sketch import HLL, _clz64

    h = np.array(hashes, dtype=np.uint64)
    ref_clz = np.array(
        [64 - len(bin(int(v))[2:]) if v else 64 for v in h], dtype=np.uint8)
    assert np.array_equal(_clz64(h), ref_clz)

    hll = HLL(p=6)
    keys = (h % np.uint64(n_keys)).astype(np.int64)
    grouped = hll.fold_grouped(keys, h, n_keys)
    for k in range(n_keys):
        assert np.array_equal(grouped[k], hll.fold_hashes(h[keys == k])), k
