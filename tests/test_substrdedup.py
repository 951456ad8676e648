"""Exact substring dedup (stages/substrdedup.py) — brute-force reference
comparison + both size-gate paths + the ASCII guard."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_contrib_ray.stages.substrdedup import (
    _merge_spans,
    _rolling_hashes,
    substring_dedup_cuts,
)


def brute_force(docs: dict[int, str], k: int) -> dict[int, tuple[int, int]]:
    """(n_spans_cut, n_chars_cut) per doc via the definition: every
    occurrence of a k-gram except the globally-first (doc, pos) marks
    [pos, pos+k-1]; merge per doc."""
    first: dict[str, tuple[int, int]] = {}
    for d in sorted(docs):
        t = docs[d] or ""
        for i in range(len(t) - k + 1):
            g = t[i:i + k]
            if g not in first:
                first[g] = (d, i)
    cuts: dict[int, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        t = docs[d] or ""
        for i in range(len(t) - k + 1):
            if first[t[i:i + k]] != (d, i):
                cuts.setdefault(d, []).append((i, i + k - 1))
    out = {}
    for d, spans in cuts.items():
        spans.sort()
        merged = [list(spans[0])]
        for s, e in spans[1:]:
            if s > merged[-1][1]:
                merged.append([s, e])
            else:
                merged[-1][1] = max(merged[-1][1], e)
        out[d] = (len(merged), sum(e - s + 1 for s, e in merged))
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog again and again ok",
    # exact copy of doc 1 -> every position cut, one merged span
    2: "the quick brown fox jumps over the lazy dog again and again ok",
    # shares a long prefix with doc 1 only
    3: "the quick brown fox jumps over the lazy cat sleeps here today",
    # internal repeat: the same 30-char phrase twice within one doc
    4: ("abcdefghijklmnopqrstuvwxyz0123 filler middle part here "
        "abcdefghijklmnopqrstuvwxyz0123 tail"),
    5: "too short",
    6: "",
    7: "completely unique text with no repeats of any window at all!!",
}
K = 30


def _run(gate_kwargs):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(CORPUS), pa.int64()),
        "text": pa.array([CORPUS[d] for d in sorted(CORPUS)]),
    })).repartition(3)
    out = substring_dedup_cuts(ds, k=K, **gate_kwargs)
    return {r["doc_id"]: (r["n_spans_cut"], r["n_chars_cut"])
            for r in out.take_all()}


@pytest.mark.parametrize("gate_kwargs", [
    {},                               # driver winner pass (default)
    {"candidate_driver_rows": 0},     # distributed groupby(gram) path
])
def test_matches_brute_force_both_paths(ray_session, gate_kwargs):
    want = brute_force(CORPUS, K)
    got = _run(gate_kwargs)
    assert got == want
    # sanity on the fixture: full-copy doc 2 loses one whole-doc span
    assert got[2] == (1, len(CORPUS[2]))
    assert 3 in got and 4 in got       # prefix + internal repeat cut
    assert 5 not in got and 7 not in got


def test_rolling_hash_window_identity():
    """Equal windows hash equal; the hash of a window is position- and
    block-independent (prefix/inverse-power algebra)."""
    rng = np.random.default_rng(7)
    text = bytes(rng.integers(97, 123, size=500, dtype=np.uint8))
    b = np.frombuffer(text, dtype=np.uint8)
    k = 20
    h1, d1, p1 = _rolling_hashes(b, np.array([500]), k)
    # split the same bytes into two docs: windows inside each doc must
    # hash identically to the single-doc run at the same content
    h2, d2, p2 = _rolling_hashes(b, np.array([200, 300]), k)
    by_content = {}
    for h, p in zip(h1, p1):
        by_content[text[p:p + k]] = h
    for h, d, p in zip(h2, d2, p2):
        start = 0 if d == 0 else 200
        assert by_content[text[start + p:start + p + k]] == h
    # distinct windows (here: all unique by construction chance) mostly
    # distinct hashes — at minimum equal windows agree, tested above
    assert len(h1) == 500 - k + 1


def test_merge_spans_vectorized_edges():
    doc = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    s = np.array([0, 5, 40, 0, 100], dtype=np.int64)
    out_doc, n_spans, n_chars = _merge_spans(doc, s, k=10)
    # doc 1: [0,9]+[5,14] merge -> [0,14]; [40,49] separate
    # doc 2: [0,9], [100,109]
    assert out_doc.tolist() == [1, 2]
    assert n_spans.tolist() == [2, 2]
    assert n_chars.tolist() == [15 + 10, 10 + 10]


def test_non_ascii_guard(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["héllo wörld " * 20]),
    }))
    with pytest.raises(Exception, match="non-ASCII"):
        substring_dedup_cuts(ds, k=10).take_all()
    # byte semantics accepted explicitly
    out = substring_dedup_cuts(ds, k=10, require_ascii=False)
    assert out.count() >= 1  # the repeated phrase is cut


def test_no_duplicates_empty_result(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaaa bbbb cccc dddd",
                          "eeee ffff gggg hhhh"]),
    }))
    out = substring_dedup_cuts(ds, k=15)
    assert out.count() == 0
    sch = out.schema()
    assert sch.names == ["doc_id", "n_spans_cut", "n_chars_cut"]


def brute_force_apply(docs: dict[int, str], k: int) -> dict[int, str]:
    first: dict[str, tuple[int, int]] = {}
    for d in sorted(docs):
        t = docs[d] or ""
        for i in range(len(t) - k + 1):
            first.setdefault(t[i:i + k], (d, i))
    out = {}
    for d in sorted(docs):
        t = docs[d] or ""
        drop = np.zeros(len(t), dtype=bool)
        for i in range(len(t) - k + 1):
            if first[t[i:i + k]] != (d, i):
                drop[i:i + k] = True
        out[d] = "".join(c for c, x in zip(t, drop) if not x)
    return out


def test_apply_matches_brute_force(ray_session):
    from opentelemetry_collector_contrib_ray.stages.substrdedup import (
        substring_dedup_apply,
    )

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(CORPUS), pa.int64()),
        "text": pa.array([CORPUS[d] for d in sorted(CORPUS)]),
    })).repartition(3)
    got = {r["doc_id"]: r["text"]
           for r in substring_dedup_apply(ds, k=K).take_all()}
    want = brute_force_apply(CORPUS, K)
    assert got == want
    assert got[2] == ""                      # full copy vanishes
    assert got[5] == CORPUS[5]               # short doc untouched
    assert got[7] == CORPUS[7]               # unique doc untouched


def test_string_id_rejected_early(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["x" * 60, "y" * 60]),
    }))
    with pytest.raises(ValueError, match="integer column"):
        substring_dedup_cuts(ds, k=50)


def test_builder_stage_registered(ray_session):
    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        STAGE_REGISTRY,
    )

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(CORPUS), pa.int64()),
        "text": pa.array([CORPUS[d] for d in sorted(CORPUS)]),
    }))
    out = STAGE_REGISTRY["substring_dedup"](ds, k=K)
    got = {r["doc_id"]: r["text"] for r in out.take_all()}
    assert got == brute_force_apply(CORPUS, K)
