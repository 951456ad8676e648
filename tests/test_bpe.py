"""BPE merge training/encoding — pinned against an independent
straight-from-the-paper reference implementation (Sennrich et al. 2016)
and partitioning invariance."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.bpe import (
    END_OF_WORD,
    bpe_train_and_encode,
    encode_word,
    train_bpe_merges,
    word_counts,
)


# ---------------------------------------------------------------------------
# independent reference (naive, list-based — deliberately different code)


def ref_train(word_counts_dict, n_merges):
    vocab = {}
    for w, n in word_counts_dict.items():
        vocab[" ".join(list(w) + [END_OF_WORD])] = \
            vocab.get(" ".join(list(w) + [END_OF_WORD]), 0) + n
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, n in vocab.items():
            syms = w.split(" ")
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        mx = max(pairs.values())
        if mx < 2:
            break
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append(best)
        nv = {}
        find = " ".join(best)
        repl = "".join(best)
        for w, n in vocab.items():
            syms = w.split(" ")
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(repl)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = " ".join(out)
            nv[k] = nv.get(k, 0) + n
        vocab = nv
    return merges


CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2}


def test_train_matches_reference():
    got = train_bpe_merges(CORPUS, 10)
    want = ref_train(CORPUS, 10)
    assert got == want
    # the classic first merges for this corpus shape
    assert ("e", "s") in got or ("s", "t") in got


def test_train_stops_when_no_pair_repeats():
    merges = train_bpe_merges({"ab": 1, "cd": 1}, 50)
    # every pair has count 1 → nothing merits a merge
    assert merges == []


def test_encode_applies_merges_in_rank_order():
    merges = train_bpe_merges(CORPUS, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    syms = encode_word("newest", ranks)
    assert "".join(syms) == "newest" + END_OF_WORD
    # re-applying the merges sequentially must give the same split
    ref_syms = list("newest") + [END_OF_WORD]
    for a, b in merges:
        out, i = [], 0
        while i < len(ref_syms):
            if i + 1 < len(ref_syms) and ref_syms[i] == a and \
                    ref_syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(ref_syms[i])
                i += 1
        ref_syms = out
    assert syms == ref_syms


def test_unknown_word_falls_back_to_chars():
    ranks = {p: i for i, p in
             enumerate(train_bpe_merges(CORPUS, 10))}
    syms = encode_word("zq", ranks)
    assert syms == ["z", "q", END_OF_WORD] or "".join(syms) == \
        "zq" + END_OF_WORD


def test_distributed_word_counts_and_invariance(ray_session):
    import ray

    texts = ["low low lower", "newest newest widest", "new low",
             "NEWEST wide"] * 3
    t = pa.table({"text": pa.array(texts, pa.string())})
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        wc = word_counts(ds, "text")
        assert wc["low"] == 9 and wc["newest"] == 9  # lowercased
    # full pipeline: same merges at any partitioning
    ds1 = ray.data.from_arrow(t).repartition(1)
    ds4 = ray.data.from_arrow(t).repartition(4)
    enc1, m1 = bpe_train_and_encode(ds1, "text", n_merges=8)
    enc4, m4 = bpe_train_and_encode(ds4, "text", n_merges=8)
    assert m1 == m4
    r1 = sorted(enc1.to_pandas()["bpe_tokens"].map(list).map(tuple))
    r4 = sorted(enc4.to_pandas()["bpe_tokens"].map(list).map(tuple))
    assert r1 == r4


def test_token_conservation(ray_session):
    import ray

    texts = ["aaa bbb aaa", "ccc"]
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())}))
    enc, merges = bpe_train_and_encode(ds, "text", n_merges=4)
    df = enc.to_pandas()
    # every doc encodes to >= number of words tokens (each word ends
    # with at least one symbol) and ids are non-negative
    for toks, text in zip(df["bpe_tokens"], df["text"]):
        assert len(toks) >= len(text.split())
        assert all(t >= 0 for t in toks)
