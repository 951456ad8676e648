"""vocab stage: md5 tokenizer SQL parity, remap round-trip, guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opentelemetry_collector_contrib_ray.functions.hashing import md5_u64
from opentelemetry_collector_contrib_ray.stages.vocab import (
    Md5Tokenize,
    remap_tokens,
)

V = 101  # tiny vocab keeps collisions frequent — stresses the LUT


def _docs():
    return pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the cat sat", "", "a a a", "one two three four five"],
    })


def test_md5_tokenize_matches_reference():
    ds = rd.from_pandas(_docs(), override_num_blocks=2)
    out = ds.map_batches(Md5Tokenize(vocab_size=V),
                         batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for _, row in out.iterrows():
        words = row["text"].split(" ")  # '' -> [''] like string_split
        expect = [md5_u64(w) % V for w in words]
        assert list(row["tokens"]) == expect


def test_remap_roundtrip_byte_identical():
    """mapping then inverse-mapping restores every token list exactly —
    the per-row token-array invariant under a reversible remap."""
    rng = np.random.default_rng(5)
    perm = rng.permutation(V).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(V, dtype=np.int32)

    ds = rd.from_pandas(_docs(), override_num_blocks=2)
    tok = ds.map_batches(Md5Tokenize(vocab_size=V), batch_format="pyarrow")
    orig = {r["doc_id"]: list(r["tokens"]) for r in tok.take_all()}

    back = remap_tokens(remap_tokens(tok, perm), inv)
    got = {r["doc_id"]: list(r["tokens"]) for r in back.take_all()}
    assert got == orig
    # and the forward map actually changed something
    fwd = {r["doc_id"]: list(r["tokens"])
           for r in remap_tokens(tok, perm).take_all()}
    assert fwd != orig


def test_remap_positional_alignment():
    perm = ((np.arange(V) * 7 + 3) % V).astype(np.int32)
    ds = rd.from_pandas(_docs(), override_num_blocks=2)
    tok = ds.map_batches(Md5Tokenize(vocab_size=V), batch_format="pyarrow")
    before = {r["doc_id"]: list(r["tokens"]) for r in tok.take_all()}
    after = {r["doc_id"]: list(r["tokens"])
             for r in remap_tokens(tok, perm).take_all()}
    for d, toks in before.items():
        assert after[d] == [int(perm[t]) for t in toks]


def test_remap_out_of_range_raises():
    t = pa.table({"tokens": pa.array([[0, 5, 200]], pa.list_(pa.int32()))})
    ds = rd.from_arrow(t)
    small = np.arange(V, dtype=np.int32)
    with pytest.raises(Exception, match="outside mapping"):
        remap_tokens(ds, small).materialize()
