"""segment_dedup: brute-force equivalence, boundary-carry, edge cases."""

import numpy as np
import pandas as pd
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.paradedup import segment_dedup

SEP = "\n\n"


def _brute(df, sep=SEP):
    seen = set()
    out = {}
    for _, row in df.sort_values("doc_id").iterrows():
        kept = []
        for s in row["text"].split(sep):
            if s not in seen:
                seen.add(s)
                kept.append(s)
        if kept:
            out[row["doc_id"]] = (sep.join(kept), len(kept))
    return out


def _run(df, sep=SEP, blocks=4):
    got = segment_dedup(rd.from_pandas(df, override_num_blocks=blocks),
                        id_col="doc_id", text_col="text", sep=sep)
    return {r["doc_id"]: (r["text_clean"], r["n_kept"])
            for r in got.take_all()}


def test_random_matches_bruteforce():
    rng = np.random.default_rng(13)
    paras = [f"para-{i}" for i in range(40)]
    rows = []
    for d in range(60):
        k = int(rng.integers(1, 8))
        rows.append((d, SEP.join(rng.choice(paras, size=k))))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype(np.int64)
    assert _run(df) == _brute(df)
    assert _run(df, blocks=1) == _brute(df)  # single block = no carry


def test_fully_duplicate_doc_vanishes():
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": ["a" + SEP + "b", "a" + SEP + "b", "b" + SEP + "c"],
    })
    got = _run(df, blocks=2)
    assert got == {1: ("a" + SEP + "b", 2), 3: ("c", 1)}


def test_doc_straddles_many_blocks():
    """One doc holding most winners forces multi-block runs through the
    driver boundary carry."""
    segs = [f"s{i:03d}" for i in range(300)]
    df = pd.DataFrame({
        "doc_id": np.array([7, 8], dtype=np.int64),
        "text": [SEP.join(segs), SEP.join(segs[:5] + ["unique"])],
    })
    got = _run(df, blocks=6)
    assert got[7] == (SEP.join(segs), 300)
    assert got[8] == ("unique", 1)


def test_within_doc_duplicates_keep_first_position():
    df = pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64),
        "text": ["x" + SEP + "y" + SEP + "x" + SEP + "z"],
    })
    assert _run(df, blocks=1) == {1: ("x" + SEP + "y" + SEP + "z", 3)}


def test_empty_input():
    df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                       "text": pd.Series([], dtype="string")})
    assert _run(df, blocks=1) == {}
