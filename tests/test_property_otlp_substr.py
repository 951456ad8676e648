"""Property-based pins (hypothesis) for the round-5 kernels: the OTLP
proto wire codecs (random pdata round-trips, no Ray needed) and the
substring-dedup numpy chain (random low-alphabet corpora vs brute force,
driven locally through the same stage callables the Dataset pipeline
uses)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# --- OTLP codec round-trips ----------------------------------------------

# AnyValue-representable attribute values (proto3 oneof members)
ATTR_VAL = st.recursive(
    st.one_of(
        st.booleans(),
        st.integers(-(2 ** 63), 2 ** 63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=8),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(min_size=1, max_size=5), children,
                        max_size=3),
    ),
    max_leaves=6,
)
ATTRS = st.dictionaries(st.text(min_size=1, max_size=6), ATTR_VAL,
                        max_size=4).map(
    lambda d: json.dumps(d, sort_keys=True))
HEX16 = st.sampled_from([None, "0af7651916cd43dd8448eb211c80319c",
                         "ff" * 16])
HEX8 = st.sampled_from([None, "b7ad6b7169203331", "aa" * 8])
U64 = st.integers(0, 2 ** 64 - 1)


@st.composite
def log_rows(draw):
    n = draw(st.integers(1, 6))
    return pa.table({
        "time_unix_nano": pa.array(
            [draw(U64) for _ in range(n)], pa.uint64()),
        "observed_time_unix_nano": pa.array(
            [draw(U64) for _ in range(n)], pa.uint64()),
        "severity_number": pa.array(
            [draw(st.integers(0, 24)) for _ in range(n)], pa.int32()),
        "severity_text": pa.array(
            [draw(st.one_of(st.none(), st.text(max_size=6)))
             for _ in range(n)], pa.string()),
        "body": pa.array(
            [draw(st.one_of(st.none(), st.text(max_size=20)))
             for _ in range(n)], pa.string()),
        "trace_id": pa.array([draw(HEX16) for _ in range(n)], pa.string()),
        "span_id": pa.array([draw(HEX8) for _ in range(n)], pa.string()),
        "attributes": pa.array([draw(ATTRS) for _ in range(n)],
                               pa.string()),
        "resource_attributes": pa.array(
            [draw(ATTRS) for _ in range(n)], pa.string()),
        "scope_name": pa.array(
            [draw(st.one_of(st.none(), st.text(min_size=1, max_size=6)))
             for _ in range(n)], pa.string()),
    })


def _norm_log_row(r: dict) -> tuple:
    # proto3 cannot distinguish unset from default: "" strings and {}
    # attrs decode as unset/empty — normalize both sides the same way
    return (
        r["time_unix_nano"], r["observed_time_unix_nano"],
        r["severity_number"],
        r["severity_text"] or None,
        r["body"] or None,
        r["trace_id"] or None, r["span_id"] or None,
        r["attributes"], r["resource_attributes"],
        r["scope_name"] or None,
    )


@settings(max_examples=40, deadline=None)
@given(log_rows())
def test_logsdata_roundtrip_property(tbl):
    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        _rows_to_table,
        decode_logs_data,
        encode_logs_data,
    )

    back = _rows_to_table(decode_logs_data(encode_logs_data(tbl)))
    got = sorted(map(_norm_log_row, back.to_pylist()))
    want = sorted(map(_norm_log_row, tbl.to_pylist()))
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=5), ATTR_VAL,
                       max_size=5))
def test_kvlist_roundtrip_property(d):
    from opentelemetry_collector_contrib_ray.sources.otlpproto import (
        decode_kvlist,
        encode_kvlist,
    )

    assert decode_kvlist(encode_kvlist(d)) == d


# --- substring dedup numpy chain vs brute force ---------------------------

def _local_substr_cuts(docs: list[str], k: int):
    """Drive the SAME stage callables the Dataset pipeline uses, locally
    on one batch (the driver winner path)."""
    from opentelemetry_collector_contrib_ray.stages.substrdedup import (
        _cuts_from_sorted,
        _DupPositions,
        _HashPartial,
        _merge_spans,
    )

    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    partial = _HashPartial("text", k)(tbl)
    h = partial.column("h").to_numpy(zero_copy_only=False)
    n = partial.column("n").to_numpy(zero_copy_only=False)
    dup = np.sort(h[n >= 2].astype(np.uint64))
    cands = _DupPositions(dup, "doc_id", "text", k)(tbl)
    if cands.num_rows == 0:
        return {}
    gram = np.frombuffer(
        cands.column("gram").combine_chunks().buffers()[1], dtype=f"S{k}")
    doc = cands.column("doc_id").to_numpy(zero_copy_only=False)
    pos = cands.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, doc, gram))
    gram, doc, pos = gram[order], doc[order], pos[order]
    breaks = np.empty(len(gram), dtype=bool)
    breaks[0] = True
    breaks[1:] = gram[1:] != gram[:-1]
    cut_doc, cut_pos = _cuts_from_sorted(doc, pos, breaks)
    out_doc, n_spans, n_chars = _merge_spans(
        cut_doc.astype(np.int64), cut_pos.astype(np.int64), k)
    return {int(d): (int(a), int(b))
            for d, a, b in zip(out_doc, n_spans, n_chars)}


# tiny alphabet forces heavy duplication; k small so short docs matter
DOC = st.text(alphabet="ab", min_size=0, max_size=24)


@settings(max_examples=60, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8), st.integers(3, 7))
def test_substr_cuts_match_brute_force_property(docs, k):
    from .test_substrdedup import brute_force

    want = brute_force(dict(enumerate(docs)), k)
    got = _local_substr_cuts(docs, k)
    assert got == want
