"""coralogixprocessor transaction attributes — Go-loop restatement parity.

The reference walks each trace's span tree recursively
(processor/coralogixprocessor/internal/transactions/transactions.go:55-66,
span_tree.go:18-78). ``_reference_txn`` restates that walk literally
(dict + explicit recursion); the vectorized kernel and the distributed
sorted-scan stage must match it on engineered traces covering every
branch: multiple empty-parent spans (demotion), missing parents (orphan
subtrees), SERVER/CONSUMER transaction boundaries, the no-empty-parent
earliest-span fallback root, and traces split across block boundaries.
"""

import numpy as np
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.coralogix import (
    SPAN_KIND_CONSUMER,
    SPAN_KIND_SERVER,
    _txn_kernel,
    transaction_attributes,
)

COLS = ("trace_id", "span_id", "parent_span_id", "name", "span_kind",
        "start_us")
KERN = ("trace_id", "span_id", "parent_span_id", "name", "span_kind",
        "start_us", "cgx_transaction", "cgx_transaction_root")


def _reference_txn(rows):
    """Literal restatement of the Go walk. rows = list of dicts."""
    by_trace = {}
    for r in rows:
        by_trace.setdefault(r["trace_id"], []).append(r)
    txn = {}
    root_mark = {}
    for spans in by_trace.values():
        by_id = {s["span_id"]: s for s in spans}
        # root selection: empty-parent, earliest start wins (ties: first
        # in span order = our deterministic span_id order); fallback =
        # earliest overall
        empties = [s for s in spans if s["parent_span_id"] is None]
        pool = empties if empties else spans
        root = min(pool, key=lambda s: (s["start_us"], s["span_id"]))
        children = {}
        for s in spans:
            p = s["parent_span_id"]
            if s is root or p is None or p not in by_id:
                continue
            children.setdefault(p, []).append(s)

        def mark_root(s):
            txn[s["span_id"]] = s["name"]
            root_mark[s["span_id"]] = True

        def walk(s, name):
            for c in children.get(s["span_id"], []):
                if c["span_kind"] in (SPAN_KIND_SERVER, SPAN_KIND_CONSUMER):
                    mark_root(c)
                    walk(c, c["name"])
                else:
                    txn[c["span_id"]] = name
                    walk(c, name)

        mark_root(root)
        walk(root, root["name"])
    return txn, root_mark


def _mk_table(rows):
    return pa.table({
        "trace_id": pa.array([r["trace_id"] for r in rows], pa.int64()),
        "span_id": pa.array([r["span_id"] for r in rows], pa.int64()),
        "parent_span_id": pa.array([r["parent_span_id"] for r in rows],
                                   pa.int64()),
        "name": pa.array([r["name"] for r in rows], pa.string()),
        "span_kind": pa.array([r["span_kind"] for r in rows], pa.int64()),
        "start_us": pa.array([r["start_us"] for r in rows], pa.int64()),
    })


def _check(rows, out: pa.Table):
    txn, root_mark = _reference_txn(rows)
    got = out.to_pylist()
    assert len(got) == len(rows)
    for g in got:
        sid = g["span_id"]
        assert g["cgx_transaction"] == txn.get(sid), (sid, g)
        assert g["cgx_transaction_root"] == root_mark.get(sid), (sid, g)


def _random_rows(seed, n_traces=40, max_spans=12):
    rng = np.random.RandomState(seed)
    rows = []
    sid = 0
    for t in range(n_traces):
        n = int(rng.randint(1, max_spans + 1))
        ids = list(range(sid, sid + n))
        sid += n
        for i, s in enumerate(ids):
            roll = rng.rand()
            if i == 0:
                parent = None if roll < 0.8 else ids[0] + 10_000_000
            elif roll < 0.1:
                parent = None  # extra empty parent -> demotion path
            elif roll < 0.25:
                parent = s + 10_000_000  # missing parent -> orphan
            else:
                parent = ids[int(rng.randint(0, i))]
            rows.append({
                "trace_id": t, "span_id": s, "parent_span_id": parent,
                "name": f"op{s % 7}",
                "span_kind": int(rng.randint(0, 6)),
                "start_us": s,  # unique, increasing within trace
            })
    return rows


def test_kernel_matches_reference_walk():
    for seed in (0, 1, 2, 3):
        rows = _random_rows(seed)
        out = _txn_kernel(_mk_table(rows), *KERN)
        _check(rows, out)


def test_kernel_engineered_branches():
    rows = [
        # trace 0: root(0) <- server(1) <- internal(2); consumer(3) under 2
        dict(trace_id=0, span_id=0, parent_span_id=None, name="root0",
             span_kind=1, start_us=0),
        dict(trace_id=0, span_id=1, parent_span_id=0, name="srv",
             span_kind=SPAN_KIND_SERVER, start_us=1),
        dict(trace_id=0, span_id=2, parent_span_id=1, name="inner",
             span_kind=1, start_us=2),
        dict(trace_id=0, span_id=3, parent_span_id=2, name="cons",
             span_kind=SPAN_KIND_CONSUMER, start_us=3),
        # trace 1: two empty parents, later one demoted with its child
        dict(trace_id=1, span_id=10, parent_span_id=None, name="win",
             span_kind=1, start_us=0),
        dict(trace_id=1, span_id=11, parent_span_id=None, name="lose",
             span_kind=1, start_us=5),
        dict(trace_id=1, span_id=12, parent_span_id=11, name="lost-child",
             span_kind=SPAN_KIND_SERVER, start_us=6),
        dict(trace_id=1, span_id=13, parent_span_id=10, name="kept",
             span_kind=1, start_us=7),
        # trace 2: no empty parent -> earliest-span fallback root
        dict(trace_id=2, span_id=20, parent_span_id=999_999, name="fb-root",
             span_kind=1, start_us=0),
        dict(trace_id=2, span_id=21, parent_span_id=20, name="fb-child",
             span_kind=1, start_us=1),
        # trace 3: orphan subtree (missing parent)
        dict(trace_id=3, span_id=30, parent_span_id=None, name="r3",
             span_kind=1, start_us=0),
        dict(trace_id=3, span_id=31, parent_span_id=888_888, name="orf",
             span_kind=1, start_us=1),
        dict(trace_id=3, span_id=32, parent_span_id=31, name="orf-child",
             span_kind=SPAN_KIND_SERVER, start_us=2),
    ]
    out = _txn_kernel(_mk_table(rows), *KERN)
    _check(rows, out)
    got = {g["span_id"]: g for g in out.to_pylist()}
    # spot assertions on the interesting rows
    assert got[2]["cgx_transaction"] == "srv"          # inherits boundary
    assert got[3]["cgx_transaction_root"] is True       # consumer boundary
    assert got[11]["cgx_transaction"] is None           # demoted empty
    assert got[12]["cgx_transaction"] is None           # child of demoted
    assert got[20]["cgx_transaction_root"] is True      # fallback root
    assert got[31]["cgx_transaction"] is None           # orphan
    assert got[32]["cgx_transaction"] is None           # unreachable server


@pytest.mark.parametrize("target_rows", [4, 4096])
def test_stage_matches_kernel_across_block_sizes(ray_session, target_rows):
    """Distributed stage (sorted blocks + edge task) == whole-table kernel,
    including with 4-row blocks that split every trace."""
    import ray.data as rd

    rows = _random_rows(7, n_traces=25, max_spans=9)
    tbl = _mk_table(rows)
    out = transaction_attributes(
        rd.from_arrow(tbl), target_rows=target_rows
    ).to_arrow_refs()
    import ray

    got = pa.concat_tables(ray.get(out)).sort_by(
        [("trace_id", "ascending"), ("span_id", "ascending")])
    _check(rows, got)


def test_stage_empty_input_schema_stable(ray_session):
    import ray.data as rd

    empty = _mk_table([])
    out = transaction_attributes(rd.from_arrow(empty))
    schema = out.schema()
    assert schema.names[-2:] == ["cgx_transaction", "cgx_transaction_root"]
    assert out.count() == 0
