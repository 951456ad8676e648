"""pkg/resourcetotelemetry + pkg/batchpersignal ports.

map_merge pins the pcommon.Map ``PutEmpty`` semantics
(resource_to_telemetry.go:107-112): overwrite keeps the original entry
position, new keys append in from-entry order. batch_per_signal_index
pins the first-seen batch creation order of batchpersignal.go:14-155 and
the equality of the broadcast and sorted-carry paths (gate=0 forces the
scale path).
"""

import numpy as np
import pyarrow as pa

from opentelemetry_collector_contrib_ray.functions.maps import map_merge
from opentelemetry_collector_contrib_ray.stages.batchper import (
    batch_per_signal_index,
)

MAP_T = pa.map_(pa.string(), pa.string())


def _m(rows):
    return pa.array(rows, MAP_T)


def test_map_merge_overwrite_in_place_and_append_order():
    to = _m([[("a", "1"), ("b", "2"), ("c", "3")]])
    fr = _m([[("z", "Z"), ("b", "B"), ("y", "Y")]])
    out = map_merge(to, fr).to_pylist()
    # b overwritten at its original slot; z,y append in FROM order
    assert out == [[("a", "1"), ("b", "B"), ("c", "3"),
                    ("z", "Z"), ("y", "Y")]]


def test_map_merge_null_and_empty_rows():
    to = _m([[("a", "1")], None, [], None])
    fr = _m([None, [("k", "v")], None, None])
    out = map_merge(to, fr).to_pylist()
    # null/empty from -> to untouched; null to treated as empty;
    # both null -> null
    assert out == [[("a", "1")], [("k", "v")], [], None]


def test_map_merge_all_from_empty_returns_input():
    to = _m([[("a", "1")], [("b", "2")]])
    fr = _m([[], []])
    assert map_merge(to, fr).to_pylist() == to.to_pylist()


def _mk_ds(n=400, groups=23):
    rng = np.arange(n, dtype=np.int64)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "event_id": rng,
        "event_type": pa.array([f"t{int(i) % 3}" for i in rng]),
        "user_id": (rng * 7919) % groups,
    })).repartition(5)


def _expected(tbl):
    # first-seen dense rank by event_id order
    order = np.argsort(tbl.column("event_id").to_numpy())
    keys = list(zip(tbl.column("event_type").to_pylist(),
                    tbl.column("user_id").to_pylist()))
    seen, exp = {}, {}
    for i in order:
        k = keys[i]
        if k not in seen:
            seen[k] = len(seen)
        exp[int(tbl.column("event_id")[i].as_py())] = seen[k]
    return exp


def test_batch_per_signal_first_seen_rank():
    ds = _mk_ds()
    out = batch_per_signal_index(
        ds, keys=("event_type", "user_id"), order_col="event_id"
    ).to_arrow_refs()
    import ray
    tbl = pa.concat_tables([t for t in ray.get(out) if t.num_rows])
    exp = _expected(pa.concat_tables(
        [t.select(["event_id", "event_type", "user_id"]) for t in [tbl]]))
    got = dict(zip(tbl.column("event_id").to_pylist(),
                   tbl.column("batch_idx").to_pylist()))
    assert got == exp
    # dense: indexes are 0..G-1
    assert sorted(set(got.values())) == list(range(len(set(got.values()))))


def test_batch_per_signal_paths_agree():
    ds = _mk_ds(n=300, groups=11)
    import ray
    a = pa.concat_tables([t for t in ray.get(
        batch_per_signal_index(ds, ("event_type", "user_id"), "event_id")
        .to_arrow_refs()) if t.num_rows])
    b = pa.concat_tables([t for t in ray.get(
        batch_per_signal_index(ds, ("event_type", "user_id"), "event_id",
                               gate=0).to_arrow_refs()) if t.num_rows])
    da = dict(zip(a.column("event_id").to_pylist(),
                  a.column("batch_idx").to_pylist()))
    db = dict(zip(b.column("event_id").to_pylist(),
                  b.column("batch_idx").to_pylist()))
    assert da == db


def test_map_diff_reference_example():
    """metadata.go:23-34 — the documented labels example."""
    from opentelemetry_collector_contrib_ray.functions.maps import map_diff
    old = _m([[("env", "test"), ("team", "otell"), ("usser", "bob")],
              [], None])
    new = _m([[("env", "test"), ("team", "otel"), ("user", "bob")],
              [("a", "1")], [("b", "2")]])
    added, removed, updated = map_diff(old, new)
    assert added.to_pylist() == [[("user", "bob")], [("a", "1")],
                                 [("b", "2")]]
    # removed keeps the OLD value
    assert removed.to_pylist() == [[("usser", "bob")], [], []]
    # updated carries the NEW value
    assert updated.to_pylist() == [[("team", "otel")], [], []]


def test_map_diff_empty_sides():
    from opentelemetry_collector_contrib_ray.functions.maps import map_diff
    old = _m([[], []])
    new = _m([[("k", "v")], []])
    a, r, u = map_diff(old, new)
    assert a.to_pylist() == [[("k", "v")], []]
    assert r.to_pylist() == [[], []]
    assert u.to_pylist() == [[], []]


def test_entity_events_delete_drops_state_details():
    """entity_events.go: delete details expose only id + type — the
    encoder must blank attributes and null the interval on deletes."""
    import ray
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.functions.maps import (
        map_from_columns,
    )
    from opentelemetry_collector_contrib_ray.stages.entities import (
        entity_events_to_logs,
    )

    t = pa.table({"uid": ["u1", "u2"], "ph": ["Running", "Failed"]})
    src = pa.table({
        "time_unix_nano": pa.array([1, 2], pa.int64()),
        "event": ["state", "delete"],
        "entity_type": ["k8s.pod", "k8s.pod"],
        "entity_id": map_from_columns(t, {"k8s.pod.uid": "uid"}),
        "entity_attrs": map_from_columns(t, {"phase": "ph"}),
        "interval_ms": pa.array([60000, 60000], pa.int64()),
    })
    out = pa.concat_tables(ray.get(
        entity_events_to_logs(rd.from_arrow(src)).to_arrow_refs()))
    got = {r["otel.entity.event.type"]: r for r in out.to_pylist()}
    st, de = got["entity_state"], got["entity_delete"]
    assert st["otel.entity.attributes"] == [("phase", "Running")]
    assert st["otel.entity.interval"] == 60000
    assert de["otel.entity.attributes"] == []
    assert de["otel.entity.interval"] is None
    assert de["otel.entity.id"] == [("k8s.pod.uid", "u2")]
    assert st["scope_entity_event_as_log"] is True


def test_boilerplate_filter_paths_agree():
    """boilerplate_filter's driver-merge and shuffle-groupby paths
    produce identical cleaned docs (gate=0 forces the scale path)."""
    import ray
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.paradedup import (
        boilerplate_filter,
    )

    docs = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": [
            "cookie banner|real content one|footer",
            "cookie banner|unique text two|footer",
            "cookie banner|another thing|footer",
            "fresh article body|cookie banner",
            "totally unique document",
            "cookie banner|footer",          # fully boilerplate -> vanishes
            "footer|one of a kind line",
            "rare solo",
        ],
    })
    ds = rd.from_arrow(docs).repartition(3)

    def run(**kw):
        out = boilerplate_filter(ds, "doc_id", "text", sep="|",
                                 min_docs=3, **kw)
        t = pa.concat_tables(
            [b.select(["doc_id", "text_clean", "n_kept"])
             for b in ray.get(out.to_arrow_refs()) if b.num_rows])
        return sorted(t.to_pylist(), key=lambda r: r["doc_id"])

    a, b = run(), run(gate=0)
    assert a == b
    got = {r["doc_id"]: r["text_clean"] for r in a}
    # 'cookie banner' (5 docs) and 'footer' (5 docs) are boilerplate
    assert got[0] == "real content one"
    assert got[4] == "totally unique document"
    assert 5 not in got  # fully-boilerplate doc vanishes
    assert got[6] == "one of a kind line"
