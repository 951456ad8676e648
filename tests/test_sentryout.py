"""sentryexporter parity — descriptors, tags, status tables,
transaction grouping vs a literal Go replay
(sentry_exporter.go:79-246, 248-433)."""

import json
import random

from opentelemetry_collector_contrib_ray.stages.sentryout import (
    convert_span,
    generate_span_descriptors,
    spans_to_sentry_table,
    status_from_span_status,
    tags_from_attributes,
)


def _span(i, trace="t" * 32, parent="", kind=3, **kw):
    base = {
        "trace_id": trace, "span_id": f"{i + 1:016x}",
        "parent_span_id": parent, "span_name": f"s{i}",
        "span_kind": kind, "start_time_unix_nano": 1_000 + i,
        "end_time_unix_nano": 2_000 + i, "status_code": 0,
        "status_message": "", "attributes": "{}",
        "resource_attributes": "{}", "scope_name": "lib",
        "scope_version": "1.0", "events": "[]",
    }
    base.update(kw)
    return base


# --- descriptors (generateSpanDescriptors) --------------------------------

def test_descriptors_priority_and_kinds():
    a = {"http.method": "GET", "db.system": "pg"}
    assert generate_span_descriptors("n", a, 3) == ("http.client",
                                                    "GET n")
    assert generate_span_descriptors("n", a, 2) == ("http.server",
                                                    "GET n")
    assert generate_span_descriptors("n", a, 0) == ("http", "GET n")
    assert generate_span_descriptors("n", a, 1) == ("http.internal",
                                                    "GET n")
    assert generate_span_descriptors(
        "n", {"db.system": "pg", "db.statement": "SELECT 1"}, 3) \
        == ("db", "SELECT 1")
    assert generate_span_descriptors("n", {"db.system": "pg"}, 3) \
        == ("db", "n")
    assert generate_span_descriptors("n", {"rpc.service": "S"}, 3) \
        == ("rpc", "n")
    assert generate_span_descriptors(
        "n", {"messaging.system": "kafka"}, 3) == ("message", "n")
    assert generate_span_descriptors(
        "n", {"faas.trigger": "pubsub"}, 3) == ("pubsub", "n")
    assert generate_span_descriptors("n", {}, 3) == ("", "n")


def test_tags_scalars_only_and_formats():
    tags = tags_from_attributes(
        {"s": "x", "b": True, "i": 42, "f": 0.25,
         "m": {"k": 1}, "l": [1, 2]})
    assert tags == {"s": "x", "b": "true", "i": "42", "f": "0.25"}


def test_status_tables():
    # Unset and Ok both → ok (statusFromSpanStatus:404)
    assert status_from_span_status(0, "m", {}) == ("ok", "m")
    assert status_from_span_status(1, "", {}) == ("ok", "")
    # http wins over grpc; unknown code in table → unknown
    assert status_from_span_status(
        2, "", {"http.status_code": "404",
                "rpc.grpc.status_code": "13"}) == ("not_found", "")
    assert status_from_span_status(
        2, "", {"http.status_code": "418"}) == ("unknown", "")
    assert status_from_span_status(
        2, "", {"rpc.grpc.status_code": "13"}) == ("internal_error",
                                                   "")
    assert status_from_span_status(2, "boom", {}) == ("unknown",
                                                      "boom")
    assert status_from_span_status(7, "", {}) == ("unknown",
                                                  "error code 7")


def test_convert_span_tags_resource_overlay_and_kind():
    row = _span(1, kind=2, status_code=2, status_message="bad",
                attributes=json.dumps({"k": "span", "n": 3}),
                resource_attributes=json.dumps({"k": "res"}))
    c = convert_span(row)
    tags = json.loads(c["tags"])
    assert tags["k"] == "res"            # resource overwrites
    assert tags["n"] == "3"
    assert tags["status_message"] == "bad"
    assert tags["span_kind"] == "SPAN_KIND_SERVER"
    assert tags["library_name"] == "lib"
    assert tags["library_version"] == "1.0"
    assert c["status"] == "unknown"


# --- grouping vs the literal Go replay -------------------------------------

def _go_replay(spans):
    """pushTraceData:86-158 — first pass + classify fixpoint."""
    id_map, txn_spans, maybe = {}, {}, []
    for s in spans:
        sid, pid = s["span_id"], s["parent_span_id"]
        root = (not pid or set(pid) <= {"0"}
                or s["span_kind"] in (2, 5))
        if root:
            txn_spans[sid] = []
            id_map[sid] = sid
        elif pid in id_map:
            id_map[sid] = id_map[pid]
            txn_spans[id_map[pid]].append(sid)
        else:
            maybe.append(s)
    prev = len(maybe) + 1
    while maybe and len(maybe) != prev:
        prev, rest = len(maybe), []
        for s in maybe:
            pid = s["parent_span_id"]
            if pid in id_map:
                id_map[s["span_id"]] = id_map[pid]
                txn_spans[id_map[pid]].append(s["span_id"])
            else:
                rest.append(s)
        maybe = rest
    orphans = [s["span_id"] for s in maybe]
    return txn_spans, orphans


def test_grouping_matches_go_replay_random_forests():
    rng = random.Random(11)
    for trial in range(40):
        n = rng.randint(1, 20)
        spans = []
        for i in range(n):
            kind = rng.choice([1, 2, 3, 3, 3, 5])
            if i == 0 or rng.random() < 0.2:
                parent = ""
            elif rng.random() < 0.15:
                parent = "dead0dead0dead0d"  # missing
            else:
                parent = spans[rng.randrange(len(spans))]["span_id"]
            spans.append(_span(i, parent=parent, kind=kind))
        rng.shuffle(spans)  # arrival order must not matter
        txn_spans, orphans = _go_replay(spans)

        tab = spans_to_sentry_table(spans).to_pylist()
        got_txn = {r["span_id"] for r in tab
                   if r["kind"] == "transaction"}
        want_txn = set(txn_spans) | set(orphans)
        assert got_txn == want_txn, (trial, spans)
        got_members = {}
        for r in tab:
            if r["kind"] == "span":
                got_members.setdefault(r["root_span_id"],
                                       set()).add(r["span_id"])
        want_members = {k: set(v) for k, v in txn_spans.items() if v}
        assert got_members == want_members, (trial, spans)


def test_root_inside_subtree_keeps_own_transaction():
    spans = [
        _span(0, parent=""),                    # id 1, root (no parent)
        _span(1, parent=f"{1:016x}", kind=2),   # id 2, SERVER → own txn
        _span(2, parent=f"{2:016x}", kind=3),   # id 3, member of id 2
    ]
    tab = spans_to_sentry_table(spans).to_pylist()
    txns = {r["span_id"] for r in tab if r["kind"] == "transaction"}
    assert txns == {f"{1:016x}", f"{2:016x}"}
    member = [r for r in tab if r["kind"] == "span"][0]
    assert member["root_span_id"] == f"{2:016x}"


def test_orphan_descendants_stay_orphans():
    spans = [
        _span(0, parent=""),                  # id 1, a real root
        _span(1, parent="dead0dead0dead0d"),  # id 2, orphan
        _span(2, parent=f"{2:016x}"),         # id 3, child of orphan
    ]
    tab = spans_to_sentry_table(spans).to_pylist()
    txns = {r["span_id"] for r in tab if r["kind"] == "transaction"}
    assert txns == {f"{1:016x}", f"{2:016x}", f"{3:016x}"}
    assert not [r for r in tab if r["kind"] == "span"]


def test_exception_events():
    events = json.dumps([
        {"name": "exception",
         "attributes": {"exception.type": "E",
                        "exception.message": "m"}},
        {"name": "exception", "attributes": {}},   # both empty → skip
        {"name": "other",
         "attributes": {"exception.type": "X"}},   # wrong name
        {"name": "exception",
         "attributes": {"exception.message": "only-msg"}},
    ])
    spans = [_span(0, parent="", events=events,
                   attributes=json.dumps({"http.method": "GET"}))]
    tab = spans_to_sentry_table(spans, environment="prod").to_pylist()
    excs = [r for r in tab if r["kind"] == "exception"]
    assert len(excs) == 2
    assert excs[0]["exception_type"] == "E"
    assert excs[0]["exception_message"] == "m"
    assert excs[1]["exception_message"] == "only-msg"
    assert excs[0]["transaction"] == "GET s0"
    assert excs[0]["event_id"] != excs[1]["event_id"]
    txn = [r for r in tab if r["kind"] == "transaction"][0]
    assert txn["environment"] == "prod"
    # _span default kind=3 → http.client; parent="" makes it a root
    assert txn["op"] == "http.client"


def test_stage_end_to_end(ray_session):
    import pyarrow as pa
    import ray

    from opentelemetry_collector_contrib_ray.stages.sentryout import (
        spans_to_sentry,
    )

    spans = [_span(0, parent="", kind=2),
             _span(1, parent=f"{1:016x}", kind=3),
             _span(2, trace="u" * 32, parent="", kind=2)]
    cols = {k: pa.array([s[k] for s in spans]) for k in spans[0]}
    ds = ray.data.from_arrow(pa.table(cols))
    out = spans_to_sentry(ds, environment="e").take_all()
    kinds = sorted(r["kind"] for r in out)
    assert kinds == ["span", "transaction", "transaction"]
