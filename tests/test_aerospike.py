"""aerospikereceiver parity — the stage's key tables are verified
MECHANICALLY against the reference scraper.go switch (re-extracted at
test time), plus behavioral vectors."""

import json
import os
import re

import pytest

from opentelemetry_collector_contrib_ray.stages.aerospike import (
    NAMESPACE_KEYS,
    NODE_KEYS,
    _TYPES,
    info_to_rows,
)

SCRAPER = "/root/reference/receiver/aerospikereceiver/scraper.go"
GEN = ("/root/reference/receiver/aerospikereceiver/internal/metadata/"
       "generated_metrics.go")


def _extract_reference_tables():
    src = open(SCRAPER).read()
    gen = open(GEN).read()
    enum = dict(re.findall(
        r'case (Attribute\w+):\s*\n\s*return "([^"]+)"', gen))
    names = {"Record" + m + "DataPoint": n for m, n in re.findall(
        r"// Record(\w+)DataPoint adds a data point to ([\w.]+) metric",
        gen)}
    out = {}
    for fname in ("emitNode", "emitNamespace"):
        body = src.split(f"func (r *aerospikeReceiver) {fname}")[1]
        body = body.split("\nfunc ")[0]
        table = {}
        for key, fn, attrs in re.findall(
                r'case "([^"]+)":\s*\n\s*addPartialIfError\(errs, '
                r"r\.mb\.(Record\w+DataPoint)\(now, v"
                r"((?:, metadata\.Attribute\w+)*)\)\)", body):
            alist = tuple(enum[a.strip().replace("metadata.", "")]
                          for a in attrs.split(",") if a.strip())
            table[key] = (names[fn], alist)
        out[fname] = table
    return out["emitNode"], out["emitNamespace"]


def test_tables_match_reference_switch():
    if not os.path.exists(SCRAPER):
        pytest.skip("reference not present")
    node_ref, ns_ref = _extract_reference_tables()
    assert NODE_KEYS == node_ref
    assert NAMESPACE_KEYS == ns_ref


def test_rows_and_typing():
    rows = info_to_rows(json.dumps({"kind": "node", "info": {
        "node": "BB9020011AC4202", "client_connections": "42",
        "system_free_mem_pct": "88", "unknown_stat": "1",
        "query_tracked": "bad"}}))
    by = {r["name"]: r for r in rows}
    assert set(by) == {"aerospike.node.connection.open",
                       "aerospike.node.memory.free"}
    c = by["aerospike.node.connection.open"]
    assert (c["value_int"], c["type"], c["mtype"],
            c["is_monotonic"]) == (42, "client", "sum", False)
    m = by["aerospike.node.memory.free"]
    assert (m["mtype"], m["is_monotonic"],
            m["aggregation_temporality"]) == ("gauge", None, 0)
    assert c["node_name"] == "BB9020011AC4202"
    assert c["namespace"] is None


def test_namespace_rows():
    rows = info_to_rows(json.dumps({"kind": "namespace", "info": {
        "node": "n1", "name": "test",
        "pi_query_short_basic_timeout": "7",
        "si_query_ops_bg_basic_complete": "9",
        "client_write_filtered_out": "3",
        "memory_used_sindex_bytes": "512"}}))
    by = {(r["name"], r["type"], r["index"], r["result"],
           r["component"]): r["value_int"] for r in rows}
    assert by[("aerospike.namespace.query.count", "short_basic",
               "primary", "timeout", None)] == 7
    assert by[("aerospike.namespace.query.count", "ops_background",
               "secondary", "complete", None)] == 9
    assert by[("aerospike.namespace.transaction.count", "write", None,
               "filtered_out", None)] == 3
    assert by[("aerospike.namespace.memory.usage", None, None, None,
               "secondary_index")] == 512
    assert all(r["node_name"] == "n1" and r["namespace"] == "test"
               for r in info_to_rows(json.dumps(
                   {"kind": "namespace",
                    "info": {"node": "n1", "name": "test",
                             "client_read_success": "1"}})))
    # typing table covers every metric the key tables reference
    assert ({m for m, _a in NODE_KEYS.values()}
            | {m for m, _a in NAMESPACE_KEYS.values()}) <= set(_TYPES)
