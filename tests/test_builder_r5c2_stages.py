"""Builder registration smoke for the continuation-session-2 stages —
each new parser runs through the config-driven STAGE_REGISTRY path."""

import json

import pyarrow as pa
import ray

from opentelemetry_collector_contrib_ray.pipelines.builder import (
    STAGE_REGISTRY,
)

NEW_STAGES = ("parse_docker_stats", "parse_memcached",
              "parse_couchdb", "parse_httpcheck", "parse_riak",
              "parse_flink", "parse_nsxt", "parse_podman",
              "parse_aerospike", "parse_chrony", "parse_apachespark",
              "parse_ecs_task_metrics", "parse_bigip",
              "parse_kubeletstats", "rows_to_metrics", "rows_to_logs")


def test_all_registered():
    for name in NEW_STAGES:
        assert name in STAGE_REGISTRY, name


def test_registry_path_runs():
    ds = ray.data.from_arrow(pa.table({
        "stats_page": pa.array(["STAT threads 4\r\nEND\r\n"],
                               pa.string())}))
    out = STAGE_REGISTRY["parse_memcached"](ds)
    rows = pa.concat_tables(ray.get(out.to_arrow_refs())).to_pylist()
    assert rows and rows[0]["name"] == "memcached.threads"

    ds2 = ray.data.from_arrow(pa.table({
        "check_json": pa.array([json.dumps(
            {"endpoint": "e", "status_code": 200})], pa.string())}))
    out2 = STAGE_REGISTRY["parse_httpcheck"](ds2)
    rows2 = pa.concat_tables(ray.get(out2.to_arrow_refs())).to_pylist()
    assert any(r["name"] == "httpcheck.status" and r["value_int"] == 1
               for r in rows2)
