"""OTTL context path sets (functions/contexts.py) — span/spanevent/
metric/datapoint/log path translation onto flat columns, mirroring
pkg/ottl/contexts/* registration."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.functions.contexts import (
    PATH_SETS,
    rewrite_expr,
    translate_path,
    with_context,
)
from opentelemetry_collector_contrib_ray.stages.transform import (
    C,
    Col,
    Transform,
    set_,
)


@pytest.mark.parametrize("context,path,want", [
    ("span", "name", "span_name"),
    ("span", "status.code", "status_code"),
    ("span", "trace_id.string", "trace_id"),
    ("span", "resource.attributes", "resource_attributes"),
    ("span", "instrumentation_scope.name", "scope_name"),
    ("spanevent", "name", "event_name"),
    ("spanevent", "span.name", "span_name"),
    ("spanevent", "span.status.code", "status_code"),
    ("metric", "name", "metric_name"),
    ("metric", "unit", "metric_unit"),
    ("datapoint", "value_double", "value_double"),
    ("datapoint", "metric.name", "metric_name"),
    ("log", "trace_id.string", "trace_id"),
    ("log", "body", "body"),                    # identity — native shape
    ("resource", "attributes", "resource_attributes"),
    ("scope", "version", "scope_version"),
    ("span", "my_custom_column", "my_custom_column"),  # open schema
])
def test_translate_path(context, path, want):
    assert translate_path(context, path) == want


def test_unknown_context_raises():
    with pytest.raises(ValueError, match="unknown OTTL context"):
        translate_path("profile", "name")
    with pytest.raises(ValueError, match="unknown OTTL context"):
        rewrite_expr("profile", "name == 'x'")


@pytest.mark.parametrize("context,expr,want", [
    ("span", 'status.code == STATUS_CODE_ERROR and kind == SPAN_KIND_SERVER',
     'status_code == STATUS_CODE_ERROR and span_kind == SPAN_KIND_SERVER'),
    # string literals untouched, even when they spell a path
    ("span", 'name == "status.code"', 'span_name == "status.code"'),
    # converter call names never translate; their path ARGS do
    ("span", 'IsMatch(name, "^GET") or Len(status.message) > 3',
     'IsMatch(span_name, "^GET") or Len(status_message) > 3'),
    # map indexing composes with the translated parent column
    ("span", 'resource.attributes["team"] == "core"',
     'resource_attributes["team"] == "core"'),
    ("datapoint", 'metric.name == "latency" and value_double > 0.5',
     'metric_name == "latency" and value_double > 0.5'),
    # unknown identifiers pass through
    ("metric", 'custom_col == 1 and unit != "ms"',
     'custom_col == 1 and metric_unit != "ms"'),
])
def test_rewrite_expr(context, expr, want):
    assert rewrite_expr(context, expr) == want


def test_with_context_statements_end_to_end():
    """Reference-spelled span statements execute correctly over flat
    columns, preserving sequential overwrite order."""
    stmts = with_context("span", [
        set_("status.message", "unset"),
        set_("status.message", "ok", where="status.code == STATUS_CODE_OK"),
        set_("status.message", "error",
             where="status.code == STATUS_CODE_ERROR and "
                   "kind == SPAN_KIND_SERVER"),
        set_("name_upper", C("ToUpperCase", Col("name"))),
    ])
    t = pa.table({
        "span_name": pa.array(["get", "put", "del"]),
        "span_kind": pa.array([2, 2, 1], pa.int64()),
        "status_code": pa.array([2, 1, 2], pa.int64()),
    })
    out = Transform(stmts)(t)
    assert out.column("status_message").to_pylist() == \
        ["error", "ok", "unset"]
    assert out.column("name_upper").to_pylist() == ["GET", "PUT", "DEL"]
    # inputs were not mutated (with_context returns NEW statements)
    assert stmts[0].args[0] == "status_message"


def test_with_context_builder_config(ray_session):
    """The builder's transform/filter stages accept a ``context`` key."""
    import ray.data

    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        STAGE_REGISTRY,
    )

    ds = ray.data.from_arrow(pa.table({
        "span_name": pa.array(["a", "b"]),
        "status_code": pa.array([2, 0], pa.int64()),
        "span_kind": pa.array([2, 2], pa.int64()),
    }))
    ds = STAGE_REGISTRY["transform"](ds, statements=[
        {"editor": "set", "target": "status.message", "value": "error",
         "where": "status.code == STATUS_CODE_ERROR"},
    ], context="span")
    ds = STAGE_REGISTRY["filter"](ds, condition="status.code > 0",
                                  context="span")
    rows = sorted(ds.take_all(), key=lambda r: r["span_name"])
    assert len(rows) == 1
    assert rows[0]["status_message"] == "error"


def test_every_context_value_is_a_valid_flat_name():
    for ctx, mapping in PATH_SETS.items():
        for src, dst in mapping.items():
            assert "." not in dst, (ctx, src, dst)


def test_with_context_pattern_args_not_translated():
    """replace_pattern's regex/replacement strings must survive even when
    they spell a context path; only the target translates."""
    from opentelemetry_collector_contrib_ray.stages.transform import (
        replace_pattern,
    )

    stmts = with_context("span", [
        replace_pattern("status.message", "name", "kind"),
    ])
    assert stmts[0].args == ("status_message", "name", "kind")
