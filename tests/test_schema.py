"""schemaprocessor conformance: version-chain composition, upgrade /
revert ordering, NoChange passthrough, metric renames, flat-column mode
(processor/schemaprocessor/internal/translation/translation.go:174-337)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.schema import (
    SchemaTransform,
    SchemaTranslator,
    parse_version,
    split_schema_url,
)

FAM = "https://example.com/schemas"
SCHEMA = {
    "family": FAM,
    "versions": {
        "1.0.0": {},
        "1.1.0": {"logs": [{"rename_attributes": {"et": "event.type"}}]},
        "1.2.0": {"all": [{"rename_attributes": {"uid": "user.id"}}],
                  "metrics": [{"rename_metrics": {"lat": "http.lat"}}]},
    },
}


def _attrs(rows):
    return pa.array(rows, pa.map_(pa.string(), pa.string()))


def test_version_parsing_and_url_split():
    assert parse_version("1.10.0") == (1, 10, 0)
    assert parse_version("1.10.0") > parse_version("1.9.0")  # numeric, not lexical
    assert split_schema_url(f"{FAM}/1.8.0") == (FAM, "1.8.0")
    assert split_schema_url("1.8.0") == ("", "1.8.0")
    with pytest.raises(ValueError):
        parse_version("not-a-version")


def test_upgrade_chain_composes_revisions():
    tr = SchemaTranslator(SCHEMA, "1.2.0")
    attr, met = tr.plan("logs", "1.0.0")
    assert attr == {"et": "event.type", "uid": "user.id"}
    assert met == {}
    attr, _ = tr.plan("logs", "1.1.0")
    assert attr == {"uid": "user.id"}  # starting version already applied
    assert tr.plan("logs", "1.2.0") is None  # NoChange at target
    assert tr.plan("logs", "9.9.9") is None  # unknown version: NoChange


def test_metrics_block_and_rename_metrics():
    tr = SchemaTranslator(SCHEMA, "1.2.0")
    attr, met = tr.plan("metrics", "1.0.0")
    assert attr == {"uid": "user.id"}  # all-block applies to metrics too
    assert met == {"lat": "http.lat"}
    # logs never see rename_metrics
    assert tr.plan("logs", "1.0.0")[1] == {}


def test_revert_reverses_maps_and_order():
    tr = SchemaTranslator(SCHEMA, "1.0.0")
    attr, met = tr.plan("logs", "1.2.0")
    assert attr == {"user.id": "uid", "event.type": "et"}
    _, met = tr.plan("metrics", "1.2.0")
    assert met == {"http.lat": "lat"}
    # revert from 1.1.0 only unwinds the 1.1.0 revision
    attr, _ = tr.plan("logs", "1.1.0")
    assert attr == {"event.type": "et"}


def test_chain_composition_transitive():
    """a->b in 1.1, b->c in 1.2 composes to a->c for 1.0 records, and a
    record natively carrying b at 1.0 also lands on c (sequential
    application semantics)."""
    s = {"family": FAM, "versions": {
        "1.0.0": {},
        "1.1.0": {"logs": [{"rename_attributes": {"a": "b"}}]},
        "1.2.0": {"logs": [{"rename_attributes": {"b": "c"}}]},
    }}
    tr = SchemaTranslator(s, "1.2.0")
    attr, _ = tr.plan("logs", "1.0.0")
    assert attr == {"a": "c", "b": "c"}
    # and the revert walks back c -> b -> a
    trd = SchemaTranslator(s, "1.0.0")
    attr, _ = trd.plan("logs", "1.2.0")
    assert attr == {"c": "a", "b": "a"}


def test_target_must_be_known():
    with pytest.raises(ValueError, match="target version"):
        SchemaTranslator(SCHEMA, "2.0.0")


def test_transform_mixed_versions_and_foreign_family():
    tr = SchemaTranslator(SCHEMA, "1.2.0")
    t = pa.table({
        "schema_url": [f"{FAM}/1.0.0", f"{FAM}/1.1.0", f"{FAM}/1.2.0",
                       "https://other.com/schemas/1.0.0", None],
        "attributes": _attrs([
            [("et", "a"), ("uid", "1")],
            [("event.type", "b"), ("uid", "2")],
            [("event.type", "c"), ("user.id", "3")],
            [("et", "d"), ("uid", "4")],
            [("et", "e")],
        ]),
    })
    out = SchemaTransform(tr, signal="logs")(t)
    assert out.column("attributes").to_pylist() == [
        [("event.type", "a"), ("user.id", "1")],
        [("event.type", "b"), ("user.id", "2")],
        [("event.type", "c"), ("user.id", "3")],
        [("et", "d"), ("uid", "4")],   # foreign family untouched
        [("et", "e")],                 # null url untouched
    ]
    assert out.column("schema_url").to_pylist() == [
        f"{FAM}/1.2.0", f"{FAM}/1.2.0", f"{FAM}/1.2.0",
        "https://other.com/schemas/1.0.0", None,
    ]


def test_transform_metric_names():
    tr = SchemaTranslator(SCHEMA, "1.2.0")
    t = pa.table({
        "schema_url": [f"{FAM}/1.0.0", f"{FAM}/1.2.0"],
        "metric_name": ["lat", "lat"],
        "attributes": _attrs([[("uid", "1")], [("user.id", "2")]]),
    })
    out = SchemaTransform(tr, signal="metrics",
                          metric_name_col="metric_name")(t)
    # only the 1.0.0 row's metric renames; the 1.2.0 row is NoChange
    assert out.column("metric_name").to_pylist() == ["http.lat", "lat"]
    assert out.column("attributes").to_pylist()[0] == [("user.id", "1")]


def test_transform_flat_columns_single_version():
    tr = SchemaTranslator(SCHEMA, "1.2.0")
    t = pa.table({
        "schema_url": [f"{FAM}/1.0.0"] * 3,
        "et": ["a", "b", "c"],
        "uid": ["1", "2", "3"],
    })
    out = SchemaTransform(tr, signal="logs", map_cols=(),
                          flat_cols=True)(t)
    assert set(out.column_names) == {"schema_url", "event.type", "user.id"}
    assert out.column("schema_url").to_pylist() == [f"{FAM}/1.2.0"] * 3
    # mixed-version batches must be rejected in flat mode
    t2 = pa.table({"schema_url": [f"{FAM}/1.0.0", f"{FAM}/1.1.0"],
                   "et": ["a", "b"], "uid": ["1", "2"]})
    with pytest.raises(ValueError, match="single-version"):
        SchemaTransform(tr, signal="logs", map_cols=(), flat_cols=True)(t2)


def test_roundtrip_upgrade_then_revert_is_identity():
    up = SchemaTranslator(SCHEMA, "1.2.0")
    down = SchemaTranslator(SCHEMA, "1.0.0")
    t = pa.table({
        "schema_url": [f"{FAM}/1.0.0", f"{FAM}/1.0.0"],
        "attributes": _attrs([[("et", "a"), ("uid", "1")],
                              [("et", "b"), ("uid", "2")]]),
    })
    mid = SchemaTransform(up, signal="logs")(t)
    back = SchemaTransform(down, signal="logs")(mid)
    assert back.column("attributes").to_pylist() == \
        t.column("attributes").to_pylist()
    assert back.column("schema_url").to_pylist() == [f"{FAM}/1.0.0"] * 2


def test_empty_batch_passthrough():
    tr = SchemaTranslator(SCHEMA, "1.2.0")
    t = pa.table({"schema_url": pa.array([], pa.string()),
                  "attributes": _attrs([])})
    out = SchemaTransform(tr, signal="logs")(t)
    assert out.num_rows == 0
