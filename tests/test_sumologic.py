"""sumologicprocessor — translate/cloud-namespace parity with the Go loop.

``_reference_translate`` restates translateAttributes
(translate_attributes_processor.go:86-112) literally over ordered dicts;
``_reference_cloud_ns`` restates addCloudNamespaceAttribute
(cloud_namespace_processor.go:61-79). The vectorized map-column kernels
must match on engineered rows covering both collision guards, the
update-vs-append namespace paths, empty maps, and null rows.
"""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.sumologic import (
    ATTRIBUTE_TRANSLATIONS,
    CLOUD_NAMESPACES,
    SumoLogic,
    add_cloud_namespace_map,
    sumo_translate_map,
)


def _reference_translate(attrs: dict) -> dict:
    result = {}
    for k, v in attrs.items():
        sumo = ATTRIBUTE_TRANSLATIONS.get(k)
        if sumo is not None:
            if sumo not in attrs:
                if sumo not in result:
                    result[sumo] = v
            else:
                if k not in result:
                    result[k] = v
        else:
            if k not in result:
                result[k] = v
    return result


def _reference_cloud_ns(attrs: dict) -> dict:
    out = dict(attrs)
    plat = attrs.get("cloud.platform")
    if plat in CLOUD_NAMESPACES:
        out["cloud.namespace"] = CLOUD_NAMESPACES[plat]  # PutStr
    return out


ROWS = [
    # plain renames
    {"host.name": "h1", "service.name": "svc", "custom": "x"},
    # guard 1: literal target key present -> keep OTel name
    {"host.name": "h2", "host": "lit", "k8s.pod.name": "p"},
    # guard 2: two sources -> same target, first wins
    {"host.name": "h3", "k8s.pod.hostname": "ph3"},
    {"k8s.pod.hostname": "ph4", "host.name": "h4",
     "service.name": "s", "k8s.service.name": "ks"},
    # cloud namespace: mapped + unmapped platforms, update path
    {"cloud.platform": "aws_ec2", "cloud.region": "r"},
    {"cloud.platform": "gcp_app_engine"},
    {"cloud.platform": "aws_ecs", "cloud.namespace": "stale"},
    {"cloud.platform": "aws_elastic_beanstalk"},
    # empty map
    {},
]


def _map_col(rows):
    ty = pa.map_(pa.string(), pa.string())
    return pa.array(
        [None if r is None else list(r.items()) for r in rows], ty)


def test_translate_matches_reference():
    col = _map_col(ROWS)
    out = sumo_translate_map(col)
    got = [None if v is None else dict(v) for v in out.to_pylist()]
    assert got == [_reference_translate(r) for r in ROWS]


def test_cloud_namespace_matches_reference():
    col = _map_col(ROWS)
    out = add_cloud_namespace_map(col)
    got = [None if v is None else dict(v) for v in out.to_pylist()]
    assert got == [_reference_cloud_ns(r) for r in ROWS]
    # appended entries land at the END of the row (PutStr on a fresh key)
    ec2 = out.to_pylist()[4]
    assert ec2[-1] == ("cloud.namespace", "aws/ec2")


def test_combined_order_cloudns_then_translate():
    """processor.go:47-55: cloud namespace runs BEFORE translation, so
    cloud.platform is still spelled the OTel way when the namespace is
    derived, then becomes aws_service."""
    tbl = pa.table({"attributes": _map_col(ROWS)})
    out = SumoLogic()(tbl)
    got = [dict(v) for v in out.column("attributes").to_pylist()]
    expect = [_reference_translate(_reference_cloud_ns(r)) for r in ROWS]
    assert got == expect
    assert got[4]["aws_service"] == "aws_ec2"
    assert got[4]["cloud.namespace"] == "aws/ec2"


def test_null_rows_roundtrip():
    rows = [{"host.name": "a"}, None, {}]
    out = sumo_translate_map(_map_col(rows))
    assert out.to_pylist() == [[("host", "a")], None, []]
    out2 = add_cloud_namespace_map(_map_col(rows))
    assert out2.to_pylist() == [[("host.name", "a")], None, []]
