"""Connected-components dedup clustering tests."""

import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.cluster import (
    connected_components,
    connected_components_driver,
)


def _pairs(*pairs):
    return pa.table({
        "id_a": pa.array([a for a, _ in pairs], pa.int64()),
        "id_b": pa.array([b for _, b in pairs], pa.int64()),
    })


def test_union_find_components():
    # components: {1,2,3}, {10,11}, chain {20,21,22,23}
    t = connected_components_driver(
        _pairs((1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23))
    )
    m = dict(zip(t.column("id").to_pylist(), t.column("cluster").to_pylist()))
    assert m[1] == m[2] == m[3] == 1
    assert m[10] == m[11] == 10
    assert m[20] == m[21] == m[22] == m[23] == 20


def test_connected_components_dataset_small_path():
    ds = ray.data.from_arrow(_pairs((5, 6), (6, 7), (100, 101)))
    t = connected_components(ds)
    m = dict(zip(t.column("id").to_pylist(), t.column("cluster").to_pylist()))
    assert m == {5: 5, 6: 5, 7: 5, 100: 100, 101: 100}


def test_distributed_label_propagation_matches_union_find():
    pairs = _pairs((1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (50, 60))
    ds = ray.data.from_arrow(pairs)
    exact = connected_components_driver(pairs)
    dist = connected_components(ds, driver_threshold=0)  # force distributed path
    em = dict(zip(exact.column("id").to_pylist(), exact.column("cluster").to_pylist()))
    got = dist.to_pandas() if not isinstance(dist, pa.Table) else dist.to_pandas()
    dm = dict(zip(got["id"], got["cluster"]))
    assert dm == em


def test_minhash_pairs_cluster_end_to_end():
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    pairs = QUERIES["minhash_pairs"]("/root/testdata/sf0.001")
    clusters = connected_components(pairs)
    df = clusters.to_pandas() if not isinstance(clusters, pa.Table) else clusters.to_pandas()
    # every clustered id maps to the minimum id of its component
    assert (df["cluster"] <= df["id"]).all()
    assert len(df) > 0