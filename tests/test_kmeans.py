"""Spherical k-means + SemDeDup representative selection (stages/kmeans.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_contrib_ray.stages.kmeans import (
    kmeans_assign,
    kmeans_fit,
    semdedup_representatives,
)


def _blob_table(n_per: int = 40, seed: int = 7) -> pa.Table:
    """Three well-separated direction blobs on the unit sphere (4-dim)."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    rows, true = [], []
    for ci, c in enumerate(centers):
        pts = c[None, :] + rng.normal(scale=0.05, size=(n_per, 4))
        rows.append(pts)
        true.extend([ci] * n_per)
    X = np.concatenate(rows)
    return pa.table({
        "vec_id": pa.array(range(len(X)), pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in X],
                              pa.list_(pa.float32())),
        "true_blob": pa.array(true, pa.int32()),
    })


def test_fit_partitioning_invariant(ray_session):
    t = _blob_table()
    c1 = kmeans_fit(ray.data.from_arrow(t).repartition(1),
                    "vec_id", "embedding", k=3, fit_sample=60)
    c7 = kmeans_fit(ray.data.from_arrow(t).repartition(7),
                    "vec_id", "embedding", k=3, fit_sample=60)
    assert np.array_equal(c1, c7)  # bit-exact: hash-order sample + id sort


def test_assign_recovers_blobs(ray_session):
    t = _blob_table()
    out = kmeans_assign(ray.data.from_arrow(t).repartition(4),
                        "vec_id", "embedding", k=3,
                        sim_col="sim").materialize()
    got = pa.Table.from_pylist(out.take_all()).sort_by("vec_id")
    clusters = got.column("cluster").to_numpy(zero_copy_only=False)
    blobs = got.column("true_blob").to_numpy(zero_copy_only=False)
    # each true blob maps to exactly one cluster id and vice versa
    mapping = {}
    for b, c in zip(blobs, clusters):
        mapping.setdefault(b, set()).add(c)
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 3
    sims = got.column("sim").to_numpy(zero_copy_only=False)
    assert sims.min() > 0.9  # tight blobs -> high similarity to centroid


def test_refine_pass_does_not_degrade(ray_session):
    t = _blob_table(n_per=60)
    ds = ray.data.from_arrow(t).repartition(5)

    def mean_sim(C):
        out = kmeans_assign(ds, "vec_id", "embedding", k=3, centroids=C,
                            sim_col="sim").materialize()
        import pyarrow.compute as pc

        tbl = pa.Table.from_pylist(out.take_all())
        return pc.mean(tbl.column("sim")).as_py()

    c0 = kmeans_fit(ds, "vec_id", "embedding", k=3, fit_sample=30)
    c1 = kmeans_fit(ds, "vec_id", "embedding", k=3, fit_sample=30,
                    refine_iters=2)
    assert mean_sim(c1) >= mean_sim(c0) - 1e-9


def test_semdedup_one_rep_per_cluster(ray_session):
    t = _blob_table()
    reps = semdedup_representatives(
        ray.data.from_arrow(t).repartition(4), "vec_id", "embedding", k=3)
    got = pa.Table.from_pylist(reps.take_all()) if not isinstance(
        reps, pa.Table) else reps
    assert got.num_rows == 3  # one representative per non-empty cluster
    assert sorted(got.column("cluster").to_pylist()) == [0, 1, 2] or \
        len(set(got.column("cluster").to_pylist())) == 3
    assert sum(got.column("cluster_size").to_pylist()) == t.num_rows
    # representative = farthest from centroid: its sim is the cluster MIN
    assigned = kmeans_assign(ray.data.from_arrow(t), "vec_id", "embedding",
                             k=3, sim_col="centroid_sim").materialize()
    full = pa.Table.from_pylist(assigned.take_all())
    for rep in got.to_pylist():
        members = full.filter(
            pa.compute.equal(full.column("cluster"), rep["cluster"]))
        assert rep["centroid_sim"] == pytest.approx(
            min(members.column("centroid_sim").to_pylist()))


def test_builder_stage_kmeans_assign(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        build_pipeline,
    )

    path = str(tmp_path / "blobs.parquet")
    pq.write_table(_blob_table(), path)
    cfg = {
        "source": {"type": "parquet", "path": path,
                   "columns": ["vec_id", "embedding"]},
        "stages": [{"type": "kmeans_assign", "k": 3, "fit_sample": 60}],
    }
    out = build_pipeline(cfg).materialize()
    t = pa.Table.from_pylist(out.take_all())
    assert t.num_rows == 120
    assert len(set(t.column("cluster").to_pylist())) == 3


def test_empty_input_raises(ray_session):
    t = _blob_table().slice(0, 0)
    with pytest.raises(ValueError, match="empty input"):
        kmeans_fit(ray.data.from_arrow(t), "vec_id", "embedding", k=3)
