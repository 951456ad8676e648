"""Reference-exact FNV hash-seed sampler (probabilisticsamplerprocessor
hash_seed mode) — algorithm parity pinned against an independent
restatement of Go's hash/fnv + the reference's scaling arithmetic
(fnvhasher.go:12-18, sampler_mode.go:33-38,432-444)."""

import pyarrow as pa
import pytest

import ray.data

from opentelemetry_collector_contrib_ray.stages.sample import (
    FnvHashSampler,
    fnv1a32,
    fnv_scaled_rate,
    sample_dataset_fnv,
)


def go_fnv1a(data: bytes) -> int:
    """Independent restatement of Go hash/fnv New32a semantics."""
    h = 0x811C9DC5
    for b in data:
        h ^= b
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h


def test_fnv1a_matches_go_semantics_and_textbook_vectors():
    assert go_fnv1a(b"") == 0x811C9DC5          # offset basis
    assert go_fnv1a(b"a") == 0xE40C292C         # published FNV-1a vector
    assert go_fnv1a(b"foobar") == 0xBF9CF968    # published FNV-1a vector
    for seed in (0, 22, 0xFFFFFFFF):
        for payload in (b"", b"a", b"trace-9f86d081", "héllo".encode()):
            prefix = seed.to_bytes(4, "little")
            assert fnv1a32(payload, seed) == go_fnv1a(prefix + payload)


def test_scaled_rate_reference_arithmetic():
    # uint32(pct * 16384/100.0), truncation toward zero; >100 clamps
    assert fnv_scaled_rate(100) == 16384
    assert fnv_scaled_rate(150) == 16384
    assert fnv_scaled_rate(50) == 8192
    assert fnv_scaled_rate(0.01) == 1
    assert fnv_scaled_rate(0.001) == 0   # -> neverSampler
    assert fnv_scaled_rate(0) == 0


def test_sampler_decision_per_row():
    keys = [f"user-{i}" for i in range(2000)]
    t = pa.table({"k": pa.array(keys)})
    pct, seed = 25.0, 22
    out = FnvHashSampler("k", pct, seed)(t)
    got = set(out.column("k").to_pylist())
    scaled = fnv_scaled_rate(pct)
    want = {k for k in keys
            if (go_fnv1a(seed.to_bytes(4, "little") + k.encode())
                & 0x3FFF) < scaled}
    assert got == want
    # ~25% within hash tolerance
    assert 0.18 < len(want) / len(keys) < 0.32


def test_never_and_always(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": pa.array(["a", "b", "c"])}))
    assert sample_dataset_fnv(ds, "k", 0.001).count() == 0   # scaled==0
    assert sample_dataset_fnv(ds, "k", 100).count() == 3
    assert sample_dataset_fnv(ds, "k", 500).count() == 3     # clamp
    with pytest.raises(ValueError):
        FnvHashSampler("k", -1)


def test_partitioning_invariance(ray_session):
    t = pa.table({"k": pa.array([f"id{i}" for i in range(500)])})
    a = sorted(r["k"] for r in sample_dataset_fnv(
        ray.data.from_arrow(t), "k", 30).take_all())
    b = sorted(r["k"] for r in sample_dataset_fnv(
        ray.data.from_arrow(t).repartition(7), "k", 30).take_all())
    assert a == b


def test_builder_sample_mode_fnv(ray_session):
    from opentelemetry_collector_contrib_ray.pipelines.builder import (
        STAGE_REGISTRY,
    )

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([f"id{i}" for i in range(300)])}))
    got = sorted(r["k"] for r in STAGE_REGISTRY["sample"](
        ds, key="k", percentage=30, mode="fnv", hash_seed=22).take_all())
    want = sorted(r["k"] for r in sample_dataset_fnv(
        ray.data.from_arrow(
            pa.table({"k": pa.array([f"id{i}" for i in range(300)])})),
        "k", 30, hash_seed=22).take_all())
    assert got == want and 0 < len(got) < 300
    with pytest.raises(ValueError, match="md5|fnv"):
        STAGE_REGISTRY["sample"](ds, key="k", percentage=30, mode="xxh")
