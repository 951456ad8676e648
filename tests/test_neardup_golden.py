"""Golden-fixture gate for the MinHash+LSH pipeline (VERDICT r1 #3).

The pair set at sf0.001 is pinned: the distributed pairs⋈sigs join verify
must reproduce exactly what the (removed) broadcast verify produced — any
drift in sketching, banding, bucket grouping or the join surfaces here.
"""

from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

from .conftest import SF_SMOKE

GOLDEN_MINHASH_PAIRS = [
    (0, 50), (0, 82), (5, 450), (8, 12), (8, 120), (8, 360), (12, 120),
    (12, 360), (16, 369), (26, 176), (33, 436), (45, 487), (50, 82),
    (56, 157), (77, 459), (89, 114), (99, 174), (110, 467), (119, 425),
    (120, 360), (144, 161), (211, 404), (229, 263), (260, 391), (270, 329),
    (328, 428), (349, 411), (474, 498),
]


def test_minhash_pairs_golden():
    df = QUERIES["minhash_pairs"](SF_SMOKE).to_pandas()
    got = sorted(zip(df["id_a"], df["id_b"]))
    assert got == GOLDEN_MINHASH_PAIRS
    # estimates are signature-match fractions in (0, 1]
    assert (df["jaccard_est"] > 0.5).all() and (df["jaccard_est"] <= 1.0).all()


def test_jaccard_verify_golden():
    """Exact-Jaccard gate over minhash candidates (distributed text join):
    at sf0.001 every candidate is a true >=0.5 Jaccard pair, so the exact
    gate reproduces the candidate set exactly — and proves estimates were
    not inflating."""
    df = QUERIES["jaccard_verify"](SF_SMOKE).to_pandas()
    got = sorted(zip(df["id_a"], df["id_b"]))
    assert got == GOLDEN_MINHASH_PAIRS


def test_minhash_pairs_shuffle_prefilter_path_matches_golden():
    """The large-scale prefilter path (shuffle-final counts + distributed
    semi-join; driver_threshold=0 forces it) must produce the identical
    pair set as the size-gated driver path."""
    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    from opentelemetry_collector_contrib_ray.stages import neardup

    docs = read_table(SF_SMOKE, "documents", columns=["doc_id", "text"])
    orig = neardup.prefilter_hot_groups

    def forced(band_rows, key_cols, combine_fn, **kw):
        kw["driver_threshold"] = 0     # force the shuffle-count branch
        kw["broadcast_threshold"] = 0  # force the native semi-join branch
        return orig(band_rows, key_cols, combine_fn, **kw)

    neardup.prefilter_hot_groups = forced
    try:
        # broadcast_verify_pairs=0 ALSO forces the distributed join-verify
        # path, so this test pins the full large-scale plan end to end
        df = neardup.minhash_lsh_pairs(
            docs, threshold=0.5, broadcast_verify_pairs=0).to_pandas()
    finally:
        neardup.prefilter_hot_groups = orig
    got = sorted(zip(df["id_a"], df["id_b"]))
    assert got == GOLDEN_MINHASH_PAIRS


def test_jaccard_verify_join_path_matches_golden():
    """Force the large-scale join-verify path of exact_jaccard_verify
    (broadcast gate = 0): identical pair set to the default broadcast
    path / golden fixture."""
    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    from opentelemetry_collector_contrib_ray.stages.neardup import (
        exact_jaccard_verify,
        minhash_lsh_pairs,
    )

    docs = read_table(SF_SMOKE, "documents", columns=["doc_id", "text"])
    cands = minhash_lsh_pairs(docs, threshold=0.5)
    out = exact_jaccard_verify(
        cands.drop_columns(["jaccard_est"]), docs, threshold=0.5,
        broadcast_verify_pairs=0,
    ).to_pandas()
    assert sorted(zip(out["id_a"], out["id_b"])) == GOLDEN_MINHASH_PAIRS


def test_prefilter_hot_groups_collision_only_readmits():
    """Adversarial pin of the int64-combine collision invariant
    (VERDICT r3 #7, neardup.py prefilter_hot_groups): combine_fn encodes
    key cols to one int64 for the broadcast membership probe; a COLLISION
    between a hot group's code and a cold group's code may only RE-ADMIT
    the cold rows — it can never drop rows of a qualifying group. Safe
    because every downstream pair-generation groupby keys on the TRUE
    columns, so a re-admitted singleton group emits no pairs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.neardup import (
        prefilter_hot_groups,
    )

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "g": pa.array([10, 10, 20, 30], pa.int64()),
    })

    def collide_20_into_10(tbl: pa.Table) -> np.ndarray:
        g = tbl.column("g").to_numpy(zero_copy_only=False)
        return np.where(g == 20, 10, g).astype(np.int64)

    out = prefilter_hot_groups(
        rd.from_arrow(t).repartition(2), ["g"], collide_20_into_10,
        min_size=2)
    ids = sorted(out.to_pandas()["id"].tolist())
    # hot group 10 fully kept; cold group 20 RE-ADMITTED by the forced
    # collision; non-colliding cold group 30 filtered out
    assert ids == [1, 2, 3]

    # worst case: every group collides into one code -> everything is
    # re-admitted, nothing is lost
    def constant(tbl: pa.Table) -> np.ndarray:
        return np.zeros(tbl.num_rows, dtype=np.int64)

    out2 = prefilter_hot_groups(
        rd.from_arrow(t).repartition(2), ["g"], constant, min_size=2)
    assert sorted(out2.to_pandas()["id"].tolist()) == [1, 2, 3, 4]


def test_candidate_pair_paths_identical():
    """The r4 driver-vectorized candidate builder and the distributed
    map_groups path must emit the identical final pair set
    (candidate_driver_rows=0 forces the groupby path)."""
    import ray

    from opentelemetry_collector_contrib_ray.stages.neardup import (
        minhash_lsh_pairs,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    fast = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    dist = minhash_lsh_pairs(ds, threshold=0.5,
                             candidate_driver_rows=0).to_pandas()
    f = set(zip(fast["id_a"], fast["id_b"]))
    d = set(zip(dist["id_a"], dist["id_b"]))
    assert f == d and len(fast) == len(f) and len(dist) == len(d)


def test_simhash_pair_paths_identical():
    """SimHash driver-vectorized vs distributed map_groups candidate
    construction: identical (id_a, id_b, hamming) set."""
    import ray

    from opentelemetry_collector_contrib_ray.stages.neardup import (
        simhash_pairs,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    fast = simhash_pairs(ds, max_hamming=3).to_pandas()
    dist = simhash_pairs(ds, max_hamming=3,
                         candidate_driver_rows=0).to_pandas()
    f = set(zip(fast["id_a"], fast["id_b"], fast["hamming"]))
    d = set(zip(dist["id_a"], dist["id_b"], dist["hamming"]))
    assert f == d and len(fast) == len(f) and len(dist) == len(d)
