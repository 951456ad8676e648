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
