"""Mirror of the driver's correctness gate: every query vs its DuckDB oracle.

Runs at sf0.001 for speed (the driver uses sf0.01); value comparison is
order-insensitive with columns sorted by name, like the driver's hash.
"""

import pytest

from opentelemetry_collector_contrib_ray.pipelines.queries import (
    NO_ORACLE,
    ORACLE_SQL,
    QUERIES,
)

from .conftest import SF_SMOKE
from .util import assert_frames_equal_unordered, to_pandas

ORACLE_NAMES = sorted(ORACLE_SQL)


def test_catalog_consistency():
    assert set(ORACLE_SQL) | NO_ORACLE == set(QUERIES)
    assert not (set(ORACLE_SQL) & NO_ORACLE)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, oracle_smoke):
    result = QUERIES[name](SF_SMOKE)
    # .arrow() keeps DuckDB's true types (HUGEINT -> decimal128) so the
    # type-strict check catches driver-level hash/type drift (VERDICT r1 #1).
    expected = oracle_smoke.sql(ORACLE_SQL[name]).arrow()
    assert_frames_equal_unordered(result, expected, check_types=True)


@pytest.mark.parametrize("name", sorted(NO_ORACLE))
def test_no_oracle_queries_run(name):
    df = to_pandas(QUERIES[name](SF_SMOKE))
    assert len(df) >= 0
    if name == "lang_id":
        # predictions restricted to known languages + "und"
        assert set(df["lang_pred"]).issubset({"en", "de", "fr", "es", "und"})
    if name == "media_features":
        assert (df["n_bytes"] > 0).all()


def test_approx_distinct_within_error_bound():
    """HLL(p=12) estimate vs exact COUNT(DISTINCT): relative error well
    inside the ~1.04/sqrt(2^12)≈1.6% theoretical bound per group."""
    approx = to_pandas(QUERIES["approx_distinct_users"](SF_SMOKE))
    exact = to_pandas(QUERIES["distinct_users"](SF_SMOKE))
    m = approx.merge(exact, on="event_type")
    rel = (m["n_users_est"] - m["n_users"]).abs() / m["n_users"]
    assert (rel < 0.05).all(), m.to_string()


def test_token_frequency_matches_counter():
    """Distributed bincount vs a Python Counter over the same corpus."""
    from collections import Counter

    from opentelemetry_collector_contrib_ray.sources.corpus import (
        corpus_dataset,
    )

    got = to_pandas(QUERIES["token_frequency"](SF_SMOKE))
    ref = Counter()
    for toks in corpus_dataset(SF_SMOKE, with_raw=False).to_pandas()["tokens"]:
        ref.update(toks.tolist() if hasattr(toks, "tolist") else toks)
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["token"], got["n"])) == top
