"""Less-traveled stage branches: parse on_error=send, actor-pool enrich,
shuffle-mode aggregation."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.sources.tables import read_table
from opentelemetry_collector_contrib_ray.stages.aggregate import count_sum
from opentelemetry_collector_contrib_ray.stages.enrich import enrich_dataset
from opentelemetry_collector_contrib_ray.stages.parse import RegexParse

from .conftest import SF_SMOKE
from .util import assert_frames_equal_unordered


def test_regex_parse_on_error_send_keeps_unmatched():
    batch = pa.table({"raw": ["id=7", "garbage", "id=9"]})
    out = RegexParse(r"^id=(?P<id>\d+)$", parse_from="raw", on_error="send",
                     keep_input=True)(batch)
    assert out.num_rows == 3
    assert out.column("id").to_pylist() == ["7", None, "9"]
    assert out.column("raw").to_pylist()[1] == "garbage"


def test_enrich_actor_pool_path(oracle_smoke):
    ds = read_table(SF_SMOKE, "events", columns=["event_id", "event_type"])
    lookup = {"error": {"sev": "17"}, "purchase": {"sev": "13"}}
    out = enrich_dataset(ds, lookup, key="event_type", use_actors=True,
                         concurrency=(1, 2))
    df = out.to_pandas()
    assert (df.loc[df.event_type == "error", "sev"] == "17").all()
    assert df.loc[~df.event_type.isin(lookup), "sev"].isna().all()


def test_count_sum_shuffle_mode_matches_driver_mode(oracle_smoke):
    ds = read_table(SF_SMOKE, "events", columns=["event_type"])
    driver = count_sum(ds, keys=["event_type"])
    shuffle = count_sum(ds, keys=["event_type"], final="shuffle")
    assert_frames_equal_unordered(driver, shuffle, keys=["event_type"])


def test_round_robin_split_preserves_rows():
    """roundrobinconnector (§2.9): uniform split, no loss, no duplication."""
    import ray as _ray

    from opentelemetry_collector_contrib_ray.stages.transform import (
        round_robin_split,
    )

    ds = _ray.data.range(100)
    parts = round_robin_split(ds, 4)
    assert len(parts) == 4
    ids = []
    for p in parts:
        rows = p.to_pandas()["id"].tolist()
        assert len(rows) == 25  # equal split
        ids.extend(rows)
    assert sorted(ids) == list(range(100))
