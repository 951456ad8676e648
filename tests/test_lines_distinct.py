"""read_lines / read_multiline source + distinct_count aggregation tests."""

from opentelemetry_collector_contrib_ray.sources.lines import (
    read_lines,
    read_multiline,
)
from opentelemetry_collector_contrib_ray.sources.tables import read_table
from opentelemetry_collector_contrib_ray.stages.aggregate import distinct_count

from .conftest import SF_SMOKE
from .util import assert_frames_equal_unordered


def test_read_lines(tmp_path):
    f1 = tmp_path / "a.log"
    f1.write_text("line1\nline2\nline3\n")
    f2 = tmp_path / "b.log"
    f2.write_text("other1\nother2\n")
    df = read_lines([str(f1), str(f2)]).to_pandas()
    assert len(df) == 5
    assert set(df.columns) == {"raw", "source_file"}
    # block order across files is not guaranteed; content per file is
    assert set(df[df.source_file.str.endswith("a.log")].raw) == {
        "line1", "line2", "line3"
    }


def test_read_multiline_start_pattern(tmp_path):
    f = tmp_path / "app.log"
    f.write_text(
        "ERROR first failure\n  at frame1\n  at frame2\n"
        "ERROR second failure\n  at frameA\n"
    )
    df = read_multiline(str(f), line_start_pattern="^ERROR").to_pandas()
    df = df.sort_values("n_merged", ascending=False, ignore_index=True)
    assert len(df) == 2
    assert df.loc[0, "combined"] == "ERROR first failure\n  at frame1\n  at frame2"
    assert df.loc[0, "n_merged"] == 3
    assert df.loc[1, "combined"] == "ERROR second failure\n  at frameA"


def test_distinct_count_vs_oracle(oracle_smoke):
    ds = read_table(SF_SMOKE, "events", columns=["event_type", "user_id"])
    got = distinct_count(ds, keys=["event_type"], col="user_id",
                         out_name="n_users")
    expected = oracle_smoke.sql(
        "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY event_type"
    ).df()
    assert_frames_equal_unordered(got, expected, keys=["event_type"])
