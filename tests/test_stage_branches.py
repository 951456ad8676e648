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


def test_media_resize_and_frame_sample():
    """Multimodal plumbing: resize rewrites payload+meta per actor-injected
    codec (deterministic fake here); frame sampling fans one row out to k
    frame rows with frame_idx — the schema/batch shape is the production
    path, only the codec is stubbed."""
    import json

    import ray as _ray

    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        documents_as_media,
        frame_sample,
        media_resize,
    )

    docs = _ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                  columns=["doc_id", "text"]).limit(8)
    media = documents_as_media(docs)
    resized = media_resize(media, width=16, height=16).to_pandas()
    assert (resized["payload"].str.len() == (16 * 16) // 64).all()
    metas = [json.loads(m) for m in resized["meta_json"]]
    assert all(m["width"] == 16 and m["height"] == 16 for m in metas)

    frames = frame_sample(media, k=4).to_pandas()
    assert len(frames) == 8 * 4
    assert sorted(frames["frame_idx"].unique()) == [0, 1, 2, 3]
    assert (frames.groupby("media_id")["frame_idx"].count() == 4).all()


def test_sequence_pack_invariants():
    """Greedy packing: token order + totals conserved, examples bounded by
    max_len, over-long docs chunked, doc count attributed where each doc
    ENDS (sums to input doc count)."""
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.tokenstats import (
        SequencePack,
    )

    rng = np.random.default_rng(11)
    docs = [rng.integers(0, 1000, rng.integers(1, 40)).tolist()
            for _ in range(200)]
    t = pa.table({"tokens": pa.array(docs, pa.list_(pa.int32()))})
    out = SequencePack(max_len=64)(t)
    n_tok = out.column("n_tok").to_pylist()
    assert max(n_tok) <= 64
    assert sum(n_tok) == sum(len(d) for d in docs)
    flat = [x for l in out.column("tokens").to_pylist() for x in l]
    assert flat == [x for d in docs for x in d]  # order preserved exactly
    assert sum(out.column("n_docs").to_pylist()) == len(docs)
    # all but the last example are exactly full (greedy first-fit in order)
    assert all(v == 64 for v in n_tok[:-1])


def test_bucketed_cumsum_equals_plain_across_bucket_counts():
    """Skew-safe bucketed cumsum must be bit-identical to the plain path
    for any bucket count (boundary rows land deterministically)."""
    import pandas as pd

    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    from opentelemetry_collector_contrib_ray.stages import window

    ds = read_table("/root/testdata/sf0.001", "events",
                    columns=["event_id", "ts", "user_id", "value"])
    plain = window.delta_to_cumulative(
        ds, key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_col="value", out_col="cum_cents",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    for buckets in (3, 20):
        b = window.delta_to_cumulative_bucketed(
            ds, key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", out_col="cum_cents", time_buckets=buckets,
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_series_equal(
            plain["cum_cents"].astype("int64"),
            b["cum_cents"].astype("int64"),
        )


def test_bucketed_c2d_equals_plain_across_bucket_counts():
    """cumulative_to_delta_bucketed ≡ plain for any bucket count: the
    previous-present-bucket seeding must reproduce the per-key first
    difference exactly, including the first-row-keeps-value rule."""
    import pandas as pd

    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    from opentelemetry_collector_contrib_ray.stages import window

    ds = read_table("/root/testdata/sf0.001", "events",
                    columns=["event_id", "ts", "user_id", "value"])
    plain = window.cumulative_to_delta(
        ds, key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_col="value", out_col="dv", auto_bucket_threshold=None,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    for buckets in (3, 20):
        b = window.cumulative_to_delta_bucketed(
            ds, key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", out_col="dv", time_buckets=buckets,
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_series_equal(plain["dv"], b["dv"],
                                       check_exact=True)


def test_bucketed_sessionize_equals_plain():
    """sessionize_bucketed ≡ plain sessionize: local sessions split at
    bucket boundaries must re-merge whenever the boundary gap ≤ gap."""
    import pandas as pd

    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    from opentelemetry_collector_contrib_ray.stages import window

    ds = read_table("/root/testdata/sf0.001", "events",
                    columns=["event_id", "ts", "user_id"])
    cols = ["user_id", "session_id", "n_events", "first_ts", "last_ts"]
    plain = window.sessionize(
        ds, key_cols=["user_id"], order_cols=["ts", "event_id"],
        ts_col="ts", gap_seconds=3600.0, auto_bucket_threshold=None,
    ).to_pandas()[cols].sort_values(["user_id", "session_id"]).reset_index(
        drop=True)
    for buckets in (3, 17):
        b = window.sessionize_bucketed(
            ds, key_cols=["user_id"], order_cols=["ts", "event_id"],
            ts_col="ts", gap_seconds=3600.0, time_buckets=buckets,
        ).to_pandas()[cols].sort_values(["user_id", "session_id"]
                                        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(plain, b, check_dtype=False)


def test_round_robin_split_conserves_and_balances():
    """roundrobinconnector analog (connector/roundrobinconnector): rows
    conserved across the n splits, sizes near-uniform."""
    import ray as _ray
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.transform import (
        round_robin_split,
    )

    ds = ray.data.range(1000)
    parts = round_robin_split(ds, 4)
    assert len(parts) == 4
    sizes = [p.count() for p in parts]
    assert sum(sizes) == 1000
    assert max(sizes) - min(sizes) <= 1  # equal=True split
    # no row lost or duplicated
    seen = sorted(x["id"] for p in parts for x in p.take_all())
    assert seen == list(range(1000))


def test_consistent_hash_ring_reference_parity_semantics():
    """Karger ring exactness (consistent_hashing.go:12-40): crc32-IEEE
    positions, ceiling lookup with wraparound, vectorized == scalar, and
    minimal remapping when an endpoint leaves."""
    import zlib

    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.route import (
        ConsistentHashRing,
    )

    eps = ["collector-0:4317", "collector-1:4317", "collector-2:4317"]
    ring = ConsistentHashRing(eps)
    # every position is crc32(endpoint || LE32(i)) % 36000 (modulo probing,
    # which at 300/36000 occupancy is rare) — spot-check the raw formula
    raw = {(zlib.crc32(e.encode() + i.to_bytes(4, "little")) % 36000)
           for e in eps for i in range(100)}
    assert set(ring.positions.tolist()) - raw == set() or \
        len(set(ring.positions.tolist()) - raw) <= 5  # probed collisions
    assert 295 <= len(ring.positions) <= 300
    assert (ring.positions[:-1] < ring.positions[1:]).all()  # sorted unique

    keys = [f"trace-{i}" for i in range(2000)]
    scalar = [ring.endpoint_for(k) for k in keys]
    vec = ring.endpoints_for_column(pa.array(keys)).to_pylist()
    assert scalar == vec
    # rough balance: each endpoint owns a nontrivial share
    from collections import Counter

    c = Counter(scalar)
    assert set(c) == set(eps)
    assert min(c.values()) > 0.15 * len(keys)

    # consistency: removing one endpoint remaps ONLY its keys
    ring2 = ConsistentHashRing(eps[:2])
    moved = [k for k, e in zip(keys, scalar)
             if e != ring2.endpoint_for(k)]
    assert all(ring.endpoint_for(k) == eps[2] for k in moved)

    # empty ring returns "" like the reference
    assert ConsistentHashRing([]).endpoint_for("x") == ""


def test_nb_lang_model_fit_inference_and_actor_pool():
    """Real learned model in the pipeline (VERDICT r2 #3): deterministic
    fit (identical coefficients on every actor), held-out accuracy, und
    fallback, and the end-to-end actor-pool query."""
    import numpy as np

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES
    from opentelemetry_collector_contrib_ray.stages.textstats import (
        LANG_MARKERS,
        NBCharLangModel,
    )

    m, m2 = NBCharLangModel(), NBCharLangModel()
    assert np.array_equal(m.logp, m2.logp)  # actors fit identical models

    rng = np.random.default_rng(99)
    suffixes = ["", "s", "en", "es"]
    ok = tot = 0
    for lang in sorted(LANG_MARKERS):
        lex = sorted(LANG_MARKERS[lang])
        sents = [" ".join(lex[rng.integers(len(lex))]
                          + suffixes[rng.integers(4)] for _ in range(8))
                 for _ in range(30)]
        ok += (m.predict(sents) == lang).sum()
        tot += 30
    assert ok / tot >= 0.95  # held-out synthetic accuracy
    assert list(m.predict(["", "zz"])) == ["und", "und"]

    out = QUERIES["lang_id_model"]("/root/testdata/sf0.001").to_pandas()
    assert out["row_count"].sum() == 500  # every doc classified exactly once
    assert set(out["lang_model"]) <= set(m.langs) | {"und"}


def test_group_quantiles_duckdb_rank_parity():
    """group_quantiles must reproduce DuckDB quantile_disc exactly —
    rank = max(ceil(q*n)-1, 0) over the sorted multiset — including
    skewed counts and q=0/1 edges."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.quantile import (
        group_quantiles,
    )

    vals = [1] * 7 + [5] * 2 + [9] * 1 + [100] * 3
    t = pa.table({"k": ["a"] * len(vals) + ["b"] * 4,
                  "v": pa.array(vals + [2, 4, 6, 8], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT k, quantile_disc(v, 0.0) AS q0, quantile_disc(v, 0.5) AS q50,"
        " quantile_disc(v, 0.9) AS q90, quantile_disc(v, 1.0) AS q100"
        " FROM t GROUP BY k ORDER BY k").df()
    # driver_threshold gates the finish: big -> driver merge, 0 -> shuffle
    for thresh in (5_000_000, 0):
        out = group_quantiles(
            ray.data.from_arrow(t), keys=["k"], value_col="v",
            qs=[0.0, 0.5, 0.9, 1.0], prefix="q", driver_threshold=thresh,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        for c in ("q0", "q50", "q90", "q100"):
            assert out[c].astype("int64").tolist() == \
                exp[c].astype("int64").tolist(), (thresh, c)


def test_repeated_ngram_counts_token_and_word_variants():
    """Duplicated-span primitive: token-gram (packed binary keys) and
    word-gram (string keys) variants agree on shared-span counts,
    including within-doc repeats, boundary grams, and short docs."""
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.tokenstats import (
        repeated_ngram_counts,
        repeated_word_ngram_counts,
    )

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "tokens": pa.array(
            [[1, 2, 3, 4, 5, 6, 7, 8, 9],      # shares [1..8] with doc 2
             [0, 1, 2, 3, 4, 5, 6, 7, 8],      # shares [1..8] with doc 1
             [7, 7, 7, 7, 7, 7, 7, 7, 7, 7],   # self-repeats only
             [1, 2, 3]],                       # too short for any 8-gram
            pa.list_(pa.int32())),
    })
    out = repeated_ngram_counts(
        ray.data.from_arrow(docs), k=8).to_pandas()
    got = dict(zip(out["doc_id"], out["shared_grams"]))
    assert got == {1: 1, 2: 1}  # self-repeats within ONE doc don't count

    words = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["t1 t2 t3 t4 t5 t6 t7 t8 t9",
                 "t0 t1 t2 t3 t4 t5 t6 t7 t8",
                 "x x x x x x x x x x",
                 "a b c"],
    })
    out2 = repeated_word_ngram_counts(
        ray.data.from_arrow(words), k=8).to_pandas()
    got2 = dict(zip(out2["doc_id"], out2["shared_grams"]))
    assert got2 == {1: 1, 2: 1}

    # occurrence counting: a hot gram occurring twice in one doc counts 2
    twice = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["p q p q", "p q x"],
    })
    out3 = repeated_word_ngram_counts(
        ray.data.from_arrow(twice), k=2).to_pandas()
    got3 = dict(zip(out3["doc_id"], out3["shared_grams"]))
    assert got3 == {1: 2, 2: 1}  # "p q" twice in doc 1, once in doc 2


def test_expohist_quantile_bound_and_distributed():
    """Sketch quantiles: relative error within the 2^(1/2^scale)-1 bound
    (scale 4 ≈ 4.4%) against exact quantiles, both for a single sketch
    and for the distributed per-block merge path."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.expohist import (
        ExponentialHistogram,
        approx_quantiles,
        expohist_quantile,
    )

    rng = np.random.default_rng(3)
    vals = np.exp(rng.normal(3.0, 1.2, 50_000))  # heavy-tailed positive
    bound = 2 ** (1 / 16) - 1 + 0.01  # + discrete-rank slack

    h = ExponentialHistogram(scale=4, max_size=400).add_values(vals)
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        est = expohist_quantile(h, q)
        assert abs(est - exact) / exact <= bound, (q, est, exact)

    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    out = approx_quantiles(ds, "v", [0.5, 0.9, 0.99], scale=4, max_size=400)
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        est = out[f"q{int(q*100)}"]
        assert abs(est - exact) / exact <= bound, (q, est, exact)


def test_heavy_hitters_bounds_and_retention():
    """Mergeable truncated-count summary: est_min ≤ true ≤ est_max for
    every reported item, and genuinely heavy items are retained across
    block boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.sketch import (
        heavy_hitters,
    )

    rng = np.random.default_rng(11)
    # zipf-ish: item i appears ~ 50_000 / (i+1) times, shuffled
    items = np.repeat(np.arange(200), (50_000 / np.arange(1, 201)).astype(int))
    rng.shuffle(items)
    true = {int(i): int(c) for i, c in
            zip(*np.unique(items, return_counts=True))}
    ds = ray.data.from_arrow(
        pa.table({"u": pa.array(items, pa.int64())})).repartition(16)
    top = heavy_hitters(ds, "u", m=32, k=10)
    assert len(top) == 10
    for item, lo, hi in top:
        assert lo <= true[int(item)] <= hi, (item, lo, true[int(item)], hi)
    reported = {int(i) for i, _, _ in top}
    assert {0, 1, 2}.issubset(reported)  # the heaviest items survive


def test_sliding_window_counts_semantics():
    """Sliding windows: each row lands in exactly ceil(window/slide)
    windows when far from range edges; tumbling (slide == window) assigns
    exactly one window; totals conserve row count x multiplicity."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.window import (
        sliding_window_counts,
    )

    base = 1_700_000_000
    ts = pa.array(
        np.array([base + 100, base + 1000, base + 2000], dtype=np.int64)
        * 1_000_000, pa.timestamp("us"))
    t = pa.table({"k": ["a", "a", "b"], "ts": ts,
                  "v": pa.array([1, 2, 3], pa.int64())})
    out = sliding_window_counts(
        ray.data.from_arrow(t), key_cols=["k"], ts_col="ts",
        window_s=3600, slide_s=900, sum_cols={"v": "v_sum"}).to_pandas()
    # every row in exactly 4 windows (3600/900)
    assert out["row_count"].sum() == 3 * 4
    assert out["v_sum"].sum() == (1 + 2 + 3) * 4
    # window starts are slide-aligned and within (t-window, t]
    assert (out["window_start"] % 900 == 0).all()

    tum = sliding_window_counts(
        ray.data.from_arrow(t), key_cols=["k"], ts_col="ts",
        window_s=900, slide_s=900).to_pandas()
    assert tum["row_count"].sum() == 3  # tumbling: one window per row


def test_sorted_scan_cumsum_equals_plain_and_survives_hot_key():
    """delta_to_cumulative_sorted ≡ plain on real data, and the cross-block
    carry chain is exact when ONE key spans every block (the regime where
    both the plain and bucketed variants degrade)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    from opentelemetry_collector_contrib_ray.stages import window

    ds = read_table("/root/testdata/sf0.001", "events",
                    columns=["event_id", "ts", "user_id", "value"])
    plain = window.delta_to_cumulative(
        ds, key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_col="value", out_col="cum_cents",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    srt = window.delta_to_cumulative_sorted(
        ds.repartition(16), key_cols=["user_id"],
        order_cols=["ts", "event_id"], value_col="value",
        out_col="cum_cents",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        plain["cum_cents"].astype("int64"), srt["cum_cents"].astype("int64"))

    n = 30_000
    t = pa.table({
        "k": ["hot"] * n + ["a", "a", "b"],
        "ts": pa.array(np.concatenate([np.arange(n), [0, 1, 0]]) * 1_000_000,
                       pa.timestamp("us")),
        "eid": pa.array(np.arange(n + 3), pa.int64()),
        "value": pa.array(np.ones(n + 3), pa.float64()),
    })
    out = window.delta_to_cumulative_sorted(
        rd.from_arrow(t).repartition(12), key_cols=["k"],
        order_cols=["ts", "eid"], value_col="value", out_col="c",
    ).to_pandas()
    hot = out[out.k == "hot"].sort_values(["ts", "eid"])
    assert (hot["c"].to_numpy() == np.arange(1, n + 1) * 100).all()
    assert sorted(out[out.k != "hot"]["c"].tolist()) == [100, 100, 200]


def test_sorted_scan_c2d_equals_plain_and_hot_key():
    """cumulative_to_delta_sorted ≡ plain (first-row-keeps-value rule)
    incl. a hot key spanning many blocks (carry = previous block's last
    value)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    from opentelemetry_collector_contrib_ray.stages import window

    ds = read_table("/root/testdata/sf0.001", "events",
                    columns=["event_id", "ts", "user_id", "value"])
    plain = window.cumulative_to_delta(
        ds, key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_col="value", out_col="dv", auto_bucket_threshold=None,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    srt = window.cumulative_to_delta_sorted(
        ds.repartition(16), key_cols=["user_id"],
        order_cols=["ts", "event_id"], value_col="value", out_col="dv",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(plain["dv"], srt["dv"], check_exact=True)

    n = 20_000
    t = pa.table({
        "k": ["hot"] * n,
        "ts": pa.array(np.arange(n) * 1_000_000, pa.timestamp("us")),
        "eid": pa.array(np.arange(n), pa.int64()),
        "value": pa.array(np.cumsum(np.ones(n)), pa.float64()),  # 1,2,3..
    })
    out = window.cumulative_to_delta_sorted(
        rd.from_arrow(t).repartition(10), key_cols=["k"],
        order_cols=["ts", "eid"], value_col="value", out_col="dv",
    ).to_pandas().sort_values(["ts"])
    dv = out["dv"].to_numpy()
    assert dv[0] == 1.0 and (dv[1:] == 1.0).all()  # exact deltas everywhere


def test_asof_join_sorted_equals_plain_and_hot_key():
    """asof_join_sorted ≡ per-key-group plain path on real data (the
    q_asof_join shape), and the right-state carry chain is exact when ONE
    key's entire left+right history spans every block — the regime where
    the plain path OOMs a single task (VERDICT r3 #2)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.asof import (
        asof_join,
        asof_join_sorted,
    )

    events = read_table("/root/testdata/sf0.001", "events",
                        columns=["event_id", "ts", "user_id"])
    orders = read_table("/root/testdata/sf0.001", "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "user_id", "o_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Max

    orders = orders.groupby(["user_id", "o_orderdate"]).aggregate(
        Max("o_orderkey", alias_name="o_orderkey")).materialize()

    kw = dict(key="user_id", left_ts="ts", right_ts="o_orderdate",
              right_cols=["o_orderkey"])
    plain = asof_join(events, orders, auto_sorted_threshold=None, **kw
                      ).to_pandas().sort_values("event_id").reset_index(drop=True)
    srt = asof_join_sorted(events.repartition(16), orders, **kw
                           ).to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        plain["o_orderkey"].astype("float64"),
        srt["o_orderkey"].astype("float64"))
    assert len(plain) == len(srt) == events.count()

    # hot key: one key's history spans every block; lefts before the first
    # right row stay null (no carry), every other left picks the most
    # recent right at floor(ts/1000)*1000
    n = 30_000
    lts = np.arange(n, dtype=np.int64)
    left = pa.table({
        "eid": pa.array(np.arange(n), pa.int64()),
        "k": ["hot"] * n,
        "lts": pa.array(lts * 1_000_000, pa.timestamp("us")),
    })
    rts = np.arange(1, n // 1000, dtype=np.int64) * 1000  # first right @1000s
    right = pa.table({
        "k": ["hot"] * len(rts),
        "rts": pa.array(rts * 1_000_000, pa.timestamp("us")),
        "rv": pa.array(rts, pa.int64()),
    })
    out = asof_join_sorted(
        rd.from_arrow(left).repartition(12), rd.from_arrow(right),
        key="k", left_ts="lts", right_ts="rts", right_cols=["rv"],
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    assert len(out) == n
    rv = out["rv"].to_numpy()
    assert np.isnan(rv[:1000].astype(float)).all()  # before first right row
    expect = np.minimum(lts[1000:] // 1000, rts[-1] // 1000) * 1000
    assert (rv[1000:].astype(np.int64) == expect).all()


def test_sessionize_tag_sorted_equals_plain_and_hot_key():
    """sessionize_tag_sorted ≡ plain tag form on real data, and the
    (key, ts, sid) carry chain is exact when one key spans every block —
    sessions crossing block boundaries keep one id; boundary gaps still
    split (VERDICT r3 #3)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages import window

    ds = read_table("/root/testdata/sf0.001", "events",
                    columns=["event_id", "ts", "user_id"])
    kw = dict(key_cols=["user_id"], order_cols=["ts", "event_id"],
              ts_col="ts", gap_seconds=1800.0)
    plain = window.sessionize(ds, agg="tag", auto_bucket_threshold=None, **kw
                              ).to_pandas().sort_values("event_id").reset_index(drop=True)
    srt = window.sessionize_tag_sorted(ds.repartition(16), **kw
                                       ).to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        plain["session_id"].astype("int64"), srt["session_id"].astype("int64"))

    # hot key: 20k rows 1s apart with a >gap break every 997 rows
    n = 20_000
    ts = np.arange(n, dtype=np.int64)
    ts += (ts // 997) * 100  # inject a 100s jump at each 997-row boundary
    t = pa.table({
        "k": ["hot"] * n + ["b", "b"],
        "ts": pa.array(np.concatenate([ts, [0, 1000]]) * 1_000_000,
                       pa.timestamp("us")),
        "eid": pa.array(np.arange(n + 2), pa.int64()),
    })
    out = window.sessionize_tag_sorted(
        rd.from_arrow(t).repartition(12), key_cols=["k"],
        order_cols=["ts", "eid"], ts_col="ts", gap_seconds=60.0,
    ).to_pandas()
    hot = out[out.k == "hot"].sort_values("eid")
    assert (hot["session_id"].to_numpy() == np.arange(n) // 997).all()
    assert sorted(out[out.k == "b"]["session_id"].tolist()) == [0, 1]


def test_asof_right_tiebreak_max_semantics_across_blocks():
    """right_tiebreak: among right rows sharing (key, ts), the greatest
    tiebreak value wins in BOTH paths — equivalent to a max() pre-
    aggregate without its shuffle (r4 perf fix) — including when the tied
    rows straddle block boundaries of the sorted path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.asof import (
        asof_join,
        asof_join_sorted,
    )

    rng = np.random.default_rng(7)
    n_l, n_r = 4000, 3000
    left = pa.table({
        "eid": pa.array(np.arange(n_l), pa.int64()),
        "k": pa.array(rng.integers(0, 5, n_l), pa.int64()),
        "lts": pa.array(rng.integers(0, 50, n_l), pa.int64()),
    })
    # many duplicate (k, ts) right rows with distinct tiebreak values
    right = pa.table({
        "k": pa.array(rng.integers(0, 5, n_r), pa.int64()),
        "rts": pa.array(rng.integers(0, 50, n_r), pa.int64()),
        "rv": pa.array(rng.permutation(n_r), pa.int64()),
    })
    kw = dict(key="k", left_ts="lts", right_ts="rts", right_cols=["rv"],
              right_tiebreak="rv")
    plain = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                      auto_sorted_threshold=None, **kw
                      ).to_pandas().sort_values("eid").reset_index(drop=True)
    srt = asof_join_sorted(rd.from_arrow(left).repartition(16),
                           rd.from_arrow(right).repartition(16), **kw
                           ).to_pandas().sort_values("eid").reset_index(drop=True)
    # reference: dedupe right to max rv per (k, ts), then backward asof
    ldf = left.to_pandas().sort_values("lts", kind="mergesort")
    rdf = (right.to_pandas().groupby(["k", "rts"], as_index=False)["rv"]
           .max().sort_values("rts", kind="mergesort"))
    ref = pd.merge_asof(ldf, rdf, left_on="lts", right_on="rts", by="k",
                        direction="backward").sort_values(
        "eid").reset_index(drop=True)
    for got, name in ((plain, "plain"), (srt, "sorted")):
        pd.testing.assert_series_equal(
            got["rv"].astype("float64"), ref["rv"].astype("float64"),
            check_names=False), name
    assert len(plain) == len(srt) == n_l


def test_tfidf_top_terms_both_df_paths_and_edges():
    """top_terms_per_doc: driver-merge ≡ shuffle-final df paths; empty
    docs, consecutive separators, tf/term tie ranking (tf DESC, term
    ASC), and k > distinct terms."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.tfidf import (
        top_terms_per_doc,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["b a a  c b", "a a  b", "", "z z z q"],
    })
    ds = rd.from_arrow(t).repartition(3)
    for gate in (5_000_000, 0):  # driver merge vs hash-shuffle final
        out = top_terms_per_doc(ds, k=2, df_driver_gate=gate).to_pandas()
        out = out.sort_values(["doc_id", "tf", "term"],
                              ascending=[True, False, True],
                              ignore_index=True)
        rows = list(map(tuple, out.itertuples(index=False)))
        # doc1: a(tf2) then b(tf2) — tf tie broken by term ASC; c dropped
        # doc3 is empty -> no rows; doc4: z(3), q(1)
        assert rows == [
            (1, "a", 2, 2), (1, "b", 2, 2),
            (2, "a", 2, 2), (2, "b", 1, 2),
            (4, "z", 3, 1), (4, "q", 1, 1),
        ], (gate, rows)


def test_decontaminate_bloom_matches_exact_and_kills_false_positives():
    """Bloom scale path invariants: (a) no false negatives — every
    contaminated doc from the exact broadcast path is flagged with the
    SAME overlap count; (b) a deliberately tiny bitmap (m=256 bits)
    forces false positives into the candidate set and the verify join
    must kill them all; (c) clean corpus -> empty result."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.decontaminate import (
        bloom_build,
        bloom_contains,
        decontaminate,
        decontaminate_bloom,
    )

    bench = pa.array([
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ])
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": [
            "the quick brown fox jumps over a fence",   # 4 shared trigrams
            "pack my box with five dozen eggs today",   # 4 shared
            "completely unrelated text about ray data pipelines here",
            "the quick brown dog sits",                 # 1 shared (< min)
            "",                                          # empty
            "pack my box with five dozen liquor jugs",  # full overlap (6)
        ],
    })
    ds = rd.from_arrow(docs).repartition(3)

    exact = decontaminate(ds, bench, n=3, min_overlap=3).to_pandas()
    exact = exact[exact.contaminated][["doc_id", "overlap"]]
    want = sorted(map(tuple, exact.itertuples(index=False)))
    assert want == [(0, 4), (1, 4), (5, 6)]

    # tiny bitmap -> heavy false-positive pressure on the prefilter;
    # verify_driver_rows=0 forces the distributed-join verify path, the
    # default takes the driver-verify path — both must match the exact set
    for m_bits in (256, 1 << 23):
        for gate in (0, 5_000_000):
            got = decontaminate_bloom(
                rd.from_arrow(docs).repartition(3), bench, n=3,
                min_overlap=3, id_col="doc_id", m_bits=m_bits, k=3,
                verify_driver_rows=gate).to_pandas()
            rows = sorted(map(tuple, got.itertuples(index=False)))
            assert rows == want, (m_bits, gate, rows)

    # membership primitive: zero false negatives by construction
    grams = pa.array([f"g{i} x{i} y{i}" for i in range(200)])
    bits = bloom_build(grams, m_bits=1 << 12, k=5)
    assert bloom_contains(bits, grams, k=5).all()

    # clean corpus -> empty early-return path
    clean = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": ["nothing shared with any benchmark document at all"],
    }))
    out = decontaminate_bloom(clean, bench, n=3, min_overlap=1,
                              id_col="doc_id")
    assert out.count() == 0


def test_token_budget_sample_matches_pandas_reference_under_skew():
    """token_budget_sample ≡ greedy hash-order reference on a skewed
    multi-block input (one hot group spanning blocks); every group's kept
    total is <= budget and adding any group's next-in-hash-order dropped
    doc would overflow it (greedy maximality)."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.functions.hashing import (
        md5_u64,
    )
    from opentelemetry_collector_contrib_ray.stages.sample import (
        token_budget_sample,
    )

    n = 400
    keys = [f"d{i:04d}" for i in range(n)]
    # group skew: 85% of rows in one hot group
    groups = ["hot" if i % 20 else f"g{i % 7}" for i in range(1, n + 1)]
    toks = [(i * 37) % 90 + 1 for i in range(n)]
    t = pa.table({"doc_id": keys, "src": groups,
                  "n_tok": pa.array(toks, pa.int32())})
    budget = 600
    out = token_budget_sample(
        rd.from_arrow(t).repartition(7), group_col="src", key="doc_id",
        tok_col="n_tok", budget=budget).to_pandas()

    df = pd.DataFrame({"doc_id": keys, "src": groups, "n_tok": toks})
    df["_h"] = [md5_u64(k) for k in keys]
    df = df.sort_values(["src", "_h", "doc_id"])
    df["cum"] = df.groupby("src")["n_tok"].cumsum()
    ref = df[df["cum"] <= budget]

    got = set(out["doc_id"])
    assert got == set(ref["doc_id"])
    # cum_tok values match the reference's running totals
    m = out.set_index("doc_id")["cum_tok"].to_dict()
    assert all(m[r.doc_id] == r.cum for r in ref.itertuples())
    # greedy maximality: first dropped doc per group would overflow
    dropped = df[df["cum"] > budget].groupby("src").head(1)
    for r in dropped.itertuples():
        kept_total = ref.loc[ref["src"] == r.src, "n_tok"].sum()
        assert kept_total + r.n_tok > budget
