"""As-of (temporal) join — a custom operator Ray Data lacks natively.

Semantics: for each left row, attach the most recent right row with the
same key and ``right_ts <= left_ts`` (backward direction) — the classic
enrich-with-latest-state join (DuckDB/pandas ``ASOF JOIN`` semantics).

Composition (per the guide's as-of/range-join recipe): tag both sides,
align schemas, union, hash-shuffle ``groupby(key)`` so each key's rows
co-locate, and run ``pd.merge_asof`` over the sorted group.

Partitioning assumption (documented per the custom-operator rule): all rows
of one key fit in one group task — keys are entities (user, device,
series), whose history is bounded; for pathological keys, pre-split by
coarse time range and de-duplicate the boundary window.
"""

from __future__ import annotations

import pandas as pd


def asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
):
    """Backward as-of join of two Datasets on ``key``.

    ``right_cols`` are the columns carried from the matched right row
    (suffixed as-is; must not clash with left column names).
    Returns left columns + right_cols (null when no right row precedes).
    """

    left_cols = left.schema().names

    def tag(side: str, ts_col: str, all_cols: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_side"] = side
            df["_ts"] = df[ts_col]
            for c in all_cols:  # align union schema explicitly
                if c not in df.columns:
                    df[c] = None
            return df[all_cols + ["_side", "_ts"]]

        return fn

    all_cols = list(dict.fromkeys(left_cols + [key] + right_cols))
    l_tagged = left.map_batches(tag("l", left_ts, all_cols), batch_format="pandas")
    r_tagged = right.map_batches(tag("r", right_ts, all_cols), batch_format="pandas")
    unioned = l_tagged.union(r_tagged)

    out_cols = [c for c in left_cols] + [c for c in right_cols if c not in left_cols]

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lg = group[group["_side"] == "l"]
        rg = group[group["_side"] == "r"]
        if lg.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        lg = lg[left_cols + ["_ts"]].sort_values("_ts", kind="mergesort")
        if rg.empty:
            out = lg.drop(columns=["_ts"]).copy()
            for c in right_cols:
                if c not in out.columns:
                    out[c] = None
            return out[out_cols]
        rg = rg[["_ts"] + right_cols].sort_values("_ts", kind="mergesort")
        merged = pd.merge_asof(lg, rg, on="_ts", direction="backward")
        return merged.drop(columns=["_ts"])[out_cols]

    return unioned.groupby(key).map_groups(merge, batch_format="pandas")
