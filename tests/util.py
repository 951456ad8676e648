"""Order-insensitive comparison helpers (pkg/pdatatest analog, SURVEY.md §5)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    # ray Dataset
    return obj.to_pandas()


def assert_frames_equal_unordered(left, right, keys: list[str] | None = None):
    """Sort both frames by key columns (or all columns), compare values."""
    l, r = to_pandas(left), to_pandas(right)
    for df in (l, r):
        for c in df.columns:
            if isinstance(df[c].dtype, pd.CategoricalDtype):
                df[c] = df[c].astype(str)
    l = l[sorted(l.columns)]
    r = r[sorted(r.columns)]
    assert list(l.columns) == list(r.columns), (list(l.columns), list(r.columns))
    sort_cols = keys if keys else list(l.columns)
    l = l.sort_values(sort_cols, ignore_index=True)
    r = r.sort_values(sort_cols, ignore_index=True)
    pd.testing.assert_frame_equal(l, r, check_dtype=False, check_exact=False, rtol=1e-9)
