"""carbonreceiver analog: Graphite plaintext line parsing.

Parity with receiver/carbonreceiver/protocol/path_parser_helper.go:92-147
and plaintext_parser.go:40-71:

- ``<metric_path> <metric_value> <metric_timestamp>`` — SplitN(" ", 4)
  must yield EXACTLY 3 parts (consecutive spaces or a 4th field are
  errors).
- path = ``<metric_name>[;tag0;...;tagN]``; empty name is an error; each
  tag needs ``=`` at index >= 1 (non-empty key, value may be empty);
  duplicate keys last-write-win (pcommon.Map PutStr).
- value: ParseInt first (→ int datapoint), else ParseFloat (→ double
  datapoint), else error.
- timestamp: ParseInt seconds first, else ParseFloat (Modf → sec +
  frac·1e9 ns), else error. (Go's Inf/NaN/hex float spellings are out of
  scope — decimal/scientific forms only, documented.)
- plaintext paths always produce gauges (TargetMetricType default); the
  ``regex`` parser config (protocol/regex_parser.go) is rule-driven path
  → name/attributes extraction — compose the engine's RegexParse +
  Transform stages for that variant.

One vectorized task-based map_batches — block-local, zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INT_RE = r"^[+-]?\d+$"
_FLOAT_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
_PATH_RE = r"^(?P<n>[^;]*)(?P<t>;.*)?$"
_TAG_RE = r"^(?P<k>[^=]+)=(?P<v>.*)$"


def _np_str(arr) -> np.ndarray:
    return np.asarray(arr.to_numpy(zero_copy_only=False), object)


def parse_carbon_batch(batch: pa.Table, line_col: str = "line") -> pa.Table:
    """Vectorized Parse over one Arrow batch. Output columns: name,
    tags map<string,string>, value_int int64 (null when the value is a
    float), value_double float64 (null when int), timestamp_s int64,
    timestamp_extra_ns int64, error string (null on success)."""
    lines = batch.column(line_col)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = pc.fill_null(lines.cast(pa.string()), "")
    n = len(lines)

    parts = pc.split_pattern(lines, " ", max_splits=3)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    off = parts.offsets.to_numpy().astype(np.int64)
    vals = parts.values
    lens = np.diff(off)
    err = np.full(n, None, object)

    def set_err(mask, code):
        new = mask & (err == None)  # noqa: E711
        err[new] = code

    ok3 = lens == 3
    set_err(~ok3, "invalid carbon metric")

    def field(i):
        idx = np.where(ok3, off[:-1] + i, 0)
        return pc.take(vals, pa.array(idx))

    path, valstr, tsstr = field(0), field(1), field(2)

    pm = pc.extract_regex(path, _PATH_RE)
    name = pc.struct_field(pm, "n")
    name_np = _np_str(pc.fill_null(name, ""))
    set_err(ok3 & (name_np == ""), "empty metric name extracted from path")

    # --- tags ----------------------------------------------------------
    tailstr = pc.struct_field(pm, "t")  # ";tag0;..." or null
    tail_np = _np_str(pc.fill_null(tailstr, ""))
    has_tags = ok3 & (tail_np != "") & (tail_np != ";")
    map_type = pa.map_(pa.string(), pa.string())
    moff = np.zeros(n + 1, np.int64)
    keys = items = pa.array([], pa.string())
    tag_rows = np.nonzero(has_tags)[0]
    if len(tag_rows):
        payload = pc.utf8_slice_codeunits(
            pc.take(pc.fill_null(tailstr, ""), pa.array(tag_rows)),
            1, np.iinfo(np.int32).max)  # drop the leading ';'
        tparts = pc.split_pattern(payload, ";")
        if isinstance(tparts, pa.ChunkedArray):
            tparts = tparts.combine_chunks()
        toff = tparts.offsets.to_numpy().astype(np.int64)
        tvals = tparts.values
        tlens = np.diff(toff)
        tparent = np.repeat(np.arange(len(tag_rows)), tlens)
        kv = pc.extract_regex(tvals, _TAG_RE)
        bad = pc.is_null(kv).to_numpy(zero_copy_only=False)
        if bad.any():
            set_err(np.isin(np.arange(n), tag_rows[tparent[bad]]),
                    "incorrect key value separator")
        rows_all = tag_rows[tparent]
        keep_err = err[rows_all] == None  # noqa: E711
        k_np = _np_str(pc.fill_null(pc.struct_field(kv, "k"), ""))
        v_np = _np_str(pc.fill_null(pc.struct_field(kv, "v"), ""))
        # duplicate keys: last PutStr wins — keep the LAST (row, key)
        codes = pa.array(k_np.astype(str)).dictionary_encode()
        kcode = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = rows_all.astype(np.int64) * (kcode.max() + 1) + kcode
        order = np.arange(len(packed))
        last = np.zeros(len(packed), bool)
        # np.unique keeps the FIRST occurrence — scan reversed
        _, first_rev = np.unique(packed[::-1], return_index=True)
        last[len(packed) - 1 - first_rev] = True
        keep = keep_err & last
        ki = np.nonzero(keep)[0]
        ki = ki[np.argsort(order[ki], kind="stable")]
        rows_k = rows_all[ki]
        counts = np.bincount(rows_k, minlength=n)
        np.cumsum(counts, out=moff[1:])
        sort2 = np.lexsort((order[ki], rows_k))
        keys = pa.array(k_np[ki][sort2].astype(str), pa.string())
        items = pa.array(v_np[ki][sort2].astype(str), pa.string())
    tags = pa.MapArray.from_arrays(pa.array(moff, pa.int32()), keys, items)

    # --- value: int first, else float ----------------------------------
    v_np = _np_str(pc.fill_null(valstr, ""))
    v_int_ok = pc.match_substring_regex(
        pc.fill_null(valstr, ""), _INT_RE).to_numpy(zero_copy_only=False)
    v_flt_ok = pc.match_substring_regex(
        pc.fill_null(valstr, ""), _FLOAT_RE).to_numpy(
        zero_copy_only=False) & ~v_int_ok
    set_err(ok3 & ~v_int_ok & ~v_flt_ok, "invalid carbon metric value")
    # Go ParseInt range check: out-of-int64 integers fall through to float
    v_int = np.zeros(n, np.int64)
    ii = np.nonzero(v_int_ok)[0]
    if len(ii):
        try:
            v_int[ii] = pc.cast(pa.array(v_np[ii].astype(str)),
                                pa.int64()).to_numpy()
        except pa.lib.ArrowInvalid:  # rare: an overflowing integer
            for i in ii:
                iv = int(v_np[i])
                if -(2**63) <= iv < 2**63:
                    v_int[i] = iv
                else:
                    v_int_ok[i] = False
                    v_flt_ok[i] = True
    v_dbl = np.zeros(n, np.float64)
    fi = np.nonzero(v_flt_ok)[0]
    if len(fi):
        v_dbl[fi] = np.asarray(v_np[fi], dtype=np.float64)

    # --- timestamp: int seconds, else float sec.frac --------------------
    t_np = _np_str(pc.fill_null(tsstr, ""))
    t_int_ok = pc.match_substring_regex(
        pc.fill_null(tsstr, ""), _INT_RE).to_numpy(zero_copy_only=False)
    t_flt_ok = pc.match_substring_regex(
        pc.fill_null(tsstr, ""), _FLOAT_RE).to_numpy(
        zero_copy_only=False) & ~t_int_ok
    set_err(ok3 & ~t_int_ok & ~t_flt_ok, "invalid carbon metric time")
    ts_s = np.zeros(n, np.int64)
    ts_ns = np.zeros(n, np.int64)
    tii = np.nonzero(t_int_ok)[0]
    if len(tii):
        try:
            ts_s[tii] = pc.cast(pa.array(t_np[tii].astype(str)),
                                pa.int64()).to_numpy()
        except pa.lib.ArrowInvalid:
            for i in tii:
                tv = int(t_np[i])
                if -(2**63) <= tv < 2**63:
                    ts_s[i] = tv
                else:
                    t_int_ok[i] = False
                    t_flt_ok[i] = True
    ti = np.nonzero(t_flt_ok)[0]
    if len(ti):
        f = np.asarray(t_np[ti], dtype=np.float64)
        sec = np.trunc(f)  # math.Modf: integer part toward zero
        ts_s[ti] = sec.astype(np.int64)
        ts_ns[ti] = ((f - sec) * 1e9).astype(np.int64)

    err_mask = err != None  # noqa: E711
    out = batch
    for col_name, arr in (
        ("name", pa.array(np.where(err_mask, None, name_np), pa.string())),
        ("tags", tags.cast(map_type)),
        ("value_int", pa.array(
            [None if (e or not o) else int(v)
             for e, o, v in zip(err_mask, v_int_ok, v_int)], pa.int64())),
        ("value_double", pa.array(
            [None if (e or not o) else float(v)
             for e, o, v in zip(err_mask, v_flt_ok, v_dbl)], pa.float64())),
        ("timestamp_s", pa.array(
            np.where(err_mask, 0, ts_s), pa.int64())),
        ("timestamp_extra_ns", pa.array(
            np.where(err_mask, 0, ts_ns), pa.int64())),
        ("error", pa.array(err, pa.string())),
    ):
        if col_name in out.column_names:
            out = out.set_column(out.column_names.index(col_name),
                                 col_name, arr)
        else:
            out = out.append_column(col_name, arr)
    return out


class _ParseCarbon:
    def __init__(self, line_col: str, on_error: str):
        self.line_col = line_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = parse_carbon_batch(batch, self.line_col)
        if self.on_error == "drop":
            out = out.filter(pc.is_null(out.column("error")))
            out = out.drop_columns(["error"])
        return out


def parse_carbon(ds, line_col: str = "line", *, on_error: str = "drop"):
    """Graphite/Carbon plaintext parse stage (block-local, zero shuffle)."""
    return ds.map_batches(_ParseCarbon(line_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
