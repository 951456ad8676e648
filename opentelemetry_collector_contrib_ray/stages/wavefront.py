"""wavefrontreceiver analog: Wavefront metrics-data-format line parsing.

Parity with receiver/wavefrontreceiver/wavefront_parser.go:56-215 and
internal/collectd/labels.go:

- ``"<metricName> <metricValue> [<timestamp>] source=<source> [tags]"``
  — SplitN(" ", 3) needs >= 3 fields; the name is unDoubleQuoted
  (wrapping quotes stripped, :204-214).
- timestamp: ParseInt seconds; when that fails, the field counts as the
  first TAG iff it contains '=' (timestamp omitted), else error. The
  reference stamps arrival time for omitted timestamps — a batch engine
  has none, so ``timestamp_s`` is null there (documented deviation).
- tags (buildLabels, :146-202): space-separated ``k=v`` pairs; keys run
  to the FIRST '=' (and may contain spaces!); values are either
  unquoted (to the next space) or double-quoted (may contain spaces;
  ends at a '"' not immediately preceded by '\\'; only ``\\"`` and
  ``\\n`` unescape — the Wavefront SDK rule). Duplicate keys last-win
  (pcommon.Map PutStr). A key with no '=' anywhere left is an error.
- value: ParseInt → int datapoint, else ParseFloat → double, else error.
- extract_collectd_tags (injectCollectDLabels, :119-143 +
  collectd.LabelsFromName): repeatedly pull ``[k=v,f=x]`` bracket dims
  out of the name; when the loop stops, ``..`` collapses to ``.`` only
  if the ORIGINAL name had no ``..``.

Execution shape: one task-based map_batches. The hot path (unquoted
tags, every token carrying '=') is fully vectorized arrow/numpy; rows
with quoted values or space-bearing keys fall back to a literal
restatement of the Go scanner (rare by construction, bounded per batch).
Collectd name extraction runs once per DISTINCT name (vocabulary trick).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INT_RE = r"^[+-]?\d+$"
_FLOAT_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
_TOKEN_RE = r"^(?P<k>[^=]*)=(?P<v>.*)$"


def _np_str(arr) -> np.ndarray:
    return np.asarray(arr.to_numpy(zero_copy_only=False), object)


def go_build_labels(tags: str):
    """buildLabels restated literally. Returns list[(k, v)] or an error
    string — the exact-parity fallback for quoted/space-keyed rows."""
    out = []
    while True:
        tags = tags.lstrip(" ")
        if tags == "":
            return out
        key_end = tags.find("=")
        if key_end == -1:
            return "failed to break key"
        key = tags[:key_end]
        tags = tags[key_end + 1:]
        if len(tags) > 1 and tags[0] == '"':
            found_end = False
            found_escape = False
            value_end = 1
            while value_end < len(tags):
                c = tags[value_end]
                if c not in ('"', "n"):
                    value_end += 1
                    continue
                prev_esc = tags[value_end - 1] == "\\"
                if c == '"' and not prev_esc:
                    found_end = True
                    break
                found_escape = found_escape or prev_esc
                value_end += 1
            if not found_end:
                return "partially quoted tag value"
            value = tags[1:value_end]
            tags = tags[value_end + 1:]
            if found_escape:
                value = value.replace('\\"', '"').replace("\\n", "\n")
            out.append((key, value))
        else:
            value_end = tags.find(" ")
            if value_end == -1:
                out.append((key, tags))
                return out
            out.append((key, tags[:value_end]))
            tags = tags[value_end + 1:]


def labels_from_name(name: str):
    """collectd.LabelsFromName restated. Returns (name, dict|None)."""
    idx = name.find("[")
    if idx == -1:
        return name, None
    left, rest = name[:idx], name[idx + 1:]
    idx = rest.find("]")
    if idx == -1:
        return name, None
    dims, rest = rest[:idx], rest[idx + 1:]
    working = {}
    prev = 0
    cindex = dims.find(",")
    while True:
        if cindex < prev:
            cindex = len(dims)
        piece = dims[prev:cindex]
        t = piece.find("=")
        if t == -1 or "=" in piece[t + 1:]:
            return name, None
        working[piece[:t]] = piece[t + 1:]
        if cindex == len(dims):
            break
        prev = cindex + 1
        cindex = dims.find(",", prev)
    return left + rest, working


def inject_collectd_labels(name: str):
    """injectCollectDLabels (wavefront_parser.go:119-143). Returns
    (new_name, entries list)."""
    entries = []
    had_dotdot = ".." in name
    while True:
        name, dims = labels_from_name(name)
        if not dims:
            if not had_dotdot:
                name = name.replace("..", ".")
            break
        entries.extend(sorted(dims.items()))
    return name, entries


def parse_wavefront_batch(batch: pa.Table, line_col: str = "line", *,
                          extract_collectd_tags: bool = False) -> pa.Table:
    """Vectorized Parse over one Arrow batch. Output columns: name, tags
    map<string,string>, value_int, value_double, timestamp_s (null when
    the optional timestamp was omitted), error (null on success)."""
    lines = batch.column(line_col)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = pc.fill_null(lines.cast(pa.string()), "")
    n = len(lines)

    parts = pc.split_pattern(lines, " ", max_splits=2)
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
    set_err(~ok3, "invalid wavefront metric")

    def field(i):
        return pc.take(vals, pa.array(np.where(ok3, off[:-1] + i, 0)))

    rawname, valstr, rest = field(0), field(1), field(2)

    # unDoubleQuote the name
    nm = _np_str(pc.fill_null(rawname, ""))
    quoted = (pc.match_substring_regex(pc.fill_null(rawname, ""),
                                       r'^".*"$').to_numpy(
        zero_copy_only=False)) & (np.frompyfunc(len, 1, 1)(nm).astype(
            np.int64) >= 2)
    name_np = nm.copy()
    qi = np.nonzero(quoted)[0]
    if len(qi):
        name_np[qi] = np.frompyfunc(lambda s: s[1:-1], 1, 1)(nm[qi])
    set_err(ok3 & (name_np == ""), "empty name for wavefront metric")

    # rest -> timestamp [+ tags] (timestamp omitted iff field has '=')
    rparts = pc.split_pattern(rest, " ", max_splits=1)
    if isinstance(rparts, pa.ChunkedArray):
        rparts = rparts.combine_chunks()
    roff = rparts.offsets.to_numpy().astype(np.int64)
    rvals = rparts.values
    rlens = np.diff(roff)
    tsstr = pc.take(rvals, pa.array(roff[:-1]))
    tail = pc.take(rvals, pa.array(np.where(rlens == 2, roff[:-1] + 1, 0)))
    tail_np = _np_str(pc.fill_null(tail, ""))
    tail_np[rlens != 2] = ""

    ts_int_ok = pc.match_substring_regex(
        pc.fill_null(tsstr, ""), _INT_RE).to_numpy(zero_copy_only=False)
    ts_has_eq = pc.match_substring(
        pc.fill_null(tsstr, ""), "=").to_numpy(zero_copy_only=False)
    set_err(ok3 & ~ts_int_ok & ~ts_has_eq,
            "invalid timestamp for wavefront metric")
    ts_s = np.zeros(n, np.int64)
    tii = np.nonzero(ts_int_ok)[0]
    if len(tii):
        t_np = _np_str(pc.fill_null(tsstr, ""))
        try:
            ts_s[tii] = pc.cast(pa.array(t_np[tii].astype(str)),
                                pa.int64()).to_numpy()
        except pa.lib.ArrowInvalid:
            for i in tii:
                tv = int(t_np[i])
                if -(2**63) <= tv < 2**63:
                    ts_s[i] = tv
                else:
                    ts_int_ok[i] = False
                    set_err(np.isin(np.arange(n), [i]) & ~ts_has_eq,
                            "invalid timestamp for wavefront metric")
    # timestamp omitted: the whole rest is tags
    rest_np = _np_str(pc.fill_null(rest, ""))
    tags_np = np.where(ts_int_ok, tail_np, rest_np).astype(object)
    tags_np[~ok3] = ""

    # --- tags: vectorized fast path / Go-scan fallback ------------------
    has_quote = np.frompyfunc(lambda s: '"' in s, 1, 1)(tags_np).astype(
        bool)
    ent_rows: list[np.ndarray] = []
    ent_ord: list[np.ndarray] = []
    ent_key: list[np.ndarray] = []
    ent_val: list[np.ndarray] = []

    fast = (err == None) & (tags_np != "") & ~has_quote  # noqa: E711
    fr = np.nonzero(fast)[0]
    if len(fr):
        tok = pc.split_pattern(pa.array(tags_np[fr].astype(str)), " ")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        toff = tok.offsets.to_numpy().astype(np.int64)
        tvals = tok.values
        tparent = np.repeat(np.arange(len(fr)), np.diff(toff))
        t_np = _np_str(tvals)
        nonempty = t_np != ""
        has_eq = pc.match_substring(tvals, "=").to_numpy(
            zero_copy_only=False)
        bad_tok = nonempty & ~has_eq
        # a '='-less token merges into a space-bearing key in Go — route
        # those rows (rare) through the exact scanner
        slow_local = np.zeros(len(fr), bool)
        if bad_tok.any():
            slow_local[np.unique(tparent[bad_tok])] = True
        keep = nonempty & has_eq & ~slow_local[tparent]
        ki = np.nonzero(keep)[0]
        if len(ki):
            kv = pc.extract_regex(pc.take(tvals, pa.array(ki)), _TOKEN_RE)
            ent_rows.append(fr[tparent[ki]])
            ent_ord.append(np.arange(len(ki)))
            ent_key.append(_np_str(pc.struct_field(kv, "k")))
            ent_val.append(_np_str(pc.struct_field(kv, "v")))
        slow_extra = fr[slow_local]
    else:
        slow_extra = np.zeros(0, np.int64)

    slow = np.concatenate([
        np.nonzero((err == None) & has_quote & (tags_np != ""))[0],  # noqa: E711
        slow_extra]).astype(np.int64)
    for i in slow:
        res = go_build_labels(tags_np[i])
        if isinstance(res, str):
            err[i] = ("partially quoted tag value"
                      if res == "partially quoted tag value"
                      else "failed to break key")
            continue
        if res:
            ks, vs = zip(*res)
            ent_rows.append(np.full(len(res), i, np.int64))
            ent_ord.append(np.arange(len(res)))
            ent_key.append(np.array(ks, object))
            ent_val.append(np.array(vs, object))

    # --- value ----------------------------------------------------------
    v_np = _np_str(pc.fill_null(valstr, ""))
    v_int_ok = pc.match_substring_regex(
        pc.fill_null(valstr, ""), _INT_RE).to_numpy(zero_copy_only=False)
    v_flt_ok = pc.match_substring_regex(
        pc.fill_null(valstr, ""), _FLOAT_RE).to_numpy(
        zero_copy_only=False) & ~v_int_ok
    set_err(ok3 & ~v_int_ok & ~v_flt_ok, "invalid wavefront metric value")
    v_int = np.zeros(n, np.int64)
    ii = np.nonzero(v_int_ok)[0]
    if len(ii):
        try:
            v_int[ii] = pc.cast(pa.array(v_np[ii].astype(str)),
                                pa.int64()).to_numpy()
        except pa.lib.ArrowInvalid:
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

    # --- collectd name extraction (per distinct name) -------------------
    if extract_collectd_tags:
        uniq, inv = np.unique(name_np.astype(str), return_inverse=True)
        mapped = []
        extra = {}
        for j, u in enumerate(uniq):
            nn, ents = inject_collectd_labels(u)
            mapped.append(nn)
            if ents:
                extra[j] = ents
        name_np = np.array(mapped, object)[inv]
        if extra:
            for i in np.nonzero(np.isin(inv, list(extra)))[0]:
                if err[i] is not None:
                    continue
                ents = extra[inv[i]]
                ent_rows.append(np.full(len(ents), i, np.int64))
                ent_ord.append(np.arange(1000, 1000 + len(ents)))
                ent_key.append(np.array([k for k, _ in ents], object))
                ent_val.append(np.array([v for _, v in ents], object))

    # --- assemble the tags map (dup keys last-win, stable order) --------
    map_type = pa.map_(pa.string(), pa.string())
    moff = np.zeros(n + 1, np.int64)
    keys = items = pa.array([], pa.string())
    if ent_rows:
        rows = np.concatenate(ent_rows)
        order = np.concatenate(ent_ord)
        k_all = np.concatenate(ent_key)
        v_all = np.concatenate(ent_val)
        sort1 = np.lexsort((order, rows))
        rows, order = rows[sort1], order[sort1]
        k_all, v_all = k_all[sort1], v_all[sort1]
        codes = pa.array(k_all.astype(str)).dictionary_encode()
        kcode = codes.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        packed = rows * (kcode.max() + 1) + kcode
        last = np.zeros(len(packed), bool)
        _, first_rev = np.unique(packed[::-1], return_index=True)
        last[len(packed) - 1 - first_rev] = True
        ki = np.nonzero(last & (err[rows] == None))[0]  # noqa: E711
        rows_k = rows[ki]
        counts = np.bincount(rows_k, minlength=n)
        np.cumsum(counts, out=moff[1:])
        keys = pa.array(k_all[ki].astype(str), pa.string())
        items = pa.array(v_all[ki].astype(str), pa.string())
    tags = pa.MapArray.from_arrays(pa.array(moff, pa.int32()), keys, items)

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
            [None if (e or not o) else int(t)
             for e, o, t in zip(err_mask, ts_int_ok, ts_s)], pa.int64())),
        ("error", pa.array(err, pa.string())),
    ):
        if col_name in out.column_names:
            out = out.set_column(out.column_names.index(col_name),
                                 col_name, arr)
        else:
            out = out.append_column(col_name, arr)
    return out


class _ParseWavefront:
    def __init__(self, line_col: str, on_error: str, extract: bool):
        self.line_col = line_col
        self.on_error = on_error
        self.extract = extract

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = parse_wavefront_batch(batch, self.line_col,
                                    extract_collectd_tags=self.extract)
        if self.on_error == "drop":
            out = out.filter(pc.is_null(out.column("error")))
            out = out.drop_columns(["error"])
        return out


def parse_wavefront(ds, line_col: str = "line", *, on_error: str = "drop",
                    extract_collectd_tags: bool = False):
    """Wavefront data-format parse stage (block-local, zero shuffle)."""
    return ds.map_batches(
        _ParseWavefront(line_col, on_error, extract_collectd_tags),
        batch_format="pyarrow", zero_copy_batch=True)
