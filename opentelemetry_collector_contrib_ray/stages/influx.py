"""influxdbreceiver analog: InfluxDB line-protocol decoding + untyped
metric fan-out.

Parity with receiver/influxdbreceiver/receiver.go:120-205 (the decode
loop: measurement → tags → fields → timestamp, per-line errors) and the
public line-protocol v2 grammar the receiver's decoder implements:

- ``measurement[,tag=val...] field=value[,field=value...] [timestamp]``
- escaping: measurement unescapes ``\\,`` and ``\\ ``; tag keys/values
  and field keys additionally unescape ``\\=``; a backslash before any
  other character stays a literal backslash; string field values are
  double-quoted with ``\\"`` and ``\\\\`` escapes;
- field value types: ``123i`` int64 (range-checked), ``123u`` uint64
  (values above int64 max are rejected here — documented deviation,
  the engine's value column is int64), bare/scientific decimals →
  float64, ``t/T/true/True/TRUE/f/F/false/False/FALSE`` → bool,
  quoted → string; duplicate tag/field keys last-write-win (the
  receiver collects both into Go maps, receiver.go:150-163);
- timestamp: optional signed int64 scaled by the request ``precision``
  (ns/us/ms/s + aliases, receiver.go:108-117); a missing timestamp is
  null here (the reference stamps arrival time — a batch engine has
  none, same documented deviation as the wavefront stage);
- blank lines and ``#`` comment lines produce no points.

Untyped fan-out (the receiver converts every point with
InfluxMetricValueTypeUntyped, receiver.go:184; rules = the public
influx2otel unknown-schema conversion, pinned by the receiver's own
test vector ``cpu_temp,foo=bar gauge=87.332`` → gauge "cpu_temp"):
one output row PER FIELD; field key ``gauge`` → metric named by the
measurement (type gauge), field key ``counter`` → measurement (type
counter), measurement ``prometheus`` → the field key itself, anything
else → ``measurement_fieldkey`` (gauge). Bool/string fields keep their
typed value columns instead of being dropped (superset, documented).

Execution shape: one task-based map_batches, block-local fan-out, zero
shuffle. Lines without backslashes/quotes/extra spaces (the telegraf
hot path) are parsed fully vectorized in arrow/numpy; escaped or quoted
lines fall back to a literal restatement of the decoder scanner.
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAP_TYPE = pa.map_(pa.string(), pa.string())

_INT_RE = r"^-?\d+i$"
_UINT_RE = r"^\d+u$"
_FLOAT_RE = r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
_BOOL_RE = r"^(t|T|true|True|TRUE|f|F|false|False|FALSE)$"
_TS_RE = r"^-?\d+$"
_PAIR_RE = r"^(?P<k>[^=]+)=(?P<v>[^=]+)$"

_BOOLS = {"t": True, "T": True, "true": True, "True": True, "TRUE": True,
          "f": False, "F": False, "false": False, "False": False,
          "FALSE": False}

# receiver.go:108-117
PRECISIONS = {"ns": 1, "n": 1, "µs": 1_000, "µ": 1_000, "us": 1_000,
              "u": 1_000, "ms": 1_000_000, "s": 1_000_000_000}

_I64_MIN, _I64_MAX = -(2**63), 2**63 - 1

# field typecodes
_F_DBL, _F_INT, _F_BOOL, _F_STR = 0, 1, 2, 3


def _np_str(arr) -> np.ndarray:
    return np.asarray(arr.to_numpy(zero_copy_only=False), object)


def _read_escaped(s: str, i: int, stops: str, escapes: str):
    """Read until an unescaped stop char; unescape only ``escapes``."""
    out = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n and s[i + 1] in escapes:
            out.append(s[i + 1])
            i += 2
            continue
        if c in stops:
            break
        out.append(c)
        i += 1
    return "".join(out), i


def decode_line(s: str):
    """Line-protocol v2 scanner restated literally — the exact-parity
    fallback for escaped/quoted/multi-space lines. Returns None for
    blank/comment lines, an error string, or
    ``(measurement, tags[(k,v)], fields[(k, typecode, value)], ts)``
    with ts None when omitted (raw integer, pre-precision)."""
    n = len(s)
    i = 0
    while i < n and s[i] == " ":
        i += 1
    if i == n or s[i] == "#":
        return None
    meas, i = _read_escaped(s, i, ", ", ", ")
    if meas == "":
        return "empty measurement"
    tags = []
    while i < n and s[i] == ",":
        k, i = _read_escaped(s, i + 1, "=, ", ",= ")
        if k == "" or i >= n or s[i] != "=":
            return "invalid tag key"
        v, i = _read_escaped(s, i + 1, ", ", ",= ")
        if v == "":
            return "empty tag value"
        tags.append((k, v))
    if i >= n or s[i] != " ":
        return "missing fields"
    while i < n and s[i] == " ":
        i += 1
    if i == n:
        return "missing fields"
    fields = []
    while True:
        k, i = _read_escaped(s, i, "=, ", ",= ")
        if k == "" or i >= n or s[i] != "=":
            return "invalid field key"
        i += 1
        if i < n and s[i] == '"':
            out = []
            i += 1
            while i < n:
                c = s[i]
                if c == "\\" and i + 1 < n and s[i + 1] in '"\\':
                    out.append(s[i + 1])
                    i += 2
                    continue
                if c == '"':
                    break
                out.append(c)
                i += 1
            if i >= n:
                return "unterminated string field value"
            i += 1
            fields.append((k, _F_STR, "".join(out)))
        else:
            j = i
            while j < n and s[j] not in ", ":
                j += 1
            tok = s[i:j]
            i = j
            if tok == "":
                return "missing field value"
            if tok[-1] == "i" and _match1(tok, _INT_RE):
                iv = int(tok[:-1])
                if not (_I64_MIN <= iv <= _I64_MAX):
                    return "int field value out of range"
                fields.append((k, _F_INT, iv))
            elif tok[-1] == "u" and _match1(tok, _UINT_RE):
                iv = int(tok[:-1])
                if iv > _I64_MAX:
                    return "uint field value out of int64 range"
                fields.append((k, _F_INT, iv))
            elif tok in _BOOLS:
                fields.append((k, _F_BOOL, _BOOLS[tok]))
            elif _match1(tok, _FLOAT_RE):
                fields.append((k, _F_DBL, float(tok)))
            else:
                return "invalid field value"
        if i < n and s[i] == ",":
            i += 1
            continue
        break
    ts = None
    if i < n:
        if s[i] != " ":
            return "invalid field separator"
        while i < n and s[i] == " ":
            i += 1
        if i < n:
            j = i
            if s[j] == "-":
                j += 1
            k0 = j
            while j < n and s[j].isdigit():
                j += 1
            if k0 == j:
                return "invalid timestamp"
            tok = s[i:j]
            i = j
            while i < n and s[i] == " ":
                i += 1
            if i < n:
                return "trailing characters after timestamp"
            ts = int(tok)
            if not (_I64_MIN <= ts <= _I64_MAX):
                return "timestamp out of range"
    return meas, tags, fields, ts


_COMPILED: dict = {}


def _match1(s: str, pattern: str) -> bool:
    rx = _COMPILED.get(pattern)
    if rx is None:
        rx = _COMPILED[pattern] = _re.compile(pattern)
    return rx.match(s) is not None


def metric_name(measurement: str, field_key: str):
    """influx2otel unknown-schema naming (see module docstring)."""
    if measurement == "prometheus":
        return field_key, "gauge"
    if field_key == "gauge":
        return measurement, "gauge"
    if field_key == "counter":
        return measurement, "counter"
    return measurement + "_" + field_key, "gauge"


def _last_wins(rows: np.ndarray, keys: np.ndarray):
    """Boolean mask keeping the LAST occurrence of each (row, key)."""
    codes = pa.array(keys.astype(str)).dictionary_encode()
    kcode = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    packed = rows.astype(np.int64) * (kcode.max() + 1) + kcode
    last = np.zeros(len(packed), bool)
    _, first_rev = np.unique(packed[::-1], return_index=True)
    last[len(packed) - 1 - first_rev] = True
    return last


def parse_influx_batch(batch: pa.Table, line_col: str = "line", *,
                       precision: str = "ns",
                       on_error: str = "drop") -> pa.Table:
    """Decode one Arrow batch of line-protocol text. Output: original
    columns (gathered per fan-out row) + measurement, name, metric_type,
    tags map<string,string>, field_key, value_double, value_int,
    value_bool, value_str, timestamp_ns, error."""
    mult = PRECISIONS[precision]
    lines = batch.column(line_col)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = pc.fill_null(lines.cast(pa.string()), "")
    n = len(lines)

    line_err = np.full(n, None, object)
    line_meas = np.full(n, None, object)
    line_ts = np.full(n, None, object)      # raw int or None
    line_skip = np.zeros(n, bool)

    # entry accumulators (occurrence order per line)
    t_rows: list = []
    t_ord: list = []
    t_key: list = []
    t_val: list = []
    f_rows: list = []
    f_ord: list = []
    f_key: list = []
    f_code: list = []
    f_int: list = []
    f_dbl: list = []
    f_bool: list = []
    f_str: list = []

    skip_mask = pc.match_substring_regex(
        lines, r"^ *(#|$)").to_numpy(zero_copy_only=False)
    line_skip |= skip_mask
    esc = pc.match_substring(lines, "\\").to_numpy(zero_copy_only=False)
    quo = pc.match_substring(lines, '"').to_numpy(zero_copy_only=False)
    fast = ~skip_mask & ~esc & ~quo
    slow_rows: list[np.ndarray] = [np.nonzero(~skip_mask & ~fast)[0]]

    fr = np.nonzero(fast)[0]
    if len(fr):
        sub = pc.take(lines, pa.array(fr))
        parts = pc.split_pattern(sub, " ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        off = parts.offsets.to_numpy().astype(np.int64)
        vals = parts.values
        lens = np.diff(off)
        empty_tok = (pc.utf8_length(vals).to_numpy(zero_copy_only=False)
                     == 0)
        parent = np.repeat(np.arange(len(fr)), lens)
        bad_shape = ~np.isin(lens, (2, 3))
        if empty_tok.any():
            bad_shape |= np.bincount(parent[empty_tok],
                                     minlength=len(fr)).astype(bool)
        ok = ~bad_shape
        if bad_shape.any():
            slow_rows.append(fr[bad_shape])
        oi = np.nonzero(ok)[0]
        if len(oi):
            rows = fr[oi]                       # absolute line indices
            demote = np.zeros(len(oi), bool)    # local → slow fallback

            # ---- measurement + tags (token 0) ---------------------------
            t0 = pc.take(vals, pa.array(off[:-1][oi]))
            mt = pc.split_pattern(t0, ",")
            if isinstance(mt, pa.ChunkedArray):
                mt = mt.combine_chunks()
            moff = mt.offsets.to_numpy().astype(np.int64)
            moff = moff - moff[0]
            mvals = mt.values
            mlens = np.diff(moff)
            meas = _np_str(pc.take(mvals, pa.array(moff[:-1])))
            demote |= meas == ""
            tag_parent = np.repeat(np.arange(len(oi)), mlens - 1)
            mask_tag = np.ones(len(mvals), bool)
            mask_tag[moff[:-1]] = False
            tag_toks = mvals.filter(pa.array(mask_tag))
            tag_bad = np.zeros(len(tag_toks), bool)
            tkv = None
            if len(tag_toks):
                tkv = pc.extract_regex(tag_toks, _PAIR_RE)
                tag_bad = pc.is_null(tkv).to_numpy(zero_copy_only=False)
                if tag_bad.any():
                    demote[np.unique(tag_parent[tag_bad])] = True

            # ---- fields (token 1) ---------------------------------------
            t1 = pc.take(vals, pa.array(off[:-1][oi] + 1))
            ft = pc.split_pattern(t1, ",")
            if isinstance(ft, pa.ChunkedArray):
                ft = ft.combine_chunks()
            foff = ft.offsets.to_numpy().astype(np.int64)
            foff = foff - foff[0]
            fvals = ft.values
            fparent = np.repeat(np.arange(len(oi)), np.diff(foff))
            kv = pc.extract_regex(fvals, _PAIR_RE)
            bad = pc.is_null(kv).to_numpy(zero_copy_only=False)
            if bad.any():
                demote[np.unique(fparent[bad])] = True
            fk = _np_str(pc.struct_field(kv, "k"))
            fv_pa = pc.struct_field(kv, "v")
            fv = _np_str(fv_pa)
            fv_filled = pc.fill_null(fv_pa, "")
            is_int = pc.match_substring_regex(
                fv_filled, _INT_RE).to_numpy(zero_copy_only=False)
            is_uint = pc.match_substring_regex(
                fv_filled, _UINT_RE).to_numpy(zero_copy_only=False)
            is_bool = pc.match_substring_regex(
                fv_filled, _BOOL_RE).to_numpy(zero_copy_only=False)
            is_dbl = pc.match_substring_regex(
                fv_filled, _FLOAT_RE).to_numpy(
                zero_copy_only=False) & ~is_bool
            unknown = ~bad & ~(is_int | is_uint | is_bool | is_dbl)
            if unknown.any():
                demote[np.unique(fparent[unknown])] = True

            # ---- timestamp (token 2) ------------------------------------
            has_ts = lens[oi] == 3
            ts_raw = np.full(len(oi), None, object)
            hi = np.nonzero(has_ts)[0]
            if len(hi):
                t2 = pc.take(vals, pa.array(off[:-1][oi[hi]] + 2))
                ts_ok = pc.match_substring_regex(
                    t2, _TS_RE).to_numpy(zero_copy_only=False)
                demote[hi[~ts_ok]] = True
                t2_np = _np_str(t2)
                for j in np.nonzero(ts_ok)[0]:
                    tv = int(t2_np[j])
                    if _I64_MIN <= tv <= _I64_MAX:
                        ts_raw[hi[j]] = tv
                    else:
                        demote[hi[j]] = True

            good = np.nonzero(~demote)[0]
            if demote.any():
                slow_rows.append(rows[demote])
            if len(good):
                line_meas[rows[good]] = meas[good]
                line_ts[rows[good]] = ts_raw[good]
                if tkv is not None:
                    keep_t = ~tag_bad & ~demote[tag_parent]
                    ti = np.nonzero(keep_t)[0]
                    if len(ti):
                        t_rows.append(rows[tag_parent[ti]])
                        t_ord.append(np.arange(len(ti)))
                        t_key.append(_np_str(pc.struct_field(tkv, "k"))[ti])
                        t_val.append(_np_str(pc.struct_field(tkv, "v"))[ti])
                keep_f = ~demote[fparent] & ~bad
                ki = np.nonzero(keep_f)[0]
                if len(ki):
                    kp = fparent[ki]
                    f_rows.append(rows[kp])
                    f_ord.append(np.arange(len(ki)))
                    f_key.append(fk[ki])
                    code = np.select(
                        [is_int[ki] | is_uint[ki], is_bool[ki]],
                        [_F_INT, _F_BOOL], default=_F_DBL)
                    f_code.append(code)
                    vi = np.zeros(len(ki), np.int64)
                    ii = np.nonzero(is_int[ki] | is_uint[ki])[0]
                    oflow = []
                    if len(ii):
                        toks = fv[ki[ii]]
                        for p, t in zip(ii, toks):
                            v = int(t[:-1])
                            if _I64_MIN <= v <= _I64_MAX:
                                vi[p] = v
                            else:
                                oflow.append(p)
                    vd = np.zeros(len(ki), np.float64)
                    di = np.nonzero(is_dbl[ki])[0]
                    if len(di):
                        vd[di] = np.asarray(fv[ki[di]], dtype=np.float64)
                    vb = np.zeros(len(ki), bool)
                    bi = np.nonzero(is_bool[ki])[0]
                    for p in bi:
                        vb[p] = _BOOLS[fv[ki[p]]]
                    f_int.append(vi)
                    f_dbl.append(vd)
                    f_bool.append(vb)
                    f_str.append(np.full(len(ki), None, object))
                    if oflow:
                        for p in oflow:
                            line_err[rows[kp[p]]] = (
                                "int field value out of range"
                                if fv[ki[p]][-1] == "i" else
                                "uint field value out of int64 range")

    # ---- exact scanner for everything demoted ---------------------------
    lines_np = _np_str(lines)
    for i in np.unique(np.concatenate(slow_rows)).astype(np.int64):
        res = decode_line(lines_np[i])
        if res is None:
            line_skip[i] = True
            continue
        if isinstance(res, str):
            line_err[i] = res
            continue
        meas, tags, fields, ts = res
        line_meas[i] = meas
        line_ts[i] = ts
        if tags:
            t_rows.append(np.full(len(tags), i, np.int64))
            t_ord.append(np.arange(len(tags)))
            t_key.append(np.array([k for k, _ in tags], object))
            t_val.append(np.array([v for _, v in tags], object))
        if fields:
            f_rows.append(np.full(len(fields), i, np.int64))
            f_ord.append(np.arange(len(fields)))
            f_key.append(np.array([k for k, _, _ in fields], object))
            code = np.array([c for _, c, _ in fields], np.int64)
            f_code.append(code)
            f_int.append(np.array(
                [v if c == _F_INT else 0 for _, c, v in fields],
                np.int64))
            f_dbl.append(np.array(
                [v if c == _F_DBL else 0.0 for _, c, v in fields],
                np.float64))
            f_bool.append(np.array(
                [bool(v) if c == _F_BOOL else False
                 for _, c, v in fields], bool))
            f_str.append(np.array(
                [v if c == _F_STR else None for _, c, v in fields],
                object))

    # ---- per-line tag map (dup keys last-win, stable order) --------------
    tag_start = np.zeros(n, np.int64)
    tag_count = np.zeros(n, np.int64)
    flat_tk = np.zeros(0, object)
    flat_tv = np.zeros(0, object)
    if t_rows:
        rows = np.concatenate(t_rows)
        order = np.concatenate(t_ord)
        k_all = np.concatenate(t_key)
        v_all = np.concatenate(t_val)
        sort1 = np.lexsort((order, rows))
        rows, k_all, v_all = rows[sort1], k_all[sort1], v_all[sort1]
        last = _last_wins(rows, k_all)
        ok = last & (line_err[rows] == None)  # noqa: E711
        ki = np.nonzero(ok)[0]
        rows, flat_tk, flat_tv = rows[ki], k_all[ki], v_all[ki]
        tag_count = np.bincount(rows, minlength=n).astype(np.int64)
        tag_start[1:] = np.cumsum(tag_count)[:-1]

    # ---- fan-out: one output row per surviving field ---------------------
    out_line = np.zeros(0, np.int64)
    out_key = np.zeros(0, object)
    out_code = np.zeros(0, np.int64)
    out_int = np.zeros(0, np.int64)
    out_dbl = np.zeros(0, np.float64)
    out_bool = np.zeros(0, bool)
    out_str = np.zeros(0, object)
    if f_rows:
        rows = np.concatenate(f_rows)
        order = np.concatenate(f_ord)
        k_all = np.concatenate(f_key)
        code = np.concatenate(f_code)
        vi = np.concatenate(f_int)
        vd = np.concatenate(f_dbl)
        vb = np.concatenate(f_bool)
        vs = np.concatenate(f_str)
        sort1 = np.lexsort((order, rows))
        rows, k_all = rows[sort1], k_all[sort1]
        code, vi, vd, vb, vs = (code[sort1], vi[sort1], vd[sort1],
                                vb[sort1], vs[sort1])
        last = _last_wins(rows, k_all)
        ok = last & (line_err[rows] == None)  # noqa: E711
        ki = np.nonzero(ok)[0]
        out_line, out_key = rows[ki], k_all[ki]
        out_code, out_int, out_dbl = code[ki], vi[ki], vd[ki]
        out_bool, out_str = vb[ki], vs[ki]

    err_lines = np.nonzero(line_err != None)[0]  # noqa: E711
    if on_error == "drop":
        err_lines = err_lines[:0]
    m = len(out_line)
    all_lines = np.concatenate([out_line, err_lines]).astype(np.int64)

    # metric naming (vocabulary trick over distinct (measurement, key))
    names = np.full(len(all_lines), None, object)
    mtypes = np.full(len(all_lines), None, object)
    if m:
        meas_o = line_meas[out_line].astype(str)
        um, mi = np.unique(meas_o, return_inverse=True)
        uk, kii = np.unique(out_key.astype(str), return_inverse=True)
        packed = mi.astype(np.int64) * len(uk) + kii
        up, inv = np.unique(packed, return_inverse=True)
        mapped_n = np.empty(len(up), object)
        mapped_t = np.empty(len(up), object)
        for j, p in enumerate(up):
            mapped_n[j], mapped_t[j] = metric_name(
                um[p // len(uk)], uk[p % len(uk)])
        names[:m] = mapped_n[inv]
        mtypes[:m] = mapped_t[inv]

    # tags map per output row (line's deduped entries, repeated per field)
    out_tc = tag_count[all_lines]
    moff = np.zeros(len(all_lines) + 1, np.int64)
    np.cumsum(out_tc, out=moff[1:])
    total = int(moff[-1])
    if total:
        starts_rep = np.repeat(tag_start[all_lines], out_tc)
        within = np.arange(total) - np.repeat(moff[:-1], out_tc)
        fidx = starts_rep + within
        keys = pa.array(flat_tk[fidx].astype(str), pa.string())
        items = pa.array(flat_tv[fidx].astype(str), pa.string())
    else:
        keys = items = pa.array([], pa.string())
    tags_arr = pa.MapArray.from_arrays(
        pa.array(moff, pa.int32()), keys, items).cast(MAP_TYPE)

    # scaled-timestamp overflow (possible with coarse precisions) nulls
    # the timestamp — the raw integer itself was already range-checked
    ts_ns = np.full(len(all_lines), None, object)
    for j, li in enumerate(all_lines):
        t = line_ts[li]
        if t is not None and line_err[li] is None:
            v = t * mult
            if _I64_MIN <= v <= _I64_MAX:
                ts_ns[j] = v

    errcol = np.full(len(all_lines), None, object)
    errcol[m:] = line_err[err_lines]

    out = batch.take(pa.array(all_lines))
    for col_name, arr in (
        ("measurement", pa.array(
            [None if e is not None else v
             for v, e in zip(line_meas[all_lines], errcol)], pa.string())),
        ("name", pa.array(list(names), pa.string())),
        ("metric_type", pa.array(list(mtypes), pa.string())),
        ("tags", tags_arr),
        ("field_key", pa.array(
            [out_key[j] if j < m else None
             for j in range(len(all_lines))], pa.string())),
        ("value_double", pa.array(
            [float(out_dbl[j]) if j < m and out_code[j] == _F_DBL else None
             for j in range(len(all_lines))], pa.float64())),
        ("value_int", pa.array(
            [int(out_int[j]) if j < m and out_code[j] == _F_INT else None
             for j in range(len(all_lines))], pa.int64())),
        ("value_bool", pa.array(
            [bool(out_bool[j]) if j < m and out_code[j] == _F_BOOL
             else None for j in range(len(all_lines))], pa.bool_())),
        ("value_str", pa.array(
            [out_str[j] if j < m else None
             for j in range(len(all_lines))], pa.string())),
        ("timestamp_ns", pa.array(list(ts_ns), pa.int64())),
        ("error", pa.array(list(errcol), pa.string())),
    ):
        if col_name in out.column_names:
            out = out.set_column(out.column_names.index(col_name),
                                 col_name, arr)
        else:
            out = out.append_column(col_name, arr)
    return out


class _ParseInflux:
    def __init__(self, line_col: str, precision: str, on_error: str):
        self.line_col = line_col
        self.precision = precision
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_influx_batch(batch, self.line_col,
                                  precision=self.precision,
                                  on_error=self.on_error)


def parse_influx(ds, line_col: str = "line", *, precision: str = "ns",
                 on_error: str = "drop"):
    """InfluxDB line-protocol decode stage: one datapoint row per
    (line, field) — block-local fan-out, zero shuffle."""
    if precision not in PRECISIONS:
        raise ValueError(f"unrecognized precision '{precision}'")
    return ds.map_batches(_ParseInflux(line_col, precision, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
