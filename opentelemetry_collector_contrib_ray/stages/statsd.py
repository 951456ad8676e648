"""statsdreceiver analog: StatsD/DogStatsD line parsing + interval
aggregation semantics.

Parse parity with receiver/statsdreceiver/internal/parser/statsd_parser.go
parseMessageToMetric (:346-463):

- ``<name>:<value>|<type>[|<part>...]`` — Cut at the FIRST '|' and ':'.
- types: c, g, h, ms, d (full names counter/gauge/histogram/timing/
  distribution); anything else is an error.
- option parts in any order; processing STOPS at the first empty part
  (the Go loop exits on ``part == ""`` — parts after ``||`` are silently
  ignored, not errors): ``@rate`` (float, last one wins), ``#k:v,k2:v2``
  DogStatsD tags (k required; bare keys only with enable_simple_tags;
  the inner tag loop also stops at the first empty tagset), ``c:<id>``
  container id (DogStatsD v1.2 → ``container.id`` tag, skipped when
  empty), ``T<seconds>`` timestamp (DogStatsD v1.3, counter/gauge only).
- ``+``/``-`` value prefix sets the gauge ``addition`` flag.
- enable_metric_type appends a ``metric_type=<fullname>`` tag last.

Aggregation parity with StatsDParser.Aggregate (:260-330) +
metric_translator.go (:145-172), restated for a batch engine (arrival
order = an explicit ``order_col``, unique per line — the same convention
as recombine/sessionize):

- counter: per-line ``int64(value / rate)`` (trunc toward zero, rate
  applied only when 0<rate<1) summed per description.
- gauge: last-write-wins with ``+``/``-`` addition deltas. The
  sequential Go semantics reduce to a CLOSED FORM per description:
  anchor = the last non-addition line (or the very first line if all
  are additions — buildGaugeMetric uses the signed value as the initial
  gauge); final = value[anchor] + Σ value[addition lines after anchor].
  Two partial-aggregation passes (anchor orders, then contributions) —
  zero sort, zero row shuffle; exchanged state is bounded by distinct
  metric descriptions × blocks.
- timing/histogram/distribution lines pass through parse (type column)
  for composition with the engine's quantile/histogram stages (the
  receiver's observer categories).

Tags travel as an Arrow map column from parse; the aggregate keys on the
canonical serialized form (occurrence order, ``k:v`` comma-joined).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

METRIC_TYPES = ("c", "g", "h", "ms", "d")
FULL_NAMES = {"c": "counter", "g": "gauge", "h": "histogram",
              "ms": "timing", "d": "distribution"}
_NUM_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
_UINT_RE = r"^\d+$"
_KV_RE = r"^(?P<k>[^:]*):?(?P<v>.*)$"
_NAMEVAL_RE = r"^(?P<n>[^:]*):(?P<v>.*)$"


def _np_str(arr) -> np.ndarray:
    return np.asarray(arr.to_numpy(zero_copy_only=False), object)


def _list_parts(col: pa.Array, sep: str):
    """split_pattern → (offsets int64, flat values StringArray)."""
    parts = pc.split_pattern(col, sep)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    off = parts.offsets.to_numpy().astype(np.int64)
    return off, parts.values


def parse_statsd_batch(batch: pa.Table, line_col: str = "line", *,
                       enable_metric_type: bool = False,
                       enable_simple_tags: bool = False) -> pa.Table:
    """Vectorized parseMessageToMetric over one Arrow batch.

    Output columns: name, metric_type (c/g/h/ms/d), value float64,
    addition bool, sample_rate float64 (null when absent), tags
    map<string,string>, timestamp_ns uint64 (null when absent), error
    string (null on success — callers drop or route on it). All input
    columns are preserved.
    """
    lines = batch.column(line_col)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = pc.fill_null(lines.cast(pa.string()), "")
    n = len(lines)

    off, vals = _list_parts(lines, "|")
    lens = np.diff(off)
    err = np.full(n, None, object)

    def set_err(mask, code):
        new = mask & (err == None)  # noqa: E711 — object-array null test
        err[new] = code

    found_name = lens >= 2
    set_err(~found_name, "invalid message format")

    first = pc.take(vals, pa.array(off[:-1]))
    m = pc.extract_regex(first, _NAMEVAL_RE)
    name = pc.struct_field(m, "n")
    valstr = pc.struct_field(m, "v")
    no_value = pc.is_null(m).to_numpy(zero_copy_only=False)
    set_err(found_name & no_value, "invalid <name>:<value> format")
    name_np = _np_str(pc.fill_null(name, ""))
    val_np = _np_str(pc.fill_null(valstr, ""))
    set_err(found_name & ~no_value & (name_np == ""), "empty metric name")
    set_err(found_name & ~no_value & (name_np != "") & (val_np == ""),
            "empty metric value")

    second_idx = np.where(found_name, off[:-1] + 1, 0)
    typestr = pc.take(vals, pa.array(second_idx))
    type_np = _np_str(pc.fill_null(typestr, ""))
    type_ok = np.isin(type_np, METRIC_TYPES)
    set_err(found_name & ~type_ok, "unsupported metric type")

    addition = (np.char.startswith(val_np.astype(str), "-")
                | np.char.startswith(val_np.astype(str), "+"))
    val_ok = pc.match_substring_regex(
        pc.fill_null(valstr, ""), _NUM_RE).to_numpy(zero_copy_only=False)
    value = np.where(val_ok, 0.0, np.nan)
    value[val_ok] = np.asarray(val_np[val_ok], dtype=np.float64)
    set_err(found_name & ~no_value & (val_np != "") & ~val_ok,
            "parse metric value string")

    # --- option parts (flat index space) ------------------------------
    total = len(vals)
    parent = np.repeat(np.arange(n), lens)
    pos = np.arange(total) - off[parent]
    is_opt = pos >= 2
    v_np = _np_str(vals)
    v_empty = v_np == ""
    # Go's Cut loop exits at the first empty part: an option part is
    # ACTIVE only if no empty option precedes it in the same row.
    stop_pos = np.full(n, np.iinfo(np.int64).max, np.int64)
    emp_idx = np.nonzero(is_opt & v_empty)[0]
    if len(emp_idx):
        np.minimum.at(stop_pos, parent[emp_idx], pos[emp_idx])
    active = is_opt & ~v_empty & (pos < stop_pos[parent])

    starts = np.frompyfunc(lambda s: s[:1], 1, 1)(v_np).astype(str)
    two = np.frompyfunc(lambda s: s[:2], 1, 1)(v_np).astype(str)
    k_rate = active & (starts == "@")
    k_tags = active & (starts == "#")
    k_cont = active & (two == "c:")
    k_time = active & (starts == "T") & ~k_cont
    k_unknown = active & ~(k_rate | k_tags | k_cont | k_time)
    if k_unknown.any():
        set_err(np.isin(np.arange(n), parent[k_unknown]),
                "unrecognized message part")

    sample_rate = np.full(n, np.nan)
    has_rate = np.zeros(n, bool)
    ridx = np.nonzero(k_rate)[0]
    if len(ridx):  # last one wins: process in order (assignment order)
        rstr = np.frompyfunc(lambda s: s[1:], 1, 1)(v_np[ridx])
        r_ok = pc.match_substring_regex(
            pa.array(rstr.astype(str)), _NUM_RE).to_numpy(
                zero_copy_only=False)
        bad_rows = np.unique(parent[ridx[~r_ok]])
        set_err(np.isin(np.arange(n), bad_rows), "parse sample rate")
        for i, j in zip(ridx[r_ok], np.asarray(
                rstr[r_ok], dtype=np.float64)):
            sample_rate[parent[i]] = j
            has_rate[parent[i]] = True

    timestamp = np.zeros(n, np.uint64)
    has_time = np.zeros(n, bool)
    tidx = np.nonzero(k_time)[0]
    if len(tidx):
        trows = parent[tidx]
        not_cg = ~np.isin(type_np[trows], ("c", "g"))
        set_err(np.isin(np.arange(n), trows[not_cg]),
                "only GAUGE and COUNT metrics support a timestamp")
        tstr = np.frompyfunc(lambda s: s[1:], 1, 1)(v_np[tidx])
        t_ok = pc.match_substring_regex(
            pa.array(tstr.astype(str)), _UINT_RE).to_numpy(
                zero_copy_only=False)
        set_err(np.isin(np.arange(n), trows[~t_ok]), "invalid timestamp")
        good = t_ok & ~not_cg
        for i, s in zip(tidx[good], tstr[good]):
            timestamp[parent[i]] = np.uint64(int(s) * 1_000_000_000)
            has_time[parent[i]] = True

    # --- tag entries (row, option-pos, tag-idx) ordered ----------------
    ent_row: list[np.ndarray] = []
    ent_pos: list[np.ndarray] = []
    ent_sub: list[np.ndarray] = []
    ent_key: list[np.ndarray] = []
    ent_val: list[np.ndarray] = []

    gidx = np.nonzero(k_tags)[0]
    if len(gidx):
        tag_payload = pc.utf8_slice_codeunits(
            pc.take(vals, pa.array(gidx)), 1, np.iinfo(np.int32).max)
        toff, tvals = _list_parts(tag_payload, ",")
        tlens = np.diff(toff)
        tparent = np.repeat(np.arange(len(gidx)), tlens)
        tpos = np.arange(len(tvals)) - toff[tparent]
        t_np = _np_str(tvals)
        t_empty = t_np == ""
        # inner loop also stops at the first empty tagset
        tstop = np.full(len(gidx), np.iinfo(np.int64).max, np.int64)
        te = np.nonzero(t_empty)[0]
        if len(te):
            np.minimum.at(tstop, tparent[te], tpos[te])
        t_active = ~t_empty & (tpos < tstop[tparent])
        if t_active.any():
            ai = np.nonzero(t_active)[0]
            kv = pc.extract_regex(pc.take(tvals, pa.array(ai)), _KV_RE)
            keys = _np_str(pc.struct_field(kv, "k"))
            items = _np_str(pc.struct_field(kv, "v"))
            rows = parent[gidx[tparent[ai]]]
            bad = keys == ""
            if not enable_simple_tags:
                bad |= items == ""
            set_err(np.isin(np.arange(n), rows[bad]), "invalid tag format")
            ent_row.append(rows)
            ent_pos.append(pos[gidx[tparent[ai]]])
            ent_sub.append(tpos[ai])
            ent_key.append(keys)
            ent_val.append(items)

    cidx = np.nonzero(k_cont)[0]
    if len(cidx):
        cid = np.frompyfunc(lambda s: s[2:], 1, 1)(v_np[cidx])
        keep = cid.astype(str) != ""
        ent_row.append(parent[cidx[keep]])
        ent_pos.append(pos[cidx[keep]])
        ent_sub.append(np.zeros(keep.sum(), np.int64))
        ent_key.append(np.full(keep.sum(), "container.id", object))
        ent_val.append(cid[keep])

    if enable_metric_type:
        ok_rows = np.nonzero(type_ok & found_name)[0]
        ent_row.append(ok_rows)
        ent_pos.append(np.full(len(ok_rows), np.iinfo(np.int64).max - 1,
                               np.int64))
        ent_sub.append(np.zeros(len(ok_rows), np.int64))
        ent_key.append(np.full(len(ok_rows), "metric_type", object))
        fn = np.array([FULL_NAMES[t] for t in type_np[ok_rows]], object)
        ent_val.append(fn)

    map_type = pa.map_(pa.string(), pa.string())
    if ent_row:
        rows = np.concatenate(ent_row)
        order = np.lexsort((np.concatenate(ent_sub),
                            np.concatenate(ent_pos), rows))
        rows = rows[order]
        keys = np.concatenate(ent_key)[order]
        items = np.concatenate(ent_val)[order]
        counts = np.bincount(rows, minlength=n)
        moff = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=moff[1:])
        tags = pa.MapArray.from_arrays(
            pa.array(moff, pa.int32()),
            pa.array(keys.astype(str), pa.string()),
            pa.array(items.astype(str), pa.string()))
    else:
        tags = pa.MapArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int64), pa.int32()),
            pa.array([], pa.string()), pa.array([], pa.string()))

    err_mask = err != None  # noqa: E711
    out = batch
    for col_name, arr in (
        ("name", pa.array(np.where(err_mask, None, name_np), pa.string())),
        ("metric_type",
         pa.array(np.where(err_mask, None, type_np), pa.string())),
        ("value", pa.array(np.where(err_mask, np.nan, value),
                           pa.float64())),
        ("addition", pa.array(np.where(err_mask, False, addition))),
        ("sample_rate", pa.array(
            [None if (e or not h) else float(r)
             for e, h, r in zip(err_mask, has_rate, sample_rate)],
            pa.float64())),
        ("tags", tags.cast(map_type)),
        ("timestamp_ns", pa.array(
            [None if (e or not h) else int(t)
             for e, h, t in zip(err_mask, has_time, timestamp)],
            pa.uint64())),
        ("error", pa.array(err, pa.string())),
    ):
        if col_name in out.column_names:
            out = out.set_column(out.column_names.index(col_name),
                                 col_name, arr)
        else:
            out = out.append_column(col_name, arr)
    return out


def serialize_tags(tags: pa.Array) -> pa.Array:
    """Canonical 'k:v,k2:v2' string per row (occurrence order) — the
    aggregate's description key. Vectorized: one join over flat entries."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    flat_kv = pc.binary_join_element_wise(
        tags.keys.cast(pa.string()), tags.items.cast(pa.string()), ":")
    off = tags.offsets.to_numpy().astype(np.int64)
    lst = pa.ListArray.from_arrays(pa.array(off - off[0], pa.int32()),
                                   flat_kv)
    return pc.binary_join(lst, ",")


class _ParseStatsd:
    def __init__(self, line_col: str, on_error: str, **kw):
        self.line_col = line_col
        self.on_error = on_error
        self.kw = kw

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = parse_statsd_batch(batch, self.line_col, **self.kw)
        if self.on_error == "drop":
            out = out.filter(pc.is_null(out.column("error")))
            out = out.drop_columns(["error"])
        return out


def parse_statsd(ds, line_col: str = "line", *, on_error: str = "drop",
                 enable_metric_type: bool = False,
                 enable_simple_tags: bool = False):
    """StatsD/DogStatsD line parse stage (block-local, zero shuffle).
    ``on_error="drop"`` mirrors the receiver (bad lines are counted and
    skipped); ``"send"`` keeps them with the ``error`` column set."""
    return ds.map_batches(
        _ParseStatsd(line_col, on_error,
                     enable_metric_type=enable_metric_type,
                     enable_simple_tags=enable_simple_tags),
        batch_format="pyarrow", zero_copy_batch=True)


def _gauge_partial(t: pa.Table) -> pa.Table:
    """Per-(name, tags) block partial for the anchor pass: max order among
    non-addition lines (−1 if none) + min order overall."""
    key = pc.binary_join_element_wise(
        t.column("name"), t.column("_tags_key"), "\x1f")
    order = t.column("_order").to_numpy(zero_copy_only=False)
    add = t.column("addition").to_numpy(zero_copy_only=False)
    codes = pc.dictionary_encode(key)
    idx = codes.combine_chunks().indices.to_numpy(zero_copy_only=False) \
        if isinstance(codes, pa.ChunkedArray) else \
        codes.indices.to_numpy(zero_copy_only=False)
    uniq = codes.combine_chunks().dictionary if isinstance(
        codes, pa.ChunkedArray) else codes.dictionary
    k = len(uniq)
    max_na = np.full(k, -1, np.int64)
    na = ~add
    if na.any():
        np.maximum.at(max_na, idx[na], order[na])
    min_all = np.full(k, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(min_all, idx, order)
    return pa.table({"key": uniq, "max_na": pa.array(max_na),
                     "min_all": pa.array(min_all)})


class _GaugeContrib:
    """Second pass: per-row contribution given the broadcast anchor map."""

    def __init__(self, anchors_ref):
        self.ref = anchors_ref
        self._map = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._map is None:
            a = ray.get(self.ref)
            self._map = dict(zip(a["key"].to_pylist(),
                                 a["anchor"].to_numpy()))
        key = pc.binary_join_element_wise(
            t.column("name"), t.column("_tags_key"), "\x1f")
        key_np = _np_str(key)
        order = t.column("_order").to_numpy(zero_copy_only=False)
        add = t.column("addition").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(key_np, return_inverse=True)
        anchor = np.array([self._map[u] for u in uniq], np.int64)[inv]
        contrib = np.where(order == anchor, val,
                           np.where(add & (order > anchor), val, 0.0))
        return pa.table({"name": t.column("name"),
                         "tags": t.column("_tags_key"),
                         "value": pa.array(contrib, pa.float64())})


def statsd_aggregate(ds, line_col: str = "line", order_col: str = "order",
                     *, enable_metric_type: bool = False,
                     enable_simple_tags: bool = False,
                     is_monotonic_counter: bool = False):
    """Counter/gauge interval aggregation over StatsD lines.

    Returns a Dataset of (name, metric_type 'counter'|'gauge', tags
    serialized, value float64). ``order_col`` must be a unique int64 line
    order (the batch-engine stand-in for arrival order). Timing/
    histogram/distribution lines are excluded (compose the parse stage
    with quantile/histogram operators for observer categories).
    ``is_monotonic_counter`` only flips the exported monotonic flag in
    the reference (translator metadata) — value math is identical.
    """
    import ray.data  # noqa: F401 — from_arrow on the empty-side guards

    parsed = parse_statsd(ds, line_col, on_error="drop",
                          enable_metric_type=enable_metric_type,
                          enable_simple_tags=enable_simple_tags)

    def prep(t: pa.Table) -> pa.Table:
        t = t.append_column("_tags_key", serialize_tags(t.column("tags")))
        return t.append_column(
            "_order", t.column(order_col).cast(pa.int64())).select(
            ["name", "metric_type", "value", "addition", "sample_rate",
             "_tags_key", "_order"])

    slim = parsed.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # counters: per-line trunc(value / clamp(rate)) summed
    def counter_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("metric_type"), "c"))
        v = t.column("value").to_numpy(zero_copy_only=False).copy()
        r = t.column("sample_rate").to_numpy(zero_copy_only=False)
        scale = ~np.isnan(r) & (r > 0) & (r < 1)
        v[scale] = v[scale] / r[scale]
        return pa.table({"name": t.column("name"),
                         "tags": t.column("_tags_key"),
                         "cval": pa.array(np.trunc(v).astype(np.int64))})

    from .aggregate import count_sum

    empty_out = pa.table({"name": pa.array([], pa.string()),
                          "metric_type": pa.array([], pa.string()),
                          "tags": pa.array([], pa.string()),
                          "value": pa.array([], pa.float64())})

    # counts on MATERIALIZED data are metadata-only (CLAUDE.md r4) — the
    # empty-side guards cost nothing and keep count_sum off zero partials
    counters_in = slim.map_batches(counter_rows, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    if counters_in.count() == 0:
        counters = ray.data.from_arrow(empty_out)
    else:
        counters = count_sum(counters_in, keys=["name", "tags"],
                             sum_cols={"cval": "value_i"})

        def counter_final(t: pa.Table) -> pa.Table:
            return pa.table({
                "name": t.column("name"),
                "metric_type": pa.array(["counter"] * t.num_rows),
                "tags": t.column("tags"),
                "value": t.column("value_i").cast(pa.float64())})

        counters = counters.map_batches(counter_final,
                                        batch_format="pyarrow")

    # gauges: anchor pass (partials -> driver merge -> broadcast)
    gauges_in = slim.map_batches(
        lambda t: t.filter(pc.equal(t.column("metric_type"), "g")),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    if gauges_in.count() == 0:
        return counters.union(ray.data.from_arrow(empty_out))

    partials = gauges_in.map_batches(
        _gauge_partial, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    pt = pa.concat_tables(ray.get(partials.to_arrow_refs()))
    if pt.num_rows:
        g = pt.group_by("key").aggregate(
            [("max_na", "max"), ("min_all", "min")])
        anchor = np.where(g.column("max_na_max").to_numpy() >= 0,
                          g.column("max_na_max").to_numpy(),
                          g.column("min_all_min").to_numpy())
        anchors = pa.table({"key": g.column("key"),
                            "anchor": pa.array(anchor, pa.int64())})
    else:
        anchors = pa.table({"key": pa.array([], pa.string()),
                            "anchor": pa.array([], pa.int64())})
    ref = ray.put(anchors)

    contrib = gauges_in.map_batches(_GaugeContrib(ref),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
    gauges = count_sum(contrib, keys=["name", "tags"],
                       sum_cols={"value": "gval"})

    def gauge_final(t: pa.Table) -> pa.Table:
        return pa.table({
            "name": t.column("name"),
            "metric_type": pa.array(["gauge"] * t.num_rows),
            "tags": t.column("tags"),
            "value": t.column("gval").cast(pa.float64())})

    gauges = gauges.map_batches(gauge_final, batch_format="pyarrow")
    return counters.union(gauges)
