"""signalfx translator analog: OTel flat metric rows ↔ SignalFx
datapoint rows.

Parity with pkg/translator/signalfx (from_metrics.go:38-318,
to_metrics.go:21-122, timestamp.go:11-18):

Encode (FromMetrics):
- metric-type mapping (from_metrics.go:85-115): gauge → GAUGE; sum
  non-monotonic → GAUGE, delta → COUNTER, cumulative →
  CUMULATIVE_COUNTER; histogram delta → COUNTER else
  CUMULATIVE_COUNTER; summary/expo-histogram → no top-level type
  (summary series carry their own explicit types).
- number datapoints (from_metrics.go:118-134): one datapoint per row,
  int/double value passthrough; an EMPTY value type emits a datapoint
  with neither value set.
- histogram fan-out (from_metrics.go:136-221): ``_count`` (int),
  ``_sum``/``_min``/``_max`` when present (min/max always GAUGE),
  then one ``_bucket`` per bucket with CUMULATIVE counts and an
  ``le`` dimension — Prometheus-style float formatting
  (``float64ToDimValue``: "0", "1", "+Inf" fast paths, else
  strconv 'g' shortest); bucket rows are skipped entirely when
  ``counts`` is non-empty but != len(bounds)+1, or when
  ``drop_histogram_buckets`` is set; ``process_histograms=False``
  drops histogram datapoints wholesale.
- summary fan-out (from_metrics.go:223-260): ``_count``/``_sum``
  as CUMULATIVE_COUNTER, one ``_quantile`` GAUGE per quantile with a
  ``quantile`` dimension formatted strconv 'f' shortest.
- dimensions = resource attributes (extraDims) first, then datapoint
  attributes in map order (from_metrics.go:262-277).
- timestamps ns → ms via Go integer division (timestamp.go:11-13,
  truncation toward zero).

Decode (ToMetrics, to_metrics.go:45-122):
- GAUGE → gauge; COUNTER → monotonic delta sum; CUMULATIVE_COUNTER →
  monotonic cumulative sum; ENUM (=2) and unknown types → per-point
  error; a point with neither value set → per-point error ("nil datum
  value ..."); errors never abort the batch (multierr semantics) —
  rows keep an ``error`` column, valid rows decode alongside.
- ms → ns (×1e6); dimensions → datapoint attributes.
- the reference additionally COALESCES points into one pdata Metric
  per (name, sfx-type) — a container-layout detail with no row-level
  effect in the flat model (documented deviation).

Wire carrier: the reference receiver/exporter speak sfx protobuf
(receiver/signalfxreceiver/receiver.go:53); this engine carries each
datapoint as its proto3-JSON object (``metric``, ``timestamp``,
``metricType``, ``value{intValue|doubleValue}``, ``dimensions:[{key,
value}]``) in a ``dp_json`` column — same field model, text transport.

Execution shape: both directions are block-local task-based
map_batches, zero shuffle. Row fan-out indices (histogram buckets,
quantiles) are built vectorized (numpy offsets + segment cumsum);
the JSON codec itself is the per-row cost, same status as the
collectd/splunk-HEC codecs.
"""

from __future__ import annotations

import json as _json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .splunkhec import go_fmt_float

MAP_TYPE = pa.map_(pa.string(), pa.string())

# public com_signalfx_metrics_protobuf MetricType enum
SFX_GAUGE, SFX_COUNTER, SFX_ENUM, SFX_CUMULATIVE = 0, 1, 2, 3
_SFX_NAMES = {SFX_GAUGE: "GAUGE", SFX_COUNTER: "COUNTER",
              SFX_ENUM: "ENUM", SFX_CUMULATIVE: "CUMULATIVE_COUNTER"}
_SFX_BY_NAME = {v: k for k, v in _SFX_NAMES.items()}

TEMP_DELTA, TEMP_CUMULATIVE = 1, 2


def float64_to_dim_value(f: float) -> str:
    """from_metrics.go:296-318 — Prometheus-style bound rendering."""
    if f == 0:
        return "0"
    if f == 1:
        return "1"
    if np.isinf(f) and f > 0:
        return "+Inf"
    return go_fmt_float(float(f))


def go_fmt_float_f(v: float) -> str:
    """strconv.FormatFloat(v, 'f', -1, 64): shortest round-trip digits,
    always decimal (no exponent) — the summary quantile dimension
    format (from_metrics.go:250)."""
    s = go_fmt_float(float(v))
    if "e" not in s:
        return s
    mant, _, e = s.partition("e")
    exp = int(e)
    neg = mant.startswith("-")
    if neg:
        mant = mant[1:]
    digits = mant.replace(".", "")
    point = (1 if "." not in mant else mant.index(".")) + exp
    if point <= 0:
        out = "0." + "0" * (-point) + digits
    elif point >= len(digits):
        out = digits + "0" * (point - len(digits))
    else:
        out = digits[:point] + "." + digits[point:]
    return ("-" + out) if neg else out


def _ns_to_ms(ns):
    """Go int64 division truncates toward zero (timestamp.go:11-13)."""
    a = np.asarray(ns, np.int64)
    return np.where(a >= 0, a // 1_000_000, -((-a) // 1_000_000))


def _map_entries(col):
    """(parent_row int64[], keys object[], items object[]) of a map col."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy().astype(np.int64)
    parent = np.repeat(np.arange(len(col), dtype=np.int64),
                       np.diff(off - off[0]))
    keys = np.asarray(col.keys.to_numpy(zero_copy_only=False), object)
    items = np.asarray(col.items.to_numpy(zero_copy_only=False), object)
    # offsets may not start at 0 on a sliced array
    lo = off[0]
    return parent, keys[lo:lo + len(parent)] if lo else keys[:len(parent)], \
        items[lo:lo + len(parent)] if lo else items[:len(parent)]


def _dims_per_row(tab: pa.Table, attrs_col: str, resource_cols):
    """Per input row: list[(key, value)] — resource cols first, then
    attribute-map entries in map order (from_metrics.go:262-277)."""
    n = tab.num_rows
    dims = [[] for _ in range(n)]
    for c in resource_cols:
        vals = np.asarray(
            tab.column(c).to_numpy(zero_copy_only=False), object)
        for i in range(n):
            if vals[i] is not None:
                dims[i].append((c, str(vals[i])))
    if attrs_col in tab.column_names:
        parent, keys, items = _map_entries(tab.column(attrs_col))
        for p, k, v in zip(parent, keys, items):
            dims[p].append((k, v))
    return dims


def _dp_json(metric, ts_ms, mt, vi, vd, dims) -> str:
    o: dict = {"metric": metric, "timestamp": int(ts_ms)}
    val: dict = {}
    if vi is not None:
        val["intValue"] = int(vi)
    elif vd is not None:
        val["doubleValue"] = float(vd)
    o["value"] = val
    if mt is not None:
        o["metricType"] = _SFX_NAMES[mt]
    if dims:
        o["dimensions"] = [{"key": k, "value": v} for k, v in dims]
    return _json.dumps(o, separators=(",", ":"))


class _MetricsToSignalFx:
    def __init__(self, attrs_col, resource_cols, id_cols,
                 drop_histogram_buckets, process_histograms):
        self.attrs_col = attrs_col
        self.resource_cols = tuple(resource_cols)
        self.id_cols = tuple(id_cols)
        self.drop_buckets = drop_histogram_buckets
        self.process_histograms = process_histograms

    def __call__(self, tab: pa.Table) -> pa.Table:
        n = tab.num_rows
        names = np.asarray(
            tab.column("name").to_numpy(zero_copy_only=False), object)
        mtypes = np.asarray(
            tab.column("mtype").to_numpy(zero_copy_only=False), object)

        def col_or_none(c):
            # to_pylist keeps nulls as None (to_numpy would NaN-cast
            # nullable ints)
            if c in tab.column_names:
                return tab.column(c).to_pylist()
            return [None] * n

        temp = col_or_none("aggregation_temporality")
        mono = col_or_none("is_monotonic")
        tns = tab.column("time_ns").to_pylist()
        vi = col_or_none("value_int")
        vd = col_or_none("value_double")
        hcount = col_or_none("count")
        hsum = col_or_none("hsum")
        hmin = col_or_none("hmin")
        hmax = col_or_none("hmax")
        ssum = col_or_none("ssum")
        bounds = (tab.column("explicit_bounds").to_pylist()
                  if "explicit_bounds" in tab.column_names
                  else [None] * n)
        bcounts = (tab.column("bucket_counts").to_pylist()
                   if "bucket_counts" in tab.column_names
                   else [None] * n)
        qs = (tab.column("quantiles").to_pylist()
              if "quantiles" in tab.column_names else [None] * n)
        qvs = (tab.column("quantile_values").to_pylist()
               if "quantile_values" in tab.column_names else [None] * n)
        dims = _dims_per_row(tab, self.attrs_col, self.resource_cols)

        parent, o_metric, o_mt, o_vi, o_vd, o_dims = \
            [], [], [], [], [], []

        def emit(i, metric, mt, vint, vdbl, d):
            parent.append(i)
            o_metric.append(metric)
            o_mt.append(mt)
            o_vi.append(vint)
            o_vd.append(vdbl)
            o_dims.append(d)

        for i in range(n):
            name, mt_in = names[i], mtypes[i]
            d = dims[i]
            if mt_in == "gauge":
                emit(i, name, SFX_GAUGE, vi[i],
                     vd[i] if vi[i] is None else None, d)
            elif mt_in == "sum":
                if not mono[i]:
                    mt = SFX_GAUGE
                elif temp[i] == TEMP_DELTA:
                    mt = SFX_COUNTER
                else:
                    mt = SFX_CUMULATIVE
                emit(i, name, mt, vi[i],
                     vd[i] if vi[i] is None else None, d)
            elif mt_in == "histogram":
                if not self.process_histograms:
                    continue
                mt = (SFX_COUNTER if temp[i] == TEMP_DELTA
                      else SFX_CUMULATIVE)
                emit(i, name + "_count", mt, int(hcount[i]), None, d)
                if hsum[i] is not None:
                    emit(i, name + "_sum", mt, None, float(hsum[i]), d)
                if hmin[i] is not None:
                    emit(i, name + "_min", SFX_GAUGE, None,
                         float(hmin[i]), d)
                if hmax[i] is not None:
                    emit(i, name + "_max", SFX_GAUGE, None,
                         float(hmax[i]), d)
                if self.drop_buckets:
                    continue
                bd = bounds[i] or []
                ct = bcounts[i] or []
                if len(ct) > 0 and len(ct) != len(bd) + 1:
                    continue
                run = np.cumsum(np.asarray(ct, np.int64)) if ct else []
                for j in range(len(ct)):
                    bound = (float64_to_dim_value(bd[j])
                             if j < len(bd) else "+Inf")
                    emit(i, name + "_bucket", mt, int(run[j]), None,
                         d + [("le", bound)])
            elif mt_in == "summary":
                emit(i, name + "_count", SFX_CUMULATIVE,
                     int(hcount[i]), None, d)
                emit(i, name + "_sum", SFX_CUMULATIVE, None,
                     float(ssum[i]), d)
                for q, v in zip(qs[i] or [], qvs[i] or []):
                    emit(i, name + "_quantile", SFX_GAUGE, None,
                         float(v), d + [("quantile", go_fmt_float_f(q))])
            # empty / exponential histogram: no datapoints
            # (from_metrics.go:78-80)

        pidx = pa.array(parent, pa.int64())
        ts_ms = _ns_to_ms([tns[i] for i in parent])
        jsons = [_dp_json(m, t, mt, a, b, dd)
                 for m, t, mt, a, b, dd in zip(
                     o_metric, ts_ms, o_mt, o_vi, o_vd, o_dims)]
        cols = {}
        for c in self.id_cols:
            cols[c] = tab.column(c).take(pidx)
        cols["metric"] = pa.array(o_metric, pa.string())
        cols["sfx_type"] = pa.array(
            [None if m is None else _SFX_NAMES[m] for m in o_mt],
            pa.string())
        cols["timestamp_ms"] = pa.array(ts_ms, pa.int64())
        cols["value_int"] = pa.array(
            [None if v is None else int(v) for v in o_vi], pa.int64())
        cols["value_double"] = pa.array(
            [None if v is None else float(v) for v in o_vd],
            pa.float64())
        cols["dimensions"] = pa.array(o_dims, MAP_TYPE)
        cols["dp_json"] = pa.array(jsons, pa.string())
        return pa.table(cols)


def metrics_to_signalfx(ds, *, attrs_col: str = "attributes",
                        resource_cols=(), id_cols=(),
                        drop_histogram_buckets: bool = False,
                        process_histograms: bool = True):
    """FromMetrics analog: flat OTel metric rows → sfx datapoint rows
    (+ proto3-JSON carrier). Block-local, zero shuffle."""
    return ds.map_batches(
        _MetricsToSignalFx(attrs_col, resource_cols, id_cols,
                           drop_histogram_buckets, process_histograms),
        batch_format="pyarrow", zero_copy_batch=True)


class _SignalFxToMetrics:
    def __init__(self, json_col, id_cols, on_error="send"):
        self.json_col = json_col
        self.id_cols = tuple(id_cols)
        self.on_error = on_error

    def __call__(self, tab: pa.Table) -> pa.Table:
        docs = np.asarray(
            tab.column(self.json_col).to_numpy(zero_copy_only=False),
            object)
        n = len(docs)
        name = [None] * n
        otype = [None] * n
        temp = [None] * n
        mono: list = [None] * n
        tns = [None] * n
        vi = [None] * n
        vd = [None] * n
        attrs: list = [None] * n
        err = [None] * n
        for i, s in enumerate(docs):
            o = _json.loads(s)
            metric = o.get("metric") or ""
            val = o.get("value") or {}
            has_i = "intValue" in val
            has_d = "doubleValue" in val
            if not has_i and not has_d:
                err[i] = ("nil datum value for data-point in metric "
                          f'"{metric}"')
                continue
            mt_name = o.get("metricType", "GAUGE")
            mt = _SFX_BY_NAME.get(mt_name, -1)
            if mt == SFX_ENUM:
                err[i] = (f"unsupported enum data-point ({SFX_ENUM}) "
                          f'in metric "{metric}"')
                continue
            if mt < 0:
                err[i] = (f'unknown data-point type in metric "{metric}"')
                continue
            name[i] = metric
            if mt == SFX_GAUGE:
                otype[i] = "gauge"
                temp[i] = 0
                mono[i] = False
            elif mt == SFX_COUNTER:
                otype[i] = "sum"
                temp[i] = TEMP_DELTA
                mono[i] = True
            else:
                otype[i] = "sum"
                temp[i] = TEMP_CUMULATIVE
                mono[i] = True
            tns[i] = int(o.get("timestamp", 0)) * 1_000_000
            if has_i:
                vi[i] = int(val["intValue"])
            else:
                vd[i] = float(val["doubleValue"])
            attrs[i] = [(d.get("key", ""), d.get("value", ""))
                        for d in o.get("dimensions", []) or []
                        if d is not None]
        cols = {c: tab.column(c) for c in self.id_cols}
        cols["name"] = pa.array(name, pa.string())
        cols["otel_type"] = pa.array(otype, pa.string())
        cols["aggregation_temporality"] = pa.array(temp, pa.int32())
        cols["is_monotonic"] = pa.array(mono, pa.bool_())
        cols["time_ns"] = pa.array(tns, pa.int64())
        cols["value_int"] = pa.array(vi, pa.int64())
        cols["value_double"] = pa.array(vd, pa.float64())
        cols["attributes"] = pa.array(
            [a if a is not None else [] for a in attrs], MAP_TYPE)
        cols["error"] = pa.array(err, pa.string())
        out = pa.table(cols)
        if self.on_error == "drop":
            out = out.filter(pc.is_null(out.column("error")))
            out = out.drop_columns(["error"])
        return out


def signalfx_to_metrics(ds, json_col: str = "dp_json", *,
                        id_cols=(), on_error: str = "send"):
    """ToMetrics analog: sfx datapoint JSON rows → flat OTel metric
    rows. Per-point errors keep their row with ``error`` set
    (``on_error="send"``) or are dropped (``"drop"``) — the batch never
    fails (to_metrics.go:33-42 multierr semantics)."""
    return ds.map_batches(
        _SignalFxToMetrics(json_col, id_cols, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
