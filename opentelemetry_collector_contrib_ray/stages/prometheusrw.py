"""prometheusremotewrite translator analog: flat OTel metric rows →
Prometheus remote-write sample rows.

Parity with pkg/translator/prometheusremotewrite (v1 path):

- metrics_to_prw.go:62-138 FromMetrics: per-metric temporality gate
  (sum/histogram/exponential-histogram must be CUMULATIVE — others →
  per-metric error "invalid temporality and type combination"),
  name = MetricNamer.Build (= the repo's build_compliant_name),
  unsupported types → per-metric error.
- helper.go:99-186 createAttributes: datapoint attributes sorted by
  ORIGINAL key (stable), label names sanitized via LabelNamer.Build
  (= normalize_prom_label), sanitize-collisions concatenate values
  with ";" in sorted-original order when they differ; resource
  service.namespace/service.name → job ("ns/name"),
  service.instance.id → instance; external labels lose to existing
  keys; extras (__name__, le, quantile) overwrite, with dunder names
  exempt from sanitization.
- helper.go:206-276 histograms: _sum only when HasSum, _count,
  per-bound CUMULATIVE _bucket with le = strconv-'f' bound over
  i < min(len(bounds), len(counts)), and a +Inf bucket whose value is
  the TOTAL count; staleness flag → StaleNaN bits.
- helper.go:278-345 exemplars: int/double value, ms timestamp,
  trace_id/span_id labels, filtered attributes appended only when the
  total rune count stays ≤ 128.
- helper.go:347-380 addExemplars: bucket bounds sorted; each exemplar
  lands on the FIRST bucket (with samples) whose bound ≥ value.
- helper.go:382-430 summaries: _sum/_count plus quantile series on
  the BASE name with quantile = strconv-'f'.
- helper.go:489-538 addResourceTargetInfo: one target_info series per
  resource identity (skipped when every resource attr is identifying,
  or job/instance are both absent), labels = sanitized non-identifying
  resource attrs + job/instance + __name__, value 1, timestamp = the
  most recent sample in the group. The reference scopes "most recent"
  to one ResourceMetrics payload; the batch-engine analog scopes it to
  the resource identity over the dataset (documented deviation — same
  arrival-time convention as the wavefront/influx stages).
- helper.go:540-543 convertTimeStamp: ns → ms truncation-toward-zero.
- number_data_points.go: gauge/sum samples (int → float64), staleness
  StaleNaN (0x7ff0000000000002 bit pattern).
- The unique/conflicts xxhash series-dedup machinery
  (metrics_to_prw.go:141-233) is container layout: samples carrying
  identical label sets belong to one TimeSeries — the flat model keeps
  one row per sample and groups by the canonical label serialization,
  no row-level effect (documented).

Execution shape: sample fan-out is a block-local task map (zero
shuffle); target_info is a distinct-bounded partial (per-block
resource → max-ts dict) merged on the driver — resources are
low-cardinality by construction (the round-1 partial-aggregation
pattern).
"""

from __future__ import annotations

import json
import math
import struct

import pyarrow as pa

from .prometheus import build_compliant_name, normalize_prom_label
from .signalfx import go_fmt_float_f

STALE_NAN = struct.unpack("<d", struct.pack("<Q", 0x7FF0000000000002))[0]

_IDENTIFYING = ("service.namespace", "service.name", "service.instance.id")


def _map_pairs(col_value) -> list[tuple[str, str]]:
    return [(str(k), str(v)) for k, v in (col_value or [])]


def create_attributes(resource: list[tuple[str, str]],
                      attributes: list[tuple[str, str]],
                      external_labels: dict | None,
                      ignore_attrs: tuple = (),
                      extras: tuple = ()) -> dict:
    """createAttributes (helper.go:99-186) → final label dict."""
    res = dict(resource)
    labels = sorted([(k, v) for k, v in attributes
                     if k not in ignore_attrs], key=lambda p: p[0])
    out: dict = {}
    for key, value in labels:
        final = normalize_prom_label(key)
        if final in out:
            if out[final] != value:
                out[final] = out[final] + ";" + value
        else:
            out[final] = value
    if "service.name" in res:
        val = res["service.name"]
        if "service.namespace" in res:
            val = f"{res['service.namespace']}/{val}"
        out["job"] = val
    if "service.instance.id" in res:
        out["instance"] = res["service.instance.id"]
    for key, value in (external_labels or {}).items():
        if key not in out:
            out[key] = value
    ex = list(extras)
    for i in range(0, len(ex) - len(ex) % 2, 2):
        name = ex[i]
        if not (len(name) > 4 and name.startswith("__")
                and name.endswith("__")):
            name = normalize_prom_label(name)
        out[name] = ex[i + 1]
    return out


def serialize_labels(labels: dict) -> str:
    """Canonical sorted ``k=v,...`` serialization of a label set."""
    return ",".join(f"{k}={v}" for k, v in sorted(labels.items()))


def _ns_to_ms(ns: int) -> int:
    a = int(ns)
    return a // 1_000_000 if a >= 0 else -((-a) // 1_000_000)


def prom_exemplars(exemplars: list) -> list[dict]:
    """getPromExemplars (helper.go:278-345) over decoded JSON
    exemplar dicts: {value|int_value, time_ns, trace_id?, span_id?,
    attributes?}."""
    out = []
    for ex in exemplars or []:
        if not isinstance(ex, dict):
            continue
        if "int_value" in ex:
            value = float(int(ex["int_value"]))
        else:
            value = float(ex.get("value", 0.0))
        promex = {"value": value,
                  "timestamp": _ns_to_ms(int(ex.get("time_ns", 0) or 0)),
                  "labels": {}}
        runes = 0
        tid = ex.get("trace_id")
        if tid:
            runes += len("trace_id") + len(tid)
            promex["labels"]["trace_id"] = tid
        sid = ex.get("span_id")
        if sid:
            runes += len("span_id") + len(sid)
            promex["labels"]["span_id"] = sid
        attr_labels = {}
        for k, v in (ex.get("attributes") or {}).items():
            sv = str(v)
            runes += len(k) + len(sv)
            attr_labels[k] = sv
        if runes <= 128:
            promex["labels"].update(attr_labels)
        out.append(promex)
    return out


class _MetricsToPRW:
    def __init__(self, namespace, external_labels, add_metric_suffixes,
                 id_cols):
        self.namespace = namespace
        self.external_labels = dict(external_labels or {})
        self.add_metric_suffixes = add_metric_suffixes
        self.id_cols = tuple(id_cols)

    def __call__(self, tab: pa.Table) -> pa.Table:
        n = tab.num_rows

        def col(c, default=None):
            if c in tab.column_names:
                return tab.column(c).to_pylist()
            return [default] * n

        names = col("name")
        units = col("unit", "")
        mtypes = col("mtype")
        temps = col("aggregation_temporality")
        monos = col("is_monotonic")
        tns = col("time_ns", 0)
        vis = col("value_int")
        vds = col("value_double")
        counts = col("count")
        hsums = col("hsum")
        bounds = col("explicit_bounds")
        bcounts = col("bucket_counts")
        ssums = col("ssum")
        qs = col("quantiles")
        qvs = col("quantile_values")
        attrs = col("attributes")
        resources = col("resource")
        stale = col("no_recorded_value")
        exemplars_in = col("exemplars")

        parent, o_name, o_labels, o_val, o_ts, o_ex, o_err = \
            [], [], [], [], [], [], []

        def emit(i, mname, labels, val, ts_ms, ex=None):
            parent.append(i)
            o_name.append(mname)
            o_labels.append(serialize_labels(labels))
            o_val.append(val)
            o_ts.append(ts_ms)
            o_ex.append(json.dumps(ex, sort_keys=True) if ex else None)
            o_err.append(None)

        def emit_err(i, msg):
            parent.append(i)
            o_name.append(None)
            o_labels.append(None)
            o_val.append(None)
            o_ts.append(None)
            o_ex.append(None)
            o_err.append(msg)

        for i in range(n):
            mt = mtypes[i]
            name = names[i] or ""
            if mt in ("sum", "histogram", "exponential_histogram") \
                    and temps[i] != 2:
                emit_err(i, "invalid temporality and type combination "
                            f'for metric "{name}"')
                continue
            if mt not in ("gauge", "sum", "histogram", "summary"):
                emit_err(i, "unsupported metric type")
                continue
            prom_name = build_compliant_name(
                name, units[i] or "", mt, bool(monos[i]),
                self.namespace, self.add_metric_suffixes)
            base = create_attributes(
                _map_pairs(resources[i]), _map_pairs(attrs[i]),
                self.external_labels)
            ts_ms = _ns_to_ms(tns[i] or 0)
            is_stale = bool(stale[i])
            try:
                exs = (json.loads(exemplars_in[i])
                       if exemplars_in[i] else [])
            except (ValueError, TypeError):
                exs = []
            pexs = prom_exemplars(exs)

            if mt in ("gauge", "sum"):
                if vis[i] is not None:
                    val = float(vis[i])
                elif vds[i] is not None:
                    val = float(vds[i])
                else:
                    val = 0.0
                if is_stale:
                    val = STALE_NAN
                labels = dict(base)
                labels["__name__"] = prom_name
                # exemplars attach to sum series only
                # (number_data_points.go:76-80)
                emit(i, prom_name, labels, val, ts_ms,
                     pexs if (mt == "sum" and pexs) else None)
            elif mt == "histogram":
                cnt = int(counts[i] or 0)
                if hsums[i] is not None:
                    sl = dict(base)
                    sl["__name__"] = prom_name + "_sum"
                    emit(i, prom_name + "_sum", sl,
                         STALE_NAN if is_stale else float(hsums[i]),
                         ts_ms)
                cl = dict(base)
                cl["__name__"] = prom_name + "_count"
                emit(i, prom_name + "_count", cl,
                     STALE_NAN if is_stale else float(cnt), ts_ms)
                bd = bounds[i] or []
                ct = bcounts[i] or []
                cumulative = 0
                bucket_rows = []  # (bound, row_index in output)
                for j in range(min(len(bd), len(ct))):
                    cumulative += int(ct[j])
                    bl = dict(base)
                    bl["le"] = go_fmt_float_f(float(bd[j]))
                    bl["__name__"] = prom_name + "_bucket"
                    emit(i, prom_name + "_bucket", bl,
                         STALE_NAN if is_stale else float(cumulative),
                         ts_ms)
                    bucket_rows.append((float(bd[j]), len(o_ex) - 1))
                il = dict(base)
                il["le"] = "+Inf"
                il["__name__"] = prom_name + "_bucket"
                emit(i, prom_name + "_bucket", il,
                     STALE_NAN if is_stale else float(cnt), ts_ms)
                bucket_rows.append((math.inf, len(o_ex) - 1))
                # addExemplars: first bound ≥ value (helper.go:347-380)
                if pexs:
                    per_row: dict = {}
                    bucket_rows.sort(key=lambda p: p[0])
                    for ex in pexs:
                        for bound, row in bucket_rows:
                            if ex["value"] <= bound:
                                per_row.setdefault(row, []).append(ex)
                                break
                    for row, exl in per_row.items():
                        o_ex[row] = json.dumps(exl, sort_keys=True)
            else:  # summary
                sl = dict(base)
                sl["__name__"] = prom_name + "_sum"
                emit(i, prom_name + "_sum", sl,
                     STALE_NAN if is_stale else float(ssums[i] or 0.0),
                     ts_ms)
                cl = dict(base)
                cl["__name__"] = prom_name + "_count"
                emit(i, prom_name + "_count", cl,
                     STALE_NAN if is_stale else float(counts[i] or 0),
                     ts_ms)
                for q, v in zip(qs[i] or [], qvs[i] or []):
                    ql = dict(base)
                    ql["quantile"] = go_fmt_float_f(float(q))
                    ql["__name__"] = prom_name
                    emit(i, prom_name, ql,
                         STALE_NAN if is_stale else float(v), ts_ms)

        pidx = pa.array(parent, pa.int64())
        cols = {c: tab.column(c).take(pidx) for c in self.id_cols}
        cols["metric_name"] = pa.array(o_name, pa.string())
        cols["labels"] = pa.array(o_labels, pa.string())
        cols["value"] = pa.array(o_val, pa.float64())
        cols["timestamp_ms"] = pa.array(o_ts, pa.int64())
        cols["exemplars"] = pa.array(o_ex, pa.string())
        cols["error"] = pa.array(o_err, pa.string())
        return pa.table(cols)


def metrics_to_prw(ds, *, namespace: str = "",
                   external_labels: dict | None = None,
                   add_metric_suffixes: bool = True,
                   id_cols=(), on_error: str = "send"):
    """FromMetrics sample fan-out (block-local, zero shuffle)."""
    stage = _MetricsToPRW(namespace, external_labels,
                          add_metric_suffixes, id_cols)
    if on_error == "drop":
        def run(tab: pa.Table) -> pa.Table:
            out = stage(tab)
            import pyarrow.compute as pc
            out = out.filter(pc.is_null(out.column("error")))
            return out.drop_columns(["error"])
        return ds.map_batches(run, batch_format="pyarrow",
                              zero_copy_batch=True)
    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True)


def _target_info_partial(tab: pa.Table) -> pa.Table:
    """Per-block (resource_json → max time_ns) partial."""
    resources = (tab.column("resource").to_pylist()
                 if "resource" in tab.column_names
                 else [None] * tab.num_rows)
    tns = (tab.column("time_ns").to_pylist()
           if "time_ns" in tab.column_names else [0] * tab.num_rows)
    acc: dict = {}
    for res, t in zip(resources, tns):
        pairs = _map_pairs(res)
        if not pairs:
            continue
        key = json.dumps(pairs, sort_keys=True)
        t = int(t or 0)
        if key not in acc or t > acc[key]:
            acc[key] = t
    return pa.table({
        "resource_json": pa.array(list(acc.keys()), pa.string()),
        "max_time_ns": pa.array(list(acc.values()), pa.int64())})


def prw_target_info(ds, *, namespace: str = "",
                    external_labels: dict | None = None,
                    disable_target_info: bool = False) -> pa.Table:
    """addResourceTargetInfo (helper.go:489-538) over resource
    identities: distinct-bounded per-block partials, driver max-merge
    (small by construction). Returns a pyarrow Table of target_info
    sample rows."""
    empty = pa.table({
        "metric_name": pa.array([], pa.string()),
        "labels": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "timestamp_ms": pa.array([], pa.int64())})
    if disable_target_info:
        return empty
    partials = ds.map_batches(
        _target_info_partial, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    merged: dict = {}
    for ref in partials.to_arrow_refs():
        import ray
        t = ray.get(ref)
        for key, mx in zip(t.column("resource_json").to_pylist(),
                           t.column("max_time_ns").to_pylist()):
            if key not in merged or mx > merged[key]:
                merged[key] = mx
    rows = {"metric_name": [], "labels": [], "value": [],
            "timestamp_ms": []}
    name = "target_info" if not namespace else f"{namespace}_target_info"
    for key, mx in sorted(merged.items()):
        if mx == 0:
            continue
        pairs = json.loads(key)
        res = dict(pairs)
        non_identifying = [p for p in pairs if p[0] not in _IDENTIFYING]
        if not non_identifying:
            continue
        labels = create_attributes(
            pairs, non_identifying, external_labels,
            extras=("__name__", name))
        if "job" not in labels and "instance" not in labels:
            continue
        rows["metric_name"].append(name)
        rows["labels"].append(serialize_labels(labels))
        rows["value"].append(1.0)
        rows["timestamp_ms"].append(_ns_to_ms(mx))
    if not rows["metric_name"]:
        return empty
    return pa.table({
        "metric_name": pa.array(rows["metric_name"], pa.string()),
        "labels": pa.array(rows["labels"], pa.string()),
        "value": pa.array(rows["value"], pa.float64()),
        "timestamp_ms": pa.array(rows["timestamp_ms"], pa.int64())})
