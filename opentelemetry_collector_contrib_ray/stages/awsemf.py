"""awsemfexporter analog: flat metric rows → CloudWatch EMF log events.

Parity with exporter/awsemfexporter (metric_translator.go, datapoint.go,
grouped_metric.go, util.go, metric_declaration.go):

- grouping: data points group per (namespace, timestampMs, logGroup,
  logStream, metric type, batch index, label set) — one EMF document
  per group with every metric name as a field (grouped_metric.go:30-112;
  duplicate metric names within a group keep the first).
- labels = datapoint attributes AsString + the OTelLib dimension when
  the scope name is non-empty (datapoint.go:511-524); the resource
  ``receiver`` attribute adds the prom_metric_type field
  (gauge/counter/histogram/summary) when it equals "prometheus".
- namespace: config > service.namespace/service.name > service.name >
  service.namespace > "default" (util.go:61-80); logGroup defaults to
  /metrics/<namespace>; configured log group/stream support
  {ClusterName}-style patterns resolved from resource attributes via
  patternKeyToAttributeMap, falling back to metric labels, else the
  literal "undefined" (util.go:18-59, grouped_metric.go:70-77).
- values (datapoint.go): gauge/sum numbers → float64; cumulative sums
  adjust to delta per series — the FIRST point is dropped unless
  retain_initial_value_of_delta_metric, and a negative delta keeps the
  raw cumulative value (reset assumption, :171-174); histograms → the
  {Max,Min,Count,Sum} statistical set; summaries → {Max,Min,Count,Sum}
  with Min/Max from the first/last quantile, or with detailed_metrics
  the _sum/_count fields plus one datapoint per quantile with a
  ``quantile`` label ('g'-formatted); prometheus-receiver summaries
  delta-adjust sum/count the same first-point-dropped way; stale
  (NoRecordedValue) and NaN/±Inf values drop the point.
- measurements: one CW Measurement with the full label set as the
  primary dimension set plus ZeroAndSingleDimensionRollup /
  SingleDimensionRollupOnly rollups (OTelLib always joins rollup sets;
  the duplicate single-label set is removed, metric_translator.go:
  212-268, util.go:121-158); with metric_declarations the metrics
  filter by name regex + label matchers, group by matched-declaration
  set, extract declared dimension sets present in the labels, append
  rollups, dedup, and drop empty-dimension groups (:271-378,
  metric_declaration.go).  The aws.emf.storage_resolution label maps
  to each metric's StorageResolution (default 60) and leaves the field
  set.  Go iterates label maps in random order — the primary dimension
  set and the measurement list are emitted sorted/first-appearance
  here (deterministic refinement, same sets).
- EMF encoding (metric_translator.go:380-471): version "1" nests
  {"CloudWatchMetrics": [...], "Timestamp": ms} under "_aws" with
  "Version":"1"; version "0" adds top-level stringified "Timestamp",
  "Version":"0" and "CloudWatchMetrics"; measurement structs keep Go
  field order (Namespace, Dimensions, Metrics / Name, Unit,
  StorageResolution — Unit always present, "" when unset); the
  document is Go json.Marshal: sorted map keys, HTML-escaped strings,
  float64 in 'f' shortest form switching to 'e' below 1e-6 / at 1e21
  with the e-0X→e-X cleanup; parse_json_encoded_attribute_values
  re-inflates string fields that hold JSON.
- units translate per translateUnit (1/ns→"", ms/s/us→
  Milliseconds/Seconds/Microseconds, By→Bytes, bit→Bits) with
  metric_descriptors overrides (grouped_metric.go:188-213).

Execution: block-local grouping in a task-based map_batches (the Go
exporter groups per ResourceMetrics batch; a block is the batch
analog), zero shuffle; delta adjustment is per-series within the block
sorted by timestamp — compose with the cumulative_to_delta stage for
cross-shard series. Output rows: (log_group, log_stream, timestamp_ms,
emf_json). Timestamps come from the data (no wall clock).
"""

from __future__ import annotations

import json
import math
import re
from decimal import Decimal

import pyarrow as pa

from .splunkhec import go_fmt_float

OTELLIB_KEY = "OTelLib"
STORAGE_RES_ATTR = "aws.emf.storage_resolution"

PATTERN_KEY_TO_ATTR = {
    "ClusterName": "aws.ecs.cluster.name",
    "TaskId": "aws.ecs.task.id",
    "NodeName": "k8s.node.name",
    "PodName": "pod",
    "ServiceName": "service.name",
    "ContainerInstanceId": "aws.ecs.container.instance.id",
    "TaskDefinitionFamily": "aws.ecs.task.family",
}

_UNIT_MAP = {"1": "", "ns": "", "ms": "Milliseconds", "s": "Seconds",
             "us": "Microseconds", "By": "Bytes", "bit": "Bits"}

_PROM_TYPES = {"gauge": "gauge", "sum": "counter",
               "histogram": "histogram", "summary": "summary"}


# --- Go encoding/json ----------------------------------------------------

class GoStruct(dict):
    """Marshals with insertion-order keys (a Go struct, not a map)."""


def go_json_float(v: float) -> str:
    if math.isnan(v) or math.isinf(v):
        raise ValueError("json: unsupported value NaN/Inf")
    if v == 0:
        return "-0" if math.copysign(1, v) < 0 else "0"
    a = abs(v)
    d = Decimal(repr(v))
    if a < 1e-6 or a >= 1e21:
        # strconv 'e' shortest: d.ddde±XX, then e-0X → e-X
        sign, digits, exp = d.as_tuple()
        mant = digits[0:1] + digits[1:]
        m = str(digits[0])
        if len(digits) > 1:
            m += "." + "".join(str(x) for x in digits[1:])
        e = exp + len(digits) - 1
        s = f"{'-' if sign else ''}{m}e{'+' if e >= 0 else '-'}" \
            f"{abs(e):02d}"
        s = re.sub(r"e-0(\d)$", r"e-\1", s)
        return s
    s = format(d, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


def go_json(obj) -> str:
    """encoding/json Marshal: sorted map keys, Go float forms, raw
    UTF-8 with &<> HTML escapes."""
    if obj is None:
        return "null"
    if isinstance(obj, bool):
        return "true" if obj else "false"
    if isinstance(obj, str):
        s = json.dumps(obj, ensure_ascii=False)
        return (s.replace("&", "\\u0026").replace("<", "\\u003c")
                 .replace(">", "\\u003e"))
    if isinstance(obj, int):
        return str(obj)
    if isinstance(obj, float):
        return go_json_float(obj)
    if isinstance(obj, GoStruct):
        return "{" + ",".join(f"{go_json(k)}:{go_json(v)}"
                              for k, v in obj.items()) + "}"
    if isinstance(obj, dict):
        return "{" + ",".join(f"{go_json(k)}:{go_json(obj[k])}"
                              for k in sorted(obj)) + "}"
    if isinstance(obj, (list, tuple)):
        return "[" + ",".join(go_json(x) for x in obj) + "]"
    raise TypeError(f"go_json: unsupported {type(obj)}")


# --- config pieces ---------------------------------------------------------

def _attr_as_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_fmt_float(v)
    if v is None:
        return ""
    return str(v)


def replace_patterns(s: str, attrs: dict) -> tuple[str, bool]:
    """util.go replacePatterns: {Key} → attrs[Key] or the mapped
    attribute, else "undefined"; empty values also become undefined."""
    success = True
    for key, mapped in PATTERN_KEY_TO_ATTR.items():
        pattern = "{" + key + "}"
        if pattern not in s:
            continue
        value = attrs.get(key)
        if value is None:
            value = attrs.get(mapped)
        if value:
            s = s.replace(pattern, value)
        else:
            s = s.replace(pattern, "undefined")
            success = False
    return s, success


def get_namespace(resource: dict, configured: str | None) -> str:
    ns = configured or ""
    if not ns:
        name = resource.get("service.name")
        space = resource.get("service.namespace")
        if isinstance(name, str) and isinstance(space, str):
            ns = f"{space}/{name}"
        elif isinstance(name, str):
            ns = name
        elif isinstance(space, str):
            ns = space
    return ns or "default"


def translate_unit(name: str, unit: str, descriptors: dict) -> str:
    d = descriptors.get(name)
    if d is not None and (unit == "" or d.get("overwrite")):
        return d.get("unit", "")
    return _UNIT_MAP.get(unit, unit)


class MetricDeclaration:
    def __init__(self, spec: dict):
        self.dimensions = [list(d) for d in spec.get("dimensions") or []]
        self.name_res = [re.compile(p)
                         for p in spec.get("metric_name_selectors") or []]
        self.matchers = []
        for lm in spec.get("label_matchers") or []:
            self.matchers.append((list(lm["label_names"]),
                                  lm.get("separator", ";"),
                                  re.compile(lm["regex"])))

    def matches_name(self, name: str) -> bool:
        return any(r.search(name) for r in self.name_res)

    def matches_labels(self, labels: dict) -> bool:
        if not self.matchers:
            return True
        for names, sep, regex in self.matchers:
            concat = sep.join(labels.get(n, "") for n in names)
            if regex.search(concat):
                return True
        return False

    def extract_dimensions(self, labels: dict) -> list[list[str]]:
        return [list(ds) for ds in self.dimensions
                if all(d in labels for d in ds)]


def dimension_rollup(option: str, labels: dict) -> list[list[str]]:
    out = []
    zero = [OTELLIB_KEY] if OTELLIB_KEY in labels else []
    plain = [k for k in labels if k != OTELLIB_KEY]
    if option == "ZeroAndSingleDimensionRollup" and plain:
        out.append(list(zero))
    if option in ("ZeroAndSingleDimensionRollup",
                  "SingleDimensionRollupOnly"):
        for name in sorted(plain):
            out.append(sorted(zero + [name]))
    return out


def _dedup_dims(dims: list[list[str]]) -> list[list[str]]:
    seen, out = set(), []
    for ds in dims:
        key = ",".join(ds)
        if key not in seen:
            seen.add(key)
            out.append(ds)
    return out


# --- the stage --------------------------------------------------------------

_NUM_COLS = ("metric_name", "metric_unit", "metric_type",
             "aggregation_temporality", "time_unix_nano", "value_int",
             "value_double", "count", "dist_sum", "dist_min", "dist_max",
             "quantiles", "attributes", "resource_attributes",
             "scope_name")


class _MetricsToEMF:
    def __init__(self, cfg: dict):
        self.namespace = cfg.get("namespace")
        self.log_group = cfg.get("log_group_name") or ""
        self.log_stream = cfg.get("log_stream_name") or ""
        self.rollup = cfg.get("dimension_rollup_option",
                              "ZeroAndSingleDimensionRollup")
        self.version = str(cfg.get("version", "1"))
        self.detailed = bool(cfg.get("detailed_metrics"))
        self.retain_initial = bool(
            cfg.get("retain_initial_value_of_delta_metric"))
        self.parse_json_keys = list(
            cfg.get("parse_json_encoded_attribute_values") or [])
        self.descriptors = {d["metric_name"]: d for d in
                            cfg.get("metric_descriptors") or []}
        self.declarations = [MetricDeclaration(d) for d in
                             cfg.get("metric_declarations") or []]

    # -- per-row value extraction (datapoint.go) --

    def _datapoints(self, row: dict):
        """→ list of (name, value, labels, ts_ms) after staleness and
        detailed-summary fan-out; None = dropped."""
        mtype = row["metric_type"]
        attrs = json.loads(row.get("attributes") or "{}")
        labels = {k: _attr_as_string(v) for k, v in attrs.items()}
        if row.get("scope_name"):
            labels[OTELLIB_KEY] = row["scope_name"]
        ts_ms = (row.get("time_unix_nano") or 0) // 1_000_000
        name = row["metric_name"]
        bad = lambda x: x is not None and (math.isnan(x)
                                           or math.isinf(x))
        if mtype in ("gauge", "sum"):
            v = row.get("value_double")
            if bad(v):
                return None
            if v is None:
                v = float(row.get("value_int") or 0)
            return [(name, float(v), labels, ts_ms)]
        if mtype == "histogram":
            mn = float(row.get("dist_min") or 0.0)
            mx = float(row.get("dist_max") or 0.0)
            sm = float(row.get("dist_sum") or 0.0)
            if bad(mn) or bad(mx) or bad(sm):
                return None
            stats = GoStruct([("Max", mx), ("Min", mn),
                              ("Count", int(row.get("count") or 0)),
                              ("Sum", sm)])
            return [(name, stats, labels, ts_ms)]
        if mtype == "summary":
            sm = float(row.get("dist_sum") or 0.0)
            cnt = int(row.get("count") or 0)
            quantiles = json.loads(row.get("quantiles") or "[]")
            for q in quantiles:
                if bad(q.get("value")) or bad(q.get("quantile")):
                    return None
            if bad(sm):
                return None
            if self.detailed:
                out = [(name + "_sum", sm, labels, ts_ms),
                       (name + "_count", cnt, labels, ts_ms)]
                for q in quantiles:
                    ql = dict(labels)
                    ql["quantile"] = go_fmt_float(float(q["quantile"]))
                    out.append((name, float(q["value"]), ql, ts_ms))
                return out
            stats = GoStruct([
                ("Max", float(quantiles[-1]["value"]) if quantiles
                 else 0.0),
                ("Min", float(quantiles[0]["value"]) if quantiles
                 else 0.0),
                ("Count", cnt), ("Sum", sm)])
            return [(name, stats, labels, ts_ms)]
        return None          # unhandled type (Go warns + skips)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()

        # per-series delta adjustment for cumulative sums (and
        # prometheus summaries), block-local, sorted by timestamp
        order = sorted(range(len(rows)), key=lambda i: (
            rows[i].get("time_unix_nano") or 0))
        last_num: dict = {}
        last_sum: dict = {}
        drop: set = set()
        adjusted: dict = {}
        for i in order:
            row = rows[i]
            res = json.loads(row.get("resource_attributes") or "{}")
            receiver = res.get("receiver")
            mtype = row["metric_type"]
            adjust_num = (mtype == "sum" and
                          (row.get("aggregation_temporality") or 0) == 2)
            adjust_sum = (mtype == "summary" and
                          receiver == "prometheus")
            if not (adjust_num or adjust_sum):
                continue
            attrs = json.loads(row.get("attributes") or "{}")
            key = (row["metric_name"], row.get("resource_attributes"),
                   row.get("scope_name"),
                   tuple(sorted((k, _attr_as_string(v))
                                for k, v in attrs.items())))
            if adjust_num:
                v = row.get("value_double")
                if v is None:
                    v = float(row.get("value_int") or 0)
                if key not in last_num:
                    last_num[key] = v
                    if not self.retain_initial:
                        drop.add(i)
                    continue
                delta = v - last_num[key]
                last_num[key] = v
                if delta >= 0:            # negative delta = reset
                    adjusted[i] = delta
            else:
                sm = float(row.get("dist_sum") or 0.0)
                cnt = int(row.get("count") or 0)
                if key not in last_sum:
                    last_sum[key] = (sm, cnt)
                    if not self.retain_initial:
                        drop.add(i)
                    continue
                psm, pcnt = last_sum[key]
                last_sum[key] = (sm, cnt)
                adjusted[i] = (sm - psm, cnt - pcnt)

        groups: dict = {}
        group_order: list = []
        for i, row in enumerate(rows):
            if i in drop:
                continue
            res = json.loads(row.get("resource_attributes") or "{}")
            res_str = {k: _attr_as_string(v) for k, v in res.items()}
            namespace = get_namespace(res, self.namespace)
            log_group = f"/metrics/{namespace}"
            group_ok = stream_ok = True
            if self.log_group:
                log_group, group_ok = replace_patterns(self.log_group,
                                                       res_str)
            log_stream = ""
            if self.log_stream:
                log_stream, stream_ok = replace_patterns(
                    self.log_stream, res_str)
            if isinstance(adjusted.get(i), tuple):
                row = dict(row)
                row["dist_sum"], row["count"] = adjusted[i]
            dps = self._datapoints(row)
            if not dps:
                continue
            if i in adjusted and not isinstance(adjusted[i], tuple):
                dps = [(dps[0][0], adjusted[i], dps[0][2], dps[0][3])]
            receiver = res.get("receiver") or ""
            unit = translate_unit(row["metric_name"],
                                  row.get("metric_unit") or "",
                                  self.descriptors)
            for batch_idx, (name, value, labels, ts_ms) in \
                    enumerate(dps):
                lg, ls = log_group, log_stream
                if not (group_ok and stream_ok):
                    if "undefined" in lg:
                        lg, _ = replace_patterns(self.log_group, labels)
                    if "undefined" in ls:
                        ls, _ = replace_patterns(self.log_stream,
                                                 labels)
                key = (namespace, ts_ms, lg, ls, row["metric_type"],
                       batch_idx, receiver,
                       tuple(sorted(labels.items())))
                if key not in groups:
                    groups[key] = {"labels": labels, "metrics": {},
                                   "namespace": namespace,
                                   "ts_ms": ts_ms, "log_group": lg,
                                   "log_stream": ls,
                                   "mtype": row["metric_type"],
                                   "receiver": receiver}
                    group_order.append(key)
                g = groups[key]
                if name not in g["metrics"]:
                    g["metrics"][name] = (value, unit)

        out = {"log_group": [], "log_stream": [], "timestamp_ms": [],
               "emf_json": []}
        for key in group_order:
            g = groups[key]
            doc = self._emf_doc(g)
            if doc is None:
                continue
            out["log_group"].append(g["log_group"])
            out["log_stream"].append(g["log_stream"])
            out["timestamp_ms"].append(g["ts_ms"])
            out["emf_json"].append(doc)
        return pa.table({
            "log_group": pa.array(out["log_group"], pa.string()),
            "log_stream": pa.array(out["log_stream"], pa.string()),
            "timestamp_ms": pa.array(out["timestamp_ms"], pa.int64()),
            "emf_json": pa.array(out["emf_json"], pa.string())})

    def _measurements(self, g: dict):
        labels = {k: v for k, v in g["labels"].items()
                  if k != STORAGE_RES_ATTR}
        stor_res = 60
        sr = g["labels"].get(STORAGE_RES_ATTR)
        if sr is not None:
            try:
                stor_res = int(sr)
            except ValueError:
                pass

        def minfo(name, unit):
            return GoStruct([("Name", name), ("Unit", unit),
                             ("StorageResolution", stor_res)])

        rollups = dimension_rollup(self.rollup, labels)
        if not self.declarations:
            dim_set = sorted(labels)          # deterministic refinement
            dims = [dim_set]
            has_otellib = OTELLIB_KEY in labels
            single = len(dim_set) <= 1 or (len(dim_set) == 2
                                           and has_otellib)
            if rollups and single and self.rollup in (
                    "SingleDimensionRollupOnly",
                    "ZeroAndSingleDimensionRollup"):
                dims = []
            dims = dims + rollups
            metrics = [minfo(n, u) for n, (_, u) in
                       g["metrics"].items()]
            return [GoStruct([("Namespace", g["namespace"]),
                              ("Dimensions", dims),
                              ("Metrics", metrics)])]
        decls = [d for d in self.declarations
                 if d.matches_labels(labels)]
        if not decls:
            return []
        decl_groups: dict = {}
        order = []
        for name, (_, unit) in g["metrics"].items():
            idxs = tuple(i for i, d in enumerate(decls)
                         if d.matches_name(name))
            if not idxs:
                continue
            if idxs not in decl_groups:
                decl_groups[idxs] = []
                order.append(idxs)
            decl_groups[idxs].append(minfo(name, unit))
        measurements = []
        for idxs in order:
            dims = []
            for di in idxs:
                dims.extend(decls[di].extract_dimensions(labels))
            dims.extend(rollups)
            dims = _dedup_dims(dims)
            if dims:
                measurements.append(GoStruct([
                    ("Namespace", g["namespace"]),
                    ("Dimensions", dims),
                    ("Metrics", decl_groups[idxs])]))
        return measurements

    def _emf_doc(self, g: dict):
        fields: dict = {k: v for k, v in g["labels"].items()
                        if k != STORAGE_RES_ATTR}
        for name, (value, _) in g["metrics"].items():
            fields[name] = value
        if g["receiver"] == "prometheus":
            fields["prom_metric_type"] = _PROM_TYPES.get(g["mtype"], "")
        for key in self.parse_json_keys:
            if isinstance(fields.get(key), str):
                try:
                    fields[key] = json.loads(fields[key])
                except ValueError:
                    pass
        measurements = self._measurements(g)
        if self.declarations and not measurements:
            return None          # whole group dropped by declarations
        if measurements and self.version == "1":
            fields["Version"] = "1"
            fields["_aws"] = {"CloudWatchMetrics": measurements,
                              "Timestamp": g["ts_ms"]}
        if self.version == "0":
            fields["Timestamp"] = str(g["ts_ms"])
            if measurements:
                fields["Version"] = "0"
                fields["CloudWatchMetrics"] = measurements
        return go_json(fields)


def metrics_to_emf(ds, **config):
    """Flat metric rows → EMF log-event rows (log_group, log_stream,
    timestamp_ms, emf_json); block-local grouping, zero shuffle."""
    return ds.map_batches(_MetricsToEMF(config),
                          batch_format="pyarrow", zero_copy_batch=True)
