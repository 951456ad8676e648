"""bmchelixexporter analogs: per-payload OTel metrics → BMC Helix
Operations Management metric JSON payloads.

Parity with exporter/bmchelixexporter/internal/operationsmanagement/
metrics_producer.go:

- per datapoint (sum/gauge only; other types warn+skip the METRIC,
  :147-180): labels = source=OTEL + resource attrs AsString + unit +
  hostType=server + isDeviceMappingEnabled=true + metricName + dp
  attrs stringified with fmt.Sprintf("%%v") + the entity block
  (:252-310): hostname = resource host.name else dp host.name else
  SKIP the datapoint; entityTypeId/entityName REQUIRED else skip;
  instanceName defaults to entityName; entityName colon-trimmed then
  colon-stripped; entityId = source:hostname:entityTypeId:entityName.
  Sample = {value (int cast to float), timestamp = Unix()*1000 ms}.
- monotonic sums get the `bmchelix.requiresRateMetric=true` label
  (:158-160), consumed later.
- enrichMetricNamesWithAttributes (:345-420, per METRIC instance):
  group by entityId+metricName; non-core label keys with >1 distinct
  value in the group become sorted identifying keys; each suffixed
  metric ALSO emits a raw copy WITHOUT entityId/entityTypeId/
  entityName keeping the original name; the original gets
  name.val1.val2 and its identifying labels deleted.
- addPercentageVariants (:432-470): every unit=="1" metric clones a
  %%-unit variant (name ratio→percent / +".percent", value×100) —
  the clone COPIES the rate flag, so percent variants of counters
  also chain rates.
- addRateVariants (:199-218, :519-563): for every flagged metric (in
  order), previousCounters[entityId:metricName] chains — a prior
  sample with an earlier timestamp yields a .rate metric (delta
  clamped ≥0, /s unit suffix, flag stripped); the state updates
  ALWAYS; the flag label is deleted from the source metric after.
  The reference chains across pushMetrics calls for the collector
  lifetime; this port chains WITHIN one payload row (the datadog
  receiver precedent — cross-request memory is out of batch scope).
- ProduceHelixPayload (:61-140): metrics WITHOUT entityTypeId are
  silently DROPPED at the append filter (:99-101) — this kills the
  enrichment raw copies and their percent/rate derivatives (state
  still updated); kept metrics gain parentEntityName/parentEntityTypeId
  = <entityTypeId>_container and a once-per-payload parent identity
  metric (empty samples) inserted before the first child.

Go's enrichment iterates a map (random group order); this port keeps
first-seen group order — a deterministic refinement; the final
row SET is order-insensitive anyway.

Execution: per-row payload decode task map (one input row = one
ProduceHelixPayload call, JSON `metrics` column), fan-out one row
per Helix metric, block-local, zero shuffle; the 1MB chunked POST
client (metrics_client.go) is Ray's write layer.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import GoStruct, go_json

_CORE_ATTRS = {"source", "unit", "hostType", "isDeviceMappingEnabled",
               "metricName", "hostname", "entityTypeId", "entityName",
               "instanceName", "entityId"}
_RATE_FLAG = "bmchelix.requiresRateMetric"


def _go_v(v) -> str:
    """fmt.Sprintf("%v", raw) for JSON-decoded scalars — %v on
    float64 is strconv 'g' shortest (= splunkhec.go_fmt_float)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        from .splunkhec import go_fmt_float
        return go_fmt_float(v)
    return str(v)


def _as_string(v) -> str:
    from .logservice import _as_string as f
    return f(v)


def bmchelix_payload(metrics: list[dict]) -> list[dict]:
    """ProduceHelixPayload over one decoded payload; returns the
    final list of {labels, samples} dicts."""
    helix = []
    parents = {}
    for metric in metrics:
        produced = _create_helix_metrics(metric)
        if produced is None:
            continue  # unsupported type: warn + skip metric
        for m in produced:
            if m["labels"].get("entityTypeId", "") == "":
                continue  # silently dropped at the append filter
            ptype = m["labels"]["entityTypeId"] + "_container"
            pid = ":".join((m["labels"].get("source", ""),
                            m["labels"].get("hostname", ""),
                            ptype, ptype))
            if pid not in parents:
                parent = {"labels": {
                    "entityId": pid, "entityName": ptype,
                    "entityTypeId": ptype,
                    "hostname": m["labels"].get("hostname", ""),
                    "source": m["labels"].get("source", ""),
                    "isDeviceMappingEnabled":
                        m["labels"].get("isDeviceMappingEnabled",
                                        ""),
                    "hostType": m["labels"].get("hostType", ""),
                    "metricName": "identity",
                }, "samples": []}
                parents[pid] = parent
                helix.append(parent)
            m["labels"]["parentEntityName"] = ptype
            m["labels"]["parentEntityTypeId"] = ptype
            helix.append(m)
    return helix


def _create_helix_metrics(metric: dict) -> list[dict] | None:
    mtype = metric.get("mtype") or ""
    if mtype not in ("sum", "gauge"):
        return None
    res_attrs = {k: _as_string(v) for k, v in
                 (metric.get("resource_attributes") or {}).items()}
    out = []
    for dp in metric.get("datapoints") or []:
        m = _single_dp_metric(dp, metric, res_attrs)
        if m is None:
            continue  # warn + skip datapoint
        if mtype == "sum" and metric.get("is_monotonic"):
            m["labels"][_RATE_FLAG] = "true"
        out.append(m)
    out = _enrich_names(out)
    out = _percent_variants(out)
    out = _rate_variants(out)
    return out


def _single_dp_metric(dp: dict, metric: dict,
                      res_attrs: dict) -> dict | None:
    labels = {"source": "OTEL"}
    labels.update(res_attrs)
    labels["unit"] = metric.get("unit") or ""
    labels["hostType"] = "server"
    labels["isDeviceMappingEnabled"] = "true"
    labels["metricName"] = metric.get("name") or ""

    dp_attrs = dp.get("attributes") or {}
    hostname = res_attrs.get("host.name", "")
    if hostname == "":
        maybe = dp_attrs.get("host.name")
        if not isinstance(maybe, str) or maybe == "":
            return None  # hostname required
        hostname = maybe
    labels["hostname"] = hostname
    string_attrs = {}
    for k, v in dp_attrs.items():
        string_attrs[k] = _go_v(v)
        labels[k] = _go_v(v)
    for k, v in res_attrs.items():
        string_attrs[k] = v
    entity_type = string_attrs.get("entityTypeId", "")
    if entity_type == "":
        return None
    entity_name = string_attrs.get("entityName", "")
    if entity_name == "":
        return None
    instance = string_attrs.get("instanceName", "") or entity_name
    entity_name = entity_name.strip(":").replace(":", "")
    labels["entityTypeId"] = entity_type
    labels["entityName"] = entity_name
    labels["instanceName"] = instance
    labels["entityId"] = ":".join(("OTEL", hostname, entity_type,
                                   entity_name))
    if "asDouble" in dp:
        value = float(dp["asDouble"])
    elif "asInt" in dp:
        value = float(int(dp["asInt"]))
    else:
        value = 0.0
    ts_ms = (int(dp.get("timeUnixNano") or 0)
             // 1_000_000_000) * 1000  # AsTime().Unix() * 1000
    return {"labels": labels,
            "samples": [{"value": value, "timestamp": ts_ms}]}


def _enrich_names(metrics: list[dict]) -> list[dict]:
    groups: dict[str, list[dict]] = {}
    for m in metrics:
        key = (m["labels"].get("entityId", "") + ":"
               + m["labels"].get("metricName", ""))
        groups.setdefault(key, []).append(m)
    final = []
    for group in groups.values():
        attr_values: dict[str, set] = {}
        for m in group:
            for k, v in m["labels"].items():
                if k in _CORE_ATTRS:
                    continue
                attr_values.setdefault(k, set()).add(v)
        identifying = sorted(k for k, vals in attr_values.items()
                             if len(vals) > 1)
        for m in group:
            original = m["labels"]["metricName"]
            suffix = [m["labels"][k] for k in identifying
                      if k in m["labels"]]
            if suffix:
                raw = {"labels": {k: v for k, v in
                                  m["labels"].items()
                                  if k not in ("entityId",
                                               "entityTypeId",
                                               "entityName")},
                       "samples": m["samples"]}
                raw["labels"]["metricName"] = original
                final.append(raw)
                m["labels"]["metricName"] = \
                    original + "." + ".".join(suffix)
                for k in identifying:
                    m["labels"].pop(k, None)
            final.append(m)
    return final


def _percent_metric_name(name: str) -> str:
    if name.endswith(".percent"):
        return name
    if name.endswith("ratio"):
        return name[:-len("ratio")] + "percent"
    return name + ".percent"


def _percent_variants(metrics: list[dict]) -> list[dict]:
    final = []
    for m in metrics:
        final.append(m)
        if m["labels"].get("unit") != "1":
            continue
        labels = dict(m["labels"])  # copies the rate flag too
        labels["metricName"] = _percent_metric_name(
            labels["metricName"])
        labels["unit"] = "%"
        final.append({"labels": labels,
                      "samples": [{"value": s["value"] * 100,
                                   "timestamp": s["timestamp"]}
                                  for s in m["samples"]]})
    return final


def _rate_variants(metrics: list[dict]) -> list[dict]:
    prev: dict[str, dict] = {}
    out = list(metrics)
    for m in metrics:
        if m["labels"].get(_RATE_FLAG) != "true":
            continue
        if len(m["samples"]) == 1:
            sample = m["samples"][0]
            key = (m["labels"].get("entityId", "") + ":"
                   + m["labels"].get("metricName", ""))
            p = prev.get(key)
            prev[key] = sample
            if p is not None and sample["timestamp"] > \
                    p["timestamp"]:
                delta = sample["value"] - p["value"]
                if delta < 0:
                    delta = 0.0
                dt = (sample["timestamp"] - p["timestamp"]) / 1000.0
                rate_labels = {k: v for k, v in m["labels"].items()
                               if k != _RATE_FLAG}
                rate_labels["metricName"] += ".rate"
                rate_labels["unit"] = \
                    rate_labels.get("unit", "") + "/s"
                out.append({"labels": rate_labels,
                            "samples": [{
                                "value": delta / dt,
                                "timestamp": sample["timestamp"]}]})
        m["labels"].pop(_RATE_FLAG, None)
    return out


class _BmcHelix:
    def __init__(self, metrics_col: str):
        self.col = metrics_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, labels, samples = [], [], []
        for i, js in enumerate(
                batch.column(self.col).to_pylist()):
            try:
                payload = json.loads(js or "[]")
            except ValueError:
                continue
            for m in bmchelix_payload(payload):
                parent.append(i)
                labels.append(go_json(m["labels"]))
                samples.append(go_json([
                    GoStruct([("value", s["value"]),
                              ("timestamp", s["timestamp"])])
                    for s in m["samples"]]))
        out = batch.take(pa.array(parent, pa.int64()))
        collide = [k for k in ("labels", "samples")
                   if k in out.schema.names]
        if collide:
            out = out.drop_columns(collide)
        out = out.append_column("labels",
                                pa.array(labels, pa.string()))
        return out.append_column("samples",
                                 pa.array(samples, pa.string()))


def metrics_to_bmchelix(ds, *, metrics_col: str = "metrics"):
    """Payload rows (JSON `metrics` column) → BMC Helix OM metric
    rows (fan-out; labels = sorted-key JSON, samples = Go-struct
    JSON array)."""
    return ds.map_batches(_BmcHelix(metrics_col),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
