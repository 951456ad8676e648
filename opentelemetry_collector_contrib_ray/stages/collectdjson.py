"""collectdreceiver analog: collectd JSON write_http payload decoding.

Parity with receiver/collectdreceiver/collectd.go:19-232 +
internal/collectd/labels.go:

- each record fans out to one metric PER dsname index (skipping indexes
  without a matching dstype/value or with a null value, :74-77);
- records carrying time+severity+message are EVENTS and are ignored by
  the metrics path (:41-43, :63-67);
- metric name = type [. type_instance-with-[k=v]-extracted] [. dsname
  when there are >1 dsnames] (getReasonableMetricName :160-177); a
  single dsname becomes the ``dsname`` label instead;
- labels: the record's label map is MUTATED CUMULATIVELY across the
  dsname loop (created once, :69-72) — later datapoints see labels
  added for earlier ones; order: type_instance-extracted dims (only if
  absent), plugin, plugin_instance [k=v] dims then the stripped value,
  host dims then the stripped value, dsname; empty values never insert
  (addIfNotNullOrEmpty);
- value: json.Number Int64 first, else Float64 (:135-141);
- dstype derive/counter → monotonic cumulative sum, everything else a
  gauge (:147-158); timestamp = int64(1e9 × time) ns, epoch when absent.

Go iterates extracted-dim maps in random order; this restatement adds
them in sorted-key order (deterministic, documented deviation — the set
is identical). The decoder is a per-record loop (it IS the wire-format
decode, same status as the OTLP-JSON reader); LabelsFromName results
are memoized per distinct string across the batch.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .wavefront import labels_from_name

MAP_TYPE = pa.map_(pa.string(), pa.string())


def _add_if(labels: dict, key: str, val):
    if val:
        labels[key] = val


def _parse_name_for_labels(labels: dict, key: str, val,
                           cache: dict) -> None:
    if val is None:
        name, dims = "", None
    else:
        hit = cache.get(val)
        if hit is None:
            hit = labels_from_name(val)
            cache[val] = hit
        name, dims = hit
    if dims:
        for k in sorted(dims):
            if k not in labels:
                _add_if(labels, k, dims[k])
    _add_if(labels, key, name)


def _reasonable_name(rec: dict, i: int, labels: dict,
                     cache: dict) -> tuple[str, bool]:
    parts = []
    type_s = rec.get("type")
    if type_s:
        parts.append(type_s)
    ti = rec.get("type_instance")
    if ti:
        hit = cache.get(ti)
        if hit is None:
            hit = labels_from_name(ti)
            cache[ti] = hit
        inst_name, dims = hit
        if inst_name != "":
            parts.append(inst_name)
        if dims:
            for k in sorted(dims):
                if k not in labels:
                    _add_if(labels, k, dims[k])
    used_ds = False
    dsnames = rec.get("dsnames") or []
    if len(dsnames) > 1 and dsnames[i]:
        parts.append(dsnames[i])
        used_ds = True
    return ".".join(parts), used_ds


def record_to_rows(rec: dict, default_labels: dict | None = None,
                   cache: dict | None = None) -> list[dict]:
    """appendToMetrics for one decoded record → list of datapoint dicts."""
    if cache is None:
        cache = {}
    if (rec.get("time") is not None and rec.get("severity") is not None
            and rec.get("message") is not None):
        return []  # log event, ignored by the metrics path
    labels = dict(default_labels or {})
    dsnames = rec.get("dsnames") or []
    dstypes = rec.get("dstypes") or []
    values = rec.get("values") or []
    t = rec.get("time")
    time_ns = int(1e9 * t) if t is not None else 0
    rows = []
    for i in range(len(dsnames)):
        if i >= len(dstypes) or i >= len(values) or values[i] is None:
            continue
        name, used_ds = _reasonable_name(rec, i, labels, cache)
        _add_if(labels, "plugin", rec.get("plugin"))
        _parse_name_for_labels(labels, "plugin_instance",
                               rec.get("plugin_instance"), cache)
        _parse_name_for_labels(labels, "host", rec.get("host"), cache)
        if not used_ds:
            _add_if(labels, "dsname", dsnames[i])
        v = values[i]
        is_int = isinstance(v, int) and not isinstance(v, bool)
        rows.append({
            "name": name,
            "is_cumulative": (dstypes[i] or "") in ("derive", "counter"),
            "value_int": int(v) if is_int else None,
            "value_double": None if is_int else float(v),
            "time_ns": time_ns,
            "labels": list(labels.items()),  # snapshot: labels keep mutating
        })
    return rows


class _ParseCollectd:
    """Task-based decoder; the LabelsFromName cache persists per worker."""

    def __init__(self, json_col: str, default_labels: dict | None):
        self.json_col = json_col
        self.default_labels = default_labels or {}
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.json_col)
        docs = col.to_pylist()
        names, cum, vi, vd, tns, labels = [], [], [], [], [], []
        for doc in docs:
            if doc is None:
                continue
            payload = json.loads(doc)
            records = payload if isinstance(payload, list) else [payload]
            for rec in records:
                for row in record_to_rows(rec, self.default_labels,
                                          self._cache):
                    names.append(row["name"])
                    cum.append(row["is_cumulative"])
                    vi.append(row["value_int"])
                    vd.append(row["value_double"])
                    tns.append(row["time_ns"])
                    labels.append(row["labels"])
        return pa.table({
            "name": pa.array(names, pa.string()),
            "is_cumulative": pa.array(cum, pa.bool_()),
            "value_int": pa.array(vi, pa.int64()),
            "value_double": pa.array(vd, pa.float64()),
            "time_ns": pa.array(tns, pa.int64()),
            "labels": pa.array(labels, MAP_TYPE),
        })


def parse_collectd(ds, json_col: str = "record", *,
                   default_labels: dict | None = None):
    """collectd JSON decode stage: one datapoint row per (record, dsname)
    — block-local fan-out, zero shuffle."""
    return ds.map_batches(_ParseCollectd(json_col, default_labels),
                          batch_format="pyarrow", zero_copy_batch=True)
