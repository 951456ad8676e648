"""prometheusexporter analog: flat metric datapoints → accumulated
last-value series → Prometheus text-exposition lines.

Parity with exporter/prometheusexporter (accumulator.go, collector.go,
utils.go) plus the prometheus/common expfmt classic text format the
collector serves through client_golang:

Accumulation (accumulator.go:64-294, one state per timeseries
signature = ``*name + Type.String() + *scope(name,version,schemaURL)
+ sorted scope attrs + sorted dp attrs + job + instance``,
:328-357):

- gauge / summary / cumulative sum / cumulative histogram: an
  incoming point with a timestamp earlier than the stored one is
  dropped; equal-or-later replaces → the surviving point is the LAST
  arrival among those carrying the series' maximum timestamp.
- sums drop unspecified temporality and delta non-monotonic points
  entirely (:169-177); the stored copy is re-stamped cumulative.
- delta sum chaining (:206-215): an accepted point whose
  start == the stored point's timestamp ADDS the stored value and
  inherits the stored start; any other accepted point replaces the
  chain.  The value add switches on the INCOMING point's own value
  type (int adds IntValue, double adds DoubleValue).
- delta histogram (:256-278): aligned (start == stored ts) merges
  count/sum and bucket counts when the bounds match exactly (else the
  newer point wins inside the merge, accumulateHistogramValues
  :368-404); a misaligned start that is not after the stored
  timestamp DROPS the point, a later one resets the chain.  No
  earlier-timestamp drop applies on this path.
- a NoRecordedValue staleness marker deletes the series; the flat
  model treats each datapoint row as its own Accumulate call, so the
  reference's skip-rest-of-this-pmetric.Metric quirk on delete
  (`return 0`) is a per-row no-op here.
- ``Collect`` expiry (wall-clock metricExpiration) is scrape-serving
  state, not data translation — out of batch scope.

Rendering (collector.go:157-494 + expfmt text format):

- family name via the otlptranslator MetricNamer
  (functions ``build_compliant_name`` — normalize_name.go parity —
  with the namespace prefix and optional suffixes); family help =
  the FIRST-seen description (validateMetrics:496-525, first by seq
  here — the Go sync.Map iteration order is nondeterministic), later
  metrics whose type conflicts with the family's are dropped.
- labels: datapoint attrs (LabelNamer), scope attrs as
  ``otel_scope_<key>``, otel_scope_name/version/schema_url ALWAYS,
  job = service.namespace "/" service.name, instance =
  service.instance.id (utils.go:23-41), plus const_labels; label
  pairs sorted by name; values escaped ``\\ \" \n``; duplicate label
  names fail NewDesc → the series is dropped.
- values via expfmt writeFloat = strconv 'g' shortest (eprec 6) with
  NaN/+Inf/-Inf names; optional ``<ms>`` timestamp suffix when
  send_timestamps.
- histograms (convertDoubleHistogram:325-379): cumulative ``le``
  buckets over the SORTED DISTINCT explicit bounds counting each
  bound's FIRST slot only, ``+Inf`` = the point count, _sum/_count
  lines; summaries: ascending quantile lines + _sum/_count; sums
  render as counters only when monotonic; a gauge whose
  ``prometheus.type`` metadata says unknown renders untyped.
  Exemplars and created timestamps are OpenMetrics-only — the classic
  text format the reference's goldens pin carries neither.
- target_info (createTargetInfoMetrics:381-461): one gauge-1 series
  per distinct job+instance resource signature (BOTH present,
  utils.go:13-21; first arrival wins), labels = normalized
  non-identifying resource attrs with ';' collision merge + job +
  instance; name [namespace_]target_info, help "Target metadata".

Execution: one lean hash groupby over the datapoint rows folds each
series (numpy fast path for monotone timestamps, literal replay
otherwise — state per group is one point); families and target_info
merge per-block partials bounded by metric-name / resource-identity
counts on the driver; line rendering is a block-local 1:N fan-out.
At 100-TB scale the single shuffle ships datapoints once, grouped by
series — the same exchange the reference's single-process map implies.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .prometheus import build_compliant_name, normalize_prom_label
from .splunkhec import go_fmt_float

_TYPE_STR = {"gauge": "Gauge", "sum": "Sum", "histogram": "Histogram",
             "summary": "Summary"}

# list-typed payloads travel the groupby as JSON strings — pandas
# round-trips of arrow lists hit the tensor-extension cast (and the
# CLAUDE invariant bans pandas round-trips on list columns anyway)
_LIST_COLS = ("explicit_bounds", "bucket_counts", "quantiles",
              "quantile_values")


def _aslist(v) -> list:
    if v is None:
        return []
    if isinstance(v, str):
        return json.loads(v) if v else []
    return list(v)


def _write_float(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    return go_fmt_float(float(v))


def _escape_label(v: str) -> str:
    return (v.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n"))


def _escape_help(v: str) -> str:
    return v.replace("\\", "\\\\").replace("\n", "\\n")


def _pairs(m) -> list[tuple[str, str]]:
    """Map-typed column value → [(k, v)] with AsString values."""
    if m is None:
        return []
    if isinstance(m, str):
        m = json.loads(m) if m else []
    if isinstance(m, dict):
        items = list(m.items())
    else:
        items = [(k, v) for k, v in m]
    out = []
    for k, v in items:
        if isinstance(v, bool):
            s = "true" if v else "false"
        elif isinstance(v, float):
            s = go_fmt_float(v)
        elif v is None:
            s = ""
        else:
            s = str(v)
        out.append((str(k), s))
    return out


def extract_job_instance(resource) -> tuple[str | None, str | None]:
    """utils.go:23-41 — job/instance from the resource attrs."""
    res = dict(_pairs(resource))
    job = None
    if "service.name" in res:
        job = res["service.name"]
        if "service.namespace" in res:
            job = res["service.namespace"] + "/" + job
    return job, res.get("service.instance.id")


def timeseries_signature(row: dict) -> str:
    """accumulator.go:328-357 — the registeredMetrics key."""
    parts = ["*" + (row.get("name") or "")
             + _TYPE_STR.get(row.get("mtype") or "", ""),
             "*" + (row.get("scope_name") or ""),
             "*" + (row.get("scope_version") or ""),
             "*" + (row.get("scope_schema_url") or "")]
    for col in ("scope_attributes", "attributes"):
        attrs = sorted(k + "*" + v for k, v in _pairs(row.get(col)))
        parts.append("*" + "*".join(attrs))
    job, instance = extract_job_instance(row.get("resource"))
    sig = "".join(parts)
    if job is not None:
        sig += "*job*" + job
    if instance is not None:
        sig += "*instance*" + instance
    return sig


# --- accumulation ---------------------------------------------------------

def _fold_last_value(g: pd.DataFrame) -> pd.DataFrame:
    """gauge/summary/cumulative survivor = last arrival at max ts."""
    ts = g["time_ns"].to_numpy()
    i = len(ts) - 1 - int(np.argmax(ts[::-1] >= ts.max()))
    return g.iloc[[i]]


def _fold_delta_sum(g: pd.DataFrame) -> pd.DataFrame:
    """accumulator.go:166-225 sequential fold, vectorized.

    Accepted rows are exactly those with ts >= the running max of all
    earlier rows (a rejected row never updates the stored state, and
    its ts is below the running max, so the accepted-only running max
    equals the all-rows running max)."""
    ts = g["time_ns"].to_numpy()
    cummax = np.maximum.accumulate(ts)
    acc = np.ones(len(ts), dtype=bool)
    acc[1:] = ts[1:] >= cummax[:-1]
    idx = np.flatnonzero(acc)
    a_ts = ts[idx]
    a_start = g["start_time_ns"].to_numpy()[idx]
    # chain break where this point's start != the previous ACCEPTED
    # point's timestamp
    brk = np.ones(len(idx), dtype=bool)
    brk[1:] = a_start[1:] != a_ts[:-1]
    head = int(np.flatnonzero(brk)[-1])
    tail = idx[head:]
    out = g.iloc[[int(idx[-1])]].copy()
    vi = g["value_int"].to_numpy()[tail]
    vd = g["value_double"].to_numpy()[tail]
    # the add switches on each incoming point's own value type;
    # homogeneous series add within one column (mixed-type chains
    # would mis-add in Go the same way)
    if pd.isna(out["value_int"].iloc[0]):
        out["value_double"] = float(np.nansum(vd))
    else:
        out["value_int"] = int(np.nansum(np.nan_to_num(vi)))
    out["start_time_ns"] = int(a_start[head])
    return out


def _fold_delta_hist(g: pd.DataFrame) -> pd.DataFrame:
    """accumulator.go:256-294 literal replay (drop / reset / merge).

    State = (row position, overrides); the output row keeps the
    group's dtypes so every map_groups block shares one schema."""
    pos = None          # positional index of the stored base row
    over: dict = {}     # column overrides accumulated by merges

    def get(p, col):
        return over[col] if p == pos and col in over else g.iloc[p][col]

    for i in range(len(g)):
        if pos is None:
            pos, over = i, {}
            continue
        if g.iloc[i]["start_time_ns"] != get(pos, "time_ns"):
            if g.iloc[i]["start_time_ns"] <= get(pos, "time_ns"):
                continue  # misaligned, not after → drop
            pos, over = i, {}  # treat like reset
            continue
        # aligned merge — accumulateHistogramValues:368-404: newer =
        # the later-ts side (dest takes its ts and, on a bounds
        # mismatch, its counts), start always inherits the STORED
        # point's start
        inc_newer = g.iloc[i]["time_ns"] >= get(pos, "time_ns")
        ob = _aslist(get(pos, "explicit_bounds"))
        nb = _aslist(g.iloc[i]["explicit_bounds"])
        new_over = {"start_time_ns": get(pos, "start_time_ns"),
                    "time_ns": max(int(g.iloc[i]["time_ns"]),
                                   int(get(pos, "time_ns")))}
        if ob == nb:
            new_over["count"] = (int(get(pos, "count"))
                                 + int(g.iloc[i]["count"]))
            new_over["hsum"] = (float(get(pos, "hsum"))
                                + float(g.iloc[i]["hsum"]))
            new_over["bucket_counts"] = json.dumps(
                [int(a) + int(b) for a, b in
                 zip(_aslist(get(pos, "bucket_counts")),
                     _aslist(g.iloc[i]["bucket_counts"]))])
        elif not inc_newer:
            # bounds mismatch and the stored point is newer: keep its
            # count/sum/buckets/bounds
            for col in ("count", "hsum", "bucket_counts",
                        "explicit_bounds"):
                v = get(pos, col)
                new_over[col] = (json.dumps(list(v))
                                 if isinstance(v, (list, np.ndarray))
                                 else v)
        pos, over = i, new_over
    if pos is None:
        return g.iloc[0:0]
    out = g.iloc[[pos]].copy()
    for k, v in over.items():
        out[k] = v
    return out


def _fold_series(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("seq", kind="stable")
    # staleness marker deletes the series; replay restarts after it
    stale = np.flatnonzero(g["flags_no_recorded"].fillna(False)
                           .to_numpy(dtype=bool))
    if len(stale):
        g = g.iloc[int(stale[-1]) + 1:]
    if not len(g):
        return g
    mtype = g["mtype"].iloc[0]
    temp = int(g["aggregation_temporality"].iloc[0] or 0)
    if mtype == "sum" and temp == 1:
        out = _fold_delta_sum(g)
    elif mtype == "histogram" and temp == 1:
        out = _fold_delta_hist(g)
    else:
        out = _fold_last_value(g)
    if mtype in ("sum", "histogram"):
        out = out.copy()
        out["aggregation_temporality"] = 2  # re-stamped cumulative
    return out


def prom_accumulate(ds, seq_col: str = "seq"):
    """Datapoint rows → one surviving row per timeseries signature.

    One lean hash shuffle grouped by the Go signature string; the
    per-group fold is numpy over the group's arrays (state = one
    point).  Sums with unspecified temporality and delta
    non-monotonic sums are dropped before the shuffle
    (accumulator.go:169-177)."""

    def prep(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        keep, sigs = [], []
        for i, row in enumerate(rows):
            if row.get("mtype") == "sum":
                temp = row.get("aggregation_temporality") or 0
                if temp == 0 or (temp == 1
                                 and not row.get("is_monotonic")):
                    continue
            keep.append(i)
            sigs.append(timeseries_signature(row))
        out = t.take(pa.array(keep, pa.int64()))
        # list/map payloads travel as JSON strings through the
        # pandas-facing groupby (see _LIST_COLS note)
        for col in (*_LIST_COLS, "attributes", "resource",
                    "scope_attributes"):
            if col not in out.schema.names:
                continue
            vals = out.column(col).to_pylist()
            ser = [v if isinstance(v, str) else
                   None if v is None else
                   json.dumps(list(v.items()) if isinstance(v, dict)
                              else list(v))
                   for v in vals]
            idx = out.schema.get_field_index(col)
            out = out.set_column(idx, col,
                                 pa.array(ser, pa.string()))
        if seq_col != "seq":
            out = out.append_column("seq", out.column(seq_col))
        return out.append_column("__sig", pa.array(sigs, pa.string()))

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return prepped.groupby("__sig").map_groups(
        _fold_series, batch_format="pandas")


# --- rendering ------------------------------------------------------------

def _family_of(row: dict, *, namespace: str,
               add_metric_suffixes: bool) -> tuple[str, str]:
    """(prometheus family name, TYPE string) for one series row."""
    mtype = row.get("mtype") or "gauge"
    mono = bool(row.get("is_monotonic"))
    name = build_compliant_name(
        row.get("name") or "", row.get("unit") or "",
        metric_type=mtype, monotonic=mono, namespace=namespace,
        add_metric_suffixes=add_metric_suffixes)
    if mtype == "sum":
        tstr = "counter" if mono else "gauge"
    elif mtype == "histogram":
        tstr = "histogram"
    elif mtype == "summary":
        tstr = "summary"
    else:
        tstr = "gauge"
        if (row.get("prom_type") or "") == "unknown":
            tstr = "untyped"
    return name, tstr


def _series_labels(row: dict, const_labels) -> list[tuple[str, str]] | None:
    """collector.go:172-209 — sorted label pairs, None on duplicates."""
    pairs = []
    for k, v in _pairs(row.get("attributes")):
        pairs.append((normalize_prom_label(k), v))
    for k, v in _pairs(row.get("scope_attributes")):
        pairs.append((normalize_prom_label("otel_scope_" + k), v))
    pairs.append(("otel_scope_name", row.get("scope_name") or ""))
    pairs.append(("otel_scope_version", row.get("scope_version") or ""))
    pairs.append(("otel_scope_schema_url",
                  row.get("scope_schema_url") or ""))
    job, instance = extract_job_instance(row.get("resource"))
    if job is not None:
        pairs.append(("job", job))
    if instance is not None:
        pairs.append(("instance", instance))
    for k, v in (const_labels or {}).items():
        pairs.append((k, v))
    names = [k for k, _ in pairs]
    if len(names) != len(set(names)):
        return None  # NewDesc duplicate-label error → series dropped
    return sorted(pairs)


def _label_str(pairs: list[tuple[str, str]],
               extra: tuple[str, str] | None = None) -> str:
    # expfmt labelPairsToText: sorted pairs first, the additional
    # le/quantile label always LAST
    items = list(pairs)
    if extra is not None:
        items = items + [extra]
    if not items:
        return ""
    return "{" + ",".join(
        f'{k}="{_escape_label(v)}"' for k, v in items) + "}"


def _series_lines(row: dict, fam: str, tstr: str,
                  pairs: list[tuple[str, str]],
                  send_timestamps: bool) -> list[str]:
    ts_suffix = ""
    if send_timestamps:
        ts_suffix = " " + str(int(row.get("time_ns") or 0) // 1_000_000)
    out = []
    if tstr in ("gauge", "counter", "untyped"):
        v = row.get("value_double")
        if v is None or (isinstance(v, float) and math.isnan(v)):
            vi = row.get("value_int")
            v = float(vi) if vi is not None else 0.0
        out.append(f"{fam}{_label_str(pairs)} {_write_float(v)}"
                   f"{ts_suffix}")
    elif tstr == "histogram":
        bounds = _aslist(row.get("explicit_bounds"))
        counts = _aslist(row.get("bucket_counts"))
        # first slot per distinct bound, sorted (collector.go:332-354)
        first = {}
        for i, b in enumerate(bounds):
            first.setdefault(float(b), i)
        cum = 0
        for b in sorted(first):
            i = first[b]
            if i < len(counts):
                cum += int(counts[i])
            out.append(f"{fam}_bucket"
                       f"{_label_str(pairs, ('le', _write_float(b)))}"
                       f" {cum}{ts_suffix}")
        total = int(row.get("count") or 0)
        out.append(f"{fam}_bucket{_label_str(pairs, ('le', '+Inf'))}"
                   f" {total}{ts_suffix}")
        out.append(f"{fam}_sum{_label_str(pairs)} "
                   f"{_write_float(float(row.get('hsum') or 0.0))}"
                   f"{ts_suffix}")
        out.append(f"{fam}_count{_label_str(pairs)} {total}{ts_suffix}")
    elif tstr == "summary":
        qs = _aslist(row.get("quantiles"))
        qvs = _aslist(row.get("quantile_values"))
        pts = sorted(zip(qs, qvs))
        for q, v in pts:
            out.append(
                f"{fam}{_label_str(pairs, ('quantile', _write_float(q)))}"
                f" {_write_float(float(v))}{ts_suffix}")
        out.append(f"{fam}_sum{_label_str(pairs)} "
                   f"{_write_float(float(row.get('ssum') or 0.0))}"
                   f"{ts_suffix}")
        out.append(f"{fam}_count{_label_str(pairs)} "
                   f"{int(row.get('count') or 0)}{ts_suffix}")
    return out


def _family_partial(t: pa.Table, namespace: str,
                    add_metric_suffixes: bool) -> pa.Table:
    rows = t.to_pylist()
    fams: dict[str, tuple[int, str, str]] = {}
    for row in rows:
        name, tstr = _family_of(row, namespace=namespace,
                                add_metric_suffixes=add_metric_suffixes)
        seq = int(row.get("seq") or 0)
        cur = fams.get(name)
        if cur is None or seq < cur[0]:
            fams[name] = (seq, tstr, row.get("description") or "")
    return pa.table({
        "fam": pa.array(list(fams), pa.string()),
        "seq": pa.array([v[0] for v in fams.values()], pa.int64()),
        "tstr": pa.array([v[1] for v in fams.values()], pa.string()),
        "help": pa.array([v[2] for v in fams.values()], pa.string()),
    })


def _target_info_partial(t: pa.Table) -> pa.Table:
    rows = t.to_pylist()
    seen: dict[str, tuple[int, str]] = {}
    for row in rows:
        job, instance = extract_job_instance(row.get("resource"))
        if not job or not instance:
            continue  # resourceSignature "" → skipped (utils.go:13-21)
        sig = job + "\xff" + instance
        seq = int(row.get("seq") or 0)
        if sig not in seen or seq < seen[sig][0]:
            seen[sig] = (seq, json.dumps(_pairs(row.get("resource"))))
    return pa.table({
        "sig": pa.array(list(seen), pa.string()),
        "seq": pa.array([v[0] for v in seen.values()], pa.int64()),
        "res": pa.array([v[1] for v in seen.values()], pa.string()),
    })


def render_prometheus_text(accumulated, *, namespace: str = "",
                           const_labels: dict | None = None,
                           send_timestamps: bool = False,
                           add_metric_suffixes: bool = True,
                           include_target_info: bool = True):
    """Accumulated series rows → exposition line rows
    (kind ∈ help/type/sample, fam, line).

    Families and target_info identities merge per-block partials on
    the driver (bounded by metric-name / resource counts); the sample
    fan-out is block-local.  The /metrics HTTP serving loop is Ray's
    write layer."""
    ns_label = normalize_prom_label(namespace) if namespace else ""
    # one upstream execution for the three consumers (family partials,
    # target_info partials, sample render) — the r4 count_sum lesson
    accumulated = accumulated.materialize()

    fam_parts = accumulated.map_batches(
        lambda t: _family_partial(t, namespace, add_metric_suffixes),
        batch_format="pyarrow", zero_copy_batch=True) \
        .materialize().to_arrow_refs()
    import ray

    def _as_arrow(part):
        # an EMPTY pandas block from the map_groups upstream can pass
        # through map_batches unexecuted and reach to_arrow_refs
        # unconverted (blocks.py empty-block hazard; seen once in the
        # 32-cpu bench run) — coerce defensively
        if isinstance(part, pa.Table):
            return part
        import pandas as _pd

        if isinstance(part, _pd.DataFrame):
            return pa.Table.from_pandas(part, preserve_index=False)
        return pa.table({})

    fams: dict[str, tuple[int, str, str]] = {}
    for ref in fam_parts:
        part = _as_arrow(ray.get(ref))
        if part.num_rows == 0 or "fam" not in part.schema.names:
            continue  # 0-row blocks surface 0-column (blocks.py note)
        for fam, seq, tstr, help_ in zip(
                part.column("fam").to_pylist(),
                part.column("seq").to_pylist(),
                part.column("tstr").to_pylist(),
                part.column("help").to_pylist()):
            cur = fams.get(fam)
            if cur is None or seq < cur[0]:
                fams[fam] = (seq, tstr, help_)

    ti_rows: dict[str, tuple[int, str]] = {}
    if include_target_info:
        ti_parts = accumulated.map_batches(
            _target_info_partial, batch_format="pyarrow",
            zero_copy_batch=True).materialize().to_arrow_refs()
        for ref in ti_parts:
            part = _as_arrow(ray.get(ref))
            if part.num_rows == 0 or "sig" not in part.schema.names:
                continue
            for sig, seq, res in zip(part.column("sig").to_pylist(),
                                     part.column("seq").to_pylist(),
                                     part.column("res").to_pylist()):
                if sig not in ti_rows or seq < ti_rows[sig][0]:
                    ti_rows[sig] = (seq, res)

    fam_ref = ray.put(fams)
    const = dict(const_labels or {})

    def render(t: pa.Table) -> pa.Table:
        fam_map = ray.get(fam_ref)
        rows = t.to_pylist()
        kinds, fcol, lines = [], [], []
        for row in rows:
            fam, tstr = _family_of(
                row, namespace=namespace,
                add_metric_suffixes=add_metric_suffixes)
            want = fam_map.get(fam)
            if want is None or want[1] != tstr:
                continue  # validateMetrics type conflict → dropped
            pairs = _series_labels(row, const)
            if pairs is None:
                continue
            for line in _series_lines(row, fam, tstr, pairs,
                                      send_timestamps):
                kinds.append("sample")
                fcol.append(fam)
                lines.append(line)
        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "fam": pa.array(fcol, pa.string()),
            "line": pa.array(lines, pa.string())})

    out = accumulated.map_batches(render, batch_format="pyarrow",
                                  zero_copy_batch=True)

    header = {"kind": [], "fam": [], "line": []}
    for fam, (_seq, tstr, help_) in sorted(fams.items()):
        header["kind"].append("help")
        header["fam"].append(fam)
        header["line"].append(f"# HELP {fam} {_escape_help(help_)}")
        header["kind"].append("type")
        header["fam"].append(fam)
        header["line"].append(f"# TYPE {fam} {tstr}")

    ti_name = (ns_label + "_" if ns_label else "") + "target_info"
    if ti_rows:
        header["kind"].append("help")
        header["fam"].append(ti_name)
        header["line"].append(f"# HELP {ti_name} Target metadata")
        header["kind"].append("type")
        header["fam"].append(ti_name)
        header["line"].append(f"# TYPE {ti_name} gauge")
    for _sig, (_seq, res_json) in sorted(ti_rows.items()):
        res = [(k, v) for k, v in json.loads(res_json)]
        labels: dict[str, str] = {}
        for k, v in res:
            if k in ("service.name", "service.namespace",
                     "service.instance.id"):
                continue
            fk = normalize_prom_label(k)
            labels[fk] = labels[fk] + ";" + v if fk in labels else v
        job, instance = extract_job_instance(res)
        if job is not None:
            labels["job"] = job
        if instance is not None:
            labels["instance"] = instance
        header["kind"].append("sample")
        header["fam"].append(ti_name)
        header["line"].append(
            f"{ti_name}{_label_str(sorted(labels.items()))} 1")

    import ray.data as rd
    header_tab = pa.table({k: pa.array(v, pa.string())
                           for k, v in header.items()})
    if header_tab.num_rows:
        out = out.union(rd.from_arrow(header_tab))
    # scrub the 0-row blocks the render map can leak when the pandas
    # map_groups upstream had empty blocks (they skip the fn and
    # surface schemaless — breaks downstream concat/union consumers)
    from .blocks import nonempty_blocks

    return nonempty_blocks(out)


def metrics_to_prometheus_text(ds, *, seq_col: str = "seq", **render_opts):
    """Full prometheusexporter analog: accumulate then render."""
    return render_prometheus_text(prom_accumulate(ds, seq_col=seq_col),
                                  **render_opts)
