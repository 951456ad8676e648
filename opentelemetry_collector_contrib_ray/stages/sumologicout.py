"""sumologicexporter analog: log lines (text/json) and Prometheus-format
metric lines, plus the X-Sumo-Fields metadata string.

Parity with exporter/sumologicexporter:

- prometheus_formatter.go:34-405 — one line per datapoint:
  ``<name>{k="v",...} <value> <ts_ms>``; label keys sanitized by the
  ``[^0-9a-zA-Z./_:\\-]`` → ``_`` regex (NOTE: ``.``, ``/``, ``:``,
  ``-`` are allowed, unlike core Prometheus), label values escaped by
  the replacer ``\\`` → ``\\\\``, ``"`` → ``\\"``, newline → ``\\n``
  (the doc comment's "/ -> //" claim is not what the replacer does);
  merged label order = passed-in (resource) attributes, then the
  le/quantile extra, then datapoint labels appended (overriding keys
  update IN PLACE); doubles render Go ``%g`` (shortest), ints ``%d``,
  timestamps ns→ms integer division. Summaries fan out quantile lines
  (quantile label = pdata AsString double = encoding/json float form)
  + ``_sum``/``_count``; histograms fan out CUMULATIVE ``_bucket``
  lines per explicit bound (le = json float form), the ``+Inf`` bucket
  only when bucket counts are non-empty, ``_sum`` only when the point
  has a sum, ``_count`` always. Number points with NO value render an
  EMPTY string — and empty lines make it into the payload
  (gauge2Strings appends unconditionally; bodyBuilder.addLines adds
  blank lines verbatim).
- sender.go:340-363 — log text format = body AsString; json format =
  attributes plus the body under the ``log`` key (DefaultLogKey,
  config.go:185) only when the body is non-empty
  (isEmptyAttributeValue:365-380), encoded by json.Encoder with
  SetEscapeHTML(false) → sorted keys, compact, raw ``&<>``.
- fields.go:30-87 — X-Sumo-Fields string: ``k=v`` pairs (keys and
  values sanitized bytewise: ``,``→``_``, ``=``→``:``, ``\\n``→``_``),
  skipping the _sourceCategory/_sourceHost/_sourceName attributes and
  empty values, SORTED, joined ``", "``.
- the OTLP log/metric format branch is the covered OTLP-proto codec
  (sources/otlpproto.py); HTTP chunking/retry is the transport layer.

Execution: task-based map_batches; metric fan-out one row per line
with ``line_seq`` ordinals, block-local, zero shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .awsemf import go_json_float
from .splunkhec import go_fmt_float

DEFAULT_LOG_KEY = "log"

_NAME_BAD = re.compile(r"[^0-9a-zA-Z./_:\-]")

_SOURCE_KEYS = {"_sourceCategory", "_sourceHost", "_sourceName"}


def sanitize_key(s: str) -> str:
    """prometheus_formatter.go:135-137."""
    return _NAME_BAD.sub("_", s)


def sanitize_value(s: str) -> str:
    """prometheus_formatter.go:143-145 — the actual replacer set."""
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n"))


def _sanitize_field(s: str) -> str:
    """fields.go:74-87 — bytewise ,= newline swaps."""
    return (s.replace(",", "_").replace("=", ":").replace("\n", "_"))


def sumo_fields(attrs) -> str:
    """fields.go:30-71 — the X-Sumo-Fields metadata string."""
    if not attrs:
        return ""
    out = []
    for k, v in attrs:
        if k in _SOURCE_KEYS or v == "":
            continue
        out.append(f"{_sanitize_field(k)}={_sanitize_field(str(v))}")
    out.sort()
    return ", ".join(out)


def _merge_tags(resource_attrs, extra, dp_attrs) -> str:
    """tags2String over mergeAttributes(resource, extra) + dp labels:
    insertion order with in-place overrides (pcommon.Map.PutStr)."""
    merged: dict = {}
    for src in (resource_attrs or (), extra or (), dp_attrs or ()):
        for k, v in src:
            merged[k] = v  # dict preserves first-insertion position
    if not merged:
        return ""
    parts = [f'{sanitize_key(k)}="{sanitize_value(_as_string(v))}"'
             for k, v in merged.items()]
    return "{" + ",".join(parts) + "}"


def _as_string(v) -> str:
    """pcommon.Value.AsString over the flat value kinds: bools
    lowercase, doubles in the encoding/json float form (pdata
    float64AsString), everything else str()."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_json_float(v)
    return str(v)


class SumoPrometheusEncode:
    """Flat datapoint rows → (sumo_line, line_seq) fan-out; the same
    input schema as stages/carbonout (plus ``resource_attrs`` and
    ``quantiles``/``quantile_values`` for summaries)."""

    def __init__(self, id_cols=("doc_id",)):
        self.id_cols = tuple(id_cols)

    def __call__(self, tab: pa.Table) -> pa.Table:
        n = tab.num_rows
        cols = set(tab.column_names)

        def opt(c):
            return tab.column(c).to_pylist() if c in cols else [None] * n

        name = opt("name")
        mtype = opt("mtype")
        time_ns = opt("time_ns")
        rattrs = opt("resource_attrs")
        dattrs = opt("attributes")
        vi = opt("value_int")
        vd = opt("value_double")
        cnt = opt("count")
        sm = opt("sum")
        bounds = opt("explicit_bounds")
        bcounts = opt("bucket_counts")
        qs = opt("quantiles")
        qvs = opt("quantile_values")

        out_idx: list[int] = []
        out_line: list[str] = []
        out_seq: list[int] = []

        for i in range(n):
            ts = str(int(time_ns[i] or 0) // 1_000_000)
            nm = sanitize_key(name[i] or "")
            seq = 0

            def emit(line, i=i):
                nonlocal seq
                out_idx.append(i)
                out_seq.append(seq)
                out_line.append(line)
                seq += 1

            mt = mtype[i]
            if mt in ("gauge", "sum"):
                if vd[i] is not None:
                    tags = _merge_tags(rattrs[i], None, dattrs[i])
                    emit(f"{nm}{tags} {go_fmt_float(vd[i])} {ts}")
                elif vi[i] is not None:
                    tags = _merge_tags(rattrs[i], None, dattrs[i])
                    emit(f"{nm}{tags} {int(vi[i])} {ts}")
                else:
                    emit("")  # empty-value points render empty lines
            elif mt == "summary":
                for q, qv in zip(qs[i] or [], qvs[i] or []):
                    tags = _merge_tags(rattrs[i],
                                       [("quantile", float(q))], dattrs[i])
                    emit(f"{nm}{tags} {go_fmt_float(qv)} {ts}")
                tags = _merge_tags(rattrs[i], None, dattrs[i])
                emit(f"{nm}_sum{tags} {go_fmt_float(sm[i] or 0.0)} {ts}")
                emit(f"{nm}_count{tags} {int(cnt[i] or 0)} {ts}")
            elif mt == "histogram":
                bs = bounds[i] or []
                bc = bcounts[i] or []
                cumulative = 0
                for j, b in enumerate(bs):
                    cumulative += bc[j]
                    tags = _merge_tags(rattrs[i], [("le", float(b))],
                                       dattrs[i])
                    emit(f"{nm}_bucket{tags} {cumulative} {ts}")
                if bc:
                    cumulative += bc[len(bs)]
                    tags = _merge_tags(rattrs[i], [("le", "+Inf")],
                                       dattrs[i])
                    emit(f"{nm}_bucket{tags} {cumulative} {ts}")
                if sm[i] is not None:
                    tags = _merge_tags(rattrs[i], None, dattrs[i])
                    emit(f"{nm}_sum{tags} {go_fmt_float(sm[i])} {ts}")
                tags = _merge_tags(rattrs[i], None, dattrs[i])
                emit(f"{nm}_count{tags} {int(cnt[i] or 0)} {ts}")

        idx = pa.array(np.asarray(out_idx, np.int64), pa.int64())
        data = {c: tab.column(c).take(idx) for c in self.id_cols}
        data["line_seq"] = pa.array(out_seq, pa.int32())
        data["sumo_line"] = pa.array(out_line, pa.string())
        return pa.table(data)


def metrics_to_sumologic_prometheus(ds, *, id_cols=("doc_id",)):
    """Encode flat metric datapoint rows as Sumo Logic Prometheus-format
    lines — one output row per line."""
    return ds.map_batches(SumoPrometheusEncode(id_cols=id_cols),
                          batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# logs

def _json_noesc(obj) -> str:
    """encoding/json forms with SetEscapeHTML(false): sorted map keys,
    Go float rules, raw ``&<>``."""
    import json as _json

    if obj is None:
        return "null"
    if isinstance(obj, bool):
        return "true" if obj else "false"
    if isinstance(obj, str):
        return _json.dumps(obj, ensure_ascii=False)
    if isinstance(obj, int):
        return str(obj)
    if isinstance(obj, float):
        return go_json_float(obj)
    if isinstance(obj, dict):
        return "{" + ",".join(f"{_json_noesc(str(k))}:{_json_noesc(v)}"
                              for k in sorted(obj)
                              for v in (obj[k],)) + "}"
    if isinstance(obj, (list, tuple)):
        return "[" + ",".join(_json_noesc(x) for x in obj) + "]"
    raise TypeError(f"sumologic json: unsupported {type(obj)}")


def log_to_json(attrs, body, log_key: str = DEFAULT_LOG_KEY) -> str:
    """sender.go:345-363 — attributes + non-empty body under the log
    key (isEmptyAttributeValue empties are omitted), Go json.Encoder
    with SetEscapeHTML(false)."""
    doc = dict(attrs or ())
    if body is not None and body != "" and body != [] and body != {}:
        doc[log_key] = body
    return _json_noesc(doc)


class SumoLogEncode:
    def __init__(self, log_format="json", body_col="body",
                 attrs_col="attributes", id_cols=("doc_id",),
                 log_key=DEFAULT_LOG_KEY):
        if log_format not in ("json", "text"):
            raise ValueError(f"unexpected log format: {log_format}")
        self.log_format = log_format
        self.body_col = body_col
        self.attrs_col = attrs_col
        self.id_cols = tuple(id_cols)
        self.log_key = log_key

    def __call__(self, tab: pa.Table) -> pa.Table:
        bodies = tab.column(self.body_col).to_pylist()
        if self.log_format == "text":
            lines = [b if b is not None else "" for b in bodies]
        else:
            attrs = (tab.column(self.attrs_col).to_pylist()
                     if self.attrs_col in tab.column_names
                     else [None] * len(bodies))
            lines = [log_to_json(a, b, self.log_key)
                     for a, b in zip(attrs, bodies)]
        data = {c: tab.column(c) for c in self.id_cols}
        data["sumo_line"] = pa.array(lines, pa.string())
        return pa.table(data)


def logs_to_sumologic(ds, *, log_format: str = "json",
                      body_col: str = "body",
                      attrs_col: str = "attributes",
                      id_cols=("doc_id",), log_key: str = DEFAULT_LOG_KEY):
    """Render log rows as Sumo Logic text/json lines (the OTLP format
    branch is sources/otlpproto.py)."""
    return ds.map_batches(
        SumoLogEncode(log_format, body_col, attrs_col, id_cols, log_key),
        batch_format="pyarrow", zero_copy_batch=True)
