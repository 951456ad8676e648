"""carbonexporter analog: metric datapoints → Carbon/Graphite
plaintext lines.

Parity with exporter/carbonexporter/metricdata_to_plaintext.go:82-338:

- one line per emitted Carbon metric: ``<path> <value> <ts_secs>\\n``
  where path = ``<name>[;tag0;...;tagN]``.
- tags render in attribute-map order as ``;<key>=<value>``; keys are
  sanitized (``;!^=`` → ``_``, sanitizeTagKey:289-300) but values are
  NOT — the reference defines ``sanitizeTagValue`` (:304-315) and never
  calls it from ``buildPath`` (:252-274); empty values become the
  ``<empty>`` placeholder.
- metrics with an empty name are skipped entirely (:97-100).
- gauge/sum number points: int values via FormatInt, double values via
  ``strconv.FormatFloat(v,'f',-1,64)`` (never scientific); points with
  NO value (NumberDataPointValueTypeEmpty) are skipped (:122-124).
- histogram points (:152-182): ``<name>.count`` = FormatUint(count),
  ``<name>`` = 'f'(sum), then — only when explicit bounds exist — one
  ``<name>.bucket;...;upper_bound=<b>`` line per bucket count where the
  bound labels are ``'g'``-formatted (:319-321) and the overflow bucket
  label is ``inf`` (:43); bucket lines index ``carbonBounds[j]`` by
  bucket position, so counts beyond len(bounds)+1 would panic in Go —
  well-formed inputs only, extra counts raise here too.
- summary points (:196-220): the same count/sum pair, then one
  ``<name>.quantile;...;quantile=<q*100>`` line per quantile (label
  'g'-formatted of quantile×100, value 'f'-formatted).
- timestamps: ``uint64(ts_ns) / 1e9`` → integer seconds (:336-338);
  negative int64 inputs wrap through uint64 exactly as Go does.

Execution: one task-based map_batches, fan-out one output row per
Carbon line with a per-source ``line_seq`` ordinal; block-local, zero
shuffle. Number-point lines are the hot path and the fan-out is
bounded by buckets+quantiles per point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .signalfx import go_fmt_float_f
from .splunkhec import go_fmt_float

TAG_VALUE_EMPTY = "<empty>"
INF_LABEL = "inf"

_KEY_BAD = {";", "!", "^", "="}


def sanitize_tag_key(key: str) -> str:
    """metricdata_to_plaintext.go:289-300 — ``;!^=`` → ``_``."""
    if not any(c in key for c in _KEY_BAD):
        return key
    return "".join("_" if c in _KEY_BAD else c for c in key)


def build_path(name: str, attrs) -> str:
    """buildPath (:252-274): tags in map order, keys sanitized, values
    verbatim with the ``<empty>`` placeholder for empty strings."""
    if not attrs:
        return name
    parts = [name]
    for k, v in attrs:
        parts.append(";")
        parts.append(sanitize_tag_key(k))
        parts.append("=")
        parts.append(v if v else TAG_VALUE_EMPTY)
    return "".join(parts)


def _fmt_ts(time_ns: int) -> str:
    # uint64(timestamp) / 1e9 (:336-338)
    return str((int(time_ns) & 0xFFFFFFFFFFFFFFFF) // 1_000_000_000)


def _fmt_uint(v: int) -> str:
    return str(int(v) & 0xFFFFFFFFFFFFFFFF)


class CarbonEncode:
    """Flat datapoint rows → (carbon_line, line_seq) fan-out.

    Expected columns: ``name`` (string), ``mtype`` (gauge|sum|
    histogram|summary), ``time_ns`` (int64), ``attributes``
    (map<string,string>, nullable) plus per-type value columns:
    ``value_int``/``value_double`` for number points, ``count``/``sum``
    (+ ``explicit_bounds``/``bucket_counts`` lists) for histograms,
    ``count``/``sum`` + ``quantiles``/``quantile_values`` for
    summaries. ``id_cols`` are carried onto every emitted line.
    """

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
        attrs = opt("attributes")
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

        def emit(i, seq, path, value, ts):
            out_idx.append(i)
            out_seq.append(seq)
            out_line.append(f"{path} {value} {ts}")

        for i in range(n):
            nm = name[i]
            if not nm:  # empty-name metrics are skipped (:97-100)
                continue
            ts = _fmt_ts(time_ns[i] or 0)
            mt = mtype[i]
            if mt in ("gauge", "sum"):
                if vi[i] is not None:
                    val = str(int(vi[i]))
                elif vd[i] is not None:
                    val = go_fmt_float_f(vd[i])
                else:
                    continue  # empty-value points are skipped (:122-124)
                emit(i, 0, build_path(nm, attrs[i]), val, ts)
            elif mt in ("histogram", "summary"):
                seq = 0
                emit(i, seq, build_path(nm + ".count", attrs[i]),
                     _fmt_uint(cnt[i] or 0), ts)
                seq += 1
                emit(i, seq, build_path(nm, attrs[i]),
                     go_fmt_float_f(sm[i] or 0.0), ts)
                seq += 1
                if mt == "histogram":
                    bs = bounds[i] or []
                    bc = bcounts[i] or []
                    if not bs:
                        continue  # no bucket lines without bounds (:162-164)
                    labels = [go_fmt_float(float(b)) for b in bs]
                    labels.append(INF_LABEL)
                    bpath = build_path(nm + ".bucket", attrs[i])
                    for j, c in enumerate(bc):
                        emit(i, seq,
                             f"{bpath};upper_bound={labels[j]}",
                             _fmt_uint(c), ts)
                        seq += 1
                else:
                    if not qs[i]:
                        continue
                    qpath = build_path(nm + ".quantile", attrs[i])
                    for q, qv in zip(qs[i], qvs[i]):
                        emit(i, seq,
                             f"{qpath};quantile="
                             f"{go_fmt_float(float(q) * 100.0)}",
                             go_fmt_float_f(qv), ts)
                        seq += 1

        idx = pa.array(np.asarray(out_idx, np.int64), pa.int64())
        data = {c: tab.column(c).take(idx) for c in self.id_cols}
        data["line_seq"] = pa.array(out_seq, pa.int32())
        data["carbon_line"] = pa.array(out_line, pa.string())
        return pa.table(data)


def metrics_to_carbon(ds, *, id_cols=("doc_id",)):
    """Encode flat metric datapoint rows as Carbon plaintext lines —
    one output row per line (join on ``\\n`` for the wire payload, the
    concatenation metricDataToPlaintext returns)."""
    return ds.map_batches(CarbonEncode(id_cols=id_cols),
                          batch_format="pyarrow", zero_copy_batch=True)
