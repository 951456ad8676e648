"""honeycombmarkerexporter analog: log rows × configured markers →
Honeycomb marker POST rows.

Parity with exporter/honeycombmarkerexporter/logs_exporter.go:79-157
+ config.go:

- each configured marker carries OTTL log conditions
  (``rules.log_conditions``, matched with the filterottl OR
  semantics); every (log record, marker) match emits one marker
  request — Go json.Marshal of a string map {type, message?, url?}
  (sorted keys), message/url copied AsString from the marker's
  message_key/url_key attributes ONLY when present.
- the POST target is ``<api_url without trailing />/1/markers/<slug>``
  with the ``__all__`` default dataset slug; the HTTP client,
  X-Honeycomb-Team header and error handling are transport.
- the conditions compile ONCE per stage (the same build-time OTTL
  machinery as the transform/filter processors — functions/expr.py);
  evaluation is the vectorized mask per batch, so a marker sweep over
  100 TB of logs is a block-local scan, zero shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.expr import compile_condition
from .awsemf import go_json
from .splunkhec import go_fmt_float

DEFAULT_DATASET_SLUG = "__all__"


def _as_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_fmt_float(v)
    return "" if v is None else str(v)


class _Markers:
    def __init__(self, markers: list[dict], api_url: str):
        self.markers = []
        for m in markers:
            conds = [compile_condition(c)
                     for c in (m.get("log_conditions") or ["true"])]
            slug = m.get("dataset_slug") or DEFAULT_DATASET_SLUG
            url = api_url.rstrip("/") + "/1/markers/" + slug
            self.markers.append((m, conds, url))

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, types, reqs, urls = [], [], [], []
        rows = None
        for m, conds, url in self.markers:
            mask = conds[0](batch)
            for c in conds[1:]:  # filterottl: ANY condition matches
                mask = pc.or_kleene(mask, c(batch))
            mask = pc.fill_null(mask, False)
            idx = [i for i, keep in enumerate(mask.to_pylist())
                   if keep]
            if not idx:
                continue
            if rows is None:
                rows = batch.to_pylist()
            for i in idx:
                attrs = rows[i].get("attributes") or {}
                if not isinstance(attrs, dict):
                    attrs = dict(attrs)
                req = {"type": m.get("type") or ""}
                if m.get("message_key") in attrs:
                    req["message"] = _as_string(
                        attrs[m["message_key"]])
                if m.get("url_key") in attrs:
                    req["url"] = _as_string(attrs[m["url_key"]])
                parent.append(i)
                types.append(m.get("type") or "")
                reqs.append(go_json(req))
                urls.append(url)
        out = batch.take(pa.array(parent, pa.int64()))
        out = out.append_column("marker_type",
                                pa.array(types, pa.string()))
        out = out.append_column("marker_request",
                                pa.array(reqs, pa.string()))
        return out.append_column("marker_url",
                                 pa.array(urls, pa.string()))


def honeycomb_markers(ds, markers: list[dict], *, api_url: str = ""):
    """Log rows → one marker row per (record, matching marker)."""
    return ds.map_batches(_Markers(markers, api_url),
                          batch_format="pyarrow", zero_copy_batch=True)
