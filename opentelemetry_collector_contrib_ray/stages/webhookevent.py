"""webhookeventreceiver analog: raw webhook request bodies → log rows.

Parity with receiver/webhookeventreceiver (receiver.go:155-213,
req_to_log.go):

- one request body = one log record by default (the whole-body scanner
  split); ``split_logs_at_new_line`` emits one record per "\\n" line;
  ``split_at_json_boundary`` re-tokenizes the body as a sequence of
  JSON values (Go json.Decoder raw messages — whitespace-separated,
  stops at the first invalid token keeping earlier values, falls back
  to the whole body when nothing decodes).
- resource attributes = the request's non-empty query parameters;
  scope = "otlp/webhookevent" with source/receiver scope attrs (scope
  attrs ride as columns here); header attributes: keys matching the
  ``include_headers_regex`` become string-list ``header.<Key>``
  attributes on every record; a configured required_header mismatch
  fails the whole request (401 in the reference).
- gzip bodies: a bytes payload with the gzip magic inflates first
  (Content-Encoding is transport metadata the flat model lacks —
  magic-sniffed, same convention as the proto shard reader).
- ObservedTimestamp = arrival wall clock → 0 here (batch decode).

Execution: per-row fan-out in a task-based map_batches, block-local,
zero shuffle.
"""

from __future__ import annotations

import gzip
import json
import re

import pyarrow as pa

SCOPE_NAME = "otlp/webhookevent"


def split_json_objects(data: str) -> list[str]:
    """req_to_log.go splitJSONObjects: sequential raw JSON values."""
    dec = json.JSONDecoder()
    out = []
    i, n = 0, len(data)
    while i < n:
        while i < n and data[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        try:
            _, end = dec.raw_decode(data, i)
        except ValueError:
            break
        out.append(data[i:end])
        i = end
    if not out:
        return [data]
    return out


def webhook_body_to_rows(body, *, query: dict | None = None,
                         headers: dict | None = None,
                         split_logs_at_new_line: bool = False,
                         split_at_json_boundary: bool = False,
                         include_headers_regex: str | None = None,
                         required_header: tuple | None = None
                         ) -> list[dict]:
    if required_header is not None:
        key, value = required_header
        if (headers or {}).get(key) != value:
            raise ValueError("required header value does not match")
    if isinstance(body, bytes):
        if body[:2] == b"\x1f\x8b":
            body = gzip.decompress(body)
        body = body.decode("utf-8")
    if not body:
        raise ValueError("empty response body")

    res = {k: str(v) for k, v in (query or {}).items() if v}
    res_json = json.dumps(res, sort_keys=True)

    attrs: dict = {}
    if include_headers_regex:
        rx = re.compile(include_headers_regex)
        for k, v in (headers or {}).items():
            if rx.search(k):
                attrs[f"header.{k}"] = v if isinstance(v, list) else [v]
    attrs_json = json.dumps(attrs, sort_keys=True)

    if split_logs_at_new_line:
        lines = body.split("\n")
    elif split_at_json_boundary:
        lines = split_json_objects(body)
    else:
        lines = [body]

    return [{"body": line, "time_unix_nano": 0,
             "attributes": attrs_json,
             "resource_attributes": res_json,
             "scope_name": SCOPE_NAME} for line in lines]


_COLS = (("body", pa.string()), ("time_unix_nano", pa.int64()),
         ("attributes", pa.string()),
         ("resource_attributes", pa.string()),
         ("scope_name", pa.string()))


class _ParseWebhook:
    def __init__(self, body_col, query_col, headers_col, opts, on_error):
        self.body_col = body_col
        self.query_col = query_col
        self.headers_col = headers_col
        self.opts = opts
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        bodies = batch.column(self.body_col).to_pylist()
        queries = (batch.column(self.query_col).to_pylist()
                   if self.query_col in batch.column_names
                   else [None] * len(bodies))
        headers = (batch.column(self.headers_col).to_pylist()
                   if self.headers_col in batch.column_names
                   else [None] * len(bodies))
        parent, cols = [], {name: [] for name, _ in _COLS}
        cols["error"] = []
        for i, body in enumerate(bodies):
            try:
                q = json.loads(queries[i]) if queries[i] else None
                h = json.loads(headers[i]) if headers[i] else None
                rows = webhook_body_to_rows(body, query=q, headers=h,
                                            **self.opts)
            except (ValueError, TypeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(None)
                cols["error"].append(str(e))
                continue
            for row in rows:
                parent.append(i)
                for name, _ in _COLS:
                    cols[name].append(row[name])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in _COLS + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_webhook_events(ds, body_col: str = "body_raw", *,
                         query_col: str = "query",
                         headers_col: str = "headers",
                         split_logs_at_new_line: bool = False,
                         split_at_json_boundary: bool = False,
                         include_headers_regex: str | None = None,
                         required_header: tuple | None = None,
                         on_error: str = "drop"):
    """Webhook request bodies → log rows (per-request fan-out per the
    configured split mode)."""
    opts = {"split_logs_at_new_line": split_logs_at_new_line,
            "split_at_json_boundary": split_at_json_boundary,
            "include_headers_regex": include_headers_regex,
            "required_header": tuple(required_header)
            if required_header else None}
    return ds.map_batches(
        _ParseWebhook(body_col, query_col, headers_col, opts, on_error),
        batch_format="pyarrow", zero_copy_batch=True)
