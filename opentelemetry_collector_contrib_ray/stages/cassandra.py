"""cassandraexporter analogs: flat log / span rows → Cassandra
INSERT rows.

Parity with exporter/cassandraexporter (constants.go:14-20 insert
column lists, exporter_logs.go:109-150 pushLogsData,
exporter_traces.go:109-140 pushTraceData, helper.go:8-17
attributesToMap):

- logs (9 columns): timestamp ns, hex-or-empty trace/span ids,
  uint32 traceflags, severitytext, int32 severitynumber, body =
  json.Marshal(Body().AsRaw()) — a STRING body renders WITH QUOTES
  (`"msg"`), numbers/bools/maps as their JSON literals.
- spans (12 columns): timestamp = span start, traceutil LONG
  SPAN_KIND_*/STATUS_CODE_* names, duration = end−start NANOseconds;
  the CQL table defines Events/Links frozen columns but the INSERT
  never fills them (constants.go:14 vs :16) — faithfully absent.
- attribute maps are map<text,text> where every VALUE is the
  json.Marshal of the raw value (`"v"`/`5`/`true`/`1.5`/nested
  compact JSON) — NOT AsString; unmarshalable values are silently
  dropped. Go map iteration is random; canonicalized here as a
  sorted-key JSON object of those JSON-literal strings.
- per-row insert errors are logged and SKIPPED (the push never
  fails) — N/A here since encoding is total.

Execution: 1:1 per-row encode task maps, block-local, zero shuffle;
the gocql session, quorum consistency, keyspace/table DDL and
compression are schema management / Ray's write layer.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .awsemf import go_json

_KIND_LONG = ("SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
              "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
              "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER")
_STATUS_LONG = ("STATUS_CODE_UNSET", "STATUS_CODE_OK",
                "STATUS_CODE_ERROR")


def _hex_or_empty(h) -> str:
    return "" if not h or set(h) <= {"0"} else h


def _attrs_map(js) -> str:
    """attributesToMap: every raw value json.Marshal'd into a text
    cell; canonical sorted-key rendering."""
    m = json.loads(js or "{}") or {}
    return go_json({k: go_json(v) for k, v in m.items()})


def cass_log_row(row: dict) -> dict:
    """exporter_logs.go:109-150 insert values."""
    body = row.get("body")
    return {
        "timestamp": int(row.get("time_unix_nano") or 0),
        "traceid": _hex_or_empty(row.get("trace_id")),
        "spanid": _hex_or_empty(row.get("span_id")),
        "traceflags": int(row.get("flags") or 0),
        "severitytext": row.get("severity_text") or "",
        "severitynumber": int(row.get("severity_number") or 0),
        "body": go_json(body),
        "resourceattributes":
            _attrs_map(row.get("resource_attributes")),
        "logattributes": _attrs_map(row.get("attributes")),
    }


def cass_span_row(row: dict) -> dict:
    """exporter_traces.go:109-140 insert values."""
    start = int(row.get("start_time_unix_nano") or 0)
    end = int(row.get("end_time_unix_nano") or 0)
    return {
        "timestamp": start,
        "traceid": _hex_or_empty(row.get("trace_id")),
        "spanid": _hex_or_empty(row.get("span_id")),
        "parentspanid": _hex_or_empty(row.get("parent_span_id")),
        "tracestate": row.get("trace_state") or "",
        "spanname": row.get("span_name") or "",
        "spankind": _KIND_LONG[int(row.get("span_kind") or 0)],
        "resourceattributes":
            _attrs_map(row.get("resource_attributes")),
        "spanattributes": _attrs_map(row.get("attributes")),
        "duration": end - start,
        "statuscode": _STATUS_LONG[int(row.get("status_code") or 0)],
        "statusmessage": row.get("status_message") or "",
    }


_LOG_COLS = ("timestamp", "traceid", "spanid", "traceflags",
             "severitytext", "severitynumber", "body",
             "resourceattributes", "logattributes")
_SPAN_COLS = ("timestamp", "traceid", "spanid", "parentspanid",
              "tracestate", "spanname", "spankind",
              "resourceattributes", "spanattributes", "duration",
              "statuscode", "statusmessage")
_INT_COLS = {"timestamp": pa.int64(), "traceflags": pa.int64(),
             "severitynumber": pa.int32(), "duration": pa.int64()}


class _CassEncode:
    def __init__(self, fn, names):
        self.fn = fn
        self.names = names

    def __call__(self, batch: pa.Table) -> pa.Table:
        recs = [self.fn(r) for r in batch.to_pylist()]
        collide = [k for k in self.names if k in batch.schema.names]
        if collide:
            batch = batch.drop_columns(collide)
        for k in self.names:
            typ = _INT_COLS.get(k, pa.string())
            batch = batch.append_column(
                k, pa.array([r[k] for r in recs], typ))
        return batch


def logs_to_cassandra(ds):
    """Flat log rows → Cassandra log INSERT rows (1:1)."""
    return ds.map_batches(_CassEncode(cass_log_row, _LOG_COLS),
                          batch_format="pyarrow",
                          zero_copy_batch=True)


def spans_to_cassandra(ds):
    """Flat span rows → Cassandra span INSERT rows (1:1)."""
    return ds.map_batches(_CassEncode(cass_span_row, _SPAN_COLS),
                          batch_format="pyarrow",
                          zero_copy_batch=True)
