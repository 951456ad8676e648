"""elasticsearchexporter analog: flat log/span rows → Elasticsearch
bulk documents (the exporter's mapping modes) + data-stream routing.

Document model parity (internal/objmodel/objmodel.go):

- a Document is an ordered field list; ``Serialize`` always Dedups
  first: stable sort by key, prefix-rename ``path.x`` → ``path.x.value``
  when a longer ``path.x.a`` key follows (:237-266), duplicate keys keep
  the LAST value, empty values (nil / empty object / empty array /
  ignore) are skipped at write time.  AddString skips empty strings;
  Add{Trace,Span}ID skip zero ids; attribute maps flatten recursively
  into dotted keys; maps inside arrays stay unflattenable objects.
- dedot=true (ecs mode) turns dotted keys into nested objects; the
  legacy modes serialize flat dotted keys.  Floats print with an
  explicit radix point (1 → "1.0", structform ExplicitRadixPoint);
  NaN/Inf serialize as null; timestamps render with the fixed layout
  "2006-01-02T15:04:05.000000000Z" (9-digit nanos, UTC).

Mapping modes (model.go):

- none/raw (legacyModeEncoder:160-181 / nonOTelSpanEncoder:390-413):
  @timestamp (record ts, falling back to observed for logs), TraceId /
  SpanId / TraceFlags / SeverityText / SeverityNumber / Body,
  Resource.* and Scope.* attribute prefixes (scope attrs + name/version),
  record attributes under "Attributes." (none) or top-level (raw),
  data_stream.* echo fields; spans add EndTimestamp, Name, Kind
  (SPAN_KIND_* names), TraceStatus/TraceStatusDescription, Link (the
  JSON-marshalled link array string), Duration in µs, and per-event
  ``<prefix>.<name>.time`` + attribute fields (AddEvents).
- ecs (model.go:183-262, 497-611): resource attrs through the
  SemConv→ECS conversion table (empty mapping = drop;
  host.name preserved alongside host.hostname), record attrs through
  the exception→error table, agent.name = sdk[/language][/distro] with
  the "otlp" default, agent.version from distro else sdk version,
  host.os.type from the os.type/os.name tables (unmapped → absent),
  @timestamp (ts else observed), trace.id/span.id, event.severity only
  when non-zero, log.level from severity text, message only for string
  bodies; spans: @timestamp/trace.id/span.id/span.name/parent.id,
  event.outcome success/failure from status Ok/Error, span.links
  objects (trace_id/span_id).
- bodymap (model.go:337-358): the record body MUST be a map — its
  fields become the entire document verbatim; anything else is a
  per-record error.

Routing (data_stream_router.go): elasticsearch.index attribute wins;
else data_stream.dataset/namespace from record > scope > resource
attributes with "generic"/"default" defaults; receiver-based dataset
from a ``/receiver/(\\w*receiver)`` scope-name match when no dataset
attr; sanitize = lowercase, disallowed runes → "_", 100-byte cap before
the suffix; final index "<type>-<dataset>-<namespace>".  The otel
mapping mode (a separate vendored serializer) and the ECS metrics
grouping path are out of scope — documented, the bulk-indexer transport
is Ray's write layer here.

Execution: pure per-row encode in a task-based map_batches — block
local, zero shuffle; output adds ``es_index`` + ``es_doc`` columns (the
bulk action pair), the routed-write analog of the loki/splunk
exporters.
"""

from __future__ import annotations

import json
import math
import re

import pyarrow as pa

from .splunkhec import go_fmt_float

_TS_DIGITS = 1_000_000_000

_RECEIVER_RE = re.compile(r"/receiver/(\w*receiver)")

_DISALLOWED_NS = set("\\/*?\"<>| ,#:")
_DISALLOWED_DS = set("-\\/*?\"<>| ,#:")

_RESOURCE_ECS = {
    "service.instance.id": "service.node.name",
    "deployment.environment": "service.environment",
    "telemetry.sdk.name": "",
    "telemetry.sdk.language": "",
    "telemetry.sdk.version": "",
    "telemetry.distro.name": "",
    "telemetry.distro.version": "",
    "cloud.platform": "cloud.service.name",
    "container.image.tags": "container.image.tag",
    "host.name": "host.hostname",
    "host.arch": "host.architecture",
    "process.executable.path": "process.executable",
    "process.runtime.name": "service.runtime.name",
    "process.runtime.version": "service.runtime.version",
    "os.name": "host.os.name",
    "os.type": "host.os.platform",
    "os.description": "host.os.full",
    "os.version": "host.os.version",
    "k8s.deployment.name": "kubernetes.deployment.name",
    "k8s.namespace.name": "kubernetes.namespace",
    "k8s.node.name": "kubernetes.node.name",
    "k8s.pod.name": "kubernetes.pod.name",
    "k8s.pod.uid": "kubernetes.pod.uid",
    "k8s.job.name": "kubernetes.job.name",
    "k8s.cronjob.name": "kubernetes.cronjob.name",
    "k8s.statefulset.name": "kubernetes.statefulset.name",
    "k8s.replicaset.name": "kubernetes.replicaset.name",
    "k8s.daemonset.name": "kubernetes.daemonset.name",
    "k8s.container.name": "kubernetes.container.name",
    "k8s.cluster.name": "orchestrator.cluster.name",
}
_RESOURCE_PRESERVE = {"host.name"}

_RECORD_ECS = {
    "event.name": "event.action",
    "exception.message": "error.message",
    "exception.stacktrace": "error.stacktrace",
    "exception.type": "error.type",
    "exception.escaped": "event.error.exception.handled",
}

_SPAN_KIND_STR = {0: "SPAN_KIND_UNSPECIFIED", 1: "SPAN_KIND_INTERNAL",
                  2: "SPAN_KIND_SERVER", 3: "SPAN_KIND_CLIENT",
                  4: "SPAN_KIND_PRODUCER", 5: "SPAN_KIND_CONSUMER"}


# --- objmodel ------------------------------------------------------------

_IGNORE = object()


class ESDoc:
    """objmodel.Document: ordered (key, value) fields with the
    Dedup/dedot/serialize semantics above."""

    def __init__(self):
        self.fields: list = []

    # -- adders (skip-empty semantics match the Go adders) --

    def add(self, key, value):
        self.fields.append([key, value])

    def add_string(self, key, v):
        if v:
            self.add(key, v)

    def add_id(self, key, hexstr, width):
        if hexstr and hexstr != "0" * width:
            self.add(key, hexstr)

    def add_int(self, key, v):
        self.add(key, int(v))

    def add_timestamp(self, key, ns):
        self.add(key, _Timestamp(ns))

    def add_attribute(self, key, v):
        """AddAttribute: maps flatten, slices become arrays."""
        if isinstance(v, dict):
            self.add_attributes(key, v)
        elif isinstance(v, list):
            self.add(key, [_arr_value(x) for x in v])
        else:
            self.add(key, v)

    def add_attributes(self, prefix, attrs: dict):
        for k, v in attrs.items():
            self.add_attribute(_flatten_key(prefix, k), v)

    # -- Dedup + serialize --

    def dedup(self):
        idx = list(range(len(self.fields)))
        idx.sort(key=lambda i: self.fields[i][0])   # stable
        fields = [self.fields[i] for i in idx]
        renamed = False
        for i in range(len(fields) - 1):
            key, nxt = fields[i][0], fields[i + 1][0]
            if len(key) < len(nxt) and nxt.startswith(key) and \
                    nxt[len(key)] == ".":
                fields[i][0] = key + ".value"
                renamed = True
        if renamed:
            fields.sort(key=lambda f: f[0])
        for i in range(len(fields) - 1):
            if fields[i][0] == fields[i + 1][0]:
                fields[i][1] = _IGNORE
        self.fields = fields

    def serialize(self, dedot: bool, dedup: bool = True,
                  sort: bool = False) -> str:
        """Serialize; Go's Document.Serialize does NOT dedup — the ES
        exporter always calls Dedup() first (kept as the default), the
        opensearch exporter only deduPs/Sorts per config
        (opensearchexporter/encoder.go:133-140)."""
        if dedup:
            self.dedup()
        elif sort:
            idx = list(range(len(self.fields)))
            idx.sort(key=lambda i: self.fields[i][0])  # stable Sort()
            self.fields = [self.fields[i] for i in idx]
        out = []
        if not dedot:
            out.append("{")
            first = True
            for key, value in self.fields:
                if _is_empty(value):
                    continue
                if not first:
                    out.append(",")
                first = False
                out.append(_json_str(key))
                out.append(":")
                out.append(_emit(value, dedot))
            out.append("}")
            return "".join(out)
        # dedot: nested objects from dotted keys (iterJSONDedot)
        out.append("{")
        obj_prefix = ""
        level = 0
        first_at_level = [True]
        for key, value in self.fields:
            if _is_empty(value):
                continue
            # close levels until common prefix
            common = _common_obj_prefix(key, obj_prefix)
            if common < len(obj_prefix):
                target = common
                while target > 0 and key[target - 1] != ".":
                    target -= 1
                if target > 0:
                    delta = obj_prefix[target:]
                    while "." in delta:
                        delta = delta[delta.index(".") + 1:]
                        level -= 1
                        out.append("}")
                        first_at_level.pop()
                    obj_prefix = key[:target]
                else:
                    while level > 0:
                        level -= 1
                        out.append("}")
                        first_at_level.pop()
                    obj_prefix = ""
            # open levels for this key
            while True:
                start = len(obj_prefix)
                dot = key.find(".", start)
                if dot < 0:
                    break
                if not first_at_level[-1]:
                    out.append(",")
                first_at_level[-1] = False
                out.append(_json_str(key[start:dot]))
                out.append(":{")
                first_at_level.append(True)
                level += 1
                obj_prefix = key[:dot + 1]
            if not first_at_level[-1]:
                out.append(",")
            first_at_level[-1] = False
            out.append(_json_str(key[len(obj_prefix):]))
            out.append(":")
            out.append(_emit(value, dedot))
        while level > 0:
            level -= 1
            out.append("}")
        out.append("}")
        return "".join(out)


class _Timestamp:
    def __init__(self, ns):
        self.ns = int(ns)


class _Unflattenable:
    def __init__(self, m: dict):
        self.m = m


def _arr_value(x):
    if isinstance(x, dict):
        return _Unflattenable(x)
    if isinstance(x, list):
        return [_arr_value(y) for y in x]
    return x


def _flatten_key(path, key):
    return key if path == "" else f"{path}.{key}"


def _common_obj_prefix(key, prefix):
    n = min(len(key), len(prefix))
    i = 0
    while i < n and key[i] == prefix[i]:
        i += 1
    return i


def _is_empty(v):
    if v is _IGNORE or v is None:    # KindIgnore / KindNil
        return True
    if isinstance(v, ESDoc):
        return not v.fields
    if isinstance(v, list):
        return not v
    return False


def _json_str(s: str) -> str:
    return json.dumps(s, ensure_ascii=False)


def _fmt_ts(ns: int) -> str:
    from datetime import datetime, timezone
    sec, frac = divmod(int(ns), _TS_DIGITS)
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    return (f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
            f"T{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}"
            f".{frac:09d}Z")


def _emit(v, dedot) -> str:
    if v is None:
        return "null"
    if isinstance(v, _Timestamp):
        return _json_str(_fmt_ts(v.ns))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return "null"
        s = go_fmt_float(v)
        if "." not in s and "e" not in s and "E" not in s:
            s += ".0"       # structform ExplicitRadixPoint
        return s
    if isinstance(v, str):
        return _json_str(v)
    if isinstance(v, _Unflattenable) or isinstance(v, dict):
        d = ESDoc()
        d.add_attributes("", v.m if isinstance(v, _Unflattenable) else v)
        return d.serialize(True)
    if isinstance(v, list):
        return "[" + ",".join(_emit(x, dedot) for x in v) + "]"
    if isinstance(v, ESDoc):
        return v.serialize(dedot)
    raise TypeError(f"unsupported value {v!r}")


# --- routing -------------------------------------------------------------

def sanitize_data_stream_field(field: str, disallowed: set,
                               suffix: str = "") -> str:
    field = "".join("_" if r in disallowed else r.lower() for r in field)
    if len(field.encode()) > 100 - len(suffix):
        field = field.encode()[:100 - len(suffix)].decode(
            "utf-8", "ignore")
    return field + suffix


def _get_from_attributes(name, default, *maps):
    for m in maps:
        if m and name in m:
            return str(m[name]), True
    return default, False


def route_record(record_attrs: dict, scope_attrs: dict,
                 resource_attrs: dict, scope_name: str,
                 default_type: str, *, static_index: str | None = None,
                 otel_suffix: bool = False) -> str:
    """data_stream_router.go routeRecord → the final index name."""
    if static_index:
        return static_index
    es_index, ok = _get_from_attributes(
        "elasticsearch.index", "", record_attrs, scope_attrs,
        resource_attrs)
    if ok:
        return es_index
    dataset, ds_exists = _get_from_attributes(
        "data_stream.dataset", "generic", record_attrs, scope_attrs,
        resource_attrs)
    namespace, _ = _get_from_attributes(
        "data_stream.namespace", "default", record_attrs, scope_attrs,
        resource_attrs)
    if not ds_exists:
        m = _RECEIVER_RE.search(scope_name or "")
        if m:
            dataset = m.group(1)
    suffix = ".otel" if otel_suffix else ""
    dataset = sanitize_data_stream_field(dataset, _DISALLOWED_DS, suffix)
    namespace = sanitize_data_stream_field(namespace, _DISALLOWED_NS)
    return f"{default_type}-{dataset}-{namespace}"


def _index_parts(index: str):
    """elasticsearch.Index IsDataStream: type-dataset-namespace."""
    parts = index.split("-")
    if len(parts) >= 3 and parts[0] in ("logs", "metrics", "traces"):
        return parts[0], parts[1], "-".join(parts[2:])
    return None


def _add_data_stream(doc: ESDoc, prefix: str, index: str):
    parts = _index_parts(index)
    if parts:
        doc.add_string(prefix + "data_stream.type", parts[0])
        doc.add_string(prefix + "data_stream.dataset", parts[1])
        doc.add_string(prefix + "data_stream.namespace", parts[2])


# --- encoders ------------------------------------------------------------

def _ecs_attrs(doc: ESDoc, attrs: dict, conversion: dict):
    if not conversion:
        doc.add_attributes("", attrs)
        return
    for k, v in attrs.items():
        if k in conversion:
            ecs_key = conversion[k]
            if ecs_key == "":
                continue
            doc.add_attribute(ecs_key, v)
            if k in _RESOURCE_PRESERVE:
                doc.add_attribute(k, v)
            continue
        doc.add_attribute(k, v)


def _ecs_agent(doc: ESDoc, res: dict):
    sdk_name = res.get("telemetry.sdk.name") or "otlp"
    lang = res.get("telemetry.sdk.language") or ""
    distro = res.get("telemetry.distro.name") or ""
    if distro and not lang:
        lang = "unknown"
    name = sdk_name
    if distro:
        name = f"{name}/{lang}/{distro}"
    elif lang:
        name = f"{name}/{lang}"
    doc.add_string("agent.name", name)
    ver = res.get("telemetry.distro.version") or \
        res.get("telemetry.sdk.version")
    if ver:
        doc.add_string("agent.version", str(ver))


def _ecs_host_os_type(doc: ESDoc, res: dict):
    t = ""
    os_type = res.get("os.type")
    if os_type in ("windows", "linux"):
        t = os_type
    elif os_type == "darwin":
        t = "macos"
    elif os_type in ("aix", "hpux", "solaris"):
        t = "unix"
    os_name = res.get("os.name")
    if os_name == "Android":
        t = "android"
    elif os_name == "iOS":
        t = "ios"
    if t:
        doc.add_string("host.os.type", t)


def _scope_attrs_map(scope_name, scope_version, scope_attrs: dict) -> dict:
    m = dict(scope_attrs)
    m["name"] = scope_name or ""
    m["version"] = scope_version or ""
    return m


def encode_log_doc(mode: str, *, body, time_unix_nano, observed_ns,
                   severity_number, severity_text, trace_id, span_id,
                   flags, attrs: dict, resource: dict,
                   scope_name, scope_version, scope_attrs: dict,
                   index: str) -> str:
    """One flat log row → ES document JSON (modes none/raw/ecs/bodymap;
    bodymap raises ValueError on a non-map body)."""
    if mode == "bodymap":
        if not isinstance(body, dict):
            raise ValueError(
                "invalid log record body type for 'bodymap' mapping mode")
        return json.dumps(body, ensure_ascii=False,
                          separators=(",", ":"))
    doc = ESDoc()
    if mode in ("none", "raw"):
        prefix = "Attributes" if mode == "none" else ""
        ts = time_unix_nano or observed_ns or 0
        doc.add_timestamp("@timestamp", ts)
        doc.add_id("TraceId", trace_id, 32)
        doc.add_id("SpanId", span_id, 16)
        doc.add_int("TraceFlags", flags or 0)
        doc.add_string("SeverityText", severity_text)
        doc.add_int("SeverityNumber", severity_number or 0)
        doc.add_attribute("Body", body)
        doc.add_attributes("Resource", resource)
        doc.add_attributes("Scope", _scope_attrs_map(
            scope_name, scope_version, scope_attrs))
        doc.add_attributes(prefix, attrs)
        _add_data_stream(doc, prefix and prefix + ".", index)
        return doc.serialize(False)
    if mode != "ecs":
        raise ValueError(f"unknown mapping mode {mode!r}")
    _ecs_attrs(doc, resource, _RESOURCE_ECS)
    _ecs_attrs(doc, scope_attrs, {})
    _ecs_attrs(doc, attrs, _RECORD_ECS)
    _add_data_stream(doc, "", index)
    _ecs_agent(doc, resource)
    _ecs_host_os_type(doc, resource)
    doc.add_timestamp("@timestamp", time_unix_nano or observed_ns or 0)
    doc.add_id("trace.id", trace_id, 32)
    doc.add_id("span.id", span_id, 16)
    if severity_number:
        doc.add_int("event.severity", severity_number)
    doc.add_string("log.level", severity_text)
    if isinstance(body, str):
        doc.add_attribute("message", body)
    return doc.serialize(True)


def encode_span_doc(mode: str, row: dict, index: str) -> str:
    """One flat span row (zipkin._COLS shape) → ES document JSON."""
    attrs = json.loads(row.get("attributes") or "{}")
    resource = json.loads(row.get("resource_attributes") or "{}")
    links = json.loads(row.get("links") or "[]")
    events = json.loads(row.get("events") or "[]")
    start = row.get("start_time_unix_nano") or 0
    end = row.get("end_time_unix_nano") or 0
    doc = ESDoc()
    if mode in ("none", "raw"):
        prefix = "Attributes" if mode == "none" else ""
        eprefix = "Events" if mode == "none" else ""
        doc.add_timestamp("@timestamp", start)
        doc.add_timestamp("EndTimestamp", end)
        doc.add_id("TraceId", row.get("trace_id"), 32)
        doc.add_id("SpanId", row.get("span_id"), 16)
        doc.add_id("ParentSpanId", row.get("parent_span_id"), 16)
        doc.add_string("Name", row.get("span_name"))
        doc.add_string("Kind",
                       _SPAN_KIND_STR.get(row.get("span_kind") or 0, ""))
        doc.add_int("TraceStatus", row.get("status_code") or 0)
        doc.add_string("TraceStatusDescription",
                       row.get("status_message") or "")
        link_arr = [{"spanID": lk.get("spanId") or "",
                     "traceID": lk.get("traceId") or "",
                     "attribute": lk.get("attributes") or {}}
                    for lk in links]
        # Go json.Marshal of map[string]any sorts keys
        doc.add_string("Link", json.dumps(link_arr, sort_keys=True,
                                          separators=(",", ":")))
        doc.add_attributes("Resource", resource)
        doc.add_int("Duration", (end - start) // 1000)
        doc.add_attributes("Scope", _scope_attrs_map(
            row.get("scope_name"), row.get("scope_version"), {}))
        doc.add_attributes(prefix, attrs)
        _add_data_stream(doc, prefix and prefix + ".", index)
        for ev in events:
            name = ev.get("name") or ""
            doc.add_timestamp(_flatten_key(eprefix, name + ".time"),
                              ev.get("timeUnixNano") or 0)
            doc.add_attributes(_flatten_key(eprefix, name),
                               ev.get("attributes") or {})
        return doc.serialize(False)
    if mode != "ecs":
        raise ValueError(f"unknown mapping mode {mode!r}")
    _ecs_attrs(doc, resource, _RESOURCE_ECS)
    _ecs_attrs(doc, attrs, {})
    _ecs_host_os_type(doc, resource)
    _add_data_stream(doc, "", index)
    doc.add_timestamp("@timestamp", start)
    doc.add_id("trace.id", row.get("trace_id"), 32)
    doc.add_id("span.id", row.get("span_id"), 16)
    doc.add_string("span.name", row.get("span_name"))
    doc.add_id("parent.id", row.get("parent_span_id"), 16)
    code = row.get("status_code") or 0
    if code == 1:
        doc.add_string("event.outcome", "success")
    elif code == 2:
        doc.add_string("event.outcome", "failure")
    if links:
        link_vals = []
        for lk in links:
            ld = ESDoc()
            ld.add_id("trace_id", lk.get("traceId"), 32)
            ld.add_id("span_id", lk.get("spanId"), 16)
            link_vals.append(ld)
        doc.add("span.links", link_vals)
    return doc.serialize(True)


# --- Ray stages ----------------------------------------------------------

class _LogsToES:
    def __init__(self, mode, cols, static_index, on_error):
        self.mode = mode
        self.cols = cols
        self.static_index = static_index
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.cols
        n = batch.num_rows

        def col(name):
            cn = c.get(name)
            if cn and cn in batch.column_names:
                return batch.column(cn).to_pylist()
            return [None] * n

        bodies = col("body")
        times = col("time_unix_nano")
        observed = col("observed_time_unix_nano")
        sev_n = col("severity_number")
        sev_t = col("severity_text")
        tids = col("trace_id")
        sids = col("span_id")
        flags = col("flags")
        attrs = col("attributes")
        res = col("resource_attributes")
        sname = col("scope_name")
        sver = col("scope_version")
        sattrs = col("scope_attributes")
        parent, indexes, docs, errors = [], [], [], []
        for i in range(n):
            try:
                a = json.loads(attrs[i]) if attrs[i] else {}
                r = json.loads(res[i]) if res[i] else {}
                sa = json.loads(sattrs[i]) if sattrs[i] else {}
                body = bodies[i]
                if self.mode == "bodymap" and isinstance(body, str):
                    try:
                        parsed = json.loads(body)
                    except ValueError:
                        parsed = body
                    body = parsed
                index = route_record(a, sa, r, sname[i] or "", "logs",
                                     static_index=self.static_index)
                doc = encode_log_doc(
                    self.mode, body=body, time_unix_nano=times[i],
                    observed_ns=observed[i],
                    severity_number=sev_n[i], severity_text=sev_t[i],
                    trace_id=tids[i], span_id=sids[i], flags=flags[i],
                    attrs=a, resource=r, scope_name=sname[i],
                    scope_version=sver[i], scope_attrs=sa, index=index)
            except ValueError as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                indexes.append(None)
                docs.append(None)
                errors.append(str(e))
                continue
            parent.append(i)
            indexes.append(index)
            docs.append(doc)
            errors.append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        out = out.append_column("es_index", pa.array(indexes, pa.string()))
        out = out.append_column("es_doc", pa.array(docs, pa.string()))
        if self.on_error != "drop":
            out = out.append_column("error", pa.array(errors, pa.string()))
        return out


_DEFAULT_LOG_COLS = {
    "body": "body", "time_unix_nano": "time_unix_nano",
    "observed_time_unix_nano": "observed_time_unix_nano",
    "severity_number": "severity_number",
    "severity_text": "severity_text", "trace_id": "trace_id",
    "span_id": "span_id", "flags": "flags", "attributes": "attributes",
    "resource_attributes": "resource_attributes",
    "scope_name": "scope_name", "scope_version": "scope_version",
    "scope_attributes": "scope_attributes",
}


def logs_to_elasticsearch(ds, mode: str = "ecs", *,
                          cols: dict | None = None,
                          static_index: str | None = None,
                          on_error: str = "drop"):
    """Flat log rows → (es_index, es_doc) bulk pairs (block-local,
    zero shuffle).  ``cols`` remaps input column names."""
    merged = dict(_DEFAULT_LOG_COLS)
    if cols:
        merged.update(cols)
    return ds.map_batches(_LogsToES(mode, merged, static_index, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


class _SpansToES:
    def __init__(self, mode, static_index):
        self.mode = mode
        self.static_index = static_index

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        indexes, docs = [], []
        for row in rows:
            attrs = json.loads(row.get("attributes") or "{}")
            res = json.loads(row.get("resource_attributes") or "{}")
            index = route_record(attrs, {}, res,
                                 row.get("scope_name") or "", "traces",
                                 static_index=self.static_index)
            indexes.append(index)
            docs.append(encode_span_doc(self.mode, row, index))
        out = batch.append_column("es_index",
                                  pa.array(indexes, pa.string()))
        return out.append_column("es_doc", pa.array(docs, pa.string()))


def spans_to_elasticsearch(ds, mode: str = "ecs", *,
                           static_index: str | None = None):
    """Flat span rows (zipkin._COLS shape) → (es_index, es_doc) pairs."""
    return ds.map_batches(_SpansToES(mode, static_index),
                          batch_format="pyarrow", zero_copy_batch=True)
