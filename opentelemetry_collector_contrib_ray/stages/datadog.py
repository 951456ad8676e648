"""datadogsemanticsprocessor: Datadog-convention span attributes.

Reference semantics (processor/datadogsemanticsprocessor/processor.go):

- ``insertAttrIfMissingOrShouldOverride`` (:20-32): derived values are
  written only where the attribute is MISSING unless
  ``override_incoming_datadog_fields`` (config default false) is set.
- ``datadog.service`` = non-empty ``service.name`` else the documented
  ``otlpresourcenoservicename`` default; ``datadog.version`` =
  ``service.version`` else ""; ``datadog.env`` = non-empty deployment
  environment else ``default`` (:42-63).
- ``datadog.span.kind`` = lowercase span-kind name; ``datadog.error`` =
  1 iff status code is ERROR, with ``datadog.error.msg`` falling back
  to the status message (status2Error, :169-207 — the exception-event
  scan applies when event columns exist; the flat model carries the
  status fallback).
- ``datadog.http_status_code`` = stringified status code when non-zero
  (:136-141; ``http.response.status_code`` with the pre-1.23
  ``http.status_code`` fallback).
- ``git.commit.sha`` from ``vcs.ref.head.revision``;
  ``git.repository_url`` = ``vcs.repository.url.full`` with the URL
  scheme stripped (stripProtocolFromURL, :210-219 — Go url.Parse +
  TrimPrefix(scheme + "://"), restated as an anchored scheme regex).

The operation/resource-name helpers (GetOTelOperationNameV2 /
GetOTelResourceV2) live in the external datadog-agent library, not in
the reference tree; their documented fallback — the span name — stands
in for them here (``datadog.name``).

Flat-column model: dotted attribute names map to ``_``-joined columns.
One vectorized map_batches — block-local, zero shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

NO_SERVICE = "otlpresourcenoservicename"
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"

SPAN_KIND_NAMES = {
    0: "unspecified", 1: "internal", 2: "server",
    3: "client", 4: "producer", 5: "consumer",
}


def strip_protocol(col):
    """stripProtocolFromURL over a string column (anchored scheme regex =
    url.Parse scheme grammar; unparsable strings pass through, as Go)."""
    return pc.replace_substring_regex(col, _SCHEME_RE, "",
                                      max_replacements=1)


class DatadogSemantics:
    """Batch callable deriving the datadog.* / git.* columns.

    ``columns`` maps semantic inputs to column names; any may be absent
    from the batch (treated as all-missing). Existing ``datadog_*``
    output columns are honored per insertAttrIfMissingOrShouldOverride.
    """

    def __init__(
        self,
        service_col: str = "service_name",
        version_col: str = "service_version",
        env_col: str = "deployment_environment",
        name_col: str = "name",
        kind_col: str = "span_kind",
        status_code_col: str = "status_code",
        status_msg_col: str = "status_message",
        http_status_col: str = "http_response_status_code",
        http_status_fallback_col: str = "http_status_code",
        vcs_revision_col: str = "vcs_ref_head_revision",
        vcs_repo_col: str = "vcs_repository_url_full",
        override_incoming: bool = False,
    ):
        self.c = dict(
            service=service_col, version=version_col, env=env_col,
            name=name_col, kind=kind_col, status=status_code_col,
            status_msg=status_msg_col, http=http_status_col,
            http_fb=http_status_fallback_col, vcs_rev=vcs_revision_col,
            vcs_repo=vcs_repo_col)
        self.override = override_incoming

    def _get(self, batch, key):
        name = self.c[key]
        if name in batch.column_names:
            col = batch.column(name)
            return col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
        return None

    def _put(self, batch, out_name, derived):
        """insertAttrIfMissingOrShouldOverride on a flat column: without
        override, keep the incoming value where present; with override,
        the derived value wins wherever it was actually derived (a null
        derived value = "no insert happened for this row" — the
        conditional vcs/http inserts), the incoming value survives
        elsewhere."""
        if out_name in batch.column_names:
            old = batch.column(out_name)
            if isinstance(old, pa.ChunkedArray):
                old = old.combine_chunks()
            old = old.cast(derived.type if not isinstance(derived, pa.ChunkedArray)
                           else derived.combine_chunks().type)
            if self.override:
                merged = pc.if_else(pc.is_valid(derived), derived, old)
            else:
                merged = pc.if_else(pc.is_valid(old), old, derived)
            i = batch.column_names.index(out_name)
            return batch.set_column(i, out_name, merged)
        return batch.append_column(out_name, derived)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.scalar("", pa.string())

        def nonempty_or(col, default):
            if col is None:
                return pa.array([default] * n, pa.string())
            s = col.cast(pa.string())
            ok = pc.and_(pc.is_valid(s), pc.not_equal(
                pc.fill_null(s, ""), ""))
            return pc.if_else(ok, s, pa.scalar(default, pa.string()))

        svc = nonempty_or(self._get(batch, "service"), NO_SERVICE)
        ver = self._get(batch, "version")
        ver = (pc.fill_null(ver.cast(pa.string()), "") if ver is not None
               else pa.array([""] * n, pa.string()))
        env = nonempty_or(self._get(batch, "env"), "default")

        batch = self._put(batch, "datadog_service", svc)
        batch = self._put(batch, "datadog_version", ver)
        batch = self._put(batch, "datadog_env", env)

        name = self._get(batch, "name")
        if name is not None:
            batch = self._put(batch, "datadog_name",
                              name.cast(pa.string()))

        kind = self._get(batch, "kind")
        if kind is not None:
            k = kind.cast(pa.int64())
            names = pa.array([SPAN_KIND_NAMES[i] for i in range(6)])
            idx = pc.if_else(
                pc.and_(pc.greater_equal(k, 0), pc.less_equal(k, 5)),
                k, pa.scalar(0, pa.int64()))
            batch = self._put(batch, "datadog_span_kind",
                              pc.take(names, pc.fill_null(idx, 0)))

        http = self._get(batch, "http")
        http_fb = self._get(batch, "http_fb")
        code = None
        if http is not None and http_fb is not None:
            code = pc.coalesce(http.cast(pa.int64()),
                               http_fb.cast(pa.int64()))
        elif http is not None:
            code = http.cast(pa.int64())
        elif http_fb is not None:
            code = http_fb.cast(pa.int64())
        if code is not None:
            nz = pc.and_(pc.is_valid(code),
                         pc.not_equal(pc.fill_null(code, 0), 0))
            batch = self._put(
                batch, "datadog_http_status_code",
                pc.if_else(nz, pc.cast(code, pa.string()),
                           pa.scalar(None, pa.string())))

        status = self._get(batch, "status")
        if status is not None:
            is_err = pc.equal(pc.fill_null(status.cast(pa.int64()), 0), 2)
            batch = self._put(
                batch, "datadog_error",
                pc.if_else(is_err, pa.scalar(1, pa.int64()),
                           pa.scalar(0, pa.int64())))
            msg = self._get(batch, "status_msg")
            msg = (pc.fill_null(msg.cast(pa.string()), "")
                   if msg is not None else pa.array([""] * n, pa.string()))
            batch = self._put(
                batch, "datadog_error_msg",
                pc.if_else(is_err, msg, pa.scalar(None, pa.string())))

        rev = self._get(batch, "vcs_rev")
        if rev is not None:
            batch = self._put(
                batch, "git_commit_sha",
                pc.if_else(pc.is_valid(rev), rev.cast(pa.string()),
                           pa.scalar(None, pa.string())))
        repo = self._get(batch, "vcs_repo")
        if repo is not None:
            s = repo.cast(pa.string())
            batch = self._put(
                batch, "git_repository_url",
                pc.if_else(pc.is_valid(s), strip_protocol(
                    pc.fill_null(s, empty)), pa.scalar(None, pa.string())))
        return batch


# --- datadogreceiver series/service-check decode (round 5) ---------------
#
# receiver/datadogreceiver/internal/translator (series.go:55-118,
# service_check_translator.go:16-50, tags.go, batcher.go):
#
# - v1 series JSON {"series":[{metric,type,interval,points:[[ts,val]..],
#   tags,host}]}: count → delta non-monotonic Sum, rate → delta Sum with
#   value × interval (when set), gauge → Gauge, unset/unknown type
#   skipped; malformed points (≠2 elements / nulls) skipped; Datadog
#   second timestamps → ns.
# - tags (tags.go:82-186): "key:value" cut on the FIRST colon; a bare
#   tag becomes key "unnamed_<tag>" with the tag as value; keys in the
#   datadogKnownResourceAttributes table land as RESOURCE attributes
#   under their OTel names (container.image.tags and the
#   http.{request,response}.headers.* dynamic keys become string[]
#   slices), everything else is a DATAPOINT attribute (after the
#   header-prefix rewrite); host → the host.name resource attr.
# - service checks: one gauge int point per check, value = status enum
#   (0 OK, 1 WARNING, 2 CRITICAL, 3 UNKNOWN), dimensions via the same
#   tag machinery with type "service_check".
# - the translator's start-timestamp stream state
#   (streamHasTimestamp/updateLastTsForStream) chains WITHIN the
#   decoded payload here: a stream's 2nd..Nth points get
#   start_time = the previous point's timestamp (the cross-request
#   memory is the collector-process lifetime — out of scope for a
#   batch decode, documented).
#
# Flat rows match the opencensus metric-point columns
# (metric_name/metric_type/temporality/monotonic/times/value/attrs).

_DD_KNOWN_RESOURCE = {
    "env": "deployment.environment.name",
    "service": "service.name",
    "version": "service.version",
    "container_id": "container.id",
    "container_name": "container.name",
    "image_name": "container.image.name",
    "image_tag": "container.image.tags",
    "runtime": "container.runtime",
    "cloud_provider": "cloud.provider",
    "region": "cloud.region",
    "zone": "cloud.availability_zone",
    "task_family": "aws.ecs.task.family",
    "task_arn": "aws.ecs.task.arn",
    "ecs_cluster_name": "aws.ecs.cluster.arn",
    "task_version": "aws.ecs.task.revision",
    "ecs_container_name": "aws.ecs.container.arn",
    "kube_container_name": "k8s.container.name",
    "kube_cluster_name": "k8s.cluster.name",
    "kube_deployment": "k8s.deployment.name",
    "kube_replica_set": "k8s.replicaset.name",
    "kube_stateful_set": "k8s.statefulset.name",
    "kube_daemon_set": "k8s.daemonset.name",
    "kube_job": "k8s.job.name",
    "kube_cronjob": "k8s.cronjob.name",
    "kube_namespace": "k8s.namespace.name",
    "pod_name": "k8s.pod.name",
    "http.client_ip": "client.address",
    "http.response.content_length": "http.response.body.size",
    "http.status_code": "http.response.status_code",
    "http.request.content_length": "http.request.body.size",
    "http.referer": "http.request.header.referer",
    "http.method": "http.request.method",
    "http.route": "http.route",
    "http.version": "network.protocol.version",
    "http.server_name": "server.address",
    "http.url": "url.full",
    "http.useragent": "user_agent.original",
    "db.type": "db.system.name",
    "db.operation": "db.operation.name",
    "db.instance": "db.collection.name",
    "db.pool.name": "db.client.connection.pool.name",
    "process_id": "process.pid",
    "error.stacktrace": "exception.stacktrace",
    "error.msg": "exception.message",
}


def _dd_tag_kv(tag: str):
    if tag == "":
        return "", ""
    key, sep, val = tag.partition(":")
    if not sep:
        return "unnamed_" + tag, tag
    return key, val


def _dd_key_to_otel(k: str) -> str:
    lk = k.lower()
    if lk in _DD_KNOWN_RESOURCE:
        return _DD_KNOWN_RESOURCE[lk]
    if k.startswith("http.response.headers."):
        return "http.response.header." + k[len("http.response.headers."):]
    if k.startswith("http.request.headers."):
        return "http.request.header." + k[len("http.request.headers."):]
    return k


def dd_tags_to_attributes(tags, host):
    """tags.go tagsToAttributes → (resource attrs, datapoint attrs)."""
    resource: dict = {}
    dp: dict = {}
    if host:
        resource["host.name"] = host
    for tag in tags or []:
        key, val = _dd_tag_kv(tag)
        known = _DD_KNOWN_RESOURCE.get(key.lower())
        if known is not None:
            if known == "container.image.tags":
                resource[known] = [val]
            else:
                resource[known] = val
            continue
        key = _dd_key_to_otel(key)
        if key.startswith(("http.request.header.",
                           "http.response.header.")):
            resource[key] = [val]
        else:
            dp[key] = val
    return resource, dp


_DD_TYPES = {"count": ("sum", 1, False), "rate": ("sum", 1, False),
             "gauge": ("gauge", 0, False)}


def dd_series_rows(doc: dict) -> list[dict]:
    """TranslateSeriesV1 over one payload → flat point rows."""
    rows = []
    last_ts: dict = {}
    for serie in doc.get("series") or []:
        styp = serie.get("type") or ""
        if styp not in _DD_TYPES:
            continue            # unset/unknown type
        mtype, temp, mono = _DD_TYPES[styp]
        resource, dp_attrs = dd_tags_to_attributes(
            serie.get("tags"), serie.get("host"))
        res_json = json.dumps(resource, sort_keys=True)
        dp_json = json.dumps(dp_attrs, sort_keys=True)
        name = serie.get("metric") or ""
        interval = serie.get("interval")
        stream_key = (name, styp, res_json, dp_json)
        for point in serie.get("points") or []:
            if not isinstance(point, list) or len(point) != 2 or \
                    point[0] is None or point[1] is None:
                continue
            ts = int(float(point[0]))
            value = float(point[1])
            if styp == "rate" and interval is not None:
                value *= float(interval)
            ts_ns = ts * 1_000_000_000
            start = last_ts.get(stream_key, 0)
            last_ts[stream_key] = ts_ns
            rows.append({
                "metric_name": name, "metric_type": mtype,
                "aggregation_temporality": temp, "is_monotonic": mono,
                "start_time_unix_nano": start, "time_unix_nano": ts_ns,
                "value_double": value, "value_int": None,
                "attributes": dp_json,
                "resource_attributes": res_json})
    return rows


def dd_service_check_rows(doc) -> list[dict]:
    """TranslateServices over one payload (a JSON array of checks)."""
    rows = []
    for svc in doc or []:
        resource, dp_attrs = dd_tags_to_attributes(
            svc.get("tags"), svc.get("host_name"))
        ts_ns = int(svc.get("timestamp") or 0) * 1_000_000_000
        rows.append({
            "metric_name": svc.get("check") or "",
            "metric_type": "gauge", "aggregation_temporality": 0,
            "is_monotonic": False, "start_time_unix_nano": 0,
            "time_unix_nano": ts_ns, "value_double": None,
            "value_int": int(svc.get("status") or 0),
            "attributes": json.dumps(dp_attrs, sort_keys=True),
            "resource_attributes": json.dumps(resource, sort_keys=True)})
    return rows


_DD_COLS = (("metric_name", pa.string()), ("metric_type", pa.string()),
            ("aggregation_temporality", pa.int64()),
            ("is_monotonic", pa.bool_()),
            ("start_time_unix_nano", pa.int64()),
            ("time_unix_nano", pa.int64()),
            ("value_double", pa.float64()), ("value_int", pa.int64()),
            ("attributes", pa.string()),
            ("resource_attributes", pa.string()))


class _ParseDatadog:
    def __init__(self, json_col: str, kind: str, on_error: str):
        self.json_col = json_col
        self.kind = kind
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.json_col).to_pylist()
        parent, cols = [], {name: [] for name, _ in _DD_COLS}
        cols["error"] = []
        for i, doc in enumerate(docs):
            try:
                d = json.loads(doc if doc is not None else "")
                rows = (dd_series_rows(d) if self.kind == "series"
                        else dd_service_check_rows(d))
            except (ValueError, TypeError, AttributeError) as e:
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for name, _ in _DD_COLS:
                    cols[name].append(None)
                cols["error"].append(str(e) or "invalid datadog payload")
                continue
            for row in rows:
                parent.append(i)
                for name, _ in _DD_COLS:
                    cols[name].append(row[name])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in _DD_COLS + (("error", pa.string()),):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_datadog_series(ds, json_col: str = "dd_json", *,
                         on_error: str = "drop"):
    """Datadog v1 series payloads → flat metric point rows (block-local
    fan-out, zero shuffle)."""
    return ds.map_batches(_ParseDatadog(json_col, "series", on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


def parse_datadog_service_checks(ds, json_col: str = "dd_json", *,
                                 on_error: str = "drop"):
    """Datadog service-check payloads → flat gauge-int rows."""
    return ds.map_batches(_ParseDatadog(json_col, "checks", on_error),
                          batch_format="pyarrow", zero_copy_batch=True)
