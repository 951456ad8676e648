"""Config-driven pipeline builder — the collector service/builder analog.

The reference assembles receiver → processor chain → connector → exporter
DAGs from YAML (cmd/otelcontribcol/builder-config.yaml; stanza operators are
registered by type and unmarshalled from config,
pkg/stanza/operator/registry.go).  Here a plain-dict config builds a Ray
Data pipeline: a ``source`` spec, an ordered ``stages`` list (each a
registered stage type with kwargs), and a terminal ``sink`` / ``aggregate``.

The registry is the user-extension surface (SURVEY.md §2.10): register a
new stage type with :func:`register_stage` and reference it from config.

Example::

    cfg = {
        "source": {"type": "parquet", "path": f"{sf}/events.parquet",
                    "columns": ["event_id", "event_type", "value"]},
        "stages": [
            {"type": "filter", "condition": 'event_type == "error"'},
            {"type": "route", "rules": [["value > 150", "sink-big"]],
             "default_sink": "sink-small"},
        ],
        "aggregate": {"type": "count_sum", "keys": ["sink"]},
    }
    result = build_and_run(cfg)
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa

import ray.data

_TYPE_NAMES = {
    "string": pa.string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
}


def _pa_type(name: str) -> pa.DataType:
    return _TYPE_NAMES[name]


STAGE_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str):
    """Register a stage factory: (ds, **kwargs) -> ds (stanza-registry analog)."""

    def deco(fn):
        STAGE_REGISTRY[name] = fn
        return fn

    return deco


@register_stage("parse_regex")
def _parse_regex(ds, pattern: str, parse_from: str = "raw",
                 types: dict[str, str] | None = None, on_error: str = "drop",
                 keep_input: bool = False):
    from ..stages.parse import RegexParse

    t = {k: _pa_type(v) for k, v in (types or {}).items()}
    return ds.map_batches(
        RegexParse(pattern, parse_from=parse_from, types=t, on_error=on_error,
                   keep_input=keep_input),
        batch_format="pyarrow", zero_copy_batch=True,
    )


@register_stage("filter")
def _filter(ds, condition: str, drop_matches: bool = False,
            context: str | None = None):
    from ..stages.transform import filter_dataset

    if context is not None:
        from ..functions.contexts import rewrite_expr

        condition = rewrite_expr(context, condition)
    return filter_dataset(ds, condition, drop_matches=drop_matches)


@register_stage("transform")
def _transform(ds, statements: list[dict], context: str | None = None):
    """Declarative statements: {editor: set, target, value|converter+args,
    where}.  ``context`` selects an OTTL path set (span/spanevent/metric/
    datapoint/log — functions/contexts.py): paths in targets/values/wheres
    may then use the reference's spelling (``status.code``,
    ``resource.attributes``) and are translated once at build time."""
    from ..stages.transform import C, Col, Statement, set_, transform_dataset

    compiled = []
    for st in statements:
        ed = st["editor"]
        if ed == "set":
            if "converter" in st:
                args = [Col(a[4:]) if isinstance(a, str) and a.startswith("col:") else a
                        for a in st.get("args", [])]
                value = C(st["converter"], *args)
            else:
                value = st["value"]
            compiled.append(set_(st["target"], value, where=st.get("where")))
        elif ed in ("delete_keys", "keep_keys"):
            compiled.append(Statement(ed, tuple(st["columns"]), st.get("where")))
        elif ed == "rename":
            compiled.append(Statement(ed, (st["from"], st["to"])))
        else:
            raise ValueError(f"unknown declarative editor {ed!r}")
    if context is not None:
        from ..functions.contexts import with_context

        compiled = with_context(context, compiled)
    return transform_dataset(ds, compiled)


@register_stage("enrich")
def _enrich(ds, lookup: dict, key: str, use_actors: bool = False):
    from ..stages.enrich import enrich_dataset

    return enrich_dataset(ds, lookup, key=key, use_actors=use_actors)


@register_stage("route")
def _route(ds, rules: list, default_sink: str = "sink-default"):
    from ..stages.route import Route

    return ds.map_batches(
        Route([tuple(r) for r in rules], default_sink=default_sink),
        batch_format="pyarrow", zero_copy_batch=True,
    )


@register_stage("sample")
def _sample(ds, key: str, percentage: float, mode: str = "md5",
            hash_seed: int = 0):
    """``mode="md5"`` is the SQL-oracle-checkable default; ``mode="fnv"``
    is the bit-exact probabilisticsampler hash_seed mode (round 5)."""
    from ..stages.sample import sample_dataset, sample_dataset_fnv

    if mode == "fnv":
        return sample_dataset_fnv(ds, key, percentage, hash_seed=hash_seed)
    if mode != "md5":
        raise ValueError(f"sample mode must be md5|fnv, got {mode!r}")
    return sample_dataset(ds, key, percentage)


@register_stage("redact")
def _redact(ds, allowed_keys: list[str] | None = None,
            blocked_patterns: list[str] = (), summary: bool = True):
    from ..stages.redact import Redact

    return ds.map_batches(
        Redact(allowed_keys=allowed_keys, blocked_patterns=blocked_patterns,
               summary=summary),
        batch_format="pyarrow", zero_copy_batch=True,
    )


@register_stage("select")
def _select(ds, columns: list[str]):
    return ds.select_columns(columns)


@register_stage("schema_translate")
def _schema_translate(ds, schema: dict, target: str, signal: str = "logs",
                      version_col: str = "schema_url",
                      map_cols: list[str] = ("attributes",),
                      flat_cols: bool = False,
                      metric_name_col: str | None = None):
    from ..stages.schema import SchemaTransform, SchemaTranslator

    stage = SchemaTransform(SchemaTranslator(schema, target), signal=signal,
                            version_col=version_col,
                            map_cols=tuple(map_cols), flat_cols=flat_cols,
                            metric_name_col=metric_name_col)
    return ds.map_batches(stage, batch_format="pyarrow",
                          zero_copy_batch=True)


@register_stage("severity_parse")
def _severity_parse(ds, parse_from: str, preset: str = "default",
                    mapping: dict | None = None,
                    out: str = "severity_number",
                    text_out: str | None = "severity_text"):
    from ..stages.parsers import SeverityParser

    return ds.map_batches(
        SeverityParser(parse_from, preset=preset, mapping=mapping,
                       out=out, text_out=text_out),
        batch_format="pyarrow", zero_copy_batch=True,
    )


@register_stage("geoip")
def _geoip(ds, db_path: str, ip_col: str = "ip"):
    from ..stages.geo import GeoIPEnrich

    return ds.map_batches(
        GeoIPEnrich, fn_constructor_kwargs=dict(db_path=db_path, ip_col=ip_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 2), num_cpus=0.5,
    )


@register_stage("dns_lookup")
def _dns_lookup(ds, db_path: str, host_col: str = "host",
                out: str = "resolved_ip"):
    from ..stages.geo import DNSLookup

    return ds.map_batches(
        DNSLookup, fn_constructor_kwargs=dict(db_path=db_path,
                                              host_col=host_col, out=out),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 2), num_cpus=0.5,
    )


@register_stage("tail_sample")
def _tail_sample(ds, group_key: str, policies: list[dict]):
    """Declarative policy set: [{type: any_match|min_count|latency|
    status_code|ottl_condition|..., ...args}], combined with all_of."""
    from ..stages import policy as P

    built = []
    for spec in policies:
        t = spec["type"]
        if t == "any_match":
            built.append(P.policy_any_match(spec["column"], set(spec["values"])))
        elif t == "min_count":
            built.append(P.policy_min_count(spec["n"]))
        elif t == "numeric_range":
            built.append(P.policy_numeric_range(spec["column"], spec["lo"], spec["hi"]))
        elif t == "latency":
            built.append(P.policy_latency(spec["start_col"], spec["end_col"],
                                          spec["threshold_ms"],
                                          spec.get("upper_threshold_ms", 0)))
        elif t == "status_code":
            built.append(P.policy_status_code(spec["column"], spec["codes"]))
        elif t == "ottl_condition":
            built.append(P.policy_ottl_condition(spec["condition"]))
        elif t == "probabilistic":
            built.append(P.policy_hash_probabilistic(spec["key_col"], spec["percentage"]))
        else:
            raise ValueError(f"unknown tail-sampling policy type {t!r}")
    return P.tail_sample(ds, group_key, P.all_of(*built))


@register_stage("sample_mixture")
def _sample_mixture(ds, group_col: str, key: str, rates: dict,
                    default_rate: float = 0.0):
    from ..stages.sample import sample_mixture

    return sample_mixture(ds, group_col=group_col, key=key,
                          rates={k: float(v) for k, v in rates.items()},
                          default_rate=default_rate)


@register_stage("pack_sequences")
def _pack_sequences(ds, max_len: int = 2048, tokens_col: str = "tokens"):
    from ..stages.tokenstats import pack_sequences

    return pack_sequences(ds, tokens_col=tokens_col, max_len=max_len)


@register_stage("decontaminate")
def _decontaminate(ds, bench_parquet: str, bench_text_col: str = "text",
                   n: int = 3, min_overlap: int = 3,
                   text_col: str = "text", bench_filter: list | None = None):
    import pyarrow.parquet as pq

    from ..stages.decontaminate import decontaminate

    bench = pq.read_table(
        bench_parquet, columns=[bench_text_col],
        filters=[tuple(f) for f in bench_filter] if bench_filter else None,
    ).column(bench_text_col)
    import pyarrow as pa_

    if isinstance(bench, pa_.ChunkedArray):
        bench = bench.combine_chunks()
    return decontaminate(ds, bench, n=n, min_overlap=min_overlap,
                         text_col=text_col)


@register_stage("ring_route")
def _ring_route(ds, endpoints: list, key: str, out: str = "endpoint"):
    """Consistent-hash-ring endpoint assignment (round 3)."""
    from ..stages.route import RingRouter

    return ds.map_batches(RingRouter(list(endpoints), key=key, out=out),
                          batch_format="pyarrow", zero_copy_batch=True)


@register_stage("map_editors")
def _map_editors(ds, target: str, statements: list[dict]):
    """Map-column key editors: [{op: delete|keep|limit, ...}] (round 3)."""
    from ..stages.transform import (
        Transform,
        map_delete_keys,
        map_keep_keys,
        map_limit_keys,
    )

    compiled = []
    for st in statements:
        op = st["op"]
        if op == "delete":
            compiled.append(map_delete_keys(target, st["pattern"],
                                            where=st.get("where")))
        elif op == "keep":
            compiled.append(map_keep_keys(target, st["pattern"],
                                          where=st.get("where")))
        elif op == "limit":
            compiled.append(map_limit_keys(
                target, st["limit"], tuple(st.get("priority_keys", ())),
                where=st.get("where")))
        else:
            raise ValueError(f"unknown map editor op {op!r}")
    return ds.map_batches(Transform(compiled), batch_format="pyarrow",
                          zero_copy_batch=True)


@register_stage("lang_id_model")
def _lang_id_model(ds, text_col: str = "text", out: str = "lang_model",
                   model_path: str | None = None, concurrency=(1, 4)):
    """Learned language-ID model in an actor pool (round 3)."""
    from ..stages.textstats import NBCharLangModel

    return ds.map_batches(
        NBCharLangModel,
        fn_constructor_kwargs=dict(text_col=text_col, out=out,
                                   model_path=model_path),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, num_cpus=1,
    )


@register_stage("cumulative_to_delta")
def _cum_to_delta(ds, key_col: str, order_cols: list, value_col: str,
                  out_col: str = "delta_value", time_buckets: int = 8):
    """Skew-safe bucketed cumulative->delta (round 3)."""
    from ..stages.window import cumulative_to_delta_bucketed

    return cumulative_to_delta_bucketed(
        ds, key_col=key_col, order_cols=list(order_cols),
        value_col=value_col, out_col=out_col, time_buckets=time_buckets)


@register_stage("metric_start_time")
def _metric_start_time(ds, key_cols: list, order_cols: list, ts_col: str,
                       value_col: str, strategy: str = "true_reset_point",
                       reset_backoff_us: int = 1000):
    """metricstarttimeprocessor: cumulative-stream start stamping (round 5)."""
    from ..stages.starttime import metric_start_time

    return metric_start_time(
        ds, key_cols=list(key_cols), order_cols=list(order_cols),
        ts_col=ts_col, value_col=value_col, strategy=strategy,
        reset_backoff_us=reset_backoff_us)


@register_stage("start_time_metric")
def _start_time_metric(ds, name_col: str, pattern: str, key_cols: list,
                       order_cols: list, ts_col: str, value_col: str,
                       fallback_us: int = 0):
    """metricstarttimeprocessor start_time_metric strategy (round 5)."""
    from ..stages.starttime import start_time_from_metric

    return start_time_from_metric(
        ds, name_col=name_col, pattern=pattern, key_cols=list(key_cols),
        order_cols=list(order_cols), ts_col=ts_col, value_col=value_col,
        fallback_us=fallback_us)


@register_stage("coralogix_transactions")
def _coralogix_transactions(ds, trace_col: str = "trace_id",
                            span_col: str = "span_id",
                            parent_col: str = "parent_span_id",
                            name_col: str = "name",
                            kind_col: str = "span_kind",
                            start_col: str = "start_us"):
    """coralogixprocessor transactions feature (round 5)."""
    from ..stages.coralogix import transaction_attributes

    return transaction_attributes(
        ds, trace_col=trace_col, span_col=span_col, parent_col=parent_col,
        name_col=name_col, kind_col=kind_col, start_col=start_col)


@register_stage("remote_tap")
def _remote_tap(ds, ts_col: str, order_cols: list, limit: int = 1,
                window_us: int = 1_000_000):
    """remotetapprocessor: pass-through + rate-limited tap; the STAGE
    output is the pass-through stream (the reference topology); use
    stages.tap.remote_tap directly to consume the tapped side."""
    from ..stages.tap import remote_tap

    passthrough, _tapped = remote_tap(
        ds, ts_col=ts_col, order_cols=list(order_cols), limit=limit,
        window_us=window_us)
    return passthrough


@register_stage("sumologic")
def _sumologic(ds, map_col: str = "attributes",
               add_cloud_namespace: bool = True,
               translate_attributes: bool = True):
    """sumologicprocessor: cloud namespace + attribute translation (round 5)."""
    from ..stages.sumologic import SumoLogic

    return ds.map_batches(
        SumoLogic(map_col=map_col, add_cloud_namespace=add_cloud_namespace,
                  translate_attributes=translate_attributes),
        batch_format="pyarrow", zero_copy_batch=True)


@register_stage("parse_statsd")
def _parse_statsd(ds, line_col: str = "line", **kwargs):
    """statsdreceiver line parse (round 5)."""
    from ..stages.statsd import parse_statsd

    return parse_statsd(ds, line_col, **kwargs)


@register_stage("statsd_aggregate")
def _statsd_aggregate(ds, line_col: str = "line",
                      order_col: str = "order", **kwargs):
    """statsdreceiver counter/gauge interval aggregation (round 5)."""
    from ..stages.statsd import statsd_aggregate

    return statsd_aggregate(ds, line_col, order_col, **kwargs)


@register_stage("parse_carbon")
def _parse_carbon(ds, line_col: str = "line", on_error: str = "drop"):
    """carbonreceiver Graphite plaintext parse (round 5)."""
    from ..stages.carbon import parse_carbon

    return parse_carbon(ds, line_col, on_error=on_error)


@register_stage("datadog_semantics_naming")
def _datadog_semantics_naming(ds, **kwargs):
    """datadogsemanticsprocessor attr-map variant with the
    datadog-agent naming restatements (round 5)."""
    from ..stages.ddsemantics import datadog_semantics

    return datadog_semantics(ds, **kwargs)


@register_stage("to_zipkin")
def _to_zipkin(ds, **kwargs):
    """zipkinexporter v2 JSON encode (round 5)."""
    from ..stages.zipkinout import spans_to_zipkin

    return spans_to_zipkin(ds, **kwargs)


@register_stage("to_sumologic_prom")
def _to_sumologic_prom(ds, **kwargs):
    """sumologicexporter prometheus metric format (round 5)."""
    from ..stages.sumologicout import metrics_to_sumologic_prometheus

    return metrics_to_sumologic_prometheus(ds, **kwargs)


@register_stage("to_sumologic_logs")
def _to_sumologic_logs(ds, **kwargs):
    """sumologicexporter text/json log format (round 5)."""
    from ..stages.sumologicout import logs_to_sumologic

    return logs_to_sumologic(ds, **kwargs)


@register_stage("parse_prw")
def _parse_prw(ds, body_col: str = "body", **kwargs):
    """prometheusremotewritereceiver writev2 decode (round 5)."""
    from ..stages.prwreceive import parse_prometheus_remote_write

    return parse_prometheus_remote_write(ds, body_col, **kwargs)


@register_stage("to_carbon")
def _to_carbon(ds, **kwargs):
    """carbonexporter plaintext line rendering (round 5)."""
    from ..stages.carbonout import metrics_to_carbon

    return metrics_to_carbon(ds, **kwargs)


@register_stage("parse_collectd")
def _parse_collectd(ds, json_col: str = "record",
                    default_labels: dict | None = None):
    """collectdreceiver JSON decode (round 5)."""
    from ..stages.collectdjson import parse_collectd

    return parse_collectd(ds, json_col, default_labels=default_labels)


@register_stage("parse_wavefront")
def _parse_wavefront(ds, line_col: str = "line", on_error: str = "drop",
                     extract_collectd_tags: bool = False):
    """wavefrontreceiver data-format parse (round 5)."""
    from ..stages.wavefront import parse_wavefront

    return parse_wavefront(ds, line_col, on_error=on_error,
                           extract_collectd_tags=extract_collectd_tags)


@register_stage("parse_influx")
def _parse_influx(ds, line_col: str = "line", precision: str = "ns",
                  on_error: str = "drop"):
    """influxdbreceiver line-protocol decode + untyped fan-out (round 5)."""
    from ..stages.influx import parse_influx

    return parse_influx(ds, line_col, precision=precision,
                        on_error=on_error)


@register_stage("parse_splunk_hec")
def _parse_splunk_hec(ds, json_col: str = "event_json",
                      signal: str = "logs", on_error: str = "drop"):
    """splunkhecreceiver event decode, logs or metrics path (round 5)."""
    from ..stages.splunkhec import (
        parse_splunk_hec_logs,
        parse_splunk_hec_metrics,
    )

    fn = (parse_splunk_hec_metrics if signal == "metrics"
          else parse_splunk_hec_logs)
    return fn(ds, json_col, on_error=on_error)


@register_stage("to_splunk_hec")
def _to_splunk_hec(ds, **kwargs):
    """splunkhecexporter log→HEC envelope encode (round 5)."""
    from ..stages.splunkhec import logs_to_splunk_hec

    return logs_to_splunk_hec(ds, **kwargs)


@register_stage("parse_loki_push")
def _parse_loki_push(ds, json_col: str = "push_json",
                     keep_timestamp: bool = True,
                     on_error: str = "drop"):
    """lokireceiver push-request decode (round 5)."""
    from ..stages.loki import parse_loki_push

    return parse_loki_push(ds, json_col, keep_timestamp=keep_timestamp,
                           on_error=on_error)


@register_stage("to_loki_push")
def _to_loki_push(ds, **kwargs):
    """lokiexporter logs→push-request encode (round 5)."""
    from ..stages.loki import logs_to_loki_push

    return logs_to_loki_push(ds, **kwargs)


@register_stage("parse_prometheus_text")
def _parse_prometheus_text(ds, text_col: str = "exposition",
                           on_error: str = "drop"):
    """prometheus text exposition decode (round 5)."""
    from ..stages.prometheus import parse_prometheus_text

    return parse_prometheus_text(ds, text_col, on_error=on_error)


@register_stage("normalize_prom_names")
def _normalize_prom_names(ds, **kwargs):
    """pkg/translator/prometheus BuildCompliantName column (round 5)."""
    from ..stages.prometheus import normalize_prom_names

    return normalize_prom_names(ds, **kwargs)


@register_stage("parse_zipkin")
def _parse_zipkin(ds, json_col: str = "spans_json",
                  parse_string_tags: bool = False,
                  on_error: str = "drop"):
    """zipkin v2 JSON span decode → flat span rows (round 5)."""
    from ..stages.zipkin import parse_zipkin_spans

    return parse_zipkin_spans(ds, json_col,
                              parse_string_tags=parse_string_tags,
                              on_error=on_error)


@register_stage("parse_jaeger")
def _parse_jaeger(ds, json_col: str = "batch_json",
                  on_error: str = "drop"):
    """jaeger model.Batch JSON span decode → flat span rows (round 5)."""
    from ..stages.jaeger import parse_jaeger_batches

    return parse_jaeger_batches(ds, json_col, on_error=on_error)


@register_stage("parse_fluent")
def _parse_fluent(ds, bin_col: str = "event_msgpack",
                  on_error: str = "drop"):
    """fluentforwardreceiver msgpack event decode (round 5)."""
    from ..stages.fluentforward import parse_fluent_events

    return parse_fluent_events(ds, bin_col, on_error=on_error)


@register_stage("parse_faro")
def _parse_faro(ds, json_col: str = "payload_json",
                on_error: str = "drop"):
    """faroreceiver payload decode → flat log rows (round 5)."""
    from ..stages.faro import parse_faro_payloads

    return parse_faro_payloads(ds, json_col, on_error=on_error)


@register_stage("faro_traces")
def _faro_traces(ds, json_col: str = "payload_json"):
    """faro payload embedded-OTLP traces decode (round 5)."""
    from ..stages.faro import parse_faro_traces

    return parse_faro_traces(ds, json_col)


@register_stage("to_faro")
def _to_faro(ds, body_col: str = "body", max_items: int = 8192):
    """faroexporter: flat log rows → faro payload JSON (round 5)."""
    from ..stages.faro import logs_to_faro_payloads

    return logs_to_faro_payloads(ds, body_col, max_items=max_items)


@register_stage("parse_oc_traces")
def _parse_oc_traces(ds, json_col: str = "oc_json",
                     on_error: str = "drop"):
    """opencensusreceiver trace batch decode (round 5)."""
    from ..stages.opencensus import parse_oc_traces

    return parse_oc_traces(ds, json_col, on_error=on_error)


@register_stage("parse_oc_metrics")
def _parse_oc_metrics(ds, json_col: str = "oc_json",
                      on_error: str = "drop"):
    """opencensusreceiver metric batch decode (round 5)."""
    from ..stages.opencensus import parse_oc_metrics

    return parse_oc_metrics(ds, json_col, on_error=on_error)


@register_stage("to_oc_traces")
def _to_oc_traces(ds, group_col: str = "event_id"):
    """opencensusexporter: flat span rows → OC batch docs (round 5)."""
    from ..stages.opencensus import spans_to_oc

    return spans_to_oc(ds, group_col)


@register_stage("to_oc_metrics")
def _to_oc_metrics(ds, group_col: str = "event_id"):
    """opencensusexporter: flat metric rows → OC batch docs (round 5)."""
    from ..stages.opencensus import metrics_to_oc

    return metrics_to_oc(ds, group_col)


@register_stage("to_elasticsearch_logs")
def _to_elasticsearch_logs(ds, mode: str = "ecs",
                           static_index: str = None,
                           on_error: str = "drop", **cols):
    """elasticsearchexporter log documents (round 5)."""
    from ..stages.elasticsearch import logs_to_elasticsearch

    return logs_to_elasticsearch(ds, mode, cols=cols or None,
                                 static_index=static_index,
                                 on_error=on_error)


@register_stage("to_elasticsearch_spans")
def _to_elasticsearch_spans(ds, mode: str = "ecs",
                            static_index: str = None):
    """elasticsearchexporter span documents (round 5)."""
    from ..stages.elasticsearch import spans_to_elasticsearch

    return spans_to_elasticsearch(ds, mode, static_index=static_index)


@register_stage("to_emf")
def _to_emf(ds, **config):
    """awsemfexporter EMF log events (round 5)."""
    from ..stages.awsemf import metrics_to_emf

    return metrics_to_emf(ds, **config)


@register_stage("url_filter")
def _url_filter(ds, url_col: str = "url", blocklist=(), mode="drop"):
    """URL/domain blocklist filter (training-data operator, round 5)."""
    from ..stages.urlfilter import filter_urls

    return filter_urls(ds, url_col, blocklist=blocklist, mode=mode)


@register_stage("parse_gitlab")
def _parse_gitlab(ds, json_col: str = "event_json",
                  on_error: str = "drop"):
    """gitlabreceiver pipeline webhook decode (round 5)."""
    from ..stages.gitlabrx import parse_gitlab_events

    return parse_gitlab_events(ds, json_col, on_error=on_error)


@register_stage("parse_github")
def _parse_github(ds, json_col: str = "event_json", **opts):
    """githubreceiver workflow webhook decode (round 5)."""
    from ..stages.githubrx import parse_github_events

    return parse_github_events(ds, json_col, **opts)


@register_stage("parse_webhook")
def _parse_webhook(ds, body_col: str = "body_raw", **opts):
    """webhookeventreceiver body decode (round 5)."""
    from ..stages.webhookevent import parse_webhook_events

    return parse_webhook_events(ds, body_col, **opts)


@register_stage("parse_cloudflare")
def _parse_cloudflare(ds, payload_col: str = "payload", **opts):
    """cloudflarereceiver Logpush NDJSON decode (round 5)."""
    from ..stages.cloudflare import parse_cloudflare_logs

    return parse_cloudflare_logs(ds, payload_col, **opts)


@register_stage("to_azuremonitor_spans")
def _to_azuremonitor_spans(ds, span_events_enabled: bool = False,
                           on_error: str = "drop"):
    """azuremonitorexporter span envelopes (round 5)."""
    from ..stages.azuremonitor import spans_to_azuremonitor

    return spans_to_azuremonitor(
        ds, span_events_enabled=span_events_enabled, on_error=on_error)


@register_stage("to_azuremonitor_logs")
def _to_azuremonitor_logs(ds, **opts):
    """azuremonitorexporter log envelopes (round 5)."""
    from ..stages.azuremonitor import logs_to_azuremonitor

    return logs_to_azuremonitor(ds, **opts)


@register_stage("to_alertmanager")
def _to_alertmanager(ds, **opts):
    """alertmanagerexporter alerts from span events (round 5)."""
    from ..stages.alertmanager import spans_to_alertmanager

    return spans_to_alertmanager(ds, **opts)


@register_stage("parse_libhoney")
def _parse_libhoney(ds, json_col: str = "events_json",
                    dataset_col: str = "dataset",
                    signal: str = "traces", on_error: str = "drop"):
    """libhoneyreceiver event-batch decode (round 5)."""
    from ..stages.libhoney import parse_libhoney

    return parse_libhoney(ds, json_col, dataset_col=dataset_col,
                          signal=signal, on_error=on_error)


@register_stage("parse_datadog_series")
def _parse_datadog_series(ds, json_col: str = "dd_json",
                          on_error: str = "drop"):
    """datadogreceiver v1 series decode (round 5)."""
    from ..stages.datadog import parse_datadog_series

    return parse_datadog_series(ds, json_col, on_error=on_error)


@register_stage("parse_datadog_checks")
def _parse_datadog_checks(ds, json_col: str = "dd_json",
                          on_error: str = "drop"):
    """datadogreceiver service-check decode (round 5)."""
    from ..stages.datadog import parse_datadog_service_checks

    return parse_datadog_service_checks(ds, json_col, on_error=on_error)


@register_stage("parse_xray")
def _parse_xray(ds, json_col: str = "xray_json", on_error: str = "drop"):
    """awsxrayreceiver segment decode (round 5)."""
    from ..stages.xray import parse_xray_segments

    return parse_xray_segments(ds, json_col, on_error=on_error)


@register_stage("to_xray")
def _to_xray(ds, **opts):
    """awsxrayexporter segment documents (round 5)."""
    from ..stages.xray import spans_to_xray

    return spans_to_xray(ds, **opts)


@register_stage("to_cwlogs")
def _to_cwlogs(ds, **opts):
    """awscloudwatchlogsexporter event rows (round 5)."""
    from ..stages.cwlogsout import logs_to_cwlogs

    return logs_to_cwlogs(ds, **opts)


@register_stage("prom_accumulate")
def _prom_accumulate(ds, **opts):
    """prometheusexporter accumulator fold (round 5)."""
    from ..stages.promexport import prom_accumulate

    return prom_accumulate(ds, **opts)


@register_stage("to_prometheus_text")
def _to_prometheus_text(ds, **opts):
    """prometheusexporter exposition lines (round 5)."""
    from ..stages.promexport import metrics_to_prometheus_text

    return metrics_to_prometheus_text(ds, **opts)


@register_stage("to_opensearch_logs")
def _to_opensearch_logs(ds, **opts):
    """opensearchexporter log documents (round 5)."""
    from ..stages.opensearchout import logs_to_opensearch

    return logs_to_opensearch(ds, **opts)


@register_stage("to_opensearch_spans")
def _to_opensearch_spans(ds, **opts):
    """opensearchexporter SS4O span documents (round 5)."""
    from ..stages.opensearchout import spans_to_opensearch

    return spans_to_opensearch(ds, **opts)


@register_stage("to_sentry")
def _to_sentry(ds, **opts):
    """sentryexporter transactions/spans/exceptions (round 5)."""
    from ..stages.sentryout import spans_to_sentry

    return spans_to_sentry(ds, **opts)


@register_stage("to_mezmo")
def _to_mezmo(ds, **opts):
    """mezmoexporter line objects (round 5)."""
    from ..stages.mezmo import logs_to_mezmo

    return logs_to_mezmo(ds, **opts)


@register_stage("parse_k8s_events")
def _parse_k8s_events(ds, **opts):
    """k8seventsreceiver event decode (round 5)."""
    from ..stages.k8sevents import parse_k8s_events

    return parse_k8s_events(ds, **opts)


@register_stage("parse_cloudfoundry_logs")
def _parse_cf_logs(ds, **opts):
    """cloudfoundryreceiver log envelopes (round 5)."""
    from ..stages.cloudfoundry import parse_cloudfoundry_logs

    return parse_cloudfoundry_logs(ds, **opts)


@register_stage("parse_cloudfoundry_metrics")
def _parse_cf_metrics(ds, **opts):
    """cloudfoundryreceiver counter/gauge envelopes (round 5)."""
    from ..stages.cloudfoundry import parse_cloudfoundry_metrics

    return parse_cloudfoundry_metrics(ds, **opts)


@register_stage("to_logservice_logs")
def _to_ls_logs(ds, **opts):
    """alibabacloud/tencentcloud LogService log records (round 5)."""
    from ..stages.logservice import logs_to_logservice

    return logs_to_logservice(ds, **opts)


@register_stage("to_logservice_spans")
def _to_ls_spans(ds, **opts):
    """alibabacloud LogService span records (round 5)."""
    from ..stages.logservice import spans_to_logservice

    return spans_to_logservice(ds, **opts)


@register_stage("to_logservice_metrics")
def _to_ls_metrics(ds, **opts):
    """alibabacloud LogService metric rows (round 5)."""
    from ..stages.logservice import metrics_to_logservice

    return metrics_to_logservice(ds, **opts)


@register_stage("honeycomb_markers")
def _honeycomb_markers(ds, **opts):
    """honeycombmarkerexporter marker POST rows (round 5)."""
    from ..stages.honeycomb import honeycomb_markers

    markers = opts.pop("markers")
    return honeycomb_markers(ds, markers, **opts)


@register_stage("parse_expvar")
def _parse_expvar(ds, **opts):
    """expvarreceiver memstats decode (round 5)."""
    from ..stages.expvar import parse_expvar

    return parse_expvar(ds, **opts)


@register_stage("parse_haproxy")
def _parse_haproxy(ds, **opts):
    """haproxyreceiver `show stat` CSV decode (round 5)."""
    from ..stages.haproxy import parse_haproxy

    return parse_haproxy(ds, **opts)


@register_stage("parse_apache")
def _parse_apache(ds, **opts):
    """apachereceiver mod_status decode (round 5)."""
    from ..stages.apache import parse_apache

    return parse_apache(ds, **opts)


@register_stage("parse_nginx")
def _parse_nginx(ds, **opts):
    """nginxreceiver stub_status decode (round 5)."""
    from ..stages.nginx import parse_nginx

    return parse_nginx(ds, **opts)


@register_stage("parse_mongodb_atlas")
def _parse_mongodb_atlas(ds, **opts):
    """mongodbatlasreceiver log decode (round 5)."""
    from ..stages.mongodbatlas import parse_mongodb_atlas_logs

    return parse_mongodb_atlas_logs(ds, **opts)


@register_stage("parse_solace")
def _parse_solace(ds, **opts):
    """solacereceiver broker trace decode (round 5)."""
    from ..stages.solace import parse_solace

    return parse_solace(ds, **opts)


@register_stage("to_adx_logs")
def _to_adx_logs(ds, **opts):
    """azuredataexplorerexporter OTELLogs rows (round 5)."""
    from ..stages.adx import logs_to_adx

    return logs_to_adx(ds, **opts)


@register_stage("to_adx_traces")
def _to_adx_traces(ds, **opts):
    """azuredataexplorerexporter OTELTraces rows (round 5)."""
    from ..stages.adx import traces_to_adx

    return traces_to_adx(ds, **opts)


@register_stage("to_adx_metrics")
def _to_adx_metrics(ds, **opts):
    """azuredataexplorerexporter OTELMetrics rows (round 5)."""
    from ..stages.adx import metrics_to_adx

    return metrics_to_adx(ds, **opts)


@register_stage("to_clickhouse_logs")
def _to_clickhouse_logs(ds, **opts):
    """clickhouseexporter otel_logs INSERT rows (round 5)."""
    from ..stages.clickhouse import logs_to_clickhouse

    return logs_to_clickhouse(ds, **opts)


@register_stage("to_clickhouse_traces")
def _to_clickhouse_traces(ds, **opts):
    """clickhouseexporter otel_traces INSERT rows (round 5)."""
    from ..stages.clickhouse import spans_to_clickhouse

    return spans_to_clickhouse(ds, **opts)


@register_stage("to_clickhouse_metrics")
def _to_clickhouse_metrics(ds, **opts):
    """clickhouseexporter otel_metrics_* INSERT rows (round 5)."""
    from ..stages.clickhouse import metrics_to_clickhouse

    return metrics_to_clickhouse(ds, **opts)


@register_stage("to_doris_logs")
def _to_doris_logs(ds, **opts):
    """dorisexporter log JSON lines (round 5)."""
    from ..stages.doris import logs_to_doris

    return logs_to_doris(ds, **opts)


@register_stage("to_doris_traces")
def _to_doris_traces(ds, **opts):
    """dorisexporter trace JSON lines (round 5)."""
    from ..stages.doris import spans_to_doris

    return spans_to_doris(ds, **opts)


@register_stage("to_doris_metrics")
def _to_doris_metrics(ds, **opts):
    """dorisexporter per-type metric JSON lines (round 5)."""
    from ..stages.doris import metrics_to_doris

    return metrics_to_doris(ds, **opts)


@register_stage("parse_azure_eventhub_logs")
def _parse_azure_eventhub_logs(ds, **opts):
    """pkg/translator/azure resource-log decode (round 5)."""
    from ..stages.azureeventhub import parse_azure_logs

    return parse_azure_logs(ds, **opts)


@register_stage("parse_azure_eventhub_traces")
def _parse_azure_eventhub_traces(ds, **opts):
    """pkg/translator/azure AppTraces decode (round 5)."""
    from ..stages.azureeventhub import parse_azure_traces

    return parse_azure_traces(ds, **opts)


@register_stage("parse_azure_eventhub_metrics")
def _parse_azure_eventhub_metrics(ds, **opts):
    """azureeventhubreceiver resource-metric decode (round 5)."""
    from ..stages.azureeventhub import parse_azure_metrics

    return parse_azure_metrics(ds, **opts)


@register_stage("to_tinybird_logs")
def _to_tinybird_logs(ds, **opts):
    """tinybirdexporter log NDJSON lines (round 5)."""
    from ..stages.tinybird import logs_to_tinybird

    return logs_to_tinybird(ds, **opts)


@register_stage("to_tinybird_traces")
def _to_tinybird_traces(ds, **opts):
    """tinybirdexporter trace NDJSON lines (round 5)."""
    from ..stages.tinybird import spans_to_tinybird

    return spans_to_tinybird(ds, **opts)


@register_stage("to_tinybird_metrics")
def _to_tinybird_metrics(ds, **opts):
    """tinybirdexporter per-type metric NDJSON lines (round 5)."""
    from ..stages.tinybird import metrics_to_tinybird

    return metrics_to_tinybird(ds, **opts)


@register_stage("to_cassandra_logs")
def _to_cassandra_logs(ds, **opts):
    """cassandraexporter log INSERT rows (round 5)."""
    from ..stages.cassandra import logs_to_cassandra

    return logs_to_cassandra(ds, **opts)


@register_stage("to_cassandra_spans")
def _to_cassandra_spans(ds, **opts):
    """cassandraexporter span INSERT rows (round 5)."""
    from ..stages.cassandra import spans_to_cassandra

    return spans_to_cassandra(ds, **opts)


@register_stage("to_bmchelix")
def _to_bmchelix(ds, **opts):
    """bmchelixexporter Helix OM metric fan-out (round 5)."""
    from ..stages.bmchelix import metrics_to_bmchelix

    return metrics_to_bmchelix(ds, **opts)


@register_stage("parse_netflow")
def _parse_netflow(ds, **opts):
    """netflowreceiver flow-message → log decode (round 5)."""
    from ..stages.netflow import parse_netflow

    return parse_netflow(ds, **opts)


@register_stage("parse_cwmetrics")
def _parse_cwmetrics(ds, record_col: str = "record",
                     on_error: str = "drop"):
    """awsfirehosereceiver cwmetrics record decode (round 5)."""
    from ..stages.firehose import parse_cwmetrics

    return parse_cwmetrics(ds, record_col, on_error=on_error)


@register_stage("parse_cwlogs")
def _parse_cwlogs(ds, record_col: str = "record_gz",
                  on_error: str = "drop"):
    """awsfirehosereceiver cwlogs gzip record decode (round 5)."""
    from ..stages.firehose import parse_cwlogs

    return parse_cwlogs(ds, record_col, on_error=on_error)


@register_stage("to_syslog")
def _to_syslog(ds, **kwargs):
    """syslogexporter RFC5424/RFC3164 frame rendering (round 5)."""
    from ..stages.syslogout import to_syslog

    return to_syslog(ds, **kwargs)


@register_stage("bpe_encode")
def _bpe_encode(ds, text_col: str = "text", **kwargs):
    """BPE merge training + encode (training-data operator, round 5)."""
    from ..stages.bpe import bpe_train_and_encode

    out, _merges = bpe_train_and_encode(ds, text_col, **kwargs)
    return out


@register_stage("parse_azure_logs")
def _parse_azure_logs(ds, json_col: str = "export_json",
                      time_formats: tuple = (), on_error: str = "drop"):
    """azurelogs resource-log export decode (round 5)."""
    from ..stages.azure import parse_azure_logs

    return parse_azure_logs(ds, json_col, time_formats=time_formats,
                            on_error=on_error)


@register_stage("consistent_sample")
def _consistent_sample(ds, percent: float, mode: str = "equalizing",
                       **kwargs):
    """probabilisticsampler equalizing/proportional (OTEP 235, round 5)."""
    from ..stages.otep235 import consistent_sample

    return consistent_sample(ds, percent, mode, **kwargs)


@register_stage("datadog_semantics")
def _datadog_semantics(ds, override_incoming: bool = False, **cols):
    """datadogsemanticsprocessor: datadog.*/git.* convention columns (round 5)."""
    from ..stages.datadog import DatadogSemantics

    return ds.map_batches(
        DatadogSemantics(override_incoming=override_incoming, **cols),
        batch_format="pyarrow", zero_copy_batch=True)


@register_stage("host_info")
def _host_info(ds, identifier_cols: list, ts_col: str,
               flush_interval_us: int = 60_000_000):
    """grafanacloudconnector host-info metric (round 5)."""
    from ..stages.hostinfo import host_info

    return host_info(ds, identifier_cols=list(identifier_cols),
                     ts_col=ts_col, flush_interval_us=flush_interval_us)


@register_stage("repeated_ngrams")
def _repeated_ngrams(ds, id_col: str = "doc_id", text_col: str = "text",
                     k: int = 8, min_docs: int = 2):
    """Cross-document duplicated-span counts (round 3)."""
    from ..stages.tokenstats import repeated_word_ngram_counts

    return repeated_word_ngram_counts(ds, id_col=id_col, text_col=text_col,
                                      k=k, min_docs=min_docs)


@register_stage("dedup")
def _dedup(ds, key_cols: list[str], order_col: str,
           count_name: str = "log_count", salt: int | None = None):
    from ..stages.dedup import exact_dedup

    return exact_dedup(ds, key_cols=key_cols, order_col=order_col,
                       count_name=count_name, salt=salt)


@register_stage("remap_tokens")
def _remap_tokens(ds, mapping: list, tokens_col: str = "tokens"):
    """Vocab remap through a dense LUT (round 4)."""
    import numpy as np

    from ..stages.vocab import remap_tokens

    return remap_tokens(ds, np.asarray(mapping, dtype=np.int32),
                        tokens_col=tokens_col)


@register_stage("kmeans_assign")
def _kmeans_assign(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                   k: int = 16, sim_col: str = None, fit_sample: int = 4096):
    """Spherical k-means cluster assignment (round 4, SemDeDup prereq)."""
    from ..stages.kmeans import kmeans_assign

    return kmeans_assign(ds, id_col, vec_col, k, sim_col=sim_col,
                         fit_sample=fit_sample)


@register_stage("token_rarity")
def _token_rarity(ds, tokens_col: str = "tokens", id_cols: list = None,
                  vocab_size: int = 65536):
    """Per-doc token-rarity quality signal (round 4)."""
    from ..stages.tokenstats import token_rarity

    return token_rarity(ds, tokens_col=tokens_col,
                        id_cols=list(id_cols or ["doc_id"]),
                        vocab_size=vocab_size)


@register_stage("quantile_band")
def _quantile_band(ds, value_col: str, q_lo: float, q_hi: float):
    """Percentile-trim selection (round 4)."""
    from ..stages.quantile import quantile_band_filter

    return quantile_band_filter(ds, value_col, q_lo, q_hi)


@register_stage("perplexity_filter")
def _perplexity_filter(ds, id_col: str = "doc_id", text_col: str = "text",
                       q_lo: float = 0.05, q_hi: float = 0.90,
                       fit_sample: int = 4096):
    """CCNet-style char-LM perplexity band selection (round 4)."""
    from ..stages.perplexity import perplexity_filter

    return perplexity_filter(ds, id_col=id_col, text_col=text_col,
                             q_lo=q_lo, q_hi=q_hi, fit_sample=fit_sample)


@register_stage("segment_dedup")
def _segment_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                   sep: str = "\n\n"):
    """Corpus-wide first-occurrence segment dedup + reassembly (round 4)."""
    from ..stages.paradedup import segment_dedup

    return segment_dedup(ds, id_col=id_col, text_col=text_col, sep=sep)


@register_stage("substring_dedup")
def _substring_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                     k: int = 50):
    """Lee et al. ExactSubstr duplicated-span REMOVAL (round 5) — docs
    come back with every repeated k-char span (except its globally-first
    occurrence) sliced out."""
    from ..stages.substrdedup import substring_dedup_apply

    return substring_dedup_apply(ds, id_col=id_col, text_col=text_col, k=k)


@register_stage("md5_tokenize")
def _md5_tokenize(ds, text_col: str = "text", out_col: str = "tokens",
                  vocab_size: int = 50_257):
    """SQL-reproducible word tokenizer (round 4)."""
    from ..stages.vocab import Md5Tokenize

    return ds.map_batches(
        Md5Tokenize(text_col=text_col, out_col=out_col,
                    vocab_size=vocab_size),
        batch_format="pyarrow", zero_copy_batch=True)


def _build_source(spec: dict) -> ray.data.Dataset:
    typ = spec["type"]
    if typ == "parquet":
        return ray.data.read_parquet(spec["path"], columns=spec.get("columns"))
    if typ == "corpus":
        from ..sources.corpus import corpus_dataset

        return corpus_dataset(spec["sf_dir"], with_raw=spec.get("with_raw", True),
                              replicate=spec.get("replicate", 1))
    raise ValueError(f"unknown source type {typ!r}")


def _build_terminal(ds, spec: dict | None):
    if spec is None:
        return ds
    typ = spec["type"]
    if typ == "count_sum":
        from ..stages.aggregate import count_sum

        return count_sum(ds, keys=spec["keys"], sum_cols=spec.get("sum_cols"),
                         final=spec.get("final", "driver"))
    if typ == "multi_agg":
        from ..stages.aggregate import multi_agg

        return multi_agg(ds, keys=spec["keys"], col=spec["col"], ops=spec["ops"],
                         prefix=spec.get("prefix"))
    if typ == "group_quantiles":
        from ..stages.quantile import group_quantiles

        return group_quantiles(ds, keys=spec["keys"],
                               value_col=spec["value_col"], qs=spec["qs"],
                               prefix=spec.get("prefix", "q"))
    if typ == "exp_histogram":
        from ..stages.expohist import exp_histogram

        return exp_histogram(ds, value_col=spec["value_col"],
                             keys=spec["keys"], scale=spec.get("scale", 2),
                             idx_lo=spec["idx_lo"], idx_hi=spec["idx_hi"])
    if typ == "write_parquet":
        ds.write_parquet(spec["path"], partition_cols=spec.get("partition_cols"))
        return ds
    raise ValueError(f"unknown terminal type {typ!r}")


def build_pipeline(config: dict[str, Any]) -> ray.data.Dataset:
    """Build the lazy Dataset DAG from config (does not execute)."""
    ds = _build_source(config["source"])
    for stage in config.get("stages", []):
        spec = dict(stage)
        typ = spec.pop("type")
        try:
            factory = STAGE_REGISTRY[typ]
        except KeyError:
            raise ValueError(
                f"unknown stage type {typ!r}; registered: {sorted(STAGE_REGISTRY)}"
            ) from None
        ds = factory(ds, **spec)
    return ds


@register_stage("parse_docker_stats")
def _parse_docker_stats(ds, **opts):
    """dockerstatsreceiver container stats decode (round 5c2)."""
    from ..stages.dockerstats import parse_docker_stats

    return parse_docker_stats(ds, **opts)


@register_stage("parse_memcached")
def _parse_memcached(ds, **opts):
    """memcachedreceiver stats-page decode (round 5c2)."""
    from ..stages.memcached import parse_memcached

    return parse_memcached(ds, **opts)


@register_stage("parse_couchdb")
def _parse_couchdb(ds, **opts):
    """couchdbreceiver node-stats decode (round 5c2)."""
    from ..stages.couchdb import parse_couchdb

    return parse_couchdb(ds, **opts)


@register_stage("parse_httpcheck")
def _parse_httpcheck(ds, **opts):
    """httpcheckreceiver check-result mapping (round 5c2)."""
    from ..stages.httpcheck import parse_httpcheck

    return parse_httpcheck(ds, **opts)


@register_stage("parse_riak")
def _parse_riak(ds, **opts):
    """riakreceiver /stats decode (round 5c2)."""
    from ..stages.riak import parse_riak

    return parse_riak(ds, **opts)


@register_stage("parse_flink")
def _parse_flink(ds, **opts):
    """flinkmetricsreceiver instance decode (round 5c2)."""
    from ..stages.flinkmetrics import parse_flink

    return parse_flink(ds, **opts)


@register_stage("parse_nsxt")
def _parse_nsxt(ds, **opts):
    """nsxtreceiver node decode (round 5c2)."""
    from ..stages.nsxt import parse_nsxt

    return parse_nsxt(ds, **opts)


@register_stage("parse_podman")
def _parse_podman(ds, **opts):
    """podmanreceiver libpod stats decode (round 5c2)."""
    from ..stages.podman import parse_podman

    return parse_podman(ds, **opts)


@register_stage("parse_aerospike")
def _parse_aerospike(ds, **opts):
    """aerospikereceiver info-map decode (round 5c2)."""
    from ..stages.aerospike import parse_aerospike

    return parse_aerospike(ds, **opts)


@register_stage("parse_chrony")
def _parse_chrony(ds, **opts):
    """chronyreceiver binary tracking decode (round 5c2)."""
    from ..stages.chrony import parse_chrony

    return parse_chrony(ds, **opts)


@register_stage("parse_apachespark")
def _parse_apachespark(ds, **opts):
    """apachesparkreceiver application decode (round 5c2)."""
    from ..stages.apachespark import parse_apachespark

    return parse_apachespark(ds, **opts)


@register_stage("parse_ecs_task_metrics")
def _parse_ecs_task_metrics(ds, **opts):
    """awsecscontainermetrics task-snapshot decode (round 5c2)."""
    from ..stages.ecsmetrics import parse_ecs_task_metrics

    return parse_ecs_task_metrics(ds, **opts)


@register_stage("parse_bigip")
def _parse_bigip(ds, **opts):
    """bigipreceiver stats-entry decode (round 5c2)."""
    from ..stages.bigip import parse_bigip

    return parse_bigip(ds, **opts)


@register_stage("parse_kubeletstats")
def _parse_kubeletstats(ds, **opts):
    """kubeletstatsreceiver summary decode (round 5c2)."""
    from ..stages.kubeletstats import parse_kubeletstats

    return parse_kubeletstats(ds, **opts)


@register_stage("rows_to_metrics")
def _rows_to_metrics(ds, **opts):
    """internal/sqlquery row->metric engine (round 5c2)."""
    from ..stages.sqlquery import rows_to_metrics

    return rows_to_metrics(ds, **opts)


@register_stage("rows_to_logs")
def _rows_to_logs(ds, **opts):
    """sqlqueryreceiver row->log mapping (round 5c2)."""
    from ..stages.sqlquery import rows_to_logs

    return rows_to_logs(ds, **opts)


@register_stage("c4_filter")
def _c4_filter(ds, **opts):
    """C4 page/line cleaning (Raffel et al. 2020) (round 5c2)."""
    from ..stages.c4filter import c4_filter

    return c4_filter(ds, **opts)


def build_and_run(config: dict[str, Any]):
    ds = build_pipeline(config)
    return _build_terminal(ds, config.get("aggregate") or config.get("sink"))
