"""OTTL context path sets — span/spanevent/metric/datapoint/log contexts
as first-class path translation onto the flat-column data model.

Reference semantics (pkg/ottl/contexts/ottlspan/span.go,
ottlspanevent/span_events.go, ottlmetric/metrics.go,
ottldatapoint/datapoint.go, ottllog/log.go — each context registers a path
set like ``name``, ``status.code``, ``trace_id.string``,
``resource.attributes[...]`` that its parser resolves against pdata): in
this engine a record is one flat Arrow row, so a context is a TRANSLATION
TABLE from reference-spelled OTTL paths to flat column names, applied at
statement/condition COMPILE time (zero per-batch cost).  Unknown paths
pass through untouched — the open-schema convention: user columns are
addressable from every context, and a genuinely missing column keeps
OTTL's nil-path semantics downstream.

Path indexing composes: ``resource.attributes["k"]`` tokenizes as the
identifier ``resource.attributes`` + an index; the identifier is
translated (→ ``resource_attributes``) and the index then applies to the
renamed map/struct column (functions/expr.py ``_index_into``).
"""

from __future__ import annotations

import re

# Flat-column names for each context's registered paths.  The log set
# matches the corpus/otlpjson flat schema; span/metric names follow the
# same convention (snake_case, resource_/scope_ prefixes for the
# denormalized parents).
_SPAN_BASE = {
    "name": "span_name",
    "kind": "span_kind",
    "kind.string": "span_kind",  # enum-as-int column; string form shares it
    "span_id": "span_id",
    "span_id.string": "span_id",
    "trace_id": "trace_id",
    "trace_id.string": "trace_id",
    "parent_span_id": "parent_span_id",
    "parent_span_id.string": "parent_span_id",
    "trace_state": "trace_state",
    "start_time_unix_nano": "start_time_unix_nano",
    "end_time_unix_nano": "end_time_unix_nano",
    "status.code": "status_code",
    "status.message": "status_message",
    "dropped_attributes_count": "dropped_attributes_count",
    "dropped_events_count": "dropped_events_count",
    "dropped_links_count": "dropped_links_count",
}

_METRIC_BASE = {
    "name": "metric_name",
    "description": "metric_description",
    "unit": "metric_unit",
    "type": "metric_type",
    "aggregation_temporality": "aggregation_temporality",
    "is_monotonic": "is_monotonic",
}

_PARENTS = {
    "resource.attributes": "resource_attributes",
    "resource.dropped_attributes_count": "resource_dropped_attributes_count",
    "instrumentation_scope.name": "scope_name",
    "instrumentation_scope.version": "scope_version",
    "instrumentation_scope.attributes": "scope_attributes",
}

PATH_SETS: dict[str, dict[str, str]] = {
    # ottllog/log.go — identity for the flat log schema (the engine's
    # native shape); only the .string forms and parents translate
    "log": {
        "trace_id.string": "trace_id",
        "span_id.string": "span_id",
        **_PARENTS,
    },
    # ottlspan/span.go
    "span": {**_SPAN_BASE, **_PARENTS},
    # ottlspanevent/span_events.go — event paths + parent span reachable
    # under the span.* prefix
    "spanevent": {
        "name": "event_name",
        "time_unix_nano": "time_unix_nano",
        "dropped_attributes_count": "dropped_attributes_count",
        **{f"span.{k}": v for k, v in _SPAN_BASE.items()},
        **_PARENTS,
    },
    # ottlmetric/metrics.go
    "metric": {**_METRIC_BASE, **_PARENTS},
    # ottldatapoint/datapoint.go — datapoint paths + parent metric under
    # the metric.* prefix
    "datapoint": {
        "time_unix_nano": "time_unix_nano",
        "start_time_unix_nano": "start_time_unix_nano",
        "value_double": "value_double",
        "value_int": "value_int",
        "count": "count",
        "sum": "sum",
        "flags": "flags",
        **{f"metric.{k}": v for k, v in _METRIC_BASE.items()},
        **_PARENTS,
    },
    # ottlresource / ottlscope
    "resource": {"attributes": "resource_attributes",
                 "dropped_attributes_count":
                     "resource_dropped_attributes_count"},
    "scope": {"name": "scope_name", "version": "scope_version",
              "attributes": "scope_attributes"},
}


def translate_path(context: str, path: str) -> str:
    """Reference-spelled OTTL path -> flat column name. Unknown paths pass
    through (open schema / nil-path semantics)."""
    if context not in PATH_SETS:
        raise ValueError(
            f"unknown OTTL context {context!r}; one of {sorted(PATH_SETS)}")
    return PATH_SETS[context].get(path, path)


# identifier tokens as functions/expr.py tokenizes them (dots allowed);
# a match immediately followed by "(" is a converter call, not a path
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")
_STR_SPLIT_RE = re.compile(r'("(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\')')

_KEYWORDS = {"and", "or", "not", "in", "true", "false", "nil", "null"}


def rewrite_expr(context: str, text: str) -> str:
    """Translate every path identifier in a condition/value expression,
    leaving string literals, keywords, enums (UPPERCASE) and converter
    calls (identifier followed by ``(``) untouched."""
    mapping = PATH_SETS[context] if context in PATH_SETS else None
    if mapping is None:
        raise ValueError(
            f"unknown OTTL context {context!r}; one of {sorted(PATH_SETS)}")

    def sub(segment: str) -> str:
        out = []
        last = 0
        for m in _IDENT_RE.finditer(segment):
            ident = m.group(0)
            rest = segment[m.end():].lstrip()
            if (ident in _KEYWORDS or ident.isupper()
                    or rest.startswith("(")):
                continue
            new = mapping.get(ident)
            if new is None:
                continue
            out.append(segment[last:m.start()])
            out.append(new)
            last = m.end()
        out.append(segment[last:])
        return "".join(out)

    parts = _STR_SPLIT_RE.split(text)
    return "".join(p if i % 2 else sub(p)
                   for i, p in enumerate(parts))


def with_context(context: str, statements: list) -> list:
    """Translate a Statement list's paths (set targets, Col references,
    converter Col args, where conditions) from ``context`` spelling to
    flat columns — returns NEW statements, inputs untouched.

    The reference parser does this resolution once at collector start
    (pkg/ottl/parser.go ParseStatements with the context's PathExpressionParser);
    here it happens once at pipeline build, before map_batches compiles
    anything."""
    from ..stages.transform import C, Col, Statement

    def tr_val(v):
        if isinstance(v, Col):
            return Col(translate_path(context, v.name))
        if isinstance(v, C):
            return C(v.name, *[tr_val(a) for a in v.args])
        return v

    out = []
    for st in statements:
        args = st.args
        if st.editor == "set":
            target, value = args
            args = (translate_path(context, target), tr_val(value))
        elif st.editor in ("delete_keys", "keep_keys"):
            args = tuple(translate_path(context, a) for a in args)
        elif st.editor == "rename":
            args = (translate_path(context, args[0]),
                    translate_path(context, args[1]))
        else:
            # other editors (replace_pattern/replace_match/append/limit/
            # merge_maps/...) take the TARGET path first; later string
            # args are patterns/literals and must NOT be translated even
            # when they happen to spell a path (e.g. the regex "name")
            args = tuple(
                tr_val(a) if isinstance(a, (C, Col))
                else (translate_path(context, a)
                      if i == 0 and isinstance(a, str) else a)
                for i, a in enumerate(args))
        where = (rewrite_expr(context, st.where)
                 if st.where is not None else None)
        out.append(Statement(st.editor, args, where))
    return out
