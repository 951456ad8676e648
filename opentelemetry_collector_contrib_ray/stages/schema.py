"""Semantic-convention schema translation — the schemaprocessor rebuilt
Ray-Data-first.

The reference (processor/schemaprocessor/DESIGN.md; internal/translation/
translation.go:300-337 ``iterator``) converts each signal from the schema
version named by its ``schema_url`` to one configured target version by
walking the schema file's per-version change lists:

- **upgrade** (record version < target): apply revisions with version in
  ``(from, target]`` in ASCENDING order, each revision applying its
  ``all`` block before the signal block (translation.go:186-196);
- **revert** (record version > target): apply revisions in ``(target,
  from]`` in DESCENDING order with REVERSED rename maps, signal block
  before ``all`` (translation.go:197-204);
- records whose version the schema does not know — or whose schema FAMILY
  differs from the schema's — pass through untouched (``NoChange``,
  translation.go:311-314), keeping their original schema_url;
- translated records get ``schema_url`` rewritten to the target
  (translation.go:208).

Because every change block is a plain key->key (or metric-name) rename
map, a whole version WALK composes into ONE dict per source version
(function composition over string keys).  The stage therefore does no
per-revision work at batch time: it caches one composed rename map per
distinct source version and applies it with a single vectorized
``map_rename_keys`` / ``index_in`` pass.  Batches carrying k distinct
versions cost k vectorized passes — k is tiny (the number of live schema
versions in a fleet), never O(rows).

Scale note: the schema definition is a small dict broadcast inside the
callable (task-based map_batches — cheap state, CLAUDE.md round-3 rule);
no shuffle, no driver funnel.  At 100 TB this stage is a pure map.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.maps import map_rename_keys

# change blocks a schema file may carry per version (otel schema ast);
# span_events is accepted but folded into "spans" for this engine's
# flat record model.
_BLOCKS = ("all", "resources", "spans", "span_events", "metrics", "logs")

# which blocks apply to a given signal type, in UPGRADE order
# (all first — translation.go:186-196; revert reverses this order)
_SIGNAL_BLOCKS = {
    "logs": ("all", "logs"),
    "resources": ("all", "resources"),
    "spans": ("all", "spans", "span_events"),
    "metrics": ("all", "metrics"),
}


def parse_version(v: str) -> tuple[int, ...]:
    """``"1.8.0"`` -> ``(1, 8, 0)`` (version.go semantics: numeric
    dot-separated compare)."""
    try:
        return tuple(int(p) for p in v.strip().split("."))
    except ValueError as e:
        raise ValueError(f"invalid schema version {v!r}") from e


def split_schema_url(url: str) -> tuple[str, str]:
    """Schema URL -> (family, version): the version is the final path
    segment, the family everything before it (README "Schema Formats")."""
    url = url.rstrip("/")
    if "/" not in url:
        return "", url
    family, _, ver = url.rpartition("/")
    return family, ver


def _norm_changes(block) -> list[dict]:
    """A block is a list of change dicts (schema-file ``changes:`` list)
    or a single dict; each change carries ``rename_attributes`` (possibly
    under the file's ``attribute_map`` key) and/or ``rename_metrics``."""
    if block is None:
        return []
    if isinstance(block, dict):
        block = [block]
    out = []
    for ch in block:
        ra = ch.get("rename_attributes") or {}
        if "attribute_map" in ra:  # verbatim schema-file nesting
            ra = ra["attribute_map"] or {}
        out.append({"rename_attributes": dict(ra),
                    "rename_metrics": dict(ch.get("rename_metrics") or {})})
    return out


def _compose(into: dict[str, str], step: dict[str, str]) -> None:
    """In-place function composition ``into := step ∘ into`` over string
    keys (apply ``into`` first, then ``step``; identity off-domain).
    Existing images are re-mapped through ``step``; step keys that are
    not already preimages append — a record that NATIVELY carries such a
    key at the source version gets the later rename applied to it, which
    is exactly what sequential revision application does."""
    if not step:
        return
    for k in list(into):
        into[k] = step.get(into[k], into[k])
    for k, v in step.items():
        if k not in into:
            into[k] = v


class SchemaTranslator:
    """Composed-rename planner for one schema family + target version.

    ``schema_def``::

        {"family": "https://example.com/schemas",
         "versions": {
             "1.0.0": {},
             "1.1.0": {"logs": [{"rename_attributes":
                                  {"et": "event.type"}}]},
             "1.2.0": {"all": [{"rename_attributes":
                                 {"uid": "user.id"}}],
                       "metrics": [{"rename_metrics":
                                     {"lat": "http.lat"}}]},
         }}

    ``plan(signal, from_version)`` returns ``(attr_map, metric_map)`` —
    the single composed rename dicts to take a record of ``from_version``
    to the target — or ``None`` for NoChange/unknown versions. Plans are
    cached per (signal, from_version).
    """

    def __init__(self, schema_def: dict, target_version: str):
        self.family = str(schema_def.get("family", "")).rstrip("/")
        versions = schema_def.get("versions") or {}
        self.revisions: list[tuple[tuple[int, ...], str, dict]] = sorted(
            (parse_version(v), v, {b: _norm_changes(d.get(b))
                                   for b in _BLOCKS})
            for v, d in versions.items()
        )
        self.known = {v for _, v, _ in self.revisions}
        if target_version not in self.known:
            raise ValueError(
                f"target version {target_version!r} not defined in schema "
                f"(known: {sorted(self.known)})")
        self.target = parse_version(target_version)
        self.target_version = target_version
        self.target_url = (f"{self.family}/{target_version}"
                           if self.family else target_version)
        self._plans: dict = {}

    def plan(self, signal: str, from_version: str):
        key = (signal, from_version)
        if key in self._plans:
            return self._plans[key]
        plan = self._build_plan(signal, from_version)
        self._plans[key] = plan
        return plan

    def _build_plan(self, signal: str, from_version: str):
        if signal not in _SIGNAL_BLOCKS:
            raise ValueError(f"unknown signal {signal!r} "
                             f"(one of {sorted(_SIGNAL_BLOCKS)})")
        if from_version not in self.known:
            return None  # NoChange: unsupported version passes through
        frm = parse_version(from_version)
        if frm == self.target:
            return None
        blocks = _SIGNAL_BLOCKS[signal]
        attr_map: dict[str, str] = {}
        metric_map: dict[str, str] = {}
        if frm < self.target:  # upgrade: (from, target] ascending, fwd
            steps = [(ver, rev) for ver, _, rev in self.revisions
                     if frm < ver <= self.target]
            for _, rev in steps:
                for b in blocks:
                    for ch in rev[b]:
                        _compose(attr_map, ch["rename_attributes"])
                        _compose(metric_map, ch["rename_metrics"])
        else:  # revert: (target, from] descending, reversed maps + order
            steps = [(ver, rev) for ver, _, rev in self.revisions
                     if self.target < ver <= frm]
            for _, rev in reversed(steps):
                for b in reversed(blocks):
                    for ch in reversed(rev[b]):
                        _compose(attr_map,
                                 {v: k for k, v
                                  in ch["rename_attributes"].items()})
                        _compose(metric_map,
                                 {v: k for k, v
                                  in ch["rename_metrics"].items()})
        return {k: v for k, v in attr_map.items() if k != v}, \
            {k: v for k, v in metric_map.items() if k != v}


class SchemaTransform:
    """map_batches callable translating a batch to the target schema
    version (the schemaprocessor as one vectorized map stage).

    - ``version_col`` holds each row's schema URL (or bare version);
      rows of a foreign family or unknown version pass through with
      their original URL (reference NoChange), translated rows get
      ``translator.target_url``.
    - ``map_cols``: map-typed attribute columns to key-rename
      (one ``map_rename_keys`` pass per distinct version per column);
    - ``flat_cols``: flat attribute columns in this engine's column-per-
      attribute model — renamed only when the WHOLE batch shares one
      source version (column names are batch-global; per-row flat
      renames are expressed through a map column instead);
    - ``metric_name_col``: a metric-NAME column to value-rename
      (rename_metrics; one index_in pass per distinct version).
    """

    def __init__(self, translator: SchemaTranslator, signal: str = "logs",
                 version_col: str = "schema_url",
                 map_cols: tuple = ("attributes",),
                 flat_cols: bool = False,
                 metric_name_col: str | None = None):
        self.tr = translator
        self.signal = signal
        self.version_col = version_col
        self.map_cols = tuple(map_cols or ())
        self.flat_cols = flat_cols
        self.metric_name_col = metric_name_col

    def _row_plan(self, url: str):
        family, ver = split_schema_url(url)
        if self.tr.family and family and family != self.tr.family:
            return None  # foreign schema family: NoChange
        return self.tr.plan(self.signal, ver)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        urls = t.column(self.version_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        distinct = pc.unique(urls).to_pylist()
        if self.flat_cols:
            if len(distinct) != 1:
                raise ValueError(
                    "flat_cols=True needs a single-version batch; got "
                    f"{distinct} — route per-version or use a map column")
            plan = self._row_plan(distinct[0])
            if plan is None:
                return t
            attr_map, metric_map = plan
            t = t.rename_columns([attr_map.get(c, c)
                                  for c in t.column_names])
            t = self._rename_metric(t, metric_map, None)
            return self._stamp(t, pa.array([True] * t.num_rows))

        translated = pa.array([False] * t.num_rows)
        for url in distinct:
            if url is None:
                continue
            plan = self._row_plan(url)
            if plan is None:
                continue
            attr_map, metric_map = plan
            mask = pc.equal(urls, url)
            for col in self.map_cols:
                renamed = map_rename_keys(t.column(col), attr_map,
                                          row_mask=mask)
                t = t.set_column(t.schema.get_field_index(col), col,
                                 renamed)
            t = self._rename_metric(t, metric_map, mask)
            translated = pc.or_(translated, mask)
        return self._stamp(t, translated)

    def _rename_metric(self, t: pa.Table, metric_map: dict, mask):
        if not self.metric_name_col or not metric_map:
            return t
        col = t.column(self.metric_name_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        old = pa.array(list(metric_map.keys())).cast(col.type)
        new = pa.array(list(metric_map.values())).cast(col.type)
        repl = pc.take(new, pc.index_in(col, value_set=old))
        cond = pc.is_valid(repl)
        if mask is not None:
            cond = pc.and_(cond, mask)
        out = pc.if_else(cond, repl, col)
        return t.set_column(
            t.schema.get_field_index(self.metric_name_col),
            self.metric_name_col, out)

    def _stamp(self, t: pa.Table, translated) -> pa.Table:
        """Rewrite schema_url to the target on translated rows only
        (NoChange rows keep theirs — translation.go returns before
        SetSchemaUrl on NoChange)."""
        urls = t.column(self.version_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        out = pc.if_else(translated,
                         pa.scalar(self.tr.target_url, urls.type), urls)
        return t.set_column(t.schema.get_field_index(self.version_col),
                            self.version_col, out)
