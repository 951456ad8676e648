"""Regex parse stage — the stanza ``regex_parser`` analog, vectorized.

Reference semantics (pkg/stanza/operator/parser/regex/parser.go:16-67 +
helper/parser.go:119-180): read ``parse_from`` (a string field), run a
named-capture regex, write each capture to the record; ``on_error`` decides
whether non-matching records are dropped (``drop``) or forwarded unparsed
(``send``).

Ray-Data-first: the regex compiles once per stage object; each batch is one
``pyarrow.compute.extract_regex`` call over the whole column (zero-copy
Arrow in/out, no Python row loop).  Typed captures are cast after extraction
(the stanza severity/timestamp sub-parser analog).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class RegexParse:
    """map_batches callable: extract named groups from ``parse_from``.

    Parameters
    ----------
    pattern : regex with named groups (RE2-compatible subset).
    parse_from : source string column.
    types : optional {capture_name: pyarrow type} casts applied post-extract.
    on_error : "drop" removes rows that fail the regex; "send" keeps them
        with null captures (helper/parser.go on_error semantics).
    keep_input : keep the raw column in the output.
    memoize : batch analog of the reference's raw-line→captures LRU cache
        (parser/regex/parser.go ``cache``): extract once per UNIQUE line in
        the batch and gather results back by index — a big win on log
        streams where the same line repeats (health checks, heartbeats).
        Off by default; enable when the duplicate ratio is known high.
    """

    def __init__(
        self,
        pattern: str,
        parse_from: str = "raw",
        types: dict[str, pa.DataType] | None = None,
        on_error: str = "drop",
        keep_input: bool = False,
        memoize: bool = False,
    ):
        if on_error not in ("drop", "send"):
            raise ValueError("on_error must be 'drop' or 'send'")
        self.pattern = pattern
        self.parse_from = parse_from
        self.types = types or {}
        self.on_error = on_error
        self.keep_input = keep_input
        self.memoize = memoize

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.parse_from)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.memoize:
            uniq = pc.unique(col)
            if len(uniq) < len(col):
                per_uniq = pc.extract_regex(uniq, self.pattern)
                idx = pc.index_in(col, value_set=uniq)
                extracted = per_uniq.take(idx)
            else:
                extracted = pc.extract_regex(col, self.pattern)
        else:
            extracted = pc.extract_regex(col, self.pattern)  # null on miss
        matched = pc.is_valid(extracted)

        if self.on_error == "drop" and not pc.all(matched).as_py():
            batch = batch.filter(matched)
            extracted = extracted.filter(matched)

        out = batch if self.keep_input else batch.drop_columns([self.parse_from])
        for field in extracted.type:
            vals = pc.struct_field(extracted, field.name)
            typ = self.types.get(field.name)
            if typ is not None:
                vals = vals.cast(typ)
            if field.name in out.column_names:
                out = out.drop_columns([field.name])
            out = out.append_column(field.name, vals)
        return out


# The corpus raw-line pattern (sources/corpus.py raw format).
CORPUS_PATTERN = (
    r"^(?P<ts>\d+) (?P<severity>[A-Z]+) source=(?P<source>[\w-]+) "
    r"doc=(?P<doc_id>[\w-]+) n=(?P<n_tok>\d+) msg=(?P<msg>\S+)$"
)

CORPUS_TYPES = {"ts": pa.int64(), "n_tok": pa.int32()}
