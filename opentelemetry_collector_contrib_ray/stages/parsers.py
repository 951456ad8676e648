"""Format-specific parsers: syslog (RFC3164/5424), container logs, URI.

Reference analogs:

- syslog_parser (pkg/stanza/operator/parser/syslog): RFC3164
  ``<PRI>Mmm dd hh:mm:ss host tag: msg`` and RFC5424
  ``<PRI>VERSION ts host app procid msgid sd msg``; PRI decomposes into
  facility = pri >> 3 and severity = pri & 7.
- container parser (pkg/stanza/operator/parser/container): docker-json
  (``{"log": "...", "stream": "stdout", "time": "..."}``), containerd/CRI
  (``<ts> <stream> <P|F> <log>``) formats.
- URL converter (pkg/ottl/ottlfuncs/func_url.go): URI decomposition into
  scheme/host/port/path/query/fragment.

All are vectorized: one regex or one JSON pass per batch; severity/facility
math is pyarrow kernel arithmetic.
"""

from __future__ import annotations

import json
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

RFC3164_PATTERN = (
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<timestamp>[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) "
    r"(?P<tag>[^:\[\s]+)(?:\[(?P<proc_id>\d+)\])?:? ?"
    r"(?P<message>.*)$"
)

RFC5424_PATTERN = (
    r"^<(?P<pri>\d{1,3})>(?P<version>\d+) "
    r"(?P<timestamp>\S+) (?P<hostname>\S+) (?P<appname>\S+) "
    r"(?P<proc_id>\S+) (?P<msg_id>\S+) (?P<structured_data>-|\[.*?\]) ?"
    r"(?P<message>.*)$"
)


class SyslogParse:
    """map_batches callable: syslog lines -> structured columns.

    Emits pri-derived ``facility`` (pri >> 3) and ``severity`` (pri & 7)
    int32 columns alongside the captures, per RFC5424 §6.2.1.
    """

    def __init__(self, rfc: str = "rfc3164", parse_from: str = "raw",
                 on_error: str = "drop"):
        from .parse import RegexParse

        pattern = RFC3164_PATTERN if rfc == "rfc3164" else RFC5424_PATTERN
        self.inner = RegexParse(pattern, parse_from=parse_from,
                                on_error=on_error)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.inner(batch)
        pri = out.column("pri").cast(pa.int32())
        out = out.drop_columns(["pri"])
        # RE2 reports unmatched optional groups as "" — read them as missing
        if "proc_id" in out.column_names:
            i = out.column_names.index("proc_id")
            col = out.column(i)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            fixed = pc.if_else(pc.equal(col, ""), pa.scalar(None, pa.string()), col)
            out = out.set_column(i, "proc_id", fixed)
        out = out.append_column("facility", pc.shift_right(pri, 3))
        out = out.append_column(
            "severity", pc.bit_wise_and(pri, pa.scalar(7, pa.int32()))
        )
        return out


DOCKER_JSON_KEYS = ("log", "stream", "time")

CRI_PATTERN = (
    r"^(?P<time>\S+) (?P<stream>stdout|stderr) (?P<logtag>[PF]) ?(?P<log>.*)$"
)


class ContainerParse:
    """Docker-json / containerd(CRI) log line parser."""

    def __init__(self, fmt: str = "docker", parse_from: str = "raw"):
        self.fmt = fmt
        self.parse_from = parse_from
        if fmt == "cri":
            from .parse import RegexParse

            self.inner = RegexParse(CRI_PATTERN, parse_from=parse_from)
        elif fmt != "docker":
            raise ValueError("fmt must be 'docker' or 'cri'")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fmt == "cri":
            return self.inner(batch)
        rows = batch.column(self.parse_from).to_pylist()
        cols: dict[str, list] = {k: [] for k in DOCKER_JSON_KEYS}
        valid = []
        for r in rows:
            try:
                obj = json.loads(r)
                for k in DOCKER_JSON_KEYS:
                    cols[k].append(obj.get(k))
                valid.append(True)
            except (json.JSONDecodeError, TypeError, AttributeError):
                for k in DOCKER_JSON_KEYS:
                    cols[k].append(None)
                valid.append(False)
        out = batch.drop_columns([self.parse_from])
        for k in DOCKER_JSON_KEYS:
            out = out.append_column(k, pa.array(cols[k], pa.string()))
        return out.filter(pa.array(valid))


def url_decompose(col) -> pa.StructArray:
    """URL converter: URI string -> struct(scheme, host, port, path, query,
    fragment, user) (func_url.go semantics)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    rows = []
    for v in col.to_pylist():
        if v is None:
            rows.append(None)
            continue
        try:
            s = urlsplit(v)
            rows.append(
                {
                    "scheme": s.scheme or None,
                    "host": s.hostname,
                    "port": s.port,
                    "path": s.path or None,
                    "query": s.query or None,
                    "fragment": s.fragment or None,
                    "user": s.username,
                }
            )
        except ValueError:
            rows.append(None)
    return pa.array(
        rows,
        pa.struct(
            [
                ("scheme", pa.string()), ("host", pa.string()),
                ("port", pa.int32()), ("path", pa.string()),
                ("query", pa.string()), ("fragment", pa.string()),
                ("user", pa.string()),
            ]
        ),
    )


# --- severity parser ---------------------------------------------------------

# The 24-level enum (pkg/stanza/entry/severity.go:13-50): Default=0,
# Trace..Trace4=1-4, Debug..Debug4=5-8, Info..Info4=9-12, Warn..Warn4=13-16,
# Error..Error4=17-20, Fatal..Fatal4=21-24.
SEVERITY_TEXT = ["DEFAULT"] + [
    f"{base}{n if n > 1 else ''}"
    for base in ("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")
    for n in (1, 2, 3, 4)
]


def _builtin_severity_mapping(preset: str = "default") -> dict:
    """pkg/stanza/operator/helper/severity_builder.go:20-85: the
    'aliases'/'otel' preset maps names and "1".."24"; the default preset
    adds warning*/err* aliases; 'none' is empty."""
    if preset == "none":
        return {}
    m: dict[str, int] = {}
    level = 1
    for base in ("trace", "debug", "info", "warn", "error", "fatal"):
        for n in (1, 2, 3, 4):
            name = f"{base}{n if n > 1 else ''}"
            m[name] = level
            m[str(level)] = level
            level += 1
    if preset in ("otel", "aliases"):
        return m
    # default preset extras
    warn, err = m["warn"], m["error"]
    for n in (1, 2, 3, 4):
        suffix = str(n) if n > 1 else ""
        m[f"warning{suffix}"] = warn + n - 1
        m[f"err{suffix}"] = err + n - 1
    return m


_HTTP_RANGES = {"2xx": (200, 299), "3xx": (300, 399),
                "4xx": (400, 499), "5xx": (500, 599)}


def _parseable_values(value) -> list[str]:
    """severity_builder.go:200-226: int -> its string; '2xx'.. -> expanded
    range; {'min','max'} dict -> expanded range; string -> lowercased."""
    if isinstance(value, bool):
        raise TypeError(f"type {type(value)} cannot be parsed as a severity")
    if isinstance(value, int):
        return [str(value)]
    if isinstance(value, str):
        if value in _HTTP_RANGES:
            lo, hi = _HTTP_RANGES[value]
            return [str(i) for i in range(lo, hi + 1)]
        return [value.lower()]
    if isinstance(value, bytes):
        return [value.decode().lower()]
    if isinstance(value, dict) and "min" in value and "max" in value:
        lo, hi = int(value["min"]), int(value["max"])
        if lo > hi:
            lo, hi = hi, lo
        return [str(i) for i in range(lo, hi + 1)]
    if isinstance(value, (list, tuple)):
        out = []
        for v in value:
            out.extend(_parseable_values(v))
        return out
    raise TypeError(f"type {type(value)} cannot be parsed as a severity")


class SeverityParser:
    """Full severity_parser (severity_builder.go:120-158): builtin preset +
    custom mapping (aliases, numeric strings, HTTP shorthands, min/max
    ranges), vectorized as ONE dictionary lookup per batch via
    ``pc.index_in`` over the lowercased parse_from column. Unmatched values
    parse to Default=0 / "DEFAULT"."""

    def __init__(self, parse_from: str, preset: str = "default",
                 mapping: dict | None = None,
                 out: str = "severity_number",
                 text_out: str | None = "severity_text"):
        table = _builtin_severity_mapping(preset)
        aliases = _builtin_severity_mapping("aliases")
        for sev_name, values in (mapping or {}).items():
            key = str(sev_name).lower()
            if key not in aliases:
                raise ValueError(f"unknown severity {sev_name!r} in mapping")
            sev = aliases[key]
            for v in _parseable_values(values):
                table[v] = sev
        self.parse_from = parse_from
        self.out = out
        self.text_out = text_out
        self._keys = pa.array(list(table.keys()), pa.string())
        self._vals = np.asarray(list(table.values()), dtype=np.int32)
        self._text = np.asarray(SEVERITY_TEXT, dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.parse_from)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_string(col.type):
            col = col.cast(pa.string())
        if len(self._vals) == 0:  # 'none' preset with no mapping
            sev = np.zeros(batch.num_rows, dtype=np.int32)
            batch = batch.append_column(self.out, pa.array(sev, pa.int32()))
            if self.text_out:
                batch = batch.append_column(
                    self.text_out,
                    pa.array(["DEFAULT"] * batch.num_rows, pa.string()),
                )
            return batch
        low = pc.utf8_lower(col)
        idx = pc.index_in(low, value_set=self._keys)
        idx_np = idx.to_numpy(zero_copy_only=False)
        valid = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else idx.is_valid().to_numpy(zero_copy_only=False)
        pos = np.where(valid, np.nan_to_num(idx_np, nan=0).astype(np.int64), 0)
        sev = np.where(valid, self._vals[pos], np.int32(0)).astype(np.int32)
        batch = batch.append_column(self.out, pa.array(sev, pa.int32()))
        if self.text_out:
            batch = batch.append_column(
                self.text_out, pa.array(self._text[sev].tolist(), pa.string())
            )
        return batch
