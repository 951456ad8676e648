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
