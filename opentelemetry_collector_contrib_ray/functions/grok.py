"""Grok pattern compiler — ExtractGrokPatterns analog.

Reference semantics (pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:18-60):
a grok expression like ``%{IP:client} %{WORD:method} %{NUMBER:bytes:int}``
expands, via a built-in pattern library plus user-supplied
``NAME=definition`` entries, into a regex with named captures; only named
captures are emitted (namedCapturesOnly), and ``:int`` / ``:float`` type
suffixes cast the capture.

The compiled output is a plain RE2-style regex usable by the vectorized
:class:`~..stages.parse.RegexParse` stage (one ``pc.extract_regex`` per
batch) — grok is a compile-time expansion, never a per-row interpreter.

The built-in library is the standard public grok core set (the same
pattern definitions shipped by logstash/elastic grok, which are public
domain-style regex idioms).
"""

from __future__ import annotations

import re

import pyarrow as pa

# Core pattern library (subset of the standard grok base patterns).
BASE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"\"[^\"]*\"|'[^']*'",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}",
    "IP": r"(?:%{IPV4}|%{IPV6})",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "LOGLEVEL": (
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|"
        r"ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|"
        r"[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?"
    ),
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "UNIXTIME": r"\d{9,13}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(int|float|long|double))?\}")

_TYPE_MAP = {
    "int": pa.int64(),
    "long": pa.int64(),
    "float": pa.float64(),
    "double": pa.float64(),
}


def compile_grok(
    expression: str,
    extra_patterns: dict[str, str] | None = None,
    _depth: int = 0,
) -> tuple[str, dict[str, pa.DataType]]:
    """Expand a grok expression -> (named-capture regex, {capture: cast type}).

    ``extra_patterns`` mirrors the user ``PATTERNNAME=definition`` entries
    of the reference converter.
    """
    if _depth > 20:
        raise ValueError("grok pattern recursion too deep (cycle?)")
    lib = dict(BASE_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)
    types: dict[str, pa.DataType] = {}

    def sub(m: re.Match) -> str:
        name, capture, typ = m.group(1), m.group(2), m.group(3)
        try:
            body = lib[name]
        except KeyError:
            raise ValueError(f"unknown grok pattern %{{{name}}}") from None
        # recursively expand nested %{...} references inside the body
        expanded, nested_types = compile_grok(body, extra_patterns, _depth + 1)
        types.update(nested_types)
        if capture:
            safe = capture.replace(".", "_").replace("[", "_").replace("]", "")
            if typ:
                types[safe] = _TYPE_MAP[typ]
            return f"(?P<{safe}>{expanded})"
        return f"(?:{expanded})"

    regex = _GROK_REF.sub(sub, expression)
    return regex, types


def grok_parse_stage(
    expression: str,
    parse_from: str = "raw",
    extra_patterns: dict[str, str] | None = None,
    on_error: str = "drop",
    keep_input: bool = False,
):
    """Build a RegexParse stage from a grok expression (compile-once)."""
    from ..stages.parse import RegexParse

    regex, types = compile_grok(expression, extra_patterns)
    return RegexParse(regex, parse_from=parse_from, types=types,
                      on_error=on_error, keep_input=keep_input)
