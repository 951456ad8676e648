"""pkg/translator/prometheus + prometheus text exposition analogs.

Name translation parity (pkg/translator/prometheus/normalize_name.go,
normalize_unit.go, normalize_label.go, unit_to_ucum.go — the collector's
prometheus naming layer used by prometheusreceiver/prometheusexporter):

- ``build_compliant_name``: tokenize on non-alphanumerics, append the
  UCUM-mapped main unit and ``per_<rate>`` unit when absent, force a
  trailing ``total`` for monotonic sums, ``ratio`` for unit-"1" gauges,
  prefix the namespace, underscore-join, leading-digit guard
  (normalize_name.go:30-103).
- ``trim_prom_suffixes``: the inverse scrape-side trim — drop a
  trailing ``total`` for sums and a trailing unit-token suffix
  (normalize_name.go:105-160).
- ``normalize_prom_label``: non-alphanumerics → ``_``, leading digit →
  ``key_`` prefix, single leading ``_`` → ``key`` prefix
  (normalize_label.go:27-52).
- ``unit_word_to_ucum``: english unit words back to UCUM, handling
  ``_per_`` rates (unit_to_ucum.go:57-68).
- Letter/digit classes are the Go unicode classes (L* / Nd), not
  Python's wider ``str.isdigit``.

Text exposition parse (the wire format prometheusreceiver scrapes;
classic Prometheus text format as implemented by prometheus/common
expfmt TextParser):

- ``# TYPE <name> <counter|gauge|histogram|summary|untyped>`` must
  precede the family's samples and appear at most once; ``# HELP`` at
  most once per family (help text is validated but not emitted —
  documented); other ``#`` comments are ignored.
- sample: ``name[{k="v",...}] value [timestamp_ms]`` — label values
  are double-quoted with ONLY ``\\\\``, ``\\"``, ``\\n`` escapes (any
  other escape is an error); value is Go ParseFloat (±Inf/NaN
  spellings, scientific notation; hex-float spellings out of scope as
  in the carbon stage); timestamp is int64 milliseconds.
- family association: with ``TYPE f histogram``, samples ``f_bucket``
  / ``f_sum`` / ``f_count`` belong to family f; with ``summary``,
  ``f`` / ``f_sum`` / ``f_count``; otherwise the sample name is its
  own family; undeclared names are ``untyped``.
- any malformed line fails the WHOLE document (a scrape either parses
  or fails) — an error row here, like the loki stage.

Execution: input = one exposition document per row (a scrape body),
fan-out one row per sample, block-local, zero shuffle. Sample lines
hit one compiled fast regex; label blobs are parsed once per DISTINCT
blob (vocabulary trick, persisted per worker — scrape series repeat
across documents); odd lines (tabs, extra spaces, invalid blobs) fall
back to the literal scanner for exact error parity.
"""

from __future__ import annotations

import math
import re
import unicodedata

import pyarrow as pa

MAP_TYPE = pa.map_(pa.string(), pa.string())

# normalize_unit.go:16-49
UNIT_MAP = {
    "d": "days", "h": "hours", "min": "minutes", "s": "seconds",
    "ms": "milliseconds", "us": "microseconds", "ns": "nanoseconds",
    "By": "bytes", "KiBy": "kibibytes", "MiBy": "mebibytes",
    "GiBy": "gibibytes", "TiBy": "tibibytes", "KBy": "kilobytes",
    "MBy": "megabytes", "GBy": "gigabytes", "TBy": "terabytes",
    "m": "meters", "V": "volts", "A": "amperes", "J": "joules",
    "W": "watts", "g": "grams",
    "Cel": "celsius", "Hz": "hertz", "1": "", "%": "percent",
}

# normalize_unit.go:52-61
PER_UNIT_MAP = {"s": "second", "m": "minute", "h": "hour", "d": "day",
                "w": "week", "mo": "month", "y": "year"}

WORD_TO_UCUM = {v: k for k, v in UNIT_MAP.items() if v}
WORD_TO_UCUM["ratio"] = "1"
PER_WORD_TO_UCUM = {v: k for k, v in PER_UNIT_MAP.items()}


def _is_letter(c: str) -> bool:
    return unicodedata.category(c).startswith("L")


def _is_digit(c: str) -> bool:
    return unicodedata.category(c) == "Nd"


def _fields_func(s: str, keep) -> list[str]:
    """strings.FieldsFunc: split on runs of non-keep runes."""
    out, cur = [], []
    for c in s:
        if keep(c):
            cur.append(c)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def clean_up_string(s: str) -> str:
    """CleanUpString (normalize_unit.go:125-128)."""
    return "_".join(_fields_func(
        s, lambda c: _is_letter(c) or _is_digit(c)))


def _main_unit(unit: str) -> str:
    tok = unit.split("/", 1)[0].strip()
    if tok and "{" not in tok and "}" not in tok:
        return clean_up_string(UNIT_MAP.get(tok, tok))
    return ""


def _per_unit(unit: str) -> str:
    toks = unit.split("/", 1)
    if len(toks) > 1 and toks[1] != "":
        tok = toks[1].strip()
        if tok and "{" not in tok and "}" not in tok:
            return clean_up_string(PER_UNIT_MAP.get(tok, tok))
    return ""


def build_compliant_prometheus_unit(unit: str) -> str:
    """BuildCompliantPrometheusUnit (normalize_unit.go:63-73)."""
    toks = []
    main, per = _main_unit(unit), _per_unit(unit)
    if main:
        toks.append(main)
    if per:
        toks += ["per", per]
    return "_".join(toks)


def remove_prom_forbidden_runes(s: str) -> str:
    """RemovePromForbiddenRunes (normalize_name.go:163-165)."""
    return "_".join(_fields_func(
        s, lambda c: _is_letter(c) or _is_digit(c) or c in "_:"))


def build_compliant_name(name: str, unit: str = "",
                         metric_type: str = "gauge",
                         monotonic: bool = False,
                         namespace: str = "",
                         add_metric_suffixes: bool = True) -> str:
    """BuildCompliantName (normalize_name.go:30-103). metric_type is
    one of gauge/sum/histogram/summary; counters = sum + monotonic."""
    if not add_metric_suffixes:
        out = remove_prom_forbidden_runes(name)
        if namespace:
            return namespace + "_" + out
        if out and _is_digit(out[0]):
            out = "_" + out
        return out
    toks = _fields_func(name, lambda c: _is_letter(c) or _is_digit(c))
    main, per = _main_unit(unit), _per_unit(unit)
    if main and main not in toks:
        toks.append(main)
    if per and per not in toks:
        toks += ["per", per]
    if metric_type == "sum" and monotonic:
        toks = [t for t in toks if t != "total"] + ["total"]
    if unit == "1" and metric_type == "gauge":
        toks = [t for t in toks if t != "ratio"] + ["ratio"]
    if namespace:
        toks = [namespace] + toks
    out = "_".join(toks)
    if out and _is_digit(out[0]):
        out = "_" + out
    return out


def trim_prom_suffixes(prom_name: str, metric_type: str,
                       unit: str) -> str:
    """TrimPromSuffixes (normalize_name.go:105-160)."""
    toks = prom_name.split("_")
    if len(toks) == 1:
        return prom_name
    if metric_type == "sum" and toks[-1] == "total":
        toks = toks[:-1]
    unit_toks = unit.split("_")
    lu = len(unit_toks)
    if lu and len(toks) > lu:
        if toks[-lu:] == unit_toks:
            toks = toks[:-lu]
    return "_".join(toks)


def normalize_prom_label(label: str) -> str:
    """NormalizeLabel (normalize_label.go:27-52)."""
    if label == "":
        return label
    out = "".join(c if _is_letter(c) or _is_digit(c) else "_"
                  for c in label)
    if _is_digit(out[0]):
        out = "key_" + out
    elif out.startswith("_") and not out.startswith("__"):
        out = "key" + out
    return out


def unit_word_to_ucum(unit: str) -> str:
    """UnitWordToUCUM (unit_to_ucum.go:57-68)."""
    toks = unit.split("_per_", 1)
    out = WORD_TO_UCUM.get(toks[0], toks[0])
    if len(toks) > 1 and toks[1] != "":
        out += "/" + PER_WORD_TO_UCUM.get(toks[1], toks[1])
    return out


# ---------------------------------------------------------------------------
# text exposition parse

_NAME_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")
_LNAME_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*")
_TYPE_RE = re.compile(
    r"^# TYPE ([a-zA-Z_:][a-zA-Z0-9_:]*) "
    r"(counter|gauge|histogram|summary|untyped)$")
_HELP_RE = re.compile(r"^# HELP ([a-zA-Z_:][a-zA-Z0-9_:]*)(?: (.*))?$")
_SAMPLE_FAST = re.compile(
    r"^(?P<n>[a-zA-Z_:][a-zA-Z0-9_:]*)"
    r"(?:\{(?P<l>.*)\})?"
    r" (?P<v>[^ \t]+)(?: (?P<t>-?\d+))?$")
_ESCAPES = {"\\": "\\", '"': '"', "n": "\n"}


def parse_float_go(s: str):
    """strconv.ParseFloat for exposition values. None on failure."""
    t = s.strip()
    sign = 1.0
    u = t
    if u and u[0] in "+-":
        sign = -1.0 if u[0] == "-" else 1.0
        u = u[1:]
    lu = u.lower()
    if lu in ("inf", "infinity"):
        return sign * math.inf
    if lu == "nan":
        return math.nan
    if re.fullmatch(r"(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", u):
        return sign * float(u)
    return None


def _unescape_label_value(v: str):
    """Only \\\\, \\", \\n are valid escapes; others error (expfmt)."""
    if "\\" not in v:
        return v
    out, i, n = [], 0, len(v)
    while i < n:
        c = v[i]
        if c == "\\":
            if i + 1 >= n or v[i + 1] not in _ESCAPES:
                return None
            out.append(_ESCAPES[v[i + 1]])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_label_blob(blob: str):
    """Parse the inside of {...}. Returns list[(k, v)] or None."""
    pairs = []
    i, n = 0, len(blob)
    while i < n:
        while i < n and blob[i] in " \t":
            i += 1
        if i >= n:
            break
        m = _LNAME_RE.match(blob, i)
        if not m:
            return None
        k = m.group(0)
        i = m.end()
        while i < n and blob[i] in " \t":
            i += 1
        if i >= n or blob[i] != "=":
            return None
        i += 1
        while i < n and blob[i] in " \t":
            i += 1
        if i >= n or blob[i] != '"':
            return None
        i += 1
        out = []
        while i < n:
            c = blob[i]
            if c == "\\":
                if i + 1 >= n or blob[i + 1] not in _ESCAPES:
                    return None
                out.append(_ESCAPES[blob[i + 1]])
                i += 2
                continue
            if c == '"':
                break
            out.append(c)
            i += 1
        if i >= n:
            return None
        i += 1
        pairs.append((k, "".join(out)))
        while i < n and blob[i] in " \t":
            i += 1
        if i < n:
            if blob[i] != ",":
                return None
            i += 1
    return pairs


def scan_sample_line(s: str):
    """Literal sample-line scanner — the exact-parity fallback.
    Returns (name, labels, value_str, ts_str|None) or an error str."""
    m = _NAME_RE.match(s)
    if not m:
        return "invalid metric name"
    name = m.group(0)
    i = m.end()
    labels = []
    if i < len(s) and s[i] == "{":
        j = s.rfind("}")
        if j < i:
            return "unterminated label set"
        parsed = parse_label_blob(s[i + 1:j])
        if parsed is None:
            return "invalid label set"
        labels = parsed
        i = j + 1
    if i >= len(s) or s[i] not in " \t":
        return "expected value"
    while i < len(s) and s[i] in " \t":
        i += 1
    j = i
    while j < len(s) and s[j] not in " \t":
        j += 1
    vstr = s[i:j]
    i = j
    while i < len(s) and s[i] in " \t":
        i += 1
    ts = None
    if i < len(s):
        j = i
        while j < len(s) and s[j] not in " \t":
            j += 1
        ts = s[i:j]
        i = j
        while i < len(s) and s[i] in " \t":
            i += 1
        if i < len(s):
            return "trailing characters"
        if not re.fullmatch(r"-?\d+", ts):
            return "invalid timestamp"
    if vstr == "":
        return "expected value"
    return name, labels, vstr, ts


def _resolve_family(name: str, fams: dict):
    """expfmt family association for one sample name."""
    if name in fams:
        return name, fams[name]
    for suffix in ("_bucket", "_sum", "_count"):
        if name.endswith(suffix):
            base = name[: -len(suffix)]
            t = fams.get(base)
            if t == "histogram" or (t == "summary" and
                                    suffix != "_bucket"):
                return base, t
    return name, "untyped"


def decode_exposition(doc: str, blob_cache: dict | None = None):
    """One exposition document → list of sample rows, or error str."""
    fams: dict = {}
    helps: set = set()
    seen_samples: set = set()
    rows = []
    cache = blob_cache if blob_cache is not None else {}
    for line in doc.split("\n"):
        line = line.rstrip("\r")
        if line.strip() == "":
            continue
        if line.startswith("#"):
            tm = _TYPE_RE.match(line)
            if tm:
                fam, typ = tm.group(1), tm.group(2)
                if fam in fams:
                    return f"second TYPE line for metric {fam}"
                if any(n == fam or (typ in ("histogram", "summary") and
                                    n.startswith(fam + "_"))
                       for n in seen_samples):
                    return f"TYPE reported after samples for {fam}"
                fams[fam] = typ
                continue
            if line.startswith("# TYPE"):
                return "malformed TYPE line"
            hm = _HELP_RE.match(line)
            if hm:
                if hm.group(1) in helps:
                    return f"second HELP line for metric {hm.group(1)}"
                helps.add(hm.group(1))
                continue
            if line.startswith("# HELP"):
                return "malformed HELP line"
            continue  # other comments ignored
        fm = _SAMPLE_FAST.match(line)
        res = None
        if fm:
            blob = fm.group("l")
            if blob is None:
                labels = []
            else:
                if blob in cache:
                    labels = cache[blob]
                else:
                    labels = parse_label_blob(blob)
                    cache[blob] = labels
            if labels is not None:
                res = (fm.group("n"), labels, fm.group("v"),
                       fm.group("t"))
        if res is None:
            res = scan_sample_line(line)   # exact error parity
        if isinstance(res, str):
            return res
        name, labels, vstr, ts = res
        val = parse_float_go(vstr)
        if val is None:
            return f"invalid value {vstr!r}"
        seen_samples.add(name)
        family, typ = _resolve_family(name, fams)
        rows.append({"name": name, "family": family, "type": typ,
                     "labels": labels, "value": val,
                     "timestamp_ms": int(ts) if ts is not None
                     else None})
    return rows


class _ParsePromText:
    def __init__(self, text_col: str, on_error: str):
        self.text_col = text_col
        self.on_error = on_error
        self._blob_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column(self.text_col).to_pylist()
        parent, cols = [], {"name": [], "family": [], "type": [],
                            "labels": [], "value": [],
                            "timestamp_ms": [], "error": []}
        for i, doc in enumerate(docs):
            res = decode_exposition(doc if doc is not None else "",
                                    self._blob_cache)
            if isinstance(res, str):
                if self.on_error == "drop":
                    continue
                parent.append(i)
                for k in ("name", "family", "type", "value",
                          "timestamp_ms"):
                    cols[k].append(None)
                cols["labels"].append([])
                cols["error"].append(res)
                continue
            for row in res:
                parent.append(i)
                for k in ("name", "family", "type", "value",
                          "timestamp_ms"):
                    cols[k].append(row[k])
                cols["labels"].append(row["labels"])
                cols["error"].append(None)
        out = batch.take(pa.array(parent, pa.int64()))
        for name, typ in (("name", pa.string()), ("family", pa.string()),
                          ("type", pa.string()), ("labels", MAP_TYPE),
                          ("value", pa.float64()),
                          ("timestamp_ms", pa.int64()),
                          ("error", pa.string())):
            arr = pa.array(cols[name], typ)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name),
                                     name, arr)
            else:
                out = out.append_column(name, arr)
        if self.on_error == "drop":
            out = out.drop_columns(["error"])
        return out


def parse_prometheus_text(ds, text_col: str = "exposition", *,
                          on_error: str = "drop"):
    """Prometheus text exposition documents → one row per sample
    (block-local fan-out, zero shuffle)."""
    return ds.map_batches(_ParsePromText(text_col, on_error),
                          batch_format="pyarrow", zero_copy_batch=True)


class _NormalizePromNames:
    """Adds a prom_name column — BuildCompliantName over
    (name, unit, type, monotonic), memoized per distinct tuple."""

    def __init__(self, name_col, unit_col, type_col, monotonic_col,
                 namespace, add_metric_suffixes, out_col):
        self.cols = (name_col, unit_col, type_col, monotonic_col)
        self.namespace = namespace
        self.add = add_metric_suffixes
        self.out_col = out_col
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        name_c, unit_c, type_c, mono_c = self.cols
        names = batch.column(name_c).to_pylist()
        units = (batch.column(unit_c).to_pylist() if unit_c
                 else [""] * len(names))
        types = (batch.column(type_c).to_pylist() if type_c
                 else ["gauge"] * len(names))
        monos = (batch.column(mono_c).to_pylist() if mono_c
                 else [False] * len(names))
        out = []
        for key in zip(names, units, types, monos):
            hit = self._cache.get(key)
            if hit is None:
                n, u, t, m = key
                hit = build_compliant_name(
                    n or "", u or "", t or "gauge", bool(m),
                    self.namespace, self.add)
                self._cache[key] = hit
            out.append(hit)
        return batch.append_column(
            self.out_col, pa.array(out, pa.string()))


def normalize_prom_names(ds, name_col: str = "name",
                         unit_col: str | None = None,
                         type_col: str | None = None,
                         monotonic_col: str | None = None, *,
                         namespace: str = "",
                         add_metric_suffixes: bool = True,
                         out_col: str = "prom_name"):
    """prometheus BuildCompliantName as a column transform
    (block-local; per-distinct-tuple memoization per worker)."""
    return ds.map_batches(
        _NormalizePromNames(name_col, unit_col, type_col, monotonic_col,
                            namespace, add_metric_suffixes, out_col),
        batch_format="pyarrow", zero_copy_batch=True)
