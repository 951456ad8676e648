"""OTTL-subset boolean expression compiler -> vectorized pyarrow masks.

The reference's transform language (OTTL) evaluates a boolean expression per
record: comparisons ``== != < <= > >=`` over paths and literals, combined
with ``and / or / not`` and parentheses (pkg/ottl/boolean_value.go,
pkg/ottl/compare.go, pkg/ottl/LANGUAGE.md "Boolean Expressions").  Here a
condition string compiles ONCE to a closure that evaluates over a whole
``pyarrow.Table`` with ``pyarrow.compute`` kernels — one mask per batch, no
per-row interpretation.

Supported grammar (the subset our corpus + routing tables exercise):

    expr     := or
    or       := and ("or" and)*
    and      := unary ("and" unary)*
    unary    := "not" unary | "(" expr ")" | comparison
    compare  := sum (OP sum | "in" "(" lit ("," lit)* ")")?
    sum      := product (("+" | "-") product)*
    product  := operand (("*" | "/") operand)*
    operand  := path | literal | list_lit | converter "(" args ")" | ENUM
    path     := IDENT ("[" (STR | INT) "]")*
    list_lit := "[" lit ("," lit)* "]"
    literal  := "str" | 'str' | int | float | true | false | nil

Round-3 additions (pkg/ottl/grammar.go:236 `Path`/`Keys`, LANGUAGE.md
"Paths" / "Enums" / "Lists"):

- **Path indexing** — ``attributes["k"]`` looks a string key up in a
  map- or struct-typed column (vectorized ``pc.map_lookup`` /
  ``pc.struct_field``); ``body[0]`` indexes a list-typed column
  (``pc.list_element``). Missing keys / columns read as nil, matching
  OTTL's nil-path semantics. Indexes chain: ``attrs["a"][0]``.
- **Enums** — uppercase symbols (``SEVERITY_NUMBER_WARN``,
  ``STATUS_CODE_ERROR``, ``SPAN_KIND_SERVER``) resolve to their int64
  value at compile time, exactly the sets the reference's log/trace
  contexts register.
- **List literals** — ``["a", "b"]`` as a comparison RHS or converter
  argument.

Math follows pkg/ottl/LANGUAGE.md "Math Expressions" / pkg/ottl/math.go:
int and float NEVER mix (a type error, like the reference), int division
truncates, division by zero errors.

Converters usable inside conditions: ``IsMatch(col, "regex")``,
``Len(col)``, ``HasPrefix/HasSuffix(col, "s")`` — mirroring the most common
condition converters in pkg/ottl/ottlfuncs.

Null semantics: comparisons against null yield null which is treated as
*no match* (mask filled False), matching OTTL where a missing path fails the
condition rather than erroring (error_mode=ignore).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
      | (?P<op>==|!=|<=|>=|<|>)
      | (?P<arith>[+\-*/])
      | (?P<lpar>\() | (?P<rpar>\)) | (?P<comma>,)
      | (?P<lbrack>\[) | (?P<rbrack>\])
      | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "true", "false", "nil", "null"}

# Enum symbol -> int64, the sets the reference's contexts register
# (pkg/ottl/contexts/internal/logging + plog/ptrace enum tables;
# LANGUAGE.md "Enums": uppercase symbols replaced by their int64 value).
_SEV_BASE = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17,
             "FATAL": 21}
ENUMS: dict[str, int] = {"SEVERITY_NUMBER_UNSPECIFIED": 0}
for _name, _base in _SEV_BASE.items():
    ENUMS[f"SEVERITY_NUMBER_{_name}"] = _base
    for _i in (2, 3, 4):
        ENUMS[f"SEVERITY_NUMBER_{_name}{_i}"] = _base + _i - 1
ENUMS.update({
    "STATUS_CODE_UNSET": 0, "STATUS_CODE_OK": 1, "STATUS_CODE_ERROR": 2,
    "SPAN_KIND_UNSPECIFIED": 0, "SPAN_KIND_INTERNAL": 1,
    "SPAN_KIND_SERVER": 2, "SPAN_KIND_CLIENT": 3, "SPAN_KIND_PRODUCER": 4,
    "SPAN_KIND_CONSUMER": 5,
})


@dataclass
class _Tok:
    kind: str
    value: str


def _tokenize(text: str) -> list[_Tok]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {text[pos:]!r} in condition {text!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        # "a -5" after an operand means subtraction, not a negative literal
        if (kind == "num" and val.startswith("-") and toks
                and toks[-1].kind in ("num", "str", "ident", "rpar")):
            toks.append(_Tok("arith", "-"))
            val = val[1:]
        if kind == "ident" and val.lower() in _KEYWORDS:
            toks.append(_Tok(val.lower(), val.lower()))
        else:
            toks.append(_Tok(kind, val))
    toks.append(_Tok("eof", ""))
    return toks


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace("\\\"", '"').replace("\\'", "'").replace("\\\\", "\\")


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.text = text

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> _Tok:
        t = self.next()
        if t.kind != kind:
            raise ValueError(f"expected {kind}, got {t.kind}({t.value}) in {self.text!r}")
        return t

    # --- grammar ---
    def parse(self):
        node = self.or_expr()
        self.expect("eof")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek().kind == "or":
            self.next()
            rhs = self.and_expr()
            node = ("or", node, rhs)
        return node

    def and_expr(self):
        node = self.unary()
        while self.peek().kind == "and":
            self.next()
            rhs = self.unary()
            node = ("and", node, rhs)
        return node

    def unary(self):
        t = self.peek()
        if t.kind == "not":
            self.next()
            return ("not", self.unary())
        if t.kind == "lpar":
            # Lookahead: "(expr)" vs an operand-level paren is resolved by
            # trying a full boolean sub-expression first.
            save = self.i
            self.next()
            try:
                node = self.or_expr()
                self.expect("rpar")
                return node
            except ValueError:
                self.i = save
        return self.comparison()

    def comparison(self):
        lhs = self.sum()
        t = self.peek()
        if t.kind == "op":
            op = self.next().value
            rhs = self.sum()
            return ("cmp", op, lhs, rhs)
        if t.kind == "in":
            self.next()
            # both spellings: in ("a", "b") and in ["a", "b"] (list literal)
            close = "rbrack" if self.peek().kind == "lbrack" else "rpar"
            self.next() if close == "rbrack" else self.expect("lpar")
            lits = [self.literal()]
            while self.peek().kind == "comma":
                self.next()
                lits.append(self.literal())
            self.expect(close)
            return ("in", lhs, lits)
        # bare truthy operand (e.g. a boolean column)
        return ("truthy", lhs)

    def sum(self):
        node = self.product()
        while self.peek().kind == "arith" and self.peek().value in "+-":
            op = self.next().value
            node = ("arith", op, node, self.product())
        return node

    def product(self):
        node = self.operand()
        while self.peek().kind == "arith" and self.peek().value in "*/":
            op = self.next().value
            node = ("arith", op, node, self.operand())
        return node

    def operand(self):
        t = self.peek()
        if t.kind in ("num", "str") or t.kind in ("true", "false", "nil", "null"):
            return ("lit", self.literal())
        if t.kind == "lbrack":  # list literal: ["a", "b", ...]
            self.next()
            items = []
            if self.peek().kind != "rbrack":
                items.append(self.literal())
                while self.peek().kind == "comma":
                    self.next()
                    items.append(self.literal())
            self.expect("rbrack")
            return ("lit", items)
        if t.kind == "ident":
            name = self.next().value
            if name in ENUMS:  # uppercase enum symbol -> int64 literal
                return ("lit", ENUMS[name])
            if self.peek().kind == "lpar":  # converter call
                self.next()
                args = []
                if self.peek().kind != "rpar":
                    args.append(self.sum())
                    while self.peek().kind == "comma":
                        self.next()
                        args.append(self.sum())
                self.expect("rpar")
                return self._postfix(("call", name, args))
            return self._postfix(("col", name))
        raise ValueError(f"unexpected token {t.kind} in {self.text!r}")

    def _postfix(self, node):
        """Chained path indexes: attributes["k"], body[0], attrs["a"][0].

        ``cache["k"]`` compiles to the flat scratch column ``cache.k`` —
        the OTTL per-record scratch map (pkg/ottl/contexts/ottllog/
        log.go:182 ``cache`` path) in this engine's column model. The
        columns exist only inside a Transform statement sequence
        (stages/transform.py drops the ``cache.*`` namespace at batch
        end); reading a never-written cache key is nil, like any missing
        column."""
        while self.peek().kind == "lbrack":
            self.next()
            key = self.literal()
            if not isinstance(key, (str, int)) or isinstance(key, bool):
                raise ValueError(
                    f"path index must be a string or int literal in {self.text!r}"
                )
            self.expect("rbrack")
            if node == ("col", "cache") and isinstance(key, str):
                node = ("col", f"cache.{key}")
            else:
                node = ("index", node, key)
        return node

    def literal(self):
        t = self.next()
        if t.kind == "num":
            return float(t.value) if "." in t.value else int(t.value)
        if t.kind == "str":
            return _unquote(t.value)
        if t.kind in ("true", "false"):
            return t.kind == "true"
        if t.kind in ("nil", "null"):
            return None
        raise ValueError(f"expected literal, got {t.kind} in {self.text!r}")


_CMP = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def _eval_operand(node, table: pa.Table):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        name = node[1]
        if name not in table.column_names:
            return None  # missing path reads as nil (LANGUAGE.md "Paths")
        return table.column(name)
    if kind == "call":
        name, args = node[1], node[2]
        vals = [_eval_operand(a, table) for a in args]
        return _call_converter(name, vals)
    if kind == "index":
        base = _eval_operand(node[1], table)
        if base is None:
            return None  # nil base indexes to nil (LANGUAGE.md "Paths")
        return _index_into(base, node[2])
    if kind == "arith":
        _, op, l, r = node
        return _eval_arith(op, _eval_operand(l, table),
                           _eval_operand(r, table))
    raise ValueError(f"bad operand {node}")


def _index_into(base, key):
    """Vectorized path index: map["k"] / struct["k"] / list[0] -> value
    array; a missing key or field reads as nil per OTTL path semantics."""
    if not isinstance(base, (pa.Array, pa.ChunkedArray)):
        raise ValueError(f"cannot index a scalar with [{key!r}]")
    t = base.type
    if pa.types.is_map(t):
        if not isinstance(key, str):
            raise ValueError("map columns index with a string key")
        return pc.map_lookup(base, query_key=key, occurrence="first")
    if pa.types.is_struct(t):
        if not isinstance(key, str):
            raise ValueError("struct columns index with a string key")
        if t.get_field_index(key) < 0:
            return None  # unknown field -> nil, not an error
        return pc.struct_field(base, key)
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        if not isinstance(key, int):
            raise ValueError("list columns index with an int")
        # pc.list_element errors on out-of-range; OTTL reads it as nil.
        # Mask short rows to null first, then gather.
        if isinstance(base, pa.ChunkedArray):
            base = base.combine_chunks()
        lens = pc.list_value_length(base)
        ok = pc.greater(pc.fill_null(lens, 0), key)
        safe = base.filter(ok)
        vals = pc.list_element(safe, key) if len(safe) else \
            pa.array([], t.value_type)
        # scatter back: null where the row was too short (null index -> null)
        import numpy as np

        ok_np = ok.to_numpy(zero_copy_only=False)
        idx = np.full(len(base), -1, dtype=np.int64)
        idx[ok_np] = np.arange(len(safe))
        short = idx < 0
        take_idx = pa.array(np.where(short, 0, idx), pa.int64(), mask=short)
        return vals.take(take_idx)
    raise ValueError(f"type {t} does not support [{key!r}] indexing")


def _is_floatish(v) -> bool:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return pa.types.is_floating(v.type)
    return isinstance(v, float)


def _is_intish(v) -> bool:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return pa.types.is_integer(v.type)
    return isinstance(v, int) and not isinstance(v, bool)


def _eval_arith(op: str, lv, rv):
    """OTTL math (pkg/ottl/math.go): int∘int -> int (truncating /),
    float∘float -> float; MIXING int and float is a type error; division
    by zero errors (explicitly checked for floats, where Arrow would give
    inf)."""
    if lv is None or rv is None:
        raise ValueError(f"math on nil operand ({op})")
    li, lf = _is_intish(lv), _is_floatish(lv)
    ri, rf = _is_intish(rv), _is_floatish(rv)
    if not ((li or lf) and (ri or rf)):
        raise ValueError(f"non-numeric operand for {op!r}")
    if (li and rf) or (lf and ri):
        raise ValueError(
            f"int and float never mix in OTTL math ({op!r}); Double()/Int() "
            "convert explicitly"
        )
    if op == "+":
        return pc.add_checked(lv, rv)
    if op == "-":
        return pc.subtract_checked(lv, rv)
    if op == "*":
        return pc.multiply_checked(lv, rv)
    if lf:  # float division: arrow yields inf on 0 — OTTL errors
        rz = pc.equal(rv, 0.0) if isinstance(rv, (pa.Array, pa.ChunkedArray)) \
            else (rv == 0.0)
        bad = pc.any(rz).as_py() if not isinstance(rz, bool) else rz
        if bad:
            raise ZeroDivisionError("division by zero in condition math")
        return pc.divide_checked(lv, rv)
    return pc.divide_checked(lv, rv)  # int: truncates; raises on zero


def _call_converter(name: str, vals: list):
    lname = name.lower()
    if lname == "ismatch":
        col, pattern = vals
        return pc.match_substring_regex(col, pattern)
    if lname == "len":
        (col,) = vals
        typ = col.type if isinstance(col, (pa.Array, pa.ChunkedArray)) else None
        if typ is not None and (pa.types.is_list(typ) or pa.types.is_large_list(typ)):
            return pc.list_value_length(col)
        return pc.utf8_length(col)
    if lname == "hasprefix":
        col, prefix = vals
        return pc.starts_with(col, prefix)
    if lname == "hassuffix":
        col, suffix = vals
        return pc.ends_with(col, suffix)
    raise ValueError(f"unknown condition converter {name!r}")


def _eval_bool(node, table: pa.Table):
    kind = node[0]
    n = table.num_rows
    if kind == "and":
        return pc.and_kleene(_eval_bool(node[1], table), _eval_bool(node[2], table))
    if kind == "or":
        return pc.or_kleene(_eval_bool(node[1], table), _eval_bool(node[2], table))
    if kind == "not":
        return pc.invert(_eval_bool(node[1], table))
    if kind == "cmp":
        _, op, lhs, rhs = node
        lv, rv = _eval_operand(lhs, table), _eval_operand(rhs, table)
        if lv is None or rv is None:
            # nil comparisons (pkg/ottl/compare.go): == / != test nil-ness;
            # ordering ops against nil are always false
            if op not in ("==", "!="):
                return pa.array([False] * n, pa.bool_())
            arr = rv if lv is None else lv
            if isinstance(arr, (pa.Array, pa.ChunkedArray)):
                isnull = pc.is_null(arr)
                return isnull if op == "==" else pc.invert(isnull)
            eq = (lv is None) == (rv is None)
            val = eq if op == "==" else (not eq)
            return pa.array([val] * n, pa.bool_())
        res = _CMP[op](lv, rv)
        if isinstance(res, pa.Scalar):  # lit-vs-lit: broadcast to a mask
            return pa.array([res.as_py()] * n, pa.bool_())
        return res
    if kind == "in":
        _, lhs, lits = node
        lv = _eval_operand(lhs, table)
        if lv is None:
            return pa.array([False] * n, pa.bool_())
        return pc.is_in(lv, value_set=pa.array(lits))
    if kind == "truthy":
        v = _eval_operand(node[1], table)
        if v is None:
            return pa.array([False] * n, pa.bool_())
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return v.cast(pa.bool_())
        return pa.array([bool(v)] * n, pa.bool_())
    raise ValueError(f"bad node {node}")


class CompiledCondition:
    """A compiled OTTL-subset condition; call with a pyarrow Table -> mask."""

    def __init__(self, text: str):
        self.text = text
        self._ast = _Parser(text).parse()

    def __call__(self, table: pa.Table) -> pa.ChunkedArray:
        mask = _eval_bool(self._ast, table)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return pc.fill_null(mask, False)

    def __repr__(self) -> str:  # pragma: no cover
        return f"CompiledCondition({self.text!r})"


def compile_condition(text: str) -> CompiledCondition:
    return CompiledCondition(text)


class CompiledValue:
    """A compiled OTTL-subset VALUE expression (the operand grammar —
    paths with indexing, converters, math, enums); call with a Table to get
    the value column. Missing paths evaluate to nil (returned as an
    all-null array), mirroring OTTL getter semantics."""

    def __init__(self, text: str):
        self.text = text
        p = _Parser(text)
        self._ast = p.sum()
        p.expect("eof")

    def __call__(self, table: pa.Table):
        v = _eval_operand(self._ast, table)
        if v is None:
            return pa.nulls(table.num_rows)
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            n = table.num_rows
            return pa.array([v] * n)
        return v

    def __repr__(self) -> str:  # pragma: no cover
        return f"CompiledValue({self.text!r})"


def compile_value(text: str) -> CompiledValue:
    return CompiledValue(text)
