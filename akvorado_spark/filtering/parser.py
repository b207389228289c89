"""Filter DSL parser.

A hand-rolled tokenizer + recursive-descent parser covering the
grammar *surface* of the reference's PEG grammar (reference:
console/filter/parser.peg:17-53 for the boolean skeleton, :65-282 for
the typed conditions; we re-implement the language, not the pigeon
parser):

    expr     := or
    or       := and ( OR and )*
    and      := not ( AND not )*
    not      := NOT not | '(' expr ')' | condition
    condition:= Column Op Literal | Column IN '(' lit, ... ')' | ...

Case-insensitive keywords/columns, `--` line comments and `/* */`
block comments, single- or double-quoted strings.

The output is a small AST (And/Or/Not/Cond) that the compiler lowers
to Spark Columns and to DuckDB SQL (filtering/compile.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from akvorado_spark.filtering.model import (
    ETYPE_VALUES,
    PROTO_NUMBERS,
    ColumnSpec,
    FilterSchema,
)


class FilterError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class And:
    parts: tuple


@dataclass(frozen=True)
class Or:
    parts: tuple


@dataclass(frozen=True)
class Not:
    part: object


@dataclass(frozen=True)
class Cond:
    column: str          # canonical column name
    kind: str            # column kind from the model
    op: str              # = != < <= > >= << !<< like ilike unlike iunlike in notin col=
    value: object        # python literal, list of literals, or column name for col=


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*|/\*.*?\*/)
  | (?P<op><<|!<<|!=|<=|>=|=|<|>)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<word>[A-Za-z0-9_.:/-]+)
    """,
    re.VERBOSE | re.DOTALL,
)

KEYWORDS = {"and", "or", "not", "in", "notin", "like", "ilike", "unlike", "iunlike"}


@dataclass
class Token:
    typ: str  # op lparen rparen comma str word kw
    val: str
    pos: int


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise FilterError(f"unexpected character at offset {i}: {text[i:i+10]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "word" and val.lower() in KEYWORDS:
            out.append(Token("kw", val.lower(), m.start()))
        elif kind == "str":
            out.append(Token("str", _unquote(val), m.start()))
        else:
            out.append(Token(kind, val, m.start()))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def _parser_type(spec) -> str:
    """The reference's ParserType granularity: ASN columns are their
    own type — a plain uint never pairs with one in col-col
    comparisons (console/filter.go:584-597)."""
    if spec.kind == "uint" and spec.name.endswith("AS"):
        return "asn"
    return spec.kind


class _Parser:
    def __init__(self, tokens: list[Token], schema: FilterSchema):
        self.toks = tokens
        self.i = 0
        self.schema = schema

    def peek(self) -> Token | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise FilterError("unexpected end of filter")
        self.i += 1
        return t

    def expect(self, typ: str, val: str | None = None) -> Token:
        t = self.next()
        if t.typ != typ or (val is not None and t.val.lower() != val):
            raise FilterError(f"expected {val or typ} at offset {t.pos}, got {t.val!r}")
        return t

    # --- boolean skeleton -------------------------------------------------
    def parse(self):
        node = self.parse_or()
        if self.peek() is not None:
            t = self.peek()
            raise FilterError(f"trailing input at offset {t.pos}: {t.val!r}")
        return node

    def parse_or(self):
        parts = [self.parse_and()]
        while (t := self.peek()) and t.typ == "kw" and t.val == "or":
            self.next()
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def parse_and(self):
        parts = [self.parse_not()]
        while (t := self.peek()) and t.typ == "kw" and t.val == "and":
            self.next()
            parts.append(self.parse_not())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def parse_not(self):
        t = self.peek()
        if t and t.typ == "kw" and t.val == "not":
            self.next()
            return Not(self.parse_not())
        if t and t.typ == "lparen":
            self.next()
            node = self.parse_or()
            self.expect("rparen")
            return node
        return self.parse_condition()

    # --- typed conditions -------------------------------------------------
    def parse_condition(self) -> Cond:
        t = self.next()
        if t.typ != "word":
            raise FilterError(f"expected column name at offset {t.pos}, got {t.val!r}")
        spec = self.schema.lookup(t.val)
        if spec is None:
            raise FilterError(f"unknown column {t.val!r} at offset {t.pos}")
        op_t = self.next()
        if op_t.typ == "kw" and op_t.val in ("in", "notin"):
            values = self._parse_list()
            return self._typed(spec, op_t.val, values)
        if op_t.typ == "kw" and op_t.val in ("like", "ilike", "unlike", "iunlike"):
            if spec.kind != "string":
                raise FilterError(f"{op_t.val.upper()} only valid on string columns")
            v = self.next()
            if v.typ != "str":
                raise FilterError(f"expected quoted pattern at offset {v.pos}")
            return Cond(spec.name, spec.kind, op_t.val, v.val)
        if op_t.typ != "op":
            raise FilterError(f"expected operator at offset {op_t.pos}, got {op_t.val!r}")
        op = op_t.val
        # column-to-column comparisons (P4/P5): the reference types the
        # pairing by PARSER TYPE — plain uints compare with all six
        # operators, ASN and string columns only with =/!=, and ASN
        # never pairs with a plain uint (console/filter.go:580-601,
        # parser_test.go `SrcPort < SrcAS` invalid)
        nxt = self.peek()
        if (
            nxt is not None
            and nxt.typ == "word"
            and self.schema.lookup(nxt.val) is not None
        ):
            other = self.schema.lookup(nxt.val)
            pt, po = _parser_type(spec), _parser_type(other)
            allowed = {
                "uint": ("=", "!=", "<", "<=", ">", ">="),
                "asn": ("=", "!="),
                "string": ("=", "!="),
            }
            if pt == po and op in allowed.get(pt, ()):
                self.next()
                return Cond(spec.name, spec.kind, "col" + op, other.name)
        lit = self._parse_literal()
        return self._typed(spec, op, lit)

    def _parse_list(self) -> list:
        self.expect("lparen")
        vals = [self._parse_literal()]
        while (t := self.peek()) and t.typ == "comma":
            self.next()
            vals.append(self._parse_literal())
        self.expect("rparen")
        return vals

    def _parse_literal(self):
        # Keep the quoted-vs-bare distinction: the reference's grammar
        # types literals lexically — strings MUST be quoted (a bare
        # word there is a typo'd column/keyword, parser_test.go
        # TestInvalidFilter `InIfProvider = OutIfProviderr`), while IP
        # literals must NOT be (`ExporterAddress="2001:db8::1"` is
        # invalid).
        t = self.next()
        if t.typ == "str":
            return ("str", t.val)
        if t.typ == "word":
            return ("word", t.val)
        raise FilterError(f"expected literal at offset {t.pos}, got {t.val!r}")

    # --- literal typing/validation per column kind ------------------------
    def _typed(self, spec: ColumnSpec, op: str, value) -> Cond:
        kind = spec.kind
        if isinstance(value, list):
            if op not in ("in", "notin"):
                raise FilterError(f"list literal needs IN/NOTIN on {spec.name}")
            typed = [self._one(spec, v) for v in value]
            return Cond(spec.name, kind, op, typed)
        allowed = {
            "ip": {"=", "!=", "<<", "!<<"},
            "prefix": {"=", "!="},
            "string": {"=", "!="},
            "uint": {"=", "!=", "<", "<=", ">", ">="},
            "proto": {"=", "!=", "<", "<=", ">", ">="},
            "etype": {"=", "!="},
            "enum": {"=", "!="},
            "array_uint": {"=", "!="},
            "community": {"=", "!="},
            "large_community": {"=", "!="},
            "mac": {"=", "!="},
            "timestamp": {"=", "!=", "<", "<=", ">", ">="},
        }[kind]
        if op not in allowed:
            raise FilterError(f"operator {op} not valid for {kind} column {spec.name}")
        return Cond(spec.name, kind, op, self._one(spec, value))

    def _one(self, spec: ColumnSpec, v):
        kind = spec.kind
        quoted = None
        if isinstance(v, tuple) and len(v) == 2 and v[0] in ("str", "word"):
            quoted = v[0] == "str"
            v = v[1]
        # The reference types literals lexically: a bare word where a
        # string belongs is a typo'd column/keyword and must error
        # (parser_test.go `InIfProvider = OutIfProviderr`).  Dialect
        # extension kept on purpose: IP literals may be quoted OR bare
        # (both validate as addresses, so no typo can slip through).
        if quoted is not None and kind == "string" and not quoted:
            raise FilterError(
                f"string value for {spec.name} must be quoted, got bare {v!r}"
            )
        if kind == "ip":
            # exact IP or subnet; '=' with '/len' behaves as containment
            # (reference console/filter/helpers.go:288-313)
            import ipaddress

            try:
                if "/" in v:
                    ipaddress.ip_network(v, strict=False)
                else:
                    ipaddress.ip_address(v)
            except ValueError as e:
                raise FilterError(f"bad IP literal {v!r} on {spec.name}: {e}") from None
            return v
        if kind == "prefix":
            import ipaddress

            try:
                ipaddress.ip_network(v, strict=False)
            except ValueError as e:
                raise FilterError(f"bad prefix literal {v!r}: {e}") from None
            return v
        if kind in ("uint", "timestamp"):
            if kind == "timestamp":
                return v  # ISO timestamp string, validated at compile
            s = str(v)
            # ASN columns take an optional AS prefix: `SrcAS = AS65001`
            # (reference parser.peg ASNValue)
            if spec.name.endswith("AS") and re.fullmatch(r"(?i)as\d+", s):
                s = s[2:]
            if not re.fullmatch(r"\d+", s):
                raise FilterError(f"bad integer literal {v!r} on {spec.name}")
            n = int(s)
            # engine integers are signed 64-bit; the reference likewise
            # rejects overflowing literals (TestInvalidFilter
            # `SrcAS=785473854857857485784`)
            if n > 0x7FFF_FFFF_FFFF_FFFF:
                raise FilterError(f"integer literal {v!r} out of range on {spec.name}")
            return n
        if kind == "proto":
            if re.fullmatch(r"\d+", str(v)):
                return int(v)
            n = PROTO_NUMBERS.get(str(v).lower())
            if n is None:
                raise FilterError(f"unknown protocol name {v!r}")
            return n
        if kind == "etype":
            n = ETYPE_VALUES.get(str(v).lower())
            if n is None:
                raise FilterError(f"EType must be IPv4 or IPv6, got {v!r}")
            return n
        if kind == "enum":
            lv = str(v).lower()
            if lv not in spec.enum_values:
                raise FilterError(f"bad {spec.name} value {v!r}")
            return lv
        if kind == "array_uint":
            if not re.fullmatch(r"\d+", str(v)):
                raise FilterError(f"bad AS number {v!r}")
            return int(v)
        if kind == "community":
            m = re.fullmatch(r"(\d+):(\d+)", str(v))
            if not m:
                raise FilterError(f"bad community {v!r} (want asn:value)")
            return (int(m.group(1)) << 16) + int(m.group(2))
        if kind == "large_community":
            m = re.fullmatch(r"(\d+):(\d+):(\d+)", str(v))
            if not m:
                raise FilterError(f"bad large community {v!r} (want a:b:c)")
            return (int(m.group(1)), int(m.group(2)), int(m.group(3)))
        if kind == "mac":
            m = re.fullmatch(r"([0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}", str(v))
            if not m:
                raise FilterError(f"bad MAC {v!r}")
            return int(str(v).replace(":", "").replace("-", ""), 16)
        return v


def parse_filter(text: str, schema: FilterSchema):
    """Parse a filter expression; empty/blank text means 'no filter' (None)."""
    tokens = tokenize(text)
    if not tokens:
        return None
    return _Parser(tokens, schema).parse()
