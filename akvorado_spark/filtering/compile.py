"""Filter AST → Spark Column / DuckDB SQL, direction reversal, and
main-table-required analysis.

One AST, two lowerings:

- ``spark_sql`` — a Spark SQL boolean expression (used via
  ``F.expr``, so filters stay inside Catalyst and push down to the
  parquet scan).
- ``duckdb_sql`` — the same predicate in DuckDB's dialect, which is
  what makes every DSL production directly checkable against the
  driver's oracle.

Direction reversal re-parses nothing: it rewrites column names in the
AST via the schema's Src↔Dst / InIf↔OutIf map (reference:
console/filter/helpers.go:49-70).  Main-table analysis is a walk over
referenced columns checking MainOnly flags (reference:
console/filter/helpers.go:74-80, console/query.go:15-25).
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass

from akvorado_spark.filtering.model import FilterSchema
from akvorado_spark.filtering.parser import And, Cond, Not, Or, parse_filter
from akvorado_spark.functions.ip import ip_bytes, prefix_range


_COL_OPS = {
    "col=": "=", "col!=": "<>", "col<": "<", "col<=": "<=",
    "col>": ">", "col>=": ">=",
}


def _q(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def _ip_eq_sql(col: str, v: str, negate: bool) -> str:
    if "/" in v:
        lo, hi = prefix_range(v)
        # >=/<= instead of BETWEEN: DuckDB 1.x's optimizer hits an
        # internal NULL-deref when the same BLOB BETWEEN appears (once
        # negated) in both branches of an OR; the comparison pair is
        # semantically identical and planner-safe in both dialects.
        expr = (
            f"({col} >= unhex('{lo.hex()}') AND {col} <= unhex('{hi.hex()}'))"
        )
        return f"NOT {expr}" if negate else expr
    op = "<>" if negate else "="
    return f"{col} {op} unhex('{ip_bytes(v).hex()}')"


def _emit(node, dialect: str) -> str:
    if isinstance(node, Or):
        return "(" + " OR ".join(_emit(p, dialect) for p in node.parts) + ")"
    if isinstance(node, And):
        return "(" + " AND ".join(_emit(p, dialect) for p in node.parts) + ")"
    if isinstance(node, Not):
        return "NOT (" + _emit(node.part, dialect) + ")"
    assert isinstance(node, Cond)
    return _emit_cond(node, dialect)


def _contains(dialect: str, col: str, value_sql: str) -> str:
    fn = "array_contains" if dialect == "spark" else "list_contains"
    return f"{fn}({col}, {value_sql})"


def _emit_cond(c: Cond, dialect: str) -> str:
    col, op, v = c.column, c.op, c.value

    if c.kind == "ip":
        if op in ("=", "!="):
            return _ip_eq_sql(col, v, op == "!=")
        if op in ("<<", "!<<"):
            if "/" not in v:
                v = v + ("/128" if ":" in v else "/32")
            return _ip_eq_sql(col, v, op == "!<<")
        if op in ("in", "notin"):
            exact = [x for x in v if "/" not in x]
            nets = [x for x in v if "/" in x]
            parts = []
            if exact:
                lits = ", ".join(f"unhex('{ip_bytes(x).hex()}')" for x in exact)
                parts.append(f"{col} IN ({lits})")
            for n in nets:
                parts.append(_ip_eq_sql(col, n, False))
            expr = "(" + " OR ".join(parts) + ")"
            return f"NOT {expr}" if op == "notin" else expr

    if c.kind == "prefix":
        if op in ("in", "notin"):
            lits = ", ".join(_q(str(ipaddress.ip_network(x, strict=False))) for x in v)
            neg = "NOT " if op == "notin" else ""
            return f"{neg}{col} IN ({lits})"
        net = str(ipaddress.ip_network(v, strict=False))
        return f"{col} {'<>' if op == '!=' else '='} {_q(net)}"

    if c.kind == "string":
        if op in ("=", "!="):
            return f"{col} {'<>' if op == '!=' else '='} {_q(v)}"
        if op.startswith("col"):
            return f"{col} {_COL_OPS[op]} {v}"
        if op in ("like", "unlike"):
            neg = "NOT " if op == "unlike" else ""
            return f"{col} {neg}LIKE {_q(v)}"
        if op in ("ilike", "iunlike"):
            neg = "NOT " if op == "iunlike" else ""
            return f"{col} {neg}ILIKE {_q(v)}"
        if op in ("in", "notin"):
            lits = ", ".join(_q(x) for x in v)
            neg = "NOT " if op == "notin" else ""
            return f"{neg}{col} IN ({lits})"

    if c.kind in ("uint", "proto", "etype", "mac"):
        if op in ("in", "notin"):
            lits = ", ".join(str(x) for x in v)
            neg = "NOT " if op == "notin" else ""
            return f"{neg}{col} IN ({lits})"
        if op.startswith("col"):
            return f"{col} {_COL_OPS[op]} {v}"
        sql_op = {"=": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}[op]
        return f"{col} {sql_op} {v}"

    if c.kind == "enum":
        if op in ("in", "notin"):
            lits = ", ".join(_q(x) for x in v)
            neg = "NOT " if op == "notin" else ""
            return f"{neg}{col} IN ({lits})"
        return f"{col} {'<>' if op == '!=' else '='} {_q(v)}"

    if c.kind == "array_uint":
        if op in ("in", "notin"):
            parts = " OR ".join(_contains(dialect, col, str(x)) for x in v)
            return f"NOT ({parts})" if op == "notin" else f"({parts})"
        expr = _contains(dialect, col, str(v))
        return f"NOT {expr}" if op == "!=" else expr

    if c.kind == "community":
        if op in ("in", "notin"):
            parts = " OR ".join(_contains(dialect, col, str(x)) for x in v)
            return f"NOT ({parts})" if op == "notin" else f"({parts})"
        expr = _contains(dialect, col, str(v))
        return f"NOT {expr}" if op == "!=" else expr

    if c.kind == "large_community":
        a, b, cc = v
        if dialect == "spark":
            lit = f"named_struct('asn', CAST({a} AS BIGINT), 'local1', CAST({b} AS BIGINT), 'local2', CAST({cc} AS BIGINT))"
        else:
            lit = f"{{'asn': CAST({a} AS BIGINT), 'local1': CAST({b} AS BIGINT), 'local2': CAST({cc} AS BIGINT)}}"
        expr = _contains(dialect, col, lit)
        return f"NOT {expr}" if op == "!=" else expr

    if c.kind == "timestamp":
        sql_op = {"=": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}[op]
        return f"{col} {sql_op} TIMESTAMP {_q(v)}"

    raise AssertionError(f"unhandled condition {c}")


def _walk_columns(node, out: set[str]) -> None:
    if isinstance(node, (And, Or)):
        for p in node.parts:
            _walk_columns(p, out)
    elif isinstance(node, Not):
        _walk_columns(node.part, out)
    elif isinstance(node, Cond):
        out.add(node.column)
        if node.op.startswith("col"):
            out.add(node.value)


def _reverse_node(node, schema: FilterSchema):
    if isinstance(node, Or):
        return Or(tuple(_reverse_node(p, schema) for p in node.parts))
    if isinstance(node, And):
        return And(tuple(_reverse_node(p, schema) for p in node.parts))
    if isinstance(node, Not):
        return Not(_reverse_node(node.part, schema))
    assert isinstance(node, Cond)
    value = node.value
    if node.op.startswith("col"):
        value = schema.reverse_name(value)
    return Cond(schema.reverse_name(node.column), node.kind, node.op, value)


@dataclass
class CompiledFilter:
    ast: object | None
    schema: FilterSchema

    @property
    def spark_sql(self) -> str:
        return "true" if self.ast is None else _emit(self.ast, "spark")

    @property
    def duckdb_sql(self) -> str:
        return "true" if self.ast is None else _emit(self.ast, "duckdb")

    def column(self):
        from pyspark.sql import functions as F

        return F.expr(self.spark_sql)

    def reverse(self) -> "CompiledFilter":
        if self.ast is None:
            return self
        return CompiledFilter(_reverse_node(self.ast, self.schema), self.schema)

    @property
    def columns_used(self) -> set[str]:
        out: set[str] = set()
        if self.ast is not None:
            _walk_columns(self.ast, out)
        return out

    @property
    def requires_main_table(self) -> bool:
        for name in self.columns_used:
            spec = self.schema.lookup(name)
            if spec is not None and spec.main_only:
                return True
        return False


def compile_filter(text: str, schema: FilterSchema) -> CompiledFilter:
    return CompiledFilter(parse_filter(text, schema), schema)
