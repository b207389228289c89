from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL; None → driver's weaker rows-only check.  A zero-arg
    # callable defers SQL construction to oracle_sql() time — for
    # oracles whose VALUES literals need I/O to build (pcap replay),
    # which must not tax every import of the entry module.
    oracle: str | Callable[[], str] | None


QUERIES: dict[str, QueryDef] = {}


def register(name: str, spark_fn, oracle: str | Callable[[], str] | None) -> None:
    if name in QUERIES:
        raise ValueError(f"duplicate query name {name}")
    QUERIES[name] = QueryDef(name, spark_fn, oracle)


def resolve_oracle(q: QueryDef) -> str | None:
    return q.oracle() if callable(q.oracle) else q.oracle
