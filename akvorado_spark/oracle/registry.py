from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver's weaker rows-only check


QUERIES: dict[str, QueryDef] = {}


def register(name: str, spark_fn, oracle: str | None) -> None:
    if name in QUERIES:
        raise ValueError(f"duplicate query name {name}")
    QUERIES[name] = QueryDef(name, spark_fn, oracle)
