"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query definitions live in ``akvorado_spark/oracle/`` —
one module per operator family from SURVEY.md §2, each registering
a Spark callable and (when SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing these modules populates the registry.
import akvorado_spark.oracle.line_queries  # noqa: F401
import akvorado_spark.oracle.filter_queries  # noqa: F401
import akvorado_spark.oracle.units_queries  # noqa: F401
import akvorado_spark.oracle.lpm_queries  # noqa: F401
import akvorado_spark.oracle.pipeline_queries  # noqa: F401
import akvorado_spark.oracle.sankey_queries  # noqa: F401
import akvorado_spark.oracle.widget_queries  # noqa: F401
import akvorado_spark.oracle.render_queries  # noqa: F401
import akvorado_spark.oracle.complete_queries  # noqa: F401
import akvorado_spark.oracle.stats_queries  # noqa: F401
import akvorado_spark.oracle.classify_queries  # noqa: F401
import akvorado_spark.oracle.filter2_queries  # noqa: F401
import akvorado_spark.oracle.multiaxis_queries  # noqa: F401
import akvorado_spark.oracle.alias_queries  # noqa: F401
import akvorado_spark.oracle.wire_queries  # noqa: F401
import akvorado_spark.oracle.rollup_queries  # noqa: F401
import akvorado_spark.oracle.setops_queries  # noqa: F401
import akvorado_spark.oracle.lmdata_queries  # noqa: F401
import akvorado_spark.oracle.mlstats_queries  # noqa: F401
import akvorado_spark.oracle.vocab_queries  # noqa: F401
from akvorado_spark.oracle.registry import QUERIES, resolve_oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["graph_line_suite"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: resolve_oracle(q)
        for name, q in QUERIES.items()
        if q.oracle is not None
    }
