"""Driver-facing, oracle-checked query registry.

Each module contributes named queries: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB SQL.  ``__spark_entry__`` re-exports the merged
registry to the driver.
"""

from akvorado_spark.oracle.registry import QUERIES, QueryDef, register

__all__ = ["QUERIES", "QueryDef", "register"]
