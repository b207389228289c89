"""Per-series summary statistics (SURVEY §2.4 A12;
reference console/line.go:380-447).

The reference computes these in Go after the query, over each row's
gap-filled point vector; here they are one more aggregation over the
line result — distributed, and exact:

- average = floor(sum / point-count)     (integer division, as Go)
- total   = sum × interval seconds
- last    = the second-to-last point (the last is not drawn)
- min     = smallest non-zero point (0 when the series is all zero)
- max     = largest point
- p95     = 95th percentile, linear interpolation on the sorted
            points at index 0.95·(n-1), rounded — exactly Go's
            formula, and exactly SQL ``percentile_cont``.

Input must be a *filled* line frame (every series × every bucket),
which is what ``compile_line(fill=True)`` produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_stats(
    line: DataFrame,
    dims: tuple[str, ...],
    interval_s: int,
    value_col: str = "sum_w",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Aggregate a filled line frame into one stats row per series."""
    v = F.col(value_col)
    last_excl = line.agg(F.max(bucket_col).alias("__maxb"))
    base = line.join(F.broadcast(last_excl))

    return (
        base.groupBy(*dims)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(v).alias("__sum"),
            F.coalesce(F.min(F.when(v > 0, v)), F.lit(0)).cast("long").alias("min_v"),
            F.max(v).cast("long").alias("max_v"),
            F.expr(
                f"max_by({value_col}, CASE WHEN {bucket_col} < __maxb "
                f"THEN {bucket_col} ELSE NULL END)"
            )
            .cast("long")
            .alias("last_v"),
            F.round(F.expr(f"percentile({value_col}, 0.95)")).cast("long").alias("p95"),
        )
        .select(
            *dims,
            F.floor(F.col("__sum") / F.col("__n")).cast("long").alias("average"),
            (F.col("__sum") * interval_s).cast("long").alias("total"),
            "min_v",
            "max_v",
            "last_v",
            "p95",
        )
        .orderBy(*dims)
    )


def oracle_series_stats_sql(
    line_sql: str,
    dims: tuple[str, ...],
    interval_s: int,
    value_col: str = "sum_w",
    bucket_col: str = "bucket",
) -> str:
    """DuckDB equivalent over the same line subquery."""
    dcols = ", ".join(dims)
    return f"""
WITH line AS (SELECT * FROM ({line_sql})),
mx AS (SELECT MAX({bucket_col}) AS maxb FROM line)
SELECT {dcols},
       CAST(FLOOR(SUM({value_col}) / COUNT(*)) AS BIGINT) AS average,
       CAST(SUM({value_col}) * {interval_s} AS BIGINT) AS total,
       CAST(COALESCE(MIN({value_col}) FILTER (WHERE {value_col} > 0), 0) AS BIGINT) AS min_v,
       CAST(MAX({value_col}) AS BIGINT) AS max_v,
       CAST(arg_max({value_col}, CASE WHEN {bucket_col} < mx.maxb
                                      THEN {bucket_col} ELSE NULL END) AS BIGINT) AS last_v,
       CAST(ROUND(quantile_cont({value_col}, 0.95)) AS BIGINT) AS p95
FROM line CROSS JOIN mx
GROUP BY {dcols}, mx.maxb
ORDER BY {dcols}"""
