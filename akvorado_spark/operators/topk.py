"""Approximate weighted top-K (SURVEY §2.4 A7;
reference console/query.go:78-120).

The reference switches to ClickHouse ``topKWeighted(k, 20)`` on the
main table because an exact ranking of, say, top source addresses
must hold one accumulator per distinct address — millions of groups.
Spark's exact ``groupBy`` *spills* rather than OOMs, so the engine's
default stays exact (a correctness superset).  This operator is the
optional bounded-memory path for interactive latency at 100 TB:

    per input partition: partial-aggregate and keep the heaviest
    ``k × load_factor`` tuples            (SpaceSaving-style pruning)
    merge candidates globally, re-rank, take k

Guarantee matches the sketch family's: any tuple whose true weight
exceeds the per-partition cut survives; heavy hitters are exact,
the tail is approximate.  Shuffle volume drops from |distinct| to
``partitions × k × load_factor`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_topk_weighted(
    df: DataFrame,
    dims: list[str],
    weight_sql: str,
    k: int,
    load_factor: int = 20,
) -> DataFrame:
    """Top-``k`` dimension tuples by total weight, approximately.

    Returns (dims..., weight) ordered heaviest-first, ties broken by
    the dimension values.
    """
    m = k * load_factor
    part = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__w", F.expr(weight_sql).cast("long"))
        .groupBy("__pid", *dims)
        .agg(F.sum("__w").alias("__pw"))
    )
    w = Window.partitionBy("__pid").orderBy(F.col("__pw").desc(), *[F.col(d) for d in dims])
    cand = part.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= m)
    return (
        cand.groupBy(*dims)
        .agg(F.sum("__pw").alias("weight"))
        .orderBy(F.col("weight").desc(), *[F.col(d) for d in dims])
        .limit(k)
    )
