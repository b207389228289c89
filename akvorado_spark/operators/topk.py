"""Approximate weighted top-K (SURVEY §2.4 A7;
reference console/query.go:78-120).

The reference switches to ClickHouse ``topKWeighted(k, 20)`` on the
main table because an exact ranking of, say, top source addresses
must hold one accumulator per distinct address — millions of groups.
Spark's exact ``groupBy`` *spills* rather than OOMs, so the engine's
default stays exact (a correctness superset).  This operator is the
optional shuffle-bounded path for interactive latency at 100 TB:

    per input partition: aggregate locally (Arrow/pandas, BEFORE any
    exchange) and keep only the heaviest ``k × load_factor`` tuples
    merge the ≤ partitions × k × load_factor candidates, re-rank, take k

Guarantee matches the sketch family's: any tuple whose true weight
exceeds the sum of the per-partition cut weights survives; heavy
hitters are exact, the tail is approximate.  The ONLY exchange carries
``partitions × k × load_factor`` candidate rows — the per-partition
prune genuinely happens before the shuffle (a groupBy-then-window
formulation would exchange every distinct tuple first, twice).
Per-partition aggregation memory is the partition's distinct-tuple
count, same as any hash aggregate, and pandas-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    proj = df.withColumn("__w", F.expr(weight_sql).cast("long")).select(*dims, "__w")
    dim_list = list(dims)

    def prune(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            g = pdf.groupby(dim_list, as_index=False, dropna=False)["__w"].sum()
            if acc is None:
                acc = g
            else:
                acc = (
                    pd.concat([acc, g], ignore_index=True)
                    .groupby(dim_list, as_index=False, dropna=False)["__w"]
                    .sum()
                )
        if acc is not None and len(acc):
            yield acc.nlargest(m, "__w")

    cand = proj.mapInPandas(prune, schema=proj.schema)
    return (
        cand.groupBy(*dim_list)
        .agg(F.sum("__w").alias("weight"))
        .orderBy(F.col("weight").desc(), *[F.col(d) for d in dim_list])
        .limit(k)
    )
