"""Approximate weighted top-K tests (SURVEY §2.4 A7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.operators.topk import approx_topk_weighted
from akvorado_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_approx_topk_matches_exact_on_heavy_hitters(spark):
    df = load_table(spark, "lineitem", SF_DIR).select(
        (F.col("l_suppkey") % 50).alias("g"), "l_quantity"
    )
    w = "CAST(l_quantity * 100 AS BIGINT)"
    approx = approx_topk_weighted(df, ["g"], w, k=5).collect()
    exact = (
        df.withColumn("__w", F.expr(w))
        .groupBy("g")
        .agg(F.sum("__w").alias("weight"))
        .orderBy(F.col("weight").desc(), "g")
        .limit(5)
        .collect()
    )
    # the candidate cut (k×20 per partition ≥ distinct groups here)
    # keeps every group → exact equality
    assert [tuple(r) for r in approx] == [tuple(r) for r in exact]


def test_approx_topk_bounds_candidates(spark):
    # many distinct groups, tiny load factor: heaviest group must survive
    df = spark.range(100_000).select(
        F.when(F.col("id") % 1000 == 0, F.lit(0)).otherwise(F.col("id")).alias("g"),
        F.lit(1).alias("v"),
    )
    top = approx_topk_weighted(df, ["g"], "v * 100", k=1, load_factor=2).collect()
    assert top[0]["g"] == 0  # the planted heavy hitter
    assert top[0]["weight"] == 100 * 100  # exact for the heavy hitter
