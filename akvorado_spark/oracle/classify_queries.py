"""Oracle-checked classifier and rate-limit queries (SURVEY §2.9
T1/T3).  The DuckDB side re-expresses the when-cascade as CASE chains
and the token bucket as a row_number window — independent
implementations of the same semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.operators.classify import ClassifierRule, classify, rate_limit
from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register

# --- classifier cascade ----------------------------------------------------
#
# Mirrors a realistic config: reject test routers, then site/role from
# the exporter name, provider from the interface, boundary fallback.

_RULES = [
    ClassifierRule(when="ExporterName = 'router8'", reject=True),
    ClassifierRule(
        when="ExporterName IN ('router1', 'router2')",
        sets={"ExporterSite": "'par'", "ExporterRole": "'edge'"},
    ),
    ClassifierRule(
        when="ExporterName = 'router1'",
        sets={"ExporterRole": "'core'"},  # loses: role already set by rule 2
    ),
    ClassifierRule(
        when="InIfName LIKE 'Gi0/0/0%'",
        sets={"InIfProvider": "'transit-a'", "InIfConnectivity": "'transit'"},
    ),
    ClassifierRule(
        when="InIfSpeed >= 100000",
        sets={"InIfProvider": "'pni'", "InIfConnectivity": "'pni'"},
    ),
]
_DEFAULTS = {
    "ExporterSite": "'unknown'",
    "ExporterRole": "'unknown'",
    "InIfProvider": "''",
    "InIfConnectivity": "''",
}


def _spark_classify(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    out = classify(spark.table("flows_v"), _RULES, _DEFAULTS)
    return (
        out.groupBy("ExporterSite", "ExporterRole", "InIfProvider", "InIfConnectivity")
        .agg(F.count(F.lit(1)).alias("flows"), F.sum("Bytes").alias("bytes"))
        .orderBy("ExporterSite", "ExporterRole", "InIfProvider", "InIfConnectivity")
    )


def _oracle_classify() -> str:
    return f"""
WITH src AS (SELECT * FROM {oracle_view_sql()} WHERE NOT (ExporterName = 'router8')),
cls AS (
  SELECT
    CASE WHEN ExporterName IN ('router1', 'router2') THEN 'par'
         ELSE 'unknown' END AS ExporterSite,
    CASE WHEN ExporterName IN ('router1', 'router2') THEN 'edge'
         WHEN ExporterName = 'router1' THEN 'core'
         ELSE 'unknown' END AS ExporterRole,
    CASE WHEN InIfName LIKE 'Gi0/0/0%' THEN 'transit-a'
         WHEN InIfSpeed >= 100000 THEN 'pni'
         ELSE '' END AS InIfProvider,
    CASE WHEN InIfName LIKE 'Gi0/0/0%' THEN 'transit'
         WHEN InIfSpeed >= 100000 THEN 'pni'
         ELSE '' END AS InIfConnectivity,
    Bytes
  FROM src
)
SELECT ExporterSite, ExporterRole, InIfProvider, InIfConnectivity,
       COUNT(*) AS flows, SUM(Bytes) AS bytes
FROM cls
GROUP BY ExporterSite, ExporterRole, InIfProvider, InIfConnectivity
ORDER BY ExporterSite, ExporterRole, InIfProvider, InIfConnectivity"""


register("classify_cascade", _spark_classify, _oracle_classify())


# --- rate limiter ----------------------------------------------------------
#
# flows_v timestamps are date-grained, so every flow of a day lands in
# the same 200 ms tick — a worst-case burst for the limiter, which
# makes the compensation arithmetic easy to stress.

_LIMIT_S = 50  # → 10 flows per tick
_TIE = ("SrcPort", "DstPort", "Bytes")


def _spark_rate_limit(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    # project before the window: the shuffle then moves 7 columns, not
    # the whole row with its derived 16-byte addresses
    flows = spark.table("flows_v").select(
        "ExporterAddress", "ExporterName", "TimeReceived",
        "SrcPort", "DstPort", "Bytes", "SamplingRate",
    )
    out = rate_limit(
        flows,
        _LIMIT_S,
        key="ExporterAddress",
        time_col="TimeReceived",
        tiebreak=_TIE,
    )
    return (
        out.groupBy("ExporterName")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum("SamplingRate").alias("sampling_sum"),
            F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("bytes_est"),
        )
        .orderBy("ExporterName")
    )


def _oracle_rate_limit() -> str:
    tie = ", ".join(_TIE)
    return f"""
WITH src AS (SELECT * FROM {oracle_view_sql()}),
ticked AS (
  SELECT *, CAST(epoch_ms(TimeReceived) // 200 AS BIGINT) AS tick FROM src
),
numbered AS (
  SELECT *,
         row_number() OVER (PARTITION BY ExporterAddress, tick
                            ORDER BY TimeReceived, {tie}) AS rn,
         COUNT(*) OVER (PARTITION BY ExporterAddress, tick) AS total
  FROM ticked
),
kept AS (
  SELECT *, CAST(FLOOR(SamplingRate * total / LEAST(total, 10)) AS BIGINT) AS sr
  FROM numbered WHERE rn <= 10
)
SELECT ExporterName, COUNT(*) AS kept, SUM(sr) AS sampling_sum,
       SUM(Bytes * sr) AS bytes_est
FROM kept GROUP BY ExporterName ORDER BY ExporterName"""


register("rate_limit_compensated", _spark_rate_limit, _oracle_rate_limit())
