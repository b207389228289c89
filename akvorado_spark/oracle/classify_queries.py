"""Oracle-checked classifier and rate-limit queries (SURVEY §2.9
T1/T3).  The DuckDB side re-expresses the when-cascade as CASE chains
and the token bucket as a row_number window — independent
implementations of the same semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.operators.classify import (
    ClassifierRule,
    classify,
    classify_regex_norm_sql,
    classify_str_sql,
    rate_limit,
)
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
        # ClassifyProviderRegex + ClassifyConnectivity parity: outputs
        # are normalized (lowercase, strip [^a-z0-9.+-]) like the
        # reference's classifyString helpers — 'Prov 0' → 'prov0',
        # 'Transit/IX' → 'transitix' (outlet/core/classifier.go:266,
        # enricher_test.go:468-504)
        when="InIfName LIKE 'Gi0/0/0%'",
        sets={
            "InIfProvider": classify_regex_norm_sql(
                "InIfName", r"Gi0/0/(\d+)", "Prov $1"
            ),
            "InIfConnectivity": classify_str_sql("'Transit/IX'"),
        },
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
    CASE WHEN InIfName LIKE 'Gi0/0/0%' THEN
           regexp_replace(lower('Prov ' || regexp_extract(InIfName, 'Gi0/0/(\\d+)', 1)),
                          '[^a-z0-9.+-]+', '', 'g')
         WHEN InIfSpeed >= 100000 THEN 'pni'
         ELSE '' END AS InIfProvider,
    CASE WHEN InIfName LIKE 'Gi0/0/0%' THEN 'transitix'
         WHEN InIfSpeed >= 100000 THEN 'pni'
         ELSE '' END AS InIfConnectivity,
    Bytes
  FROM src
)
SELECT ExporterSite, ExporterRole, InIfProvider, InIfConnectivity,
       COUNT(*) AS flows, CAST(SUM(Bytes) AS BIGINT) AS bytes
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


# per-message limit expression (RawFlow field 8 shape: each message
# carries its exporter's configured rate; 0 = no limit) — derived from
# a column both engines compute identically
_PM_LIMIT = (
    "CASE (length(ExporterName) % 4) WHEN 0 THEN 25 WHEN 1 THEN 50 "
    "WHEN 2 THEN 75 ELSE 0 END"
)


def _spark_rate_limit(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    # project before the window: the shuffle then moves 7 columns, not
    # the whole row with its derived 16-byte addresses; the two
    # variants share the materialized projection
    flows = spark.table("flows_v").select(
        "ExporterAddress", "ExporterName", "TimeReceived",
        "SrcPort", "DstPort", "Bytes", "SamplingRate",
    ).localCheckpoint(eager=False)

    def agg(out, tag):
        return (
            out.groupBy("ExporterName")
            .agg(
                F.count(F.lit(1)).alias("kept"),
                F.sum("SamplingRate").alias("sampling_sum"),
                F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("bytes_est"),
            )
            .select(F.lit(tag).alias("variant"), "*")
        )

    # ONE window shuffle+sort serves both limit policies: the
    # (exporter, tick) annotation is policy-independent, so the global
    # and per-message variants share it (rate_limit_annotate) and each
    # applies its own narrow filter+rescale.  The lazy checkpoint
    # materializes the annotated frame once instead of re-running the
    # exchange per variant.
    from akvorado_spark.operators.classify import (
        apply_rate_limit,
        rate_limit_annotate,
    )

    ann = rate_limit_annotate(
        flows.withColumn("__lim", F.expr(_PM_LIMIT)),
        key="ExporterAddress", time_col="TimeReceived", tiebreak=_TIE,
    ).localCheckpoint(eager=False)
    glob = agg(apply_rate_limit(ann, _LIMIT_S).drop("__lim"), "global")
    # per-message limits incl. the 0-means-unlimited class
    per_msg = agg(apply_rate_limit(ann, "__lim").drop("__lim"), "per_msg")
    return glob.unionByName(per_msg).orderBy("variant", "ExporterName")


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
),
g_rows AS (
  SELECT 'global' AS variant, ExporterName, COUNT(*) AS kept,
         CAST(SUM(sr) AS BIGINT) AS sampling_sum,
         CAST(SUM(Bytes * sr) AS BIGINT) AS bytes_est
  FROM kept GROUP BY ExporterName
),
pm_lim AS (
  SELECT *, {_PM_LIMIT} AS lim,
         GREATEST(CAST(FLOOR(({_PM_LIMIT}) / 5) AS BIGINT), 1) AS per_tick
  FROM numbered
),
pm_kept AS (
  SELECT *, CASE WHEN lim <= 0 THEN SamplingRate
                 ELSE CAST(FLOOR(SamplingRate * total / LEAST(total, per_tick)) AS BIGINT)
            END AS sr
  FROM pm_lim WHERE lim <= 0 OR rn <= per_tick
),
pm AS (
  SELECT 'per_msg' AS variant, ExporterName, COUNT(*) AS kept,
         CAST(SUM(sr) AS BIGINT) AS sampling_sum,
         CAST(SUM(Bytes * sr) AS BIGINT) AS bytes_est
  FROM pm_kept GROUP BY ExporterName
)
SELECT * FROM g_rows UNION ALL SELECT * FROM pm
ORDER BY variant, ExporterName"""


register("rate_limit_compensated", _spark_rate_limit, _oracle_rate_limit())


# --- T2 provider precedence (reference getASNumber, enricher.go:202-233) ---
#
# The flows' own SrcAS values are all private (64512+k), so
# "flow-except-private" always passes; the routing RIB answers for the
# prefixes it covers; a half-corpus networks entry answers for most of
# the rest; flows matching neither bottom out at 0.  The DuckDB side is
# an independent implementation: BETWEEN-join LPM + CASE cascade.

_AS_PROVIDERS = ("flow-except-private", "routing", "networks")

_ROUTING_PREFIXES = [  # (cidr, asn)
    ("10.0.0.0/10", 64702),
    ("10.64.0.0/12", 64703),
    ("10.3.0.0/16", 64710),
]
_NETWORKS_PREFIXES = [("10.0.0.0/9", 65000)]


def _prefix_rows(prefixes):
    from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range

    out = []
    for cidr, asn in prefixes:
        lo, hi = prefix_range(cidr)
        out.append((asn, lo, hi, prefix_mapped_len(cidr)))
    return out


def _spark_as_precedence(spark, sf_dir):
    from akvorado_spark.operators.lpm import lpm_join
    from akvorado_spark.sources.tables import local_df
    from akvorado_spark.streaming.ingest import as_number

    register_spark_view(spark, sf_dir)
    schema = "asn long, lo binary, hi binary, plen int"
    routing_rows = _prefix_rows(_ROUTING_PREFIXES)
    networks_rows = _prefix_rows(_NETWORKS_PREFIXES)
    routing = local_df(spark, routing_rows, schema)
    networks = local_df(spark, networks_rows, schema)

    flows = spark.table("flows_v").select("SrcAddr", "SrcAS", "Bytes")
    flows = lpm_join(
        flows, routing, "SrcAddr", attrs=["asn"], plens=[r[3] for r in routing_rows]
    ).withColumnRenamed("asn", "routing_as")
    flows = lpm_join(
        flows, networks, "SrcAddr", attrs=["asn"], plens=[r[3] for r in networks_rows]
    ).withColumnRenamed("asn", "net_as")

    chosen = as_number(
        _AS_PROVIDERS,
        F.col("SrcAS").cast("long"),
        routing_as=F.col("routing_as"),
        net_as=F.col("net_as"),
    )
    return (
        flows.select(chosen.alias("asn"), "Bytes")
        .groupBy("asn")
        .agg(F.count(F.lit(1)).alias("flows"), F.sum("Bytes").alias("bytes"))
        .orderBy("asn")
    )


def _oracle_as_precedence() -> str:
    def vals(prefixes):
        return ", ".join(
            f"({asn}, unhex('{lo.hex()}'), unhex('{hi.hex()}'), {plen})"
            for (asn, lo, hi, plen) in _prefix_rows(prefixes)
        )

    return f"""
WITH fl AS (
  SELECT row_number() OVER () AS rid, SrcAddr, SrcAS, Bytes
  FROM {oracle_view_sql()}
),
routing(asn, lo, hi, plen) AS (SELECT * FROM (VALUES {vals(_ROUTING_PREFIXES)})),
networks(asn, lo, hi, plen) AS (SELECT * FROM (VALUES {vals(_NETWORKS_PREFIXES)})),
rj AS (
  SELECT f.rid, arg_max(r.asn, r.plen) AS routing_as
  FROM fl f JOIN routing r ON f.SrcAddr BETWEEN r.lo AND r.hi GROUP BY f.rid
),
nj AS (
  SELECT f.rid, arg_max(n.asn, n.plen) AS net_as
  FROM fl f JOIN networks n ON f.SrcAddr BETWEEN n.lo AND n.hi GROUP BY f.rid
),
resolved AS (
  SELECT f.rid, f.Bytes,
         COALESCE(
           CASE WHEN NOT (f.SrcAS = 0 OR f.SrcAS = 23456
                          OR f.SrcAS BETWEEN 64496 AND 65551
                          OR f.SrcAS >= 4200000000)
                 AND f.SrcAS != 0 THEN f.SrcAS END,
           CASE WHEN rj.routing_as != 0 THEN rj.routing_as END,
           CASE WHEN nj.net_as != 0 THEN nj.net_as END,
           0) AS asn
  FROM fl f LEFT JOIN rj ON f.rid = rj.rid LEFT JOIN nj ON f.rid = nj.rid
)
SELECT asn, COUNT(*) AS flows, CAST(SUM(Bytes) AS BIGINT) AS bytes
FROM resolved GROUP BY asn ORDER BY asn"""


register("enrich_as_precedence", _spark_as_precedence, _oracle_as_precedence())
