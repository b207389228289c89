"""Oracle-checked sankey queries (SURVEY §3.2, O3, J9).

Forward axis goes through the generic emitter; the bidirectional
query's oracle is hand-written because the reverse axis probes the
*forward* rows set positionally (reference console/sankey.go:56-65),
which the generic emitter doesn't model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register
from akvorado_spark.query.sankey import (
    SankeyRequest,
    compile_sankey,
    oracle_sankey_sql,
    top_rows,
)

# String-typed projection shared by both engines ('Other' folds need
# string dimensions; ports are cast, IPs are pre-rendered upstream).
_PROJ = """SELECT TimeReceived, ExporterName, InIfName, OutIfName,
       CAST(SrcPort AS STRING) AS SrcPortS, CAST(DstPort AS STRING) AS DstPortS,
       Bytes, Packets, SamplingRate FROM flows_v"""

_L3 = "SUM(Bytes * SamplingRate * 8)"
_BASE = ("Bytes", "SamplingRate")


def _source(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    return spark.sql(_PROJ)


_REQ_FWD = SankeyRequest(
    time_col="TimeReceived",
    dimensions=("ExporterName", "DstPortS"),
    weight_sql=None,
    limit=5,
    agg_sql=_L3,
    base_cols=_BASE,
)


def _spark_sankey(spark, sf_dir):
    return compile_sankey(_source(spark, sf_dir), _REQ_FWD)


register(
    "sankey_2dim",
    _spark_sankey,
    oracle_sankey_sql(
        f"({_PROJ.replace('flows_v', f'({oracle_view_sql()}) flows_v')})", _REQ_FWD
    ),
)


# --- bidirectional: reverse axis probes forward rows positionally ----------

_FWD_DIMS = ("InIfName", "DstPortS")
_REV_DIMS = ("OutIfName", "SrcPortS")
_REQ_BIDIR = SankeyRequest(
    time_col="TimeReceived",
    dimensions=_FWD_DIMS,
    weight_sql=None,
    limit=5,
    agg_sql=_L3,
    base_cols=_BASE,
)


def _spark_sankey_bidir(spark, sf_dir):
    # four compile_sankey fan-outs share one materialized narrow source
    # (the reference's shared CTE, console/sankey.go) — see the same
    # pattern + measurement note in multiaxis_queries._spark_bidir_line
    df = _source(spark, sf_dir).localCheckpoint(eager=False)
    fwd_rows = top_rows(df, _REQ_BIDIR)
    ax1 = compile_sankey(df, _REQ_BIDIR, rows=fwd_rows, rows_cols=_FWD_DIMS)
    req_rev = SankeyRequest(
        time_col="TimeReceived",
        dimensions=_REV_DIMS,
        weight_sql=None,
        limit=5,
        agg_sql=_L3,
        base_cols=_BASE,
    )
    ax2 = compile_sankey(df, req_rev, rows=fwd_rows, rows_cols=_FWD_DIMS)
    for rev, fwd in zip(_REV_DIMS, _FWD_DIMS):
        ax2 = ax2.withColumnRenamed(rev, fwd)
    one = (
        ax1.select(F.lit(1).alias("axis"), "*")
        .unionAll(ax2.select(F.lit(2).alias("axis"), "*"))
        .withColumnRenamed("InIfName", "d1")
        .withColumnRenamed("DstPortS", "d2")
        .select(F.lit("if").alias("variant"), "*")
    )
    # reverse-PAIR dimension list (SrcPortS, DstPortS) → (DstPortS,
    # SrcPortS): the reverse axis probes the forward rows positionally
    # and the output renames back atomically (the collision fixed this
    # round), value-gated here
    pdims = ("SrcPortS", "DstPortS")
    req_p = SankeyRequest(
        time_col="TimeReceived", dimensions=pdims, weight_sql=None,
        limit=5, agg_sql=_L3, base_cols=_BASE,
    )
    rows_p = top_rows(df, req_p)
    p1 = compile_sankey(df, req_p, rows=rows_p, rows_cols=pdims)
    req_pr = SankeyRequest(
        time_col="TimeReceived", dimensions=("DstPortS", "SrcPortS"),
        weight_sql=None, limit=5, agg_sql=_L3, base_cols=_BASE,
    )
    p2 = compile_sankey(df, req_pr, rows=rows_p, rows_cols=pdims)
    pair = p1.select(
        F.lit("ports").alias("variant"), F.lit(1).alias("axis"),
        F.col("SrcPortS").alias("d1"), F.col("DstPortS").alias("d2"),
        "sum_w", "xps",
    ).unionAll(
        p2.select(
            F.lit("ports").alias("variant"), F.lit(2).alias("axis"),
            F.col("DstPortS").alias("d1"), F.col("SrcPortS").alias("d2"),
            "sum_w", "xps",
        )
    )
    return one.unionAll(pair)


def _oracle_sankey_bidir() -> str:
    src = f"({_PROJ.replace('flows_v', f'({oracle_view_sql()}) flows_v')})"
    return f"""
WITH source AS (SELECT * FROM {src}),
rng AS (
  SELECT GREATEST(1, (MAX(epoch_us(TimeReceived)) - MIN(epoch_us(TimeReceived))) // 1000000) AS range_s
  FROM source
),
base AS (
  SELECT CAST(Bytes AS BIGINT) AS Bytes, CAST(SamplingRate AS BIGINT) AS SamplingRate,
         InIfName, DstPortS, OutIfName, SrcPortS
  FROM source
),
rows_top AS (
  SELECT InIfName, DstPortS FROM (
    SELECT InIfName, DstPortS, CAST({_L3} AS BIGINT) AS tw
    FROM base GROUP BY InIfName, DstPortS
  ) ORDER BY tw DESC, InIfName, DstPortS LIMIT 5
),
u AS (
  SELECT 1 AS axis,
         CASE WHEN b.InIfName IN (SELECT InIfName FROM rows_top) THEN b.InIfName ELSE 'Other' END AS d1,
         CASE WHEN b.DstPortS IN (SELECT DstPortS FROM rows_top) THEN b.DstPortS ELSE 'Other' END AS d2,
         Bytes, SamplingRate
  FROM base b
  UNION ALL
  SELECT 2 AS axis,
         CASE WHEN b.OutIfName IN (SELECT InIfName FROM rows_top) THEN b.OutIfName ELSE 'Other' END AS d1,
         CASE WHEN b.SrcPortS IN (SELECT DstPortS FROM rows_top) THEN b.SrcPortS ELSE 'Other' END AS d2,
         Bytes, SamplingRate
  FROM base b
),
agg AS (
  SELECT axis, d1, d2, CAST({_L3} AS BIGINT) AS sum_w FROM u GROUP BY axis, d1, d2
),
rows_p AS (
  SELECT SrcPortS, DstPortS FROM (
    SELECT SrcPortS, DstPortS, CAST({_L3} AS BIGINT) AS tw
    FROM base GROUP BY SrcPortS, DstPortS
  ) ORDER BY tw DESC, SrcPortS, DstPortS LIMIT 5
),
up AS (
  SELECT 1 AS axis,
         CASE WHEN b.SrcPortS IN (SELECT SrcPortS FROM rows_p) THEN b.SrcPortS ELSE 'Other' END AS d1,
         CASE WHEN b.DstPortS IN (SELECT DstPortS FROM rows_p) THEN b.DstPortS ELSE 'Other' END AS d2,
         Bytes, SamplingRate
  FROM base b
  UNION ALL
  SELECT 2 AS axis,
         CASE WHEN b.DstPortS IN (SELECT SrcPortS FROM rows_p) THEN b.DstPortS ELSE 'Other' END AS d1,
         CASE WHEN b.SrcPortS IN (SELECT DstPortS FROM rows_p) THEN b.SrcPortS ELSE 'Other' END AS d2,
         Bytes, SamplingRate
  FROM base b
),
aggp AS (
  SELECT axis, d1, d2, CAST({_L3} AS BIGINT) AS sum_w FROM up GROUP BY axis, d1, d2
)
SELECT 'if' AS variant, a.axis, a.d1, a.d2, a.sum_w, CAST(a.sum_w AS DOUBLE) / r.range_s AS xps
FROM agg a CROSS JOIN rng r
UNION ALL
SELECT 'ports', a.axis, a.d1, a.d2, a.sum_w, CAST(a.sum_w AS DOUBLE) / r.range_s AS xps
FROM aggp a CROSS JOIN rng r
ORDER BY variant, axis, xps DESC, d1, d2"""


register("sankey_bidir", _spark_sankey_bidir, _oracle_sankey_bidir())
