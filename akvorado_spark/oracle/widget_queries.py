"""Oracle-checked widget queries (SURVEY A10/A11/O5/J9;
reference console/widgets.go).

The flows view's timestamps come from date-grained shipdates, so the
"last 5 minutes" windows scale up to spans the corpus actually covers
(the query shape — trailing window off a scalar max — is identical).
"""

from __future__ import annotations

from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register
from akvorado_spark.query.widgets import flow_rate, last_flow, top_percent

_WINDOW_S = 90 * 86400  # trailing 90 days of shipdates ≈ "last 5 minutes"


_GRAPH_INTERVAL_S = 7 * 86400  # weekly buckets over the shipdate span


def _spark_flow_rate(spark, sf_dir):
    """Two homepage widgets in one gated suite: the flow-rate scalar
    (A10) and the dimensionless traffic graph (widget_graph,
    console/widgets.go:250-298) — the graph rides as exact per-bucket
    bit sums plus the derived gbps double."""
    from pyspark.sql import functions as F

    from akvorado_spark.query.widgets import widget_graph

    register_spark_view(spark, sf_dir)
    df = spark.table("flows_v")
    rate = flow_rate(df, "TimeReceived", _WINDOW_S).select(
        F.lit("rate").alias("variant"),
        F.lit(0).cast("long").alias("bucket"),
        F.col("rate").alias("xps"),
    )
    graph = widget_graph(df, _GRAPH_INTERVAL_S).select(
        F.lit("graph").alias("variant"),
        "bucket",
        (F.col("gbps") * 1e9).alias("xps"),  # bits/s: exact int / interval
    )
    return rate.unionAll(graph).orderBy("variant", "bucket")


def _oracle_flow_rate() -> str:
    step_us = _GRAPH_INTERVAL_S * 1_000_000
    return f"""
WITH source AS (SELECT * FROM {oracle_view_sql()}),
b AS (SELECT MAX(epoch_us(TimeReceived)) AS max_us,
             MIN(epoch_us(TimeReceived)) AS min_us FROM source),
rate AS (
  SELECT 'rate' AS variant, CAST(0 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS DOUBLE) / {_WINDOW_S} AS xps
  FROM source s CROSS JOIN b
  WHERE epoch_us(s.TimeReceived) > b.max_us - {_WINDOW_S}::BIGINT * 1000000
),
gagg AS (
  SELECT CAST(b.min_us + ((epoch_us(s.TimeReceived) - b.min_us) // {step_us}) * {step_us} AS BIGINT) AS bucket,
         CAST(SUM(Bytes * SamplingRate * 8) AS BIGINT) AS bits
  FROM source s CROSS JOIN b GROUP BY bucket
),
spine AS (
  SELECT CAST(b.min_us + t.i * {step_us} AS BIGINT) AS bucket
  FROM b CROSS JOIN generate_series(0, 2000000) t(i)
  WHERE t.i <= (b.max_us - b.min_us) // {step_us}
),
graph AS (
  -- replay the Spark side's exact double-op sequence
  -- (bits / (interval*1e9)) * 1e9 — same IEEE ops, same order
  SELECT 'graph' AS variant, sp.bucket,
         (CAST(COALESCE(g.bits, 0) AS DOUBLE) / {float(_GRAPH_INTERVAL_S) * 1e9!r}) * 1000000000.0 AS xps
  FROM spine sp LEFT JOIN gagg g USING (bucket)
)
SELECT * FROM rate UNION ALL SELECT * FROM graph
ORDER BY variant, bucket"""


register("widget_flow_rate", _spark_flow_rate, _oracle_flow_rate())


def _spark_top_percent(spark, sf_dir):
    """Two reference homepage-top variants (console/widgets_test.go
    TestWidgetTop): 'exporter' (plain selector) and 'src-port' (the
    composite dictGet(protocols)/port rendered selector) — both over
    the external-boundary population with the Unknown fold."""
    from pyspark.sql import functions as F

    register_spark_view(spark, sf_dir)
    df = spark.table("flows_v").filter(F.col("InIfBoundary") == "external")
    exporter = top_percent(df, "ExporterName", "Bytes * SamplingRate", limit=5)
    proto_name = F.coalesce(
        F.create_map(
            F.lit(6), F.lit("TCP"), F.lit(17), F.lit("UDP"), F.lit(1), F.lit("ICMP")
        )[F.col("Proto")],
        F.lit("???"),
    )
    composed = df.withColumn(
        "__sel", F.concat(proto_name, F.lit("/"), F.col("SrcPort").cast("string"))
    )
    srcport = top_percent(composed, "__sel", "Bytes * SamplingRate", limit=5)
    return exporter.select(
        F.lit("exporter").alias("variant"), "Name", "Percent"
    ).unionAll(srcport.select(F.lit("src-port").alias("variant"), "Name", "Percent"))


def _oracle_top_percent() -> str:
    def one(variant: str, name_sql: str) -> str:
        return f"""
SELECT '{variant}' AS variant, Name, Percent FROM (
  WITH base AS (
    SELECT CASE WHEN COALESCE({name_sql}, '') = '' THEN 'Unknown' ELSE {name_sql} END AS Name,
           CAST(Bytes * SamplingRate AS BIGINT) AS w
    FROM ({oracle_view_sql()}) WHERE InIfBoundary = 'external'
  ),
  t AS (SELECT SUM(w) AS total FROM base)
  SELECT b.Name, CAST(SUM(b.w) AS DOUBLE) * 100 / CAST(t.total AS DOUBLE) AS Percent
  FROM base b CROSS JOIN t
  GROUP BY b.Name, t.total
  ORDER BY Percent DESC, Name LIMIT 5
)"""

    exporter = one("exporter", "CAST(ExporterName AS STRING)")
    srcport = one(
        "src-port",
        "concat(CASE WHEN Proto = 6 THEN 'TCP' WHEN Proto = 17 THEN 'UDP' "
        "WHEN Proto = 1 THEN 'ICMP' ELSE '???' END, '/', CAST(SrcPort AS STRING))",
    )
    return exporter + " UNION ALL " + srcport


register("widget_top_percent", _spark_top_percent, _oracle_top_percent())


_LAST_COLS = (
    "TimeReceived ExporterName InIfName OutIfName SrcPort DstPort Proto "
    "Bytes Packets SamplingRate"
).split()
_TIEBREAK = ("ExporterName", "InIfName", "SrcPort", "DstPort", "Bytes")


def _spark_last_flow(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    return last_flow(
        spark.table("flows_v").select(*_LAST_COLS), "TimeReceived", _TIEBREAK
    )


def _oracle_last_flow() -> str:
    cols = ", ".join(_LAST_COLS)
    tie = ", ".join(_TIEBREAK)
    return f"""
WITH source AS (SELECT {cols} FROM {oracle_view_sql()})
SELECT * FROM source
WHERE epoch_us(TimeReceived) = (SELECT MAX(epoch_us(TimeReceived)) FROM source)
ORDER BY {tie} LIMIT 1"""


register("widget_last_flow", _spark_last_flow, _oracle_last_flow())


# --- approx weighted top-K, oracle-gated exact degeneration ----------------
#
# SURVEY A7 (reference console/query.go:78-120): the SpaceSaving-style
# partial-rank merge is exact whenever every partition's survivor set
# covers all tuples present in that partition, i.e. per-partition
# distinct dimension tuples <= k * load_factor.  (ExporterName, Proto)
# has 8 x 3 = 24 tuples << 10 * 20 = 200, so the full machinery
# (partition-local partial agg + rank cut + global merge) runs and the
# result must equal the exact SQL ranking — same certification pattern
# as ann_ivf_topk.  The approximate regime (cut actually pruning) is
# covered by pytest bounds in test_topk.


def _spark_topk_weighted(spark, sf_dir):
    from akvorado_spark.operators.topk import approx_topk_weighted

    register_spark_view(spark, sf_dir)
    return approx_topk_weighted(
        spark.table("flows_v"),
        ["ExporterName", "Proto"],
        "Bytes * SamplingRate",
        k=10,
        load_factor=20,
    )


def _oracle_topk_weighted() -> str:
    return f"""
SELECT ExporterName, Proto, CAST(SUM(Bytes * SamplingRate) AS BIGINT) AS weight
FROM {oracle_view_sql()}
GROUP BY ExporterName, Proto
ORDER BY weight DESC, ExporterName, Proto
LIMIT 10"""


register("topk_weighted_exact", _spark_topk_weighted, _oracle_topk_weighted())
