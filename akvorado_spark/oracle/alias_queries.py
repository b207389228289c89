"""Oracle-checked alias-column queries (SURVEY §1.3 ALIAS layer,
§2.8 intDiv/multiIf; reference common/schema/definition.go:402-428).

PacketSize and PacketSizeBucket are computed-on-read columns; the
Spark side goes through the schema registry's view layer so the hash
match certifies the alias machinery itself, not a re-typed copy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register
from akvorado_spark.schema.definition import PACKET_SIZE_BOUNDARIES, flows_schema


def _spark_packet_size(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    df = spark.table("flows_v").select("Bytes", "Packets", "Proto")
    df = flows_schema().view(df)  # adds PacketSize + PacketSizeBucket aliases
    return (
        df.groupBy("PacketSizeBucket")
        .agg(
            F.count(F.lit(1)).alias("flows"),
            F.sum("PacketSize").alias("size_sum"),
        )
        .orderBy("PacketSizeBucket")
    )


def _oracle_packet_size() -> str:
    conds, prev = [], 0
    for b in PACKET_SIZE_BOUNDARIES:
        conds.append(f"WHEN ps < {b} THEN '{prev}-{b - 1}'")
        prev = b
    case = "CASE " + " ".join(conds) + f" ELSE '{prev}-Inf' END"
    return f"""
WITH src AS (SELECT Bytes // Packets AS ps FROM {oracle_view_sql()})
SELECT {case} AS PacketSizeBucket, COUNT(*) AS flows, CAST(SUM(ps) AS BIGINT) AS size_sum
FROM src GROUP BY PacketSizeBucket ORDER BY PacketSizeBucket"""


register("alias_packet_size_bucket", _spark_packet_size, _oracle_packet_size())
