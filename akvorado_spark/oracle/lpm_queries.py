"""Oracle-checked longest-prefix-match queries (SURVEY §2.3 J3/J5).

The Spark side runs the production ``lpm_join`` cascade; the DuckDB
oracle computes the same semantics independently with a range join +
``arg_max(attr, plen) FILTER (WHERE attr IS NOT NULL)`` per attribute
(= longest-match with attribute inheritance).  A hash match certifies
the cascade against a structurally different implementation.
"""

from __future__ import annotations

from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range
from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register

# (cidr, name_or_None, asn) — nested prefixes exercise inheritance:
# 10.2.0.0/15 has no name → inherits "corp" from /8 while keeping its asn.
PREFIXES = [
    ("10.0.0.0/8", "corp", 65001),
    ("10.0.0.0/10", "corp-a", 65002),
    ("10.64.0.0/12", "corp-b", 65003),
    ("10.2.0.0/15", None, 65004),
    ("10.3.4.0/24", "deep", 65005),
    ("10.100.0.0/14", "corp-d", 65006),
]


def _rows():
    out = []
    for cidr, name, asn in PREFIXES:
        lo, hi = prefix_range(cidr)
        out.append((name, asn, lo, hi, prefix_mapped_len(cidr)))
    return out


def _spark_lpm(spark, sf_dir):
    from pyspark.sql import functions as F

    from akvorado_spark.operators.lpm import lpm_join

    register_spark_view(spark, sf_dir)
    rows = _rows()
    from akvorado_spark.sources.tables import local_df

    nets = local_df(spark, rows, "name string, asn long, lo binary, hi binary, plen int")
    flows = spark.table("flows_v").select("SrcAddr", "Bytes")
    out = lpm_join(
        flows, nets, "SrcAddr", attrs=["name", "asn"], plens=[r[4] for r in rows]
    )
    return (
        out.groupBy(
            F.coalesce(F.col("name"), F.lit("unknown")).alias("net_name"),
            F.coalesce(F.col("asn"), F.lit(0)).alias("net_asn"),
        )
        .agg(F.count(F.lit(1)).alias("flows"), F.sum("Bytes").alias("bytes"))
        .orderBy("net_name", "net_asn")
    )


def _oracle_lpm() -> str:
    vals = ", ".join(
        "("
        + (f"'{name}'" if name is not None else "CAST(NULL AS VARCHAR)")
        + f", {asn}, unhex('{lo.hex()}'), unhex('{hi.hex()}'), {plen})"
        for (name, asn, lo, hi, plen) in _rows()
    )
    return f"""
WITH fl AS (
  SELECT row_number() OVER () AS rid, SrcAddr, Bytes FROM {oracle_view_sql()}
),
nets(name, asn, lo, hi, plen) AS (SELECT * FROM (VALUES {vals})),
m AS (
  SELECT f.rid, f.Bytes, n.name, n.asn, n.plen
  FROM fl f LEFT JOIN nets n ON f.SrcAddr BETWEEN n.lo AND n.hi
),
r AS (
  SELECT rid,
         arg_max(name, plen) FILTER (WHERE name IS NOT NULL) AS name,
         arg_max(asn, plen) FILTER (WHERE asn IS NOT NULL) AS asn,
         MAX(Bytes) AS Bytes
  FROM m GROUP BY rid
)
SELECT COALESCE(name, 'unknown') AS net_name, COALESCE(asn, 0) AS net_asn,
       COUNT(*) AS flows, SUM(Bytes) AS bytes
FROM r GROUP BY 1, 2 ORDER BY net_name, net_asn"""


register("lpm_networks", _spark_lpm, _oracle_lpm())
