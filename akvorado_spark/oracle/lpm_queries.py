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
       COUNT(*) AS flows, CAST(SUM(Bytes) AS BIGINT) AS bytes
FROM r GROUP BY 1, 2 ORDER BY net_name, net_asn"""


register("lpm_networks", _spark_lpm, _oracle_lpm())


# --- J4: exporter-keyed RIB lookup with default-agent fallback -------------
#
# The reference keeps one BGP RIB per exporter (BMP feed) and falls
# back to a default agent's RIB when the exporter has none
# (outlet/routing/root.go:78).  Routes for exporters 192.0.2.1/.2 are
# specific; everything else resolves through the NULL-exporter
# fallback rows.

ROUTES = [
    # (exporter_ip | None, cidr, dst_as)
    ("192.0.2.1", "10.0.0.0/8", 64601),
    ("192.0.2.1", "10.64.0.0/10", 64602),
    ("192.0.2.2", "10.0.0.0/9", 64603),
    (None, "10.0.0.0/8", 64600),
    (None, "10.3.0.0/16", 64610),
]


def _route_rows():
    from akvorado_spark.functions.ip import ip_bytes

    out = []
    for exp, cidr, asn in ROUTES:
        lo, hi = prefix_range(cidr)
        out.append(
            (ip_bytes(exp) if exp else None, asn, lo, hi, prefix_mapped_len(cidr))
        )
    return out


def _spark_lpm_rib(spark, sf_dir):
    from pyspark.sql import functions as F

    from akvorado_spark.operators.lpm import lpm_join
    from akvorado_spark.sources.tables import local_df

    register_spark_view(spark, sf_dir)
    rows = _route_rows()
    routes = local_df(
        spark, rows, "exporter binary, dst_as long, lo binary, hi binary, plen int"
    )
    flows = spark.table("flows_v").select("ExporterName", "ExporterAddress", "SrcAddr")
    out = lpm_join(
        flows,
        routes,
        "SrcAddr",
        attrs=["dst_as"],
        exporter_col="ExporterAddress",
        plens=[r[4] for r in rows],
    )
    return (
        out.groupBy(
            "ExporterName", F.coalesce(F.col("dst_as"), F.lit(0)).alias("route_as")
        )
        .agg(F.count(F.lit(1)).alias("flows"))
        .orderBy("ExporterName", "route_as")
    )


def _oracle_lpm_rib() -> str:
    vals = ", ".join(
        "("
        + (f"unhex('{e.hex()}')" if e is not None else "CAST(NULL AS BLOB)")
        + f", {asn}, unhex('{lo.hex()}'), unhex('{hi.hex()}'), {plen})"
        for (e, asn, lo, hi, plen) in _route_rows()
    )
    return f"""
WITH fl AS (
  SELECT row_number() OVER () AS rid, ExporterName, ExporterAddress, SrcAddr
  FROM {oracle_view_sql()}
),
routes(exporter, dst_as, lo, hi, plen) AS (SELECT * FROM (VALUES {vals})),
m AS (
  SELECT f.rid, f.ExporterName,
         CASE WHEN r.exporter IS NOT NULL THEN r.dst_as END AS keyed_as,
         CASE WHEN r.exporter IS NULL THEN r.dst_as END AS fb_as,
         r.plen
  FROM fl f LEFT JOIN routes r
    ON f.SrcAddr BETWEEN r.lo AND r.hi
   AND (r.exporter IS NULL OR r.exporter = f.ExporterAddress)
),
resolved AS (
  SELECT rid, ExporterName,
         COALESCE(
           arg_max(keyed_as, plen) FILTER (WHERE keyed_as IS NOT NULL),
           arg_max(fb_as, plen) FILTER (WHERE fb_as IS NOT NULL),
           0) AS route_as
  FROM m GROUP BY rid, ExporterName
)
SELECT ExporterName, route_as, COUNT(*) AS flows
FROM resolved GROUP BY ExporterName, route_as
ORDER BY ExporterName, route_as"""


register("lpm_rib", _spark_lpm_rib, _oracle_lpm_rib())
