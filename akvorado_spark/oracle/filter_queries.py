"""Oracle-checked queries exercising the filter DSL (SURVEY §2.2).

Each entry compiles one DSL filter to BOTH dialects from the same AST
and runs the same aggregation on the flows view — so a hash match in
the driver's gate certifies the whole parse→lower pipeline for that
grammar production.
"""

from __future__ import annotations

from akvorado_spark.filtering import compile_filter, flow_filter_schema
from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register

# name → DSL filter text (over the derived flows view's columns)
FILTER_CASES = {
    "flt_ip_subnet": "SrcAddr << '10.2.0.0/15'",
    "flt_ip_exact_and_neq": "SrcAddr != '10.1.2.3' AND DstAddr << '198.51.0.0/16'",
    "flt_ip_in_mixed": "SrcAddr IN ('10.1.2.3', '10.4.0.0/14', '10.40.0.0/13')",
    "flt_ip_notin": "SrcAddr NOTIN ('10.0.0.0/13', '10.16.0.0/12')",
    "flt_string_ops": "ExporterName LIKE 'router%' AND ExporterName NOTIN ('router3') AND InIfName ILIKE 'GI0/0/1'",
    "flt_col_eq": "InIfName = OutIfName",
    "flt_uint_range": "SrcPort >= 1800 AND DstPort IN (443, 53) AND Bytes > 1000000",
    "flt_proto_enum": "Proto = 'tcp' AND EType = IPv4 AND InIfBoundary = external",
    "flt_bool_combo": "NOT (Proto = 'udp' OR Proto = 'icmp') AND (SrcAS = 64515 OR DstAS IN (64512, 64513)) -- c",
    "flt_time_range": "TimeReceived >= '1995-01-01 00:00:00' AND TimeReceived < '1996-07-01 00:00:00'",
}

# CAST on the sums pins BIGINT on both engines: DuckDB's SUM(BIGINT) is
# HUGEINT, which pandas/arrow render as float64/decimal128 and the
# driver's dtype-aware hash then rejects against Spark's int64.
AGG_SQL = (
    "SELECT Proto, COUNT(*) AS flows, CAST(SUM(Bytes) AS BIGINT) AS bytes, "
    "CAST(SUM(Bytes * SamplingRate * 8) AS BIGINT) AS l3bits FROM {src} WHERE {where} "
    "GROUP BY Proto ORDER BY Proto"
)


# One suite query covers all grammar productions: each case becomes a
# tagged UNION ALL member, so the driver's 50-query correctness budget
# spends one slot while still hash-gating every production's aggregate.
def _member_sql(variant: str, where: str, src: str) -> str:
    inner = AGG_SQL.format(src=src, where=where)
    return f"SELECT '{variant}' AS variant, * FROM ({inner})"


def _suite_spark(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    sch = flow_filter_schema()
    parts = [
        _member_sql(name, compile_filter(dsl, sch).spark_sql, "flows_v")
        for name, dsl in FILTER_CASES.items()
    ]
    return spark.sql(" UNION ALL ".join(parts))


def _suite_oracle() -> str:
    sch = flow_filter_schema()
    return " UNION ALL ".join(
        _member_sql(name, compile_filter(dsl, sch).duckdb_sql, oracle_view_sql())
        for name, dsl in FILTER_CASES.items()
    )


register("flt_dsl_suite", _suite_spark, _suite_oracle())
