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


def _mk(name: str, dsl: str) -> None:
    sch = flow_filter_schema()
    f = compile_filter(dsl, sch)

    def run(spark, sf_dir, _f=f):
        register_spark_view(spark, sf_dir)
        return spark.sql(AGG_SQL.format(src="flows_v", where=_f.spark_sql))

    register(name, run, AGG_SQL.format(src=oracle_view_sql(), where=f.duckdb_sql))


for _name, _dsl in FILTER_CASES.items():
    _mk(_name, _dsl)
