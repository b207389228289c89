"""Oracle-checked filter-DSL queries for the productions the base
flows view can't express (SURVEY §2.2 P3 prefix, P6 array/community
membership, P8 MAC).

The array/struct columns can't live in the shared view SQL (array
literal syntax differs between engines), so each engine derives them
from the same base columns with its own syntax — identical values,
then the *same compiled filter AST* is lowered to each dialect.
"""

from __future__ import annotations

from akvorado_spark.filtering.compile import CompiledFilter
from akvorado_spark.filtering.model import ColumnSpec, FilterSchema
from akvorado_spark.filtering.parser import parse_filter
from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register

_SCHEMA = FilterSchema(
    {
        "proto": ColumnSpec("Proto", "proto"),
        "srcas": ColumnSpec("SrcAS", "uint"),
        "dstas": ColumnSpec("DstAS", "uint"),
        "inifspeed": ColumnSpec("InIfSpeed", "uint"),
        "outifspeed": ColumnSpec("OutIfSpeed", "uint"),
        "dstaspath": ColumnSpec("DstASPath", "array_uint"),
        "dstcommunities": ColumnSpec("DstCommunities", "community"),
        "dstlargecommunities": ColumnSpec("DstLargeCommunities", "large_community"),
        "srcmac": ColumnSpec("SrcMAC", "mac"),
        "srcnetprefix": ColumnSpec("SrcNetPrefix", "prefix"),
    }
)

_MAC_INT = 24 * 99991 + 17  # present wherever SrcPort % 500 == 24
_MAC_STR = ":".join(f"{(_MAC_INT >> s) & 0xFF:02x}" for s in (40, 32, 24, 16, 8, 0))

# identical derivations, dialect-specific array/struct syntax
_SPARK_EXT = """SELECT Proto, SrcAS, DstAS, InIfSpeed, OutIfSpeed, Bytes, SamplingRate,
  array(CAST(SrcAS AS BIGINT), CAST(SrcAS AS BIGINT), CAST(DstAS AS BIGINT)) AS DstASPath,
  array(CAST(SrcAS AS BIGINT) * 65536 + 100, CAST(SrcAS AS BIGINT) * 65536 + 200) AS DstCommunities,
  array(named_struct('asn', CAST(SrcAS AS BIGINT), 'local1', CAST(1 AS BIGINT), 'local2', CAST(2 AS BIGINT))) AS DstLargeCommunities,
  CAST((SrcPort % 500) * 99991 + 17 AS BIGINT) AS SrcMAC,
  '10.' || CAST(SrcAS - 64512 AS STRING) || '.0.0/16' AS SrcNetPrefix
FROM flows_v"""

_DUCK_EXT = """SELECT Proto, SrcAS, DstAS, InIfSpeed, OutIfSpeed, Bytes, SamplingRate,
  [CAST(SrcAS AS BIGINT), CAST(SrcAS AS BIGINT), CAST(DstAS AS BIGINT)] AS DstASPath,
  [CAST(SrcAS AS BIGINT) * 65536 + 100, CAST(SrcAS AS BIGINT) * 65536 + 200] AS DstCommunities,
  [{'asn': CAST(SrcAS AS BIGINT), 'local1': CAST(1 AS BIGINT), 'local2': CAST(2 AS BIGINT)}] AS DstLargeCommunities,
  CAST((SrcPort % 500) * 99991 + 17 AS BIGINT) AS SrcMAC,
  '10.' || CAST(SrcAS - 64512 AS STRING) || '.0.0/16' AS SrcNetPrefix
FROM flows_v"""

FILTER_CASES = {
    "flt_prefix_eq": "SrcNetPrefix = '10.5.0.0/16' OR SrcNetPrefix IN ('10.7.0.0/16')",
    "flt_aspath_has": "DstASPath = 64515 OR DstASPath IN (64516, 64517)",
    "flt_community_has": "DstCommunities = 64513:100 AND NOT (DstCommunities = 64513:999)",
    "flt_large_community": "DstLargeCommunities = 64514:1:2",
    "flt_mac_eq": f"SrcMAC = {_MAC_STR} AND Proto != 'icmp'",
    # ordered col-vs-col comparison between plain uints + ASN-pair
    # equality (the parser-type rules adopted from console/filter.go)
    "flt_col_ordered": "InIfSpeed >= OutIfSpeed AND SrcAS != DstAS",
}

# CAST pins BIGINT on both engines (DuckDB SUM(BIGINT)→HUGEINT→float64
# in pandas, which the driver's dtype-aware hash rejects).
AGG = (
    "SELECT Proto, COUNT(*) AS flows, CAST(SUM(Bytes * SamplingRate) AS BIGINT) AS bytes "
    "FROM ({src}) WHERE {where} GROUP BY Proto ORDER BY Proto"
)


# One tagged-UNION suite — same slot economics as flt_dsl_suite.
def _member(variant: str, where: str, src: str) -> str:
    inner = AGG.format(src=src, where=where)
    return f"SELECT '{variant}' AS variant, * FROM ({inner})"


def _suite_spark(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    parts = [
        _member(n, CompiledFilter(parse_filter(d, _SCHEMA), _SCHEMA).spark_sql, _SPARK_EXT)
        for n, d in FILTER_CASES.items()
    ]
    return spark.sql(" UNION ALL ".join(parts))


def _suite_oracle() -> str:
    duck_src = _DUCK_EXT.replace("flows_v", f"({oracle_view_sql()})")
    return " UNION ALL ".join(
        _member(n, CompiledFilter(parse_filter(d, _SCHEMA), _SCHEMA).duckdb_sql, duck_src)
        for n, d in FILTER_CASES.items()
    )


register("flt_ext_suite", _suite_spark, _suite_oracle())
