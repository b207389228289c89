"""Oracle-checked units-aggregate queries (SURVEY §2.4 A1/A8).

``units_line_*`` run the full graph-line machinery with the unit's
aggregate expression; ``units_by_if`` checks all units side by side in
one grouped query (pct units rounded to 6 decimals — their float
summation order may differ by an ulp between engines).
"""

from __future__ import annotations

from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register
from akvorado_spark.query.line import LineRequest, compile_line, oracle_line_sql
from akvorado_spark.query.units import UNITS

_LINE_UNITS = {
    "units_line_l3bps": ("l3bps", 90 * 86400, "avg"),
    "units_line_fps": ("fps", 180 * 86400, "max"),
    "units_line_l2bps": ("l2bps", 120 * 86400, "last"),
}


def _line_req(unit_name: str, interval_s: int, limit_type: str) -> LineRequest:
    u = UNITS[unit_name]
    return LineRequest(
        time_col="TimeReceived",
        dimensions=("InIfName",),
        weight_sql=None,
        interval_s=interval_s,
        limit=3,
        limit_type=limit_type,
        agg_sql=u.agg_sql,
        base_cols=u.base_cols,
        value_type=u.value_type,
    )


# Tagged UNION of the three unit runs — one correctness slot, each unit
# still exercised through the full line machinery and hash-gated.
def _units_suite_spark(spark, sf_dir):
    from dataclasses import replace

    from pyspark.sql import functions as F

    register_spark_view(spark, sf_dir)
    # shared literal bounds, same rationale as the graph-line suite:
    # one 2-scalar collect instead of three broadcast-agg subtrees
    src = spark.table("flows_v")
    ts = F.col("TimeReceived").cast("timestamp")
    row = src.agg(
        F.min(F.unix_micros(ts)).alias("lo"), F.max(F.unix_micros(ts)).alias("hi")
    ).first()
    out = None
    for name, (u, i, lt) in _LINE_UNITS.items():
        req = _line_req(u, i, lt)
        if row["lo"] is not None:
            req = replace(req, start_us=int(row["lo"]), end_us=int(row["hi"]) + 1)
        # ordered=False: gate hash is order-insensitive; one fewer
        # sort exchange per unioned member (r14)
        df = compile_line(src, req, ordered=False)
        df = df.select(F.lit(name).alias("variant"), "bucket", "InIfName", "sum_w", "xps")
        out = df if out is None else out.unionByName(df)
    return out


def _units_suite_oracle() -> str:
    return " UNION ALL ".join(
        f"SELECT '{name}' AS variant, bucket, InIfName, sum_w, xps "
        f"FROM ({oracle_line_sql(oracle_view_sql(), _line_req(u, i, lt))})"
        for name, (u, i, lt) in _LINE_UNITS.items()
    )


register("units_line_suite", _units_suite_spark, _units_suite_oracle())


# All units side by side per interface + the distinct-interface count (A8).
_UNITS_BY_IF = (
    "SELECT InIfName, "
    "COUNT(*) AS fps, "
    "CAST(SUM(Packets * SamplingRate) AS BIGINT) AS pps, "
    "CAST(SUM(Bytes * SamplingRate * 8) AS BIGINT) AS l3bps, "
    "CAST(SUM((Bytes + 38 * Packets) * SamplingRate * 8) AS BIGINT) AS l2bps, "
    "CAST(ROUND(" + UNITS["inl2%"].agg_sql + ", 6) AS DOUBLE) AS inl2pct, "
    "COUNT(DISTINCT hex(ExporterAddress) || '|' || InIfName) AS n_ifaces "
    "FROM {src} GROUP BY InIfName ORDER BY InIfName"
)


def _units_by_if(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    return spark.sql(_UNITS_BY_IF.format(src="flows_v"))


register("units_by_if", _units_by_if, _UNITS_BY_IF.format(src=oracle_view_sql()))


# A13 grouping sets — absent in the reference's surface (SURVEY §2.4 A13)
# but native in Spark and DuckDB alike, so the rollup matrix the console
# would need for a drill-down widget ships as a bonus operator: per
# (exporter, proto) cells, per-exporter subtotals, and the grand total in
# one pass (Catalyst expands the sets and aggregates map-side before one
# shuffle — no per-level rescan).  One shared SQL string = dialect parity.
_GROUPING_SETS = (
    "SELECT ExporterName, Proto, "
    "CAST(GROUPING(ExporterName) AS INT) AS g_exporter, "
    "CAST(GROUPING(Proto) AS INT) AS g_proto, "
    "COUNT(*) AS fps, "
    "CAST(SUM(Bytes * SamplingRate * 8) AS BIGINT) AS l3bytes_x8 "
    "FROM {src} "
    "GROUP BY GROUPING SETS ((ExporterName, Proto), (ExporterName), ())"
)


def _grouping_sets(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    return spark.sql(_GROUPING_SETS.format(src="flows_v"))


register("units_grouping_sets", _grouping_sets, _GROUPING_SETS.format(src=oracle_view_sql()))
