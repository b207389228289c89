"""Oracle-checked multi-axis graph query (SURVEY §2.7 U1, §2.2 P9):
the direct axis plus the direction-reversed axis (filter and
dimensions swapped Src↔Dst / InIf↔OutIf), unioned with an ``axis``
literal — the reference's UNION ALL shape (console/line.go:189-216,
console/clickhouse.go:126-132)."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.filtering.compile import CompiledFilter
from akvorado_spark.filtering.model import ColumnSpec, FilterSchema
from akvorado_spark.filtering.parser import parse_filter
from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register
from akvorado_spark.query.line import (
    LineRequest,
    compile_line,
    oracle_line_rows_sql,
    oracle_line_sql,
    top_rows_frame,
)

_SCHEMA = FilterSchema(
    {
        "srcport": ColumnSpec("SrcPort", "uint"),
        "dstport": ColumnSpec("DstPort", "uint"),
        "inifname": ColumnSpec("InIfName", "string"),
        "outifname": ColumnSpec("OutIfName", "string"),
        "proto": ColumnSpec("Proto", "proto"),
    },
    {
        "SrcPort": "DstPort",
        "DstPort": "SrcPort",
        "InIfName": "OutIfName",
        "OutIfName": "InIfName",
    },
)

_FILTER = "InIfName IN ('Gi0/0/1', 'Gi0/0/2') AND Proto = 'tcp'"
_L3 = "SUM(Bytes * SamplingRate * 8)"
_BASE = ("Bytes", "SamplingRate")


def _req(dim: str) -> LineRequest:
    return LineRequest(
        time_col="TimeReceived",
        dimensions=(dim,),
        weight_sql=None,
        interval_s=30 * 86400,
        limit=3,
        agg_sql=_L3,
        base_cols=_BASE,
    )


def _req2(dims: tuple[str, str]) -> LineRequest:
    return LineRequest(
        time_col="TimeReceived",
        dimensions=dims,
        weight_sql=None,
        interval_s=30 * 86400,
        limit=3,
        agg_sql=_L3,
        base_cols=_BASE,
    )


def _spark_bidir_line(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    direct = CompiledFilter(parse_filter(_FILTER, _SCHEMA), _SCHEMA)
    reverse = direct.reverse()
    df = spark.table("flows_v")
    # The reference shares one filtered-source CTE across the four
    # axes (console/line.go:169-216); the Spark equivalent is a narrow
    # projection materialized once via lazy localCheckpoint — without
    # it the four compile_line fan-outs re-scan the parquet ~90 times
    # (measured: 88 FileScans, 0 reused exchanges; checkpointing cuts
    # the query ~40%).  ContextCleaner drops the blocks when the plan
    # is garbage-collected, so repeated calls don't accumulate cache.
    cols = [
        "TimeReceived", "InIfName", "OutIfName",
        "SrcPort", "DstPort", "Bytes", "SamplingRate",
    ]
    direct_df = df.filter(direct.column()).select(*cols).localCheckpoint(eager=False)
    reverse_df = df.filter(reverse.column()).select(*cols).localCheckpoint(eager=False)
    # the reverse axis folds against the DIRECT axis's top set — the
    # reference shares axis 1's rows CTE across axes (skipWithClause,
    # console/line.go:169-216) so the chart's series are identical
    rows1 = top_rows_frame(direct_df, _req("InIfName"))
    ax1 = compile_line(direct_df, _req("InIfName"), rows=rows1, ordered=False)
    ax2 = compile_line(
        reverse_df,
        _req("OutIfName"),
        rows=rows1.withColumnRenamed("InIfName", "OutIfName"),
        ordered=False,
    ).withColumnRenamed("OutIfName", "InIfName")
    one = ax1.select(F.lit(1).alias("axis"), "*").unionAll(
        ax2.select(F.lit(2).alias("axis"), "*")
    )
    one = one.select(
        F.lit("if").alias("variant"), "axis", "bucket",
        F.col("InIfName").cast("string").alias("d1"),
        F.lit("").alias("d2"), "sum_w", "xps",
    )
    # REVERSE-PAIR dimension list (SrcPort, DstPort) → (DstPort,
    # SrcPort): the shared rows CTE swaps columns ATOMICALLY — the
    # sequential-rename collision fixed this round, now value-gated.
    # Ports ride as strings so the 'Other' fold literal types cleanly
    # in both engines.
    def _ports(d):
        return d.withColumn("SrcPortS", F.col("SrcPort").cast("string")).withColumn(
            "DstPortS", F.col("DstPort").cast("string")
        )

    rows2 = top_rows_frame(_ports(direct_df), _req2(("SrcPortS", "DstPortS")))
    ax3 = compile_line(_ports(direct_df), _req2(("SrcPortS", "DstPortS")), rows=rows2, ordered=False)
    rows2r = rows2.select(
        F.col("SrcPortS").alias("DstPortS"), F.col("DstPortS").alias("SrcPortS")
    )
    ax4 = compile_line(_ports(reverse_df), _req2(("DstPortS", "SrcPortS")), rows=rows2r, ordered=False)
    pair = ax3.select(
        F.lit("ports").alias("variant"), F.lit(1).alias("axis"), "bucket",
        F.col("SrcPortS").alias("d1"), F.col("DstPortS").alias("d2"), "sum_w", "xps",
    ).unionAll(
        ax4.select(
            F.lit("ports").alias("variant"), F.lit(2).alias("axis"), "bucket",
            # normalize to forward names positionally, like graph_line
            F.col("DstPortS").alias("d1"), F.col("SrcPortS").alias("d2"),
            "sum_w", "xps",
        )
    )
    return one.unionAll(pair)


def _oracle_bidir_line() -> str:
    direct = CompiledFilter(parse_filter(_FILTER, _SCHEMA), _SCHEMA)
    reverse = direct.reverse()
    direct_src = f"(SELECT * FROM ({oracle_view_sql()}) WHERE {direct.duckdb_sql})"
    reverse_src = f"(SELECT * FROM ({oracle_view_sql()}) WHERE {reverse.duckdb_sql})"
    rows1 = oracle_line_rows_sql(direct_src, _req("InIfName"))
    ax1 = oracle_line_sql(direct_src, _req("InIfName"))
    ax2 = oracle_line_sql(
        reverse_src,
        _req("OutIfName"),
        rows_sql=f"SELECT InIfName AS OutIfName FROM ({rows1})",
    )
    def _ports_src(src: str) -> str:
        return (
            f"(SELECT *, CAST(SrcPort AS VARCHAR) AS SrcPortS,"
            f" CAST(DstPort AS VARCHAR) AS DstPortS FROM {src})"
        )

    rows2 = oracle_line_rows_sql(_ports_src(direct_src), _req2(("SrcPortS", "DstPortS")))
    ax3 = oracle_line_sql(_ports_src(direct_src), _req2(("SrcPortS", "DstPortS")))
    ax4 = oracle_line_sql(
        _ports_src(reverse_src),
        _req2(("DstPortS", "SrcPortS")),
        rows_sql=f"SELECT SrcPortS AS DstPortS, DstPortS AS SrcPortS FROM ({rows2})",
    )
    return f"""
SELECT 'if' AS variant, 1 AS axis, bucket, CAST(InIfName AS VARCHAR) AS d1, '' AS d2, sum_w, xps FROM ({ax1})
UNION ALL
SELECT 'if', 2, bucket, CAST(OutIfName AS VARCHAR), '', sum_w, xps FROM ({ax2})
UNION ALL
SELECT 'ports', 1, bucket, SrcPortS, DstPortS, sum_w, xps FROM ({ax3})
UNION ALL
SELECT 'ports', 2, bucket, DstPortS, SrcPortS, sum_w, xps FROM ({ax4})"""


register("graph_line_bidir", _spark_bidir_line, _oracle_bidir_line())


# --- previous-period axis (reference console/line.go:59-117): the
# comparison axis scans the range shifted back one period, then its
# buckets shift forward to overlay the main time axis.

_US = 1_000_000
_START = 820454400 * _US  # 1996-01-01
_END = 836179200 * _US  # 1996-07-01
# the range spans ~6 months → nearest_period picks the YEAR case, whose
# shift is measured from the range start so both ends move equally
# across leap days (reference console/line.go:57-96; helper unit-tested
# against the reference's leap-year cases in tests/test_line.py)
from akvorado_spark.query.line import previous_period as _previous_period

_PREV_START, _PREV_END, _SHIFT = _previous_period(_START, _END)
_INTERVAL = 14 * 86400  # 14-day buckets


def _prev_req(start: int, end: int) -> LineRequest:
    return LineRequest(
        time_col="TimeReceived",
        dimensions=("InIfName",),
        weight_sql=None,
        interval_s=_INTERVAL,
        limit=3,
        agg_sql=_L3,
        base_cols=_BASE,
        start_us=start,
        end_us=end,
    )


def _range_filter_sql(start: int, end: int) -> str:
    return (
        f"epoch_us(TimeReceived) >= {start} AND epoch_us(TimeReceived) < {end}"
    )


def _prev_req_nodim(start: int, end: int) -> LineRequest:
    from dataclasses import replace

    return replace(_prev_req(start, end), dimensions=())


def _spark_prev_period(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    df = spark.table("flows_v")
    ts = F.unix_micros(F.col("TimeReceived").cast("timestamp"))
    main_df = df.filter((ts >= _START) & (ts < _END))
    # ordered=False on every suite member: gate hash is order-
    # insensitive; drops one sort exchange per member (r14)
    ax1 = compile_line(main_df, _prev_req(_START, _END), ordered=False)
    # the comparison axis is DIMENSIONLESS: the reference strips
    # dimensions when shifting (console/line.go:81-86) — one total
    # series, the dimension column riding along empty for the union
    ax3 = (
        compile_line(
            df.filter((ts >= _START - _SHIFT) & (ts < _END - _SHIFT)),
            _prev_req_nodim(_START - _SHIFT, _END - _SHIFT),
            ordered=False,
        )
        .withColumn("bucket", F.col("bucket") + F.lit(_SHIFT))
        .withColumn("InIfName", F.lit(""))
        .select("bucket", "InIfName", "sum_w", "xps")
    )
    return ax1.select(F.lit(1).alias("axis"), "*").unionAll(
        ax3.select(F.lit(3).alias("axis"), "*")
    )


def _oracle_prev_period() -> str:
    src1 = (
        f"(SELECT * FROM ({oracle_view_sql()}) WHERE {_range_filter_sql(_START, _END)})"
    )
    src3 = (
        f"(SELECT * FROM ({oracle_view_sql()}) "
        f"WHERE {_range_filter_sql(_START - _SHIFT, _END - _SHIFT)})"
    )
    ax1 = oracle_line_sql(src1, _prev_req(_START, _END))
    ax3 = oracle_line_sql(src3, _prev_req_nodim(_START - _SHIFT, _END - _SHIFT))
    return f"""
SELECT 1 AS axis, bucket, InIfName, sum_w, xps FROM ({ax1})
UNION ALL
SELECT 3 AS axis, bucket + {_SHIFT} AS bucket, '' AS InIfName, sum_w, xps FROM ({ax3})"""


register("graph_line_prev_period", _spark_prev_period, _oracle_prev_period())
