"""Oracle-checked per-series stats (SURVEY §2.4 A12) — computed over
the filled graph_line_avg result, so the whole pipeline
line-compile → stats is certified end to end."""

from __future__ import annotations

from akvorado_spark.oracle.line_queries import LINE_REQS, USER_SEG, events_source
from akvorado_spark.oracle.registry import register
from akvorado_spark.query.line import compile_line, oracle_line_sql
from akvorado_spark.query.stats import oracle_series_stats_sql, series_stats

_REQ = LINE_REQS["graph_line_avg"]


def _spark_stats(spark, sf_dir):
    # ordered=False: series_stats aggregates the line (its own windows
    # re-sort per series), so the chart-contract sort is dead weight
    line = compile_line(events_source(spark, sf_dir), _REQ, ordered=False)
    return series_stats(line, _REQ.dimensions, _REQ.interval_s)


def _oracle_stats() -> str:
    src = f"(SELECT ts, event_type, value, {USER_SEG} AS user_seg FROM events)"
    return oracle_series_stats_sql(
        oracle_line_sql(src, _REQ), _REQ.dimensions, _REQ.interval_s
    )


register("series_stats", _spark_stats, _oracle_stats())
