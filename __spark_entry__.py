"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are the engine's operator surface (SURVEY.md §2) instantiated
over the driver's test tables; the flow-native paths are additionally
exercised by pytest over synthetic flow fixtures.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from akvorado_spark.query.line import LineRequest, compile_line, oracle_line_sql
from akvorado_spark.sources.tables import load_table

# Per-row weight for the events fact table: integer micro-units so
# sums are exact integers in both engines (no float summation-order
# divergence between Spark and the DuckDB oracle).
EVENTS_WEIGHT = "CAST(ROUND(value * 1000000) AS BIGINT)"

_LINE_REQS: dict[str, LineRequest] = {
    "graph_line_avg": LineRequest(
        time_col="ts", dimensions=("event_type",), weight_sql=EVENTS_WEIGHT,
        interval_s=600, limit=3, fill=True, limit_type="avg",
    ),
    "graph_line_max": LineRequest(
        time_col="ts", dimensions=("event_type",), weight_sql=EVENTS_WEIGHT,
        interval_s=900, limit=2, fill=True, limit_type="max",
    ),
    "graph_line_last": LineRequest(
        time_col="ts", dimensions=("event_type",), weight_sql=EVENTS_WEIGHT,
        interval_s=1800, limit=2, fill=True, limit_type="last",
    ),
    "graph_line_2dims": LineRequest(
        time_col="ts", dimensions=("event_type", "user_seg"), weight_sql=EVENTS_WEIGHT,
        interval_s=3600, limit=5, fill=True, limit_type="avg",
    ),
    "graph_line_nofill": LineRequest(
        time_col="ts", dimensions=("event_type",), weight_sql=EVENTS_WEIGHT,
        interval_s=600, limit=3, fill=False, limit_type="avg",
    ),
}

# user_seg: a derived low-cardinality dimension over events (mirrors the
# reference's enum dimensions) — same expression in Spark SQL and DuckDB.
USER_SEG = "CASE WHEN user_id % 3 = 0 THEN 'small' WHEN user_id % 3 = 1 THEN 'mid' ELSE 'large' END"


def _events_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "events", sf_dir)
    return df.selectExpr("ts", "event_type", "value", f"{USER_SEG} AS user_seg")


def _line_query(req: LineRequest) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return compile_line(_events_source(spark, sf_dir), req)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _line_query(_LINE_REQS["graph_line_avg"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, req in _LINE_REQS.items():
        out[name] = _line_query(req)
    return out


def oracle_sql() -> dict[str, str]:
    events_src = f"(SELECT ts, event_type, value, {USER_SEG} AS user_seg FROM events)"
    out: dict[str, str] = {}
    for name, req in _LINE_REQS.items():
        out[name] = oracle_line_sql(events_src, req)
    return out
