"""Oracle-checked graph-line queries over the events table (SURVEY
§2.4 A2/A4-A6, §2.3 J7/J9, §2.6 O1-O2, §2.5 gap filling)."""

from __future__ import annotations

from akvorado_spark.oracle.registry import register
from akvorado_spark.query.line import LineRequest, compile_line, oracle_line_sql
from akvorado_spark.sources.tables import load_table

# Integer micro-units so sums are exact in both engines.
EVENTS_WEIGHT = "CAST(ROUND(value * 1000000) AS BIGINT)"

USER_SEG = (
    "CASE WHEN user_id % 3 = 0 THEN 'small' WHEN user_id % 3 = 1 THEN 'mid' "
    "ELSE 'large' END"
)

LINE_REQS = {
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


def events_source(spark, sf_dir: str):
    df = load_table(spark, "events", sf_dir)
    return df.selectExpr("ts", "event_type", "value", f"{USER_SEG} AS user_seg")


def _mk(name: str, req: LineRequest) -> None:
    def run(spark, sf_dir, _req=req):
        return compile_line(events_source(spark, sf_dir), _req)

    src = f"(SELECT ts, event_type, value, {USER_SEG} AS user_seg FROM events)"
    register(name, run, oracle_line_sql(src, req))


for _name, _req in LINE_REQS.items():
    _mk(_name, _req)
