"""Property-based cross-engine sweep of the per-series stats (SURVEY
§2.4 A12): random line-request shapes feed ``series_stats`` vs
``oracle_series_stats_sql`` over the same filled line frame.  The p95
linear interpolation (index 0.95·(n-1)) and the second-to-last 'last'
point are the edge-prone formulas — short series (down to n=2 buckets)
and single-dimension cardinalities are generated on purpose.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from akvorado_spark.query.line import LineRequest, compile_line, oracle_line_sql
from akvorado_spark.query.stats import oracle_series_stats_sql, series_stats
from akvorado_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

_WEIGHT = "CAST(ROUND(value * 1000000) AS BIGINT)"
_SRC_SQL = "SELECT ts, event_type, value FROM events"

_REQS = st.builds(
    lambda interval, limit: LineRequest(
        time_col="ts",
        dimensions=("event_type",),
        weight_sql=_WEIGHT,
        interval_s=interval,
        limit=limit,
        fill=True,
    ),
    # huge intervals make SHORT series (2-4 points) — the p95/last edges
    st.sampled_from([86400, 432000, 1296000, 2000000, 2591999]),
    st.integers(1, 6),
)


@pytest.fixture(scope="module")
def engines(spark):
    load_table(spark, "events", SF_DIR).createOrReplaceTempView("__stats_events")
    src = spark.sql(_SRC_SQL.replace("FROM events", "FROM __stats_events")).persist()
    src.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return spark, src, con


@settings(
    max_examples=int(__import__("os").environ.get("STATS_PROP_EXAMPLES", "10")),
    deadline=None,
    derandomize=not __import__("os").environ.get("STATS_PROP_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(req=_REQS)
@pytest.mark.slow
def test_random_series_stats_agree_across_engines(engines, req):
    spark, src, con = engines
    line = compile_line(src, req)
    sdf = series_stats(line, ("event_type",), req.interval_s)
    cols = ["event_type", "average", "total", "min_v", "max_v", "last_v", "p95"]
    s_rows = sorted(tuple(r[c] for c in cols) for r in sdf.select(cols).collect())
    o_sql = oracle_series_stats_sql(
        oracle_line_sql(f"({_SRC_SQL})", req), ("event_type",), req.interval_s
    )
    d_rows = sorted(tuple(r) for r in con.execute(o_sql).fetchall())
    assert s_rows == d_rows, (req, s_rows[:3], d_rows[:3])
