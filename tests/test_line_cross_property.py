"""Property-based cross-engine sweep of the graph-line compiler
(SURVEY §2.4 A2/A4-A6, §2.5/§2.6 O1-O2, §2.3 J7): random LineRequests
(interval, limit, limit-type, fill, 1-2 dimensions) run through
``compile_line`` on Spark and ``oracle_line_sql`` on DuckDB over the
same events-derived source; bucket spines, top-N ranking, 'Other'
folding and gap filling must agree row-for-row.

Complements the 5 fixed suite members with arbitrary parameter
combinations — especially irregular intervals that don't divide the
range and limits straddling the dimension cardinality (where the
'Other' row logic has its edge cases).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from akvorado_spark.query.line import LineRequest, compile_line, oracle_line_sql
from akvorado_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

_WEIGHT = "CAST(ROUND(value * 1000000) AS BIGINT)"
_SEG = ("CASE WHEN user_id % 3 = 0 THEN 'small' WHEN user_id % 3 = 1 THEN 'mid' "
        "ELSE 'large' END")
_SRC_SQL = f"SELECT ts, event_type, value, {_SEG} AS user_seg FROM events"

_REQS = st.builds(
    lambda interval, limit, lt, fill, two_dims: LineRequest(
        time_col="ts",
        dimensions=("event_type", "user_seg") if two_dims else ("event_type",),
        weight_sql=_WEIGHT,
        interval_s=interval,
        limit=limit,
        fill=fill,
        limit_type=lt,
    ),
    # irregular intervals on purpose: 7h13m, 11h59m... nothing divides
    st.sampled_from([25989, 43181, 86400, 129600, 191999]),
    st.integers(1, 12),
    st.sampled_from(["avg", "max", "last"]),
    st.booleans(),
    st.booleans(),
)


@pytest.fixture(scope="module")
def engines(spark):
    load_table(spark, "events", SF_DIR).createOrReplaceTempView("__prop_events")
    src = spark.sql(_SRC_SQL.replace("FROM events", "FROM __prop_events")).persist()
    src.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return spark, src, con


@settings(
    max_examples=int(__import__("os").environ.get("LINE_PROP_EXAMPLES", "15")),
    deadline=None,
    derandomize=not __import__("os").environ.get("LINE_PROP_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(req=_REQS)
def test_random_line_request_agrees_across_engines(engines, req):
    spark, src, con = engines
    sdf = compile_line(src, req)
    cols = ["bucket", *req.dimensions, "sum_w"]
    s_rows = sorted(tuple(r[c] for c in cols) for r in sdf.select(cols).collect())
    o_sql = oracle_line_sql(f"({_SRC_SQL})", req)
    o_res = con.execute(
        f"SELECT {', '.join(cols)} FROM ({o_sql})"
    ).fetchall()
    d_rows = sorted(tuple(r) for r in o_res)
    assert s_rows == d_rows, (req, s_rows[:3], d_rows[:3])


@settings(
    max_examples=int(__import__("os").environ.get("LINE_PROP_EXAMPLES", "10")),
    deadline=None,
    derandomize=not __import__("os").environ.get("LINE_PROP_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    req=_REQS,
    flt=st.sampled_from(
        ["value >= 0.3", "value < 0.7", "CAST(ROUND(value * 1000000) AS BIGINT) % 2 = 0"]
    ),
)
def test_random_shared_rows_axis_agrees_across_engines(engines, req, flt):
    """The multi-axis shared-rows path: a second axis over a DIFFERENT
    population (an extra filter) folds against the FIRST axis's top
    set — compile_line(rows=...) vs oracle_line_sql(rows_sql=...) must
    agree for arbitrary requests, including tuples that exist in axis 2
    but were never ranked (they must fold to 'Other') and top tuples
    absent from axis 2 (they must still spine-fill when fill=True)."""
    from akvorado_spark.query.line import oracle_line_rows_sql, top_rows_frame

    spark, src, con = engines
    src2_sql = f"SELECT * FROM ({_SRC_SQL}) WHERE {flt}"
    src2 = src.filter(flt)
    rows1 = top_rows_frame(src, req)
    sdf = compile_line(src2, req, rows=rows1)
    cols = ["bucket", *req.dimensions, "sum_w"]
    s_rows = sorted(tuple(r[c] for c in cols) for r in sdf.select(cols).collect())
    rows1_sql = oracle_line_rows_sql(f"({_SRC_SQL})", req)
    o_sql = oracle_line_sql(f"({src2_sql})", req, rows_sql=rows1_sql)
    d_rows = sorted(
        tuple(r)
        for r in con.execute(f"SELECT {', '.join(cols)} FROM ({o_sql})").fetchall()
    )
    assert s_rows == d_rows, (req, flt, s_rows[:3], d_rows[:3])
