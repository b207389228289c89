"""Property-based cross-engine sweep of the sankey compiler (SURVEY
§3.2): random dimension subsets and limits through ``compile_sankey``
vs ``oracle_sankey_sql``.  The per-dimension fold (a row keeps
dimension *i* iff that value appears at position *i* of ANY top
tuple — not per-tuple membership) is the subtle semantic here, so the
sweep varies dimension order and limits straddling cardinalities.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from akvorado_spark.query.sankey import SankeyRequest, compile_sankey, oracle_sankey_sql
from akvorado_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

_WEIGHT = "CAST(ROUND(value * 1000000) AS BIGINT)"
_SEG = ("CASE WHEN user_id % 3 = 0 THEN 'small' WHEN user_id % 3 = 1 THEN 'mid' "
        "ELSE 'large' END")
_BAND = "CASE WHEN value < 5 THEN 'lo' WHEN value < 20 THEN 'mid' ELSE 'hi' END"
_SRC_SQL = (
    f"SELECT ts, event_type, value, {_SEG} AS user_seg, {_BAND} AS band, "
    "CAST(user_id % 10 AS STRING) AS user_mod FROM events"
)

_DIM_POOL = ["event_type", "user_seg", "band", "user_mod"]

_REQS = st.builds(
    lambda dims, limit: SankeyRequest(
        time_col="ts",
        dimensions=tuple(dims),
        weight_sql=_WEIGHT,
        limit=limit,
    ),
    st.lists(st.sampled_from(_DIM_POOL), min_size=1, max_size=3, unique=True),
    st.integers(1, 14),
)


@pytest.fixture(scope="module")
def engines(spark):
    load_table(spark, "events", SF_DIR).createOrReplaceTempView("__sankey_events")
    src = spark.sql(_SRC_SQL.replace("FROM events", "FROM __sankey_events")).persist()
    src.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return spark, src, con


@settings(
    max_examples=int(__import__("os").environ.get("SANKEY_PROP_EXAMPLES", "15")),
    deadline=None,
    derandomize=not __import__("os").environ.get("SANKEY_PROP_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(req=_REQS)
def test_random_sankey_agrees_across_engines(engines, req):
    spark, src, con = engines
    cols = [*req.dimensions, "sum_w", "xps"]
    sdf = compile_sankey(src, req)
    s_rows = sorted(tuple(r[c] for c in cols) for r in sdf.select(cols).collect())
    o_sql = oracle_sankey_sql(f"({_SRC_SQL})", req)
    d_rows = sorted(
        tuple(r) for r in con.execute(f"SELECT {', '.join(cols)} FROM ({o_sql})").fetchall()
    )
    assert s_rows == d_rows, (req, s_rows[:3], d_rows[:3])
