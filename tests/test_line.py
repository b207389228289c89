"""Graph-line compiler tests (SURVEY §2: A2, A4-A6, J7, O1, J9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from akvorado_spark.query.line import LineRequest, compile_line
from akvorado_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def _events(spark):
    return load_table(spark, "events", SF_DIR).select("ts", "event_type", "value")


def test_line_buckets_aligned_to_range_start(spark):
    df = _events(spark)
    req = LineRequest(
        time_col="ts", dimensions=("event_type",),
        weight_sql="CAST(ROUND(value * 1000000) AS BIGINT)",
        interval_s=600, limit=3,
    )
    out = compile_line(df, req)
    rows = out.collect()
    assert rows
    start_us = df.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    buckets = sorted({r["bucket"] for r in rows})
    # aligned to range start, contiguous (gap-filled) spine
    assert buckets[0] == start_us
    step = 600 * 1_000_000
    assert all((b - start_us) % step == 0 for b in buckets)
    assert buckets == list(range(buckets[0], buckets[-1] + step, step))


def test_line_integer_dimension_folds_to_string(spark):
    """Numeric dims fold through their display string — 'Other' must not
    hit an ANSI string→bigint cast (regression)."""
    df = _events(spark).select("ts", (F.col("event_type") != "click").cast("int").alias("k"), "value")
    req = LineRequest(
        time_col="ts", dimensions=("k",),
        weight_sql="CAST(ROUND(value * 1000000) AS BIGINT)",
        interval_s=86400, limit=1,
    )
    out = compile_line(df, req).collect()
    kinds = {r["k"] for r in out}
    assert kinds <= {"0", "1", "Other"} and "Other" in kinds


def test_line_other_folding_and_topn(spark):
    df = _events(spark)
    req = LineRequest(
        time_col="ts", dimensions=("event_type",),
        weight_sql="CAST(ROUND(value * 1000000) AS BIGINT)",
        interval_s=3600, limit=2,
    )
    out = compile_line(df, req).collect()
    kinds = {r["event_type"] for r in out}
    n_types = df.select("event_type").distinct().count()
    assert "Other" in kinds  # events has >2 types
    assert len(kinds) == 3  # top-2 + Other
    assert n_types > 2
    # total weight is conserved by folding
    total = df.select(F.sum(F.expr("CAST(ROUND(value * 1000000) AS BIGINT)"))).collect()[0][0]
    assert sum(r["sum_w"] for r in out) == total


def test_line_limit_last_restricts_ranking_window(spark):
    df = _events(spark)
    base = dict(
        time_col="ts", dimensions=("event_type",),
        weight_sql="CAST(ROUND(value * 1000000) AS BIGINT)",
        interval_s=1800, limit=1,
    )
    avg = compile_line(df, LineRequest(**base, limit_type="avg"))
    last = compile_line(df, LineRequest(**base, limit_type="last"))
    assert avg.columns == last.columns == ["bucket", "event_type", "sum_w", "xps"]


# ---------------------------------------------------------------------------
# previous-period selection (reference console/line.go:57-96 + the
# leap-year invariant of console/line_test.go TestGraphQueryAxesLeapYear)
# ---------------------------------------------------------------------------


def test_nearest_period_breakpoints():
    from akvorado_spark.query.line import nearest_period

    h = 3600
    assert nearest_period(h) == (h, "hour")
    assert nearest_period(2 * h - 1) == (h, "hour")
    assert nearest_period(2 * h) == (24 * h, "day")
    assert nearest_period(2 * 24 * h) == (7 * 24 * h, "week")
    assert nearest_period(2 * 7 * 24 * h) == (4 * 7 * 24 * h, "month")
    assert nearest_period(2 * 4 * 7 * 24 * h) == (0, "year")


def test_previous_period_leap_year_spans_match():
    """Both reference leap cases: whether the leap day sits in the main
    or the previous period, the two ranges must cover the SAME span —
    they share a bucket grid, so a longer previous range would draw one
    extra point."""
    from datetime import datetime, timezone

    from akvorado_spark.query.line import previous_period

    us = 1_000_000

    def ts(y, m, d, hh=15, mm=45, ss=10):
        return int(datetime(y, m, d, hh, mm, ss, tzinfo=timezone.utc).timestamp()) * us

    for start, end in [
        (ts(2020, 1, 1), ts(2020, 3, 5)),  # leap day in the main period
        (ts(2021, 1, 1), ts(2021, 3, 5)),  # leap day in the previous period
    ]:
        ps, pe, shift = previous_period(start, end)
        assert pe - ps == end - start  # identical span
        assert ps == start - shift and pe == end - shift
        # the shift is a plausible year: 365 or 366 days
        assert shift in (365 * 86400 * us, 366 * 86400 * us)


def test_previous_period_feb29_start_normalizes_like_go():
    """Go's AddDate(-1,0,0) turns 2024-02-29 into 2023-03-01; the shift
    must mirror that normalization (365 days, not a ValueError)."""
    from datetime import datetime, timezone

    from akvorado_spark.query.line import previous_period

    us = 1_000_000
    start = int(datetime(2024, 2, 29, tzinfo=timezone.utc).timestamp()) * us
    end = start + 90 * 86400 * us
    ps, pe, shift = previous_period(start, end)
    assert shift == 365 * 86400 * us
    assert pe - ps == end - start


def test_previous_period_sub_year_uses_fixed_periods():
    from akvorado_spark.query.line import previous_period

    us = 1_000_000
    start = 1_700_000_000 * us
    # 1-hour range → hour shift
    assert previous_period(start, start + 3600 * us)[2] == 3600 * us
    # 3-day range → week shift
    assert previous_period(start, start + 3 * 86400 * us)[2] == 7 * 86400 * us


def test_approx_pct_units_match_exact_at_small_cardinality(spark):
    """A8 scale path: HLL++ distinct-count %-units agree with the exact
    units while the per-group interface population sits in the sketch's
    exact sparse range (and stay within rsd beyond)."""
    from akvorado_spark.oracle.flows_view import register_spark_view
    from akvorado_spark.query.units import UNITS, approx_pct_unit

    register_spark_view(spark, SF_DIR)
    src = spark.table("flows_v")
    for name in ("inl2%", "outl2%"):
        exact = UNITS[name]
        approx = approx_pct_unit(name)
        rows = src.groupBy("ExporterName").agg(
            F.expr(exact.agg_sql).alias("e"), F.expr(approx.agg_sql).alias("a")
        ).collect()
        assert rows
        for r in rows:
            assert r["a"] == pytest.approx(r["e"], rel=0.05)
