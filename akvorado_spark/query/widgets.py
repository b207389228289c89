"""Dashboard widgets (SURVEY §2.4 A10/A11, §2.6 O5, §2.3 J9;
reference console/widgets.go).

Each widget is a small DataFrame plan over the flows frame:

- ``flow_rate``     — COUNT(*)/window over the trailing window
  (reference console/widgets.go:95 — ``COUNT(*)/300`` last 5 min).
- ``top_percent``   — per-group share of a scalar total with an
  'Unknown' fold for empty selector values
  (reference console/widgets.go:213-237).
- ``last_flow``     — the most recent flow, via ``t = (SELECT MAX(t))``
  (reference console/widgets.go:52-58) with a deterministic tiebreak
  so engines agree on which of the simultaneous flows wins.

All scalars are 1-row aggregate frames cross-joined in (the J9
shape) — broadcast, never a shuffle of the fact side.  Rates divide
exact integers so the resulting doubles are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flow_rate(
    df: DataFrame, time_col: str = "TimeReceived", window_s: int = 300
) -> DataFrame:
    """1-row frame ``(rate DOUBLE, period STRING)``: flows per second
    over the trailing ``window_s`` ending at the data's max time.

    The reference anchors at the wall clock; against a static corpus
    the data max is the deterministic equivalent.
    """
    ts = F.col(time_col).cast("timestamp")
    bounds = df.agg(F.max(F.unix_micros(ts)).alias("__max_us"))
    n = (
        df.join(F.broadcast(bounds))
        .filter(F.unix_micros(ts) > F.col("__max_us") - window_s * 1_000_000)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return n.select(
        (F.col("__n").cast("double") / F.lit(window_s)).alias("rate"),
        F.lit("second").alias("period"),
    )


def top_percent(
    df: DataFrame,
    selector: str,
    weight_sql: str = "Bytes * SamplingRate",
    limit: int = 5,
) -> DataFrame:
    """Top-``limit`` groups by share of total weight:
    ``(Name, Percent)`` with empty selector folded to 'Unknown'.

    The caller applies the boundary filter (the reference filters
    ``InIfBoundary = 'external'`` for src-* widgets) before calling.
    """
    w = F.expr(weight_sql).cast("long")
    sel = F.coalesce(F.col(selector).cast("string"), F.lit(""))
    base = df.select(
        F.when(sel == "", F.lit("Unknown")).otherwise(sel).alias("Name"),
        w.alias("__w"),
    )
    total = base.agg(F.sum("__w").alias("__total"))
    return (
        base.groupBy("Name")
        .agg(F.sum("__w").alias("__g"))
        .join(F.broadcast(total))
        .select(
            "Name",
            (F.col("__g").cast("double") * 100 / F.col("__total").cast("double")).alias(
                "Percent"
            ),
        )
        .orderBy(F.col("Percent").desc(), "Name")
        .limit(limit)
    )


def widget_graph(
    df: DataFrame,
    interval_s: int,
    time_col: str = "TimeReceived",
    weight_sql: str = "Bytes * SamplingRate * 8",
) -> DataFrame:
    """Homepage traffic graph (reference console/widgets.go:250-298):
    a dimensionless Gbps time series over the whole range, gap-filled.

    Output ``(bucket BIGINT epoch-µs, gbps DOUBLE)``.  The reference
    divides per-row inside SUM; summing exact integers first and
    dividing once by a constant is the same value with engine-stable
    doubles.  The caller applies the homepage filter (default
    ``InIfBoundary = 'external'``, reference console/config.go:110).

    Scale: one scan + one partial-aggregated shuffle on the bucket;
    bounds and the fill spine are 1-row/‌tiny frames broadcast in.
    """
    step_us = interval_s * 1_000_000
    ts = F.unix_micros(F.col(time_col).cast("timestamp"))
    bounds = df.agg(
        F.min(ts).alias("__start_us"), F.max(ts).alias("__max_us")
    )
    base = df.join(F.broadcast(bounds)).select(
        (
            F.col("__start_us")
            + F.floor((ts - F.col("__start_us")) / step_us) * step_us
        )
        .cast("long")
        .alias("bucket"),
        F.expr(weight_sql).cast("long").alias("__bits"),
    )
    agg = base.groupBy("bucket").agg(F.sum("__bits").alias("__bits"))
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.col("__max_us") - F.col("__start_us")) / step_us).cast("long"),
            )
        ).alias("__i"),
        "__start_us",
    ).select((F.col("__start_us") + F.col("__i") * step_us).cast("long").alias("bucket"))
    return (
        spine.join(agg, "bucket", "left")
        .select(
            "bucket",
            (
                F.coalesce(F.col("__bits"), F.lit(0)).cast("double")
                / F.lit(float(interval_s) * 1e9)
            ).alias("gbps"),
        )
        .orderBy("bucket")
    )


def last_flow(
    df: DataFrame,
    time_col: str = "TimeReceived",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """The single most recent flow row (all columns).

    ``tiebreak`` columns make the LIMIT 1 deterministic when several
    flows share the max timestamp (the reference's bare LIMIT 1 is
    engine-order-dependent).
    """
    ts = F.col(time_col).cast("timestamp")
    latest = df.agg(F.max(F.unix_micros(ts)).alias("__latest_us"))
    out = (
        df.join(F.broadcast(latest))
        .filter(F.unix_micros(ts) == F.col("__latest_us"))
        .drop("__latest_us")
    )
    order = [F.col(c).asc() for c in tiebreak]
    return out.orderBy(*order).limit(1) if order else out.limit(1)
