"""Flows-native graph-line handler: the /graph/line equivalent
(SURVEY §3.1), over a FlowStore.

Pipeline (reference console/line.go:218-258):
1. parse+compile the filter twice (direct + reversed);
2. route to the best rollup table (or main if any MainOnly column is
   referenced by the filter or the dimensions);
3. per axis, build a LineRequest on the routed frame with the range
   filter applied *before* bucketing (partition pruning + parquet
   pushdown handle the scan);
4. union the axes with an ``axis`` literal column.

Previous-period axes shift the scan range back, then shift bucket
timestamps forward to overlay the main time axis
(reference console/line.go:59-117).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from akvorado_spark.filtering import compile_filter, flow_filter_schema
from akvorado_spark.functions.ip import ip_display, ip_truncate_family
from akvorado_spark.plans.rollup import FlowStore
from akvorado_spark.query.line import LineRequest, compile_line, top_rows_frame
from akvorado_spark.query.sankey import (
    SankeyRequest,
    compile_sankey,
    data_range,
    top_rows,
)
from akvorado_spark.query.units import UNITS

# only the percentage-of-interface units are directional
# (reference console/graph.go:30-40)
REVERSE_UNITS = {"inl2%": "outl2%", "outl2%": "inl2%"}

PREVIOUS_PERIODS = {
    "hour": timedelta(hours=1),
    "day": timedelta(days=1),
    "week": timedelta(weeks=1),
    "month": timedelta(weeks=4),  # reference uses 4 weeks (console/line.go:81-96)
    "year": None,  # handled specially: same date previous year
}


@dataclass(frozen=True)
class GraphRequest:
    start: datetime
    end: datetime
    dimensions: tuple[str, ...]
    units: str = "l3bps"
    filter: str = ""
    points: int = 86
    limit: int = 10
    limit_type: str = "avg"
    truncate_v4: int = 32
    truncate_v6: int = 128
    bidirectional: bool = False
    previous_period: str | bool | None = None  # True = derive from span (reference API); or hour|day|week|month|year


def _shift_back(req: GraphRequest) -> timedelta:
    from akvorado_spark.query.line import nearest_period, year_shift

    if req.previous_period is True:
        # the reference API: PreviousPeriod is a BOOLEAN and the period
        # derives from the range span (console/line.go:57-96)
        period_s, _ = nearest_period(int((req.end - req.start).total_seconds()))
        if period_s:
            return timedelta(seconds=period_s)
        return year_shift(req.start)
    if req.previous_period == "year":
        return year_shift(req.start)
    return PREVIOUS_PERIODS[req.previous_period]


def _us(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)




def align_range(
    start: datetime, end: datetime, table_interval_s: int, interval_s: int
) -> tuple[datetime, datetime]:
    """The reference's ``forRange`` (console/clickhouse.go:234-249):
    truncate both ends to the TABLE resolution — a query bucket that
    doesn't start on a stored-rollup boundary would split rollup rows
    (each carries its whole bucket's sum) across query buckets — then
    snap the end so the range is a whole number of intervals (every
    bucket is full-width).  At least one interval survives."""
    t = max(table_interval_s, 1)
    # naive datetimes are UTC instants everywhere in this module (_us);
    # datetime.timestamp() would instead read them in the host TZ
    if start.tzinfo is None:
        start = start.replace(tzinfo=timezone.utc)
    if end.tzinfo is None:
        end = end.replace(tzinfo=timezone.utc)
    s = int(start.timestamp()) // t * t
    e = int(end.timestamp()) // t * t
    e = s + max((e - s) // interval_s * interval_s, interval_s)
    tz = timezone.utc
    return datetime.fromtimestamp(s, tz=tz), datetime.fromtimestamp(e, tz=tz)


def graph_line(store: FlowStore, req: GraphRequest) -> DataFrame:
    sch = flow_filter_schema()
    direct = compile_filter(req.filter, sch)
    reverse = direct.reverse()

    # --- main-table analysis over filter + dimensions (P10) ---------------
    main_only = store.schema.main_only_names()
    require_main = direct.requires_main_table or any(d in main_only for d in req.dimensions)
    truncating = req.truncate_v4 < 32 or req.truncate_v6 < 128

    target = max(int((req.end - req.start).total_seconds() // req.points), 1)
    res, interval_s = store.best_table(req.start, req.end, target, require_main)
    frame = store.read(res)
    # one aligned range shared by every axis (shifted axes keep its
    # length, so all axes draw the same number of points)
    a_start, a_end = align_range(req.start, req.end, res.interval_s, interval_s)

    axes: list[DataFrame] = []

    # axes 2-4 fold against axis 1's top set (the reference shares the
    # rows CTE across axes via skipWithClause, console/line.go:169-216)
    shared_rows: dict[str, DataFrame] = {}

    def one_axis(
        axis_no: int,
        filt,
        dims: tuple[str, ...],
        shift: timedelta | None = None,
        reversed_axis: bool = False,
    ) -> DataFrame:
        start, end = a_start, a_end
        if shift is not None:
            start, end = start - shift, end - shift
        # part_date predicate first: prunes whole partitions before the
        # row-level TimeReceived filter (pushed to parquet) applies.
        df = frame.filter(
            (F.col("part_date") >= F.lit(start.date()))
            & (F.col("part_date") <= F.lit(end.date()))
        ).drop("part_date")
        df = df.filter(
            (F.col("TimeReceived") >= F.lit(start)) & (F.col("TimeReceived") < F.lit(end))
        )
        # alias (computed-on-read) columns must exist BEFORE the user
        # filter runs — PacketSize/NetPrefix etc. are filterable but
        # not stored; stored-column predicates still push through the
        # projection
        df = store.schema.view(df).filter(filt.column())
        # IP dimension truncation (P12, reference console/graph.go:44-88)
        if truncating:
            truncs = {
                d: ip_truncate_family(F.col(d), req.truncate_v4, req.truncate_v6)
                for d in dims
                if (spec := store.schema.by_name.get(d)) is not None
                and spec.truncatable_ip
            }
            if truncs:
                df = df.withColumns(truncs)
        # a reversed axis measures the opposite traffic direction, so
        # direction-asymmetric units swap (reference reverseUnits,
        # console/graph.go:30-40, applied at console/line.go:120-123)
        units = REVERSE_UNITS.get(req.units, req.units) if reversed_axis else req.units
        unit = UNITS[units]
        agg_sql = unit.agg_sql
        if units == "fps" and res.interval_s > 0:
            agg_sql = "SUM(Flows)"  # exact flow count through the rollup merge
        # the previous-period axes chart ONE total series: the reference
        # strips dimensions when shifting (console/line.go:81-86,
        # "dimensions are stripped"), so axes 3/4 aggregate over the
        # whole filtered population and the dimension columns ride
        # along empty for union-schema compatibility
        axis_dims = () if shift is not None else dims
        lreq = LineRequest(
            time_col="TimeReceived",
            dimensions=axis_dims,
            weight_sql=None,
            interval_s=interval_s,
            limit=req.limit,
            limit_type=req.limit_type,
            agg_sql=agg_sql,
            base_cols=unit.base_cols if agg_sql == unit.agg_sql else ("Flows",),
            value_type=unit.value_type,
            start_us=_us(start),
            end_us=_us(end),
        )
        if not axis_dims:
            line = compile_line(df, lreq)
        else:
            if axis_no == 1:
                rows = top_rows_frame(df, lreq)
                shared_rows["rows"] = rows
            else:
                # rename atomically: sequential withColumnRenamed breaks
                # when the dimension list contains a reverse pair
                # (SrcAS,DstAS → DstAS,SrcAS would collide mid-loop)
                rows = shared_rows["rows"].select(
                    *[
                        F.col(orig).alias(actual)
                        for orig, actual in zip(req.dimensions, dims)
                    ]
                )
            line = compile_line(df, lreq, rows=rows)
        if not axis_dims:
            line = line.select(
                "bucket",
                *[F.lit("").alias(d) for d in req.dimensions],
                "sum_w",
                "xps",
            )
        if shift is not None:
            shift_us = int(shift.total_seconds() * 1_000_000)
            line = line.withColumn("bucket", F.col("bucket") + F.lit(shift_us))
        # Render binary IP dimensions to display strings *after* the
        # aggregation (P11): grouping stayed on cheap binary keys; only
        # the few surviving rows pay the render.  The 'Other' fold
        # literal arrives as the 5-byte b'Other' (no 16-byte collision).
        # One withColumns call: each chained withColumn costs a plan
        # analysis round (r13 construction batching).
        renders = {
            d: F.when(F.col(d) == F.lit(b"Other"), F.lit("Other")).otherwise(
                ip_display(F.col(d))
            )
            for d in axis_dims
            if (spec := store.schema.by_name.get(d)) is not None and spec.ip_addr
        }
        if renders:
            line = line.withColumns(renders)
        # normalize dimension column names across axes (reverse swaps
        # them); atomic select so a reversed pair can't collide mid-rename
        if axis_dims:
            line = line.select(
                "bucket",
                *[
                    F.col(actual).alias(orig)
                    for orig, actual in zip(req.dimensions, axis_dims)
                ],
                "sum_w",
                "xps",
            )
        return line.select(F.lit(axis_no).alias("axis"), "*")

    axes.append(one_axis(1, direct, req.dimensions))
    if req.bidirectional:
        rdims = tuple(sch.reverse_name(d) for d in req.dimensions)
        axes.append(one_axis(2, reverse, rdims, reversed_axis=True))
    if req.previous_period:
        shift = _shift_back(req)
        axes.append(one_axis(3, direct, req.dimensions, shift))
        if req.bidirectional:
            rdims = tuple(sch.reverse_name(d) for d in req.dimensions)
            axes.append(one_axis(4, reverse, rdims, shift, reversed_axis=True))

    out = axes[0]
    for a in axes[1:]:
        out = out.unionAll(a)
    return out


def graph_sankey(store: FlowStore, req: GraphRequest) -> DataFrame:
    """Flows-native /graph/sankey equivalent (SURVEY §3.2).

    Differences from :func:`graph_line` mirroring the reference:
    no time axis (xps averages over the data span); table routing uses
    a fixed 20-point context (console/sankey.go:124-134); the reverse
    axis probes the *forward* top-N rows positionally
    (console/sankey.go:136-147).
    """
    sch = flow_filter_schema()
    direct = compile_filter(req.filter, sch)
    reverse = direct.reverse()

    main_only = store.schema.main_only_names()
    require_main = direct.requires_main_table or any(d in main_only for d in req.dimensions)
    truncating = req.truncate_v4 < 32 or req.truncate_v6 < 128

    target = max(int((req.end - req.start).total_seconds() // 20), 1)
    res, s_interval = store.best_table(req.start, req.end, target, require_main)
    frame = store.read(res)
    a_start, a_end = align_range(req.start, req.end, res.interval_s, s_interval)

    def prep(filt, dims: tuple[str, ...]) -> DataFrame:
        df = frame.filter(
            (F.col("part_date") >= F.lit(a_start.date()))
            & (F.col("part_date") <= F.lit(a_end.date()))
        ).drop("part_date")
        df = df.filter(
            (F.col("TimeReceived") >= F.lit(a_start))
            & (F.col("TimeReceived") < F.lit(a_end))
        )
        # view() before the user filter: alias columns are filterable
        df = store.schema.view(df).filter(filt.column())
        if truncating:
            truncs = {
                d: ip_truncate_family(F.col(d), req.truncate_v4, req.truncate_v6)
                for d in dims
                if (spec := store.schema.by_name.get(d)) is not None
                and spec.truncatable_ip
            }
            if truncs:
                df = df.withColumns(truncs)
        return df

    def unit_req(units: str, dims: tuple[str, ...]) -> SankeyRequest:
        unit = UNITS[units]
        agg_sql = unit.agg_sql
        base_cols = unit.base_cols
        if units == "fps" and res.interval_s > 0:
            agg_sql, base_cols = "SUM(Flows)", ("Flows",)
        return SankeyRequest(
            time_col="TimeReceived",
            dimensions=dims,
            weight_sql=None,
            limit=req.limit,
            agg_sql=agg_sql,
            base_cols=base_cols,
            value_type=unit.value_type,
        )

    def render(line: DataFrame, dims: tuple[str, ...]) -> DataFrame:
        renders = {
            d: F.when(F.col(d) == F.lit(b"Other"), F.lit("Other")).otherwise(
                ip_display(F.col(d))
            )
            for d in dims
            if (spec := store.schema.by_name.get(d)) is not None and spec.ip_addr
        }
        return line.withColumns(renders) if renders else line

    fdf = prep(direct, req.dimensions)
    freq = unit_req(req.units, req.dimensions)
    fwd_rows = top_rows(fdf, freq)
    rng = data_range(fdf, "TimeReceived")
    ax1 = render(
        compile_sankey(fdf, freq, rows=fwd_rows, rows_cols=req.dimensions, rng=rng),
        req.dimensions,
    ).select(F.lit(1).alias("axis"), "*")
    if not req.bidirectional:
        return ax1

    rdims = tuple(sch.reverse_name(d) for d in req.dimensions)
    rdf = prep(reverse, rdims)
    rreq = unit_req(REVERSE_UNITS.get(req.units, req.units), rdims)
    ax2 = render(
        compile_sankey(rdf, rreq, rows=fwd_rows, rows_cols=req.dimensions, rng=rng),
        rdims,
    )
    # atomic rename (a reversed pair would collide in a sequential loop)
    ax2 = ax2.select(
        *[F.col(rev).alias(fwd) for rev, fwd in zip(rdims, req.dimensions)],
        "sum_w",
        "xps",
    )
    return ax1.unionAll(ax2.select(F.lit(2).alias("axis"), "*"))


def _req_payload(req: GraphRequest) -> dict:
    from dataclasses import asdict

    return asdict(req)


def graph_line_cached(store: FlowStore, req: GraphRequest, cache) -> list:
    """graph_line with the reference's API-layer result cache
    (console/root.go:113-117): collected rows cached 3 h keyed by the
    request body; the engine below stays stateless.  Input validation
    happens here, at the API boundary (console/line.go:24)."""
    from akvorado_spark.query.api import validate_limit, validate_points

    validate_points(req.points)
    validate_limit(req.limit)
    payload = _req_payload(req)
    hit = cache.get(payload)
    if hit is not None:
        return hit
    rows = graph_line(store, req).collect()
    cache.put(payload, rows)
    return rows


def graph_sankey_cached(store: FlowStore, req: GraphRequest, cache) -> list:
    from akvorado_spark.query.api import validate_limit

    validate_limit(req.limit)
    payload = {"sankey": True, **_req_payload(req)}
    hit = cache.get(payload)
    if hit is not None:
        return hit
    rows = graph_sankey(store, req).collect()
    cache.put(payload, rows)
    return rows
