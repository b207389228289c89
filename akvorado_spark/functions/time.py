"""Time bucketing aligned to an arbitrary origin.

The reference buckets time as
``toStartOfInterval(TimeReceived + offset, INTERVAL s second) - offset``
with the offset chosen so buckets align to the *query range start*, not
the epoch (reference: console/clickhouse.go:162-170, 264-268 and
console/line.go:151-158).  We express the same thing arithmetically on
integer microseconds so the identical formula runs in Spark and in the
DuckDB oracle:

    bucket_us = origin_us + floor((ts_us - origin_us) / step_us) * step_us

All integer math — JVM-side, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_bucket_us(ts: Column, interval_s: int, origin_us: Column | int = 0) -> Column:
    """Bucket start in integer epoch microseconds (BIGINT)."""
    step = int(interval_s) * 1_000_000
    if isinstance(origin_us, int):
        origin_us = F.lit(origin_us)
    us = F.unix_micros(ts)
    return (origin_us + F.floor((us - origin_us) / F.lit(step)) * F.lit(step)).cast("long")


def time_bucket_ts(ts: Column, interval_s: int, origin_us: Column | int = 0) -> Column:
    """Bucket start as a timestamp (same alignment rule)."""
    return F.timestamp_micros(time_bucket_us(ts, interval_s, origin_us))
