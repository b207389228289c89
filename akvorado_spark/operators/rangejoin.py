"""Bucketed range join — interval predicates without the nested loop
(bonus beyond the reference, which has no user-facing joins).

A naive ``l.ts BETWEEN r.ts - g AND r.ts + g`` join gives Spark no
equi-key, so it plans a BroadcastNestedLoopJoin — quadratic row
touches, fatal at scale.  Bucketing both sides by ``floor(ts / g)``
and exploding one side to its adjacent buckets turns the interval
predicate into an equi-join on (key, bucket): every qualifying pair
shares a bucket (a |Δts| ≤ g pair differs by at most one bucket), the
join shuffles hash-partitioned like any other, and the exact
predicate filters the ≤3× candidate surplus after the match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_s: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs of (left, right) rows with the same key and
    ``|left_ts - right_ts| <= max_gap_s`` (timestamps compared at
    microsecond precision).  Columns keep their names; right's ts
    column must be named differently from left's.

    Only ``how='inner'`` is supported: the exact-gap predicate runs
    AFTER the bucket equi-join, which would silently turn any outer
    join back into an inner one (unmatched rows carry NULL timestamps
    that fail the filter).  Outer range semantics need an explicit
    anti-join union — refuse rather than mis-join.
    """
    if how != "inner":
        raise NotImplementedError(
            "range_join supports how='inner' only; outer variants would "
            "drop their unmatched rows in the exact-gap filter"
        )
    g_us = max_gap_s * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.withColumn("__b", F.floor(l_us / g_us))
    # one side fans out to the 3 adjacent buckets; the smaller side
    # should be passed as `right` so the 3× blowup lands there
    r = right.withColumn(
        "__rb", F.floor(r_us / g_us)
    ).withColumn("__b", F.explode(F.array(F.col("__rb") - 1, F.col("__rb"), F.col("__rb") + 1)))
    joined = l.join(r.drop("__rb"), on=on + ["__b"], how=how)
    exact = (
        F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))) <= g_us
    )
    return joined.filter(exact).drop("__b")
