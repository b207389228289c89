"""As-of join — an operator Spark lacks natively (bonus beyond the
reference, which has no user-facing joins at all; SURVEY §2.3).

``asof_join(left, right, ...)`` attaches to every left row the right
row with the greatest ``right_ts <= left_ts`` for the same key —
"the most recent X at the time of Y" (trade-to-quote, event-to-click
attribution, config-at-time lookups).

Scale shape: the classic distributed as-of — tag both sides, union,
one shuffle on the key, one in-partition sort on (ts, side), then a
running ``last(value, ignorenulls=True)`` carries the latest right
values forward onto left rows.  Linear in rows, no range-join
explosion, no per-key driver loops; skewed keys behave like any
window partition (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with ``right_ts <= left_ts``
    per key.  Right values arrive as ``<name><suffix>`` columns (plus
    ``<right_ts><suffix>``); left rows with no prior right row keep
    NULLs.  Ties at equal timestamps resolve right-before-left, so an
    exactly-simultaneous right row matches (``<=`` semantics).
    """
    carried = [right_ts] + values
    # ONE struct carries every right value: a single last() resolves a
    # single consistent right ROW (per-column last() could mix fields
    # from different tied rows), and the struct doubles as the
    # deterministic tiebreaker among rights sharing (key, ts)
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("__rv"),
    )
    rv_type = r_tag.schema["__rv"].dataType.simpleString()
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__rv", F.lit(None).cast(rv_type)
    )
    l_cols = [c for c in l_tag.columns if not c.startswith("__")]
    u = l_tag.select(
        *l_cols, F.col(left_ts).alias("__ts"), "__side", "__rv"
    ).unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.withColumn("__m", F.last(F.col("__rv"), ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    for c in carried:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__m.{c}"))
    return out.select(*l_cols, *[f"{c}{suffix}" for c in carried])
