"""Set operations (SURVEY §2.7 U4 — INTERSECT / EXCEPT, absent in the
reference's generated SQL; shipped as engine surface the console's
UNION machinery (U1-U3) naturally extends to).

All four variants run over the events table: the user populations of
the two halves of the time range (INTERSECT/INTERSECT ALL keeps the
bag semantics honest: per-user multiplicity = min of the two sides),
and click-users minus error-users (EXCEPT / EXCEPT ALL = multiset
difference).  Spark's intersect/exceptAll are one shuffle each on the
distinct key — no joins to hand-build, Catalyst plans them as
(partial) aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.oracle.registry import register
from akvorado_spark.sources.tables import load_table

_SPLIT = "2024-01-16 00:00:00"


def _suite_spark(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    first = ev.filter(F.col("ts") < F.lit(_SPLIT).cast("timestamp")).select("user_id")
    second = ev.filter(F.col("ts") >= F.lit(_SPLIT).cast("timestamp")).select("user_id")
    # bounded multiplicities keep the *ALL bags small but non-trivial:
    # one row per (user, day) on each side
    first_bag = (
        ev.filter(F.col("ts") < F.lit(_SPLIT).cast("timestamp"))
        .select("user_id", F.to_date("ts").alias("d")).distinct().select("user_id")
    )
    second_bag = (
        ev.filter(F.col("ts") >= F.lit(_SPLIT).cast("timestamp"))
        .select("user_id", F.to_date("ts").alias("d")).distinct().select("user_id")
    )
    clicks = ev.filter("event_type = 'click'").select("user_id", F.to_date("ts").alias("d")).distinct().select("user_id")
    errors = ev.filter("event_type = 'error'").select("user_id", F.to_date("ts").alias("d")).distinct().select("user_id")

    def tag(df, variant):
        return df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(variant).alias("variant"), "user_id", "n"
        )

    parts = [
        tag(first.intersect(second), "intersect"),
        tag(first_bag.intersectAll(second_bag), "intersect_all"),
        tag(clicks.distinct().exceptAll(errors.distinct()), "except"),
        tag(clicks.exceptAll(errors), "except_all"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_ORACLE = f"""
WITH first_h AS (SELECT user_id FROM events WHERE ts < TIMESTAMP '{_SPLIT}'),
second_h AS (SELECT user_id FROM events WHERE ts >= TIMESTAMP '{_SPLIT}'),
first_bag AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
              WHERE ts < TIMESTAMP '{_SPLIT}'),
second_bag AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
               WHERE ts >= TIMESTAMP '{_SPLIT}'),
clicks AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
           WHERE event_type = 'click'),
errors AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
           WHERE event_type = 'error')
SELECT 'intersect' AS variant, user_id, COUNT(*) AS n FROM
  (SELECT user_id FROM first_h INTERSECT SELECT user_id FROM second_h)
  GROUP BY user_id
UNION ALL
SELECT 'intersect_all', user_id, COUNT(*) FROM
  (SELECT user_id FROM first_bag INTERSECT ALL SELECT user_id FROM second_bag)
  GROUP BY user_id
UNION ALL
SELECT 'except', user_id, COUNT(*) FROM
  (SELECT DISTINCT user_id FROM clicks EXCEPT ALL SELECT DISTINCT user_id FROM errors)
  GROUP BY user_id
UNION ALL
SELECT 'except_all', user_id, COUNT(*) FROM
  (SELECT user_id FROM clicks EXCEPT ALL SELECT user_id FROM errors)
  GROUP BY user_id
"""

register("setops_suite", _suite_spark, _ORACLE)
