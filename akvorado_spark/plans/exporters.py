"""Exporters dimension table (SURVEY §2.3 J8, §2.9 T6;
reference orchestrator/clickhouse/migrations_helpers.go:234-322).

The reference materializes a "recently seen exporters/interfaces"
table: an MV ARRAY JOINs each flow into two rows (one per In/Out
interface), landing in a ReplacingMergeTree(TimeReceived) keyed
``(ExporterAddress, IfName)`` with a 1-day TTL.

Spark-first:

- the ARRAY JOIN unpivot is ``explode(array(struct(in...),
  struct(out...)))`` — one narrow projection, no shuffle;
- the Replacing merge is "latest row per key": ONE aggregation on the
  key where each attribute rides a max(struct(TimeReceived, attr)) —
  partial aggregation map-side, a single shuffle keyed by
  (exporter, interface), no join; ties MAX-reduce the attributes so
  the result is engine-deterministic;
- TTL = a time predicate on the caller's ``now``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# If-attribute suffixes unpivoted from InIf*/OutIf* pairs; generated
# from whatever the frame carries (the reference derives them from the
# schema the same way).
_EXPORTER_PREFIX = "Exporter"


def _if_suffixes(df: DataFrame) -> list[str]:
    cols = set(df.columns)
    out = []
    for c in df.columns:
        if c.startswith("InIf") and ("OutIf" + c[4:]) in cols:
            out.append(c[4:])
    return out


def exporters_frame(df: DataFrame) -> DataFrame:
    """The unpivot (J8): one row per (flow, interface side) with
    ``If<attr>`` columns, keeping TimeReceived + Exporter* columns."""
    keep = ["TimeReceived"] + [c for c in df.columns if c.startswith(_EXPORTER_PREFIX)]
    suffixes = _if_suffixes(df)
    sides = [
        F.struct(*[F.col(f"{side}If{s}").alias(f"If{s}") for s in suffixes])
        for side in ("In", "Out")
    ]
    return df.select(*keep, F.explode(F.array(*sides)).alias("__if")).select(
        *keep, *[F.col(f"__if.If{s}").alias(f"If{s}") for s in suffixes]
    )


def latest_exporters(
    exporters: DataFrame,
    ttl: timedelta | None = timedelta(days=1),
    now: datetime | None = None,
) -> DataFrame:
    """Replacing-merge semantics (T6): the latest row per
    (ExporterAddress, IfName); non-key attributes of simultaneous rows
    are MAX-reduced so the result is engine-deterministic (the
    reference keeps an arbitrary survivor)."""
    if ttl is not None and now is not None:
        exporters = exporters.filter(F.col("TimeReceived") >= F.lit(now - ttl))
    keys = [c for c in ("ExporterAddress", "IfName") if c in exporters.columns]
    attrs = [c for c in exporters.columns if c not in keys and c != "TimeReceived"]
    # ONE map-side-combined aggregation: per attribute, max(struct(ts,
    # attr)) orders by TimeReceived first, so it returns the attribute
    # of a latest row — ties on ts resolve to the attribute MAX, and a
    # struct with the max ts wins even when its attribute is NULL,
    # exactly the former groupBy-max + join-back + per-attr-MAX shape
    # but with one shuffle instead of two plus a join.
    aggs = [F.max("TimeReceived").alias("TimeReceived")] + [
        F.max(F.struct(F.col("TimeReceived").alias("t"), F.col(a).alias("v")))
        .getField("v")
        .alias(a)
        for a in attrs
    ]
    return exporters.groupBy(*keys).agg(*aggs).select(*exporters.columns)


def exporter_names(latest: DataFrame) -> DataFrame:
    """The exporters widget: ``SELECT ExporterName FROM exporters
    GROUP BY ExporterName ORDER BY ExporterName``
    (reference console/widgets.go:113-120)."""
    return latest.select("ExporterName").distinct().orderBy("ExporterName")
