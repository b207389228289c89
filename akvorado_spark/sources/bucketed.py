"""Bucketed table layout: shuffle-free repeated joins at corpus scale.

Every operator that repeatedly joins the corpus on a stable key — the
rerank fetch (``exact_rerank_topk`` joining vec_id), doc-id enrichment,
survivor anti-joins after dedup — pays one Exchange per join when the
corpus lives in plain parquet.  Writing the corpus ONCE with Spark's
bucketing (`bucketBy(n, key)`) persists the hash-partitioning in the
table metadata, so every later equi-join or aggregation on that key
reads co-partitioned buckets and skips the Exchange entirely — the
difference between re-shuffling 100 TB per pipeline stage and never
shuffling it again.

Bucketing is metadata on a saved table (not a bare parquet directory),
hence ``saveAsTable`` with an explicit ``path`` — the files stay where
you point them, the bucket spec lives in the session catalog.  Both
join sides bucketed on the same key with the same count ⇒ zero
Exchange on either side (asserted in tests); one side bucketed ⇒ that
side's Exchange is elided and only the small side shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external bucketed table at ``path``:
    hash-bucketed by ``key`` into ``buckets`` files per partition,
    optionally sorted within buckets (enables sorted-bucket scans and
    keeps min/max stats tight for key-range pushdown)."""
    w = df.write.mode(mode).option("path", path).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Open a table written by :func:`write_bucketed` — the bucket spec
    rides in the catalog entry, so joins/aggregations on the bucket key
    plan without an Exchange."""
    return spark.table(table)
