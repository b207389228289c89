"""Deterministic sampling operators for training-data pipelines.

Complements the corpus-wide hash-bucket sampling already used by the
``docs_hash_sample`` query: ``sample_per_key`` caps the contribution of
each key (domain, language, source...) instead of thinning the whole
corpus uniformly — the standard guard against a handful of giant
domains dominating a pretraining mix.

Determinism comes from ordering by an engine-portable content hash
(md5 of the id) rather than ``rand()``: the same corpus yields the
same sample on every run, engine, and partitioning — reproducible
pipelines and a DuckDB-checkable oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def portable_order_hash(col):
    """Lowercase md5 hex of the value's string form — identical in
    Spark (``md5(cast(cast(x AS string) AS binary))``) and DuckDB
    (``md5(CAST(x AS VARCHAR))``), so sampling order is portable."""
    return F.md5(col.cast("string").cast("binary"))


def sample_per_key(
    df: DataFrame,
    key_cols: tuple[str, ...],
    n: int,
    id_col: str,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Keep at most ``n`` rows per key, deterministically.

    Rows within a key are ranked by the portable hash of their id (ties
    by the id itself) and the first ``n`` survive; the output carries
    ``rank_col`` (1-based).  One shuffle — the window's partitionBy on
    the key.  Skew-safe: because the rank filter is a constant bound,
    Catalyst inserts a *Partial* ``WindowGroupLimit`` before the
    exchange (plan-asserted in tests/test_plans.py) — each map task
    forwards at most ``n`` rows per key, so even a pathologically hot
    key ships O(n × map tasks) rows to its reducer, never its full row
    count.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        portable_order_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
