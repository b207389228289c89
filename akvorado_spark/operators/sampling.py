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


def pack_documents(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget bins.

    The pretraining step that concatenates documents into
    context-length windows.  Documents are ordered deterministically
    (portable hash of the id, ties by id) within each key partition; a
    running token total assigns ``bin_col = floor(cumsum_before /
    budget)`` and ``offset_col`` = the document's start position inside
    its bin.  Oversized documents (> budget) still get a bin — the
    consumer truncates or splits them (chunk_documents is the
    splitting op).

    Semantics are *concat-and-chop* (the standard pretraining packing):
    documents lie head-to-tail in one token stream per key and bins are
    fixed ``budget``-token windows over that stream — a document is
    assigned the bin containing its first token and may straddle into
    the next (zero waste; consumers that forbid straddling re-chunk at
    the boundary).  Waste-free packing comes at the cost of one
    window-cumsum pass — next-fit/first-fit variants need a sequential
    recurrence no distributed one-pass can express.  One shuffle (the
    key window); with no ``key_cols`` a 64-way hash-bucket key keeps
    the cumsum partitioned rather than global — packing quality only
    depends on within-bucket order.
    """
    order = [portable_order_hash(F.col(id_col)).asc(), F.col(id_col).asc()]
    if key_cols:
        part = [F.col(k) for k in key_cols]
    else:
        # no keys: derive bounded parallelism instead of a global window
        df = df.withColumn("__pack_bucket", F.abs(F.hash(F.col(id_col))) % 64)
        part = [F.col("__pack_bucket")]
    w = Window.partitionBy(*part).orderBy(*order)
    cum_before = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    out = (
        df.withColumn("__cum_before", cum_before)
        .withColumn(bin_col, F.floor(F.col("__cum_before") / budget).cast("long"))
        .withColumn(
            offset_col,
            (F.col("__cum_before") - F.col(bin_col) * budget).cast("long"),
        )
        .drop("__cum_before")
    )
    return out.drop("__pack_bucket") if not key_cols else out
