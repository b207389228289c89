"""JSONL (one JSON object per line) corpus source/sink.

JSONL is the interchange format of training-data pipelines (every
public corpus release — C4, The Pile, RedPajama — ships as compressed
JSONL shards).  Spark's native json reader IS the right engine here:
schema-pinned (never infer on 100 TB — inference is a full extra
scan), PERMISSIVE with a corrupt-record column so one mangled line
quarantines instead of failing the shard, and splittable when the
compression codec allows (prefer zstd/uncompressed shards over gzip,
which forces one task per file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """(good_rows, quarantined_raw_lines) from JSONL shards.

    The schema is pinned and extended with a corrupt-record column;
    rows that fail to parse (or type-mismatch) land intact in the
    quarantine frame for inspection/repair instead of aborting the
    read — the only sane failure mode when one bad line hides in a
    multi-TB shard set.

    Scale shape: the parse goes ``read.text`` → ``from_json`` rather
    than the native json reader.  Spark refuses to filter on the
    corrupt column of a raw json file scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) and the documented cache()
    workaround re-materializes the ENTIRE corpus to executor storage
    before the first filter — a non-starter on a 100 TB shard set.
    ``from_json`` over a text scan has identical PERMISSIVE semantics
    (verified against the native reader in tests: same corrupt capture
    for malformed lines, type mismatches, and non-object values; empty
    lines are dropped like the native reader skips them) but its
    corrupt field is an ordinary filterable column, so each returned
    frame is one lazy single-scan plan — nothing is pinned, nothing to
    unpersist."""
    full = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    parsed = spark.read.text(path).select(
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("__j"),
        F.col("value"),
    )
    good = (
        parsed.filter(
            F.col("__j").isNotNull() & F.col(f"__j.{_CORRUPT}").isNull()
        )
        .select("__j.*")
        .drop(_CORRUPT)
    )
    bad = parsed.filter(F.col(f"__j.{_CORRUPT}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return good, bad


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """Write a corpus as JSONL shards (one object per line, one shard
    per partition — partition count controls shard size).  Pass
    ``compression='gzip'|'zstd'|...`` for compressed shards; leave None
    for splittable plain text."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
