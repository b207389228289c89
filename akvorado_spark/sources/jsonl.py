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
    multi-TB shard set."""
    full = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    # Spark refuses to filter on the corrupt column of a raw file scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented recipe is to
    # cache the parsed frame first.  The cache holds the parsed columns
    # only (MEMORY_AND_DISK spills gracefully); for multi-TB loads,
    # split the pipeline instead: write good/bad once, then read back.
    df = df.cache()
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
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
