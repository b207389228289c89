"""Schema migration / reconciliation (SURVEY §2.9 T8;
reference orchestrator/clickhouse/migrations_helpers.go:468-728).

The reference's orchestrator idempotently diffs the live ClickHouse
tables against the declared schema on every start: add missing
columns, modify changed ones, drop removed ones.  The Spark analog
diffs a parquet table's stored footer schema against the declared
StructType and (optionally) rewrites.

Idempotency mirrors the reference: a second ``reconcile`` on an
already-migrated table reports no steps and touches nothing.

Scale notes: a column **add** needs no rewrite — appended files carry
the new column and readers fill missing fields with NULL when reading
by declared schema; only type **modifications** force a rewrite
(done partition-by-partition to bound memory — here in one pass since
local).  This is the same cost model ClickHouse has (ADD COLUMN is
metadata-only, MODIFY mutates).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class MigrationStep:
    kind: str  # add | modify | drop
    column: str
    from_type: str | None = None
    to_type: str | None = None


def diff_schema(stored: T.StructType, declared: T.StructType, keep: set[str] = frozenset()) -> list[MigrationStep]:
    """The reconciliation plan: declared vs stored (partition columns in
    ``keep`` are exempt)."""
    steps: list[MigrationStep] = []
    stored_by_name = {f.name: f for f in stored.fields}
    declared_by_name = {f.name: f for f in declared.fields}
    for f in declared.fields:
        s = stored_by_name.get(f.name)
        if s is None:
            steps.append(MigrationStep("add", f.name, None, f.dataType.simpleString()))
        elif s.dataType != f.dataType:
            steps.append(
                MigrationStep(
                    "modify", f.name, s.dataType.simpleString(), f.dataType.simpleString()
                )
            )
    for f in stored.fields:
        if f.name not in declared_by_name and f.name not in keep:
            steps.append(MigrationStep("drop", f.name, f.dataType.simpleString(), None))
    return steps


def read_reconciled(
    spark: SparkSession, path: str, declared: T.StructType, partition_col: str | None = None
) -> DataFrame:
    """Read a table *through* the declared schema: missing columns come
    back as NULL, extra columns are pruned, modified columns are cast.
    The zero-rewrite path for added columns."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    cols = []
    present = set(df.columns)
    for f in declared.fields:
        if f.name in present:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if partition_col and partition_col in present:
        cols.append(F.col(partition_col))
    return df.select(*cols)


def reconcile(
    spark: SparkSession,
    path: str,
    declared: T.StructType,
    partition_col: str | None = None,
    apply: bool = False,
) -> list[MigrationStep]:
    """Diff the stored table against ``declared``; with ``apply=True``,
    rewrite the table into the declared shape (tmp + atomic-ish swap,
    like the reference's CREATE + EXCHANGE pattern)."""
    if not os.path.isdir(path):
        return []
    stored = spark.read.option("mergeSchema", "true").parquet(path).schema
    keep = {partition_col} if partition_col else set()
    steps = diff_schema(
        T.StructType([f for f in stored.fields if f.name not in keep]), declared
    )
    if not steps or not apply:
        return steps
    out = read_reconciled(spark, path, declared, partition_col)
    tmp = path + "__migrating"
    writer = out.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return steps
