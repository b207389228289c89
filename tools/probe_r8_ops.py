"""Scale probes for the round-8/9 additions the registry cannot time in
isolation (VERDICT r8 item 9): logistic-regression training iterations,
HLL sketch build+merge, and the bucketed-join Exchange elision.

Usage: python tools/probe_r8_ops.py <sf_dir> [warehouse_dir]
Prints one markdown row per probe (wall + the shape evidence that
matters for each: per-iteration scan cost, sketch-row footprint,
exchange count).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from akvorado_spark.session import get_spark

    spark = get_spark("probe_r8_ops")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    print(f"# corpus: {n_docs} docs ({sf_dir})")

    # --- logistic training: per-iteration cost must be one cached scan
    from akvorado_spark.operators.classifier import logistic_train

    feats = docs.select(
        "doc_id",
        F.length("text").cast("double").alias("nch"),
        F.size(F.split(F.lower("text"), r"\s+")).cast("double").alias("ntok"),
        (F.length("text") % 7).cast("double").alias("x3"),
        (F.length("text") % 2).cast("double").alias("y"),
    )
    t0 = time.time()
    logistic_train(feats, ["nch", "ntok", "x3"], "y", iters=5)
    warm5 = time.time() - t0
    t0 = time.time()
    logistic_train(feats, ["nch", "ntok", "x3"], "y", iters=25)
    warm25 = time.time() - t0
    per_iter = (warm25 - warm5) / 20
    print(
        f"| logistic_train | {n_docs} rows | 5 iters {warm5:.2f}s | "
        f"25 iters {warm25:.2f}s | per-iteration {per_iter:.3f}s |"
    )

    # --- sketch build + shard-merge: mergeable rows, not rescans
    from akvorado_spark.operators.sketches import (
        corpus_sketch_stats,
        merge_sketch_stats,
    )

    t0 = time.time()
    shard_rows = []
    for i in range(3):
        sk = corpus_sketch_stats(docs.filter(f"doc_id % 3 = {i}"))
        shard_rows.append(sk)
        sk.count()
    build = time.time() - t0
    u = shard_rows[0].unionByName(shard_rows[1]).unionByName(shard_rows[2])
    t0 = time.time()
    merged = merge_sketch_stats(u)
    row = merged.first()
    merge = time.time() - t0
    n_sketch_rows = u.count()
    print(
        f"| corpus_sketch_stats | 3 shards, {n_sketch_rows} sketch rows | "
        f"build {build:.2f}s | merge {merge:.2f}s | "
        f"global distinct_tokens_est {row['distinct_tokens_est']} |"
    )

    # --- bucketed-join elision: exchanges in the joined plan
    from akvorado_spark.sources.bucketed import read_bucketed, write_bucketed

    wh = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe_buckets"
    t0 = time.time()
    spark.sql("DROP TABLE IF EXISTS probe_a")
    spark.sql("DROP TABLE IF EXISTS probe_b")
    write_bucketed(
        docs.select("doc_id", "lang"), "probe_a", "doc_id",
        f"{wh}/probe_a", buckets=16,
    )
    write_bucketed(
        docs.select("doc_id", "source"), "probe_b", "doc_id",
        f"{wh}/probe_b", buckets=16,
    )
    wrote = time.time() - t0
    a, b = read_bucketed(spark, "probe_a"), read_bucketed(spark, "probe_b")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange")
        t0 = time.time()
        rows = j.count()
        joined = time.time() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    print(
        f"| bucketed join | {rows} rows | write {wrote:.2f}s | "
        f"join {joined:.2f}s | exchanges in plan: {n_exch} |"
    )


if __name__ == "__main__":
    main()
