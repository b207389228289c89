"""Three-decade probe of the CCNet bucketing twins (VERDICT r10 #7):
``perplexity_buckets`` (exact global-sort ntile — the oracle-gated
form) vs ``perplexity_buckets_approx`` (approxQuantile thresholds —
the designated 100 TB form, no global sort).

For each SF dir: score documents once (bigram LM, shared cost, parked
in a /tmp parquet so the compare isolates BUCKETING cost), then run
each twin to a groupBy(bucket).count() action and report wall, new
stages, shuffle-write bytes and spill from the app status store.  At
the smallest SF the two assignments are joined to report the label
agreement (rel_err=0 ⇒ identical up to score ties).

Usage: python tools/probe_ppl_buckets.py [sf_dir ...]
Defaults to /root/testdata/sf0.1 .scaledata/sf1 .scaledata/sf10
(1x / 10x / 100x).  Prints a markdown table for SCALE_METRICS.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_snapshot(spark):
    """(stageId, attempt) → (shuffleWriteBytes, memSpill, diskSpill)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    sl = store.stageList(
        empty,
        *[getattr(store, f"stageList$default${i}")() for i in range(2, 6)],
    )
    out = {}
    for i in range(sl.size()):
        st = sl.apply(i)
        out[(st.stageId(), st.attemptId())] = (
            st.shuffleWriteBytes(),
            st.memoryBytesSpilled(),
            st.diskBytesSpilled(),
        )
    return out


def _measured(spark, df) -> tuple[float, int, int, int, int]:
    before = _stage_snapshot(spark)
    t0 = time.time()
    df.groupBy("bucket").count().collect()
    wall = time.time() - t0
    after = _stage_snapshot(spark)
    new = [k for k in after if k not in before]
    shuffle = sum(after[k][0] for k in new)
    spill = sum(after[k][1] + after[k][2] for k in new)
    return wall, len(new), shuffle, spill


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scaledata/sf1"),
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scaledata/sf10"),
    ]
    from pyspark.sql import functions as F

    from akvorado_spark.operators.lm import (
        bigram_lm_scores,
        perplexity_buckets,
        perplexity_buckets_approx,
    )
    from akvorado_spark.session import get_spark
    from akvorado_spark.sources.tables import load_table

    spark = get_spark("probe_ppl_buckets")
    print("| sf_dir | docs | variant | wall s | stages | shuffle MB | spill MB |")
    print("|---|---|---|---|---|---|---|")
    first = True
    for d in dirs:
        if not os.path.isdir(d):
            print(f"| {d} | — | MISSING | | | | |")
            continue
        docs = load_table(spark, "documents", d).select("doc_id", "text")
        scored_path = f"/tmp/ppl_scored_{abs(hash(d)) % 10**8}"
        bigram_lm_scores(docs, "text", "doc_id").write.mode("overwrite").parquet(
            scored_path
        )
        scored = spark.read.parquet(scored_path)
        n = scored.count()
        for name, fn in (
            ("exact ntile", lambda s: perplexity_buckets(s, "doc_id")),
            ("approx", lambda s: perplexity_buckets_approx(s, "doc_id", rel_err=0.001)),
        ):
            wall, stages, shuffle, spill = _measured(spark, fn(scored))
            print(
                f"| {os.path.basename(d.rstrip('/'))} | {n} | {name} | "
                f"{wall:.2f} | {stages} | {shuffle / 1e6:.1f} | {spill / 1e6:.1f} |"
            )
        if first:
            first = False
            ex = perplexity_buckets(scored, "doc_id").select(
                "doc_id", F.col("bucket").alias("b_exact")
            )
            ap = perplexity_buckets_approx(scored, "doc_id", rel_err=0.0).select(
                "doc_id", F.col("bucket").alias("b_approx")
            )
            j = ex.join(ap, "doc_id")
            agree = j.filter(F.col("b_exact") == F.col("b_approx")).count()
            print(f"# label agreement at {d} (rel_err=0): {agree}/{n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
