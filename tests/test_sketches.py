"""Mergeable HLL corpus stats: estimate accuracy against exact
distincts, and the merge property — shard-by-shard sketches union to
the same answer as one whole-corpus pass."""

from __future__ import annotations

from pyspark.sql import functions as F


def _exact(spark, docs):
    toks = docs.select(
        "lang",
        "source",
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("tok"),
    )
    return {
        tuple(r[c] for c in ("lang", "source")): (
            r["dt"],
            r["dd"],
        )
        for r in toks.groupBy("lang", "source")
        .agg(
            F.countDistinct("tok").alias("dt"),
            F.countDistinct("doc_id").alias("dd"),
        )
        .collect()
    }


def test_sketch_estimates_within_error(spark):
    from akvorado_spark.operators.sketches import (
        corpus_sketch_stats,
        merge_sketch_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sk = corpus_sketch_stats(docs)
    per = merge_sketch_stats(sk, ("lang", "source")).collect()
    exact = _exact(spark, docs)
    assert per
    for r in per:
        et, ed = exact[(r["lang"], r["source"])]
        # 3 standard errors at lg_k=12 (~1.6% per std err)
        assert abs(r["distinct_tokens_est"] - et) <= max(3 * 0.0163 * et, 2), (
            r["lang"], r["source"], et, r["distinct_tokens_est"],
        )
        assert abs(r["distinct_docs_est"] - ed) <= max(3 * 0.0163 * ed, 2)
        assert r["n_docs"] == ed  # the exact adds really are exact


def test_sketch_exact_chars_counted_once_per_doc(spark):
    """n_chars is the per-doc length summed ONCE per doc — not once per
    token (the overcount an explode-then-sum would produce), and empty
    docs still contribute their (zero) length through the outer
    explode."""
    from akvorado_spark.operators.sketches import (
        corpus_sketch_stats,
        merge_sketch_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    per = {
        (r["lang"], r["source"]): r["n_chars"]
        for r in corpus_sketch_stats(docs).collect()
    }
    exact = {
        (r["lang"], r["source"]): r["c"]
        for r in docs.groupBy("lang", "source")
        .agg(F.sum(F.length("text")).alias("c"))
        .collect()
    }
    assert per == exact
    # an empty-text doc flows through posexplode_outer's null row
    tiny = spark.createDataFrame(
        [("a", "s", 1, ""), ("a", "s", 2, "x y x")],
        "lang string, source string, doc_id long, text string",
    )
    row = merge_sketch_stats(corpus_sketch_stats(tiny)).first()
    assert row["n_chars"] == 5 and row["n_docs"] == 2 and row["n_tokens"] == 3


def test_sketch_merge_equals_whole_corpus_pass(spark):
    """Sketches built shard-by-shard and unioned give the same global
    estimate as sketches built in one pass — the property that lets a
    daily-shard pipeline account without rescans."""
    from akvorado_spark.operators.sketches import (
        corpus_sketch_stats,
        merge_sketch_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    whole = merge_sketch_stats(corpus_sketch_stats(docs)).first()
    shards = [
        corpus_sketch_stats(docs.filter(f"doc_id % 3 = {i}")) for i in range(3)
    ]
    u = shards[0].unionByName(shards[1]).unionByName(shards[2])
    merged = merge_sketch_stats(u).first()
    assert merged["n_tokens"] == whole["n_tokens"]
    assert merged["n_docs"] == whole["n_docs"]
    # HLL union is NOT bit-identical to a single-pass build (sparse→
    # dense mode promotion differs by insert path), but both stay
    # within the sketch's error bound of each other and of exact
    for col, exact_col in (
        ("distinct_tokens_est", "n_tokens"),
        ("distinct_docs_est", "n_docs"),
    ):
        a, b = merged[col], whole[col]
        assert abs(a - b) <= max(0.05 * max(a, b), 2), (col, a, b)
    n_docs_exact = docs.select("doc_id").distinct().count()
    assert abs(merged["distinct_docs_est"] - n_docs_exact) <= max(
        3 * 0.0163 * n_docs_exact, 2
    )
