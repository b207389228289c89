"""Bucketed-layout plan assertions: the co-located join actually
skips the Exchange, and results equal the plain-parquet join."""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_elides_exchange(spark, tmp_path):
    from akvorado_spark.sources.bucketed import read_bucketed, write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    left = docs.select("doc_id", "lang", "source")
    right = docs.select("doc_id", F.length("text").alias("n"))

    write_bucketed(left, "t_bkt_l", "doc_id", str(tmp_path / "l"), buckets=8)
    write_bucketed(right, "t_bkt_r", "doc_id", str(tmp_path / "r"), buckets=8)
    try:
        bl = read_bucketed(spark, "t_bkt_l")
        br = read_bucketed(spark, "t_bkt_r")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bl.join(br, "doc_id")
            plan = _executed_plan(j)
            # both sides bucketed on the join key with equal counts:
            # the sort-merge join plans with ZERO exchanges
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            # and the answer equals the plain-parquet join
            pj = left.join(right, "doc_id")
            assert j.exceptAll(pj).count() == 0
            assert pj.exceptAll(j).count() == 0

            # aggregation on the bucket key also skips the exchange
            agg = bl.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
            assert "Exchange" not in _executed_plan(agg)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")
        spark.sql("DROP TABLE IF EXISTS t_bkt_r")


def test_bucketed_one_side_only_shuffles_other(spark, tmp_path):
    """One bucketed side: its Exchange is elided; only the unbucketed
    side shuffles (exactly one Exchange in the join plan)."""
    from akvorado_spark.sources.bucketed import read_bucketed, write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    left = docs.select("doc_id", "lang")
    write_bucketed(left, "t_bkt_one", "doc_id", str(tmp_path / "b"), buckets=8)
    try:
        bl = read_bucketed(spark, "t_bkt_one")
        other = docs.select("doc_id", F.length("text").alias("n"))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            import re

            plan = _executed_plan(bl.join(other, "doc_id"))
            # one Exchange NODE (formatted mode prints each node twice:
            # once in the tree, once in the detail listing)
            nodes = re.findall(r"\(\d+\) Exchange", plan)
            assert len(nodes) == 1, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_one")
