"""Classifier cascade + rate limiter tests (SURVEY §2.9 T1/T3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.operators.classify import ClassifierRule, classify, rate_limit


def test_classify_first_match_wins_and_reject(spark):
    df = spark.createDataFrame(
        [("r1", "Gi0"), ("r2", "Gi1"), ("bad", "Gi2")],
        "ExporterName string, InIfName string",
    )
    rules = [
        ClassifierRule(when="ExporterName = 'bad'", reject=True),
        ClassifierRule(when="ExporterName = 'r1'", sets={"Role": "'edge'"}),
        ClassifierRule(when="ExporterName LIKE 'r%'", sets={"Role": "'core'", "Site": "'par'"}),
    ]
    out = classify(df, rules, {"Role": "'unknown'", "Site": "'unknown'"}).collect()
    by = {r["ExporterName"]: r for r in out}
    assert "bad" not in by  # rejected
    assert by["r1"]["Role"] == "edge"  # first matching rule wins
    assert by["r1"]["Site"] == "par"  # later rule still fills unset attrs
    assert by["r2"]["Role"] == "core"


def test_rate_limit_keeps_aggregate_unbiased(spark):
    # 25 flows in one tick from one exporter, limit 50/s → 10 per tick
    rows = [("e1", "2024-01-01 00:00:00", i, 100, 10) for i in range(25)]
    df = spark.createDataFrame(
        rows, "ExporterAddress string, TimeReceived string, SrcPort int, Bytes long, SamplingRate long"
    ).withColumn("TimeReceived", F.col("TimeReceived").cast("timestamp"))
    out = rate_limit(df, 50, key="ExporterAddress", tiebreak=("SrcPort",))
    rows_out = out.collect()
    assert len(rows_out) == 10
    # SamplingRate inflated 10 → 25 (total/kept = 25/10 → floor(10*25/10))
    assert all(r["SamplingRate"] == 25 for r in rows_out)
    # estimated total bytes preserved: 25 flows * 100 B * 10 = 25000
    est = out.agg(F.sum(F.col("Bytes") * F.col("SamplingRate"))).collect()[0][0]
    assert est == 25 * 100 * 10


def test_rate_limit_under_limit_untouched(spark):
    rows = [("e1", "2024-01-01 00:00:00", i, 100, 10) for i in range(5)]
    df = spark.createDataFrame(
        rows, "ExporterAddress string, TimeReceived string, SrcPort int, Bytes long, SamplingRate long"
    ).withColumn("TimeReceived", F.col("TimeReceived").cast("timestamp"))
    out = rate_limit(df, 50, key="ExporterAddress", tiebreak=("SrcPort",)).collect()
    assert len(out) == 5
    assert all(r["SamplingRate"] == 10 for r in out)
