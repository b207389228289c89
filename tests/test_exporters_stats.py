"""Exporters unpivot/dedup, autocomplete, and series-stats tests
(SURVEY §2.3 J8, §2.9 T6, §2.6 O4, §2.4 A12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.plans.exporters import (
    exporter_names,
    exporters_frame,
    latest_exporters,
)
from akvorado_spark.query.complete import complete_asn
from akvorado_spark.query.stats import series_stats


def _flows(spark):
    rows = [
        ("2024-01-01 00:00:00", "r1", "Gi0", "Gi1", 1000, 10000),
        ("2024-01-01 01:00:00", "r1", "Gi0", "Gi2", 2000, 20000),
        ("2024-01-01 02:00:00", "r2", "Gi0", "Gi1", 3000, 30000),
    ]
    return spark.createDataFrame(
        rows,
        "TimeReceived string, ExporterName string, InIfName string, "
        "OutIfName string, InIfSpeed int, OutIfSpeed int",
    ).withColumn("TimeReceived", F.col("TimeReceived").cast("timestamp"))


def test_exporters_unpivot_two_rows_per_flow(spark):
    df = _flows(spark)
    unp = exporters_frame(df)
    assert unp.count() == 2 * df.count()
    assert set(unp.columns) == {"TimeReceived", "ExporterName", "IfName", "IfSpeed"}


def test_latest_exporters_keeps_newest_per_key(spark):
    # key here is IfName only (no ExporterAddress column): r1@Gi0 00:00
    # and r1@Gi0 01:00 merge, the newer wins
    latest = latest_exporters(exporters_frame(_flows(spark)), ttl=None)
    by_key = {r["IfName"]: r for r in latest.collect()}
    assert by_key["Gi0"]["TimeReceived"].hour == 2  # newest Gi0 row (r2)
    assert by_key["Gi2"]["IfSpeed"] == 20000
    names = [r["ExporterName"] for r in exporter_names(latest).collect()]
    assert names == sorted(set(names))


def test_complete_asn_flows_rank_before_dictionary(spark):
    flows = spark.createDataFrame([(64512,)] * 5 + [(64513,)], "SrcAS long")
    out = complete_asn(
        flows,
        prefix="net",
        asns=[(64512, "alpha-net"), (64513, "beta-net"), (64599, "gamma-net")],
        limit=10,
    ).collect()
    labels = [r["label"] for r in out]
    # seen ASNs first (most-used first), then unseen dictionary entries
    assert labels[:2] == ["AS64512", "AS64513"]
    assert "AS64599" in labels[2:]


def test_series_stats_formulas(spark):
    # one series, buckets 0..4 with values 0,10,20,30,40
    rows = [(i * 1000, "a", v) for i, v in enumerate([0, 10, 20, 30, 40])]
    line = spark.createDataFrame(rows, "bucket long, d string, sum_w long")
    s = series_stats(line, ("d",), interval_s=60).collect()[0]
    assert s["average"] == 100 // 5
    assert s["total"] == 100 * 60
    assert s["min_v"] == 10  # zero ignored
    assert s["max_v"] == 40
    assert s["last_v"] == 30  # second-to-last bucket
    # p95: index 0.95*4 = 3.8 → 30*0.2 + 40*0.8 = 38
    assert s["p95"] == 38
