"""Streaming ingest tests (SURVEY §3.3, §2.9 T2/T4/T5/T6): file-replay
source → enrichment → foreachBatch sink, with the late-data rollup
re-aggregation semantics checked explicitly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from akvorado_spark.operators.classify import ClassifierRule
from akvorado_spark.plans.rollup import FlowStore
from akvorado_spark.schema.definition import flows_schema
from akvorado_spark.sources.fixtures import flows_df
from akvorado_spark.streaming.ingest import (
    EnrichmentConfig,
    FlowIngest,
    enrich,
    file_source,
)


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src_dir = str(root / "incoming")
    os.makedirs(src_dir, exist_ok=True)

    flows = flows_df(spark, n=6_000)
    # chunk 1: the newer half; chunk 2 arrives later but holds *older*
    # timestamps (late data) — T5 requires it to merge, not drop
    cut = flows.agg(F.expr("percentile(unix_micros(TimeReceived), 0.5)")).collect()[0][0]
    newer = flows.filter(F.unix_micros("TimeReceived") >= int(cut))
    older = flows.filter(F.unix_micros("TimeReceived") < int(cut))
    newer.coalesce(1).write.mode("overwrite").parquet(src_dir + "/chunk1")

    store = FlowStore(spark, str(root / "store"))
    ingest = FlowIngest(store, exporters_path=str(root / "exporters"))

    schema = newer.schema
    stream = file_source(spark, src_dir + "/chunk1", schema)
    q = ingest.start(stream, str(root / "ckpt1"))
    q.awaitTermination(120)

    # late chunk in a second stream run (same store)
    older.coalesce(1).write.mode("overwrite").parquet(src_dir + "/chunk2")
    stream2 = file_source(spark, src_dir + "/chunk2", schema)
    q2 = ingest.start(stream2, str(root / "ckpt2"))
    q2.awaitTermination(120)

    return store, flows, ingest


def test_stream_main_table_complete(ingested):
    store, flows, _ = ingested
    assert store.read(store.resolutions[0]).count() == flows.count()


def test_stream_late_rows_merged_into_rollups(ingested):
    """After the late chunk, rollups equal a from-scratch aggregation —
    SummingMergeTree's 'late rows always merge' (T5)."""
    store, flows, _ = ingested
    roll = store.read(store.resolutions[3])  # 1h

    def agg(df):
        return {
            (r["b"], r["SrcAS"]): r["v"]
            for r in df.groupBy(F.date_trunc("hour", "TimeReceived").alias("b"), "SrcAS")
            .agg(F.sum(F.col("Bytes") * F.col("SamplingRate") * 8).alias("v"))
            .collect()
        }

    ingested_flows = flows_schema().ingest(flows)
    assert agg(roll) == agg(ingested_flows)


def test_stream_exporters_table_refreshed(ingested):
    store, flows, ingest = ingested
    spark = flows.sparkSession
    exporters = spark.read.parquet(ingest.exporters_path)
    # one row per (ExporterAddress, IfName), newest TimeReceived
    keys = exporters.select("ExporterAddress", "IfName").distinct().count()
    assert exporters.count() == keys
    assert exporters.agg(F.max("TimeReceived")).collect()[0][0] == flows.agg(
        F.max("TimeReceived")
    ).collect()[0][0]


def test_serialize_flows_kafka_shape(spark):
    from akvorado_spark.streaming.ingest import serialize_flows

    flows = flows_df(spark, n=50)
    wire = serialize_flows(flows)
    assert wire.columns == ["key", "value"]
    row = wire.first()
    import json

    decoded = json.loads(row["value"])
    assert "Bytes" in decoded and "SrcAS" in decoded


def test_enrich_chain(spark):
    flows = flows_df(spark, n=500)
    meta = spark.createDataFrame(
        [(bytes(16), "named-router")], "ExporterAddress binary, ExporterName string"
    )
    cfg = EnrichmentConfig(
        metadata=meta,
        classifier_rules=[
            ClassifierRule(when="Proto = 6", sets={"FlowClass": "'tcp'"}),
        ],
        classifier_defaults={"FlowClass": "'other'"},
    )
    out = enrich(flows, cfg)
    rows = out.groupBy("FlowClass").count().collect()
    classes = {r["FlowClass"] for r in rows}
    assert classes <= {"tcp", "other"} and "tcp" in classes
