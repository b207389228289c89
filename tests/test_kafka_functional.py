"""Gated end-to-end Kafka functional test (VERDICT r3 task 6).

Mirrors the reference's CheckExternalService pattern
(common/helpers/tests.go / common/clickhousedb/tests.go:25-90): the
test runs only when a broker is reachable AND the environment carries
the pieces it needs (a Python Kafka client to produce, the
spark-sql-kafka connector to consume); otherwise it SKIPS with the
reason, never fails.

Drives the full S3→S5→T2→S9 path: RawFlow protobuf produce → streaming
kafka_source → payload decode → enrich → FlowStore sink.

Override the broker address with $SPARK_GRAFT_KAFKA (host:port).
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

BROKER = os.environ.get("SPARK_GRAFT_KAFKA", "localhost:9092")


def _broker_reachable() -> bool:
    host, _, port = BROKER.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=1):
            return True
    except OSError:
        return False


def _kafka_client():
    try:
        from kafka import KafkaConsumer, KafkaProducer  # noqa: F401

        return KafkaProducer
    except ImportError:
        try:
            import confluent_kafka

            return confluent_kafka.Producer
        except ImportError:
            return None


def _spark_kafka_available(spark) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", BROKER
        ).option("subscribe", "__probe").load()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _broker_reachable(), reason=f"no Kafka broker at {BROKER}")
def test_rawflow_kafka_end_to_end(spark, tmp_path):
    producer_cls = _kafka_client()
    if producer_cls is None:
        pytest.skip("no Python Kafka client (kafka-python / confluent-kafka)")
    if not _spark_kafka_available(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")

    from akvorado_spark.sources.rawflow_pb import encode_raw_flow, raw_flows_from_kafka
    from akvorado_spark.sources.decode import decode_binary
    from akvorado_spark.sources.wire import WIRE_SCHEMA, ip16, netflow_batch_parser
    from akvorado_spark.streaming.ingest import kafka_source
    from tests.test_wire import EXP, build_v5

    topic = f"rawflows-{uuid.uuid4().hex[:8]}"
    # 50 RawFlow envelopes, each carrying a one-record NetFlow v5 payload
    payloads = [
        encode_raw_flow(
            time_received=1704067200 + i,
            payload=build_v5(
                [dict(src=b"\x0a\x00\x00\x01", dst=b"\x0a\x00\x00\x02",
                      inif=1 + i % 8, bytes=1000 + i)]
            ),
            source_address=EXP,
            use_source_address=True,
            decoder="netflow",
        )
        for i in range(50)
    ]
    if producer_cls.__module__.startswith("kafka"):
        prod = producer_cls(bootstrap_servers=BROKER)
        for p in payloads:
            prod.send(topic, p)
        prod.flush()
    else:  # confluent_kafka
        prod = producer_cls({"bootstrap.servers": BROKER})
        for p in payloads:
            prod.produce(topic, p)
        prod.flush()

    # streaming leg: kafka_source → RawFlow decode → wire decode → sink
    stream = kafka_source(spark, BROKER, topic)
    out_dir = str(tmp_path / "decoded")
    q = (
        decode_binary(
            raw_flows_from_kafka(stream), WIRE_SCHEMA, "netflow",
            netflow_batch_parser(),
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 50
    assert {r["InIf"] for r in rows} == set(range(1, 9))
    assert {bytes(r["ExporterAddress"]) for r in rows} == {ip16(EXP)}
