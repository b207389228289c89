"""RawFlow protobuf transport codec tests (S3)."""

from __future__ import annotations

from akvorado_spark.sources.rawflow_pb import (
    decode_raw_flow,
    encode_raw_flow,
    raw_flows_from_kafka,
)


def test_roundtrip_all_fields():
    blob = encode_raw_flow(
        time_received=1700000000,
        payload=b"\x00\x05datagram",
        source_address=b"\x00" * 10 + b"\xff\xff" + bytes([10, 0, 0, 1]),
        use_source_address=True,
        decoder="sflow",
        timestamp_source="netflow-packet",
        decapsulation="vxlan",
        rate_limit=5000,
    )
    m = decode_raw_flow(blob)
    assert m["time_received"] == 1700000000
    assert m["payload"] == b"\x00\x05datagram"
    assert m["source_address"][-4:] == bytes([10, 0, 0, 1])
    assert m["use_source_address"] is True
    assert m["decoder"] == "sflow"
    assert m["timestamp_source"] == "netflow-packet"
    assert m["decapsulation"] == "vxlan"
    assert m["rate_limit"] == 5000


def test_proto3_defaults_omitted_and_recovered():
    blob = encode_raw_flow(payload=b"x", decoder="netflow")
    # default-valued fields are absent from the wire (proto3)
    m = decode_raw_flow(blob)
    assert m["time_received"] == 0 and m["rate_limit"] == 0
    assert m["decapsulation"] == "none" and m["timestamp_source"] == "input"
    assert m["decoder"] == "netflow"


def test_unknown_fields_skipped():
    # append an unknown varint field (tag 99) and a fixed64 (tag 100)
    from akvorado_spark.sources.rawflow_pb import _varint

    blob = encode_raw_flow(payload=b"p") + _varint(99 << 3 | 0) + b"\x07" \
        + _varint(100 << 3 | 1) + b"\x01" * 8
    assert decode_raw_flow(blob)["payload"] == b"p"


def test_varint_multibyte():
    blob = encode_raw_flow(time_received=2**40 + 17, payload=b"y")
    assert decode_raw_flow(blob)["time_received"] == 2**40 + 17


def test_kafka_frame_to_decoders(spark):
    import struct

    from test_wire import EXP, build_v5

    from akvorado_spark.sources.decode import decode_binary
    from akvorado_spark.sources.wire import WIRE_SCHEMA, netflow_batch_parser

    pkt = build_v5([dict(src=b"\x0a\x00\x00\x01", dst=b"\x0a\x00\x00\x02",
                         sp=80, dp=443, bytes=777)])
    blobs = [
        (encode_raw_flow(time_received=1700000000, payload=pkt,
                         source_address=EXP, decoder="netflow"),),
    ]
    kafka_like = spark.createDataFrame(blobs, "value binary")
    raw = raw_flows_from_kafka(kafka_like)
    rows = raw.collect()
    assert rows[0]["decoder"] == "netflow" and rows[0]["payload"] == pkt

    wire = decode_binary(raw, WIRE_SCHEMA, "netflow", netflow_batch_parser())
    out = wire.collect()
    assert len(out) == 1 and out[0]["Bytes"] == 777
    assert struct.unpack(">H", pkt[:2])[0] == 5
