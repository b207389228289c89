"""RawFlow protobuf transport codec (S3; reference
common/pb/rawflow.proto:6-34).

The inlet→outlet Kafka topic carries proto3-encoded ``RawFlow``
messages.  This is a dependency-free codec for exactly that message,
written against the public proto3 wire format (varint/length-
delimited fields); the field numbers and enums below are the
message's published contract, so payloads interoperate with the
reference's inlet:

    1 time_received (uint64)      5 decoder (enum)
    2 payload (bytes)             6 timestamp_source (enum)
    3 source_address (bytes)      7 decapsulation_protocol (enum)
    4 use_source_address (bool)   8 rate_limit (uint64)

Spark integration: ``raw_flows_from_kafka`` turns a Kafka frame
(``value: binary``) into the RAW_FLOW_SCHEMA frame the decoders
consume, via an Arrow-batched mapInPandas — the only Python touch is
this transport decode, after which everything is columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

DECODERS = {0: "unspecified", 1: "netflow", 2: "sflow", 3: "gob"}
TIMESTAMP_SOURCES = {0: "input", 1: "netflow-packet", 2: "netflow-first-switched"}
DECAPS = {0: "none", 1: "ipip", 2: "gre", 3: "vxlan", 4: "srv6"}

_DECODERS_INV = {v: k for k, v in DECODERS.items()}
_TS_INV = {v: k for k, v in TIMESTAMP_SOURCES.items()}
_DECAPS_INV = {v: k for k, v in DECAPS.items()}


def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, off: int) -> tuple[int, int]:
    shift = value = 0
    while True:
        if off >= len(data):
            raise ValueError("truncated varint")
        b = data[off]
        off += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, off
        shift += 7
        if shift > 63:  # proto varints are <= 10 bytes; reject runaways
            raise ValueError("varint longer than 64 bits")


def encode_raw_flow(
    time_received: int = 0,
    payload: bytes = b"",
    source_address: bytes = b"",
    use_source_address: bool = False,
    decoder: str = "netflow",
    timestamp_source: str = "input",
    decapsulation: str = "none",
    rate_limit: int = 0,
) -> bytes:
    out = bytearray()
    if time_received:
        out += _varint(1 << 3 | 0) + _varint(time_received)
    if payload:
        out += _varint(2 << 3 | 2) + _varint(len(payload)) + payload
    if source_address:
        out += _varint(3 << 3 | 2) + _varint(len(source_address)) + source_address
    if use_source_address:
        out += _varint(4 << 3 | 0) + _varint(1)
    if _DECODERS_INV[decoder]:
        out += _varint(5 << 3 | 0) + _varint(_DECODERS_INV[decoder])
    if _TS_INV[timestamp_source]:
        out += _varint(6 << 3 | 0) + _varint(_TS_INV[timestamp_source])
    if _DECAPS_INV[decapsulation]:
        out += _varint(7 << 3 | 0) + _varint(_DECAPS_INV[decapsulation])
    if rate_limit:
        out += _varint(8 << 3 | 0) + _varint(rate_limit)
    return bytes(out)


def decode_raw_flow(data: bytes) -> dict:
    msg = {
        "time_received": 0, "payload": b"", "source_address": b"",
        "use_source_address": False, "decoder": "unspecified",
        "timestamp_source": "input", "decapsulation": "none", "rate_limit": 0,
    }
    off = 0
    while off < len(data):
        tag, off = _read_varint(data, off)
        fieldno, wire = tag >> 3, tag & 0x7
        if wire == 0:
            value, off = _read_varint(data, off)
        elif wire == 2:
            ln, off = _read_varint(data, off)
            if ln > len(data) - off:
                raise ValueError("length-delimited field exceeds buffer")
            value = data[off:off + ln]
            off += ln
        elif wire == 5:
            value, off = int.from_bytes(data[off:off + 4], "little"), off + 4
        elif wire == 1:
            value, off = int.from_bytes(data[off:off + 8], "little"), off + 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if fieldno == 1:
            msg["time_received"] = value
        elif fieldno == 2:
            # bytes fields must arrive length-delimited: bytes(varint)
            # would ALLOCATE that many zeros — a malformed tag byte
            # must not demand gigabytes (wire-type confusion)
            if wire != 2:
                raise ValueError(f"field 2 (payload) with wire type {wire}")
            msg["payload"] = bytes(value)
        elif fieldno == 3:
            if wire != 2:
                raise ValueError(f"field 3 (source_address) with wire type {wire}")
            msg["source_address"] = bytes(value)
        elif fieldno == 4:
            msg["use_source_address"] = bool(value)
        elif fieldno == 5:
            msg["decoder"] = DECODERS.get(value, "unspecified")
        elif fieldno == 6:
            msg["timestamp_source"] = TIMESTAMP_SOURCES.get(value, "input")
        elif fieldno == 7:
            msg["decapsulation"] = DECAPS.get(value, "none")
        elif fieldno == 8:
            msg["rate_limit"] = value
        # unknown fields are skipped (proto3 forward compatibility)
    return msg


def raw_flows_from_kafka(kafka_df: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka frame → RAW_FLOW_SCHEMA frame (the decoders' input)."""
    from akvorado_spark.sources.decode import RAW_FLOW_SCHEMA

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf[value_col]:
                m = decode_raw_flow(bytes(blob))
                rows.append(
                    (
                        pd.Timestamp(m["time_received"], unit="s") if m["time_received"] else None,
                        m["payload"],
                        m["source_address"],
                        m["decoder"],
                        m["timestamp_source"],
                        m["decapsulation"],
                        m["use_source_address"],
                        m["rate_limit"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RAW_FLOW_SCHEMA.fields]
            )

    return kafka_df.mapInPandas(run, RAW_FLOW_SCHEMA)
