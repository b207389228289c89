"""Decoder tests (SURVEY §2.1 S5-S8)."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from akvorado_spark.sources.decode import RAW_FLOW_SCHEMA, decode_binary, decode_json

FLOW = T.StructType(
    [
        T.StructField("SrcPort", T.IntegerType()),
        T.StructField("DstPort", T.IntegerType()),
        T.StructField("Bytes", T.LongType()),
    ]
)


def _raw(spark, payloads):
    rows = [
        (None, p.encode(), b"\x0a\x00\x00\x01", "json", "udp", "none")
        for p in payloads
    ]
    return spark.createDataFrame(rows, RAW_FLOW_SCHEMA)


def test_decode_json_single_and_array(spark):
    one = json.dumps({"SrcPort": 1, "DstPort": 443, "Bytes": 100})
    many = json.dumps(
        [
            {"SrcPort": 2, "DstPort": 53, "Bytes": 200},
            {"SrcPort": 3, "DstPort": 80, "Bytes": 300},
        ]
    )
    out = decode_json(_raw(spark, [one, many]), FLOW).collect()
    assert len(out) == 3  # 1 + 2: a datagram can carry several flows
    assert sum(r["Bytes"] for r in out) == 600


def test_decode_binary_custom_parser(spark):
    # payload format: "src,dst,bytes" — stands in for a wire format
    raw = spark.createDataFrame(
        [(None, b"7,443,1000", b"\x0a\x00\x00\x01", "netflow", "udp", "none")],
        RAW_FLOW_SCHEMA,
    )

    def parse(payloads: pd.Series, source_addresses: pd.Series) -> pd.DataFrame:
        rows = [tuple(int(x) for x in p.decode().split(",")) for p in payloads]
        return pd.DataFrame(rows, columns=["SrcPort", "DstPort", "Bytes"])

    out = decode_binary(raw, FLOW, "netflow", parse).collect()
    assert [tuple(r) for r in out] == [(7, 443, 1000)]


def test_decode_binary_stub_raises(spark):
    raw = spark.createDataFrame(
        [(None, b"\x00\x05", b"\x0a\x00\x00\x01", "netflow", "udp", "none")],
        RAW_FLOW_SCHEMA,
    )
    with pytest.raises(Exception) as e:
        decode_binary(raw, FLOW, "netflow").collect()
    assert "stubbed" in str(e.value)
