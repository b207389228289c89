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
        (None, p.encode(), b"\x0a\x00\x00\x01", "json", "udp", "none", False, 0)
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
        [(None, b"7,443,1000", b"\x0a\x00\x00\x01", "netflow", "udp", "none", False, 0)],
        RAW_FLOW_SCHEMA,
    )

    def parse(payloads: pd.Series, source_addresses: pd.Series) -> pd.DataFrame:
        rows = [tuple(int(x) for x in p.decode().split(",")) for p in payloads]
        return pd.DataFrame(rows, columns=["SrcPort", "DstPort", "Bytes"])

    out = decode_binary(raw, FLOW, "netflow", parse).collect()
    assert [tuple(r) for r in out] == [(7, 443, 1000)]


def test_decode_binary_stub_raises(spark):
    raw = spark.createDataFrame(
        [(None, b"\x00\x05", b"\x0a\x00\x00\x01", "netflow", "udp", "none", False, 0)],
        RAW_FLOW_SCHEMA,
    )
    with pytest.raises(Exception) as e:
        decode_binary(raw, FLOW, "netflow").collect()
    assert "stubbed" in str(e.value)

def test_decode_binary_per_message_options(spark):
    """pb.RawFlow fields 1/6/7 apply PER MESSAGE (outlet/core/worker.go
    feeds each RawFlow's own options to the decoder,
    outlet/flow/decoder.go:40-44): one batch mixing timestamp sources
    and decapsulation decodes each record under its own settings."""
    import datetime

    from akvorado_spark.oracle.wire_queries import (
        _EXP,
        _build_v9_frame,
        _build_v9_single,
        _fields,
        _MIX_HDR_TIME,
    )
    from akvorado_spark.sources.wire import WIRE_SCHEMA, netflow_batch_parser

    f = _fields(40, 7)  # ok=40: ok%1000=40, ok%3600=40
    t_in = datetime.datetime(2027, 1, 1, tzinfo=datetime.timezone.utc)
    plain, framed = _build_v9_single(f), _build_v9_frame(f)
    rows = [
        (t_in, plain, _EXP, "netflow", "input", "none", False, 0),
        (t_in, plain, _EXP, "netflow", "netflow-packet", "none", False, 0),
        (t_in, plain, _EXP, "netflow", "netflow-first-switched", "none", False, 0),
        (t_in, framed, _EXP, "netflow", "input", "vxlan", False, 0),
        (t_in, framed, _EXP, "netflow", "input", "none", False, 0),
    ]
    raw = spark.createDataFrame(rows, RAW_FLOW_SCHEMA)
    out = decode_binary(raw, WIRE_SCHEMA, "netflow", netflow_batch_parser())
    got = sorted(
        (r["TimeReceived"], r["DstPort"], r["Bytes"]) for r in out.collect()
    )
    epoch_in = int(t_in.timestamp())
    want = sorted([
        (epoch_in, f["dp"], f["bytes"]),                    # TS_INPUT
        (_MIX_HDR_TIME + 40, f["dp"], f["bytes"]),          # TS_NETFLOW_PACKET
        (_MIX_HDR_TIME + 40 + 40, f["dp"], f["bytes"]),     # TS_FIRST_SWITCHED
        (epoch_in, f["dp"], 50 + 40 % 4000),                # decap → inner flow
        (epoch_in, 4789, f["bytes"]),                       # no decap → outer
    ])
    assert got == want
