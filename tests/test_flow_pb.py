"""Round-trip tests for the enriched-flow proto3 codec (S10)."""

from __future__ import annotations

import random

import pytest

from akvorado_spark.schema.definition import flows_schema
from akvorado_spark.sources.flow_pb import (
    decode_flow,
    encode_flow,
    flow_proto_fields,
    flow_schema_hash,
    serialize_flows_proto,
)
from akvorado_spark.sources.fixtures import flows_df


def test_field_assignment_sequential_and_stable():
    fields = flow_proto_fields()
    nums = [n for n, _, _ in fields]
    assert nums == list(range(1, len(nums) + 1))
    names = {name for _, name, _ in fields}
    assert {"TimeReceived", "SrcAddr", "Bytes", "DstASPath", "DstLargeCommunities"} <= names
    # the hash versions the layout (topic naming contract)
    assert len(flow_schema_hash()) == 8
    assert flow_schema_hash() == flow_schema_hash()


def test_encode_decode_roundtrip_sparkless():
    fields = flow_proto_fields()
    row = {
        "TimeReceived": 1_700_000_000,
        "SamplingRate": 1000,
        "ExporterAddress": b"\x00" * 12 + bytes([192, 0, 2, 7]),
        "ExporterName": "router1",
        "SrcAddr": b"\x00" * 12 + bytes([10, 0, 0, 1]),
        "Bytes": 1234,
        "Packets": 3,
        "SrcAS": 65001,
        "DstASPath": [65001, 65002, 65002, 65003],
        "DstLargeCommunities": [{"asn": 65000, "local1": 1, "local2": 2}],
        "Proto": 6,
    }
    wire = encode_flow(row, fields)
    back = decode_flow(wire, fields)
    for k, v in row.items():
        assert back[k] == v, k
    # proto3 defaults: absent/zero fields decode as None / empty list
    assert back["DstPort"] in (None, 0)
    assert back["DstCommunities"] == []


def test_decode_garbage_raises_valueerror_only():
    fields = flow_proto_fields()
    rng = random.Random(3)
    good = encode_flow({"Bytes": 77, "ExporterName": "r"}, fields)
    for _ in range(500):
        if rng.random() < 0.5:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 30)))
        else:
            cut = rng.randrange(len(good))
            data = good[:cut] + bytes([rng.randrange(256)]) + good[cut:]
        try:
            decode_flow(data, fields)
        except ValueError:
            pass


def test_serialize_flows_proto_spark_roundtrip(spark):
    sch = flows_schema()
    flows = sch.ingest(flows_df(spark, n=50))
    frame = serialize_flows_proto(flows, sch)
    rows = frame.collect()
    assert len(rows) == 50
    fields = flow_proto_fields(sch)
    src = {
        (bytes(r["ExporterAddress"]), r["Bytes"], int(r["TimeReceived"].timestamp())): r
        for r in flows.collect()
    }
    for r in rows:
        dec = decode_flow(bytes(r["value"]), fields)
        key = (dec["ExporterAddress"], dec["Bytes"], dec["TimeReceived"])
        assert key in src
        orig = src[key]
        assert dec["ExporterName"] == orig["ExporterName"]
        assert dec["SrcAS"] == orig["SrcAS"]
        assert bytes(r["key"]) == dec["ExporterAddress"]
