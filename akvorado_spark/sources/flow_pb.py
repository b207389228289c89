"""Proto3 wire codec for ENRICHED flows — the payload of the optional
second Kafka topic (SURVEY §2.1 S10).

Mirrors the reference's per-flow encoder (common/schema/protobuf.go +
field assignment common/schema/definition.go:596-640): field numbers
are assigned sequentially over the exported (stored, enabled) columns
in schema order, wire types derive from the column type —

- integers / timestamps → varint (DateTime encodes epoch seconds)
- strings → length-delimited UTF-8
- 16-byte IPs (BinaryType) → length-delimited bytes
- Array(UInt32)-shaped columns → repeated NON-packed varints (the
  reference appends tag+varint per element)
- large communities (array<struct<asn,local1,local2>>) → repeated
  16-byte big-endian (high-64 = asn<<32|local1 … mirrors the
  reference's UInt128 packing, console/filter/helpers.go:269-279)

Deviation, documented: enum columns (InIfBoundary, FlowDirection)
store their *labels* in this schema, so they export as strings where
the reference exports the Enum8 numeric.  The schema hash that
versions the topic name covers this: any layout change re-keys the
topic, like the reference's ``flows-v<N>`` + schema-hash convention.

The varint primitives are shared with the RawFlow transport codec
(sources/rawflow_pb.py).
"""

from __future__ import annotations

import hashlib
import struct
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from akvorado_spark.schema.definition import FlowSchema, flows_schema
from akvorado_spark.sources.rawflow_pb import _read_varint, _varint

_VARINT, _BYTES = 0, 2


def flow_proto_fields(schema: FlowSchema | None = None) -> list[tuple[int, str, str]]:
    """(field_number, column_name, kind) for every exported column.

    kind ∈ {uint, string, bytes, array_uint, array_u128}.  Sequential
    numbering over stored() order mirrors the reference's
    ``protobufIndex`` assignment.
    """
    schema = schema or flows_schema()
    out = []
    n = 1
    for c in schema.stored():
        dt = c.dtype
        if isinstance(dt, T.TimestampType) or isinstance(
            dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            kind = "uint"
        elif isinstance(dt, T.StringType):
            kind = "string"
        elif isinstance(dt, T.BinaryType):
            kind = "bytes"
        elif isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, (T.LongType, T.IntegerType)
        ):
            kind = "array_uint"
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            kind = "array_u128"
        else:  # unsupported type: not exported (reference does the same)
            continue
        out.append((n, c.name, kind))
        n += 1
    return out


def flow_schema_hash(schema: FlowSchema | None = None) -> str:
    """8-hex-char hash versioning the wire layout (topic suffix), like
    the reference's schema hash (common/schema/clickhouse.go:145-152)."""
    spec = ";".join(f"{n}:{name}:{k}" for n, name, k in flow_proto_fields(schema))
    return hashlib.sha256(spec.encode()).hexdigest()[:8]


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def encode_flow(row: dict, fields: list[tuple[int, str, str]]) -> bytes:
    out = bytearray()
    for num, name, kind in fields:
        v = row.get(name)
        # pandas surfaces nullable int cells as NaN floats — treat as absent
        if v is None or (isinstance(v, float) and v != v):
            continue
        if kind == "uint":
            if isinstance(v, datetime):
                v = int(v.replace(tzinfo=v.tzinfo or timezone.utc).timestamp())
            if v == 0:
                continue  # proto3 default elision
            out += _tag(num, _VARINT) + _varint(int(v))
        elif kind == "string":
            if v == "":
                continue
            b = v.encode()
            out += _tag(num, _BYTES) + _varint(len(b)) + b
        elif kind == "bytes":
            b = bytes(v)
            if not b:
                continue
            out += _tag(num, _BYTES) + _varint(len(b)) + b
        elif kind == "array_uint":
            for x in v:
                out += _tag(num, _VARINT) + _varint(int(x))
        elif kind == "array_u128":
            for s in v:
                hi = (int(s["asn"]) << 32) | int(s["local1"])
                lo = int(s["local2"])
                out += _tag(num, _BYTES) + _varint(16) + struct.pack(">QQ", hi, lo)
    return bytes(out)


def decode_flow(data: bytes, fields: list[tuple[int, str, str]]) -> dict:
    """Inverse of :func:`encode_flow`; raises ValueError on malformed
    input (shared error contract of all binary codecs in this repo)."""
    by_num = {n: (name, kind) for n, name, kind in fields}
    row: dict = {name: [] if kind.startswith("array") else None for _, name, kind in fields}
    off = 0
    try:
        while off < len(data):
            key, off = _read_varint(data, off)
            num, wire = key >> 3, key & 7
            if wire == _VARINT:
                val, off = _read_varint(data, off)
            elif wire == _BYTES:
                ln, off = _read_varint(data, off)
                if ln > len(data) - off:
                    raise ValueError("length-delimited field overruns buffer")
                val = data[off : off + ln]
                off += ln
            else:
                raise ValueError(f"unsupported wire type {wire}")
            if num not in by_num:
                continue  # unknown field: skip (proto3 semantics)
            name, kind = by_num[num]
            # wire-type confusion guard (same class as the RawFlow codec
            # fix): a length-delimited field arriving as a varint would
            # turn the value into an int and bytes(int) allocates
            # attacker-chosen memory — reject mismatches outright
            expected = _VARINT if kind in ("uint", "array_uint") else _BYTES
            if wire != expected:
                raise ValueError(
                    f"field {num} ({name}): wire type {wire}, expected {expected}"
                )
            if kind == "uint":
                row[name] = val
            elif kind == "string":
                row[name] = bytes(val).decode()
            elif kind == "bytes":
                row[name] = bytes(val)
            elif kind == "array_uint":
                row[name].append(val)
            elif kind == "array_u128":
                if len(val) != 16:
                    raise ValueError("UInt128 element must be 16 bytes")
                hi, lo = struct.unpack(">QQ", val)
                row[name].append(
                    {"asn": hi >> 32, "local1": hi & 0xFFFFFFFF, "local2": lo}
                )
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed flow protobuf: {exc}") from None
    return row


def serialize_flows_proto(
    df: DataFrame,
    schema: FlowSchema | None = None,
    key_col: str = "ExporterAddress",
) -> DataFrame:
    """(key, value) Kafka frame with proto3-encoded enriched flows.

    Runs as mapInPandas (Arrow batches in, one Python pass per batch) —
    the Kafka boundary is the one place the reference also pays a
    per-flow encode loop (common/schema/protobuf.go); everything before
    it stays JVM-side.
    """
    schema = schema or flows_schema()
    fields = flow_proto_fields(schema)
    field_names = [name for _, name, _ in fields]
    cols = [c for c in field_names if c in df.columns]
    has_key = key_col in df.columns

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            rows = pdf.to_dict("records")
            values = [encode_flow(r, fields) for r in rows]
            out = {"value": values}
            if has_key:
                out = {"key": [bytes(r[key_col]) for r in rows], "value": values}
            yield pd.DataFrame(out)

    out_schema = "key binary, value binary" if has_key else "value binary"
    sel = df.select(*(cols if has_key else [c for c in cols if c != key_col]))
    return sel.mapInPandas(enc, out_schema)
