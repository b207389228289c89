"""Oracle-gated binary-decode round-trips (S5/S6).

DuckDB cannot parse NetFlow or sFlow bytes, but it can predict what a
correct decoder must output when the datagrams are *built
deterministically from a table it can read*.  Each query here:

1. derives per-row wire fields from ``orders`` with pure integer
   arithmetic,
2. packs real datagrams (NetFlow v5 / v9-with-options / sFlow v5)
   inside ``mapInPandas``,
3. decodes them back with the production parsers in ``sources/wire``,
4. aggregates the decoded rows into integers.

The DuckDB oracle computes the same aggregates straight from
``orders`` — so a parser that mis-reads any field (offsets, sampling
state, template bookkeeping, header walk) hash-mismatches.  This is
the same certified-twin strategy the sketch pipelines use.

Datagrams are self-contained (template + options + data in one v9
packet), so decoding is order-independent across partitions — the
cross-datagram template lifecycle is covered by tests/test_wire.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import functions as F

from akvorado_spark.oracle.registry import register
from akvorado_spark.sources.tables import load_table
from akvorado_spark.sources.wire import (
    WIRE_SCHEMA,
    TemplateCache,
    parse_netflow,
    parse_sflow,
)

_EXP = bytes([192, 0, 2, 7])

# Per-row wire fields, defined once as integer arithmetic both engines
# can compute exactly.
_DPORTS = [53, 80, 443, 8080]


def _fields(orderkey: int, custkey: int) -> dict:
    return dict(
        ok=orderkey,
        src=bytes([10, custkey % 250, (orderkey // 250) % 250, orderkey % 250]),
        dst=bytes([198, 51, 100, custkey % 200]),
        sp=1024 + orderkey % 60000,
        dp=_DPORTS[orderkey % 4],
        proto=6 if orderkey % 3 else 17,
        bytes=100 + orderkey % 9000,
        pkts=1 + orderkey % 16,
        sas=65000 + custkey % 50,
        das=65100 + orderkey % 50,
    )


_V5_RATE = 1000
_V9_RATE = 2048
_SFLOW_RATE = 512


# ---- builders (wire layouts per the public specs) ------------------------


def _build_v5(recs: list[dict]) -> bytes:
    hdr = struct.pack(">HHIIIIBBH", 5, len(recs), 0, 1700000000, 0, 0, 0, 0, _V5_RATE)
    out = [hdr]
    for f in recs:
        out.append(
            struct.pack(
                ">4s4s4sHHIIIIHHBBBBHHBBH",
                f["src"], f["dst"], b"\0\0\0\0", 1, 2,
                f["pkts"], f["bytes"], 0, 0, f["sp"], f["dp"],
                0, 0, f["proto"], 0, f["sas"], f["das"], 0, 0, 0,
            )
        )
    return b"".join(out)


_V9_FIELDS = [(8, 4), (12, 4), (7, 2), (11, 2), (4, 1), (1, 4), (2, 4), (16, 4), (17, 4)]


def _build_v9(recs: list[dict]) -> bytes:
    tpl_body = struct.pack(">HH", 256, len(_V9_FIELDS))
    for ie, ln in _V9_FIELDS:
        tpl_body += struct.pack(">HH", ie, ln)
    tpl = struct.pack(">HH", 0, 4 + len(tpl_body)) + tpl_body
    # options template (scope System + samplingInterval) + its data record
    opt_tpl_body = struct.pack(">HHH", 300, 4, 4) + struct.pack(">HHHH", 1, 4, 34, 4)
    opt_tpl = struct.pack(">HH", 1, 4 + len(opt_tpl_body)) + opt_tpl_body
    opt_data_body = struct.pack(">II", 1, _V9_RATE)
    opt_data = struct.pack(">HH", 300, 4 + len(opt_data_body)) + opt_data_body
    data_body = b"".join(
        f["src"] + f["dst"]
        + struct.pack(">HHB", f["sp"], f["dp"], f["proto"])
        + struct.pack(">IIII", f["bytes"], f["pkts"], f["sas"], f["das"])
        for f in recs
    )
    pad = (-len(data_body)) % 4
    data = struct.pack(">HH", 256, 4 + len(data_body) + pad) + data_body + b"\0" * pad
    body = tpl + opt_tpl + opt_data + data
    return struct.pack(">HHIIII", 9, 4, 0, 1700000100, 0, 0) + body


def _build_sflow(recs: list[dict]) -> bytes:
    samples = []
    for f in recs:
        eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", 0x0800)
        # decoded Bytes = the IP total-length field (reference
        # helpers.go ParseIPv4), so the oracle's f["bytes"] goes there
        ip = bytes([0x45, 0]) + struct.pack(">H", f["bytes"]) + b"\0\0\0\0" \
            + bytes([64, f["proto"]]) + b"\0\0" + f["src"] + f["dst"]
        l4 = struct.pack(">HH", f["sp"], f["dp"]) + b"\0" * 12 + b"\0\0\0\0"
        hdr = eth + ip + l4
        raw = struct.pack(">IIII", 1, f["bytes"] + 18, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)
        rec1 = struct.pack(">II", 1, len(raw)) + raw
        gw = (
            struct.pack(">I", 1) + f["src"]            # next-hop (v4 form)
            + struct.pack(">III", 65000, f["sas"], f["sas"])
            + struct.pack(">I", 1) + struct.pack(">II", 2, 1)
            + struct.pack(">I", f["das"])              # AS path = [das]
            + struct.pack(">I", 0) + struct.pack(">I", 100)
        )
        rec2 = struct.pack(">II", 1003, len(gw)) + gw
        body = struct.pack(">IIIII", 1, 1, _SFLOW_RATE, 0, 0)
        body += struct.pack(">II", 3, 4)  # inif, outif
        body += struct.pack(">I", 2) + rec1 + rec2
        samples.append(struct.pack(">II", 1, len(body)) + body)
    hdr = struct.pack(">II", 5, 1) + _EXP + struct.pack(">IIII", 0, 0, 0, len(samples))
    return hdr + b"".join(samples)


# ---- queries -------------------------------------------------------------


# both engines decode the same deterministic 1-in-5 sample; the parse
# exercises every field and all four dst_port groups at 20% of the
# Python packing cost (the scale path would decode from Kafka, not
# re-pack its own input)
_SAMPLE = "o_orderkey % 5 = 0"


def _decode_run(spark, sf_dir, build_packets, parse, extra_aggs=None):
    orders = (
        load_table(spark, "orders", sf_dir, spread=True)
        .filter(_SAMPLE)
        .select("o_orderkey", "o_custkey")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            recs = [
                _fields(int(ok), int(ck))
                for ok, ck in zip(pdf["o_orderkey"], pdf["o_custkey"])
            ]
            rows: list[dict] = []
            for pkt in build_packets(recs):
                rows.extend(parse(pkt))
            yield pd.DataFrame(rows, columns=[f.name for f in WIRE_SCHEMA.fields])

    wire = orders.mapInPandas(run, WIRE_SCHEMA)
    return _wire_aggregate(wire, extra_aggs)


def _wire_aggregate(wire, extra_aggs=None):
    aggs = [
        F.count(F.lit(1)).alias("n_flows"),
        F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("est_bytes"),
        F.sum("Packets").alias("sum_pkts"),
        F.countDistinct("SrcAddr").alias("n_src"),
        F.sum("SrcAS").alias("sum_src_as"),
        F.sum("DstAS").alias("sum_dst_as"),
        # gates the decoded TimeReceived per record — the per-message
        # timestamp_source threading (pb.RawFlow field 6) shows up here
        F.sum("TimeReceived").alias("sum_time"),
    ] + (extra_aggs or [])
    return (
        wire.groupBy(F.col("DstPort").alias("dst_port"))
        .agg(*aggs)
        .orderBy("dst_port")
    )


def _netflow_packets(recs: list[dict]) -> list[bytes]:
    v5 = [f for f in recs if f["ok"] % 2 == 0]
    v9 = [f for f in recs if f["ok"] % 2 == 1]
    pkts = [_build_v5(v5[i:i + 30]) for i in range(0, len(v5), 30)]
    pkts += [_build_v9(v9[i:i + 50]) for i in range(0, len(v9), 50)]
    return pkts


def _decode_netflow(spark, sf_dir):
    cache = TemplateCache()
    return _decode_run(
        spark, sf_dir, _netflow_packets,
        lambda pkt: parse_netflow(pkt, _EXP, cache=cache),
    )


def _decode_sflow(spark, sf_dir):
    return _decode_run(
        spark, sf_dir,
        lambda recs: [_build_sflow(recs[i:i + 8]) for i in range(0, len(recs), 8)],
        lambda pkt: parse_sflow(pkt, b"\0" * 4),
    )


# Extended-template v9 family: exercises the round-5 decode surface —
# per-sampler-id rates learned from options records, icmpTypeCode,
# MPLS label sections, post-NAT ports, MACs, TTL — all predicted by
# the same integer arithmetic.
_V9E_RATE1, _V9E_RATE2 = 1000, 3000
_V9E_FIELDS = [(8, 4), (12, 4), (7, 2), (11, 2), (4, 1), (1, 4), (2, 4),
               (16, 4), (17, 4), (32, 2), (70, 3), (227, 2), (56, 6),
               (192, 1), (48, 1)]


def _ext_values(f: dict) -> dict:
    ok = f["ok"]
    return dict(
        proto=1 if ok % 3 == 0 else 6,
        icmp=((ok % 200) << 8) | (ok % 11),
        mpls=1 + ok % 999999,
        natp=(ok * 7) % 65536,
        mac=ok,
        ttl=1 + ok % 255,
        sid=1 if ok % 10 < 5 else 2,
    )


def _build_v9_ext(recs: list[dict]) -> bytes:
    tpl_body = struct.pack(">HH", 257, len(_V9E_FIELDS))
    for ie, ln in _V9E_FIELDS:
        tpl_body += struct.pack(">HH", ie, ln)
    tpl = struct.pack(">HH", 0, 4 + len(tpl_body)) + tpl_body
    # options: scope System + samplerId + samplerRandomInterval,
    # two sampler records with distinct rates
    opt_tpl_body = struct.pack(">HHH", 301, 4, 8) \
        + struct.pack(">HHHHHH", 1, 4, 48, 1, 50, 4)
    opt_tpl = struct.pack(">HH", 1, 4 + len(opt_tpl_body)) + opt_tpl_body
    od = struct.pack(">IBI", 0, 1, _V9E_RATE1) + struct.pack(">IBI", 0, 2, _V9E_RATE2)
    od += b"\0" * ((-len(od)) % 4)
    opt_data = struct.pack(">HH", 301, 4 + len(od)) + od
    data_body = b""
    for f in recs:
        e = _ext_values(f)
        data_body += (
            f["src"] + f["dst"]
            + struct.pack(">HHB", f["sp"], f["dp"], e["proto"])
            + struct.pack(">IIII", f["bytes"], f["pkts"], f["sas"], f["das"])
            + struct.pack(">H", e["icmp"])
            + (e["mpls"] << 4).to_bytes(3, "big")
            + struct.pack(">H", e["natp"])
            + e["mac"].to_bytes(6, "big")
            + bytes([e["ttl"], e["sid"]])
        )
    pad = (-len(data_body)) % 4
    data = struct.pack(">HH", 257, 4 + len(data_body) + pad) + data_body + b"\0" * pad
    body = tpl + opt_tpl + opt_data + data
    return struct.pack(">HHIIII", 9, 4, 0, 1700000100, 0, 1) + body


_EXT_AGGS_SQL = """
       CAST(SUM(CASE WHEN ok % 3 = 0 THEN (ok % 200) * 997 + (ok % 11) END) AS BIGINT) AS sum_icmp,
       CAST(SUM(1 + ok % 999999) AS BIGINT) AS sum_mpls,
       CAST(SUM((ok * 7) % 65536) AS BIGINT) AS sum_nat,
       CAST(SUM(ok) AS BIGINT) AS sum_mac,
       CAST(SUM(1 + ok % 255) AS BIGINT) AS sum_ttl"""


def _decode_netflow_ext(spark, sf_dir):
    cache = TemplateCache()
    return _decode_run(
        spark, sf_dir,
        lambda recs: [_build_v9_ext(recs[i:i + 50]) for i in range(0, len(recs), 50)],
        lambda pkt: parse_netflow(pkt, _EXP, cache=cache),
        extra_aggs=[
            F.sum(F.col("ICMPv4Type") * 997 + F.col("ICMPv4Code")).alias("sum_icmp"),
            F.sum(F.element_at("MPLSLabels", 1)).alias("sum_mpls"),
            F.sum("SrcPortNAT").alias("sum_nat"),
            F.sum("SrcMAC").alias("sum_mac"),
            F.sum("IPTTL").alias("sum_ttl"),
        ],
    )


# Per-message RawFlow-options family: one single-record v9 datagram per
# order row, each RawFlow carrying its OWN timestamp_source /
# decapsulation (pb.RawFlow fields 6/7, applied per message at
# outlet/core/worker.go → outlet/flow/decoder.go:40-44).  A mixed batch
# must decode every record under its own settings — batch-wide defaults
# hash-mismatch on sum_time / the 4789 group split.
_MIX_HDR_TIME = 1_750_000_000     # v9 header export clock base
_MIX_IN_TIME = 1_800_000_000      # RawFlow time_received base
_MIX_SYSUP_MS = 10_000

_V9M_FIELDS = _V9_FIELDS + [(22, 4)]  # + FIRST_SWITCHED (ms sysuptime)


def _build_v9_single(f: dict) -> bytes:
    """One v9 datagram: template 258 + a single data record."""
    ok = f["ok"]
    tpl_body = struct.pack(">HH", 258, len(_V9M_FIELDS))
    for ie, ln in _V9M_FIELDS:
        tpl_body += struct.pack(">HH", ie, ln)
    tpl = struct.pack(">HH", 0, 4 + len(tpl_body)) + tpl_body
    first_ms = _MIX_SYSUP_MS + (ok % 3600) * 1000
    rec = (
        f["src"] + f["dst"]
        + struct.pack(">HHB", f["sp"], f["dp"], f["proto"])
        + struct.pack(">IIIII", f["bytes"], f["pkts"], f["sas"], f["das"], first_ms)
    )
    pad = (-len(rec)) % 4
    data = struct.pack(">HH", 258, 4 + len(rec) + pad) + rec + b"\0" * pad
    hdr = struct.pack(
        ">HHIIII", 9, 2, _MIX_SYSUP_MS, _MIX_HDR_TIME + ok % 1000, 0, 0
    )
    return hdr + tpl + data


def _ipv4(total_len: int, proto: int, src: bytes, dst: bytes) -> bytes:
    return (
        bytes([0x45, 0]) + struct.pack(">H", total_len) + b"\0\0\0\0"
        + bytes([64, proto]) + b"\0\0" + src + dst
    )


def _build_v9_frame(f: dict) -> bytes:
    """One v9 datagram whose record is sas/das IEs + an IE315 datalink
    frame: outer IPv4/UDP:4789 + VXLAN wrapping an inner IPv4/UDP flow.
    Under decapsulation the inner flow wins (ports/addr/Bytes); without
    it the outer headers decode (dst port 4789)."""
    ok = f["ok"]
    fields = [(16, 4), (17, 4), (315, 0xFFFF)]
    tpl_body = struct.pack(">HH", 259, len(fields))
    for ie, ln in fields:
        tpl_body += struct.pack(">HH", ie, ln)
    tpl = struct.pack(">HH", 0, 4 + len(tpl_body)) + tpl_body
    inner_len = 50 + ok % 4000
    inner_udp = struct.pack(">HHHH", f["sp"], f["dp"], 0, 0)
    inner = (
        b"\xcc" * 6 + b"\xdd" * 6 + struct.pack(">H", 0x0800)
        + _ipv4(inner_len, 17, f["src"], f["dst"]) + inner_udp
    )
    vxlan = struct.pack(">II", 0x08000000, 42 << 8)
    outer_udp = struct.pack(">HHHH", 55555, 4789, 0, 0)
    frame = (
        b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", 0x0800)
        + _ipv4(f["bytes"], 17, bytes([192, 0, 2, 1]), bytes([192, 0, 2, 2]))
        + outer_udp + vxlan + inner
    )
    rec = struct.pack(">II", f["sas"], f["das"]) + bytes([len(frame)]) + frame
    pad = (-len(rec)) % 4
    data = struct.pack(">HH", 259, 4 + len(rec) + pad) + rec + b"\0" * pad
    hdr = struct.pack(">HHIIII", 9, 2, 0, _MIX_HDR_TIME, 0, 0)
    return hdr + tpl + data


def _decode_netflow_mixed(spark, sf_dir):
    """The decode_binary path end-to-end with per-message options."""
    from akvorado_spark.sources.decode import RAW_FLOW_SCHEMA, decode_binary
    from akvorado_spark.sources.wire import netflow_batch_parser

    orders = (
        load_table(spark, "orders", sf_dir, spread=True)
        .filter(_SAMPLE)
        .select("o_orderkey", "o_custkey")
    )
    raw_names = [f.name for f in RAW_FLOW_SCHEMA.fields]
    ts_names = ("input", "netflow-packet", "netflow-first-switched")

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for ok, ck in zip(pdf["o_orderkey"], pdf["o_custkey"]):
                f = _fields(int(ok), int(ck))
                g = f["ok"] % 4
                if g < 3:
                    payload = _build_v9_single(f)
                    tsrc, decap = ts_names[g], "none"
                else:
                    payload = _build_v9_frame(f)
                    tsrc = "input"
                    decap = "vxlan" if f["ok"] % 8 == 3 else "none"
                rows.append((
                    pd.Timestamp(_MIX_IN_TIME + f["ok"] % 86400, unit="s"),
                    payload, _EXP, "netflow", tsrc, decap, False, 0,
                ))
            yield pd.DataFrame(rows, columns=raw_names)

    raw = orders.mapInPandas(build, RAW_FLOW_SCHEMA)
    wire = decode_binary(raw, WIRE_SCHEMA, "netflow", netflow_batch_parser())
    return _wire_aggregate(wire)


# The oracle re-derives the wire fields with the same arithmetic.  The
# even/odd v5-vs-v9 split matters only through the sampling rate and is
# keyed on o_orderkey parity in both engines, so it is stable under any
# partitioning.
_COMMON_FIELDS = """
SELECT o_orderkey AS ok, o_custkey AS ck,
       1024 + o_orderkey % 60000 AS sp,
       CASE o_orderkey % 4 WHEN 0 THEN 53 WHEN 1 THEN 80 WHEN 2 THEN 443 ELSE 8080 END AS dp,
       100 + o_orderkey % 9000 AS bytes,
       1 + o_orderkey % 16 AS pkts,
       65000 + o_custkey % 50 AS sas,
       65100 + o_orderkey % 50 AS das,
       (o_custkey % 250) * 1000000 + ((o_orderkey // 250) % 250) * 1000 + o_orderkey % 250 AS src_key
FROM orders
WHERE o_orderkey % 5 = 0
"""


def _roundtrip_oracle(rate_expr: str, time_expr: str = "0") -> str:
    return f"""
WITH f AS ({_COMMON_FIELDS})
SELECT dp AS dst_port,
       COUNT(*) AS n_flows,
       CAST(SUM(bytes * ({rate_expr})) AS BIGINT) AS est_bytes,
       CAST(SUM(pkts) AS BIGINT) AS sum_pkts,
       COUNT(DISTINCT src_key) AS n_src,
       CAST(SUM(sas) AS BIGINT) AS sum_src_as,
       CAST(SUM(das) AS BIGINT) AS sum_dst_as,
       CAST(SUM({time_expr}) AS BIGINT) AS sum_time
FROM f GROUP BY dp ORDER BY dp
"""


# Tagged UNION of both decoder round-trips — one correctness slot; the
# NetFlow (v5 + templated v9) and sFlow (raw-header walk) parsers each
# stay fully hash-gated against DuckDB's arithmetic prediction.
# sum_time: no RawFlow time is supplied, so the decoders fall back to
# the datagram header clocks (v5: 1700000000, v9: 1700000100, sFlow: 0).
_NETFLOW_ORACLE = _roundtrip_oracle(
    f"CASE WHEN ok % 2 = 0 THEN {_V5_RATE} ELSE {_V9_RATE} END",
    "CASE WHEN ok % 2 = 0 THEN 1700000000 ELSE 1700000100 END",
)
_SFLOW_ORACLE = _roundtrip_oracle(str(_SFLOW_RATE)).replace(
    "CAST(SUM(pkts) AS BIGINT) AS sum_pkts", "COUNT(*) AS sum_pkts"
)
_NULL_EXTRAS = """
       CAST(NULL AS BIGINT) AS sum_icmp, CAST(NULL AS BIGINT) AS sum_mpls,
       CAST(NULL AS BIGINT) AS sum_nat, CAST(NULL AS BIGINT) AS sum_mac,
       CAST(NULL AS BIGINT) AS sum_ttl"""
_V9EXT_ORACLE = f"""
WITH f AS ({_COMMON_FIELDS})
SELECT dp AS dst_port,
       COUNT(*) AS n_flows,
       CAST(SUM(bytes * (CASE WHEN ok % 10 < 5 THEN {_V9E_RATE1} ELSE {_V9E_RATE2} END)) AS BIGINT) AS est_bytes,
       CAST(SUM(pkts) AS BIGINT) AS sum_pkts,
       COUNT(DISTINCT src_key) AS n_src,
       CAST(SUM(sas) AS BIGINT) AS sum_src_as,
       CAST(SUM(das) AS BIGINT) AS sum_dst_as,
       CAST(SUM(1700000100) AS BIGINT) AS sum_time,{_EXT_AGGS_SQL}
FROM f GROUP BY dp ORDER BY dp
"""


_MIXED_ORACLE = f"""
WITH f AS ({_COMMON_FIELDS}),
r AS (
  SELECT CASE WHEN ok % 4 < 3 OR ok % 8 = 3 THEN dp ELSE 4789 END AS dst_port,
         CASE WHEN ok % 4 < 3 THEN bytes
              WHEN ok % 8 = 3 THEN 50 + ok % 4000 ELSE bytes END AS b,
         CASE WHEN ok % 4 < 3 THEN pkts ELSE 1 END AS p,
         CASE WHEN ok % 8 = 7 THEN -1 ELSE src_key END AS sk,
         sas, das,
         CASE WHEN ok % 4 = 0 OR ok % 4 = 3 THEN {_MIX_IN_TIME} + ok % 86400
              WHEN ok % 4 = 1 THEN {_MIX_HDR_TIME} + ok % 1000
              ELSE {_MIX_HDR_TIME} + ok % 1000 + ok % 3600 END AS t
  FROM f
)
SELECT dst_port,
       COUNT(*) AS n_flows,
       CAST(SUM(b) AS BIGINT) AS est_bytes,
       CAST(SUM(p) AS BIGINT) AS sum_pkts,
       COUNT(DISTINCT sk) AS n_src,
       CAST(SUM(sas) AS BIGINT) AS sum_src_as,
       CAST(SUM(das) AS BIGINT) AS sum_dst_as,
       CAST(SUM(t) AS BIGINT) AS sum_time
FROM r GROUP BY dst_port ORDER BY dst_port
"""


def _decode_suite_spark(spark, sf_dir):
    nulls = [F.lit(None).cast("long").alias(c)
             for c in ("sum_icmp", "sum_mpls", "sum_nat", "sum_mac", "sum_ttl")]
    nf = _decode_netflow(spark, sf_dir).select(
        F.lit("netflow").alias("variant"), "*", *nulls)
    sf = _decode_sflow(spark, sf_dir).select(
        F.lit("sflow").alias("variant"), "*", *nulls)
    ext = _decode_netflow_ext(spark, sf_dir).select(
        F.lit("netflow_ext").alias("variant"), "*")
    mixed = _decode_netflow_mixed(spark, sf_dir).select(
        F.lit("netflow_mixed").alias("variant"), "*", *nulls)
    return nf.unionByName(sf).unionByName(ext).unionByName(mixed)


register(
    "decode_roundtrip_suite",
    _decode_suite_spark,
    f"SELECT 'netflow' AS variant, *,{_NULL_EXTRAS} FROM ({_NETFLOW_ORACLE}) "
    f"UNION ALL SELECT 'sflow' AS variant, *,{_NULL_EXTRAS} FROM ({_SFLOW_ORACLE}) "
    f"UNION ALL SELECT 'netflow_ext' AS variant, * FROM ({_V9EXT_ORACLE}) "
    f"UNION ALL SELECT 'netflow_mixed' AS variant, *,{_NULL_EXTRAS} FROM ({_MIXED_ORACLE})",
)
