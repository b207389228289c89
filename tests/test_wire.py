"""Wire-format decoder tests (S5/S6/S8) — golden datagrams built
from the public specs, mirroring the reference's pcap-fixture
strategy (outlet/flow/decoder/netflow/decode_test.go)."""

from __future__ import annotations

import struct

from akvorado_spark.sources.wire import (
    ETYPE_IPV4,
    ETYPE_IPV6,
    TemplateCache,
    ip16,
    netflow_batch_parser,
    parse_netflow,
    parse_sflow,
    sflow_batch_parser,
)

EXP = bytes([192, 0, 2, 1])


# ---- builders ------------------------------------------------------------


def build_v5(records, sampling=0x0000):
    hdr = struct.pack(">HHIIIIBBH", 5, len(records), 0, 1700000000, 0, 1, 0, 0, sampling)
    out = [hdr]
    for r in records:
        out.append(
            struct.pack(
                ">4s4s4sHHIIIIHHBBBBHHBBH",
                r["src"], r["dst"], r.get("nh", b"\0\0\0\0"),
                r.get("inif", 1), r.get("outif", 2),
                r.get("pkts", 1), r.get("bytes", 100), 0, 0,
                r.get("sp", 0), r.get("dp", 0), 0,
                r.get("flags", 0), r.get("proto", 6), 0,
                r.get("sas", 0), r.get("das", 0),
                r.get("smask", 0), r.get("dmask", 0), 0,
            )
        )
    return b"".join(out)


def v9_flowset(set_id, body):
    pad = (-len(body)) % 4
    return struct.pack(">HH", set_id, 4 + len(body) + pad) + body + b"\0" * pad


def build_v9(flowsets, domain=0):
    body = b"".join(flowsets)
    hdr = struct.pack(">HHIIII", 9, len(flowsets), 0, 1700000100, 7, domain)
    return hdr + body


def build_ipfix(sets, domain=0):
    body = b"".join(sets)
    hdr = struct.pack(">HHIII", 10, 16 + len(body), 1700000200, 7, domain)
    return hdr + body


V9_TEMPLATE_FIELDS = [  # (IE, len)
    (8, 4), (12, 4), (7, 2), (11, 2), (4, 1), (1, 4), (2, 4), (10, 4), (14, 4),
    (16, 4), (17, 4), (6, 1),
]


def v9_template(tid=256, fields=V9_TEMPLATE_FIELDS):
    body = struct.pack(">HH", tid, len(fields))
    for ie, ln in fields:
        body += struct.pack(">HH", ie, ln)
    return v9_flowset(0, body)


def v9_data(tid=256, src=b"\x0a\x00\x00\x01", dst=b"\x0a\x00\x00\x02"):
    rec = (
        src + dst + struct.pack(">HHB", 40000, 443, 6)
        + struct.pack(">IIIIII", 1500, 3, 10, 20, 65001, 65002)
        + bytes([0x12])
    )
    return v9_flowset(tid, rec)


# ---- NetFlow v5 ----------------------------------------------------------


def test_netflow_v5():
    pkt = build_v5(
        [
            dict(src=b"\x0a\x00\x00\x01", dst=b"\xc6\x33\x64\x09", sp=1234, dp=53,
                 proto=17, bytes=300, pkts=2, sas=65001, das=65002, smask=8, dmask=24),
            dict(src=b"\x0a\x01\x02\x03", dst=b"\x0a\x02\x00\x01", sp=55555, dp=443,
                 proto=6, bytes=9000, pkts=6, flags=0x18),
        ],
        sampling=1000,
    )
    rows = parse_netflow(pkt, EXP)
    assert len(rows) == 2
    r = rows[0]
    assert r["SrcAddr"] == ip16(b"\x0a\x00\x00\x01") and len(r["SrcAddr"]) == 16
    assert (r["SrcPort"], r["DstPort"], r["Proto"]) == (1234, 53, 17)
    assert (r["Bytes"], r["Packets"]) == (300, 2)
    assert (r["SrcAS"], r["DstAS"], r["SrcNetMask"], r["DstNetMask"]) == (65001, 65002, 8, 24)
    assert r["SamplingRate"] == 1000 and r["EType"] == ETYPE_IPV4
    assert r["TimeReceived"] == 1700000000  # header unix_secs
    assert rows[1]["TCPFlags"] == 0x18


# ---- NetFlow v9 ----------------------------------------------------------


def test_netflow_v9_template_then_data():
    cache = TemplateCache()
    rows = parse_netflow(build_v9([v9_template(), v9_data()]), EXP, cache=cache)
    assert len(rows) == 1
    r = rows[0]
    assert r["SrcAddr"] == ip16(b"\x0a\x00\x00\x01")
    assert (r["SrcPort"], r["DstPort"], r["Proto"]) == (40000, 443, 6)
    assert (r["Bytes"], r["Packets"], r["InIf"], r["OutIf"]) == (1500, 3, 10, 20)
    assert (r["SrcAS"], r["DstAS"], r["TCPFlags"]) == (65001, 65002, 0x12)
    assert r["EType"] == ETYPE_IPV4 and r["TimeReceived"] == 1700000100


def test_netflow_v9_data_without_template_dropped():
    cache = TemplateCache()
    rows = parse_netflow(build_v9([v9_data()]), EXP, cache=cache)
    assert rows == [] and cache.missing == 1
    # template arrives in a later datagram; same exporter+domain
    parse_netflow(build_v9([v9_template()]), EXP, cache=cache)
    assert len(parse_netflow(build_v9([v9_data()]), EXP, cache=cache)) == 1


def test_netflow_v9_template_scoped_by_domain_and_exporter():
    cache = TemplateCache()
    parse_netflow(build_v9([v9_template()], domain=1), EXP, cache=cache)
    assert parse_netflow(build_v9([v9_data()], domain=2), EXP, cache=cache) == []
    assert parse_netflow(build_v9([v9_data()], domain=1), b"\x0a\x00\x00\x99", cache=cache) == []
    assert len(parse_netflow(build_v9([v9_data()], domain=1), EXP, cache=cache)) == 1


def test_netflow_v9_options_sampling():
    cache = TemplateCache()
    # options template: scope (IE1=System, 4B) + option samplingInterval(34, 4B)
    opt_tpl = v9_flowset(1, struct.pack(">HHH", 300, 4, 4) + struct.pack(">HHHH", 1, 4, 34, 4))
    opt_data = v9_flowset(300, struct.pack(">II", 1, 2048))
    parse_netflow(build_v9([opt_tpl, opt_data, v9_template()]), EXP, cache=cache)
    assert cache.sampling[(EXP, 0)] == 2048
    rows = parse_netflow(build_v9([v9_data()]), EXP, cache=cache)
    assert rows[0]["SamplingRate"] == 2048


def test_ipfix_v6_and_enterprise_and_varlen():
    cache = TemplateCache()
    # template 256: v6 src/dst, ports, proto, bytes, one enterprise IE
    # (skipped), one variable-length IE (skipped)
    fields = struct.pack(">HH", 256, 7)
    for ie, ln in [(27, 16), (28, 16), (7, 2), (11, 2), (4, 1), (1, 4)]:
        fields += struct.pack(">HH", ie, ln)
    fields += struct.pack(">HHI", 0x8000 | 100, 0xFFFF, 29305)  # PEN field, varlen
    tpl = struct.pack(">HH", 2, 4 + len(fields)) + fields
    src = bytes.fromhex("20010db8000000000000000000000001")
    dst = bytes.fromhex("20010db8000000000000000000000002")
    rec = src + dst + struct.pack(">HHBI", 5353, 5353, 17, 240) + bytes([3]) + b"xyz"
    data = struct.pack(">HH", 256, 4 + len(rec)) + rec
    rows = parse_netflow(build_ipfix([tpl, data]), EXP, cache=cache)
    assert len(rows) == 1
    r = rows[0]
    assert r["SrcAddr"] == src and r["DstAddr"] == dst
    assert r["EType"] == ETYPE_IPV6 and r["Proto"] == 17 and r["Bytes"] == 240
    assert r["TimeReceived"] == 1700000200


# ---- sFlow ---------------------------------------------------------------


def eth_ipv4_tcp(src4, dst4, sp, dp, flags=0x10, vlan=None):
    eth = b"\xaa" * 6 + b"\xbb" * 6
    if vlan is not None:
        eth += struct.pack(">HH", 0x8100, vlan)
    eth += struct.pack(">H", ETYPE_IPV4)
    ip = bytes([0x45, 0]) + struct.pack(">H", 1480) + b"\0\0\0\0" + bytes([64, 6]) \
        + b"\0\0" + src4 + dst4
    tcp = struct.pack(">HH", sp, dp) + b"\0" * 9 + bytes([flags]) + b"\0\0"
    return eth + ip + tcp


def sflow_record(fmt, body):
    return struct.pack(">II", fmt, len(body)) + body


def sflow_sample(records, rate=512, inif=5, outif=7):
    body = struct.pack(">IIIII", 1, 1, rate, 100000, 0)  # seq, source_id, rate, pool, drops
    body += struct.pack(">II", inif, outif)
    body += struct.pack(">I", len(records)) + b"".join(records)
    return struct.pack(">II", 1, len(body)) + body


def build_sflow(samples, agent4=EXP):
    hdr = struct.pack(">II", 5, 1) + agent4 + struct.pack(">IIII", 0, 9, 1000, len(samples))
    return hdr + b"".join(samples)


def test_sflow_raw_header_and_gateway():
    hdr = eth_ipv4_tcp(b"\x0a\x01\x02\x03", b"\xcb\x00\x71\x05", 40001, 443, vlan=120)
    raw = struct.pack(">IIII", 1, 1518, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)
    gw = ip16(b"\x0a\x00\x00\xfe")  # next hop, v6-typed address
    gw_body = (
        struct.pack(">I", 2) + gw                      # next-hop (type 2 = v6 form)
        + struct.pack(">III", 65000, 65010, 65011)     # as, src_as, src_peer_as
        + struct.pack(">I", 1)                         # n segments
        + struct.pack(">II", 2, 2)                     # AS-SEQUENCE, 2 ASNs
        + struct.pack(">II", 64500, 64510)
        + struct.pack(">I", 1) + struct.pack(">I", (65000 << 16) | 100)  # communities
        + struct.pack(">I", 100)                       # localpref
    )
    sw_body = struct.pack(">IIII", 120, 0, 130, 0)
    pkt = build_sflow([sflow_sample([
        sflow_record(1, raw),
        sflow_record(1001, sw_body),
        sflow_record(1003, gw_body),
    ])])
    rows = parse_sflow(pkt, b"\x00" * 4)
    assert len(rows) == 1
    r = rows[0]
    assert r["ExporterAddress"] == ip16(EXP)  # agent address wins
    assert r["SrcAddr"] == ip16(b"\x0a\x01\x02\x03")
    assert (r["SrcPort"], r["DstPort"], r["Proto"]) == (40001, 443, 6)
    # Bytes = the IP header total length (helpers.go ParseIPv4),
    # not the sampled frame length
    assert (r["Bytes"], r["Packets"], r["SamplingRate"]) == (1480, 1, 512)
    assert (r["InIf"], r["OutIf"]) == (5, 7)
    assert (r["SrcVlan"], r["DstVlan"]) == (120, 130)
    assert r["EType"] == ETYPE_IPV4 and r["TCPFlags"] == 0x10
    assert r["DstASPath"] == [64500, 64510] and r["DstAS"] == 64510
    assert r["DstCommunities"] == [(65000 << 16) | 100]
    assert r["SrcAS"] == 65010 and r["NextHop"] == gw


def test_sflow_ipv6_header():
    src = bytes.fromhex("20010db8000100000000000000000009")
    dst = bytes.fromhex("20010db8000200000000000000000001")
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV6)
    ip6 = struct.pack(">I", 0x60000000) + struct.pack(">HBB", 80, 17, 64) + src + dst
    udp = struct.pack(">HH", 5353, 53) + b"\0\0\0\0"
    hdr = eth + ip6 + udp
    raw = struct.pack(">IIII", 1, 200, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)
    rows = parse_sflow(build_sflow([sflow_sample([sflow_record(1, raw)])]), b"\0" * 4)
    r = rows[0]
    assert r["EType"] == ETYPE_IPV6 and r["SrcAddr"] == src and r["DstAddr"] == dst
    assert (r["SrcPort"], r["DstPort"], r["Proto"]) == (5353, 53, 17)


def _ipv4_hdr(src4, dst4, proto, payload_len=100):
    return bytes([0x45, 0]) + struct.pack(">H", payload_len) + b"\0\0\0\0" \
        + bytes([64, proto]) + b"\0\0" + src4 + dst4


def _sflow_one(hdr_bytes):
    raw = struct.pack(">IIII", 1, 1400, 4, len(hdr_bytes)) + hdr_bytes \
        + b"\0" * ((-len(hdr_bytes)) % 4)
    return build_sflow([sflow_sample([sflow_record(1, raw)])])


def test_sflow_decap_gre():
    inner = _ipv4_hdr(b"\x0a\x09\x09\x01", b"\x0a\x09\x09\x02", 6) \
        + struct.pack(">HH", 8080, 443) + b"\0" * 9 + bytes([0x02]) + b"\0\0"
    gre = struct.pack(">HH", 0x2000, ETYPE_IPV4) + struct.pack(">I", 0xBEEF) + inner  # key flag
    outer = _ipv4_hdr(b"\xc0\x00\x02\x01", b"\xc0\x00\x02\x02", 47) + gre
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV4) + outer
    pkt = _sflow_one(eth)
    # without decap: outer addresses, proto GRE
    r0 = parse_sflow(pkt, b"\0" * 4)[0]
    assert r0["Proto"] == 47 and r0["SrcAddr"] == ip16(b"\xc0\x00\x02\x01")
    # with decap: inner TCP flow
    r1 = parse_sflow(pkt, b"\0" * 4, decapsulate=True)[0]
    assert r1["Proto"] == 6 and r1["SrcAddr"] == ip16(b"\x0a\x09\x09\x01")
    assert (r1["SrcPort"], r1["DstPort"], r1["TCPFlags"]) == (8080, 443, 0x02)


def test_sflow_decap_ipip_and_vxlan():
    # IPIP: v4 in v4
    inner = _ipv4_hdr(b"\x0a\x01\x01\x01", b"\x0a\x02\x02\x02", 17) \
        + struct.pack(">HH", 53, 5353) + b"\0\0\0\0"
    outer = _ipv4_hdr(b"\xc0\x00\x02\x09", b"\xc0\x00\x02\x0a", 4) + inner
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV4) + outer
    r = parse_sflow(_sflow_one(eth), b"\0" * 4, decapsulate=True)[0]
    assert r["SrcAddr"] == ip16(b"\x0a\x01\x01\x01") and r["SrcPort"] == 53

    # VXLAN: UDP/4789 + VXLAN + inner Ethernet + v6 UDP
    src6 = bytes.fromhex("20010db8000000000000000000000031")
    dst6 = bytes.fromhex("20010db8000000000000000000000032")
    inner_ip6 = struct.pack(">I", 0x60000000) + struct.pack(">HBB", 20, 17, 64) + src6 + dst6
    inner_udp = struct.pack(">HH", 1111, 2222) + b"\0\0\0\0"
    inner_eth = b"\xcc" * 6 + b"\xdd" * 6 + struct.pack(">H", ETYPE_IPV6) + inner_ip6 + inner_udp
    vxlan = struct.pack(">II", 0x08000000, 42 << 8)
    udp = struct.pack(">HHHH", 55555, 4789, 0, 0)
    outer = _ipv4_hdr(b"\xc0\x00\x02\x0b", b"\xc0\x00\x02\x0c", 17) + udp + vxlan + inner_eth
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV4) + outer
    r = parse_sflow(_sflow_one(eth), b"\0" * 4, decapsulate=True)[0]
    assert r["EType"] == ETYPE_IPV6 and r["SrcAddr"] == src6
    assert (r["SrcPort"], r["DstPort"], r["Proto"]) == (1111, 2222, 17)


def test_sflow_decap_srv6():
    # outer IPv6 + SRH (2 segments) + inner IPv4 TCP
    o_src = bytes.fromhex("20010db8ffff00000000000000000001")
    o_dst = bytes.fromhex("20010db8ffff00000000000000000002")
    inner = _ipv4_hdr(b"\x0a\x07\x07\x01", b"\x0a\x07\x07\x02", 6) \
        + struct.pack(">HH", 5000, 22) + b"\0" * 9 + bytes([0x18]) + b"\0\0"
    srh = bytes([4, 4, 4, 1]) + b"\0\0\0\0" + b"\x11" * 16 + b"\x22" * 16  # nxt=IPIP
    outer6 = struct.pack(">I", 0x60000000) + struct.pack(">HBB", len(srh) + len(inner), 43, 64) \
        + o_src + o_dst
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV6) + outer6 + srh + inner
    r = parse_sflow(_sflow_one(eth), b"\0" * 4, decapsulate=True)[0]
    assert r["EType"] == ETYPE_IPV4 and r["SrcAddr"] == ip16(b"\x0a\x07\x07\x01")
    assert (r["SrcPort"], r["DstPort"], r["Proto"]) == (5000, 22, 6)
    # without decap the outer v6 flow is reported
    r0 = parse_sflow(_sflow_one(eth), b"\0" * 4)[0]
    assert r0["Proto"] == 43 and r0["SrcAddr"] == o_src


# ---- Spark integration ---------------------------------------------------


def test_decode_binary_netflow_end_to_end(spark):
    from akvorado_spark.sources.decode import RAW_FLOW_SCHEMA, decode_binary
    from akvorado_spark.sources.wire import WIRE_SCHEMA

    pkts = [
        build_v9([v9_template(), v9_data()]),
        build_v5([dict(src=b"\x0a\x00\x00\x09", dst=b"\x0a\x00\x00\x08", sp=80, dp=2000,
                       bytes=555, pkts=5)]),
    ]
    raw = spark.createDataFrame(
        [(None, p, EXP, "netflow", "udp", "none", False, 0) for p in pkts], RAW_FLOW_SCHEMA
    ).repartition(1)  # template must precede data within a task
    out = decode_binary(raw, WIRE_SCHEMA, "netflow", netflow_batch_parser())
    rows = {r["Bytes"]: r for r in out.collect()}
    assert set(rows) == {1500, 555}
    assert rows[1500]["DstPort"] == 443 and rows[555]["Packets"] == 5
    assert all(len(r["ExporterAddress"]) == 16 for r in rows.values())


def test_decode_binary_sflow_end_to_end(spark):
    from akvorado_spark.sources.decode import RAW_FLOW_SCHEMA, decode_binary
    from akvorado_spark.sources.wire import WIRE_SCHEMA

    hdr = eth_ipv4_tcp(b"\x0a\x00\x00\x01", b"\x0a\x00\x00\x02", 1, 2)
    raw_rec = struct.pack(">IIII", 1, 999, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)
    pkt = build_sflow([sflow_sample([sflow_record(1, raw_rec)])])
    raw = spark.createDataFrame([(None, pkt, EXP, "sflow", "udp", "none", False, 0)], RAW_FLOW_SCHEMA)
    rows = decode_binary(raw, WIRE_SCHEMA, "sflow", sflow_batch_parser()).collect()
    assert len(rows) == 1 and rows[0]["Bytes"] == 1480 and rows[0]["SamplingRate"] == 512


def test_nonstrict_parser_survives_garbage():
    from akvorado_spark.sources.wire import DecodeErrors, netflow_batch_parser

    good = build_v5([dict(src=b"\x0a\x00\x00\x01", dst=b"\x0a\x00\x00\x02", bytes=321)])
    errs = DecodeErrors()
    parse = netflow_batch_parser(strict=False, errors=errs)
    out = parse(
        [good, b"\x00\x09garbage", b"", good[:20]],  # bad version / empty / truncated
        [EXP] * 4,
    )
    assert list(out["Bytes"]) == [321]
    assert errs.count == 3 and errs.last


def test_strict_parser_raises_on_garbage(spark):
    import pytest

    from akvorado_spark.sources.wire import netflow_batch_parser

    with pytest.raises(Exception):
        netflow_batch_parser()([b"\x00\x09garbage"], [EXP])


# ---- template state persistence (outlet/flow/persist_test.go) ------------


def test_template_state_save_and_restore(tmp_path):
    """persist_test.go:23-92 TestSaveAndRestore: decode a template
    datagram, save state, then a FRESH cache restored from disk must
    decode a data-only datagram."""
    from akvorado_spark.sources.wire import (
        restore_template_cache,
        save_template_cache,
    )

    state = tmp_path / "state"
    cache = TemplateCache()
    parse_netflow(build_v9([v9_template()]), EXP, cache=cache)
    # sampling state persists too (TestMarshalUnmarshalTemplates
    # roundtrips SetSamplingRate alongside the templates)
    cache.sampling[(EXP, 0)] = 1024
    save_template_cache(cache, str(state))

    cache2 = restore_template_cache(str(state))
    assert cache2.templates == cache.templates
    assert cache2.sampling == cache.sampling
    rows = parse_netflow(build_v9([v9_data()]), EXP, cache=cache2)
    assert len(rows) == 1 and rows[0]["SrcPort"] == 40000
    assert rows[0]["SamplingRate"] == 1024


def test_template_state_corrupted_file(tmp_path):
    """persist_test.go:94-115: garbage on disk must not fail startup —
    restore yields an empty cache (load raises for callers that care)."""
    import pytest

    from akvorado_spark.sources.wire import (
        TemplateStateError,
        load_template_cache,
        restore_template_cache,
    )

    state = tmp_path / "state"
    state.write_bytes(b"\x00\x01garbage")
    with pytest.raises(TemplateStateError):
        load_template_cache(str(state))
    assert restore_template_cache(str(state)).templates == {}
    assert restore_template_cache(str(tmp_path / "missing")).templates == {}


def test_template_state_version_mismatch(tmp_path):
    """persist_test.go:117-154: a valid file from another state
    version restores empty instead of misreading it."""
    import json

    import pytest

    from akvorado_spark.sources.wire import (
        TemplateStateError,
        load_template_cache,
        restore_template_cache,
    )

    state = tmp_path / "state"
    state.write_text(json.dumps({"version": 99, "templates": [], "sampling": []}))
    with pytest.raises(TemplateStateError):
        load_template_cache(str(state))
    assert restore_template_cache(str(state)).templates == {}


# ---- extended field decode parity (outlet/flow/decoder/netflow/root_test.go)


def ipfix_template(tid, fields, options=False, nscope=0):
    """fields: list of (ie, len) — ie may be ("pen", pen, base_ie)."""
    body = struct.pack(">HHH" if options else ">HH", tid, len(fields), nscope) \
        if options else struct.pack(">HH", tid, len(fields))
    for f in fields:
        if isinstance(f[0], tuple):
            _tag, pen, ie = f[0]
            body += struct.pack(">HHI", 0x8000 | ie, f[1], pen)
        else:
            body += struct.pack(">HH", f[0], f[1])
    pad = (-len(body)) % 4
    return struct.pack(">HH", 3 if options else 2, 4 + len(body) + pad) + body + b"\0" * pad


def ipfix_data(tid, body):
    pad = (-len(body)) % 4
    return struct.pack(">HH", tid, 4 + len(body) + pad) + body + b"\0" * pad


def test_decode_icmp_fields_and_heuristic():
    """root_test.go:423-503 TestDecodeICMP: explicit icmpTypeCode IEs
    win; without them, an ICMP flow with srcPort=0 decodes dstPort as
    type<<8|code (the Cisco NFv5-era encoding)."""
    cache = TemplateCache()
    # template: proto, srcport, dstport, icmpTypeCodeIPv4
    tpl = v9_flowset(0, struct.pack(">HH", 260, 4)
                     + struct.pack(">HHHHHHHH", 4, 1, 7, 2, 11, 2, 32, 2))
    data = v9_flowset(260, bytes([1]) + struct.pack(">HHH", 0, 0, 0x0B00))
    rows = parse_netflow(build_v9([tpl, data]), EXP, cache=cache)
    assert rows[0]["ICMPv4Type"] == 11 and rows[0]["ICMPv4Code"] == 0

    # heuristic: no ICMP IE, srcPort 0, dstPort 0x0303 → type 3 code 3
    tpl2 = v9_flowset(0, struct.pack(">HH", 261, 3)
                      + struct.pack(">HHHHHH", 4, 1, 7, 2, 11, 2))
    data2 = v9_flowset(261, bytes([1]) + struct.pack(">HH", 0, 0x0303))
    rows = parse_netflow(build_v9([tpl2, data2]), EXP, cache=cache)
    assert rows[0]["ICMPv4Type"] == 3 and rows[0]["ICMPv4Code"] == 3
    # ICMPv6 (proto 58) lands on the v6 columns
    data3 = v9_flowset(261, bytes([58]) + struct.pack(">HH", 0, 0x8000))
    rows = parse_netflow(build_v9([data3]), EXP, cache=cache)
    assert rows[0]["ICMPv6Type"] == 128 and rows[0]["ICMPv4Type"] is None


def test_decode_mpls_labels():
    """root_test.go:572-631 TestDecodeMPLS: label stack sections,
    bottom 4 bits stripped, zero labels skipped."""
    cache = TemplateCache()
    tpl = v9_flowset(0, struct.pack(">HH", 262, 4)
                     + struct.pack(">HHHHHHHH", 70, 3, 71, 3, 72, 3, 73, 3))
    lbl = lambda v: (v << 4).to_bytes(3, "big")  # noqa: E731
    data = v9_flowset(262, lbl(1000) + lbl(2000) + lbl(0) + lbl(3000))
    rows = parse_netflow(build_v9([tpl, data]), EXP, cache=cache)
    assert rows[0]["MPLSLabels"] == [1000, 2000, 3000]


def test_decode_nat_and_l2_and_misc():
    """root_test.go:759-837 TestDecodeNAT + L2/misc branches
    (decode.go:296-341): post-NAT addresses/ports, MACs, VLAN
    fill-if-unset, TTL/ToS/fragment fields."""
    cache = TemplateCache()
    fields = [(225, 4), (226, 4), (227, 2), (228, 2),   # NAT
              (56, 6), (80, 6),                          # MACs
              (58, 2), (243, 2),                         # vlan + dot1q
              (192, 1), (5, 1), (54, 4), (88, 2)]        # ttl/tos/frag
    tpl = v9_flowset(0, struct.pack(">HH", 263, len(fields))
                     + b"".join(struct.pack(">HH", ie, ln) for ie, ln in fields))
    body = (bytes([192, 0, 2, 1]) + bytes([203, 0, 113, 9])
            + struct.pack(">HH", 4096, 8080)
            + bytes.fromhex("00e01c3c17c2") + bytes.fromhex("001f33d98160")
            + struct.pack(">HH", 7, 99)   # vlan 7 then dot1q 99 → keeps 7
            + bytes([63]) + bytes([0xB8]) + struct.pack(">IH", 12345, 185))
    rows = parse_netflow(build_v9([tpl, v9_flowset(263, body)]), EXP, cache=cache)
    r = rows[0]
    assert bytes(r["SrcAddrNAT"])[-4:] == bytes([192, 0, 2, 1])
    assert bytes(r["DstAddrNAT"])[-4:] == bytes([203, 0, 113, 9])
    assert (r["SrcPortNAT"], r["DstPortNAT"]) == (4096, 8080)
    assert r["SrcMAC"] == 0x00E01C3C17C2 and r["DstMAC"] == 0x001F33D98160
    assert r["SrcVlan"] == 7  # dot1qVlanId only fills when unset
    assert (r["IPTTL"], r["IPTos"]) == (63, 0xB8)
    assert (r["IPFragmentID"], r["IPFragmentOffset"]) == (12345, 185)


def test_decode_physical_interfaces_fill():
    """root_test.go:796-837 TestDecodePhysicalInterfaces: ingress/
    egressPhysicalInterface fill InIf/OutIf only when the logical
    interface is absent or zero."""
    cache = TemplateCache()
    tpl = v9_flowset(0, struct.pack(">HH", 264, 4)
                     + struct.pack(">HHHHHHHH", 10, 4, 252, 4, 14, 4, 253, 4))
    data = v9_flowset(264, struct.pack(">IIII", 0, 17, 5, 99))
    rows = parse_netflow(build_v9([tpl, data]), EXP, cache=cache)
    assert rows[0]["InIf"] == 17   # logical 0 → physical fills
    assert rows[0]["OutIf"] == 5   # logical set → physical ignored


def test_decode_zero_ip_not_set():
    """decode.go:190-209: an all-zero IPv4 source/destination leaves
    the address unset instead of recording 0.0.0.0."""
    cache = TemplateCache()
    tpl = v9_flowset(0, struct.pack(">HH", 265, 2) + struct.pack(">HHHH", 8, 4, 12, 4))
    data = v9_flowset(265, bytes(4) + bytes([198, 51, 100, 1]))
    rows = parse_netflow(build_v9([tpl, data]), EXP, cache=cache)
    assert rows[0]["SrcAddr"] is None
    assert bytes(rows[0]["DstAddr"])[-4:] == bytes([198, 51, 100, 1])


def test_decode_multiple_sampling_rates():
    """root_test.go:329-421 TestDecodeMultipleSamplingRates: options
    records scoped by sampler id feed per-sampler rates; data records
    select theirs via FLOW_SAMPLER_ID."""
    cache = TemplateCache()
    # v9 options template: scope system (1,4); options samplerId (48,1),
    # samplerRandomInterval (50,4)
    obody = struct.pack(">HHH", 300, 4, 8) + struct.pack(">HHHHHH", 1, 4, 48, 1, 50, 4)
    otpl = v9_flowset(1, obody)
    odata1 = v9_flowset(300, struct.pack(">IBI", 0, 1, 1024) + b"\0")
    odata2 = v9_flowset(300, struct.pack(">IBI", 0, 2, 2048) + b"\0")
    tpl = v9_flowset(0, struct.pack(">HH", 266, 3)
                     + struct.pack(">HHHHHH", 8, 4, 12, 4, 48, 1))
    d1 = v9_flowset(266, bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2]) + bytes([1]))
    d2 = v9_flowset(266, bytes([10, 0, 0, 3]) + bytes([10, 0, 0, 4]) + bytes([2]))
    rows = parse_netflow(build_v9([otpl, odata1, odata2, tpl, d1, d2]), EXP, cache=cache)
    assert [r["SamplingRate"] for r in rows] == [1024, 2048]


def test_decode_timestamp_first_switched():
    """root_test.go:688-757: ts_source="first_switched" stamps flows
    with their own start time — v9 FIRST_SWITCHED against header
    sysuptime, IPFIX flowStartSeconds/Milliseconds."""
    cache = TemplateCache()
    # v9: header sysuptime=60000ms, export=1700000100; flow first=30000ms
    tpl = v9_flowset(0, struct.pack(">HH", 267, 2) + struct.pack(">HHHH", 8, 4, 22, 4))
    data = v9_flowset(267, bytes([10, 0, 0, 1]) + struct.pack(">I", 30_000))
    hdr = struct.pack(">HHIIII", 9, 2, 60_000, 1_700_000_100, 7, 0)
    rows = parse_netflow(hdr + tpl + data, EXP, cache=cache, ts_source="first_switched")
    assert rows[0]["TimeReceived"] == 1_700_000_100 + (30_000 - 60_000) // 1000

    # IPFIX flowStartMilliseconds
    itpl = ipfix_template(268, [(8, 4), (152, 8)])
    idata = ipfix_data(268, bytes([10, 0, 0, 2]) + struct.pack(">Q", 1_700_000_042_500))
    body = itpl + idata
    ihdr = struct.pack(">HHIII", 10, 16 + len(body), 1_700_000_200, 7, 0)
    rows = parse_netflow(ihdr + body, EXP, cache=cache, ts_source="first_switched")
    assert rows[0]["TimeReceived"] == 1_700_000_042


def test_decode_rfc5103_biflow():
    """root_test.go:839-977 TestDecodeRFC5103: PEN 29305 reverse
    fields emit a second, reversed flow with the reverse counters; a
    reverse with zero packets is dropped."""
    cache = TemplateCache()
    fields = [(8, 4), (12, 4), (7, 2), (11, 2), (4, 1), (1, 4), (2, 4),
              (("pen", 29305, 1), 4), (("pen", 29305, 2), 4)]
    tpl = ipfix_template(270, fields)
    rec = (bytes([10, 10, 1, 4]) + bytes([10, 10, 1, 1])
           + struct.pack(">HHB", 56166, 53, 17)
           + struct.pack(">II", 62, 1)      # forward bytes/packets
           + struct.pack(">II", 128, 1))    # reverse bytes/packets
    rec2 = (bytes([10, 10, 1, 20]) + bytes([10, 10, 1, 255])
            + struct.pack(">HHB", 138, 138, 17)
            + struct.pack(">II", 229, 1)
            + struct.pack(">II", 0, 0))     # no reverse traffic
    body = tpl + ipfix_data(270, rec + rec2)
    hdr = struct.pack(">HHIII", 10, 16 + len(body), 1_700_000_300, 7, 0)
    rows = parse_netflow(hdr + body, EXP, cache=cache)
    assert len(rows) == 3  # fwd + rev, then fwd only
    fwd, rev, only = rows
    assert bytes(fwd["SrcAddr"])[-4:] == bytes([10, 10, 1, 4])
    assert (fwd["Bytes"], fwd["Packets"]) == (62, 1)
    assert bytes(rev["SrcAddr"])[-4:] == bytes([10, 10, 1, 1])
    assert bytes(rev["DstAddr"])[-4:] == bytes([10, 10, 1, 4])
    assert (rev["SrcPort"], rev["DstPort"]) == (53, 56166)
    assert (rev["Bytes"], rev["Packets"]) == (128, 1)
    assert bytes(only["SrcAddr"])[-4:] == bytes([10, 10, 1, 20])


def test_templates_and_options_after_data_same_datagram():
    """root_test.go:258-281 TestTemplatesMixedWithData + the
    options-first pass (decode.go:71-103): templates and sampling
    options apply to the WHOLE datagram regardless of set order."""
    cache = TemplateCache()
    obody = struct.pack(">HHH", 301, 4, 8) + struct.pack(">HHHHHH", 1, 4, 48, 1, 50, 4)
    odata = v9_flowset(301, struct.pack(">IBI", 0, 3, 512) + b"\0")
    tpl = v9_flowset(0, struct.pack(">HH", 280, 3)
                     + struct.pack(">HHHHHH", 8, 4, 12, 4, 48, 1))
    data = v9_flowset(280, bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2]) + bytes([3]))
    # data FIRST, then its template, then the options that price it
    pkt = build_v9([data, tpl, v9_flowset(1, obody), odata])
    rows = parse_netflow(pkt, EXP, cache=cache)
    assert len(rows) == 1 and rows[0]["SamplingRate"] == 512
    assert cache.missing == 0


def test_sampling_packet_interval_space():
    """decode.go:91-99: samplingPacketInterval/-Space combine into a
    1-in-N rate, N = (interval + space) / interval."""
    cache = TemplateCache()
    obody = struct.pack(">HHH", 302, 4, 8) + struct.pack(">HH", 1, 4) \
        + struct.pack(">HHHH", 305, 4, 306, 4)
    odata = v9_flowset(302, struct.pack(">III", 0, 1, 999))
    tpl = v9_flowset(0, struct.pack(">HH", 281, 2) + struct.pack(">HHHH", 8, 4, 12, 4))
    data = v9_flowset(281, bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2]))
    rows = parse_netflow(build_v9([v9_flowset(1, obody), odata, tpl, data]), EXP, cache=cache)
    assert rows[0]["SamplingRate"] == 1000


# ---- sFlow parity extensions (sflow/root_test.go, sflow/decode.go) -------


def test_sflow_interface_formats():
    """sflow/decode.go:20-103 + root_test.go local/discard/multiple:
    format 1 output = discard (reason → ForwardingStatus), format 2 =
    multiple (OutIf 0), value 0x3fffffff = local (→ 0)."""
    hdr = eth_ipv4_tcp(b"\x0a\x00\x00\x01", b"\x0a\x00\x00\x02", 1, 2)
    raw = struct.pack(">IIII", 1, 1518, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)

    def sample(inif, outif):
        return build_sflow([sflow_sample([sflow_record(1, raw)],
                                         inif=inif, outif=outif)])

    # discard, reason 3 (icmp_port_unreachable) → Unroutable (131)
    r = parse_sflow(sample(27, (1 << 30) | 3), b"\0" * 4)[0]
    assert (r["InIf"], r["OutIf"], r["ForwardingStatus"]) == (27, 0, 131)
    # unknown discard reason → generic dropped (128)
    r = parse_sflow(sample(27, (1 << 30) | 9999), b"\0" * 4)[0]
    assert r["ForwardingStatus"] == 128
    # multiple output interfaces → 0
    r = parse_sflow(sample(27, (2 << 30) | 5), b"\0" * 4)[0]
    assert (r["OutIf"], r["ForwardingStatus"]) == (0, 0)
    # local interface → 0
    r = parse_sflow(sample(0x3FFFFFFF, 0x3FFFFFFF), b"\0" * 4)[0]
    assert (r["InIf"], r["OutIf"]) == (0, 0)


def test_sflow_raw_header_l2_l3_details():
    """Raw-header parse now yields MACs, TTL, ToS and TCP flags for
    IPv4 and the traffic-class/flow-label pair for IPv6
    (helpers.go ParseEthernet/ParseIPv4/ParseIPv6)."""
    hdr = eth_ipv4_tcp(b"\x0a\x00\x00\x01", b"\x0a\x00\x00\x02", 1, 2, vlan=100)
    raw = struct.pack(">IIII", 1, 1518, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)
    r = parse_sflow(build_sflow([sflow_sample([sflow_record(1, raw)])]), b"\0" * 4)[0]
    assert r["DstMAC"] == 0xAAAAAAAAAAAA and r["SrcMAC"] == 0xBBBBBBBBBBBB
    assert (r["IPTTL"], r["IPTos"]) == (64, 0)
    # the raw-header VLAN fills BOTH directions when unset
    assert (r["SrcVlan"], r["DstVlan"]) == (100, 100)

    src = bytes.fromhex("2a0c8880000200000185002101300038")
    dst = bytes.fromhex("2a0c8880000200000185002101300039")
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV6)
    # version 6, traffic class 8, flow label 426132
    first = (6 << 28) | (8 << 20) | 426132
    ip6 = struct.pack(">I", first) + struct.pack(">HBB", 40, 6, 64) + src + dst
    tcp = struct.pack(">HH", 46026, 22) + b"\0" * 9 + bytes([16]) + b"\0\0"
    raw = struct.pack(">IIII", 1, 1518, 4, len(eth + ip6 + tcp)) + eth + ip6 + tcp \
        + b"\0" * ((-len(eth + ip6 + tcp)) % 4)
    r = parse_sflow(build_sflow([sflow_sample([sflow_record(1, raw)])]), b"\0" * 4)[0]
    assert (r["IPTos"], r["IPTTL"], r["IPv6FlowLabel"]) == (8, 64, 426132)
    assert (r["TCPFlags"], r["Bytes"]) == (16, 80)


def test_sflow_icmp_from_header():
    """root_test.go ICMPv4/ICMPv6 cases: type/code read from the L4
    bytes of the sampled header."""
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV4)
    ip = bytes([0x45, 0]) + struct.pack(">H", 84) + b"\0\0\0\0" + bytes([64, 1]) \
        + b"\0\0" + bytes([10, 0, 0, 1]) + bytes([10, 0, 0, 2])
    icmp = bytes([8, 0]) + b"\0\0"  # echo request
    hdr = eth + ip + icmp
    raw = struct.pack(">IIII", 1, 98, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)
    r = parse_sflow(build_sflow([sflow_sample([sflow_record(1, raw)])]), b"\0" * 4)[0]
    assert (r["ICMPv4Type"], r["ICMPv4Code"]) == (8, 0)


def test_sflow_sampled_ipv4_and_ethernet_records():
    """root_test.go "flow sample with IPv4 data" / "sampled ethernet":
    pre-parsed record types carry addresses/MACs without a raw
    header (sflow/decode.go:138-180)."""
    ip4 = (struct.pack(">I", 1400) + struct.pack(">I", 6)
           + bytes([10, 1, 1, 1]) + bytes([10, 1, 1, 2])
           + struct.pack(">II", 8080, 443) + struct.pack(">II", 0x10, 0xB8))
    eth = (struct.pack(">I", 1416)
           + bytes.fromhex("00e01c3c17c2") + b"\0\0"
           + bytes.fromhex("001f33d98160") + b"\0\0" + struct.pack(">I", 0x0800))
    pkt = build_sflow([sflow_sample([sflow_record(2, eth), sflow_record(3, ip4)])])
    r = parse_sflow(pkt, b"\0" * 4)[0]
    assert bytes(r["SrcAddr"])[-4:] == bytes([10, 1, 1, 1])
    assert (r["SrcPort"], r["DstPort"], r["Proto"]) == (8080, 443, 6)
    assert (r["Bytes"], r["IPTos"], r["EType"]) == (1400, 0xB8, ETYPE_IPV4)
    assert r["SrcMAC"] == 0x00E01C3C17C2 and r["DstMAC"] == 0x001F33D98160


def test_sflow_mpls_header():
    """helpers.go:228-295: MPLS label stack in the sampled header —
    labels collected (>>4 of the 20-bit label), payload found via the
    bottom-of-stack nibble heuristic."""
    eth = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", 0x8847)
    mpls = (100 << 12 | 0).to_bytes(4, "big") + (200 << 12 | 0x100).to_bytes(4, "big")
    ip = bytes([0x45, 0]) + struct.pack(">H", 120) + b"\0\0\0\0" + bytes([64, 17]) \
        + b"\0\0" + bytes([10, 2, 2, 1]) + bytes([10, 2, 2, 2])
    udp = struct.pack(">HH", 53, 5353) + b"\0\0\0\0"
    hdr = eth + mpls + ip + udp
    raw = struct.pack(">IIII", 1, 200, 4, len(hdr)) + hdr + b"\0" * ((-len(hdr)) % 4)
    r = parse_sflow(build_sflow([sflow_sample([sflow_record(1, raw)])]), b"\0" * 4)[0]
    assert r["MPLSLabels"] == [100, 200]
    assert bytes(r["SrcAddr"])[-4:] == bytes([10, 2, 2, 1])
    assert (r["Proto"], r["Bytes"]) == (17, 120)


def test_ipfix_datalink_frame_section():
    """RFC 7133 / root_test.go:505-552 TestDecodeDataLink + the
    EVPN/VXLAN tests: IE 315 carries a raw Ethernet frame that
    decodes like a sampled sFlow header — and under decapsulation a
    non-encapsulated frame drops the record."""
    cache = TemplateCache()
    tpl = ipfix_template(290, [(315, 0xFFFF)])
    frame = eth_ipv4_tcp(b"\x0a\x05\x05\x01", b"\x0a\x05\x05\x02", 4000, 443)
    rec = bytes([len(frame)]) + frame  # varlen, short form
    body = tpl + ipfix_data(290, rec)
    hdr = struct.pack(">HHIII", 10, 16 + len(body), 1_700_000_400, 7, 0)
    rows = parse_netflow(hdr + body, EXP, cache=cache)
    r = rows[0]
    assert bytes(r["SrcAddr"])[-4:] == bytes([10, 5, 5, 1])
    assert (r["SrcPort"], r["DstPort"], r["Bytes"], r["Packets"]) == (4000, 443, 1480, 1)
    assert r["SrcMAC"] == 0xBBBBBBBBBBBB
    # decap requested but the frame holds a plain TCP flow → dropped
    assert parse_netflow(hdr + body, EXP, cache=cache, decapsulate=True) == []

    # VXLAN-encapsulated frame under decap yields the inner flow
    src6 = bytes.fromhex("20010db8000000000000000000000041")
    dst6 = bytes.fromhex("20010db8000000000000000000000042")
    inner_ip6 = struct.pack(">I", 0x60000000) + struct.pack(">HBB", 20, 17, 64) + src6 + dst6
    inner_udp = struct.pack(">HH", 1111, 2222) + b"\0\0\0\0"
    inner_eth = b"\xcc" * 6 + b"\xdd" * 6 + struct.pack(">H", ETYPE_IPV6) + inner_ip6 + inner_udp
    vxlan = struct.pack(">II", 0x08000000, 42 << 8)
    udp = struct.pack(">HHHH", 55555, 4789, 0, 0)
    outer_ip = bytes([0x45, 0]) + struct.pack(">H", 200) + b"\0\0\0\0" + bytes([64, 17]) \
        + b"\0\0" + bytes([192, 0, 2, 1]) + bytes([192, 0, 2, 2])
    outer = b"\xaa" * 6 + b"\xbb" * 6 + struct.pack(">H", ETYPE_IPV4) + outer_ip + udp + vxlan + inner_eth
    rec = bytes([len(outer)]) + outer
    body = tpl + ipfix_data(290, rec)
    hdr = struct.pack(">HHIII", 10, 16 + len(body), 1_700_000_401, 7, 0)
    rows = parse_netflow(hdr + body, EXP, cache=cache, decapsulate=True)
    r = rows[0]
    assert r["SrcAddr"] == src6 and (r["SrcPort"], r["DstPort"]) == (1111, 2222)
    assert r["Bytes"] == 60  # inner v6 payload 20 + 40 header


def test_juniper_cpid_forwarding_status():
    """root_test.go:1116-1160 TestJuniperCPIDDrop: a Juniper
    commonPropertiesId (PEN 2636) whose property type is
    forwardingExceptionCode maps to ForwardingStatus — 64 when the
    code is 0 (forwarded), 128 otherwise (platform drop)."""
    cache = TemplateCache()
    tpl = ipfix_template(295, [(8, 4), (("pen", 2636, 137), 2)])
    def pkt(cpid):
        body = tpl + ipfix_data(295, bytes([10, 0, 0, 1]) + struct.pack(">H", cpid))
        return struct.pack(">HHIII", 10, 16 + len(body), 1_700_000_500, 7, 0) + body
    # type 2 (forwardingException), code 5 → dropped
    r = parse_netflow(pkt((0x02 << 10) | 5), EXP, cache=cache)[0]
    assert r["ForwardingStatus"] == 128
    # type 2, code 0 → forwarded
    r = parse_netflow(pkt(0x02 << 10), EXP, cache=cache)[0]
    assert r["ForwardingStatus"] == 64
    # another property type → untouched
    r = parse_netflow(pkt((0x01 << 10) | 5), EXP, cache=cache)[0]
    assert r["ForwardingStatus"] is None
