"""Demo-exporter NetFlow v9 *encode* → production *decode* roundtrip.

Mirrors the reference's wire tests, which feed the demo exporter's
generated datagrams to the real NetFlow decoder and diff the decoded
flow messages (demoexporter/flows/nfdata_test.go:20-192,
nftemplates_test.go)."""

import ipaddress
import struct

import pytest

from akvorado_spark.sources.nf_encode import (
    ETYPE_IPV4,
    ETYPE_IPV6,
    MAX_FLOWS_PER_PACKET,
    GeneratedFlow,
    demo_packets,
    netflow_data_packets,
    netflow_templates_packet,
)
from akvorado_spark.sources.wire import TemplateCache, ip16, parse_netflow

EXPORTER = ipaddress.ip_address("127.0.0.1").packed

# The three flows of nfdata_test.go:50-109.
FLOWS = [
    GeneratedFlow(
        src_addr="192.0.2.206", dst_addr="203.0.113.165", etype=ETYPE_IPV4,
        octets=1500, packets=1, proto=6, src_port=443, dst_port=34974,
        input_int=10, output_int=20, src_as=65201, dst_as=65202,
        forward_status=64, src_mask=24, dst_mask=23,
    ),
    GeneratedFlow(
        src_addr="2001:db8::1", dst_addr="2001:db8:2:0:cea5:d643:ec43:3772",
        etype=ETYPE_IPV6,
        octets=1300, packets=1, proto=6, src_port=33179, dst_port=443,
        input_int=20, output_int=10, src_as=65201, dst_as=65202,
        forward_status=64, src_mask=48, dst_mask=48,
    ),
    GeneratedFlow(
        src_addr="192.0.2.236", dst_addr="203.0.113.67", etype=ETYPE_IPV4,
        octets=1339, packets=1, proto=6, src_port=443, dst_port=33199,
        input_int=10, output_int=20, src_as=65201, dst_as=65202,
        forward_status=64, src_mask=24, dst_mask=24, flow_direction=1,
    ),
]

START = 1647354780  # 2022-03-15 14:33:00 UTC
TPL_NOW = START + 3600
DATA_NOW = START + 7200


def _decode_all():
    cache = TemplateCache()
    rows = list(parse_netflow(
        netflow_templates_packet(50, 30000, START, TPL_NOW), EXPORTER, cache=cache))
    for pkt in netflow_data_packets(FLOWS, 100, START, DATA_NOW):
        rows += parse_netflow(pkt, EXPORTER, cache=cache)
    return rows


def test_roundtrip_matches_reference_expectations():
    """nfdata_test.go:120-187 — decoded field-for-field expectations."""
    rows = _decode_all()
    assert len(rows) == 3  # template/options records produce no flow rows
    # v4 flows packetize first (both fit one packet), then the v6 flow —
    # same order as the reference's `expected` list.
    expected = [
        dict(SrcAddr="::ffff:192.0.2.206", DstAddr="::ffff:203.0.113.165",
             EType=ETYPE_IPV4, Bytes=1500, SrcPort=443, DstPort=34974,
             InIf=10, OutIf=20, SrcNetMask=24, DstNetMask=23, FlowDirection=0),
        dict(SrcAddr="::ffff:192.0.2.236", DstAddr="::ffff:203.0.113.67",
             EType=ETYPE_IPV4, Bytes=1339, SrcPort=443, DstPort=33199,
             InIf=10, OutIf=20, SrcNetMask=24, DstNetMask=24, FlowDirection=1),
        dict(SrcAddr="2001:db8::1", DstAddr="2001:db8:2:0:cea5:d643:ec43:3772",
             EType=ETYPE_IPV6, Bytes=1300, SrcPort=33179, DstPort=443,
             InIf=20, OutIf=10, SrcNetMask=48, DstNetMask=48, FlowDirection=0),
    ]
    for row, want in zip(rows, expected):
        assert row["SamplingRate"] == 30000  # options record arrived first
        assert row["ExporterAddress"] == ip16(EXPORTER)
        assert row["Packets"] == 1
        assert row["SrcAS"] == 65201 and row["DstAS"] == 65202
        assert row["ForwardingStatus"] == 64
        assert row["Proto"] == 6
        for col, val in want.items():
            got = row[col]
            if col.endswith("Addr"):
                addr = ipaddress.ip_address(got)
                mapped = getattr(addr, "ipv4_mapped", None)
                got = f"::ffff:{mapped}" if mapped else str(addr)
            assert got == val, (col, got, val)


def test_template_packet_structure():
    """nftemplates.go:106-181 — header count, flowset ids and lengths."""
    pkt = netflow_templates_packet(50, 30000, START, TPL_NOW)
    version, count, uptime, unix_secs, seq, domain = struct.unpack_from(">HHIIII", pkt, 0)
    assert (version, count, seq, domain) == (9, 4, 50, 0)
    assert uptime == 3600 and unix_secs == TPL_NOW
    sets = []
    off = 20
    while off + 4 <= len(pkt):
        sid, slen = struct.unpack_from(">HH", pkt, off)
        sets.append((sid, slen))
        off += slen
    assert off == len(pkt)
    # two data templates (18 fields each: 8 + 18*4 = 80), the options
    # template (26) and the unpadded 15-byte options data record.
    assert sets == [(0, 80), (0, 80), (1, 26), (262, 15)]


def test_packetization_bounds():
    """nftemplates.go:99-100 — 1400-byte budget: 27 v4 / 18 v6 flows."""
    assert MAX_FLOWS_PER_PACKET[ETYPE_IPV4] == 1400 // 51 == 27
    assert MAX_FLOWS_PER_PACKET[ETYPE_IPV6] == 1400 // 75 == 18
    v4 = [GeneratedFlow(src_addr="192.0.2.1", dst_addr="192.0.2.2", octets=100)
          for _ in range(30)]
    v6 = [GeneratedFlow(src_addr="2001:db8::1", dst_addr="2001:db8::2",
                        etype=ETYPE_IPV6, octets=100) for _ in range(20)]
    pkts = netflow_data_packets(v4 + v6, 7, START, DATA_NOW)
    counts = [struct.unpack_from(">HH", p, 0)[1] for p in pkts]
    assert counts == [27, 3, 18, 2]
    # sequence numbers advance per packet (nfdata.go:82)
    seqs = [struct.unpack_from(">I", p, 12)[0] for p in pkts]
    assert seqs == [7, 8, 9, 10]


def test_wrong_family_rejected():
    with pytest.raises(ValueError):
        netflow_data_packets(
            [GeneratedFlow(src_addr="2001:db8::1", dst_addr="192.0.2.1")],
            0, START, DATA_NOW)


def test_demo_frame_encodes_and_decodes_losslessly():
    """generate → encode → decode: every flow survives with its byte
    count, adresses and sampling rate intact (the e2e path the demo
    exporter exercises against the collector)."""
    from akvorado_spark.sources.fixtures import DemoFlowConfig, demo_flows_pdf

    pdf = demo_flows_pdf(
        [DemoFlowConfig(per_second=2.0, src_net="192.0.2.0/24",
                        dst_net="203.0.113.0/24", protocol=["tcp"],
                        src_port=[443], dst_port=[0], size=1200,
                        in_ifindex=[10], out_ifindex=[20],
                        src_as=[65201], dst_as=[65202]),
         DemoFlowConfig(per_second=1.0, src_net="2001:db8:1::/64",
                        dst_net="2001:db8:2::/64", protocol=["udp"],
                        src_port=[0], dst_port=[443], size=600,
                        in_ifindex=[20], out_ifindex=[10],
                        src_as=[65201], dst_as=[65202])],
        duration_s=60, seed=3, sampling_rate=30000,
    )
    pkts = demo_packets(pdf, sequence=0, sampling=30000, start_ts=START)
    cache = TemplateCache()
    rows = []
    for p in pkts:
        rows += parse_netflow(p, EXPORTER, cache=cache)
    assert len(rows) == len(pdf)
    assert all(r["SamplingRate"] == 30000 for r in rows)
    assert sum(r["Bytes"] for r in rows) == int(pdf.Bytes.sum())
    # family split survives the ipv4/ipv6 re-grouping
    assert (sum(r["EType"] == ETYPE_IPV6 for r in rows)
            == int((pdf.EType == ETYPE_IPV6).sum()))
    # multiset of (src, dst, bytes, ports) is preserved exactly
    def key(src, dst, b, sp, dp):
        return (bytes(src), bytes(dst), int(b), int(sp), int(dp))
    got = sorted(key(r["SrcAddr"], r["DstAddr"], r["Bytes"], r["SrcPort"], r["DstPort"])
                 for r in rows)
    want = sorted(key(s, d, b, sp, dp) for s, d, b, sp, dp in
                  zip(pdf.SrcAddr, pdf.DstAddr, pdf.Bytes, pdf.SrcPort, pdf.DstPort))
    assert got == want
