"""NetFlow v9 *encoder* — the demo exporter's wire side.

The reference demo exporter turns generated flows into real NetFlow v9
datagrams (templates + options-template + data flowsets) and its own
production decoder is what checks them (demoexporter/flows/nftemplates.go,
nfdata.go, nfdata_test.go).  This module is the Spark-repo mirror: it
encodes the same template layout and packetization so the payloads can be
replayed through :mod:`akvorado_spark.sources.wire`'s NetFlow decoder —
closing the generate → encode → decode → enrich loop without a network.

Layout parity (demoexporter/flows/nftemplates.go:24-101):

* template ID 260 = IPv4 flows, 261 = IPv6 flows, 262 = options;
* record layout is src/dst address first, then the shared ``IPFlow``
  block (packets, octets, in/out ifindex, first/last switched, ports,
  ASNs, proto, forwarding status, direction, sampler id, masks);
* packets carry at most ``1400 // record_len`` flows (IPv4: 27,
  IPv6: 18) — the reference sizes for an IPv6 transport MTU;
* the options data record advertises sampler id 1, the configured
  random-sampling interval, and mode 2 (random).

Everything here is driver-side byte twiddling over tiny template
structures; the heavy path (decode) stays in the Arrow-batched
``netflow_batch_parser``.
"""

from __future__ import annotations

import ipaddress
import struct
from dataclasses import dataclass

ETYPE_IPV4 = 0x0800
ETYPE_IPV6 = 0x86DD

# RFC 3954 §8 field types (plus IPFIX flowDirection, RFC 5102 IE 61).
_IN_BYTES = 1
_IN_PKTS = 2
_PROTOCOL = 4
_L4_SRC_PORT = 7
_IPV4_SRC_ADDR = 8
_SRC_MASK = 9
_INPUT_SNMP = 10
_L4_DST_PORT = 11
_IPV4_DST_ADDR = 12
_DST_MASK = 13
_OUTPUT_SNMP = 14
_SRC_AS = 16
_DST_AS = 17
_LAST_SWITCHED = 21
_FIRST_SWITCHED = 22
_IPV6_SRC_ADDR = 27
_IPV6_DST_ADDR = 28
_FLOW_SAMPLER_ID = 48
_FLOW_SAMPLER_MODE = 49
_FLOW_SAMPLER_RANDOM_INTERVAL = 50
_FLOW_DIRECTION = 61
_FORWARDING_STATUS = 89

TEMPLATE_ID_IPV4 = 260
TEMPLATE_ID_IPV6 = 261
TEMPLATE_ID_OPTIONS = 262

# The shared (address-independent) template tail, in wire order
# (nftemplates.go:55-72).
_IP_TEMPLATE: list[tuple[int, int]] = [
    (_IN_PKTS, 4),
    (_IN_BYTES, 4),
    (_INPUT_SNMP, 4),
    (_OUTPUT_SNMP, 4),
    (_FIRST_SWITCHED, 4),
    (_LAST_SWITCHED, 4),
    (_L4_SRC_PORT, 2),
    (_L4_DST_PORT, 2),
    (_SRC_AS, 4),
    (_DST_AS, 4),
    (_PROTOCOL, 1),
    (_FORWARDING_STATUS, 1),
    (_FLOW_DIRECTION, 1),
    (_FLOW_SAMPLER_ID, 2),
    (_SRC_MASK, 1),
    (_DST_MASK, 1),
]

_TEMPLATES: dict[int, list[tuple[int, int]]] = {
    ETYPE_IPV4: [(_IPV4_SRC_ADDR, 4), (_IPV4_DST_ADDR, 4)] + _IP_TEMPLATE,
    ETYPE_IPV6: [(_IPV6_SRC_ADDR, 16), (_IPV6_DST_ADDR, 16)] + _IP_TEMPLATE,
}
_RECORD_LEN = {et: sum(ln for _, ln in t) for et, t in _TEMPLATES.items()}
# Packetization bound for an IPv6 transport (nftemplates.go:99-100).
MAX_FLOWS_PER_PACKET = {et: 1400 // ln for et, ln in _RECORD_LEN.items()}

# The IPFlow struct tail shared by both record layouts (nftemplates.go:36-53):
# packets, octets, input, output, start, end (u32); ports (u16); ASNs (u32);
# proto, fwd-status, direction (u8); sampler id (u16); masks (u8).
_IPFLOW_STRUCT = struct.Struct(">IIIIIIHHIIBBBHBB")


@dataclass
class GeneratedFlow:
    """One demo flow ready for the wire — demoexporter/flows/nftemplates.go:36."""

    src_addr: str
    dst_addr: str
    etype: int = ETYPE_IPV4
    packets: int = 1
    octets: int = 0
    input_int: int = 0
    output_int: int = 0
    src_port: int = 0
    dst_port: int = 0
    src_as: int = 0
    dst_as: int = 0
    proto: int = 6
    forward_status: int = 64
    flow_direction: int = 0
    src_mask: int = 0
    dst_mask: int = 0


def _nfv9_header(count: int, uptime: int, unix_secs: int, sequence: int) -> bytes:
    return struct.pack(">HHIIII", 9, count, uptime & 0xFFFFFFFF,
                       unix_secs & 0xFFFFFFFF, sequence & 0xFFFFFFFF, 0)


def netflow_templates_packet(sequence: int, sampling: int,
                             start_ts: int, now_ts: int) -> bytes:
    """The template datagram: both flow templates, the options template,
    and the options data record carrying the sampling rate
    (demoexporter/flows/nftemplates.go:106-181)."""
    uptime = max(0, now_ts - start_ts)
    out = [_nfv9_header(4, uptime, now_ts, sequence)]
    for etype in (ETYPE_IPV4, ETYPE_IPV6):
        template = _TEMPLATES[etype]
        tid = TEMPLATE_ID_IPV4 if etype == ETYPE_IPV4 else TEMPLATE_ID_IPV6
        out.append(struct.pack(">HH", 0, len(template) * 4 + 8))
        out.append(struct.pack(">HH", tid, len(template)))
        out.extend(struct.pack(">HH", ie, ln) for ie, ln in template)
    # Options template: one 4-byte system scope + (sampler id, interval, mode).
    out.append(struct.pack(">HH", 1, 26))
    out.append(struct.pack(">HHH", TEMPLATE_ID_OPTIONS, 4, 12))
    out.append(struct.pack(">HH", 1, 4))
    out.append(struct.pack(">HH", _FLOW_SAMPLER_ID, 2))
    out.append(struct.pack(">HH", _FLOW_SAMPLER_RANDOM_INTERVAL, 4))
    out.append(struct.pack(">HH", _FLOW_SAMPLER_MODE, 1))
    # Matching options data record (flowset length 15, unpadded like the
    # reference): scope, sampler id 1, interval, mode 2 = random.
    out.append(struct.pack(">HH", TEMPLATE_ID_OPTIONS, 15))
    out.append(bytes((0xAA, 0xBB, 0xCC, 0xDD)))
    out.append(struct.pack(">HIB", 1, sampling, 2))
    return b"".join(out)


def _encode_flow(flow: GeneratedFlow, uptime: int) -> bytes:
    addr_len = 4 if flow.etype == ETYPE_IPV4 else 16
    src = ipaddress.ip_address(flow.src_addr).packed
    dst = ipaddress.ip_address(flow.dst_addr).packed
    if len(src) != addr_len or len(dst) != addr_len:
        raise ValueError(f"address family does not match etype {flow.etype:#x}")
    # StartTime = EndTime = uptime, SamplerID = 1 (nfdata.go:56-58).
    return src + dst + _IPFLOW_STRUCT.pack(
        flow.packets, flow.octets, flow.input_int, flow.output_int,
        uptime, uptime, flow.src_port, flow.dst_port,
        flow.src_as, flow.dst_as, flow.proto, flow.forward_status,
        flow.flow_direction, 1, flow.src_mask, flow.dst_mask,
    )


def netflow_data_packets(flows: list[GeneratedFlow], sequence: int,
                         start_ts: int, now_ts: int) -> list[bytes]:
    """Packetize flows into NFv9 data datagrams: IPv4 flows first, then
    IPv6, each family chunked at its per-packet bound
    (demoexporter/flows/nfdata.go:18-88)."""
    uptime = max(0, now_ts - start_ts)
    by_family: dict[int, list[GeneratedFlow]] = {ETYPE_IPV4: [], ETYPE_IPV6: []}
    for flow in flows:
        by_family[flow.etype].append(flow)
    packets: list[bytes] = []
    for etype in (ETYPE_IPV4, ETYPE_IPV6):
        family = by_family[etype]
        tid = TEMPLATE_ID_IPV4 if etype == ETYPE_IPV4 else TEMPLATE_ID_IPV6
        step = MAX_FLOWS_PER_PACKET[etype]
        rec_len = _RECORD_LEN[etype]
        for i in range(0, len(family), step):
            chunk = family[i:i + step]
            body = b"".join(_encode_flow(f, uptime) for f in chunk)
            packets.append(
                _nfv9_header(len(chunk), uptime, now_ts, sequence)
                + struct.pack(">HH", tid, len(chunk) * rec_len + 4)
                + body
            )
            sequence += 1
    return packets


def _as_wire_addr(value):
    """Fixture addresses are 16-byte v6/v4-mapped packed bytes
    (:func:`random_ips_in`); the wire wants the native family."""
    addr = ipaddress.ip_address(value)
    if addr.version == 6 and addr.ipv4_mapped is not None:
        return addr.ipv4_mapped
    return addr


def demo_packets(flows_pdf, sequence: int = 0, sampling: int = 1000,
                 start_ts: int = 0, now_ts: int | None = None) -> list[bytes]:
    """Encode a :func:`demo_flows_pdf` frame as wire datagrams — the
    template packet first, then the data packets — so the demo pipeline
    can be replayed through the real decoder end-to-end."""
    def ifindex(name: str) -> int:
        # the demo fixture derives interface names as f"Gi0/0/{ifindex}"
        # (fixtures.py one()); the wire wants the index back
        tail = str(name).rsplit("/", 1)[-1]
        return int(tail) if tail.isdigit() else 0

    rows = []
    for r in flows_pdf.itertuples():
        src = _as_wire_addr(r.SrcAddr)
        dst = _as_wire_addr(r.DstAddr)
        v6 = src.version == 6
        rows.append(GeneratedFlow(
            src_addr=str(src), dst_addr=str(dst),
            etype=ETYPE_IPV6 if v6 else ETYPE_IPV4,
            packets=int(r.Packets), octets=int(r.Bytes),
            input_int=ifindex(r.InIfName), output_int=ifindex(r.OutIfName),
            src_port=int(r.SrcPort), dst_port=int(r.DstPort),
            src_as=int(r.SrcAS), dst_as=int(r.DstAS),
            proto=int(r.Proto), src_mask=int(r.SrcNetMask),
            dst_mask=int(r.DstNetMask),
        ))
    if now_ts is None:
        ts = getattr(flows_pdf, "TimeReceived", None)
        now_ts = int(ts.max().timestamp()) if ts is not None and len(ts) else start_ts
    return ([netflow_templates_packet(sequence, sampling, start_ts, now_ts)]
            + netflow_data_packets(rows, sequence + 1, start_ts, now_ts))
