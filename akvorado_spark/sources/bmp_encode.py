"""Demo-exporter BMP stream encoder (S17 companion; reference
demoexporter/bmp/client.go:21-170, pinned by replaying its
client_test.go route table through :mod:`bmp`'s parser + RIB).

Generates the same message sequence the reference's fake exporter
writes to a BMP collector: an Initiation with sysDescr/sysName TLVs,
a PeerUp carrying both BGP OPENs, then one Route-Monitoring update
per (address family, route config) using MP_REACH_NLRI — IPv4 routes
ride MP_REACH too, exactly like the gobgp-based client — and a
trailing Statistics Report.  The output byte stream round-trips
through ``parse_bmp``/``RIB`` so the demo topology can exercise the
routing enrichment end to end without a live BGP session.
"""

from __future__ import annotations

import ipaddress
import struct
from dataclasses import dataclass, field


@dataclass(frozen=True)
class BMPRouteConfig:
    """One route announcement (client.go RouteConfiguration)."""

    prefixes: tuple[str, ...]
    as_path: tuple[int, ...]
    communities: tuple[int, ...] = ()
    large_communities: tuple[tuple[int, int, int], ...] = field(default=())


def _addr16(ip: str) -> bytes:
    a = ipaddress.ip_address(ip)
    packed = a.packed
    return b"\x00" * 10 + b"\xff\xff" + packed if a.version == 4 else packed


def _bmp_msg(mtype: int, body: bytes) -> bytes:
    return struct.pack(">BIB", 3, 6 + len(body), mtype) + body


def _per_peer_header(peer_ip: str, peer_asn: int, bgp_id: str = "2.2.2.2") -> bytes:
    flags = 0x80 if ipaddress.ip_address(peer_ip).version == 6 else 0
    return (
        bytes([0, flags]) + b"\x00" * 8            # type global, distinguisher
        + _addr16(peer_ip)
        + struct.pack(">I", peer_asn)
        + ipaddress.IPv4Address(bgp_id).packed
        + b"\x00" * 8                               # timestamps
    )


def _info_tlv(tlv_type: int, text: str) -> bytes:
    raw = text.encode()
    return struct.pack(">HH", tlv_type, len(raw)) + raw


def _bgp_open(asn: int, bgp_id: str, holdtime: int = 30) -> bytes:
    body = struct.pack(">BHH", 4, min(asn, 0xFFFF), holdtime) \
        + ipaddress.IPv4Address(bgp_id).packed + b"\x00"
    return b"\xff" * 16 + struct.pack(">HB", 19 + len(body), 1) + body


def _attr(flags: int, atype: int, body: bytes) -> bytes:
    if len(body) > 255 or flags & 0x10:
        return bytes([flags | 0x10, atype]) + struct.pack(">H", len(body)) + body
    return bytes([flags, atype, len(body)]) + body


def _nlri(prefixes: list[str]) -> bytes:
    out = b""
    for p in prefixes:
        net = ipaddress.ip_network(p)
        nbytes = (net.prefixlen + 7) // 8
        out += bytes([net.prefixlen]) + net.network_address.packed[:nbytes]
    return out


def _bgp_update(route: BMPRouteConfig, v6: bool, next_hop: str) -> bytes:
    prefixes = [p for p in route.prefixes
                if (ipaddress.ip_network(p).version == 6) == v6]
    if not prefixes:
        return b""
    nh = ipaddress.ip_address(next_hop).packed
    afi, total = (2, 16) if v6 else (1, 4)
    mp = struct.pack(">HBB", afi, 1, len(nh)) + nh + b"\x00" + _nlri(prefixes)
    attrs = _attr(0x40, 1, bytes([1]))                       # ORIGIN egp
    path = struct.pack(">BB", 2, len(route.as_path)) \
        + b"".join(struct.pack(">I", a) for a in route.as_path)
    attrs += _attr(0x40, 2, path)                            # AS_PATH (4-byte)
    if route.communities:
        attrs += _attr(0xC0, 8, b"".join(
            struct.pack(">I", c) for c in route.communities))
    if route.large_communities:
        attrs += _attr(0xC0, 32, b"".join(
            struct.pack(">III", *lc) for lc in route.large_communities))
    attrs += _attr(0x80, 14, mp)                             # MP_REACH_NLRI
    body = struct.pack(">H", 0) + struct.pack(">H", len(attrs)) + attrs
    return b"\xff" * 16 + struct.pack(">HB", 19 + len(body), 2) + body


def demo_bmp_stream(
    routes: list[BMPRouteConfig],
    peer_ip: str = "2.2.2.2",
    peer_asn: int = 65000,
    local_ip: str = "1.1.1.1",
    local_asn: int = 64496,
    next_hop4: str = "192.0.2.1",
    next_hop6: str = "fe80::1",
) -> bytes:
    """The full demo session byte stream (client.go:21-170):
    Initiation → PeerUp → per-family Route-Monitoring → Stats."""
    peer = _per_peer_header(peer_ip, peer_asn)
    out = _bmp_msg(4, _info_tlv(1, "Fake exporter")
                   + _info_tlv(2, "fake.example.com"))
    peer_up = (
        peer + _addr16(local_ip) + struct.pack(">HH", 179, 47647)
        + _bgp_open(local_asn, "1.1.1.1") + _bgp_open(peer_asn, "2.2.2.2")
    )
    out += _bmp_msg(3, peer_up)
    for v6, nh in ((False, next_hop4), (True, next_hop6)):
        for route in routes:
            upd = _bgp_update(route, v6, nh)
            if upd:
                out += _bmp_msg(0, peer + upd)
    # statistics report (client.go sendStats): one counter TLV
    stats = peer + struct.pack(">I", 1) + struct.pack(">HHI", 0, 4, 0)
    out += _bmp_msg(1, stats)
    return out
