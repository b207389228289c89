"""Minimal classic-pcap reader (test-fixture replay).

The reference drives its BMP and flow-decoder tests from pcap captures
(common/helpers/tests_pcap.go ReadPcapL4); this is the equivalent
payload extractor so the same captures can be replayed through the
Python parsers. Classic little-endian pcap, Ethernet link type, IPv4
or IPv6, TCP/UDP payloads concatenated in capture order.
"""

from __future__ import annotations

import struct


def read_pcap_l4(path: str, protocols: tuple[int, ...] = (6,)) -> bytes:
    """Concatenated L4 payloads of every packet in a classic pcap.

    ``protocols`` selects IP protocol numbers (default TCP); UDP
    payloads (17) can be extracted for datagram replays."""
    data = open(path, "rb").read()
    if data[:4] != b"\xd4\xc3\xb2\xa1":
        raise ValueError("expected little-endian classic pcap")
    linktype = struct.unpack_from("<I", data, 20)[0]
    if linktype != 1:
        raise ValueError(f"unsupported link type {linktype}")
    off = 24
    payload = b""
    while off + 16 <= len(data):
        _ts, _tus, incl, _orig = struct.unpack_from("<IIII", data, off)
        off += 16
        pkt = data[off: off + incl]
        off += incl
        if len(pkt) < 14:
            continue
        ethertype = struct.unpack_from(">H", pkt, 12)[0]
        p = 14
        if ethertype == 0x8100:  # 802.1Q
            ethertype = struct.unpack_from(">H", pkt, 16)[0]
            p = 18
        if ethertype == 0x0800:
            ihl = (pkt[p] & 0x0F) * 4
            proto = pkt[p + 9]
            total = struct.unpack_from(">H", pkt, p + 2)[0]
            l4 = pkt[p + ihl: p + total]
        elif ethertype == 0x86DD:
            proto = pkt[p + 6]
            plen = struct.unpack_from(">H", pkt, p + 4)[0]
            l4 = pkt[p + 40: p + 40 + plen]
        else:
            continue
        if proto not in protocols:
            continue
        if proto == 6:
            doff = (l4[12] >> 4) * 4
            payload += l4[doff:]
        else:  # UDP
            payload += l4[8:]
    return payload
