"""BMP → BGP RIB snapshot source (S14; reference
outlet/routing/provider/bmp/).

Pure-Python parsers for BMP (RFC 7854) and the BGP UPDATE messages it
carries (RFC 4271 + multiprotocol extensions RFC 4760, 4-octet ASNs
RFC 6793, large communities RFC 8092, ADD-PATH RFC 7911, L3VPN
RFC 4364 labeled NLRI, EVPN type-5 RFC 9136), feeding either:

- the lightweight :class:`RIB` (keyed ``(peer, cidr)``) that the
  streaming enrichment snapshots into a routes DataFrame for the
  broadcast LPM join (J4), or
- the full-fidelity :class:`BMPProvider`, which mirrors the reference
  provider's semantics exactly — peer keys
  ``(connection, address, type, distinguisher, asn, bgp-id)``
  (events.go peerKey), route identity ``(prefix, peer, nlri)`` with
  ``nlri = (family, path-id, rd)`` (rib.go route/nlri), per-peer
  ADD-PATH capability negotiation from the peer-up OPEN messages
  (events.go handlePeerUpNotification), RD/RT acceptance filters
  (events.go handleRouteMonitoring, rd.go, rt.go), stale-peer
  retention on connection loss (events.go handleConnectionDown), and
  the reference's Prometheus counter surface. Its parity is pinned by
  replaying the reference's Juniper vMX pcap fixtures
  (root_test.go TestBMP) through :mod:`tests.test_bmp_provider`.

The reference keeps a live in-memory trie per BMP session and looks
routes up per flow; the Spark-first design instead snapshots the RIB
into a (exporter, lo, hi, plen, attrs) frame that broadcast-LPM-joins
against the flow stream — same lookup semantics, refreshed per
micro-batch (SURVEY §2.1 S14 recommendation).

Scale: RIB maintenance is driver-side byte parsing (a full table is
~1M routes — megabytes); the per-flow work stays a broadcast join.
"""

from __future__ import annotations

import ipaddress
import struct
from dataclasses import dataclass, field

from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range

# BGP path attribute types
_ORIGIN, _AS_PATH, _NEXT_HOP, _MED, _LOCAL_PREF = 1, 2, 3, 4, 5
_COMMUNITIES, _MP_REACH, _MP_UNREACH = 8, 14, 15
_EXT_COMMUNITIES, _LARGE_COMMUNITIES = 16, 32

# AFI/SAFI pairs the provider understands, named as gobgp names them
# (bgp.Family String()); anything else raises UnknownFamily →
# ignored_updates{error="afi-safi"} like a gobgp decode failure.
FAMILY_NAMES = {
    (1, 1): "ipv4-unicast",
    (2, 1): "ipv6-unicast",
    (1, 128): "l3vpn-ipv4-unicast",
    (2, 128): "l3vpn-ipv6-unicast",
    (25, 70): "l2vpn-evpn",
    (25, 65): "l2vpn-vpls",
}
_VPN_SAFI = 128
_F_V4, _F_V6 = (1, 1), (2, 1)
_F_EVPN, _F_VPLS = (25, 70), (25, 65)

# ADD-PATH modes (RFC 7911 §4; gobgp BGPAddPathMode)
_AP_RECEIVE, _AP_SEND, _AP_BOTH = 1, 2, 3


class UnknownFamily(ValueError):
    """MP attribute carries an AFI/SAFI we cannot decode (the
    reference's gobgp fails the whole message parse; serve.go counts
    it as ignored_updates{error="afi-safi"})."""

    def __init__(self, afi: int, safi: int):
        super().__init__(f"unknown AFI/SAFI {afi}/{safi}")
        self.family = (afi, safi)


# ---------------------------------------------------------------------------
# Route distinguishers and route targets (reference rd.go / rt.go)
# ---------------------------------------------------------------------------


def parse_rd(text: str) -> int:
    """Parse an RD textual form into its 64-bit value (rd.go
    UnmarshalText): ``asn2:index``, ``ipv4:index``, ``asn4:index``,
    explicit ``type:value:index``, or a bare uint64."""
    elems = text.split(":")
    typ = -1
    if len(elems) == 1:
        try:
            val = int(text, 10)
        except ValueError:
            raise ValueError("cannot parse RD as a 64-bit number") from None
        if not 0 <= val < 1 << 64:
            raise ValueError("cannot parse RD as a 64-bit number")
        return val
    if len(elems) == 3:
        try:
            typ = int(elems[0], 10)
        except ValueError:
            raise ValueError("cannot parse RD type") from None
        if typ < 0 or typ > 2:
            raise ValueError("cannot parse RD type")
        elems = elems[1:]
    if len(elems) != 2:
        raise ValueError("cannot parse RD")
    if typ == 1 or (typ == -1 and "." in elems[0]):
        try:
            ip = ipaddress.IPv4Address(elems[0])
            index = int(elems[1], 10)
        except (ValueError, ipaddress.AddressValueError):
            raise ValueError("cannot parse RD as IPv4 address + index") from None
        if not 0 <= index < 1 << 16:
            raise ValueError("cannot parse RD as IPv4 address + index")
        return (1 << 48) + (int(ip) << 16) + index
    try:
        asn = int(elems[0], 10)
        index = int(elems[1], 10)
    except ValueError:
        raise ValueError("cannot parse RD as ASN + index") from None
    if not (0 <= asn < 1 << 32 and 0 <= index < 1 << 32):
        raise ValueError("cannot parse RD as ASN + index")
    if typ == 0 and asn > 65535:
        raise ValueError("cannot parse RD as ASN2 + index")
    if asn <= 65535 and typ != 2:
        return (0 << 48) + (asn << 32) + index
    if index > 65535:
        raise ValueError("cannot parse RD as ASN4 + index")
    return (2 << 48) + (asn << 16) + index


def format_rd(value: int) -> str:
    """Canonical RD text (rd.go String)."""
    typ = value >> 48
    rem = value & 0xFFFFFFFFFFFF
    if typ == 0:
        return f"{(rem >> 32) & 0xffff}:{rem & 0xffffffff}"
    if typ == 1:
        return (
            f"{(rem >> 40) & 0xff}.{(rem >> 32) & 0xff}."
            f"{(rem >> 24) & 0xff}.{(rem >> 16) & 0xff}:{rem & 0xffff}"
        )
    if typ == 2:
        asn = (rem >> 16) & 0xFFFFFFFF
        if asn <= 65535:
            return f"2:{asn}:{rem & 0xffff}"
        return f"{asn}:{rem & 0xffff}"
    return ""


_EC_SUBTYPE_ROUTE_TARGET = 0x02


def rt_from_extended_community(buf: bytes) -> int | None:
    """8-byte extended community → RT value in RD encoding, or None
    when the subtype is not route-target (rt.go
    RTFromExtendedCommunity): type from the low 2 bits of the high
    byte (masking the transitive bit), value bytes 2..8."""
    if len(buf) != 8 or buf[1] != _EC_SUBTYPE_ROUTE_TARGET:
        return None
    typ = buf[0] & 0x03
    return (typ << 48) | int.from_bytes(buf[2:], "big")


# ---------------------------------------------------------------------------
# NLRI walks
# ---------------------------------------------------------------------------


def _prefixes(data: bytes, off: int, end: int, v6: bool) -> list[str]:
    """NLRI field: (prefix-length, truncated prefix bytes)*."""
    return [cidr for _pid, cidr in _walk_nlri(data, off, end, v6, addpath=False)]


def _walk_nlri(
    data: bytes, off: int, end: int, v6: bool, addpath: bool
) -> list[tuple[int, str]]:
    """Unicast NLRI walk → [(path_id, cidr)] (RFC 4271 §4.3, path id
    prefix per RFC 7911 §3 when negotiated)."""
    out = []
    total = 16 if v6 else 4
    while off < end:
        path_id = 0
        if addpath:
            path_id = struct.unpack_from(">I", data, off)[0]
            off += 4
        plen = data[off]
        nbytes = (plen + 7) // 8
        raw = data[off + 1: off + 1 + nbytes] + b"\0" * (total - nbytes)
        off += 1 + nbytes
        addr = ipaddress.IPv6Address(raw) if v6 else ipaddress.IPv4Address(raw)
        out.append((path_id, f"{addr}/{plen}"))
    return out


def _walk_vpn_nlri(
    data: bytes, off: int, end: int, v6: bool, addpath: bool
) -> list[tuple[int, int, str]]:
    """Labeled VPN NLRI walk → [(path_id, rd, cidr)] (RFC 4364 §4.3.4:
    length covers label stack + RD + prefix; label stack ends at the
    bottom-of-stack bit, with 0x800000 as the withdraw-compat
    label)."""
    out = []
    total = 16 if v6 else 4
    while off < end:
        path_id = 0
        if addpath:
            path_id = struct.unpack_from(">I", data, off)[0]
            off += 4
        plen_bits = data[off]
        nbytes = (plen_bits + 7) // 8
        body = data[off + 1: off + 1 + nbytes]
        off += 1 + nbytes
        # Label stack: 3-byte entries until bottom-of-stack.
        p = 0
        while p + 3 <= len(body):
            label = int.from_bytes(body[p: p + 3], "big")
            p += 3
            # Bottom-of-stack bit, the withdraw-compat label 0x800000,
            # or the zero label all end the stack (gobgp
            # MPLSLabelStack.DecodeFromBytes).
            if label & 0x1 or label == 0x800000 or label == 0:
                break
        rd = int.from_bytes(body[p: p + 8], "big")
        p += 8
        ip_plen = plen_bits - 8 * p
        raw = body[p:] + b"\0" * (total - (len(body) - p))
        addr = ipaddress.IPv6Address(raw) if v6 else ipaddress.IPv4Address(raw)
        out.append((path_id, rd, f"{addr}/{ip_plen}"))
    return out


def _walk_evpn_nlri(
    data: bytes, off: int, end: int
) -> list[tuple[int, int, str] | None]:
    """EVPN NLRI walk (RFC 7432 §7): type-5 IP prefix routes
    (RFC 9136 §3.1) → (0, rd, cidr); other route types → None
    (the reference only handles EVPNIPPrefixRoute)."""
    out = []
    while off + 2 <= end:
        rtype, ln = data[off], data[off + 1]
        body = data[off + 2: off + 2 + ln]
        off += 2 + ln
        if rtype != 5 or len(body) < 31:
            out.append(None)
            continue
        rd = int.from_bytes(body[:8], "big")
        ip_plen = body[22]
        v6 = len(body) >= 58
        n = 16 if v6 else 4
        raw = body[23: 23 + n]
        addr = ipaddress.IPv6Address(raw) if v6 else ipaddress.IPv4Address(raw)
        out.append((0, rd, f"{addr}/{ip_plen}"))
    return out


def _count_vpls_nlri(data: bytes, off: int, end: int) -> int:
    """VPLS NLRI entries are 2-byte-length prefixed (RFC 4761 §3.2.2);
    the reference parses then ignores each (ignored_nlri metric)."""
    count = 0
    while off + 2 <= end:
        ln = struct.unpack_from(">H", data, off)[0]
        off += 2 + ln
        count += 1
    return count


def _norm_next_hop(nh: bytes, safi: int) -> bytes:
    """Normalize a next-hop field to 16 bytes: VPN SAFIs prefix an
    8-byte RD (RFC 4364 §4.3.2), v6 next hops may append a link-local
    (RFC 2545 §3); v4 is v4-mapped."""
    if safi == _VPN_SAFI and len(nh) >= 8:
        nh = nh[8:]
    if len(nh) >= 16:
        return nh[:16]
    return b"\0" * 10 + b"\xff\xff" + nh[:4]


def _as_path_flat(body: bytes) -> list[int]:
    """AS_PATH attribute → flat path (utils.go asPathFlat: first
    member of a SET/CONFED_SET, sequences in full). Detects 4- vs
    2-octet encoding by walking the segment structure (gobgp's
    heuristic — the BMP stream does not say which was negotiated)."""
    for asn_size in (4, 2):
        path: list[int] = []
        p = 0
        ok = True
        while p < len(body):
            if p + 2 > len(body):
                ok = False
                break
            segtype, n = body[p], body[p + 1]
            p += 2
            if p + n * asn_size > len(body):
                ok = False
                break
            seg = [
                int.from_bytes(body[p + i * asn_size: p + (i + 1) * asn_size], "big")
                for i in range(n)
            ]
            p += n * asn_size
            if segtype in (1, 4):  # AS_SET, CONFED_SET → first member
                seg = seg[:1]
            path.extend(seg)
        if ok and p == len(body):
            return path
    return []


# ---------------------------------------------------------------------------
# BGP UPDATE
# ---------------------------------------------------------------------------


def parse_bgp_update_ex(data: bytes, addpath: frozenset = frozenset()) -> dict:
    """One BGP message (with the 19-byte header) → rich update dict:

    ``announced``: [(family, path_id, rd|None, cidr, nh16|None, src)]
    ``withdrawn``: [(family, path_id, rd|None, cidr, src)]
    where ``src`` is ``"main"`` for the top-level NLRI/withdrawn
    fields and ``"mp"`` for MP_REACH/MP_UNREACH — the reference gates
    the two differently (main on acceptedRD(0), MP-carried unicast on
    the peer distinguisher; events.go handleRouteMonitoring).
    ``attrs``: origin/as_path/next_hop/communities/large_communities/
    extended_communities; ``ignored_nlri``: [family name] for NLRI the
    reference parses but does not handle (VPLS, non-type-5 EVPN).

    ``rd`` is None for non-VPN NLRI — the caller substitutes the
    peer distinguisher (events.go handleRouteMonitoring).
    ``addpath`` lists (afi, safi) families negotiated for ADD-PATH
    receive on this peer."""
    if len(data) < 19 or data[:16] != b"\xff" * 16:
        raise ValueError("bad BGP marker")
    length, mtype = struct.unpack_from(">HB", data, 16)
    out: dict = {"announced": [], "withdrawn": [], "attrs": {}, "ignored_nlri": []}
    if mtype != 2:  # not an UPDATE (OPEN/KEEPALIVE inside peer-up etc.)
        return out
    off = 19
    wlen = struct.unpack_from(">H", data, off)[0]
    for pid, cidr in _walk_nlri(data, off + 2, off + 2 + wlen, False, _F_V4 in addpath):
        out["withdrawn"].append((_F_V4, pid, None, cidr, "main"))
    off += 2 + wlen
    alen = struct.unpack_from(">H", data, off)[0]
    attr_end = off + 2 + alen
    off += 2
    attrs: dict = {}
    mp_announced: list = []
    mp_withdrawn: list = []
    while off < attr_end:
        flags, atype = data[off], data[off + 1]
        if flags & 0x10:  # extended length
            ln = struct.unpack_from(">H", data, off + 2)[0]
            off += 4
        else:
            ln = data[off + 2]
            off += 3
        body = data[off:off + ln]
        off += ln
        if atype == _AS_PATH:
            attrs["as_path"] = _as_path_flat(body)
        elif atype == _NEXT_HOP:
            attrs["next_hop"] = b"\0" * 10 + b"\xff\xff" + body
        elif atype == _COMMUNITIES:
            attrs["communities"] = [
                struct.unpack_from(">I", body, i)[0] for i in range(0, len(body), 4)
            ]
        elif atype == _LARGE_COMMUNITIES:
            attrs["large_communities"] = [
                tuple(struct.unpack_from(">III", body, i))
                for i in range(0, len(body), 12)
            ]
        elif atype == _EXT_COMMUNITIES:
            attrs["extended_communities"] = [
                body[i: i + 8] for i in range(0, len(body), 8)
            ]
        elif atype == _MP_REACH:
            afi, safi, nhlen = struct.unpack_from(">HBB", body, 0)
            family = (afi, safi)
            if family not in FAMILY_NAMES:
                raise UnknownFamily(afi, safi)
            nh = _norm_next_hop(body[4:4 + nhlen], safi)
            attrs.setdefault("next_hop", nh)
            p = 4 + nhlen + 1  # reserved byte
            ap = family in addpath
            if safi == _VPN_SAFI:
                for pid, rd, cidr in _walk_vpn_nlri(body, p, len(body), afi == 2, ap):
                    mp_announced.append((family, pid, rd, cidr, nh, "mp"))
            elif family == _F_EVPN:
                for entry in _walk_evpn_nlri(body, p, len(body)):
                    if entry is None:
                        out["ignored_nlri"].append(FAMILY_NAMES[family])
                    else:
                        pid, rd, cidr = entry
                        mp_announced.append((family, pid, rd, cidr, nh, "mp"))
            elif family == _F_VPLS:
                out["ignored_nlri"] += [FAMILY_NAMES[family]] * _count_vpls_nlri(
                    body, p, len(body))
            else:
                for pid, cidr in _walk_nlri(body, p, len(body), afi == 2, ap):
                    mp_announced.append((family, pid, None, cidr, nh, "mp"))
        elif atype == _MP_UNREACH:
            afi, safi = struct.unpack_from(">HB", body, 0)
            family = (afi, safi)
            if family not in FAMILY_NAMES:
                raise UnknownFamily(afi, safi)
            ap = family in addpath
            if safi == _VPN_SAFI:
                for pid, rd, cidr in _walk_vpn_nlri(body, 3, len(body), afi == 2, ap):
                    mp_withdrawn.append((family, pid, rd, cidr, "mp"))
            elif family == _F_EVPN:
                for entry in _walk_evpn_nlri(body, 3, len(body)):
                    if entry is not None:
                        pid, rd, cidr = entry
                        mp_withdrawn.append((family, pid, rd, cidr, "mp"))
            elif family == _F_VPLS:
                pass
            else:
                for pid, cidr in _walk_nlri(body, 3, len(body), afi == 2, ap):
                    mp_withdrawn.append((family, pid, None, cidr, "mp"))
        elif atype == _ORIGIN:
            attrs["origin"] = body[0]
    nh = attrs.get("next_hop")
    for pid, cidr in _walk_nlri(data, attr_end, length, False, _F_V4 in addpath):
        out["announced"].append((_F_V4, pid, None, cidr, nh, "main"))
    out["announced"] += mp_announced
    out["withdrawn"] += mp_withdrawn
    out["attrs"] = attrs
    return out


def parse_bgp_update(data: bytes) -> dict:
    """Legacy view of :func:`parse_bgp_update_ex`:
    ``{"announced": [cidr], "withdrawn": [cidr], "attrs": {...}}``."""
    rich = parse_bgp_update_ex(data)
    return {
        "announced": [cidr for (_f, _p, _rd, cidr, _nh, _s) in rich["announced"]],
        "withdrawn": [cidr for (_f, _p, _rd, cidr, _s) in rich["withdrawn"]],
        "attrs": rich["attrs"],
    }


# ---------------------------------------------------------------------------
# OPEN capability negotiation (ADD-PATH)
# ---------------------------------------------------------------------------


def _open_addpath_caps(data: bytes) -> dict[tuple[int, int], int]:
    """BGP OPEN message (with header) → {family: add-path mode} from
    capability 69 (RFC 7911 §4)."""
    caps: dict[tuple[int, int], int] = {}
    if len(data) < 29 or struct.unpack_from(">HB", data, 16)[1] != 1:
        return caps
    optlen = data[28]
    off, end = 29, min(29 + optlen, len(data))
    while off + 2 <= end:
        ptype, plen = data[off], data[off + 1]
        pbody = data[off + 2: off + 2 + plen]
        off += 2 + plen
        if ptype != 2:  # capabilities
            continue
        p = 0
        while p + 2 <= len(pbody):
            code, clen = pbody[p], pbody[p + 1]
            val = pbody[p + 2: p + 2 + clen]
            p += 2 + clen
            if code == 69:
                for i in range(0, len(val) - 3, 4):
                    afi, safi, mode = struct.unpack_from(">HBB", val, i)
                    caps[(afi, safi)] = mode
    return caps


def negotiate_addpath(sent_open: bytes, received_open: bytes) -> frozenset:
    """Families to decode with ADD-PATH (events.go
    handlePeerUpNotification): the peer advertises send (or both) and
    we advertised receive (or both) — we only ever decode."""
    received = _open_addpath_caps(received_open)
    result = set()
    for family, sent_mode in _open_addpath_caps(sent_open).items():
        rm = received.get(family, 0)
        if rm in (_AP_BOTH, _AP_SEND) and sent_mode in (_AP_BOTH, _AP_RECEIVE):
            result.add(family)
    return frozenset(result)


# ---------------------------------------------------------------------------
# BMP message stream
# ---------------------------------------------------------------------------

_MSG_TYPE_NAMES = {
    0: "route-monitoring",
    1: "statistics-report",
    2: "peer-down-notification",
    3: "peer-up-notification",
    4: "initiation",
    5: "termination",
    6: "route-mirroring",
}


@dataclass
class BMPEvent:
    kind: str          # update | peer_up | peer_down | init | term | stats | mirror | other
    peer: bytes = b""  # 16-byte peer address
    peer_as: int = 0
    update: dict | None = None
    ptype: int = 0
    pflags: int = 0
    distinguisher: int = 0
    bgp_id: int = 0
    raw_body: bytes = b""  # post-peer-header payload (peer-up OPENs)


def parse_bmp(data: bytes) -> list[BMPEvent]:
    """A BMP byte stream → events (RFC 7854 §4).

    Error contract: malformed input raises ``ValueError`` only; the
    attacker-controlled common-header length is validated so it can
    neither stall the walk (length < header size) nor run past the
    buffer."""
    try:
        return _parse_bmp_stream(data)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or malformed BMP stream: {e}") from e


def _parse_bmp_stream(data: bytes, addpath_for=None) -> list[BMPEvent]:
    """``addpath_for(event) -> frozenset`` lets the provider resolve
    per-peer ADD-PATH families before the UPDATE body is parsed."""
    events = []
    off = 0
    while off + 6 <= len(data):
        version, length, mtype = struct.unpack_from(">BIB", data, off)
        if version != 3:
            raise ValueError(f"unsupported BMP version {version}")
        if length < 6:
            raise ValueError(f"BMP message length {length} below header size")
        if off + length > len(data):
            raise ValueError("BMP message length exceeds buffer")
        end = off + length
        body = off + 6
        if mtype in (0, 1, 2, 3, 6):  # messages with a per-peer header
            ptype, pflags = data[body], data[body + 1]
            distinguisher = int.from_bytes(data[body + 2: body + 10], "big")
            peer = data[body + 10: body + 26]
            peer_as, bgp_id = struct.unpack_from(">II", data, body + 26)
            body += 42
            ev = BMPEvent(
                "other", peer, peer_as, None, ptype, pflags, distinguisher, bgp_id,
                raw_body=data[body:end],
            )
            if mtype == 0:  # route monitoring
                ev.kind = "update"
                ap = addpath_for(ev) if addpath_for else frozenset()
                try:
                    ev.update = parse_bgp_update_ex(data[body:end], ap)
                except UnknownFamily as e:
                    ev.kind = "unknown_family"
                    ev.update = {"family": e.family}
            elif mtype == 1:
                ev.kind = "stats"
            elif mtype == 2:
                ev.kind = "peer_down"
            elif mtype == 3:
                ev.kind = "peer_up"
            else:
                ev.kind = "mirror"
            events.append(ev)
        elif mtype == 4:
            events.append(BMPEvent("init"))
        elif mtype == 5:
            events.append(BMPEvent("term"))
        else:
            events.append(BMPEvent("other"))
        off = end
    return events


# ---------------------------------------------------------------------------
# Lightweight RIB (streaming enrichment's snapshot source)
# ---------------------------------------------------------------------------


@dataclass
class RIB:
    """Adj-RIB-in keyed by (peer, prefix) (reference bmp/rib.go,
    collapsed to the single-path view the LPM snapshot needs).

    ``apply`` folds a BMP byte stream in; ``snapshot_rows`` emits the
    routes-frame rows for ``lpm_join`` (exporter = the router the BMP
    session came from). For full reference parity (ADD-PATH, RD/RT
    filters, stale peers) use :class:`BMPProvider`."""

    routes: dict = field(default_factory=dict)  # (peer, cidr) -> attrs

    def apply(self, data: bytes) -> None:
        for ev in parse_bmp(data):
            if ev.kind == "update":
                attrs = dict(ev.update["attrs"])
                attrs.setdefault("peer_as", ev.peer_as)
                for (_f, _pid, _rd, cidr, _s) in ev.update["withdrawn"]:
                    self.routes.pop((ev.peer, cidr), None)
                for (_f, _pid, _rd, cidr, nh, _s) in ev.update["announced"]:
                    row = dict(attrs)
                    if nh is not None:
                        row["next_hop"] = nh
                    self.routes[(ev.peer, cidr)] = row
            elif ev.kind == "peer_down":
                for key in [k for k in self.routes if k[0] == ev.peer]:
                    del self.routes[key]

    def snapshot_rows(self, exporter: bytes) -> list[tuple]:
        """(exporter, dst_as, as_path, communities, next_hop, lo, hi,
        plen, large_communities)."""
        out = []
        for (_peer, cidr), attrs in self.routes.items():
            lo, hi = prefix_range(cidr)
            path = attrs.get("as_path", [])
            out.append(
                (
                    exporter,
                    path[-1] if path else attrs.get("peer_as", 0),
                    path,
                    attrs.get("communities", []),
                    attrs.get("next_hop"),
                    lo,
                    hi,
                    prefix_mapped_len(cidr),
                    [tuple(int(x) for x in lc)
                     for lc in attrs.get("large_communities", [])],
                )
            )
        return out

    def to_frame(self, spark, exporter: bytes):
        from akvorado_spark.sources.tables import local_df

        return local_df(
            spark,
            self.snapshot_rows(exporter),
            "exporter binary, dst_as long, as_path array<long>, "
            "communities array<long>, next_hop binary, lo binary, hi binary, plen int, "
            "large_communities array<struct<asn:bigint,local1:bigint,local2:bigint>>",
        )


# ---------------------------------------------------------------------------
# Full-fidelity provider (reference root.go / events.go / rib.go)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BMPConfig:
    """Mirror of the reference Configuration (config.go): RD/RT
    acceptance (0 matches absence), collect toggles, stale-route
    retention."""

    rds: tuple[int, ...] = ()
    rts: tuple[int, ...] = ()
    collect_asns: bool = True
    collect_as_paths: bool = True
    collect_communities: bool = True
    keep: float = 300.0


@dataclass
class _PeerInfo:
    reference: int
    addpath: frozenset = frozenset()
    stale_until: float | None = None


@dataclass
class _Route:
    next_hop: bytes | None
    asn: int
    as_path: tuple
    communities: tuple
    large_communities: tuple
    seq: int  # insertion order within the prefix (LookupRoute default)


def _peer_ip_str(peer: bytes, pflags: int) -> str:
    """Peer address per RFC 7854 §4.2: 16 raw bytes, v4 in the last 4
    when the V flag is unset."""
    if pflags & 0x80:
        return str(ipaddress.IPv6Address(peer))
    return str(ipaddress.IPv4Address(peer[12:]))


class BMPProvider:
    """Driver-side BMP state machine with the reference's exact
    semantics; its RIB snapshot feeds the Spark LPM join.

    Route identity is (prefix, peer-ref, family, path-id, rd)
    (rib.go route + nlri); peers are keyed per connection + peer
    header fields (events.go peerKey); the Prometheus counter surface
    matches root_test.go's expectations label-for-label."""

    def __init__(self, config: BMPConfig | None = None, now: float = 0.0):
        self.config = config or BMPConfig()
        self.now = now
        self.peers: dict[tuple, _PeerInfo] = {}
        self._next_ref = 0
        # (prefix, peer_ref, family, path_id, rd) -> _Route
        self.routes: dict[tuple, _Route] = {}
        self._prefix_routes: dict[str, int] = {}  # prefix -> live route count
        self._peer_meta: dict[int, tuple[str, str]] = {}  # ref -> (ip, exporter)
        self._seq = 0
        self.metrics: dict[tuple, int] = {}
        self._open_conns: set = set()
        self._buffers: dict[tuple, bytes] = {}

    # -- metrics -----------------------------------------------------------

    def _inc(self, name: str, labels: tuple, by: int = 1) -> None:
        key = (name,) + labels
        self.metrics[key] = self.metrics.get(key, 0) + by

    def prom_metrics(self, *prefixes: str) -> dict[str, str]:
        """Render counters in the reference's exposition format so
        tests can diff against root_test.go tables verbatim."""
        label_names = {
            "received_messages_total": ("exporter", "type"),
            "ignored_nlri_total": ("exporter", "type"),
            "ignored_updates_total": ("error", "exporter"),
        }
        out = {}
        for key, val in self.metrics.items():
            name, labels = key[0], key[1:]
            names = label_names.get(name, ("exporter",))
            pairs = sorted(zip(names, labels))
            rendered = ",".join(f'{n}="{v}"' for n, v in pairs)
            if not prefixes or any(name.startswith(p) for p in prefixes):
                out[f"{name}{{{rendered}}}"] = str(val)
        return out

    # -- connection lifecycle ---------------------------------------------

    def _conn_open(self, conn: tuple) -> None:
        if conn in self._open_conns:
            return
        self._open_conns.add(conn)
        exporter = conn[0]
        self._inc("opened_connections_total", (exporter,))
        for gauge in ("closed_connections_total", "peers", "routes",
                      "prefixes_added_total", "prefixes_removed_total",
                      "prefixes_updated_total"):
            self._inc(gauge, (exporter,), 0)
        for tname in _MSG_TYPE_NAMES.values():
            self._inc("received_messages_total", (exporter, tname), 0)
        self._inc("received_messages_total", (exporter, "unknown"), 0)

    def close(self, conn: tuple) -> None:
        """Connection loss: peers become stale for ``keep`` seconds
        (events.go handleConnectionDown)."""
        if conn not in self._open_conns:
            return
        self._open_conns.discard(conn)
        self._inc("closed_connections_total", (conn[0],))
        until = self.now + self.config.keep
        for pkey, pinfo in self.peers.items():
            if pkey[0] == conn:
                pinfo.stale_until = until

    def advance(self, seconds: float) -> None:
        """Move the injected clock and drop stale peers
        (events.go removeStalePeers)."""
        self.now += seconds
        for pkey in [k for k, p in self.peers.items()
                     if p.stale_until is not None and p.stale_until <= self.now]:
            self._remove_peer(pkey)

    # -- peers -------------------------------------------------------------

    def _peer_key(self, conn: tuple, ev: BMPEvent) -> tuple:
        return (conn, ev.peer, ev.ptype, ev.distinguisher, ev.peer_as, ev.bgp_id)

    def _add_peer(self, conn: tuple, pkey: tuple, ev: BMPEvent) -> _PeerInfo:
        self._next_ref += 1
        pinfo = _PeerInfo(reference=self._next_ref)
        self.peers[pkey] = pinfo
        self._peer_meta[pinfo.reference] = (_peer_ip_str(ev.peer, ev.pflags), conn[0])
        self._inc("peers", (conn[0],))
        return pinfo

    def _remove_peer(self, pkey: tuple) -> None:
        pinfo = self.peers.pop(pkey, None)
        if pinfo is None:
            return
        exporter = pkey[0][0]
        removed, prefixes_removed = 0, 0
        for rkey in [k for k in self.routes if k[1] == pinfo.reference]:
            del self.routes[rkey]
            removed += 1
            prefix = rkey[0]
            self._prefix_routes[prefix] -= 1
            if self._prefix_routes[prefix] == 0:
                del self._prefix_routes[prefix]
                prefixes_removed += 1
        self._inc("routes", (exporter,), -removed)
        self._inc("prefixes_removed_total", (exporter,), prefixes_removed)
        self._inc("peers", (exporter,), -1)
        self._inc("removed_peers_total", (exporter,))

    # -- RIB ---------------------------------------------------------------

    def _add_route(self, exporter: str, prefix: str, peer_ref: int,
                   family: tuple, path_id: int, rd: int, route: _Route) -> None:
        key = (prefix, peer_ref, family, path_id, rd)
        existing = self.routes.get(key)
        is_new_prefix = prefix not in self._prefix_routes
        if existing is not None:
            route.seq = existing.seq  # update in place (rib.go AddRoute)
            self.routes[key] = route
        else:
            self.routes[key] = route
            self._prefix_routes[prefix] = self._prefix_routes.get(prefix, 0) + 1
            self._inc("routes", (exporter,))
        if is_new_prefix:
            self._inc("prefixes_added_total", (exporter,))
        else:
            self._inc("prefixes_updated_total", (exporter,))

    def _remove_route(self, exporter: str, prefix: str, peer_ref: int,
                      family: tuple, path_id: int, rd: int) -> None:
        key = (prefix, peer_ref, family, path_id, rd)
        if self.routes.pop(key, None) is None:
            return
        self._inc("routes", (exporter,), -1)
        self._prefix_routes[prefix] -= 1
        if self._prefix_routes[prefix] == 0:
            del self._prefix_routes[prefix]
            self._inc("prefixes_removed_total", (exporter,))

    def _accepted_rd(self, rd: int) -> bool:
        return not self.config.rds or rd in self.config.rds

    # -- message handling --------------------------------------------------

    def feed(self, data: bytes, conn: tuple = ("127.0.0.1", 0)) -> None:
        """Feed a chunk of a connection's BMP byte stream (complete or
        partial messages; the remainder is buffered per connection)."""
        self._conn_open(conn)
        buf = self._buffers.get(conn, b"") + data
        # Consume only complete messages; keep the tail buffered.
        end = 0
        while end + 6 <= len(buf):
            _v, length, _t = struct.unpack_from(">BIB", buf, end)
            if length < 6 or end + length > len(buf):
                break
            end += length
        self._buffers[conn] = buf[end:]
        exporter = conn[0]

        def addpath_for(ev: BMPEvent) -> frozenset:
            pinfo = self.peers.get(self._peer_key(conn, ev))
            return pinfo.addpath if pinfo else frozenset()

        for ev in _parse_bmp_stream(buf[:end], addpath_for=addpath_for):
            tname = {
                "update": "route-monitoring", "unknown_family": "route-monitoring",
                "stats": "statistics-report", "peer_down": "peer-down-notification",
                "peer_up": "peer-up-notification", "init": "initiation",
                "term": "termination", "mirror": "route-mirroring",
                "other": "unknown",
            }[ev.kind]
            self._inc("received_messages_total", (exporter, tname))
            if ev.kind == "peer_up":
                self._handle_peer_up(conn, ev)
            elif ev.kind == "peer_down":
                pkey = self._peer_key(conn, ev)
                if pkey in self.peers:
                    self._remove_peer(pkey)
            elif ev.kind == "unknown_family":
                self._inc("ignored_updates_total", ("afi-safi", exporter))
            elif ev.kind == "update":
                self._handle_update(conn, ev)
            elif ev.kind == "term":
                self.close(conn)

    def _handle_peer_up(self, conn: tuple, ev: BMPEvent) -> None:
        # Body: local address (16) + local port (2) + remote port (2),
        # then the sent and received OPEN messages (RFC 7854 §4.10).
        body = ev.raw_body
        pkey = self._peer_key(conn, ev)
        pinfo = self.peers.get(pkey)
        if pinfo is None:
            pinfo = self._add_peer(conn, pkey, ev)
        off = 20
        opens = []
        while off + 19 <= len(body) and len(opens) < 2:
            ln = struct.unpack_from(">H", body, off + 16)[0]
            opens.append(body[off: off + ln])
            off += ln
        if len(opens) == 2:
            pinfo.addpath = negotiate_addpath(opens[0], opens[1])

    def _handle_update(self, conn: tuple, ev: BMPEvent) -> None:
        exporter = conn[0]
        upd = ev.update
        ptype_l3vpn = ev.ptype == 1  # RD Instance Peer (RFC 7854 §4.2)
        if ptype_l3vpn and not self._accepted_rd(ev.distinguisher):
            return

        attrs = upd["attrs"]
        # RT acceptance (events.go handleRouteMonitoring).
        if self.config.rts:
            rts = [rt for rt in (rt_from_extended_community(ec)
                                 for ec in attrs.get("extended_communities", []))
                   if rt is not None]
            if rts:
                if not any(rt in self.config.rts for rt in rts):
                    return
            elif 0 not in self.config.rts:
                return

        as_path = tuple(attrs.get("as_path", ()))
        asn = 0
        if self.config.collect_asns:
            asn = as_path[-1] if as_path else ev.peer_as
        if not self.config.collect_as_paths:
            as_path = ()
        communities: tuple = ()
        large: tuple = ()
        if self.config.collect_communities:
            communities = tuple(attrs.get("communities", ()))
            large = tuple(tuple(x) for x in attrs.get("large_communities", ()))

        pkey = self._peer_key(conn, ev)
        pinfo = self.peers.get(pkey)
        if pinfo is None:
            pinfo = self._add_peer(conn, pkey, ev)

        for name in upd["ignored_nlri"]:
            self._inc("ignored_nlri_total", (exporter, name))

        for family, path_id, rd, cidr, nh, src_field in upd["announced"]:
            if src_field == "main":
                rd = ev.distinguisher
                if not (ptype_l3vpn or self._accepted_rd(0)):
                    continue
            else:
                if rd is None:
                    rd = ev.distinguisher
                if not ptype_l3vpn and not self._accepted_rd(rd):
                    continue
            self._seq += 1
            self._add_route(
                exporter, cidr, pinfo.reference, family, path_id, rd,
                _Route(nh, asn, as_path, communities, large, self._seq))
        for family, path_id, rd, cidr, src_field in upd["withdrawn"]:
            if src_field == "main":
                rd = ev.distinguisher
                if not (ptype_l3vpn or self._accepted_rd(0)):
                    continue
            else:
                if rd is None:
                    rd = ev.distinguisher
                if not ptype_l3vpn and not self._accepted_rd(rd):
                    continue
            self._remove_route(exporter, cidr, pinfo.reference, family, path_id, rd)

    # -- views -------------------------------------------------------------

    def dump(self) -> dict[str, list[str]]:
        """RIB dump in root_test.go's dumpRIB format, grouped by peer
        address: ``[family] prefix via nh rd/path asn [path]
        [communities] [large]``."""

        def golist(vals) -> str:
            return "[" + " ".join(str(v) for v in vals) + "]"

        def golist_structs(vals) -> str:
            return "[" + " ".join("{" + " ".join(str(x) for x in v) + "}"
                                  for v in vals) + "]"

        out: dict[str, list[str]] = {}
        for (prefix, peer_ref, family, path_id, rd), route in self.routes.items():
            peer_ip = self._peer_meta[peer_ref][0]
            nh = "invalid IP"
            if route.next_hop is not None:
                addr = ipaddress.IPv6Address(route.next_hop)
                v4 = addr.ipv4_mapped
                nh = str(v4) if v4 is not None else str(addr)
            line = (
                f"[{FAMILY_NAMES[family]}] {prefix} via {nh} "
                f"{format_rd(rd)}/{path_id} {route.asn} "
                f"{golist(route.as_path)} {golist(route.communities)} "
                f"{golist_structs(route.large_communities)}"
            )
            out.setdefault(peer_ip, []).append(line)
        for lines in out.values():
            lines.sort()
        return out

    def lookup(self, ip: str, preferred_nh: str | None = None):
        """Longest-prefix-match lookup preferring the route whose next
        hop matches (rib.go LookupRoute): the first-inserted route for
        the best prefix is the default."""
        target = ipaddress.ip_address(ip)
        if isinstance(target, ipaddress.IPv4Address):
            target = ipaddress.IPv6Address(b"\0" * 10 + b"\xff\xff" + target.packed)
        best_plen, best_prefix = -1, None
        for prefix in self._prefix_routes:
            net = ipaddress.ip_network(prefix)
            lo, hi = prefix_range(prefix)
            if lo <= target.packed <= hi:
                plen = prefix_mapped_len(prefix)
                if plen > best_plen:
                    best_plen, best_prefix = plen, prefix
        if best_prefix is None:
            return None
        want_nh = None
        if preferred_nh is not None:
            a = ipaddress.ip_address(preferred_nh)
            if isinstance(a, ipaddress.IPv4Address):
                want_nh = b"\0" * 10 + b"\xff\xff" + a.packed
            else:
                want_nh = a.packed
        candidates = sorted(
            ((k, r) for k, r in self.routes.items() if k[0] == best_prefix),
            key=lambda kr: kr[1].seq)
        selected = candidates[0][1]
        for _k, r in candidates:
            if want_nh is not None and r.next_hop == want_nh:
                selected = r
                break
        return selected, best_prefix

    def snapshot_rows(self, exporter: bytes) -> list[tuple]:
        """Routes-frame rows for the LPM join, one per route, ordered
        by insertion (RIB.snapshot_rows schema + seq column so the
        probe can mirror LookupRoute's first-inserted default)."""
        out = []
        for (prefix, _ref, _family, _pid, _rd), route in sorted(
                self.routes.items(), key=lambda kv: kv[1].seq):
            lo, hi = prefix_range(prefix)
            out.append((
                exporter,
                route.asn,
                list(route.as_path),
                list(route.communities),
                route.next_hop,
                lo,
                hi,
                prefix_mapped_len(prefix),
                [tuple(int(x) for x in lc) for lc in route.large_communities],
                route.seq,
            ))
        return out

    def to_frame(self, spark, exporter: bytes):
        from akvorado_spark.sources.tables import local_df

        return local_df(
            spark,
            self.snapshot_rows(exporter),
            "exporter binary, dst_as long, as_path array<long>, "
            "communities array<long>, next_hop binary, lo binary, hi binary, "
            "plen int, "
            "large_communities array<struct<asn:bigint,local1:bigint,local2:bigint>>, "
            "seq long",
        )
