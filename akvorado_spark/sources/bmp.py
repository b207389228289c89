"""BMP → BGP RIB snapshot source (S14; reference
outlet/routing/provider/bmp/).

Pure-Python parsers for BMP (RFC 7854) and the BGP UPDATE messages it
carries (RFC 4271 + multiprotocol extensions RFC 4760, 4-octet ASNs
RFC 6793, large communities RFC 8092), feeding a driver-side
:class:`RIB` whose snapshot becomes the routes DataFrame the
longest-prefix-match join consumes (J4).

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
_COMMUNITIES, _MP_REACH, _MP_UNREACH, _LARGE_COMMUNITIES = 8, 14, 15, 32


def _prefixes(data: bytes, off: int, end: int, v6: bool) -> list[str]:
    """NLRI field: (prefix-length, truncated prefix bytes)*."""
    out = []
    total = 16 if v6 else 4
    while off < end:
        plen = data[off]
        nbytes = (plen + 7) // 8
        raw = data[off + 1: off + 1 + nbytes] + b"\0" * (total - nbytes)
        off += 1 + nbytes
        addr = ipaddress.IPv6Address(raw) if v6 else ipaddress.IPv4Address(raw)
        out.append(f"{addr}/{plen}")
    return out


def parse_bgp_update(data: bytes) -> dict:
    """One BGP message (with the 19-byte header) → update dict:
    ``{"announced": [cidr], "withdrawn": [cidr], "attrs": {...}}``."""
    if len(data) < 19 or data[:16] != b"\xff" * 16:
        raise ValueError("bad BGP marker")
    length, mtype = struct.unpack_from(">HB", data, 16)
    out = {"announced": [], "withdrawn": [], "attrs": {}}
    if mtype != 2:  # not an UPDATE (OPEN/KEEPALIVE inside peer-up etc.)
        return out
    off = 19
    wlen = struct.unpack_from(">H", data, off)[0]
    out["withdrawn"] += _prefixes(data, off + 2, off + 2 + wlen, v6=False)
    off += 2 + wlen
    alen = struct.unpack_from(">H", data, off)[0]
    attr_end = off + 2 + alen
    off += 2
    attrs: dict = {}
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
            path: list[int] = []
            p = 0
            while p < len(body):
                _segtype, n = body[p], body[p + 1]
                p += 2
                for _ in range(n):  # 4-octet ASNs (RFC 6793 session)
                    path.append(struct.unpack_from(">I", body, p)[0])
                    p += 4
            attrs["as_path"] = path
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
        elif atype == _MP_REACH:
            afi, _safi, nhlen = struct.unpack_from(">HBB", body, 0)
            nh = body[4:4 + nhlen]
            attrs["next_hop"] = nh[:16] if len(nh) >= 16 else b"\0" * 10 + b"\xff\xff" + nh[:4]
            out["announced"] += _prefixes(body, 4 + nhlen + 1, len(body), v6=(afi == 2))
        elif atype == _MP_UNREACH:
            afi, _safi = struct.unpack_from(">HB", body, 0)
            out["withdrawn"] += _prefixes(body, 3, len(body), v6=(afi == 2))
        elif atype == _ORIGIN:
            attrs["origin"] = body[0]
    out["announced"] += _prefixes(data, attr_end, length, v6=False)
    out["attrs"] = attrs
    return out


@dataclass
class BMPEvent:
    kind: str          # update | peer_up | peer_down | init | term | other
    peer: bytes = b""  # 16-byte peer address
    peer_as: int = 0
    update: dict | None = None


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


def _parse_bmp_stream(data: bytes) -> list[BMPEvent]:
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
        if mtype in (0, 2, 3):  # messages with a per-peer header
            _ptype, _pflags = data[body], data[body + 1]
            peer = data[body + 10: body + 26]
            peer_as = struct.unpack_from(">I", data, body + 26)[0]
            body += 42
            if mtype == 0:  # route monitoring
                upd = parse_bgp_update(data[body:end])
                events.append(BMPEvent("update", peer, peer_as, upd))
            elif mtype == 2:
                events.append(BMPEvent("peer_down", peer, peer_as))
            else:
                events.append(BMPEvent("peer_up", peer, peer_as))
        elif mtype == 4:
            events.append(BMPEvent("init"))
        elif mtype == 5:
            events.append(BMPEvent("term"))
        else:
            events.append(BMPEvent("other"))
        off = end
    return events


@dataclass
class RIB:
    """Adj-RIB-in keyed by (peer, prefix) (reference bmp/rib.go).

    ``apply`` folds a BMP byte stream in; ``snapshot_rows`` emits the
    routes-frame rows for ``lpm_join`` (exporter = the router the BMP
    session came from)."""

    routes: dict = field(default_factory=dict)  # (peer, cidr) -> attrs

    def apply(self, data: bytes) -> None:
        for ev in parse_bmp(data):
            if ev.kind == "update":
                attrs = dict(ev.update["attrs"])
                attrs.setdefault("peer_as", ev.peer_as)
                for cidr in ev.update["withdrawn"]:
                    self.routes.pop((ev.peer, cidr), None)
                for cidr in ev.update["announced"]:
                    self.routes[(ev.peer, cidr)] = attrs
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
