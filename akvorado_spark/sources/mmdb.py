"""MaxMind-DB (MMDB) reader — the GeoIP source (S12).

A pure-Python implementation of the public MaxMind DB file format
(maxmind.github.io/MaxMind-DB/): binary search tree over IP bits +
a typed, pointer-compressed data section.  The reference hot-reloads
country/city and ASN MMDBs and folds their prefixes into the networks
trie (outlet/geoip/, outlet/networks/root.go); here the reader walks
the whole tree once and emits (cidr, attrs) rows for
``networks_from_geoip`` — a tiny driver-side dimension build, after
which lookups are the broadcast LPM join (J5), never per-row Python.

Supports: record sizes 24/28/32, IPv4 and IPv6 trees, all data types
(pointer, string, double, bytes, uint16/32/64/128, int32, map, array,
bool, float).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR_SIZE = 16


@dataclass
class _Decoder:
    """Data-section decoder (spec §'Data Section Separator' onward)."""

    data: bytes
    base: int  # file offset of the data section (pointers are relative to it)

    def decode(self, offset: int, _depth: int = 0):
        """Decode the value at ``base + offset``; returns (value, next_offset).

        ``_depth`` bounds total recursion (containers + pointer hops):
        the spec forbids pointer-to-pointer, but a corrupt file can
        form pointer cycles that would otherwise recurse forever."""
        if _depth > 512:
            raise ValueError("MMDB data recursion too deep (pointer cycle?)")
        ctrl = self.data[self.base + offset]
        offset += 1
        dtype = ctrl >> 5
        if dtype == 1:  # pointer — special size encoding
            psize = (ctrl >> 3) & 0x3
            val = ctrl & 0x7
            b = self.data[self.base + offset: self.base + offset + psize + 1]
            offset += psize + 1
            if psize == 0:
                ptr = (val << 8) | b[0]
            elif psize == 1:
                ptr = ((val << 16) | (b[0] << 8) | b[1]) + 2048
            elif psize == 2:
                ptr = ((val << 24) | (b[0] << 16) | (b[1] << 8) | b[2]) + 526336
            else:
                ptr = int.from_bytes(b, "big")
            value, _ = self.decode(ptr, _depth + 1)
            return value, offset
        size = ctrl & 0x1F
        if dtype == 0:  # extended type
            dtype = self.data[self.base + offset] + 7
            offset += 1
        if size == 29:
            size = 29 + self.data[self.base + offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(self.data[self.base + offset: self.base + offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(self.data[self.base + offset: self.base + offset + 3], "big")
            offset += 3

        start = self.base + offset
        raw = self.data[start: start + size]
        if dtype == 2:  # utf8 string
            return raw.decode("utf-8"), offset + size
        if dtype == 3:  # double
            return struct.unpack(">d", raw)[0], offset + size
        if dtype == 4:  # bytes
            return raw, offset + size
        if dtype in (5, 6, 9, 10):  # uint16/32/64/128
            return int.from_bytes(raw, "big"), offset + size
        if dtype == 8:  # int32
            return int.from_bytes(raw, "big", signed=False), offset + size
        if dtype == 7:  # map
            out = {}
            for _ in range(size):
                key, offset = self.decode(offset, _depth + 1)
                out[key], offset = self.decode(offset, _depth + 1)
            return out, offset
        if dtype == 11:  # array
            items = []
            for _ in range(size):
                v, offset = self.decode(offset, _depth + 1)
                items.append(v)
            return items, offset
        if dtype == 14:  # bool — size IS the value
            return bool(size), offset
        if dtype == 15:  # float
            return struct.unpack(">f", raw)[0], offset + size
        raise ValueError(f"unknown MMDB data type {dtype}")


_CORRUPT_ERRS = (struct.error, IndexError, KeyError, TypeError,
                 UnicodeDecodeError, OverflowError)


class MMDBReader:
    """Error contract: a corrupt database raises ``ValueError`` from
    the constructor and from ``lookup``/``networks`` — never a bare
    decode-level exception (fuzz-asserted).  GeoIP files are
    operator-supplied downloads; a truncated one must fail legibly."""

    def __init__(self, data: bytes):
        self.data = data
        meta_at = data.rfind(_METADATA_MARKER)
        if meta_at < 0:
            raise ValueError("not an MMDB file (metadata marker missing)")
        try:
            meta_dec = _Decoder(data, meta_at + len(_METADATA_MARKER))
            self.metadata, _ = meta_dec.decode(0)
            self.node_count = self.metadata["node_count"]
            self.record_size = self.metadata["record_size"]
            self.ip_version = self.metadata.get("ip_version", 6)
        except _CORRUPT_ERRS as e:
            raise ValueError(f"corrupt MMDB metadata: {e}") from e
        if not isinstance(self.node_count, int) or not isinstance(self.record_size, int):
            raise ValueError("corrupt MMDB metadata: non-integer tree geometry")
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self._dec = _Decoder(data, self.tree_size + _DATA_SEPARATOR_SIZE)

    # -- search tree -------------------------------------------------------
    def _record(self, node: int, side: int) -> int:
        off = node * self.node_bytes
        d = self.data
        if self.record_size == 24:
            o = off + side * 3
            return int.from_bytes(d[o:o + 3], "big")
        if self.record_size == 28:
            if side == 0:
                return ((d[off + 3] >> 4) << 24) | int.from_bytes(d[off:off + 3], "big")
            return ((d[off + 3] & 0x0F) << 24) | int.from_bytes(d[off + 4:off + 7], "big")
        if self.record_size == 32:
            o = off + side * 4
            return int.from_bytes(d[o:o + 4], "big")
        raise ValueError(f"unsupported record size {self.record_size}")

    def _data_at(self, record: int):
        # record > node_count → pointer into the data section; the file
        # offset is tree_size + (record - node_count), landing after the
        # 16-byte separator.
        value, _ = self._dec.decode(record - self.node_count - _DATA_SEPARATOR_SIZE)
        return value

    def lookup(self, ip: bytes):
        """Longest-prefix lookup of a 4- or 16-byte address."""
        try:
            return self._lookup(ip)
        except _CORRUPT_ERRS as e:
            raise ValueError(f"corrupt MMDB tree/data section: {e}") from e

    def _lookup(self, ip: bytes):
        if self.ip_version == 4 and len(ip) == 16:
            ip = ip[12:]
        elif self.ip_version == 6 and len(ip) == 4:
            ip = b"\x00" * 10 + b"\xff\xff" + ip
        node = 0
        for i in range(len(ip) * 8):
            bit = (ip[i >> 3] >> (7 - (i & 7))) & 1
            node = self._record(node, bit)
            if node == self.node_count:
                return None  # spec: value == node_count → search miss
            if node > self.node_count:
                return self._data_at(node)
        return None

    def networks(self):
        """Enumerate (cidr, data) for every route in the tree (DFS)."""
        try:
            yield from self._networks()
        except _CORRUPT_ERRS as e:
            raise ValueError(f"corrupt MMDB tree/data section: {e}") from e

    def _networks(self):
        bits_total = 128 if self.ip_version == 6 else 32
        stack = [(0, 0, 0)]  # node, depth, prefix int
        while stack:
            node, depth, prefix = stack.pop()
            for side in (1, 0):
                rec = self._record(node, side)
                child_prefix = (prefix << 1) | side
                if rec == self.node_count:
                    continue  # empty branch
                if rec > self.node_count:
                    yield self._cidr(child_prefix, depth + 1, bits_total), self._data_at(rec)
                elif depth + 1 < bits_total:
                    stack.append((rec, depth + 1, child_prefix))

    @staticmethod
    def _cidr(prefix: int, depth: int, bits_total: int) -> str:
        import ipaddress

        addr_int = prefix << (bits_total - depth)
        if bits_total == 32:
            return f"{ipaddress.IPv4Address(addr_int)}/{depth}"
        addr = ipaddress.IPv6Address(addr_int)
        # v4-mapped subtree renders as plain IPv4 (the reference's
        # networks table stores v4 prefixes unmapped)
        if depth >= 96 and addr.ipv4_mapped is not None:
            return f"{addr.ipv4_mapped}/{depth - 96}"
        return f"{addr}/{depth}"


# -- attribute extraction (GeoLite2 document shapes) -----------------------


def geo_attrs(doc: dict) -> dict:
    """Country/city-DB record → networks attrs (reference
    outlet/geoip feeds country/state/city + asn into the trie)."""
    out = {}
    country = doc.get("country") or doc.get("registered_country") or {}
    if "iso_code" in country:
        out["country"] = country["iso_code"]
    subs = doc.get("subdivisions") or []
    if subs and "iso_code" in subs[0]:
        out["state"] = subs[0]["iso_code"]
    city = (doc.get("city") or {}).get("names", {})
    if "en" in city:
        out["city"] = city["en"]
    if "autonomous_system_number" in doc:
        out["asn"] = doc["autonomous_system_number"]
    if "autonomous_system_organization" in doc:
        out["name"] = doc["autonomous_system_organization"]
    return out


def ipinfo_attrs(doc: dict) -> dict:
    """ipinfo-format record → networks attrs (reference
    outlet/geoip/iter_ipinfo.go:18-76): flat string keys ``country``/
    ``region``/``city``, ASN as an ``"AS13335"`` string — records with
    an unparseable ASN or no recognized key are skipped upstream."""
    out = {}
    if isinstance(doc.get("country"), str):
        out["country"] = doc["country"]
    if isinstance(doc.get("region"), str):
        out["state"] = doc["region"]
    if isinstance(doc.get("city"), str):
        out["city"] = doc["city"]
    asn = doc.get("asn")
    if isinstance(asn, str) and asn[:2] == "AS" and asn[2:].isdigit():
        out["asn"] = int(asn[2:])
    if isinstance(doc.get("name"), str):
        out["name"] = doc["name"]
    return out


def read_mmdb_networks(data: bytes) -> list[tuple[str, dict]]:
    """MMDB bytes → [(cidr, attrs)] for ``networks_from_geoip``.

    Vendor dispatch mirrors the reference (outlet/geoip/database.go:
    88-95): a ``database_type`` metadata starting with ``ipinfo ``
    selects the flat ipinfo record shape, anything else the GeoLite2
    nested shape."""
    reader = MMDBReader(data)
    dbtype = str(reader.metadata.get("database_type", ""))
    attrs = ipinfo_attrs if dbtype.startswith("ipinfo ") else geo_attrs
    return [(cidr, attrs(doc)) for cidr, doc in reader.networks() if isinstance(doc, dict)]
