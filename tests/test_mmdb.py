"""MMDB reader tests (S12) — fixtures are built by an in-test writer
implementing the same public MaxMind-DB spec, so the reader is checked
against an independent encoding of the format (tree layouts for all
record sizes, pointerless data section, v4-mapped subtree)."""

from __future__ import annotations

import ipaddress
import struct
import time

from akvorado_spark.sources.mmdb import MMDBReader, geo_attrs, read_mmdb_networks

# ---- minimal MMDB writer (spec: maxmind.github.io/MaxMind-DB/) -----------


def enc(value) -> bytes:
    if isinstance(value, str):
        b = value.encode()
        if len(b) < 29:
            return bytes([(2 << 5) | len(b)]) + b
        assert len(b) < 285
        return bytes([(2 << 5) | 29, len(b) - 29]) + b
    if isinstance(value, bool):
        return bytes([(0 << 5) | int(value), 14 - 7])
    if isinstance(value, int):
        b = value.to_bytes((value.bit_length() + 7) // 8 or 1, "big")
        if value < 1 << 16:
            return bytes([(5 << 5) | len(b)]) + b
        if value < 1 << 32:
            return bytes([(6 << 5) | len(b)]) + b
        return bytes([(0 << 5) | len(b), 9 - 7]) + b  # uint64 (extended type)
    if isinstance(value, float):
        return bytes([(3 << 5) | 8]) + struct.pack(">d", value)
    if isinstance(value, dict):
        out = bytes([(7 << 5) | len(value)])
        for k, v in value.items():
            out += enc(k) + enc(v)
        return out
    if isinstance(value, list):
        out = bytes([(0 << 5) | len(value), 11 - 7])
        for v in value:
            out += enc(v)
        return out
    raise TypeError(type(value))


class MMDBWriter:
    def __init__(self, ip_version=6, record_size=24, database_type="Test-DB"):
        self.ip_version = ip_version
        self.record_size = record_size
        self.database_type = database_type
        self.root: list = [None, None]
        self.records: list[dict] = []

    def insert(self, cidr: str, doc: dict):
        net = ipaddress.ip_network(cidr)
        addr_int, plen = int(net.network_address), net.prefixlen
        total = 128 if self.ip_version == 6 else 32
        if self.ip_version == 6 and net.version == 4:
            addr_int |= 0xFFFF << 32
            plen += 96
        node = self.root
        for i in range(plen):
            bit = (addr_int >> (total - 1 - i)) & 1
            if i == plen - 1:
                node[bit] = ("data", len(self.records))
                self.records.append(doc)
            else:
                if node[bit] is None:
                    node[bit] = [None, None]
                elif isinstance(node[bit], tuple):
                    # nested prefix: split the enclosing leaf, copying its
                    # data to both children (how real MMDB trees encode
                    # a subnet carved out of a larger network)
                    node[bit] = [node[bit], node[bit]]
                node = node[bit]

    def build(self) -> bytes:
        nodes: list[list] = []

        def collect(n):
            nodes.append(n)
            for child in n:
                if isinstance(child, list):
                    collect(child)

        collect(self.root)
        node_index = {id(n): i for i, n in enumerate(nodes)}
        node_count = len(nodes)

        data_section = b""
        rec_offset = []
        for doc in self.records:
            rec_offset.append(len(data_section))
            data_section += enc(doc)

        def record_value(slot):
            if slot is None:
                return node_count
            if isinstance(slot, list):
                return node_index[id(slot)]
            return node_count + 16 + rec_offset[slot[1]]

        tree = b""
        for n in nodes:
            left, right = record_value(n[0]), record_value(n[1])
            if self.record_size == 24:
                tree += left.to_bytes(3, "big") + right.to_bytes(3, "big")
            elif self.record_size == 28:
                mid = ((left >> 24) << 4) | (right >> 24)
                tree += (left & 0xFFFFFF).to_bytes(3, "big") + bytes([mid]) \
                    + (right & 0xFFFFFF).to_bytes(3, "big")
            elif self.record_size == 32:
                tree += left.to_bytes(4, "big") + right.to_bytes(4, "big")

        metadata = {
            "binary_format_major_version": 2,
            "binary_format_minor_version": 0,
            "build_epoch": int(time.time()),
            "database_type": self.database_type,
            "description": {"en": "in-test fixture"},
            "ip_version": self.ip_version,
            "languages": ["en"],
            "node_count": node_count,
            "record_size": self.record_size,
        }
        return tree + b"\x00" * 16 + data_section + b"\xab\xcd\xefMaxMind.com" + enc(metadata)


COUNTRY_DOCS = [
    ("10.0.0.0/8", {"country": {"iso_code": "US"}}),
    ("10.1.0.0/16", {"country": {"iso_code": "US"},
                     "subdivisions": [{"iso_code": "CA"}],
                     "city": {"names": {"en": "San Francisco"}}}),
    ("198.51.100.0/24", {"country": {"iso_code": "FR"},
                         "city": {"names": {"en": "Paris"}}}),
    ("2001:db8::/32", {"country": {"iso_code": "DE"}}),
]


def _country_db(record_size=24) -> bytes:
    w = MMDBWriter(record_size=record_size, database_type="GeoLite2-City")
    for cidr, doc in COUNTRY_DOCS:
        w.insert(cidr, doc)
    return w.build()


def test_lookup_all_record_sizes():
    for rs in (24, 28, 32):
        r = MMDBReader(_country_db(record_size=rs))
        assert r.metadata["database_type"] == "GeoLite2-City"
        assert r.lookup(bytes([10, 1, 2, 3]))["subdivisions"][0]["iso_code"] == "CA"
        assert r.lookup(bytes([10, 9, 9, 9]))["country"]["iso_code"] == "US"
        assert r.lookup(bytes([198, 51, 100, 7]))["city"]["names"]["en"] == "Paris"
        assert r.lookup(bytes([8, 8, 8, 8])) is None
        v6 = ipaddress.IPv6Address("2001:db8::1").packed
        assert r.lookup(v6)["country"]["iso_code"] == "DE"
        # v4 lookup through the v4-mapped subtree with a 16-byte input
        mapped = b"\x00" * 10 + b"\xff\xff" + bytes([10, 1, 0, 1])
        assert r.lookup(mapped)["city"]["names"]["en"] == "San Francisco"


def test_networks_enumeration_roundtrip():
    nets = dict(read_mmdb_networks(_country_db()))
    assert nets["10.1.0.0/16"] == {"country": "US", "state": "CA", "city": "San Francisco"}
    assert nets["2001:db8::/32"] == {"country": "DE"}
    assert nets["198.51.100.0/24"] == {"country": "FR", "city": "Paris"}
    # the nested 10.1/16 split the enclosing 10/8 leaf: every emitted
    # prefix must sit inside an original and carry its attrs
    originals = [(ipaddress.ip_network(c), geo_attrs(d)) for c, d in COUNTRY_DOCS]
    for cidr, attrs in nets.items():
        net = ipaddress.ip_network(cidr)
        enclosing = [
            (o, a) for o, a in originals
            if o.version == net.version and net.subnet_of(o)
        ]
        assert enclosing, cidr
        deepest = max(enclosing, key=lambda oa: oa[0].prefixlen)
        assert attrs == deepest[1], cidr


def test_asn_db_and_geo_attrs():
    w = MMDBWriter(database_type="GeoLite2-ASN")
    w.insert("10.0.0.0/8", {"autonomous_system_number": 65001,
                            "autonomous_system_organization": "Acme"})
    r = MMDBReader(w.build())
    doc = r.lookup(bytes([10, 0, 0, 1]))
    assert geo_attrs(doc) == {"asn": 65001, "name": "Acme"}


def test_data_types_roundtrip():
    w = MMDBWriter()
    doc = {"s": "héllo", "u16": 7, "u32": 1 << 20, "u64": 1 << 40,
           "d": 2.5, "b": True, "arr": ["x", 3], "m": {"k": "v"}}
    w.insert("192.0.2.0/24", doc)
    got = MMDBReader(w.build()).lookup(bytes([192, 0, 2, 55]))
    assert got == doc


def test_networks_from_mmdb_lpm_join(spark):
    from akvorado_spark.operators.lpm import lpm_join
    from akvorado_spark.sources.remote import networks_from_mmdb

    asn = MMDBWriter(database_type="GeoLite2-ASN")
    asn.insert("10.0.0.0/8", {"autonomous_system_number": 65001})
    asn.insert("10.1.0.0/16", {"autonomous_system_number": 65002})
    nets = networks_from_mmdb(spark, _country_db(), asn.build())
    flows = spark.createDataFrame(
        [(b"\x00" * 10 + b"\xff\xff" + bytes([10, 1, 2, 3]),),
         (b"\x00" * 10 + b"\xff\xff" + bytes([198, 51, 100, 9]),)],
        "SrcAddr binary",
    )
    got = lpm_join(flows, nets, "SrcAddr", attrs=["country", "city", "asn"]).collect()
    by_city = {r["city"]: r for r in got}
    # longest match wins and inherits: /16 row carries the ASN of the /16
    assert by_city["San Francisco"]["asn"] == 65002
    assert by_city["San Francisco"]["country"] == "US"
    assert by_city["Paris"]["country"] == "FR" and by_city["Paris"]["asn"] is None


def test_fuzz_corrupt_mmdb_raises_only_valueerror():
    """A corrupt/truncated database must fail with ValueError from the
    constructor, networks() and lookup() — never a bare decode-level
    exception (GeoIP files are operator-supplied downloads)."""
    import random

    rnd = random.Random(20260815)
    for i in range(1500):
        n = rnd.randint(0, 400)
        b = bytes(rnd.getrandbits(8) for _ in range(n))
        if i % 2 == 0:
            b += b"\xab\xcd\xefMaxMind.com" + bytes(
                rnd.getrandbits(8) for _ in range(rnd.randint(0, 60))
            )
        try:
            r = MMDBReader(b)
            list(r.networks())
            r.lookup(b"\x7f\x00\x00\x01")
        except ValueError:
            pass


def test_ipinfo_db_dispatch():
    """ipinfo-format databases (flat country/region/city strings, ASN
    as 'ASxxxx') are detected via database_type and parsed with the
    flat record shape (reference outlet/geoip/database.go:88-95,
    iter_ipinfo.go:18-76)."""
    from akvorado_spark.sources.mmdb import read_mmdb_networks

    w = MMDBWriter(database_type="ipinfo standard_location")
    w.insert("::ffff:1.0.84.0/118", {"country": "JP", "region": "Shimane", "city": "Matsue"})
    w.insert("::ffff:2.19.4.0/120", {"country": "SG"})
    w.insert("::ffff:67.43.156.0/120", {"asn": "AS35908", "name": "Example"})
    w.insert("::ffff:9.9.9.0/120", {"asn": "not-an-asn"})
    nets = dict(read_mmdb_networks(w.build()))
    assert nets["1.0.84.0/22"] == {"country": "JP", "state": "Shimane", "city": "Matsue"}
    assert nets["2.19.4.0/24"] == {"country": "SG"}
    assert nets["67.43.156.0/24"] == {"asn": 35908, "name": "Example"}
    assert nets["9.9.9.0/24"] == {}
