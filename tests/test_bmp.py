"""BMP / BGP UPDATE parser tests (S14) — datagrams packed from the
RFC layouts in-test, RIB lifecycle, and the LPM join off a snapshot."""

from __future__ import annotations

import struct

from akvorado_spark.sources.bmp import RIB, parse_bgp_update, parse_bmp

PEER1 = b"\x00" * 10 + b"\xff\xff" + bytes([192, 0, 2, 11])
PEER2 = b"\x00" * 10 + b"\xff\xff" + bytes([192, 0, 2, 12])
EXPORTER = b"\x00" * 10 + b"\xff\xff" + bytes([192, 0, 2, 1])


# ---- builders ------------------------------------------------------------


def attr(atype: int, body: bytes, flags: int = 0x40) -> bytes:
    if len(body) > 255:
        return bytes([flags | 0x10, atype]) + struct.pack(">H", len(body)) + body
    return bytes([flags, atype, len(body)]) + body


def nlri(cidr: str) -> bytes:
    import ipaddress

    net = ipaddress.ip_network(cidr)
    nbytes = (net.prefixlen + 7) // 8
    return bytes([net.prefixlen]) + net.network_address.packed[:nbytes]


def as_path(*asns: int) -> bytes:
    return bytes([2, len(asns)]) + b"".join(struct.pack(">I", a) for a in asns)


def bgp_update(announced=(), withdrawn=(), attrs=b"") -> bytes:
    w = b"".join(nlri(c) for c in withdrawn)
    n = b"".join(nlri(c) for c in announced)
    body = struct.pack(">H", len(w)) + w + struct.pack(">H", len(attrs)) + attrs + n
    length = 19 + len(body)
    return b"\xff" * 16 + struct.pack(">HB", length, 2) + body


def bmp_msg(mtype: int, peer: bytes, peer_as: int, payload: bytes = b"") -> bytes:
    per_peer = bytes([0, 0]) + b"\0" * 8 + peer + struct.pack(">II", peer_as, 0) \
        + struct.pack(">II", 0, 0)
    body = per_peer + payload
    return struct.pack(">BIB", 3, 6 + len(body), 0 if mtype == 0 else mtype) + body


# ---- BGP UPDATE ----------------------------------------------------------


def test_update_v4_announce_with_attrs():
    attrs = (
        attr(1, b"\x00")  # origin igp
        + attr(2, as_path(65001, 65002, 174))
        + attr(3, bytes([10, 0, 0, 254]))
        + attr(8, struct.pack(">II", (65000 << 16) | 100, (65000 << 16) | 200))
        + attr(32, struct.pack(">III", 65000, 1, 2))
    )
    upd = parse_bgp_update(bgp_update(announced=["10.0.0.0/8", "192.0.2.0/24"], attrs=attrs))
    assert upd["announced"] == ["10.0.0.0/8", "192.0.2.0/24"]
    assert upd["attrs"]["as_path"] == [65001, 65002, 174]
    assert upd["attrs"]["next_hop"][-4:] == bytes([10, 0, 0, 254])
    assert upd["attrs"]["communities"] == [(65000 << 16) | 100, (65000 << 16) | 200]
    assert upd["attrs"]["large_communities"] == [(65000, 1, 2)]


def test_update_v6_mp_reach_and_unreach():
    import ipaddress

    nh = ipaddress.IPv6Address("2001:db8::fe").packed
    v6net = ipaddress.ip_network("2001:db8:1::/48")
    mp_body = struct.pack(">HBB", 2, 1, 16) + nh + b"\x00" \
        + bytes([48]) + v6net.network_address.packed[:6]
    unreach = struct.pack(">HB", 2, 1) + bytes([32]) + ipaddress.ip_network(
        "2001:db8::/32").network_address.packed[:4]
    upd = parse_bgp_update(bgp_update(attrs=attr(14, mp_body) + attr(15, unreach)))
    assert upd["announced"] == ["2001:db8:1::/48"]
    assert upd["withdrawn"] == ["2001:db8::/32"]
    assert upd["attrs"]["next_hop"] == nh


def test_update_withdrawn_v4():
    upd = parse_bgp_update(bgp_update(withdrawn=["10.1.0.0/16"]))
    assert upd["withdrawn"] == ["10.1.0.0/16"] and upd["announced"] == []


# ---- BMP + RIB -----------------------------------------------------------


def test_bmp_stream_and_rib_lifecycle():
    r = RIB()
    m1 = bmp_msg(0, PEER1, 65001, bgp_update(
        announced=["10.0.0.0/8"], attrs=attr(2, as_path(65001, 64601))))
    m2 = bmp_msg(0, PEER2, 65002, bgp_update(
        announced=["10.64.0.0/10"], attrs=attr(2, as_path(65002, 64602))))
    r.apply(m1 + m2)
    assert len(r.routes) == 2

    # implicit replace: same (peer, prefix) announced again
    r.apply(bmp_msg(0, PEER1, 65001, bgp_update(
        announced=["10.0.0.0/8"], attrs=attr(2, as_path(65001, 64699)))))
    assert len(r.routes) == 2
    rows = {tuple(row[2]): row for row in r.snapshot_rows(EXPORTER)}
    assert (65001, 64699) in rows and rows[(65001, 64699)][1] == 64699

    # withdrawal removes one route
    r.apply(bmp_msg(0, PEER2, 65002, bgp_update(withdrawn=["10.64.0.0/10"])))
    assert len(r.routes) == 1

    # peer down purges the peer
    r.apply(bmp_msg(2, PEER1, 65001))
    assert r.routes == {}

    events = parse_bmp(m1 + bmp_msg(2, PEER1, 65001))
    assert [e.kind for e in events] == ["update", "peer_down"]
    assert events[0].peer == PEER1 and events[0].peer_as == 65001


def test_rib_snapshot_feeds_lpm_join(spark):
    from pyspark.sql import functions as F

    from akvorado_spark.operators.lpm import lpm_join

    r = RIB()
    r.apply(bmp_msg(0, PEER1, 65001, bgp_update(
        announced=["10.0.0.0/8"], attrs=attr(2, as_path(65001, 64601)))))
    r.apply(bmp_msg(0, PEER1, 65001, bgp_update(
        announced=["10.64.0.0/10"], attrs=attr(2, as_path(65001, 64602)))))
    routes = r.to_frame(spark, EXPORTER).drop("as_path", "communities", "next_hop")

    flows = spark.createDataFrame(
        [(EXPORTER, b"\x00" * 10 + b"\xff\xff" + bytes([10, 65, 0, 1])),
         (EXPORTER, b"\x00" * 10 + b"\xff\xff" + bytes([10, 1, 0, 1]))],
        "ExporterAddress binary, DstAddr binary",
    )
    got = lpm_join(flows, routes, "DstAddr", attrs=["dst_as"],
                   exporter_col="ExporterAddress").collect()
    by_ip = {bytes(row["DstAddr"])[-4:]: row["dst_as"] for row in got}
    assert by_ip[bytes([10, 65, 0, 1])] == 64602  # /10 beats /8
    assert by_ip[bytes([10, 1, 0, 1])] == 64601


def test_demo_bmp_stream_roundtrip():
    """demoexporter/bmp/client_test.go:30-114: the demo client's exact
    route table, encoded to a BMP byte stream and replayed through the
    production parser + RIB — announcements per family, communities,
    large communities, per-family next hops, and later updates for the
    same prefix replacing earlier ones."""
    from akvorado_spark.sources.bmp import RIB, parse_bmp
    from akvorado_spark.sources.bmp_encode import BMPRouteConfig, demo_bmp_stream

    routes = [
        BMPRouteConfig(prefixes=("2001:db8::/64",),
                       as_path=(65001, 65002, 65002),
                       communities=(500, 600, 700)),
        BMPRouteConfig(prefixes=("192.0.2.0/24", "203.0.113.0/24"),
                       as_path=(12322, 1299)),
        BMPRouteConfig(prefixes=("192.0.2.0/24", "2001:db8::/64"),
                       as_path=(65001, 65002),
                       large_communities=((65000, 100, 200), (65000, 300, 2000))),
    ]
    stream = demo_bmp_stream(routes)
    events = parse_bmp(stream)
    kinds = [e.kind for e in events]
    assert kinds[0] == "init" and kinds[1] == "peer_up"
    assert kinds.count("update") == 4  # v4: cfg2, cfg3; v6: cfg1, cfg3
    rib = RIB()
    rib.apply(stream)
    by_cidr = {cidr: attrs for (_peer, cidr), attrs in rib.routes.items()}
    assert set(by_cidr) == {"2001:db8::/64", "192.0.2.0/24", "203.0.113.0/24"}
    # 192.0.2.0/24: config 3 (sent later) replaced config 2
    r = by_cidr["192.0.2.0/24"]
    assert r["as_path"] == [65001, 65002]
    assert r["large_communities"] == [(65000, 100, 200), (65000, 300, 2000)]
    assert bytes(r["next_hop"])[-4:] == bytes([192, 0, 2, 1])
    # 203.0.113.0/24 keeps config 2's path
    assert by_cidr["203.0.113.0/24"]["as_path"] == [12322, 1299]
    # v6 route: config 3 replaced config 1 (communities gone, lc present)
    r6 = by_cidr["2001:db8::/64"]
    assert r6["as_path"] == [65001, 65002]
    assert "communities" not in r6
    assert r6["next_hop"] == bytes(
        __import__("ipaddress").ip_address("fe80::1").packed
    )


def test_subbyte_and_core_header_bmp_roundtrips():
    """r12: 1/4-bit MSB-first packed palette rows and the 12-byte OS/2
    BITMAPCOREHEADER (3-byte palette entries padded to 2**bits,
    bottom-up only) round-trip byte-exactly under both headers."""
    import numpy as np

    from akvorado_spark.operators.png import bmp_decode, bmp_encode, bmp_meta

    rng = np.random.default_rng(61)

    def pal_img(ncol, h, w):
        cols = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        return cols[rng.integers(0, ncol, (h, w))]

    for bits, ncol in ((1, 2), (4, 16)):
        for core in (False, True):
            for shape in ((1, 1), (5, 9), (7, 13)):
                px = pal_img(ncol, *shape)
                blob = bmp_encode(px, bits, core_header=core)
                w, h, ch, got = bmp_decode(blob)
                assert (w, h, ch) == (shape[1], shape[0], 3)
                assert np.array_equal(got, px), (bits, core, shape)
                assert bmp_meta(blob) == (shape[1], shape[0], 3)
    # 24-bit core header too
    px = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(px, 24, core_header=True))[3], px)
    # core header refuses layouts it cannot express
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bmp_encode(px, 24, top_down=True, core_header=True)
    with _pytest.raises(ValueError):
        bmp_encode(px, 32, core_header=True)


def test_rle_bmp_roundtrips_and_escapes():
    """BI_RLE8/RLE4 (r12): encoded runs, absolute mode with 2-byte
    alignment, end-of-line/bitmap escapes and the delta skip (skipped
    pixels stay palette[0]) — roundtrips via the fixture encoder plus
    a hand-built stream with an early end-of-bitmap."""
    import struct

    import numpy as np

    from akvorado_spark.operators.png import bmp_decode, bmp_encode

    rng = np.random.default_rng(81)
    for bits, ncol in ((4, 16), (8, 200)):
        for runs in (False, True):
            for shape in ((1, 1), (5, 9), (7, 13), (2, 300)):
                cols = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
                if runs:
                    idx = np.repeat(
                        rng.integers(0, ncol, (shape[0], shape[1] // 3 + 1)),
                        3, axis=1)[:, : shape[1]]
                else:
                    idx = rng.integers(0, ncol, shape)
                px = cols[idx]
                blob = bmp_encode(px, bits, rle=True)
                w, h, ch, got = bmp_decode(blob)
                assert (w, h, ch) == (shape[1], shape[0], 3)
                assert np.array_equal(got, px), (bits, runs, shape)
    # hand-built: run, EOL, short run, early EOB — the rest defaults
    stream = bytes([4, 1, 0, 0, 2, 2, 0, 1])
    pal = bytes([10, 10, 10, 0, 20, 20, 20, 0, 30, 30, 30, 0])
    pix_off = 14 + 40 + len(pal)
    blob = (b"BM" + struct.pack("<IHHI", pix_off + len(stream), 0, 0, pix_off)
            + struct.pack("<IiiHHIIiiII", 40, 4, 3, 1, 8, 1, len(stream), 0, 0, 3, 0)
            + pal + stream)
    w, h, ch, got = bmp_decode(blob)
    assert got[2].tolist() == [[20, 20, 20]] * 4  # bottom row: run of idx 1
    assert got[1].tolist()[:2] == [[30, 30, 30]] * 2  # middle: short run
    assert got[0].tolist() == [[10, 10, 10]] * 4  # untouched -> palette[0]
    # truncated stream fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bmp_decode(blob[:-3])
    # RLE with a depth mismatch is rejected
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 28, 4)  # bits -> 4 while compression=RLE8
    with _pytest.raises(ValueError):
        bmp_decode(bytes(bad))
