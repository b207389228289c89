"""Full-fidelity BMP provider parity, pinned by replaying the
reference's Juniper vMX pcap fixtures
(outlet/routing/provider/bmp/root_test.go TestBMP) through
:class:`BMPProvider` and diffing metrics + RIB dumps against the Go
test's literal expectations — ADD-PATH, L3VPN/EVPN NLRI, RD/RT
filters, collect toggles, stale peers. RD/RT text parsing mirrors
rd_test.go / rt_test.go."""

from __future__ import annotations

import os
import struct

import pytest

from akvorado_spark.sources.bmp import (
    BMPConfig,
    BMPProvider,
    format_rd,
    parse_rd,
    rt_from_extended_community,
)
from akvorado_spark.sources.pcap import read_pcap_l4

PCAP_DIR = "/root/reference/outlet/routing/provider/bmp/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PCAP_DIR), reason="reference pcap fixtures not available")


def send(p: BMPProvider, name: str, conn=("127.0.0.1", 0)) -> None:
    p.feed(read_pcap_l4(os.path.join(PCAP_DIR, name)), conn=conn)


def metrics(p: BMPProvider, *selects: str) -> dict[str, str]:
    return p.prom_metrics(*selects)


E = 'exporter="127.0.0.1"'


def base_counters(**over) -> dict[str, str]:
    """The counter set initialized on connection open, as root_test.go
    sees it after filtering out histogram/gauge noise."""
    out = {
        f'received_messages_total{{{E},type="initiation"}}': "0",
        f'received_messages_total{{{E},type="peer-down-notification"}}': "0",
        f'received_messages_total{{{E},type="peer-up-notification"}}': "0",
        f'received_messages_total{{{E},type="route-mirroring"}}': "0",
        f'received_messages_total{{{E},type="route-monitoring"}}': "0",
        f'received_messages_total{{{E},type="statistics-report"}}': "0",
        f'received_messages_total{{{E},type="termination"}}': "0",
        f'received_messages_total{{{E},type="unknown"}}': "0",
        f'closed_connections_total{{{E}}}': "0",
        f'opened_connections_total{{{E}}}': "1",
        f'peers{{{E}}}': "0",
        f'routes{{{E}}}': "0",
        f'prefixes_added_total{{{E}}}': "0",
        f'prefixes_removed_total{{{E}}}': "0",
        f'prefixes_updated_total{{{E}}}': "0",
    }
    for k, v in over.items():
        pass
    out.update(over)
    return out


def counters(init="0", peer_down="0", peer_up="0", mirror="0", monitor="0",
             stats="0", term="0", unknown="0", closed="0", opened="1",
             peers="0", routes="0", added="0", removed="0", updated="0",
             **extra) -> dict[str, str]:
    out = base_counters(**{
        f'received_messages_total{{{E},type="initiation"}}': init,
        f'received_messages_total{{{E},type="peer-down-notification"}}': peer_down,
        f'received_messages_total{{{E},type="peer-up-notification"}}': peer_up,
        f'received_messages_total{{{E},type="route-mirroring"}}': mirror,
        f'received_messages_total{{{E},type="route-monitoring"}}': monitor,
        f'received_messages_total{{{E},type="statistics-report"}}': stats,
        f'received_messages_total{{{E},type="termination"}}': term,
        f'received_messages_total{{{E},type="unknown"}}': unknown,
        f'closed_connections_total{{{E}}}': closed,
        f'opened_connections_total{{{E}}}': opened,
        f'peers{{{E}}}': peers,
        f'routes{{{E}}}': routes,
        f'prefixes_added_total{{{E}}}': added,
        f'prefixes_removed_total{{{E}}}': removed,
        f'prefixes_updated_total{{{E}}}': updated,
    })
    out.update(extra)
    return out


# The expected RIB for init+peers-up+eor+reach+reach-addpath
# (root_test.go "init, peers up, eor, reach NLRI").
FULL_RIB = {
    "2001:db8::3": [
        "[ipv6-unicast] 2001:db8:1::/64 via 2001:db8::3 0:0/0 174 [65013 65013 174 174 174] [4260691978 4260691988] []",
        "[ipv6-unicast] 2001:db8:2::/64 via 2001:db8::3 0:0/0 12322 [65013 65013 1299 1299 1299 12322] [4260691998] []",
        "[ipv6-unicast] 2001:db8::2/127 via 2001:db8::3 0:0/0 65013 [65013] [] []",
    ],
    "2001:db8::7": [
        "[ipv4-unicast] 192.0.2.6/31 via 192.0.2.7 0:0/0 65017 [65017] [] []",
        "[ipv6-unicast] 2001:db8:1::/64 via 2001:db8::7 0:0/0 174 [65017 65013 174 174 174] [4260954122 4260954132] [{65017 300 4}]",
        "[ipv6-unicast] 2001:db8:2::/64 via 2001:db8::7 0:0/0 12322 [65017 65017 1299 1299 1299 12322] [4260954142] [{65017 400 2}]",
        "[ipv6-unicast] 2001:db8::6/127 via 2001:db8::7 0:0/0 65017 [65017] [] []",
        "[l2vpn-evpn] 198.51.100.0/26 via 2001:db8::7 65017:104/0 64476 [65017 65017 3356 64476] [4260955215] []",
        "[l3vpn-ipv4-unicast] 198.51.100.0/25 via 192.0.2.7 65017:101/0 64476 [65017 65017 174 1299 64476] [4260954122 4260954132] []",
        "[l3vpn-ipv4-unicast] 198.51.100.0/25 via 192.0.2.7 65017:102/0 64476 [65017 65017 174 3356 3356 3356 64476] [4260954122 4260954132] []",
        "[l3vpn-ipv4-unicast] 198.51.100.0/26 via 192.0.2.7 65017:103/0 64476 [65017 65017 3356 64476] [4260955215] []",
        "[l3vpn-ipv4-unicast] 198.51.100.128/25 via 192.0.2.7 65017:101/0 396919 [65017 65017 174 29447 396919] [4260954124] []",
        "[l3vpn-ipv4-unicast] 198.51.100.128/25 via 192.0.2.7 65017:102/0 396919 [65017 65017 6453 396919] [4260954131] []",
        "[l3vpn-ipv6-unicast] 2001:db8:4::/64 via 2001:db8::7 65017:101/0 29447 [65017 65017 1299 1299 1299 29447] [4260954412] []",
    ],
    "192.0.2.1": [
        "[ipv4-unicast] 192.0.2.0/31 via 192.0.2.1 0:0/0 65011 [65011] [] []",
        "[ipv4-unicast] 198.51.100.0/25 via 192.0.2.1 0:0/0 64476 [65011 65011 174 1299 64476] [4260560906 4260560916] []",
        "[ipv4-unicast] 198.51.100.128/25 via 192.0.2.1 0:0/0 396919 [65011 65011 174 29447 396919] [4260560908] []",
    ],
    "192.0.2.5": [
        "[ipv4-unicast] 192.0.2.4/31 via 192.0.2.5 0:0/1 65500 [] [] []",
    ],
}


def test_parse_rd_table():
    """rd_test.go TestParseRouteDistinguisher."""
    cases = [
        ("0", 0, "0:0"),
        ("100", 100, "0:100"),
        ("51324:65201", 220434901565105, None),
        ("51324:65536", 220434901565440, None),
        ("65535:0", 281470681743360, None),
        ("0:65535:0", 281470681743360, "65535:0"),
        ("65536:0", 562954248388608, None),
        ("65536:3", 562954248388611, None),
        ("2:65535:0", 562954248323072, None),
        ("1.1.1.1:0", 282578800148480, None),
        ("1:1.1.1.1:0", 282578800148480, "1.1.1.1:0"),
    ]
    for text, expected, canonical in cases:
        got = parse_rd(text)
        assert got == expected, text
        assert format_rd(got) == (canonical or text), text
    for bad in ["gfjkgjkf", "18446744073709551616", "65536:65536",
                "0:65536:0", "2:65536:65536", "1:1897:0", "2:1897:65536",
                "2:1.1.1.1:0", "0:1.1.1.1:0"]:
        with pytest.raises(ValueError):
            parse_rd(bad)


def test_rt_from_extended_community():
    """rt_test.go TestRTFromExtendedCommunity."""
    # 2-octet AS RT 65017:104 (transitive type 0x00, subtype 0x02)
    two = bytes([0x00, 0x02]) + struct.pack(">HI", 65017, 104)
    assert format_rd(rt_from_extended_community(two)) == "65017:104"
    # 4-octet AS RT 100000:200 (type 0x02)
    four = bytes([0x02, 0x02]) + struct.pack(">IH", 100000, 200)
    assert format_rd(rt_from_extended_community(four)) == "100000:200"
    # Route origin subtype is not an RT
    origin = bytes([0x00, 0x03]) + struct.pack(">HI", 65017, 104)
    assert rt_from_extended_community(origin) is None


def test_init_terminate():
    """TestBMP 'init, terminate'."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    assert metrics(p) == counters(init="1")
    send(p, "bmp-terminate.pcap")
    assert metrics(p) == counters(init="1", term="1", closed="1")
    p.advance(7200)
    assert metrics(p) == counters(init="1", term="1", closed="1")


def test_peers_up_eor():
    """TestBMP 'init, peers up, eor'."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    send(p, "bmp-peers-up.pcap")
    send(p, "bmp-eor.pcap")
    assert metrics(p) == counters(init="1", peer_up="4", monitor="8",
                                  stats="4", peers="4")


def test_reach_with_addpath():
    """TestBMP 'init, peers up, eor, reach NLRI' — the headline
    scenario: 18 routes incl. an ADD-PATH path-id 1 route, L3VPN v4/v6
    and EVPN type-5 NLRI, exact RIB dump."""
    p = BMPProvider()
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap", "bmp-reach-addpath.pcap"]:
        send(p, f)
    assert metrics(p) == counters(init="1", peer_up="4", monitor="26",
                                  stats="4", peers="4", routes="18",
                                  added="11", updated="7")
    assert p.dump() == FULL_RIB


def test_reach_without_peers_up():
    """TestBMP 'init, no peers up, eor, reach NLRI': route monitoring
    creates peers on the fly; no OPEN negotiation happened."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    send(p, "bmp-reach.pcap")
    assert metrics(p) == counters(init="1", monitor="17", peers="3",
                                  routes="17", added="10", updated="7")


def test_reach_then_peers_up():
    """TestBMP 'init, no peers up, eor, reach NLRI, peers up'."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    send(p, "bmp-reach.pcap")
    send(p, "bmp-peers-up.pcap")
    send(p, "bmp-eor.pcap")
    assert metrics(p) == counters(init="1", peer_up="4", monitor="25",
                                  stats="4", peers="4", routes="17",
                                  added="10", updated="7")


def test_peer_down_removes_routes():
    """TestBMP 'init, peers up, eor, reach NLRI, 1 peer down'."""
    p = BMPProvider()
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap", "bmp-peer-down.pcap"]:
        send(p, f)
    assert metrics(p) == counters(
        init="1", peer_down="1", peer_up="4", monitor="25", stats="5",
        peers="3", routes="14", added="10", removed="1", updated="7",
        **{f'removed_peers_total{{{E}}}': "1"})
    expected = {ip: lines for ip, lines in FULL_RIB.items()
                if ip in ("2001:db8::3", "2001:db8::7")}
    assert p.dump() == expected


def test_rd_filter_single_vpn():
    """TestBMP 'only accept RD 65017:104'."""
    p = BMPProvider(BMPConfig(rds=(parse_rd("65017:104"),)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    assert metrics(p) == counters(init="1", peer_up="4", monitor="25",
                                  stats="4", peers="4", routes="1", added="1")
    assert p.dump() == {
        "2001:db8::7": [
            "[l2vpn-evpn] 198.51.100.0/26 via 2001:db8::7 65017:104/0 64476 [65017 65017 3356 64476] [4260955215] []",
        ],
    }


def test_rd_filter_absence():
    """TestBMP 'only accept RD 0:0' — 0 matches absence of RD, so only
    the plain unicast routes survive."""
    p = BMPProvider(BMPConfig(rds=(0,)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    assert metrics(p) == counters(init="1", peer_up="4", monitor="25",
                                  stats="4", peers="4", routes="10",
                                  added="8", updated="2")
    expected = {
        "2001:db8::3": FULL_RIB["2001:db8::3"],
        "2001:db8::7": [l for l in FULL_RIB["2001:db8::7"]
                        if "unicast] " in l and "l3vpn" not in l],
        "192.0.2.1": FULL_RIB["192.0.2.1"],
    }
    assert p.dump() == expected


def test_rt_filter_101():
    """TestBMP 'only accept RT 65017:101'."""
    p = BMPProvider(BMPConfig(rts=(parse_rd("65017:101"),)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    assert metrics(p, "routes", "prefixes_") == {
        f'routes{{{E}}}': "3",
        f'prefixes_added_total{{{E}}}': "3",
        f'prefixes_removed_total{{{E}}}': "0",
        f'prefixes_updated_total{{{E}}}': "0",
    }
    assert p.dump() == {
        "2001:db8::7": [
            "[l3vpn-ipv4-unicast] 198.51.100.0/25 via 192.0.2.7 65017:101/0 64476 [65017 65017 174 1299 64476] [4260954122 4260954132] []",
            "[l3vpn-ipv4-unicast] 198.51.100.128/25 via 192.0.2.7 65017:101/0 396919 [65017 65017 174 29447 396919] [4260954124] []",
            "[l3vpn-ipv6-unicast] 2001:db8:4::/64 via 2001:db8::7 65017:101/0 29447 [65017 65017 1299 1299 1299 29447] [4260954412] []",
        ],
    }


def test_rt_filter_103():
    """TestBMP 'only accept RT 65017:103' — the EVPN update carries
    several RTs, one acceptance keeps its whole NLRI set."""
    p = BMPProvider(BMPConfig(rts=(parse_rd("65017:103"),)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    assert metrics(p, "routes", "prefixes_") == {
        f'routes{{{E}}}': "2",
        f'prefixes_added_total{{{E}}}': "1",
        f'prefixes_removed_total{{{E}}}': "0",
        f'prefixes_updated_total{{{E}}}': "1",
    }
    assert p.dump() == {
        "2001:db8::7": [
            "[l2vpn-evpn] 198.51.100.0/26 via 2001:db8::7 65017:104/0 64476 [65017 65017 3356 64476] [4260955215] []",
            "[l3vpn-ipv4-unicast] 198.51.100.0/26 via 192.0.2.7 65017:103/0 64476 [65017 65017 3356 64476] [4260955215] []",
        ],
    }


def test_rt_filter_rejects_all():
    """TestBMP 'reject all with non-matching RT'."""
    p = BMPProvider(BMPConfig(rts=(parse_rd("1:1"),)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    assert metrics(p, "routes") == {f'routes{{{E}}}': "0"}


def test_rd_and_rt_filter():
    """TestBMP 'accept RD 65017:104 and RT 65017:103'."""
    p = BMPProvider(BMPConfig(rds=(parse_rd("65017:104"),),
                              rts=(parse_rd("65017:103"),)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    assert metrics(p, "routes", "prefixes_") == {
        f'routes{{{E}}}': "1",
        f'prefixes_added_total{{{E}}}': "1",
        f'prefixes_removed_total{{{E}}}': "0",
        f'prefixes_updated_total{{{E}}}': "0",
    }
    assert p.dump() == {
        "2001:db8::7": [
            "[l2vpn-evpn] 198.51.100.0/26 via 2001:db8::7 65017:104/0 64476 [65017 65017 3356 64476] [4260955215] []",
        ],
    }


def test_rt_filter_zero_accepts_rtless():
    """TestBMP 'only accept RT 0' — updates with no RT at all pass."""
    p = BMPProvider(BMPConfig(rts=(0,)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    assert metrics(p, "routes", "prefixes_") == {
        f'routes{{{E}}}': "10",
        f'prefixes_added_total{{{E}}}': "8",
        f'prefixes_removed_total{{{E}}}': "0",
        f'prefixes_updated_total{{{E}}}': "2",
    }


def test_reach_unreach():
    """TestBMP 'init, peers up, eor, reach, unreach' (RDs=[0:0]):
    every unicast route is withdrawn again."""
    p = BMPProvider(BMPConfig(rds=(0,)))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap", "bmp-unreach.pcap"]:
        send(p, f)
    assert metrics(p) == counters(init="1", peer_up="4", monitor="33",
                                  stats="4", peers="4", routes="0",
                                  added="8", removed="8", updated="2")
    assert p.dump() == {}


def test_l3vpn_peer():
    """TestBMP 'init, l3vpn peer': RD-instance peer type stamps its
    distinguisher on plain ipv4-unicast NLRI."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    send(p, "bmp-l3vpn.pcap")
    assert metrics(p) == counters(init="1", peer_up="1", monitor="3",
                                  stats="1", peers="1", routes="2", added="2")
    assert p.dump() == {
        "192.0.2.9": [
            "[ipv4-unicast] 192.0.2.8/31 via 192.0.2.9 65500:108/0 65019 [65019] [] []",
            "[ipv4-unicast] 198.51.100.0/29 via 192.0.2.9 65500:108/0 64476 [65019 65019 64476] [] []",
        ],
    }


def test_l3vpn_peer_rd_filters():
    """TestBMP l3vpn RD filtering: matching keeps, non-matching drops
    the whole peer's updates."""
    p = BMPProvider(BMPConfig(rds=(parse_rd("65500:108"),)))
    send(p, "bmp-init.pcap")
    send(p, "bmp-l3vpn.pcap")
    assert metrics(p, "routes") == {f'routes{{{E}}}': "2"}

    p2 = BMPProvider(BMPConfig(rds=(parse_rd("65500:110"),)))
    send(p2, "bmp-init.pcap")
    send(p2, "bmp-l3vpn.pcap")
    assert metrics(p2, "routes") == {f'routes{{{E}}}': "0"}


def test_l3vpn_collect_toggles():
    """TestBMP collect toggles: dropping AS paths/communities empties
    those columns; dropping ASNs zeroes the origin AS but keeps the
    path."""
    p = BMPProvider(BMPConfig(collect_communities=False,
                              collect_as_paths=False))
    send(p, "bmp-init.pcap")
    send(p, "bmp-l3vpn.pcap")
    assert p.dump() == {
        "192.0.2.9": [
            "[ipv4-unicast] 192.0.2.8/31 via 192.0.2.9 65500:108/0 65019 [] [] []",
            "[ipv4-unicast] 198.51.100.0/29 via 192.0.2.9 65500:108/0 64476 [] [] []",
        ],
    }

    p2 = BMPProvider(BMPConfig(collect_asns=False, collect_communities=False))
    send(p2, "bmp-init.pcap")
    send(p2, "bmp-l3vpn.pcap")
    assert p2.dump() == {
        "192.0.2.9": [
            "[ipv4-unicast] 192.0.2.8/31 via 192.0.2.9 65500:108/0 0 [65019] [] []",
            "[ipv4-unicast] 198.51.100.0/29 via 192.0.2.9 65500:108/0 0 [65019 65019 64476] [] []",
        ],
    }


def test_unreach_without_reach():
    """TestBMP 'init, peers up, eor, unreach': withdrawals for routes
    never announced are no-ops."""
    p = BMPProvider()
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-unreach.pcap"]:
        send(p, f)
    assert metrics(p) == counters(init="1", peer_up="4", monitor="16",
                                  stats="4", peers="4")


def test_reach_unreach_twice():
    """TestBMP 'init, peers up, eor, reach, unreach×2' with all
    collect toggles off: only the tweaked EVPN route survives, with
    zeroed attributes."""
    p = BMPProvider(BMPConfig(collect_asns=False, collect_as_paths=False,
                              collect_communities=False))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap", "bmp-unreach.pcap", "bmp-unreach.pcap"]:
        send(p, f)
    assert metrics(p) == counters(init="1", peer_up="4", monitor="41",
                                  stats="4", peers="4", routes="1",
                                  added="10", removed="9", updated="7")
    assert p.dump() == {
        "2001:db8::7": [
            "[l2vpn-evpn] 198.51.100.0/26 via 2001:db8::7 65017:104/0 0 [] [] []",
        ],
    }


def test_reach_before_eor():
    """TestBMP 'init, peers up, reach, eor' (no paths/communities)."""
    p = BMPProvider(BMPConfig(collect_as_paths=False,
                              collect_communities=False))
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-reach.pcap",
              "bmp-eor.pcap"]:
        send(p, f)
    assert metrics(p) == counters(init="1", peer_up="4", monitor="25",
                                  stats="4", peers="4", routes="17",
                                  added="10", updated="7")
    stripped = {
        ip: [l.split(" [")[0] + " [] [] []"
             for l in lines if "192.0.2.4/31" not in l]
        for ip, lines in FULL_RIB.items()
    }
    stripped = {ip: lines for ip, lines in stripped.items() if lines}
    assert p.dump() == stripped


def test_connection_down_stale_removal():
    """TestBMP 'init, l3vpn peer, connection down': routes survive the
    disconnect for the keep interval, then the stale peer is
    flushed."""
    p = BMPProvider(BMPConfig(collect_as_paths=False,
                              collect_communities=False))
    send(p, "bmp-init.pcap")
    send(p, "bmp-l3vpn.pcap")
    p.close(("127.0.0.1", 0))
    assert metrics(p) == counters(init="1", peer_up="1", monitor="3",
                                  stats="1", closed="1", peers="1",
                                  routes="2", added="2")
    assert set(p.dump()) == {"192.0.2.9"}
    p.advance(7200)
    assert metrics(p) == counters(
        init="1", peer_up="1", monitor="3", stats="1", closed="1",
        peers="0", routes="0", added="2", removed="2",
        **{f'removed_peers_total{{{E}}}': "1"})
    assert p.dump() == {}


def test_unknown_family_ignored():
    """TestBMP 'init, l3vpn peer, unknown family, reach': the whole
    update is dropped and counted, no phantom peer appears."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    send(p, "bmp-l3vpn.pcap")
    send(p, "bmp-reach-unknown-family.pcap")
    assert metrics(p) == counters(
        init="1", peer_up="1", monitor="4", stats="1", peers="1",
        routes="2", added="2",
        **{f'ignored_updates_total{{error="afi-safi",{E}}}': "1"})
    assert set(p.dump()) == {"192.0.2.9"}


def test_vpls_nlri_ignored():
    """TestBMP 'init, l3vpn peer, unhandled family, reach': VPLS
    parses but each NLRI is ignored; its peer still registers."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    send(p, "bmp-l3vpn.pcap")
    send(p, "bmp-reach-vpls.pcap")
    assert metrics(p) == counters(
        init="1", peer_up="1", monitor="4", stats="1", peers="2",
        routes="2", added="2",
        **{f'ignored_nlri_total{{{E},type="l2vpn-vpls"}}': "1"})


def test_two_connections_share_rib():
    """TestBMP 'init, l3vpn peer, init, l3vpn peer, connection down':
    the same peer over two connections is two RIB peers; closing one
    connection only stales its own."""
    p = BMPProvider(BMPConfig(collect_as_paths=False,
                              collect_communities=False))
    c1, c2 = ("127.0.0.1", 1), ("127.0.0.1", 2)
    send(p, "bmp-init.pcap", conn=c1)
    send(p, "bmp-l3vpn.pcap", conn=c1)
    send(p, "bmp-init.pcap", conn=c2)
    send(p, "bmp-l3vpn.pcap", conn=c2)
    p.close(c1)
    assert metrics(p) == counters(
        init="2", peer_up="2", monitor="6", stats="2", opened="2",
        closed="1", peers="2", routes="4", added="2", updated="2")
    assert p.dump() == {
        "192.0.2.9": [
            "[ipv4-unicast] 192.0.2.8/31 via 192.0.2.9 65500:108/0 65019 [] [] []",
            "[ipv4-unicast] 192.0.2.8/31 via 192.0.2.9 65500:108/0 65019 [] [] []",
            "[ipv4-unicast] 198.51.100.0/29 via 192.0.2.9 65500:108/0 64476 [] [] []",
            "[ipv4-unicast] 198.51.100.0/29 via 192.0.2.9 65500:108/0 64476 [] [] []",
        ],
    }
    p.advance(7200)
    assert metrics(p, "peers", "routes") == {
        f'peers{{{E}}}': "1", f'routes{{{E}}}': "2"}


def test_lookup_prefers_next_hop():
    """rib.go LookupRoute: best prefix wins; among its routes the
    first-inserted is the default, a matching next hop overrides."""
    p = BMPProvider()
    for f in ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
              "bmp-reach.pcap"]:
        send(p, f)
    # 198.51.100.0/25 has ipv4-unicast + two l3vpn routes; default is
    # the first-inserted (via 192.0.2.1 or .7 depending on stream
    # order), preferred-NH overrides.
    route, prefix = p.lookup("198.51.100.77", preferred_nh="192.0.2.7")
    assert prefix == "198.51.100.0/25"
    assert route.next_hop[-4:] == bytes([192, 0, 2, 7])
    route1, _ = p.lookup("198.51.100.77", preferred_nh="192.0.2.1")
    assert route1.next_hop[-4:] == bytes([192, 0, 2, 1])
    # /26 is more specific than /25 for the low quarter
    _route2, prefix2 = p.lookup("198.51.100.40")
    assert prefix2 == "198.51.100.0/26"


def test_juniper_snapshot_literal_matches_replay():
    """The embedded Juniper RIB snapshot in lpm_queries (the
    no-reference fallback feeding the lpm_rib oracle) equals the live
    BMPProvider replay — a parser regression shifts the replay and
    breaks this pin before it can silently change the oracle."""
    from akvorado_spark.oracle.lpm_queries import (
        JUNIPER_RIB_SNAPSHOT, juniper_rib_rows)

    replayed = [(lo.hex(), hi.hex(), plen, nh.hex(), seq, asn)
                for (lo, hi, plen, nh, seq, asn) in juniper_rib_rows()]
    assert replayed == list(JUNIPER_RIB_SNAPSHOT)


def test_rib_lookup_join_nh_preference(spark):
    """rib_lookup_join mirrors rib.go LookupRoute on the Spark side:
    longest prefix, then the route matching the flow's next hop,
    defaulting to first-inserted — and the fact side stays a broadcast
    cascade (no shuffle, no cartesian)."""
    from akvorado_spark.functions.ip import ip_bytes
    from akvorado_spark.operators.lpm import rib_lookup_join
    from akvorado_spark.sources.tables import local_df

    def route(cidr, nh, seq, asn):
        from akvorado_spark.functions.ip import (
            prefix_mapped_len, prefix_range)
        lo, hi = prefix_range(cidr)
        return (lo, hi, prefix_mapped_len(cidr), ip_bytes(nh), seq, asn)

    routes = local_df(spark, [
        route("10.0.0.0/8", "192.0.2.1", 1, 100),
        route("10.0.0.0/8", "192.0.2.2", 2, 200),
        route("10.1.0.0/16", "192.0.2.3", 3, 300),
    ], "lo binary, hi binary, plen int, next_hop binary, seq long, dst_as long")
    flows = local_df(spark, [
        (ip_bytes("10.2.0.0"), ip_bytes("192.0.2.2")),   # /8, NH match → 200
        (ip_bytes("10.2.0.0"), ip_bytes("192.0.2.9")),   # /8, no match → first (100)
        (ip_bytes("10.1.0.1"), ip_bytes("192.0.2.1")),   # /16 wins → 300
        (ip_bytes("11.0.0.1"), ip_bytes("192.0.2.1")),   # miss → NULL
    ], "ip binary, nh binary")
    out = rib_lookup_join(flows, routes, "ip", "nh", attrs=["dst_as"],
                          plens=[104, 112])
    got = [r["dst_as"] for r in out.collect()]
    assert got == [200, 100, 300, None]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_snapshot_frame_schema(spark):
    """The provider snapshot keeps the routes-frame schema the LPM
    join consumes, plus insertion order."""
    p = BMPProvider()
    send(p, "bmp-init.pcap")
    send(p, "bmp-l3vpn.pcap")
    frame = p.to_frame(spark, bytes(16))
    rows = frame.orderBy("seq").collect()
    assert [r["dst_as"] for r in rows] == [65019, 64476]
    assert rows[1]["as_path"] == [65019, 65019, 64476]
