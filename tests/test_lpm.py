"""LPM join tests — oracle is Python ipaddress over the same prefix set
(SURVEY §2.3 J3-J5)."""

from __future__ import annotations

import ipaddress

import pytest
from pyspark.sql import functions as F

from akvorado_spark.operators.lpm import lpm_join
from akvorado_spark.sources.fixtures import NETWORKS, flows_df, networks_df


def _py_lpm(addr_bytes: bytes):
    """Longest-prefix match + attribute inheritance in pure Python."""
    a = ipaddress.IPv6Address(bytes(addr_bytes))
    target = a.ipv4_mapped if a.ipv4_mapped is not None else a
    matches = []
    for row in NETWORKS:
        net = ipaddress.ip_network(row[0])
        if target.version == net.version and target in net:
            matches.append(row)
    if not matches:
        return None
    matches.sort(key=lambda r: ipaddress.ip_network(r[0]).prefixlen, reverse=True)

    def inherit(col):
        for m in matches:
            if m[col]:
                return m[col]
        return None

    return {
        "name": inherit(1),
        "site": inherit(3),
        "asn": next(m[9] for m in matches),  # asn always set in fixture
    }


def test_lpm_matches_python_oracle(spark):
    flows = flows_df(spark, n=3000).select("SrcAddr").distinct()
    nets = networks_df(spark)
    out = lpm_join(flows, nets, "SrcAddr", attrs=["name", "site", "asn"]).collect()
    assert out
    n_matched = 0
    for r in out:
        want = _py_lpm(r["SrcAddr"])
        if want is None:
            assert r["name"] is None
            continue
        n_matched += 1
        assert r["name"] == want["name"], (r["SrcAddr"].hex(), r["name"], want)
        assert r["asn"] == want["asn"]
        got_site = r["site"] if r["site"] else None
        want_site = want["site"] if want["site"] else None
        assert got_site == want_site
    assert n_matched > len(out) * 0.9  # fixture draws addresses from the prefixes


def test_lpm_nested_inheritance(spark):
    """10.1.2.x must take lab-level attrs but inherit region from /16|/8."""
    from akvorado_spark.functions.ip import ip_bytes

    flows = spark.createDataFrame([(ip_bytes("10.1.2.77"),)], "SrcAddr binary")
    nets = networks_df(spark)
    r = lpm_join(flows, nets, "SrcAddr", attrs=["name", "region", "asn"]).collect()[0]
    assert r["name"] == "corp-west-lab"  # /24 wins
    assert r["asn"] == 65510
    assert r["region"] == "us-west"  # /24 has region set in fixture? verify vs oracle
    want = _py_lpm(ip_bytes("10.1.2.77"))
    assert r["name"] == want["name"]


def test_lpm_exporter_keyed_fallback(spark):
    from akvorado_spark.functions.ip import ip_bytes, prefix_range, prefix_mapped_len

    lo1, _ = prefix_range("10.0.0.0/8")
    lo2, _ = prefix_range("10.1.0.0/16")
    exp_a = ip_bytes("192.0.2.1")
    exp_b = ip_bytes("192.0.2.2")
    routes = spark.createDataFrame(
        [
            (exp_a, lo2, prefix_mapped_len("10.1.0.0/16"), 111),
            (None, lo1, prefix_mapped_len("10.0.0.0/8"), 999),
        ],
        "exporter binary, lo binary, plen int, asn long",
    )
    flows = spark.createDataFrame(
        [
            (exp_a, ip_bytes("10.1.5.5")),  # exporter-specific /16 wins
            (exp_b, ip_bytes("10.1.5.5")),  # no route for exporter B → fallback /8
        ],
        "ExporterAddress binary, DstAddr binary",
    )
    rows = lpm_join(
        flows, routes, "DstAddr", attrs=["asn"], exporter_col="ExporterAddress"
    ).orderBy("ExporterAddress").collect()
    assert rows[0]["asn"] == 111
    assert rows[1]["asn"] == 999


def test_lpm_no_match_is_null(spark):
    from akvorado_spark.functions.ip import ip_bytes

    flows = spark.createDataFrame([(ip_bytes("8.8.8.8"),)], "SrcAddr binary")
    r = lpm_join(flows, networks_df(spark), "SrcAddr", attrs=["name"]).collect()[0]
    assert r["name"] is None


def test_merge_networks_config_order_wins_equal_prefix(spark):
    """Two sources defining the SAME prefix: the later-configured one
    wins the tie (reference geoip trie-insert order,
    outlet/geoip/iter.go); longer prefixes from ANY source still beat
    shorter ones."""
    from akvorado_spark.operators.lpm import lpm_join
    from akvorado_spark.sources.remote import merge_networks, networks_from_config

    first = networks_from_config(
        spark, [("10.0.0.0/8", {"country": "AA"}), ("10.1.0.0/16", {"country": "XX"})]
    )
    second = networks_from_config(spark, [("10.0.0.0/8", {"country": "BB"})])
    nets = merge_networks(first, second)
    flows = spark.createDataFrame(
        [
            (bytes([0] * 10 + [0xFF, 0xFF, 10, 2, 0, 1]),),   # /8 tie → BB
            (bytes([0] * 10 + [0xFF, 0xFF, 10, 1, 0, 1]),),   # /16 beats both
        ],
        "addr binary",
    )
    out = {bytes(r["addr"])[-4:]: r["country"]
           for r in lpm_join(flows, nets, "addr", attrs=["country"]).collect()}
    assert out[bytes([10, 2, 0, 1])] == "BB"
    assert out[bytes([10, 1, 0, 1])] == "XX"


def test_duplicate_equal_length_prefix_deterministic(spark):
    """Two identical-length duplicate prefixes setting the same
    attribute must resolve to the same winner regardless of row order
    (review finding: the max_by rank tied nondeterministically when no
    __prio column is present)."""
    from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range
    import pyspark.sql.types as T

    lo, hi = prefix_range("10.0.0.0/24")
    plen = prefix_mapped_len("10.0.0.0/24")
    st = T.StructType(
        [
            T.StructField("lo", T.BinaryType()),
            T.StructField("plen", T.IntegerType()),
            T.StructField("name", T.StringType()),
        ]
    )
    rows = [(lo, plen, "alpha"), (lo, plen, "beta")]
    flows = spark.createDataFrame(
        [(bytes(16 - 6) + bytes([0xFF, 0xFF, 10, 0, 0, 7]),)], "ip binary"
    )
    results = set()
    for order in (rows, rows[::-1]):
        pfx = spark.createDataFrame(order, st).repartition(2)
        got = lpm_join(flows, pfx, "ip", attrs=["name"], plens=[plen])
        results.add(got.collect()[0]["name"])
    assert len(results) == 1


def test_deep_hierarchical_inheritance(spark):
    """Mirror of the reference's TestLookupDeepHierarchicalInheritance
    (outlet/networks/root_test.go:169-229): sparse attributes at four
    nesting levels, sibling branches inherit only common ancestors,
    disjoint prefixes inherit nothing."""
    from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range
    import ipaddress
    import pyspark.sql.types as T

    table = [
        ("10.0.0.0/8", {"tenant": "corp"}),
        ("10.1.0.0/16", {"region": "eu-west"}),
        ("10.1.1.0/24", {"site": "paris"}),
        ("10.1.1.128/25", {"role": "server"}),
        ("10.2.0.0/16", {"name": "other"}),
        ("192.0.2.0/24", {"name": "elsewhere"}),
    ]
    attrs = ["tenant", "region", "site", "role", "name"]
    st = T.StructType(
        [T.StructField("lo", T.BinaryType()), T.StructField("plen", T.IntegerType())]
        + [T.StructField(a, T.StringType()) for a in attrs]
    )
    rows = []
    for cidr, vals in table:
        lo, _ = prefix_range(cidr)
        rows.append((lo, prefix_mapped_len(cidr)) + tuple(vals.get(a) for a in attrs))
    pfx = spark.createDataFrame(rows, st)

    cases = {
        "10.1.1.129": {"tenant": "corp", "region": "eu-west", "site": "paris", "role": "server"},
        "10.1.1.1": {"tenant": "corp", "region": "eu-west", "site": "paris"},
        "10.2.0.1": {"tenant": "corp", "name": "other"},
        "192.0.2.1": {"name": "elsewhere"},
        "10.3.0.1": {"tenant": "corp"},
    }
    flows = spark.createDataFrame(
        [(ip, ipaddress.IPv6Address(f"::ffff:{ip}").packed) for ip in cases],
        "ip string, addr binary",
    )
    got = lpm_join(flows, pfx, "addr", attrs=attrs).collect()
    for r in got:
        expected = cases[r["ip"]]
        for a in attrs:
            assert r[a] == expected.get(a), (r["ip"], a, r[a], expected)
