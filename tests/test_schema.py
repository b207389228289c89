"""Schema registry + fixture tests (SURVEY §1, FIXTURES §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.functions.arrays import array_compact
from akvorado_spark.schema.definition import flows_schema
from akvorado_spark.sources.fixtures import flows_df


def test_direction_symmetry_cloning():
    s = flows_schema()
    names = {c.name for c in s.columns}
    for src in [n for n in names if n.startswith("Src")]:
        assert "Dst" + src[3:] in names, src
    for inif in [n for n in names if n.startswith("InIf")]:
        assert "OutIf" + inif[4:] in names, inif
    assert s.reverse_name("SrcAddr") == "DstAddr"
    assert s.reverse_name("OutIfName") == "InIfName"
    assert s.reverse_name("Proto") == "Proto"


def test_rollup_keys_drop_main_only():
    s = flows_schema()
    keys = set(s.rollup_keys())
    assert "SrcAddr" not in keys and "SrcPort" not in keys  # MainOnly
    assert "Bytes" not in keys and "Packets" not in keys  # summed
    assert {"ExporterAddress", "SrcAS", "InIfName", "EType", "Proto"} <= keys


def test_array_compact(spark):
    df = spark.createDataFrame(
        [([1, 1, 2, 2, 1, 3],), ([5],), ([],), ([7, 7, 7],)], "a array<long>"
    )
    out = [r["c"] for r in df.select(array_compact(F.col("a")).alias("c")).collect()]
    assert out == [[1, 2, 1, 3], [5], [], [7]]


def test_ingest_generates_first_asns(spark):
    s = flows_schema()
    df = flows_df(spark, n=500)
    enriched = s.ingest(df)
    rows = enriched.select("DstASPath", "Dst1stAS", "Dst2ndAS", "Dst3rdAS").collect()
    for r in rows:
        path = r["DstASPath"]
        compacted = [path[0]] + [x for i, x in enumerate(path[1:], 1) if x != path[i - 1]]
        for pos, col in enumerate(["Dst1stAS", "Dst2ndAS", "Dst3rdAS"]):
            want = compacted[pos] if pos < len(compacted) else None
            assert r[col] == want, (path, compacted, r)


def test_view_packet_size(spark):
    s = flows_schema()
    df = s.view(s.ingest(flows_df(spark, n=500)))
    rows = df.select("Bytes", "Packets", "PacketSize", "PacketSizeBucket").limit(50).collect()
    for r in rows:
        assert r["PacketSize"] == r["Bytes"] // r["Packets"]
        lo, hi = r["PacketSizeBucket"].split("-")
        assert int(lo) <= r["PacketSize"]
        assert hi == "Inf" or r["PacketSize"] <= int(hi)


def test_view_net_prefix(spark):
    import ipaddress

    s = flows_schema()
    df = s.view(s.ingest(flows_df(spark, n=300)))
    rows = df.select("SrcAddr", "SrcNetMask", "EType", "SrcNetPrefix").collect()
    for r in rows:
        addr = ipaddress.IPv6Address(bytes(r["SrcAddr"]))
        if r["EType"] == 0x800:
            v4 = addr.ipv4_mapped
            net = ipaddress.ip_network(f"{v4}/{r['SrcNetMask']}", strict=False)
        else:
            net = ipaddress.ip_network(f"{addr}/{r['SrcNetMask']}", strict=False)
        want = f"{net.network_address}/{r['SrcNetMask']}" if r["SrcNetMask"] else ""
        assert r["SrcNetPrefix"] == want, (str(addr), r["SrcNetMask"], r["SrcNetPrefix"], want)
