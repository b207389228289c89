"""Oracle-checked longest-prefix-match queries (SURVEY §2.3 J3/J5).

The Spark side runs the production ``lpm_join`` cascade; the DuckDB
oracle computes the same semantics independently with a range join +
``arg_max(attr, plen) FILTER (WHERE attr IS NOT NULL)`` per attribute
(= longest-match with attribute inheritance).  A hash match certifies
the cascade against a structurally different implementation.
"""

from __future__ import annotations

from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range
from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register

# (cidr, name_or_None, asn) — nested prefixes exercise inheritance:
# 10.2.0.0/15 has no name → inherits "corp" from /8 while keeping its asn.
PREFIXES = [
    ("10.0.0.0/8", "corp", 65001),
    ("10.0.0.0/10", "corp-a", 65002),
    ("10.64.0.0/12", "corp-b", 65003),
    ("10.2.0.0/15", None, 65004),
    ("10.3.4.0/24", "deep", 65005),
    ("10.100.0.0/14", "corp-d", 65006),
]


def _rows():
    out = []
    for cidr, name, asn in PREFIXES:
        lo, hi = prefix_range(cidr)
        out.append((name, asn, lo, hi, prefix_mapped_len(cidr)))
    return out


def _spark_lpm(spark, sf_dir):
    from pyspark.sql import functions as F

    from akvorado_spark.operators.lpm import lpm_join

    register_spark_view(spark, sf_dir)
    rows = _rows()
    from akvorado_spark.sources.tables import local_df

    nets = local_df(spark, rows, "name string, asn long, lo binary, hi binary, plen int")
    flows = spark.table("flows_v").select("SrcAddr", "Bytes")
    out = lpm_join(
        flows, nets, "SrcAddr", attrs=["name", "asn"], plens=[r[4] for r in rows]
    )
    return (
        out.groupBy(
            F.coalesce(F.col("name"), F.lit("unknown")).alias("net_name"),
            F.coalesce(F.col("asn"), F.lit(0)).alias("net_asn"),
        )
        .agg(F.count(F.lit(1)).alias("flows"), F.sum("Bytes").alias("bytes"))
        .orderBy("net_name", "net_asn")
    )


def _oracle_lpm() -> str:
    vals = ", ".join(
        "("
        + (f"'{name}'" if name is not None else "CAST(NULL AS VARCHAR)")
        + f", {asn}, unhex('{lo.hex()}'), unhex('{hi.hex()}'), {plen})"
        for (name, asn, lo, hi, plen) in _rows()
    )
    return f"""
WITH fl AS (
  SELECT row_number() OVER () AS rid, SrcAddr, Bytes FROM {oracle_view_sql()}
),
nets(name, asn, lo, hi, plen) AS (SELECT * FROM (VALUES {vals})),
m AS (
  SELECT f.rid, f.Bytes, n.name, n.asn, n.plen
  FROM fl f LEFT JOIN nets n ON f.SrcAddr BETWEEN n.lo AND n.hi
),
r AS (
  SELECT rid,
         arg_max(name, plen) FILTER (WHERE name IS NOT NULL) AS name,
         arg_max(asn, plen) FILTER (WHERE asn IS NOT NULL) AS asn,
         MAX(Bytes) AS Bytes
  FROM m GROUP BY rid
)
SELECT COALESCE(name, 'unknown') AS net_name, COALESCE(asn, 0) AS net_asn,
       COUNT(*) AS flows, CAST(SUM(Bytes) AS BIGINT) AS bytes
FROM r GROUP BY 1, 2 ORDER BY net_name, net_asn"""


register("lpm_networks", _spark_lpm, _oracle_lpm())


# --- J4: exporter-keyed RIB lookup with default-agent fallback -------------
#
# The reference keeps one BGP RIB per exporter (BMP feed) and falls
# back to a default agent's RIB when the exporter has none
# (outlet/routing/root.go:78).  Routes for exporters 192.0.2.1/.2 are
# specific; everything else resolves through the NULL-exporter
# fallback rows.

ROUTES = [
    # (exporter_ip | None, cidr, dst_as)
    ("192.0.2.1", "10.0.0.0/8", 64601),
    ("192.0.2.1", "10.64.0.0/10", 64602),
    ("192.0.2.2", "10.0.0.0/9", 64603),
    (None, "10.0.0.0/8", 64600),
    (None, "10.3.0.0/16", 64610),
]


def _route_rows():
    from akvorado_spark.functions.ip import ip_bytes

    out = []
    for exp, cidr, asn in ROUTES:
        lo, hi = prefix_range(cidr)
        out.append(
            (ip_bytes(exp) if exp else None, asn, lo, hi, prefix_mapped_len(cidr))
        )
    return out


# --- NH-preference block: the Juniper vMX RIB from the reference's
# BMP pcap fixtures, replayed through BMPProvider (real ADD-PATH /
# L3VPN / EVPN data in the gate). The embedded literal is the
# standalone fallback when the fixtures are absent; when present, the
# replay is asserted equal (tests/test_bmp_provider.py), so a parser
# regression breaks this oracle query.

JUNIPER_RIB_SNAPSHOT = [
    # (lo_hex, hi_hex, plen, nh_hex, seq, dst_as)
    ("00000000000000000000ffffc0000200", "00000000000000000000ffffc0000201", 127, "00000000000000000000ffffc0000201", 1, 65011),
    ("00000000000000000000ffffc6336480", "00000000000000000000ffffc63364ff", 121, "00000000000000000000ffffc0000201", 2, 396919),
    ("00000000000000000000ffffc6336400", "00000000000000000000ffffc633647f", 121, "00000000000000000000ffffc0000201", 3, 64476),
    ("00000000000000000000ffffc0000206", "00000000000000000000ffffc0000207", 127, "00000000000000000000ffffc0000207", 4, 65017),
    ("20010db8000200000000000000000000", "20010db800020000ffffffffffffffff", 64, "20010db8000000000000000000000007", 5, 12322),
    ("20010db8000100000000000000000000", "20010db800010000ffffffffffffffff", 64, "20010db8000000000000000000000007", 6, 174),
    ("20010db8000000000000000000000006", "20010db8000000000000000000000007", 127, "20010db8000000000000000000000007", 7, 65017),
    ("00000000000000000000ffffc6336400", "00000000000000000000ffffc633643f", 122, "20010db8000000000000000000000007", 8, 64476),
    ("20010db8000200000000000000000000", "20010db800020000ffffffffffffffff", 64, "20010db8000000000000000000000003", 9, 12322),
    ("20010db8000000000000000000000002", "20010db8000000000000000000000003", 127, "20010db8000000000000000000000003", 10, 65013),
    ("20010db8000100000000000000000000", "20010db800010000ffffffffffffffff", 64, "20010db8000000000000000000000003", 11, 174),
    ("00000000000000000000ffffc6336480", "00000000000000000000ffffc63364ff", 121, "00000000000000000000ffffc0000207", 12, 396919),
    ("00000000000000000000ffffc6336400", "00000000000000000000ffffc633643f", 122, "00000000000000000000ffffc0000207", 13, 64476),
    ("00000000000000000000ffffc6336400", "00000000000000000000ffffc633647f", 121, "00000000000000000000ffffc0000207", 14, 64476),
    ("00000000000000000000ffffc6336480", "00000000000000000000ffffc63364ff", 121, "00000000000000000000ffffc0000207", 15, 396919),
    ("00000000000000000000ffffc6336400", "00000000000000000000ffffc633647f", 121, "00000000000000000000ffffc0000207", 16, 64476),
    ("20010db8000400000000000000000000", "20010db800040000ffffffffffffffff", 64, "20010db8000000000000000000000007", 17, 29447),
    ("00000000000000000000ffffc0000204", "00000000000000000000ffffc0000205", 127, "00000000000000000000ffffc0000205", 18, 65500),
    ("00000000000000000000ffffc0000208", "00000000000000000000ffffc0000209", 127, "00000000000000000000ffffc0000209", 19, 65019),
    ("00000000000000000000ffffc6336400", "00000000000000000000ffffc6336407", 125, "00000000000000000000ffffc0000209", 20, 64476),
]

JUNIPER_PCAPS = ["bmp-init.pcap", "bmp-peers-up.pcap", "bmp-eor.pcap",
                 "bmp-reach.pcap", "bmp-reach-addpath.pcap", "bmp-l3vpn.pcap"]
_JUNIPER_PCAP_DIR = "/root/reference/outlet/routing/provider/bmp/testdata"


def juniper_rib_rows() -> list[tuple]:
    """(lo, hi, plen, nh, seq, dst_as) bytes rows — live BMPProvider
    replay of the pcap fixtures when available, embedded snapshot
    otherwise.  Lazy + memoized: the replay is I/O against the fixture
    pcaps and must not tax every import of the entry module (VERDICT r5
    item 3) — it runs at most once, on first lpm_rib use."""
    import os

    if "rows" in _JUNIPER_CACHE:
        return _JUNIPER_CACHE["rows"]
    rows = None
    if os.path.isdir(_JUNIPER_PCAP_DIR):
        from akvorado_spark.sources.bmp import BMPProvider
        from akvorado_spark.sources.pcap import read_pcap_l4

        p = BMPProvider()
        for f in JUNIPER_PCAPS:
            p.feed(read_pcap_l4(os.path.join(_JUNIPER_PCAP_DIR, f)))
        rows = [(lo, hi, plen, nh, seq, asn)
                for (_e, asn, _path, _comm, nh, lo, hi, plen, _lc, seq)
                in p.snapshot_rows(bytes(16))]
    if rows is None:
        rows = [
            (bytes.fromhex(lo), bytes.fromhex(hi), plen, bytes.fromhex(nh),
             seq, asn)
            for (lo, hi, plen, nh, seq, asn) in JUNIPER_RIB_SNAPSHOT
        ]
    _JUNIPER_CACHE["rows"] = rows
    return rows


_JUNIPER_CACHE: dict[str, list[tuple]] = {}

# The flow's "observed next hop" derived from existing columns,
# identically in both engines: parity of SrcPort picks 192.0.2.1 vs
# 192.0.2.7 so both map-hit and default paths are exercised.
_NH_HEX_PREFIX = "00000000000000000000ffffc00002"


def _spark_lpm_rib(spark, sf_dir):
    from pyspark.sql import functions as F

    from akvorado_spark.operators.lpm import lpm_join, rib_lookup_join
    from akvorado_spark.sources.tables import local_df

    register_spark_view(spark, sf_dir)
    rows = _route_rows()
    routes = local_df(
        spark, rows, "exporter binary, dst_as long, lo binary, hi binary, plen int"
    )
    juniper = juniper_rib_rows()
    # both variants probe the same fact table — materialize ONE narrow
    # projection (lazy localCheckpoint, same shared-CTE pattern +
    # measurement as multiaxis_queries) instead of two parquet scans
    src = spark.table("flows_v").select(
        "ExporterName", "ExporterAddress", "SrcAddr", "DstAddr", "SrcPort"
    ).localCheckpoint(eager=False)
    flows = src.select("ExporterName", "ExporterAddress", "SrcAddr")
    out = lpm_join(
        flows,
        routes,
        "SrcAddr",
        attrs=["dst_as"],
        exporter_col="ExporterAddress",
        plens=[r[4] for r in rows],
    )
    fallback = out.groupBy(
        "ExporterName", F.coalesce(F.col("dst_as"), F.lit(0)).alias("route_as")
    ).agg(F.count(F.lit(1)).alias("flows")).select(
        F.lit("fallback").alias("variant"), "ExporterName", "route_as",
        F.lit("").alias("sel_nh"), "flows",
    )

    rib = local_df(
        spark,
        [(lo, hi, plen, nh, seq, asn, nh) for (lo, hi, plen, nh, seq, asn)
         in juniper],
        "lo binary, hi binary, plen int, next_hop binary, seq long, "
        "dst_as long, rnh binary",
    )
    flows2 = src.select(
        "ExporterName", "DstAddr",
        F.unhex(F.concat(
            F.lit(_NH_HEX_PREFIX),
            F.when(F.col("SrcPort") % 2 == 0, F.lit("01")).otherwise(F.lit("07")),
        )).alias("__nh"),
    )
    probed = rib_lookup_join(
        flows2, rib, "DstAddr", "__nh", attrs=["dst_as", "rnh"],
        plens=sorted({r[2] for r in juniper}),
    )
    nh_pref = probed.groupBy(
        "ExporterName",
        F.coalesce(F.col("dst_as"), F.lit(0)).alias("route_as"),
        F.coalesce(F.lower(F.hex(F.col("rnh"))), F.lit("")).alias("sel_nh"),
    ).agg(F.count(F.lit(1)).alias("flows")).select(
        F.lit("nh_pref").alias("variant"), "ExporterName", "route_as",
        "sel_nh", "flows",
    )
    return fallback.unionByName(nh_pref).orderBy(
        "variant", "ExporterName", "route_as", "sel_nh")


def _oracle_lpm_rib() -> str:
    vals = ", ".join(
        "("
        + (f"unhex('{e.hex()}')" if e is not None else "CAST(NULL AS BLOB)")
        + f", {asn}, unhex('{lo.hex()}'), unhex('{hi.hex()}'), {plen})"
        for (e, asn, lo, hi, plen) in _route_rows()
    )
    rib_vals = ", ".join(
        f"(unhex('{lo.hex()}'), unhex('{hi.hex()}'), {plen}, "
        f"unhex('{nh.hex()}'), {seq}, {asn})"
        for (lo, hi, plen, nh, seq, asn) in juniper_rib_rows()
    )
    return f"""
WITH fl AS (
  SELECT row_number() OVER () AS rid, ExporterName, ExporterAddress, SrcAddr
  FROM {oracle_view_sql()}
),
routes(exporter, dst_as, lo, hi, plen) AS (SELECT * FROM (VALUES {vals})),
m AS (
  SELECT f.rid, f.ExporterName,
         CASE WHEN r.exporter IS NOT NULL THEN r.dst_as END AS keyed_as,
         CASE WHEN r.exporter IS NULL THEN r.dst_as END AS fb_as,
         r.plen
  FROM fl f LEFT JOIN routes r
    ON f.SrcAddr BETWEEN r.lo AND r.hi
   AND (r.exporter IS NULL OR r.exporter = f.ExporterAddress)
),
resolved AS (
  SELECT rid, ExporterName,
         COALESCE(
           arg_max(keyed_as, plen) FILTER (WHERE keyed_as IS NOT NULL),
           arg_max(fb_as, plen) FILTER (WHERE fb_as IS NOT NULL),
           0) AS route_as
  FROM m GROUP BY rid, ExporterName
),
fallback AS (
  SELECT 'fallback' AS variant, ExporterName, route_as, '' AS sel_nh,
         COUNT(*) AS flows
  FROM resolved GROUP BY ExporterName, route_as
),
fl2 AS (
  SELECT row_number() OVER () AS rid, ExporterName, DstAddr,
         unhex(concat('{_NH_HEX_PREFIX}',
                      CASE WHEN SrcPort % 2 = 0 THEN '01' ELSE '07' END)) AS fnh
  FROM {oracle_view_sql()}
),
rib(lo, hi, plen, nh, seq, dst_as) AS (SELECT * FROM (VALUES {rib_vals})),
m2 AS (
  SELECT f.rid, f.fnh, r.plen, r.nh, r.seq, r.dst_as
  FROM fl2 f JOIN rib r ON f.DstAddr BETWEEN r.lo AND r.hi
),
best AS (SELECT rid, MAX(plen) AS bp FROM m2 GROUP BY rid),
sel AS (
  SELECT m2.rid,
         COALESCE(arg_min(m2.dst_as, m2.seq) FILTER (WHERE m2.nh = m2.fnh),
                  arg_min(m2.dst_as, m2.seq)) AS route_as,
         COALESCE(arg_min(m2.nh, m2.seq) FILTER (WHERE m2.nh = m2.fnh),
                  arg_min(m2.nh, m2.seq)) AS sel_nh
  FROM m2 JOIN best ON m2.rid = best.rid AND m2.plen = best.bp
  GROUP BY m2.rid
),
nh_pref AS (
  SELECT 'nh_pref' AS variant, f.ExporterName,
         COALESCE(s.route_as, 0) AS route_as,
         COALESCE(lower(hex(s.sel_nh)), '') AS sel_nh,
         COUNT(*) AS flows
  FROM fl2 f LEFT JOIN sel s ON f.rid = s.rid
  GROUP BY f.ExporterName, s.route_as, s.sel_nh
)
SELECT * FROM fallback
UNION ALL
SELECT * FROM nh_pref
ORDER BY variant, ExporterName, route_as, sel_nh"""


# oracle passed as a CALLABLE: building the SQL replays the BMP pcaps,
# which must stay off the module-import path
register("lpm_rib", _spark_lpm_rib, _oracle_lpm_rib)
