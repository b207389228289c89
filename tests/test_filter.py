"""Filter DSL tests: every grammar production swept against a DuckDB
oracle over the same fixture rows (SURVEY §2.2 P1-P10, §5.1-5.2)."""

from __future__ import annotations

import ipaddress

import duckdb
import pytest
from pyspark.sql import functions as F

from akvorado_spark.filtering import compile_filter, flow_filter_schema, FilterError
from akvorado_spark.sources.fixtures import flows_pdf

SWEEP = [
    "SrcAddr << '10.0.0.0/8'",
    "SrcAddr = '10.0.0.0/8'",  # '=' with subnet behaves as containment
    "SrcAddr = '198.51.100.7'",
    "SrcAddr != '198.51.100.7'",
    "DstAddr !<< '192.0.2.0/24'",
    "SrcAddr IN ('10.1.2.3', '198.51.100.0/24', '2001:db8::/32')",
    "SrcAddr NOTIN ('10.0.0.0/8', '172.16.0.0/12')",
    "ExporterAddress = '192.0.2.3'",
    "ExporterName = 'router1'",
    "ExporterName != 'router1'",
    "ExporterName LIKE 'router%'",
    "ExporterName UNLIKE '%2'",
    "InIfDescription ILIKE 'TRANSIT%'",
    "InIfDescription IUNLIKE 'TRANSIT%'",
    "ExporterName IN ('router1', 'router5')",
    "ExporterName NOTIN ('router1', 'router5')",
    "InIfName = OutIfName",
    "InIfSpeed != OutIfSpeed",
    "SrcPort >= 60000",
    "DstPort IN (443, 53)",
    "Bytes > 100000 AND Packets <= 10",
    "Proto = 'tcp'",
    "Proto = 6",
    "Proto != 'udp'",
    "EType = IPv4",
    "EType = IPv6",
    "InIfBoundary = external",
    "OutIfBoundary != internal",
    "FlowDirection = ingress",
    "DstASPath = 65510",
    "DstCommunities = 65501:100",
    "ForwardingStatus >= 128",
    "TimeReceived >= '2024-01-01 03:00:00'",
    "SrcAS IN (65501, 65520) OR DstAS = 65530",
    "NOT (SrcAddr << '10.0.0.0/8' OR SrcAddr << '172.16.0.0/12')",
    "SrcNetName = 'corp' AND (Proto = 'tcp' OR Proto = 'udp') -- comment",
    "/* block */ SrcCountry IN ('US', 'FR')",
]


@pytest.fixture(scope="module")
def fixture_frames(spark):
    pdf = flows_pdf(8000)
    # DuckDB side computes SrcVlan (disabled col absent from fixture) as 0
    pdf = pdf.assign(SrcVlan=0, DstVlan=0)
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("flows", pdf)
    return sdf, con


@pytest.mark.parametrize("text", SWEEP)
def test_filter_matches_duckdb(fixture_frames, text):
    sdf, con = fixture_frames
    f = compile_filter(text, flow_filter_schema())
    spark_n = sdf.filter(f.column()).count()
    duck_n = con.execute(f"SELECT COUNT(*) FROM flows WHERE {f.duckdb_sql}").fetchone()[0]
    assert spark_n == duck_n, (text, f.spark_sql, f.duckdb_sql, spark_n, duck_n)


def test_filter_reverse_swaps_directions():
    sch = flow_filter_schema()
    f = compile_filter("SrcAddr << '10.0.0.0/8' AND InIfName = 'Gi0/0/1' AND InIfName = OutIfName", sch)
    r = f.reverse()
    assert "DstAddr" in r.spark_sql and "OutIfName = InIfName" in r.spark_sql


def test_filter_reverse_roundtrip_counts(fixture_frames):
    sdf, con = fixture_frames
    sch = flow_filter_schema()
    f = compile_filter("SrcAS = 65520 AND InIfBoundary = external", sch)
    r = f.reverse()
    # reversed filter over reversed data = original count
    duck_n = con.execute(
        "SELECT COUNT(*) FROM flows WHERE DstAS = 65520 AND OutIfBoundary = 'external'"
    ).fetchone()[0]
    assert sdf.filter(r.column()).count() == duck_n


def test_requires_main_table():
    sch = flow_filter_schema()
    assert compile_filter("SrcPort = 443", sch).requires_main_table
    assert compile_filter("SrcAddr << '10.0.0.0/8'", sch).requires_main_table
    assert not compile_filter("SrcAS = 65501", sch).requires_main_table
    assert not compile_filter("Proto = 'tcp'", sch).requires_main_table


@pytest.mark.parametrize(
    "bad",
    [
        "NoSuchColumn = 1",
        "SrcVlan = 100",  # disabled column → rejected (reference column.go:68-75)
        "SrcAddr = 'not-an-ip'",
        "Proto = 'nosuchproto'",
        "EType = 5",
        "InIfBoundary = sideways",
        "SrcPort LIKE 'x%'",
        "DstCommunities = 65501",
        "SrcAddr << ",
        "SrcAS = 1 trailing",
        "(SrcAS = 1",
    ],
)
def test_filter_errors(bad):
    with pytest.raises(FilterError):
        compile_filter(bad, flow_filter_schema())


def test_empty_filter_is_true(fixture_frames):
    sdf, _ = fixture_frames
    f = compile_filter("   -- nothing\n", flow_filter_schema())
    assert f.spark_sql == "true"
    assert sdf.filter(f.column()).count() == sdf.count()


# --- property-based sweep (beyond the reference's test strategy) -----------
#
# Random boolean trees over a pool of typed atoms, rendered two ways:
# fully parenthesized and minimally parenthesized (relying on
# NOT > AND > OR precedence).  Both renderings must parse to the same
# semantics, and the Spark and DuckDB compilations of each must agree
# on the fixture rows — catching precedence bugs (paren vs bare) and
# dialect-emission bugs (Spark vs DuckDB) independently.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

_ATOMS = [
    "SrcAddr << '10.0.0.0/8'",
    "DstAddr !<< '192.0.2.0/24'",
    "ExporterName LIKE 'router%'",
    "InIfName = OutIfName",
    "SrcPort >= 60000",
    "DstPort IN (443, 53)",
    "Bytes > 100000",
    "Packets <= 10",
    "Proto = 'tcp'",
    "EType = IPv4",
    "InIfBoundary = external",
    "DstASPath = 65510",
    "SrcAS IN (65501, 65520)",
    "SrcCountry IN ('US', 'FR')",
]


def _trees(depth: int = 3):
    atom = hst.sampled_from(_ATOMS).map(lambda s: ("atom", s))
    return hst.recursive(
        atom,
        lambda t: hst.one_of(
            hst.tuples(hst.just("and"), t, t),
            hst.tuples(hst.just("or"), t, t),
            hst.tuples(hst.just("not"), t),
        ),
        max_leaves=6,
    )


def _render(node, minimal: bool) -> str:
    kind = node[0]
    if kind == "atom":
        return node[1]
    if kind == "not":
        return f"NOT ({_render(node[1], minimal)})"
    a, b = (_render(node[1], minimal), _render(node[2], minimal))
    if not minimal:
        return f"({a} {kind.upper()} {b})"
    if kind == "and":
        # parenthesize OR children (AND binds tighter)
        wrap = lambda child, s: f"({s})" if child[0] == "or" else s
        return f"{wrap(node[1], a)} AND {wrap(node[2], b)}"
    return f"{a} OR {b}"


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_trees())
def test_filter_property_precedence_and_dialects(fixture_frames, tree):
    sdf, con = fixture_frames
    sch = flow_filter_schema()
    f_paren = compile_filter(_render(tree, minimal=False), sch)
    f_min = compile_filter(_render(tree, minimal=True), sch)
    duck_n = con.execute(
        f"SELECT COUNT(*) FROM flows WHERE {f_paren.duckdb_sql}"
    ).fetchone()[0]
    duck_min = con.execute(
        f"SELECT COUNT(*) FROM flows WHERE {f_min.duckdb_sql}"
    ).fetchone()[0]
    assert duck_n == duck_min  # precedence: bare parse ≡ explicit parens
    assert sdf.filter(f_paren.column()).count() == duck_n  # dialect parity
