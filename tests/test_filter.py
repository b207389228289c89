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
        # the reference's TestInvalidFilter table
        # (console/filter/parser_test.go:651-692), minus quoted-IP
        # strictness (documented dialect extension: quoted IPs parse)
        "ExporterName",
        "ExporterName = ",
        "ExporterName = 'something",
        "ExporterName='something\"",
        "ExporterNamee='something'",
        "ExporterName>'something'",
        "ExporterAddress=203.0.113",
        "ExporterAddress=2001:db8",
        "SrcAS=12322a",
        "SrcAS=785473854857857485784",  # overflows the engine integer
        "EType = ipv7",
        "Proto = 100 AND",
        "AND Proto = 100",
        "Proto = 100 AND (Proto = 100",
        "SrcAS IN (AS12322, 29447",
        "SrcAS IN (AS12322,",
        "SrcPort < ExporterName",
        "SrcPort < SrcAS",
        "SrcPort < DstPortt",
        "SrcPort IN (DstPort)",
        "SrcAS = ExporterName",
        "SrcAS = DstASPath",
        "SrcAS IN (DstAS)",
        "InIfProvider LIKE OutIfProvider",
        # bare words where a string belongs are typo'd columns/keywords
        "InIfProvider IN (OutIfProvider)",
        "InIfProvider = SrcAS",
        "InIfProvider = OutIfProviderr",
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


# ---------------------------------------------------------------------------
# static completion contexts (reference console/filter.go:110-240)
# ---------------------------------------------------------------------------


def test_completion_columns_prefix_anchored_first():
    from akvorado_spark.filtering.model import flow_filter_schema
    from akvorado_spark.query.complete import complete_column

    got = [c["label"] for c in complete_column("src", flow_filter_schema())]
    assert got and all("src" in c.lower() for c in got)
    # prefix-anchored (position 0) names come before substring matches
    anchored = [c for c in got if c.lower().startswith("src")]
    assert got[: len(anchored)] == anchored
    assert "SrcAddr" in anchored and "SrcAS" in anchored


def test_completion_operators_all_parse():
    """Every advertised operator must actually parse for a column of
    that kind — the completion list can never suggest a dead end."""
    from akvorado_spark.filtering import compile_filter
    from akvorado_spark.filtering.model import flow_filter_schema
    from akvorado_spark.query.complete import FILTER_OPERATORS, complete_operator

    sch = flow_filter_schema()
    sample_value = {
        "ip": "'192.0.2.1'",
        "prefix": "'10.0.0.0/8'",
        "string": "'x%'",
        "uint": "10",
        "proto": "6",
        "etype": "IPv4",
        "enum": None,  # per-column values
        "array_uint": "65001",
        "community": "65000:100",
        "large_community": "65000:1:2",
        "mac": "00:11:22:33:44:55",
        "timestamp": "'2024-01-01 00:00:00'",
    }
    enum_value = {"inifboundary": "external", "flowdirection": "ingress"}
    seen_kinds = set()
    for spec in sch.columns.values():
        kind = spec.kind
        if kind in seen_kinds:
            continue
        seen_kinds.add(kind)
        v = enum_value.get(spec.name.lower()) if kind == "enum" else sample_value[kind]
        if v is None:
            v = next(iter(spec.enum_values))
        ops = complete_operator(spec.name, sch)
        assert ops, f"no operators advertised for {spec.name} ({kind})"
        for op in ops:
            label = op["label"]
            if label.startswith(("IN", "NOTIN")):
                text = f"{spec.name} {label} {v}, {v} )"
            else:
                text = f"{spec.name} {label} {v}"
            compile_filter(text, sch)  # must not raise
    assert FILTER_OPERATORS.keys() >= seen_kinds


def test_completion_static_values():
    from akvorado_spark.filtering.model import flow_filter_schema
    from akvorado_spark.query.complete import complete_static_value

    sch = flow_filter_schema()
    labels = [v["label"] for v in complete_static_value("InIfBoundary", "", sch)]
    assert labels == sorted(labels) and "external" in labels and "internal" in labels
    assert [v["label"] for v in complete_static_value("EType", "ipv6", sch)] == ["IPv6"]
    protos = [v["label"] for v in complete_static_value("Proto", "tc", sch)]
    assert "TCP" in protos
    assert complete_static_value("SrcPort", "", sch) == []


def test_filter_parser_garbage_fuzz_error_contract():
    """Garbage and truncated inputs must surface as FilterError (or
    parse cleanly) — never IndexError/KeyError/AttributeError escapes,
    matching the ValueError-only contract of the binary parsers."""
    import random

    from akvorado_spark.filtering import compile_filter
    from akvorado_spark.filtering.model import flow_filter_schema
    from akvorado_spark.filtering.parser import FilterError

    sch = flow_filter_schema()
    rng = random.Random(7)
    seeds = [
        "SrcAddr << '10.0.0.0/8' AND (DstPort = 443 OR Proto = 6)",
        "ExporterName LIKE 'router%'",
        "DstCommunities = 65000:100 AND SrcAS = AS65001",
        "InIfBoundary = external -- comment",
    ]
    alphabet = "()'\"<>=! ANDORabc0129:./%,-"
    n_ok = n_err = 0
    for i in range(800):
        if rng.random() < 0.5:
            s = rng.choice(seeds)
            # mutate: truncate, splice garbage, duplicate a slice
            cut = rng.randrange(len(s))
            mode = rng.randrange(3)
            if mode == 0:
                s = s[:cut]
            elif mode == 1:
                s = s[:cut] + "".join(
                    rng.choice(alphabet) for _ in range(rng.randrange(1, 8))
                ) + s[cut:]
            else:
                s = s[:cut] + s[rng.randrange(len(s)):]
        else:
            s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 40)))
        try:
            compile_filter(s, sch)
            n_ok += 1
        except FilterError:
            n_err += 1
        # anything else escapes and fails the test
    assert n_err > 100  # the fuzz actually exercised rejection paths


def test_prefix_filter_main_table_follows_column_placement():
    """Reference TestPrefixFilterMainTableRequired
    (console/filter/parser_test.go:596-650): a NetPrefix filter forces
    the main table only when the prefix columns actually live there —
    a deployment materializing them into the rollups can filter
    anywhere."""
    from dataclasses import replace

    from akvorado_spark.schema.definition import FlowSchema, flows_schema

    q = "SrcNetPrefix = '192.168.0.128/27'"
    # default schema: address/mask/prefix are MainOnly → required
    assert compile_filter(q, flow_filter_schema()).requires_main_table

    moved = FlowSchema(
        [
            replace(c, main_only=False)
            if c.name in ("SrcAddr", "SrcNetMask", "SrcNetPrefix")
            else c
            for c in flows_schema().columns
        ]
    )
    assert not compile_filter(q, flow_filter_schema(moved)).requires_main_table


def test_comparable_column_completion_reference_cases():
    """Reference console/filter_test.go:365-431: column-as-value
    completion pairs by parser type and operator support."""
    from akvorado_spark.query.complete import complete_comparable_columns

    sch = flow_filter_schema()
    got = complete_comparable_columns("InIfSpeed", ">=", "outif", sch)
    assert [c["label"] for c in got] == ["OutIfSpeed"]
    got = complete_comparable_columns("SrcCountry", "=", "dstc", sch)
    assert [c["label"] for c in got] == ["DstCountry"]
    got = complete_comparable_columns("DstAS", "!=", "srca", sch)
    assert [c["label"] for c in got] == ["SrcAS"]
    # another type / unsupported operator / string inequality → empty
    assert complete_comparable_columns("SrcCountry", "=", "srcp", sch) == []
    assert complete_comparable_columns("SrcCountry", "LIKE", "dstc", sch) == []
    assert complete_comparable_columns("SrcCountry", "<", "dstc", sch) == []


def test_ordered_column_comparisons(fixture_frames):
    """Reference uint parser type: ordered col-vs-col comparisons are
    valid for plain uints, invalid for ASN/string pairs."""
    sdf, con = fixture_frames
    sch = flow_filter_schema()
    f = compile_filter("InIfSpeed >= OutIfSpeed", sch)
    spark_n = sdf.filter(f.column()).count()
    duck_n = con.execute(
        f"SELECT COUNT(*) FROM flows WHERE {f.duckdb_sql}"
    ).fetchone()[0]
    assert spark_n == duck_n and spark_n > 0
    # reversal swaps both sides
    assert "OutIfSpeed" in f.reverse().spark_sql
    # ASN pairs compare only with =/!=; ASN never pairs with plain uint
    compile_filter("SrcAS != DstAS", sch)
    with pytest.raises(FilterError):
        compile_filter("SrcAS < DstAS", sch)
    with pytest.raises(FilterError):
        compile_filter("SrcAS = SrcPort", sch)
    with pytest.raises(FilterError):
        compile_filter("InIfSpeed = SrcAS", sch)
