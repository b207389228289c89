"""Sankey compiler + flows-native handler tests (SURVEY §3.2, O3, J9)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from akvorado_spark.plans.rollup import FlowStore
from akvorado_spark.query.graph import GraphRequest, graph_sankey
from akvorado_spark.query.sankey import SankeyRequest, compile_sankey
from akvorado_spark.schema.definition import flows_schema
from akvorado_spark.sources.fixtures import flows_df
from akvorado_spark.sources.tables import load_table

from tests.conftest import SF_DIR

START = datetime(2024, 1, 1, tzinfo=timezone.utc)
END = datetime(2024, 1, 1, 6, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sankeystore"))
    s = FlowStore(spark, root)
    df = flows_schema().ingest(flows_df(spark, n=20_000))
    s.write_main(df)
    s.build_rollups()
    return s


def test_sankey_folds_per_dimension_not_per_tuple(spark):
    df = load_table(spark, "events", SF_DIR).select(
        "ts", "event_type", (F.col("user_id") % 7).cast("string").alias("reg"), "value"
    )
    req = SankeyRequest(
        time_col="ts",
        dimensions=("event_type", "reg"),
        weight_sql="CAST(ROUND(value * 1000000) AS BIGINT)",
        limit=2,
    )
    out = compile_sankey(df, req).collect()
    # per-dimension fold: a kept event_type may pair with 'Other' region
    kept_types = {r["event_type"] for r in out if r["event_type"] != "Other"}
    kept_regs = {r["reg"] for r in out if r["reg"] != "Other"}
    assert len(kept_types) <= 2 and len(kept_regs) <= 2
    # weight conserved through folding
    total = df.agg(
        F.sum(F.expr("CAST(ROUND(value * 1000000) AS BIGINT)"))
    ).collect()[0][0]
    assert sum(r["sum_w"] for r in out) == total
    # xps = sum_w / whole-second span
    span = df.agg(
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1_000_000
    ).collect()[0][0]
    for r in out:
        assert r["xps"] == pytest.approx(r["sum_w"] / int(span))


def test_graph_sankey_bidirectional_paired_dims(store):
    """Reverse-pair dimension list (SrcAS, DstAS): the reversed axis's
    atomic rename back to forward names must not collide (ADVICE r3)."""
    req = GraphRequest(
        start=START,
        end=END,
        dimensions=("SrcAS", "DstAS"),
        units="l3bps",
        limit=3,
        bidirectional=True,
    )
    out = graph_sankey(store, req).collect()
    assert {r["axis"] for r in out} == {1, 2}
    assert {c for c in out[0].asDict()} >= {"SrcAS", "DstAS", "sum_w", "xps"}


def test_graph_sankey_bidirectional_probes_forward_rows(store):
    req = GraphRequest(
        start=START,
        end=END,
        dimensions=("SrcAS",),
        units="l3bps",
        limit=3,
        bidirectional=True,
    )
    out = graph_sankey(store, req).collect()
    ax1 = [r for r in out if r["axis"] == 1]
    ax2 = [r for r in out if r["axis"] == 2]
    assert ax1 and ax2
    fwd_kept = {r["SrcAS"] for r in ax1 if r["SrcAS"] != "Other"}
    assert len(fwd_kept) <= 3
    # reverse axis folded DstAS values against the forward SrcAS set:
    # every non-Other reverse value must be in the forward rows set
    rev_kept = {r["SrcAS"] for r in ax2 if r["SrcAS"] != "Other"}
    assert rev_kept <= fwd_kept


def test_graph_sankey_filter_and_units(store):
    req = GraphRequest(
        start=START,
        end=END,
        dimensions=("InIfName",),
        units="fps",
        filter="Proto = 6",
        limit=5,
    )
    out = graph_sankey(store, req)
    rows = out.collect()
    assert rows
    # fps over the span: total == number of TCP flows in range
    direct = (
        store.read(store.resolutions[0])
        .filter(
            (F.col("TimeReceived") >= F.lit(START)) & (F.col("TimeReceived") < F.lit(END))
        )
        .filter(F.col("Proto") == 6)
        .count()
    )
    assert sum(r["sum_w"] for r in rows) == direct


def test_sankey_nodes_links_assembly():
    """Mirror of reference console/sankey.go:197-262: node dedup per
    axis, link aggregation over repeated adjacent pairs, and the
    (axis, xps desc, source) link ordering."""
    from akvorado_spark.query.sankey import sankey_nodes_links

    rows = [
        (["router1", "TCP"], 100, 1),
        (["router1", "UDP"], 50, 1),
        (["router2", "TCP"], 70, 1),
        # same adjacent pair as row 1 → its link aggregates
        (["router1", "TCP"], 30, 1),
        (["router9", "TCP"], 5, 2),
    ]
    labels = {1: ["ExporterName", "Proto"], 2: ["ExporterName", "Proto"]}
    nodes, links = sankey_nodes_links(rows, labels)
    assert {(n["name"], n["axis"]) for n in nodes} == {
        ("ExporterName: router1", 1),
        ("ExporterName: router2", 1),
        ("Proto: TCP", 1),
        ("Proto: UDP", 1),
        ("ExporterName: router9", 2),
        ("Proto: TCP", 2),
    }
    assert links == [
        {"source": "ExporterName: router1", "target": "Proto: TCP", "xps": 130, "axis": 1},
        {"source": "ExporterName: router2", "target": "Proto: TCP", "xps": 70, "axis": 1},
        {"source": "ExporterName: router1", "target": "Proto: UDP", "xps": 50, "axis": 1},
        {"source": "ExporterName: router9", "target": "Proto: TCP", "xps": 5, "axis": 2},
    ]


def test_sankey_nodes_links_single_dimension_has_no_links():
    from akvorado_spark.query.sankey import sankey_nodes_links

    nodes, links = sankey_nodes_links([(["a"], 10, 1)], {1: ["X"]})
    assert nodes == [] and links == []
