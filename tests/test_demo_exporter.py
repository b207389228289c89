"""Demo-exporter parity tests (SURVEY §2 S17) — mirrors the reference's
generator assertions (demoexporter/flows/generate_test.go: TestRateToCount,
TestPeakHourDistance, TestRandomIP, TestGenerateFlows)."""

from __future__ import annotations

import ipaddress

import numpy as np
import pytest
from pyspark.sql import functions as F

from akvorado_spark.sources.fixtures import (
    DemoFlowConfig,
    demo_flows_df,
    demo_flows_pdf,
    peak_hour_distance,
    peak_multiplier,
    random_ips_in,
    rate_to_count,
)


def test_rate_to_count_tracks_rate():
    """Average count over 1000 s within 1 % of the rate, incl.
    fractional rates (reference TestRateToCount)."""
    secs = np.arange(1000)
    for rate in (0.2, 0.4, 0.6, 1, 1.4, 2.3, 2.8, 3, 3.2, 4.7, 1200):
        got = rate_to_count(rate, secs).sum() / 1000
        assert abs(got - rate) <= rate * 0.01


def test_peak_hour_distance_reference_table():
    """Exact cases from reference TestPeakHourDistance."""
    cases = [
        (6.0, 6.0, 1.0),
        (6.0, 0.0, 0.5),
        (6.0, 18.0, 0.0),
        (12.0, 13.0, 11 / 12),
        (12.0, 11.0, 11 / 12),
        (12.0, 14.0, 10 / 12),
        (12.0, 15.0, 9 / 12),
        (12.0, 18.0, 6 / 12),
    ]
    for peak, now, want in cases:
        assert peak_hour_distance(np.array([now]), peak)[0] == pytest.approx(want)


def test_peak_multiplier_endpoints():
    """The smoothing curve is 1 off-peak and M at the peak
    (generate.go:90-92)."""
    assert peak_multiplier(5.0, np.array([0.0]))[0] == pytest.approx(1.0)
    assert peak_multiplier(5.0, np.array([1.0]))[0] == pytest.approx(5.0)


def test_random_ips_in_prefix():
    """Every generated address inside the prefix (reference
    TestRandomIP), for v4 and v6 prefixes of assorted widths."""
    rng = np.random.default_rng(0)
    for p in ("192.168.0.0/24", "172.16.0.0/12", "192.168.14.1/32",
              "2001:db8::/32", "2001:db8:a:c:d::1/128"):
        net = ipaddress.ip_network(p)
        for raw in random_ips_in(rng, p, 200):
            a = ipaddress.IPv6Address(raw)
            ip = a.ipv4_mapped if a.ipv4_mapped else a
            assert ip in net, f"{ip} not in {p}"


def _cfg(**kw) -> DemoFlowConfig:
    base = dict(
        per_second=50.0,
        src_net="10.1.0.0/16",
        dst_net="198.51.100.0/24",
        src_as=(65501,),
        dst_as=(65520,),
    )
    base.update(kw)
    return DemoFlowConfig(**base)


def test_peak_hour_curve_shapes_volume():
    """Same config, window at the peak vs opposite the peak: flow count
    ratio tracks the configured multiplier (within the ±10 % jitter)."""
    cfg = _cfg(peak_hour=12.0, multiplier=4.0, per_second=20.0)
    at_peak = demo_flows_pdf(
        [cfg], start=np.datetime64("2024-01-01T12:00:00"), duration_s=600, seed=1
    )
    off_peak = demo_flows_pdf(
        [cfg], start=np.datetime64("2024-01-01T00:00:00"), duration_s=600, seed=1
    )
    ratio = len(at_peak) / len(off_peak)
    assert 3.0 < ratio < 5.0


def test_size_distributions():
    # size=0 → uniform [300, 1500)
    free = demo_flows_pdf([_cfg(size=0)], duration_s=120, seed=2)
    assert free["Bytes"].between(300, 1499).all()
    # size ≤ 1500 → clipped at 1500
    mid = demo_flows_pdf([_cfg(size=1400)], duration_s=120, seed=2)
    assert mid["Bytes"].le(1500).all()
    assert (mid["Bytes"] > 1400).any()  # the normal spread reaches the clip
    # jumbo sizes clip at 9000
    big = demo_flows_pdf([_cfg(size=8000)], duration_s=120, seed=2)
    assert big["Bytes"].le(9000).all()
    assert big["Bytes"].mean() == pytest.approx(8000, rel=0.1)


def test_weighted_value_lists():
    """Repeating an entry weights it, exactly like the reference's
    chooseRandom over the config lists."""
    cfg = _cfg(src_as=(65501, 65501, 65502), dst_port=(443, 443, 443, 80))
    pdf = demo_flows_pdf([cfg], duration_s=300, seed=3)
    frac_as = (pdf["SrcAS"] == 65501).mean()
    assert 0.6 < frac_as < 0.73
    frac_port = (pdf["DstPort"] == 443).mean()
    assert 0.68 < frac_port < 0.82


def test_ephemeral_ports_and_icmp():
    cfg = _cfg(protocol=("icmp",), src_port=(0,), dst_port=(0,))
    pdf = demo_flows_pdf([cfg], duration_s=60, seed=4)
    assert (pdf["Proto"] == 1).all()  # v4 net → ICMPv4
    assert (pdf["SrcPort"] == 0).all() and (pdf["DstPort"] == 0).all()
    tcp = demo_flows_pdf([_cfg(protocol=("tcp",))], duration_s=60, seed=4)
    assert tcp["SrcPort"].between(33000, 34999).all()


def test_reverse_direction_twins():
    cfg = _cfg(reverse_direction_ratio=0.25, src_port=(52000,), dst_port=(443,))
    pdf = demo_flows_pdf([cfg], duration_s=60, seed=5)
    fwd = pdf[pdf["DstPort"] == 443].reset_index()
    rev = pdf[pdf["DstPort"] == 52000].reset_index()
    assert len(fwd) == len(rev) and len(fwd) > 0
    # every directional field swapped; octets scaled by the ratio
    assert (rev["SrcAS"] == 65520).all() and (rev["DstAS"] == 65501).all()
    assert (rev["Bytes"].to_numpy() == (fwd["Bytes"].to_numpy() * 0.25).astype("int64")).all()
    assert (rev["SrcAddr"] == fwd["DstAddr"]).all()
    assert (rev["InIfName"] == fwd["OutIfName"]).all()


def test_demo_flows_ingest_end_to_end(spark):
    """The generated frame flows through the real ingest + store +
    graph pipeline (S17 as a usable corpus, not just a shape)."""
    from datetime import datetime, timezone

    from akvorado_spark.plans.rollup import FlowStore
    from akvorado_spark.query.graph import GraphRequest, graph_line
    from akvorado_spark.schema.definition import flows_schema

    cfgs = [
        _cfg(per_second=30.0, multiplier=2.0),
        _cfg(per_second=10.0, src_net="2001:db8:1::/48", dst_net="2001:db8:2::/48",
             src_as=(65502,), dst_as=(65520,), protocol=("udp",)),
    ]
    df = demo_flows_df(spark, cfgs, duration_s=600, seed=7)
    ingested = flows_schema().ingest(df)
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        store = FlowStore(spark, root)
        store.write_main(ingested)
        out = graph_line(
            store,
            GraphRequest(
                start=datetime(2024, 1, 1, tzinfo=timezone.utc),
                end=datetime(2024, 1, 1, 0, 10, tzinfo=timezone.utc),
                dimensions=("SrcAS",),
                units="l3bps",
                points=10,
                limit=5,
            ),
        ).collect()
        assert out
        assert {r["SrcAS"] for r in out} <= {"65501", "65502", "Other", 65501, 65502}


def test_demo_flows_zero_rate_yields_empty_typed_frame(spark):
    """Zero generated flows (low rate over a short window) must produce
    an empty typed frame, not crash (code-review finding)."""
    df = demo_flows_df(spark, [_cfg(per_second=0.0)], duration_s=5, seed=1)
    assert df.count() == 0
    assert "TimeReceived" in df.columns and "SrcAddr" in df.columns
