"""BioRIS provider tests (S15), mirroring the reference's own tables:
outlet/routing/provider/bioris/root_test.go TestChooseRouter and
TestLPMResponseToLookupResult, against a mocked RIS client."""

from __future__ import annotations

import pytest

from akvorado_spark.sources.bioris import (
    ERR_NO_PATH_FOUND,
    ERR_NO_ROUTE_FOUND,
    ERR_NO_ROUTER,
    ERR_RESULT_EMPTY,
    BioRISConfig,
    BioRISProvider,
    LookupError_,
    RISInstance,
    _addr16,
)


class FakeClient:
    def __init__(self, routers=(), lpm_response=None, lpm_exc=None):
        self.routers = list(routers)
        self.lpm_response = lpm_response
        self.lpm_exc = lpm_exc
        self.calls = []

    def get_routers(self):
        return self.routers

    def lpm(self, router, vrf_id, vrf, pfx):
        self.calls.append((router, vrf_id, vrf, pfx))
        if self.lpm_exc is not None:
            raise self.lpm_exc
        return self.lpm_response


def provider(clients: dict[str, FakeClient]) -> BioRISProvider:
    cfg = BioRISConfig(
        instances=tuple(RISInstance(grpc_addr=a) for a in clients)
    )
    return BioRISProvider(cfg, clients=clients)


# --- TestChooseRouter (root_test.go:31-127) -------------------------------


def test_choose_router_no_router():
    p = provider({"ris1": FakeClient()})
    with pytest.raises(LookupError_, match=ERR_NO_ROUTER):
        p.choose_router("10.0.0.0")


def _three_ris_five_routers():
    # r1 on ris1+ris3, r2 on ris2, r3 on ris1+ris3, r4 on ris2, r5 on ris1
    c1 = FakeClient(routers=["10.0.0.1", "10.0.0.3", "10.0.0.5"])
    c2 = FakeClient(routers=["10.0.0.2", "10.0.0.4"])
    c3 = FakeClient(routers=["10.0.0.1", "10.0.0.3"])
    p = provider({"ris1": c1, "ris2": c2, "ris3": c3})
    p.refresh()
    return p


def test_choose_router_exact_match_r1():
    p = _three_ris_five_routers()
    router, ris = p.choose_router("10.0.0.1")
    assert router == _addr16("10.0.0.1")
    assert ris in ("ris1", "ris3")
    assert (
        p.metrics.get("router_agentid_requests_total", ris, "10.0.0.1") == 1
    )


def test_choose_router_exact_match_r2():
    p = _three_ris_five_routers()
    router, ris = p.choose_router("10.0.0.2")
    assert router == _addr16("10.0.0.2")
    assert ris == "ris2"


def test_choose_router_random_fallback():
    p = _three_ris_five_routers()
    router, ris = p.choose_router("9.9.9.9")
    assert router in {_addr16(f"10.0.0.{i}") for i in (1, 2, 3, 4, 5)}
    assert ris in ("ris1", "ris2", "ris3")
    # fallback metric, not the exact-match one
    total_fb = sum(
        v for k, v in p.metrics.counters.items()
        if k[0] == "router_fallback_requests_total"
    )
    assert total_fb == 1


def test_refresh_counts_known_routers():
    p = _three_ris_five_routers()
    assert p.metrics.get("known_routers_total", "ris1") == 3
    assert p.metrics.get("known_routers_total", "ris2") == 2
    assert p.metrics.get("known_routers_total", "ris3") == 2


def test_refresh_skips_failing_instance():
    bad = FakeClient()
    bad.get_routers = lambda: (_ for _ in ()).throw(RuntimeError("down"))
    ok = FakeClient(routers=["10.0.0.9"])
    p = provider({"bad": bad, "ok": ok})
    p.refresh()
    assert list(p.routers) == [_addr16("10.0.0.9")]


# --- TestLPMResponseToLookupResult (root_test.go:129-320) ------------------

P1 = (bytes(16), 0)  # ::/0
P2 = (bytes.fromhex("20010db8" + "00" * 12), 32)  # 2001:db8::/32

FULL_BGP = {
    "communities": [123],
    "large_communities": [(0, 123, 456)],
    "as_path": [[123, 456]],
}


def conv(lpm):
    return BioRISProvider.lpm_response_to_lookup_result(lpm)


def test_lpm_without_route():
    with pytest.raises(LookupError_, match=ERR_NO_ROUTE_FOUND):
        conv([])


def test_lpm_is_nil():
    with pytest.raises(LookupError_, match=ERR_RESULT_EMPTY):
        conv(None)


def test_lpm_with_empty_path():
    with pytest.raises(LookupError_, match=ERR_NO_PATH_FOUND):
        conv([{"pfx": P1, "paths": []}])


def test_lpm_with_nil_path():
    with pytest.raises(LookupError_, match=ERR_NO_PATH_FOUND):
        conv([{"pfx": P1, "paths": [{}]}])


def test_lpm_default_and_more_specific_with_bgp_content():
    res = conv([
        {"pfx": P1, "paths": [{}]},
        {"pfx": P2, "paths": [{"bgp_path": FULL_BGP}]},
    ])
    assert res.asn == 456
    assert res.as_path == [123, 456]
    assert res.communities == [123]
    assert res.large_communities == [(0, 123, 456)]
    assert res.net_mask == 32


def test_lpm_default_and_more_specific_empty_bgp():
    res = conv([
        {"pfx": P1, "paths": [{}]},
        {"pfx": P2, "paths": [{"bgp_path": {}}]},
    ])
    assert res.asn == 0 and res.as_path == [] and res.net_mask == 32


def test_lpm_default_only_multiple_paths_uses_first():
    res = conv([
        {"pfx": P1, "paths": [{"bgp_path": FULL_BGP}, {"bgp_path": {}}]},
    ])
    assert res.asn == 456 and res.net_mask == 0
    assert res.large_communities == [(0, 123, 456)]


# --- Lookup end-to-end over the mocked client ------------------------------


def test_lookup_success_and_metrics():
    client = FakeClient(
        routers=["10.0.0.1"],
        lpm_response=[
            {"pfx": (bytes.fromhex("0a000000" + "00" * 12), 8),
             "paths": [{"bgp_path": {"as_path": [[65001]],
                                     "next_hop": "192.0.2.9"}}]},
        ],
    )
    p = provider({"ris1": client})
    p.refresh()
    res = p.lookup("10.1.2.3", agent="10.0.0.1")
    assert res.asn == 65001
    assert res.next_hop == _addr16("192.0.2.9")
    # v4 target probes as /32 (root.go:344-348)
    assert client.calls[0][3][1] == 32
    assert p.metrics.get("lpm_requests_total", "ris1", "10.0.0.1") == 1
    assert p.metrics.get("lpm_success_requests_total", "ris1", "10.0.0.1") == 1


def test_lookup_v6_probes_128():
    client = FakeClient(routers=["10.0.0.1"], lpm_response=[
        {"pfx": P2, "paths": [{"bgp_path": {}}]}])
    p = provider({"ris1": client})
    p.refresh()
    p.lookup("2001:db8::1", agent="10.0.0.1")
    assert client.calls[0][3][1] == 128


def test_lookup_timeout_and_error_metrics():
    p = provider({"ris1": FakeClient(routers=["10.0.0.1"],
                                     lpm_exc=TimeoutError())})
    p.refresh()
    with pytest.raises(LookupError_, match="lpm lookup timeout"):
        p.lookup("10.1.2.3", agent="10.0.0.1")
    assert p.metrics.get("lpm_request_timeouts_total", "ris1", "10.0.0.1") == 1

    p2 = provider({"ris1": FakeClient(routers=["10.0.0.1"],
                                      lpm_exc=RuntimeError("boom"))})
    p2.refresh()
    with pytest.raises(LookupError_, match="lpm lookup failed: boom"):
        p2.lookup("10.1.2.3", agent="10.0.0.1")
    assert p2.metrics.get("lpm_request_errors_total", "ris1", "10.0.0.1") == 1


def test_snapshot_rows_feed_lpm_join(spark):
    """The cluster-scale path: bulk-resolved prefixes hydrate the same
    routes frame shape the BMP RIB emits, joining flows via lpm_join."""
    from pyspark.sql import functions as F

    from akvorado_spark.operators.lpm import lpm_join
    from akvorado_spark.sources.tables import local_df

    client = FakeClient(routers=["10.0.0.1"])

    def lpm(router, vrf_id, vrf, pfx):
        ip, _l = pfx
        asn = 65100 if ip[0] == 10 and ip[1] == 0 else 65200
        return [{"pfx": (ip, 16),
                 "paths": [{"bgp_path": {"as_path": [[asn]]}}]}]

    client.lpm = lpm
    p = provider({"ris1": client})
    p.refresh()
    rows = p.snapshot_rows(["10.0.0.0/16", "10.1.0.0/16"], agent="10.0.0.1",
                           exporter=_addr16("10.0.0.1"))
    assert [r[1] for r in rows] == [65100, 65200]
    routes = local_df(
        spark,
        [(r[0], r[1], r[5], r[6], r[7]) for r in rows],
        "exporter binary, dst_as long, lo binary, hi binary, plen int",
    )
    flows = local_df(
        spark,
        [(_addr16("10.0.5.5"),), (_addr16("10.1.9.9"),), (_addr16("172.16.0.1"),)],
        "SrcAddr binary",
    )
    out = lpm_join(flows, routes, "SrcAddr", attrs=["dst_as"],
                   plens=[r[7] for r in rows])
    got = sorted(r["dst_as"] for r in out.select("dst_as").collect()
                 if r["dst_as"] is not None)
    assert got == [65100, 65200]
