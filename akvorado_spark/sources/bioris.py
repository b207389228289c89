"""BioRIS routing provider (SURVEY §2.1 S15; reference
outlet/routing/provider/bioris/root.go, config.go, metrics.go).

The reference's second routing provider queries external bio-routing
RIS instances over gRPC instead of holding a local BMP RIB: it keeps a
router→instances map refreshed from every instance's ``GetRouters``,
chooses a router for each flow's agent (exact agent-ID match preferred,
any known router as fallback), issues an ``LPM`` call against one of
the instances serving that router, and converts the response into the
same lookup-result shape the BMP provider produces
(root.go:212-341).

This module models exactly that control logic against an injectable
client, so the router-choice / response-conversion / error / metrics
surface is testable without the gRPC stack (the reference's own tests,
root_test.go TestChooseRouter / TestLPMResponseToLookupResult, drive
the provider through the same seams).  The Spark integration is
unchanged from S14: lookups hydrate a routes frame that joins flows via
``operators.lpm`` — at cluster scale one does NOT call a gRPC service
per row; the provider's snapshot feeds the broadcast LPM cascade.

Error strings mirror root.go:35-41 verbatim so the reference's test
tables port directly.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass, field
from typing import Any, Protocol

_V4MAP = b"\x00" * 10 + b"\xff\xff"


def _addr16(ip: str | bytes) -> bytes:
    """Canonical 16-byte (v6-mapped) address, like helpers.AddrTo6."""
    if isinstance(ip, bytes):
        raw = ip
        return _V4MAP + raw if len(raw) == 4 else raw
    a = ipaddress.ip_address(ip)
    return _V4MAP + a.packed if a.version == 4 else a.packed


class LookupError_(Exception):
    """Lookup failure; ``str(e)`` matches the reference error text."""


ERR_NO_ROUTER = "no router"
ERR_NO_INSTANCE = "no RIS instance available"
ERR_RESULT_EMPTY = "result empty"
ERR_NO_ROUTE_FOUND = "no route found"
ERR_NO_PATH_FOUND = "no path found"
ERR_INVALID_NEXT_HOP = "invalid next hop"


@dataclass(frozen=True)
class RISInstance:
    """Connection details of one RIS (config.go:26-31)."""

    grpc_addr: str
    grpc_secure: bool = False
    vrf_id: int = 0
    vrf: str = ""


@dataclass(frozen=True)
class BioRISConfig:
    """DefaultConfiguration parity (config.go:33-43); durations in s."""

    instances: tuple[RISInstance, ...] = ()
    timeout: float = 0.2
    refresh: float = 1800.0
    refresh_timeout: float = 10.0


class RISClient(Protocol):  # pragma: no cover - structural type only
    """The two RPCs the provider uses (bio-rd ris api)."""

    def get_routers(self) -> list[str]: ...

    def lpm(self, router: str, vrf_id: int, vrf: str,
            pfx: tuple[bytes, int]) -> Any: ...


@dataclass
class LookupResult:
    """Same shape as the BMP provider's result (bmp.LookupResult)."""

    asn: int = 0
    as_path: list[int] = field(default_factory=list)
    communities: list[int] = field(default_factory=list)
    large_communities: list[tuple[int, int, int]] = field(default_factory=list)
    net_mask: int = 0
    next_hop: bytes | None = None


class Metrics:
    """Counter surface of metrics.go (names preserved)."""

    def __init__(self):
        self.counters: dict[tuple[str, ...], int] = {}

    def inc(self, name: str, *labels: str) -> None:
        key = (name, *labels)
        self.counters[key] = self.counters.get(key, 0) + 1

    def get(self, name: str, *labels: str) -> int:
        return self.counters.get((name, *labels), 0)


class BioRISProvider:
    """Router choice + LPM-call + response conversion (root.go)."""

    def __init__(self, config: BioRISConfig | None = None,
                 clients: dict[str, RISClient] | None = None,
                 rng=None):
        import random

        self.config = config or BioRISConfig()
        # grpc_addr -> (instance config, client); the client is the
        # injection seam standing in for Dial()'s gRPC stub
        self.instances: dict[str, tuple[RISInstance, RISClient]] = {}
        clients = clients or {}
        for inst in self.config.instances:
            client = clients.get(inst.grpc_addr)
            if client is None:
                raise ValueError(f"no client for RIS {inst.grpc_addr}")
            self.instances[inst.grpc_addr] = (inst, client)
        self.routers: dict[bytes, list[str]] = {}  # addr16 -> [grpc_addr]
        self.metrics = Metrics()
        self._rng = rng or random.Random(0)

    # -- Refresh (root.go:171-205) -----------------------------------

    def refresh(self) -> None:
        routers: dict[bytes, list[str]] = {}
        for addr, (_inst, client) in self.instances.items():
            try:
                names = client.get_routers()
            except Exception:
                # reference logs and continues with the other instances
                continue
            count = 0
            for router in names:
                try:
                    r16 = _addr16(router)
                except ValueError:
                    continue
                routers.setdefault(r16, []).append(addr)
                count += 1
            for _ in range(count):
                self.metrics.inc("known_routers_total", addr)
        self.routers = routers

    # -- chooseRouter (root.go:228-265) -------------------------------

    def choose_router(self, agent: str | bytes) -> tuple[bytes, str]:
        """Returns (router addr16, chosen grpc_addr).  Exact agent-ID
        match wins; otherwise any known router (the reference's Go map
        iteration lands on an arbitrary one); the serving instance is
        picked uniformly among those providing the router."""
        agent16 = _addr16(agent)
        chosen: bytes | None = None
        exact = False
        for r in self.routers:
            chosen = r
            if r == agent16:
                exact = True
                break
        if chosen is None:
            raise LookupError_(ERR_NO_ROUTER)
        serving = self.routers.get(chosen) or []
        if not serving:
            raise LookupError_(ERR_NO_INSTANCE)
        addr = serving[self._rng.randrange(len(serving))]
        router_str = str(ipaddress.ip_address(
            chosen[-4:] if chosen.startswith(_V4MAP) else chosen))
        if exact:
            self.metrics.inc("router_agentid_requests_total", addr, router_str)
        else:
            self.metrics.inc("router_fallback_requests_total", addr, router_str)
        return chosen, addr

    # -- lpmResponseToLookupResult (root.go:267-328) -------------------

    @staticmethod
    def lpm_response_to_lookup_result(lpm) -> LookupResult:
        """``lpm`` is None or a list of routes; each route is a dict
        ``{"pfx": (addr_bytes, length), "paths": [path, ...]}`` where a
        path is None or ``{"bgp_path": {"communities": [...],
        "large_communities": [(ga, d1, d2), ...], "as_path": [[asns],
        ...], "next_hop": addr}}`` — the bio-rd LPMResponse fields the
        reference reads."""
        if lpm is None:
            raise LookupError_(ERR_RESULT_EMPTY)
        best, best_len = None, -1
        for route in lpm:
            plen = int(route["pfx"][1])
            if plen > best_len:
                best, best_len = route, plen
        if best is None:
            raise LookupError_(ERR_NO_ROUTE_FOUND)
        paths = best.get("paths") or []
        if not paths:
            raise LookupError_(ERR_NO_PATH_FOUND)
        pfx_path = paths[0]  # first path is the preferred one
        if pfx_path is None:
            raise LookupError_(ERR_NO_PATH_FOUND)
        bgp = pfx_path.get("bgp_path")
        if bgp is None:
            raise LookupError_(ERR_NO_PATH_FOUND)
        res = LookupResult(net_mask=best_len)
        res.communities.extend(bgp.get("communities") or [])
        for ga, d1, d2 in bgp.get("large_communities") or []:
            res.large_communities.append((int(ga), int(d1), int(d2)))
        for seg in bgp.get("as_path") or []:
            for asn in seg:
                res.as_path.append(int(asn))
                res.asn = int(asn)
        nh = bgp.get("next_hop")
        if nh is not None:
            try:
                res.next_hop = _addr16(nh)
            except ValueError:
                raise LookupError_(ERR_INVALID_NEXT_HOP) from None
        return res

    # -- Lookup = lookupLPM + conversion (root.go:212-226, 330-376) ----

    def lookup(self, ip: str | bytes, agent: str | bytes) -> LookupResult:
        router16, addr = self.choose_router(agent)
        router_str = str(ipaddress.ip_address(
            router16[-4:] if router16.startswith(_V4MAP) else router16))
        inst, client = self.instances[addr]
        target = ipaddress.ip_address(ip) if isinstance(ip, str) else (
            ipaddress.ip_address(ip if len(ip) != 16 or not ip.startswith(_V4MAP)
                                 else ip[-4:]))
        pfx_len = 32 if target.version == 4 else 128
        self.metrics.inc("lpm_requests_total", addr, router_str)
        try:
            lpm = client.lpm(router=router_str, vrf_id=inst.vrf_id,
                             vrf=inst.vrf, pfx=(target.packed, pfx_len))
        except TimeoutError:
            self.metrics.inc("lpm_request_timeouts_total", addr, router_str)
            raise LookupError_("lpm lookup timeout") from None
        except Exception as e:
            self.metrics.inc("lpm_request_errors_total", addr, router_str)
            raise LookupError_(f"lpm lookup failed: {e}") from e
        self.metrics.inc("lpm_success_requests_total", addr, router_str)
        return self.lpm_response_to_lookup_result(lpm)

    # -- Spark integration: snapshot → routes frame (S14 pattern) ------

    def snapshot_rows(self, prefixes: list[str], agent: str | bytes,
                      exporter: bytes) -> list[tuple]:
        """Bulk-resolve ``prefixes`` through the chosen router and emit
        rows shaped like ``RIB.snapshot_rows`` for ``lpm_join`` — the
        cluster-scale path hydrates the broadcast routes frame once,
        instead of one RPC per flow."""
        from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range

        out = []
        for cidr in prefixes:
            net = ipaddress.ip_network(cidr, strict=False)
            try:
                res = self.lookup(str(net.network_address), agent)
            except LookupError_:
                continue
            lo, hi = prefix_range(cidr)
            out.append((
                exporter, res.asn, [int(a) for a in res.as_path],
                [int(c) for c in res.communities], res.next_hop,
                lo, hi, prefix_mapped_len(cidr),
                [tuple(int(x) for x in lc) for lc in res.large_communities],
            ))
        return out
