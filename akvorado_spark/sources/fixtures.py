"""Deterministic synthetic flow fixtures for tests.

Generates the flow-shaped tables described in FIXTURES.md (§1 flows,
§3 dictionaries, §4 networks, §5 metadata, §6 routes) with
numpy(seed)=42 — the in-repo analog of the reference's demo exporter
(reference: demoexporter/flows/generate.go:28-61).  Used only by
pytest; the driver's TPC-H-ish tables remain the oracle substrate.

Everything is vectorized numpy → pandas → Arrow → Spark.
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from akvorado_spark.functions.ip import ip_bytes
from akvorado_spark.schema.definition import flows_schema

# (prefix, name, role, site, region, tenant, country, state, city, asn)
NETWORKS = [
    ("10.0.0.0/8", "corp", "backbone", "", "global", "acme", "US", "", "", 65501),
    ("10.1.0.0/16", "corp-west", "office", "sfo1", "us-west", "acme", "US", "CA", "San Francisco", 65501),
    ("10.1.2.0/24", "corp-west-lab", "lab", "sfo1", "us-west", "acme", "US", "CA", "San Francisco", 65510),
    ("10.2.0.0/16", "corp-east", "office", "nyc1", "us-east", "acme", "US", "NY", "New York", 65501),
    ("192.0.2.0/24", "routers", "infra", "", "global", "acme", "US", "", "", 65500),
    ("198.51.100.0/24", "cdn-a", "cdn", "", "eu", "globex", "FR", "", "Paris", 65520),
    ("203.0.113.0/24", "cdn-b", "cdn", "", "apac", "globex", "JP", "", "Tokyo", 65521),
    ("172.16.0.0/12", "partner", "peering", "", "sa", "initech", "BR", "", "Sao Paulo", 65530),
    ("100.64.0.0/10", "cgnat", "access", "", "eu", "umbrella", "DE", "", "Berlin", 65540),
    ("2001:db8::/32", "v6-lab", "lab", "", "global", "acme", "US", "", "", 65501),
    ("2001:db8:1::/48", "v6-west", "office", "sfo1", "us-west", "acme", "US", "CA", "San Francisco", 65502),
    ("2001:db8:2::/48", "v6-cdn", "cdn", "", "eu", "globex", "FR", "", "Paris", 65520),
    ("2620:f8::/29", "v6-partner", "peering", "", "apac", "initech", "JP", "", "Tokyo", 65531),
]

ASNS = [65500 + i for i in range(20)]
ASN_NAMES = {65500 + i: n for i, n in enumerate(
    ["Routers", "Acme", "AcmeB", "AcmeC", "AcmeD", "AcmeE", "AcmeF", "AcmeG", "AcmeH", "AcmeI",
     "LabNet", "GlobexJ", "GlobexK", "GlobexL", "GlobexM", "GlobexN", "GlobexO", "GlobexP",
     "GlobexQ", "GlobexR"])}

PROTOCOLS = [(1, "ICMP"), (6, "TCP"), (17, "UDP"), (47, "GRE"), (50, "ESP"),
             (58, "IPv6-ICMP"), (132, "SCTP")]
TCP_PORTS = [(443, "https"), (80, "http"), (22, "ssh"), (25, "smtp"), (179, "bgp"),
             (8080, "http-alt"), (993, "imaps")]
UDP_PORTS = [(53, "domain"), (123, "ntp"), (161, "snmp"), (500, "isakmp"), (4500, "ipsec-nat-t")]

EXPORTERS = [f"192.0.2.{i}" for i in range(1, 9)]
PROVIDERS = ["cogent", "lumen", "telia", "ntt", "arelion"]


def _host_pool(rng: np.random.Generator, n_hosts: int = 1000):
    """Hosts drawn from NETWORKS prefixes (so LPM joins hit), ~20% v6."""
    hosts, masks, prefix_idx = [], [], []
    v4nets = [(i, ipaddress.ip_network(p[0])) for i, p in enumerate(NETWORKS) if ":" not in p[0]]
    v6nets = [(i, ipaddress.ip_network(p[0])) for i, p in enumerate(NETWORKS) if ":" in p[0]]
    for k in range(n_hosts):
        if k % 5 == 0:  # 20% v6
            i, net = v6nets[int(rng.integers(len(v6nets)))]
            addr = net.network_address + int(rng.integers(1, 1 << 20))
            hosts.append(ipaddress.IPv6Address(int(addr)).packed)
            masks.append(net.prefixlen)
        else:
            i, net = v4nets[int(rng.integers(len(v4nets)))]
            addr = net.network_address + int(rng.integers(1, min(net.num_addresses - 1, 1 << 16)))
            hosts.append(ipaddress.IPv6Address(f"::ffff:{ipaddress.IPv4Address(int(addr))}").packed)
            masks.append(net.prefixlen)
        prefix_idx.append(i)
    return hosts, masks, prefix_idx


def _zipf_idx(rng: np.random.Generator, n: int, size: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** 1.2
    w /= w.sum()
    return rng.choice(n, size=size, p=w)


def flows_pdf(n: int = 20_000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    hosts, masks, pidx = _host_pool(rng)
    nh = len(hosts)

    t0 = np.datetime64("2024-01-01T00:00:00")
    ts = t0 + (rng.integers(0, 6 * 3600, n)).astype("timedelta64[s]")
    late = rng.random(n) < 0.02
    ts[late] -= (rng.integers(60, 1800, late.sum())).astype("timedelta64[s]")

    exp_i = rng.integers(0, 8, n)
    src_i = _zipf_idx(rng, nh, n)
    dst_i = _zipf_idx(rng, nh, n)

    src_v6 = np.array([hosts[i][:12] != b"\x00" * 10 + b"\xff\xff" for i in src_i])
    etype = np.where(src_v6, 0x86DD, 0x800)
    # destination family follows source family: redraw mismatched dsts
    for k in np.nonzero(src_v6 != np.array([hosts[i][:12] != b"\x00" * 10 + b"\xff\xff" for i in dst_i]))[0]:
        want6 = bool(src_v6[k])
        j = int(src_i[k])
        # walk the pool until the family matches (pool is 1/5 v6, deterministic)
        step = 5 if want6 else 1
        j = (j // 5) * 5 if want6 else j
        while (hosts[j][:12] != b"\x00" * 10 + b"\xff\xff") != want6:
            j = (j + step) % nh
        dst_i[k] = j

    proto = rng.choice([6, 17, 1, 58, 47, 50, 132], p=[0.60, 0.25, 0.05, 0.03, 0.03, 0.02, 0.02], size=n)
    dst_port = rng.choice([443, 80, 53, 123, 8080, 22, 25], p=[0.4, 0.2, 0.15, 0.1, 0.05, 0.05, 0.05], size=n)
    src_port = rng.integers(1024, 65536, n)
    bytes_ = np.clip(np.exp(rng.normal(7.0, 1.6, n)), 40, 1_000_000).astype("int64")
    packets = np.maximum(bytes_ // np.maximum(rng.integers(200, 1400, n), 1), 1)

    src_as = np.array([NETWORKS[pidx[i]][9] for i in src_i], dtype="int64")
    dst_as = np.array([NETWORKS[pidx[i]][9] for i in dst_i], dtype="int64")

    paths = []
    for k in range(n):
        plen = int(rng.integers(1, 6))
        path = list(rng.choice(ASNS, plen - 1)) + [dst_as[k]]
        if plen >= 2 and rng.random() < 0.10:  # consecutive dup → arrayCompact case
            path.insert(1, path[0])
        paths.append([int(x) for x in path])

    comms = [[int((a << 16) + int(rng.integers(1, 500))) for a in rng.choice(ASNS, int(rng.integers(0, 5)))]
             for _ in range(n)]
    lcomms = [
        [{"asn": int(a), "local1": int(rng.integers(0, 100)), "local2": int(rng.integers(0, 100))}
         for a in rng.choice(ASNS, int(rng.integers(0, 3)))]
        for _ in range(n)
    ]

    if_in = rng.integers(0, 8, n)
    if_out = rng.integers(0, 8, n)
    in_ext = rng.random(n) < 0.5
    flip = rng.random(n) < 0.2

    def attr(i_arr, col):
        return [NETWORKS[pidx[i]][col] for i in i_arr]

    groups = ["east", "west"]
    sites = ["sfo1", "nyc1", "ams1", "tyo1"]
    pdf = pd.DataFrame(
        {
            "TimeReceived": ts,
            "SamplingRate": np.array([1000, 2048, 10000])[exp_i % 3],
            "ExporterAddress": [ip_bytes(EXPORTERS[i]) for i in exp_i],
            "ExporterName": [f"router{i + 1}" for i in exp_i],
            "ExporterGroup": [groups[i % 2] for i in exp_i],
            "ExporterRole": ["edge" if i % 2 else "core" for i in exp_i],
            "ExporterSite": [sites[i % 4] for i in exp_i],
            "ExporterRegion": ["us-west" if i % 2 else "us-east" for i in exp_i],
            "ExporterTenant": ["acme"] * n,
            "SrcAddr": [hosts[i] for i in src_i],
            "SrcNetMask": np.array([masks[i] for i in src_i], dtype="int16"),
            "SrcAS": src_as.astype("int32"),
            "SrcNetName": attr(src_i, 1),
            "SrcNetRole": attr(src_i, 2),
            "SrcNetSite": attr(src_i, 3),
            "SrcNetRegion": attr(src_i, 4),
            "SrcNetTenant": attr(src_i, 5),
            "SrcCountry": attr(src_i, 6),
            "SrcGeoState": attr(src_i, 7),
            "SrcGeoCity": attr(src_i, 8),
            "SrcPort": src_port.astype("int32"),
            "DstAddr": [hosts[i] for i in dst_i],
            "DstNetMask": np.array([masks[i] for i in dst_i], dtype="int16"),
            "DstAS": dst_as.astype("int32"),
            "DstNetName": attr(dst_i, 1),
            "DstNetRole": attr(dst_i, 2),
            "DstNetSite": attr(dst_i, 3),
            "DstNetRegion": attr(dst_i, 4),
            "DstNetTenant": attr(dst_i, 5),
            "DstCountry": attr(dst_i, 6),
            "DstGeoState": attr(dst_i, 7),
            "DstGeoCity": attr(dst_i, 8),
            "DstPort": dst_port.astype("int32"),
            "InIfName": [f"Gi0/0/{i}" for i in if_in],
            "InIfDescription": [f"Transit: {PROVIDERS[i % 5]}" for i in if_in],
            "InIfSpeed": np.array([1000, 10000, 100000])[if_in % 3].astype("int32"),
            "InIfConnectivity": [["transit", "ix", "pni"][i % 3] for i in if_in],
            "InIfProvider": [PROVIDERS[i % 5] for i in if_in],
            "InIfBoundary": np.where(in_ext, "external", np.where(flip, "undefined", "internal")),
            "OutIfName": [f"Gi0/0/{i}" for i in if_out],
            "OutIfDescription": [f"Cust: {PROVIDERS[i % 5]}" for i in if_out],
            "OutIfSpeed": np.array([1000, 10000, 100000])[if_out % 3].astype("int32"),
            "OutIfConnectivity": [["transit", "ix", "pni"][i % 3] for i in if_out],
            "OutIfProvider": [PROVIDERS[(i + 1) % 5] for i in if_out],
            "OutIfBoundary": np.where(in_ext & ~flip, "internal", np.where(~in_ext & ~flip, "external", "undefined")),
            "DstASPath": paths,
            "DstCommunities": comms,
            "DstLargeCommunities": lcomms,
            "EType": etype.astype("int32"),
            "Proto": proto.astype("int32"),
            "Bytes": bytes_,
            "Packets": packets.astype("int64"),
            "ForwardingStatus": rng.choice([64, 128, 130], p=[0.95, 0.03, 0.02], size=n).astype("int32"),
            "FlowDirection": rng.choice(["ingress", "egress"], size=n),
            "NextHop": [hosts[i % 16] for i in rng.integers(0, 16, n)],
        }
    )
    return pdf


def flows_df(spark: SparkSession, n: int = 20_000, seed: int = 42) -> DataFrame:
    """Raw (pre-ingest) flows frame; Dst1st/2nd/3rdAS not yet computed."""
    schema = flows_schema()
    pdf = flows_pdf(n, seed)
    fields = [
        T.StructField(c.name, c.dtype, True)
        for c in schema.stored()
        if c.generated is None and c.name in pdf.columns
    ]
    st = T.StructType(fields)
    return spark.createDataFrame(pdf[[f.name for f in fields]], schema=st)


def networks_df(spark: SparkSession) -> DataFrame:
    """The §4 networks prefix-attribute table with precomputed bounds."""
    from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range

    rows = []
    for p in NETWORKS:
        lo, hi = prefix_range(p[0])
        rows.append(
            {
                "prefix": p[0], "lo": lo, "hi": hi, "plen": prefix_mapped_len(p[0]),
                "name": p[1], "role": p[2], "site": p[3], "region": p[4],
                "tenant": p[5], "country": p[6], "state": p[7], "city": p[8],
                "asn": p[9],
            }
        )
    st = T.StructType(
        [
            T.StructField("prefix", T.StringType()),
            T.StructField("lo", T.BinaryType()),
            T.StructField("hi", T.BinaryType()),
            T.StructField("plen", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("role", T.StringType()),
            T.StructField("site", T.StringType()),
            T.StructField("region", T.StringType()),
            T.StructField("tenant", T.StringType()),
            T.StructField("country", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("city", T.StringType()),
            T.StructField("asn", T.LongType()),
        ]
    )
    return spark.createDataFrame(pd.DataFrame(rows), schema=st)


def dict_dfs(spark: SparkSession) -> dict[str, DataFrame]:
    """§3 dictionary tables (asns / protocols / tcp / udp)."""
    asns = spark.createDataFrame(
        pd.DataFrame({"asn": list(ASN_NAMES), "name": list(ASN_NAMES.values())}),
        schema="asn long, name string",
    )
    protocols = spark.createDataFrame(
        pd.DataFrame(PROTOCOLS, columns=["proto", "name"]), schema="proto long, name string"
    )
    tcp = spark.createDataFrame(
        pd.DataFrame(TCP_PORTS, columns=["port", "name"]), schema="port long, name string"
    )
    udp = spark.createDataFrame(
        pd.DataFrame(UDP_PORTS, columns=["port", "name"]), schema="port long, name string"
    )
    return {"asns": asns, "protocols": protocols, "tcp": tcp, "udp": udp}


# ---------------------------------------------------------------------------
# Demo-exporter parity (S17): weighted distributions + peak-hour curve
# (reference demoexporter/flows/generate.go:28-61, config.go:26-83)
# ---------------------------------------------------------------------------

from dataclasses import dataclass


@dataclass(frozen=True)
class DemoFlowConfig:
    """One flow class of the demo exporter — the Spark-fixture mirror of
    the reference's FlowConfiguration (demoexporter/flows/config.go:26-58).
    Weighting works exactly like upstream: entries are drawn uniformly
    from the lists, so repeating a value weights it."""

    per_second: float
    src_net: str
    dst_net: str
    src_as: tuple[int, ...]
    dst_as: tuple[int, ...]
    in_ifindex: tuple[int, ...] = (1,)
    out_ifindex: tuple[int, ...] = (2,)
    peak_hour: float = 14.0  # hours from midnight, like config's PeakHour
    multiplier: float = 1.0  # rate multiplier at the peak
    protocol: tuple[str, ...] = ("tcp",)
    src_port: tuple[int, ...] = (0,)  # 0 → ephemeral 33000-34999
    dst_port: tuple[int, ...] = (0,)
    size: int = 0  # 0 → uniform 300-1499; else normal(size, 0.3·size)
    reverse_direction_ratio: float = 0.0


def rate_to_count(rate: float, seconds: np.ndarray) -> np.ndarray:
    """Per-second flow counts whose sum tracks ``rate`` exactly over any
    window, including fractional rates (reference rateToCount,
    generate.go:27-32: trunc((s+1)·r) − trunc(s·r))."""
    s = np.asarray(seconds, dtype="float64")
    return (np.trunc((s + 1) * rate) - np.trunc(s * rate)).astype("int64")


def peak_hour_distance(now_h: np.ndarray, peak_h: float) -> np.ndarray:
    """Closeness to the peak hour, 0 (opposite) → 1 (at peak), with
    24 h wraparound (reference peakHourDistance, generate.go:51-58)."""
    delta = np.mod(np.abs(np.asarray(now_h, dtype="float64") - peak_h), 24.0)
    delta = np.where(24.0 - delta < delta, 24.0 - delta, delta)
    return (12.0 - delta) / 12.0


def peak_multiplier(cfg_multiplier: float, distance: np.ndarray) -> np.ndarray:
    """The reference's smoothing of the peak curve (generate.go:90-92):
    1 + (M−1)·d² / (2·(d²−d)+1) — equals 1 at d=0 and M at d=1."""
    square = distance * distance
    return 1.0 + (cfg_multiplier - 1.0) * square / (2.0 * (square - distance) + 1.0)


def random_ips_in(rng: np.random.Generator, prefix: str, count: int) -> list[bytes]:
    """``count`` random addresses inside ``prefix`` as 16-byte
    v6/v6-mapped packed bytes (reference randomIP, generate.go:34-49)."""
    net = ipaddress.ip_network(prefix)
    base = int(net.network_address)
    hostbits = net.max_prefixlen - net.prefixlen
    mask = (1 << hostbits) - 1
    nbytes = max((hostbits + 7) // 8, 1)
    raw = rng.bytes(nbytes * count)
    offs = [
        int.from_bytes(raw[k * nbytes : (k + 1) * nbytes], "big") & mask
        for k in range(count)
    ]
    if net.version == 4:
        return [
            ipaddress.IPv6Address(f"::ffff:{ipaddress.IPv4Address(base + o)}").packed
            for o in offs
        ]
    return [ipaddress.IPv6Address(base + o).packed for o in offs]


def _net_attrs(prefix: str) -> tuple:
    """Attributes of the longest NETWORKS prefix containing ``prefix``
    (so demo flows still resolve through the LPM fixtures)."""
    want = ipaddress.ip_network(prefix)
    best = None
    for p in NETWORKS:
        cand = ipaddress.ip_network(p[0])
        if cand.version == want.version and want.subnet_of(cand):
            if best is None or cand.prefixlen > ipaddress.ip_network(best[0]).prefixlen:
                best = p
    return best if best is not None else (prefix, "", "", "", "", "", "", "", "", 0)


_DEMO_PROTO = {"tcp": 6, "udp": 17}


def demo_flows_pdf(
    configs: list[DemoFlowConfig],
    start: "np.datetime64" = np.datetime64("2024-01-01T00:00:00"),
    duration_s: int = 3600,
    seed: int = 0,
    exporter: str = "192.0.2.1",
    exporter_name: str = "demo1",
    sampling_rate: int = 1000,
) -> pd.DataFrame:
    """One demo exporter's worth of flows over a window — the reference
    generator's semantics (weighted value lists, peak-hour rate curve
    with ±10 % per-second jitter, size distributions with the 9000/1500
    clips, reverse-direction twins) in one vectorized pass per config
    (reference generateFlows, demoexporter/flows/generate.go:75-160).
    Column layout matches :func:`flows_pdf` so ``flows_df``-style ingest
    and the FlowStore accept it unchanged."""
    rng = np.random.default_rng(seed)
    day_off_s = int((start - start.astype("datetime64[D]")) / np.timedelta64(1, "s"))
    frames: list[pd.DataFrame] = []
    for cfg in configs:
        secs = np.arange(duration_s, dtype="int64")
        now_h = ((day_off_s + secs) % 86400) / 3600.0
        mult = peak_multiplier(cfg.multiplier, peak_hour_distance(now_h, cfg.peak_hour))
        jitter = 0.9 + rng.random(duration_s) / 5.0
        # per-second varying rate: apply the trunc-telescope per second
        r = cfg.per_second * mult * jitter
        counts = (np.trunc((secs + 1) * r) - np.trunc(secs * r)).astype("int64")
        n = int(counts.sum())
        if n == 0:
            continue
        ts = start + np.repeat(secs, counts).astype("timedelta64[s]")
        proto_name = rng.choice(np.array(cfg.protocol), size=n)
        is_tcp_udp = np.isin(proto_name, ("tcp", "udp"))
        v6 = ipaddress.ip_network(cfg.src_net).version == 6
        proto = np.where(
            is_tcp_udp,
            np.vectorize(lambda p: _DEMO_PROTO.get(p, 1))(proto_name),
            58 if v6 else 1,
        ).astype("int64")
        if cfg.size == 0:
            octets = rng.integers(300, 1500, size=n)
        else:
            octets = (cfg.size * (rng.normal(0.0, 0.3, size=n) + 1.0)).astype("int64")
            octets = np.clip(octets, 1, 9000)
            if cfg.size <= 1500:
                octets = np.minimum(octets, 1500)
        sport = rng.choice(np.array(cfg.src_port, dtype="int64"), size=n)
        sport = np.where(sport == 0, rng.integers(33000, 35000, size=n), sport)
        dport = rng.choice(np.array(cfg.dst_port, dtype="int64"), size=n)
        dport = np.where(dport == 0, rng.integers(33000, 35000, size=n), dport)
        sport = np.where(is_tcp_udp, sport, 0)
        dport = np.where(is_tcp_udp, dport, 0)
        src_as = rng.choice(np.array(cfg.src_as, dtype="int64"), size=n)
        dst_as = rng.choice(np.array(cfg.dst_as, dtype="int64"), size=n)
        src_addr = random_ips_in(rng, cfg.src_net, n)
        dst_addr = random_ips_in(rng, cfg.dst_net, n)
        in_if = rng.choice(np.array(cfg.in_ifindex, dtype="int64"), size=n)
        out_if = rng.choice(np.array(cfg.out_ifindex, dtype="int64"), size=n)
        sattr, dattr = _net_attrs(cfg.src_net), _net_attrs(cfg.dst_net)
        smask = ipaddress.ip_network(cfg.src_net).prefixlen
        dmask = ipaddress.ip_network(cfg.dst_net).prefixlen

        def one(
            ts, src_addr, dst_addr, src_as, dst_as, sport, dport,
            in_if, out_if, octets, proto, n, sattr, dattr, smask, dmask,
        ):
            etype = 0x86DD if v6 else 0x800
            return pd.DataFrame(
                {
                    "TimeReceived": ts,
                    "SamplingRate": np.full(n, sampling_rate, dtype="int64"),
                    "ExporterAddress": [ip_bytes(exporter)] * n,
                    "ExporterName": [exporter_name] * n,
                    "ExporterGroup": ["demo"] * n,
                    "ExporterRole": ["edge"] * n,
                    "ExporterSite": ["demo1"] * n,
                    "ExporterRegion": ["demo"] * n,
                    "ExporterTenant": ["demo"] * n,
                    "SrcAddr": src_addr,
                    "SrcNetMask": np.full(n, smask, dtype="int16"),
                    "SrcAS": src_as.astype("int32"),
                    "SrcNetName": [sattr[1]] * n,
                    "SrcNetRole": [sattr[2]] * n,
                    "SrcNetSite": [sattr[3]] * n,
                    "SrcNetRegion": [sattr[4]] * n,
                    "SrcNetTenant": [sattr[5]] * n,
                    "SrcCountry": [sattr[6]] * n,
                    "SrcGeoState": [sattr[7]] * n,
                    "SrcGeoCity": [sattr[8]] * n,
                    "SrcPort": sport.astype("int32"),
                    "DstAddr": dst_addr,
                    "DstNetMask": np.full(n, dmask, dtype="int16"),
                    "DstAS": dst_as.astype("int32"),
                    "DstNetName": [dattr[1]] * n,
                    "DstNetRole": [dattr[2]] * n,
                    "DstNetSite": [dattr[3]] * n,
                    "DstNetRegion": [dattr[4]] * n,
                    "DstNetTenant": [dattr[5]] * n,
                    "DstCountry": [dattr[6]] * n,
                    "DstGeoState": [dattr[7]] * n,
                    "DstGeoCity": [dattr[8]] * n,
                    "DstPort": dport.astype("int32"),
                    "InIfName": [f"Gi0/0/{i}" for i in in_if],
                    "InIfDescription": ["demo in"] * n,
                    "InIfSpeed": np.full(n, 10000, dtype="int32"),
                    "InIfConnectivity": ["transit"] * n,
                    "InIfProvider": ["demo"] * n,
                    "InIfBoundary": ["external"] * n,
                    "OutIfName": [f"Gi0/0/{i}" for i in out_if],
                    "OutIfDescription": ["demo out"] * n,
                    "OutIfSpeed": np.full(n, 10000, dtype="int32"),
                    "OutIfConnectivity": ["transit"] * n,
                    "OutIfProvider": ["demo"] * n,
                    "OutIfBoundary": ["internal"] * n,
                    "DstASPath": [[int(a)] for a in dst_as],
                    "DstCommunities": [[] for _ in range(n)],
                    "DstLargeCommunities": [[] for _ in range(n)],
                    "EType": np.full(n, etype, dtype="int32"),
                    "Proto": proto.astype("int32"),
                    "Bytes": octets.astype("int64"),
                    "Packets": np.ones(n, dtype="int64"),
                    "ForwardingStatus": np.full(n, 64, dtype="int32"),
                    "FlowDirection": ["ingress"] * n,
                    "NextHop": [ip_bytes(exporter)] * n,
                }
            )

        frames.append(
            one(ts, src_addr, dst_addr, src_as, dst_as, sport, dport,
                in_if, out_if, octets, proto, n, sattr, dattr, smask, dmask)
        )
        if cfg.reverse_direction_ratio > 0:
            # the reverse twin swaps every directional field, scales the
            # size (generate.go:146-157)
            rev_octets = (octets * cfg.reverse_direction_ratio).astype("int64")
            frames.append(
                one(ts, dst_addr, src_addr, dst_as, src_as, dport, sport,
                    out_if, in_if, rev_octets, proto, n, dattr, sattr, dmask, smask)
            )
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def demo_flows_df(spark: SparkSession, configs: list[DemoFlowConfig], **kw) -> DataFrame:
    """Raw (pre-ingest) Spark frame from the demo generator — same
    schema-projection contract as :func:`flows_df`."""
    schema = flows_schema()
    pdf = demo_flows_pdf(configs, **kw)
    if pdf.empty:
        # zero flows (legitimate for low rates over short windows via
        # the trunc telescope): an empty TYPED frame, not a crash —
        # project the same columns flows_pdf would carry
        cols = set(flows_pdf(1).columns)
    else:
        cols = set(pdf.columns)
    fields = [
        T.StructField(c.name, c.dtype, True)
        for c in schema.stored()
        if c.generated is None and c.name in cols
    ]
    st = T.StructType(fields)
    if pdf.empty:
        return spark.createDataFrame([], schema=st)
    return spark.createDataFrame(pdf[[f.name for f in fields]], schema=st)
