"""End-to-end walkthrough of the engine, UDP socket excluded:

  synthetic NetFlow v5/v9 datagrams
    → RawFlow transport codec (the Kafka payload format)
    → distributed binary decode (mapInPandas, per-exporter v9
      template state)
    → interface-metadata enrichment (broadcast join)
    → partitioned store + 1m/5m/1h Summing rollups
    → the rollup router picks a table for a /graph/line request
    → line compile + sankey nodes/links + widgets

Run: python tools/demo_e2e.py [workdir]
Everything printed comes from the same modules the driver contract
uses; this script is living documentation, smoke-tested by
tests/test_demo_e2e.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str | None = None) -> int:
    from pyspark.sql import functions as F

    from akvorado_spark.oracle.wire_queries import _build_v5, _build_v9, _fields
    from akvorado_spark.plans.rollup import FlowStore
    from akvorado_spark.query.line import LineRequest, compile_line
    from akvorado_spark.query.sankey import sankey_nodes_links
    from akvorado_spark.session import get_spark
    from akvorado_spark.sources.decode import RAW_FLOW_SCHEMA, decode_binary
    from akvorado_spark.sources.rawflow_pb import decode_raw_flow, encode_raw_flow
    from akvorado_spark.sources.wire import WIRE_SCHEMA, ip16, netflow_batch_parser
    from akvorado_spark.streaming.wire_bridge import wire_to_flows

    workdir = workdir or tempfile.mkdtemp(prefix="demo_e2e_")
    spark = get_spark("demo_e2e")
    exporter = bytes([192, 0, 2, 7])

    # -- 0. demo exporter → NFv9 wire → decode ------------------------------
    # the full generator loop: weighted demo flows become real NetFlow v9
    # datagrams (templates + options + data) and come back through the
    # same distributed decoder the Kafka path uses
    from akvorado_spark.sources.fixtures import DemoFlowConfig, demo_flows_pdf
    from akvorado_spark.sources.nf_encode import demo_packets

    demo_pdf = demo_flows_pdf(
        [DemoFlowConfig(per_second=1.0, src_net="192.0.2.0/24",
                        dst_net="203.0.113.0/24", src_as=(65201,),
                        dst_as=(65202,), size=1200)],
        duration_s=20, seed=1, sampling_rate=1000,
    )
    demo_exporter = bytes([192, 0, 2, 8])
    dpkts = demo_packets(demo_pdf, sampling=1000, start_ts=1_700_000_000)
    raw_demo = spark.createDataFrame(
        [(None, p, demo_exporter, "netflow", "udp", "none", False, 0) for p in dpkts],
        RAW_FLOW_SCHEMA,
    ).coalesce(1)  # template datagram must precede data in decode order
    wire_demo = decode_binary(raw_demo, WIRE_SCHEMA, "netflow", netflow_batch_parser())
    n_demo = wire_demo.count()
    assert n_demo == len(demo_pdf)
    print(f"0. demo exporter: {len(demo_pdf)} generated flows → "
          f"{len(dpkts)} NFv9 datagrams → {n_demo} decoded wire rows")

    # the metadata-cache lifecycle at the same stage: the batch touches
    # the interfaces it used; everything else becomes the refresh plan
    from akvorado_spark.sources.metadata_cache import (
        cache_maintain, cache_need_updates, cache_put, empty_cache,
    )

    t_poll = 1_700_000_000 - 3600  # the poller answered an hour ago
    seed = spark.createDataFrame(
        [(ip16(demo_exporter), 1, "demo1", "Gi0/0/1", "demo", 1000),
         (ip16(demo_exporter), 2, "demo1", "Gi0/0/2", "demo", 1000)],
        "ExporterAddress binary, IfIndex long, ExporterName string, "
        "InterfaceName string, InterfaceDescription string, InterfaceSpeed long")
    mcache = cache_put(empty_cache(spark), seed, t_poll)
    mcache = cache_maintain(mcache, wire_demo, now=1_700_000_000 + 60)
    stale = cache_need_updates(mcache, 1_700_000_000).count()
    print(f"   metadata cache: {mcache.count()} live entries, "
          f"{stale} exporters need a refresh poll")

    # the demo BMP session: the fake exporter's route table becomes a
    # RIB snapshot, and the decoded demo flows get the two-sided
    # routing enrichment (communities + routing-AS inputs)
    from akvorado_spark.sources.bmp import RIB
    from akvorado_spark.sources.bmp_encode import BMPRouteConfig, demo_bmp_stream
    from akvorado_spark.streaming.ingest import enrich_routing

    rib = RIB()
    rib.apply(demo_bmp_stream([
        BMPRouteConfig(prefixes=("192.0.2.0/24",), as_path=(65201,),
                       communities=(65000 << 16 | 1,)),
        BMPRouteConfig(prefixes=("203.0.113.0/24",), as_path=(65202,),
                       large_communities=((65000, 7, 8),)),
    ]))
    routed = enrich_routing(wire_demo, rib.to_frame(spark, demo_exporter).drop("exporter"))
    n_routed = routed.filter("SrcCommunities IS NOT NULL AND DstRoutingAS = 65202").count()
    assert n_routed == n_demo
    print(f"   demo BMP session: {len(rib.routes)} routes in the RIB; "
          f"{n_routed} flows routed (src communities + dst AS filled)")

    # -- 1. datagrams + transport ------------------------------------------
    recs = [_fields(i, i * 7 % 1000) for i in range(1, 41)]
    pkts = [_build_v9(recs[:20]), _build_v5(recs[20:])]
    frames = [
        encode_raw_flow(
            time_received=1_700_000_000 + i,
            payload=p,
            source_address=exporter,
            decoder="netflow",
        )
        for i, p in enumerate(pkts)
    ]
    # prove the proto3 codec round-trips before shipping to "Kafka"
    assert decode_raw_flow(frames[0])["payload"] == pkts[0]
    print(f"1. built {len(pkts)} NetFlow datagrams → {len(frames)} RawFlow frames")

    # -- 2. decode + enrich -------------------------------------------------
    raw = spark.createDataFrame(
        [(None, p, exporter, "netflow", "udp", "none", False, 0) for p in pkts],
        RAW_FLOW_SCHEMA,
    ).repartition(2)
    wire = decode_binary(raw, WIRE_SCHEMA, "netflow", netflow_batch_parser())
    interfaces = spark.createDataFrame(
        [
            (ip16(exporter), 1, "et-0/0/1", "to-core", 100000),
            (ip16(exporter), 2, "et-0/0/2", "to-edge", 100000),
        ],
        "ExporterAddress binary, IfIndex long, Name string, Description string, Speed long",
    )
    flows = wire_to_flows(wire, interfaces=interfaces)
    n = flows.count()
    print(f"2. decoded {n} flows (v9 template learned in-batch, v5 fixed layout)")

    # -- 3. store + rollups -------------------------------------------------
    from akvorado_spark.streaming.ingest import EnrichmentConfig, FlowIngest

    store = FlowStore(spark, os.path.join(workdir, "store"))
    # the ingest applies schema generation (Dst1stAS etc.), appends the
    # main partition, and re-aggregates the touched rollup partitions
    FlowIngest(store, EnrichmentConfig()).process_batch(flows)
    for res in store.resolutions:
        cnt = store.read(res).count()
        label = "raw" if res.interval_s == 0 else f"{res.interval_s}s"
        print(f"3. table {res.table_name} ({label}): {cnt} rows")

    # -- 4. routed line query ----------------------------------------------
    start = datetime(2023, 11, 14, 22, 0, tzinfo=timezone.utc)
    end = datetime(2023, 11, 14, 23, 0, tzinfo=timezone.utc)
    res, interval_s = store.best_table(start, end, target_interval_s=300, require_main=False)
    print(f"4. router: 1h/300s-target query → {res.table_name} @ {interval_s}s")
    req = LineRequest(
        time_col="TimeReceived",
        dimensions=("InIfName",),
        weight_sql="Bytes * SamplingRate * 8",
        interval_s=interval_s,
        limit=3,
    )
    line = compile_line(store.read(res), req)
    for r in line.limit(5).collect():
        print(f"   bucket={r['bucket']} {r['InIfName']:10s} sum_w={r['sum_w']}")

    # -- 5. sankey assembly + widget ---------------------------------------
    agg = (
        flows.withColumn("InIfName", F.coalesce("InIfName", F.lit("unknown")))
        .groupBy("InIfName", "Proto")
        .agg(F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("w"))
        .collect()
    )
    rows = [([r["InIfName"], str(r["Proto"])], int(r["w"]), 1) for r in agg]
    nodes, links = sankey_nodes_links(rows, {1: ["InIfName", "Proto"]})
    print(f"5. sankey: {len(nodes)} nodes, {len(links)} links; top: {links[0]}")
    total = flows.agg(F.count(F.lit(1))).first()[0]
    print(f"   flow-rate widget: {total} flows in window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else None))
