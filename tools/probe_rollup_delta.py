"""Routed-vs-raw scan evidence for the rollup router (VERDICT r9
item 6): the same 2h-target aggregation answered from the routed
rollup table vs forced onto the raw flows table, with per-member
input-bytes/shuffle/wall from the status store.

This is the reference's rollup rationale measured: the router's win is
SCANNED BYTES (rollup tables track key cardinality, not corpus rows),
which at 100 TB is the difference between reading a pre-aggregated
table and re-scanning the raw corpus per dashboard query.

Usage: python tools/probe_rollup_delta.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024 or unit == "GB":
            return f"{n:.0f}{unit}" if unit == "B" else f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}GB"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .appName("probe_rollup_delta")
        .config("spark.sql.shuffle.partitions", os.environ["SPARK_GRAFT_CPUS"])
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4098")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from akvorado_spark.oracle.rollup_queries import _routed_member, get_store

    t0 = time.time()
    store = get_store(spark, sf_dir)
    build_s = time.time() - t0

    base = "http://localhost:4098/api/v1/applications"
    app_id = _get(base)[0]["id"]

    def stages():
        out = {}
        for st in _get(f"{base}/{app_id}/stages?status=COMPLETE"):
            out[(st["stageId"], st["attemptId"])] = st
        return out

    rows = []
    seen = set(stages())
    # routed picks flows_3600s for the 2h-target covered range;
    # force_main answers the IDENTICAL request from the raw table
    for variant in ("t7200_1h", "t7200_force_main"):
        t0 = time.time()
        _routed_member(store, variant).count()
        t1 = time.time()
        _routed_member(store, variant).count()
        dt = min(t1 - t0, time.time() - t1)
        cur = stages()
        new = [st for k, st in cur.items() if k not in seen]
        seen = set(cur)
        rows.append(
            {
                "variant": variant,
                "input": sum(st.get("inputBytes", 0) for st in new),
                "in_rows": sum(st.get("inputRecords", 0) for st in new),
                "sh_write": sum(st.get("shuffleWriteBytes", 0) for st in new),
                "tasks": sum(st.get("numCompleteTasks", 0) for st in new),
                "sec": dt,
            }
        )

    print(f"# store build (ingest-time, once): {build_s:.1f}s  sf_dir={sf_dir}")
    print(
        "| variant | table | input rows (2 runs) | input bytes | "
        "shuffle write | tasks | sec (min of 2) |"
    )
    print("|---|---|---|---|---|---|---|")
    tables = {"t7200_1h": "flows_3600s (routed)", "t7200_force_main": "flows (raw, forced)"}
    for r in rows:
        print(
            f"| {r['variant']} | {tables[r['variant']]} | {r['in_rows']:,} "
            f"| {fmt_bytes(r['input'])} | {fmt_bytes(r['sh_write'])} "
            f"| {r['tasks']} | {r['sec']:.2f} |"
        )
    routed, raw = rows[0], rows[1]
    # rows are the honest delta on a synthetic corpus: the repetitive
    # columns RLE/dict-compress so hard that scanned BYTES understate
    # the raw side; at real-world entropy bytes track rows
    print(
        f"# scan delta (raw/routed): rows "
        f"{raw['in_rows'] / max(routed['in_rows'], 1):.0f}x, bytes "
        f"{raw['input'] / max(routed['input'], 1):.1f}x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
