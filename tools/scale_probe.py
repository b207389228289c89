"""Measured plan-shape evidence for SCALE.md.

Runs the headline queries with the Spark UI's status store enabled and
pulls per-stage executor metrics (shuffle read/write bytes, input
bytes, memory/disk spill) over the REST API, attributing stages to
queries via job groups.  The point: SCALE.md's shuffle-inventory
claims stop being prose — this prints the observed numbers.

Usage: python tools/scale_probe.py [sf_dir] [query ...]
Writes a markdown table to stdout (and optionally SCALE_METRICS.md
with --write).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "graph_line_suite",
    "units_line_suite",
    "sankey_bidir",
    "lpm_networks",
    "lpm_rib",
    "rollup_route_suite",
    "topk_weighted_exact",
    "dedup_exact_docs",
    "dedup_pipeline_suite",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_suite",
    "embed_neardup_pairs",
    "events_sessionize",
    "events_ops_suite",
    "lmdata_suite",
    "rate_limit_compensated",
    "text_stats",
    "docs_chunking",
    "exporters_table",
    "complete_suite",
    "widget_exporters",
    "graph_line_bidir",
    "graph_line_prev_period",
    "vocab_suite",
    "text_id_suite",
    "multimodal_decode_meta",
]


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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.1"
    write = "--write" in sys.argv
    only = [a for a in sys.argv[2:] if not a.startswith("-")]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    # a dedicated session with the status store's REST endpoint on
    SparkSession.builder.config("spark.ui.enabled", "true")
    from akvorado_spark.session import get_spark

    # get_spark sets ui.enabled=false; override AFTER via a fresh builder
    spark = (
        SparkSession.builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .appName("scale_probe")
        .config("spark.sql.shuffle.partitions", os.environ["SPARK_GRAFT_CPUS"])
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = only or [n for n in HEADLINE if n in queries]

    base = "http://localhost:4099/api/v1/applications"
    app_id = _get(base)[0]["id"]

    def stages():
        out = {}
        for st in _get(f"{base}/{app_id}/stages?status=COMPLETE"):
            out[(st["stageId"], st["attemptId"])] = st
        return out

    # warmup (not attributed)
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    queries["flt_dsl_suite"](spark, sf_dir).count()

    import time

    rows = []
    seen = set(stages())
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.time()
        try:
            queries[name](spark, sf_dir).count()
            # min-of-2 warm time alongside the metrics (BENCH_NOTES.md)
            t1 = time.time()
            queries[name](spark, sf_dir).count()
            dt = min(t1 - t0, time.time() - t1)
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup(None, None)
        cur = stages()
        new = [st for k, st in cur.items() if k not in seen]
        seen = set(cur)
        n_exch = sum(1 for st in new if st.get("shuffleWriteBytes", 0) > 0)
        rows.append(
            {
                "query": name,
                "stages": len(new),
                "shuffle_stages": n_exch,
                "input": sum(st.get("inputBytes", 0) for st in new),
                "sh_write": sum(st.get("shuffleWriteBytes", 0) for st in new),
                "sh_read": sum(st.get("shuffleReadBytes", 0) for st in new),
                "spill": sum(st.get("diskBytesSpilled", 0) for st in new),
                "tasks": sum(st.get("numCompleteTasks", 0) for st in new),
                "sec": round(dt, 2),
            }
        )
        print(f"# {name}: done", file=sys.stderr)

    lines = [
        "| query | stages | shuffle-writing stages | tasks | input | shuffle write | shuffle read | disk spill | sec (min of 2) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['query']} | {r['stages']} | {r['shuffle_stages']} | {r['tasks']} "
            f"| {fmt_bytes(r['input'])} | {fmt_bytes(r['sh_write'])} "
            f"| {fmt_bytes(r['sh_read'])} | {fmt_bytes(r['spill'])} | {r['sec']} |"
        )
    table = "\n".join(lines)
    print(table)
    if write:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_METRICS.md"), "w") as f:
            f.write(
                f"# SCALE_METRICS — measured per-query execution metrics (sf_dir={sf_dir})\n\n"
                "Produced by `python tools/scale_probe.py <sf_dir> --write`: per-stage\n"
                "executor metrics from Spark's status store, attributed to queries by\n"
                "job group.  Evidence for the shuffle-inventory claims in SCALE.md —\n"
                "shuffle volumes should track the *derived* frames (aggregates,\n"
                "candidate sets), never the input scan volume, and spill should be 0\n"
                "at this scale.\n\n" + table + "\n"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
