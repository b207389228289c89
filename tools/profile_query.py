"""Per-query profiling: where does the wall time go?

For each query (or the $SPARK_GRAFT_BENCH_QUERIES subset) this measures,
after the same warmup bench.py performs:

  build_s   — constructing the DataFrame (Python query-builder time:
              driver-side collects, codebook derivation, memo probes)
  first_s   — first .count() on that frame (analysis + optimization +
              execution, AQE replanning included)
  rerun_s   — a fresh fn() + .count(), min over N (exactly what
              bench.py times per repeat)
  cached_s  — .count() on the SAME DataFrame object again (analysis/
              optimization cached by the Dataset's QueryExecution;
              execution + AQE only)
  jobs/stages — delta of the status-store counters across rerun

rerun_s - cached_s ≈ per-invocation plan overhead (Python build +
analysis + optimize); cached_s ≈ pure execution.  Both matter at 100 TB
— execution dominates there — but at bench SF the overhead share tells
us which queries are paying for plan size rather than data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _counts(spark):
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        empty = spark.sparkContext._jvm.java.util.ArrayList()
        sl = store.stageList(
            empty,
            *[getattr(store, f"stageList$default${i}")() for i in range(2, 6)],
        )
        return sl.size()
    except Exception:
        return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from akvorado_spark.session import get_spark

    spark = get_spark("profile")
    # same warmup discipline as bench.py
    entrymod.entry(spark).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    warm_dir = "/root/testdata/sf0.001"
    only = {
        q for q in os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",") if q
    }
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            fn(spark, warm_dir).count()
        except Exception:
            pass
    # same warmup-junk purge as bench.py (the session fact state is
    # disk-backed since r14, so no keep-set is needed)
    try:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    except Exception:
        pass
    entrymod.queries()["flt_dsl_suite"](spark, sf_dir).count()
    from akvorado_spark.oracle.rollup_queries import get_store

    get_store(spark, sf_dir)

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    rows = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            t0 = time.time()
            df = fn(spark, sf_dir)
            build_s = time.time() - t0
            t0 = time.time()
            df.count()
            first_s = time.time() - t0
            cached = None
            for _ in range(2):
                t0 = time.time()
                df.count()
                dt = time.time() - t0
                cached = dt if cached is None else min(cached, dt)
            rerun = None
            st0 = _counts(spark)
            for _ in range(repeat):
                t0 = time.time()
                fn(spark, sf_dir).count()
                dt = time.time() - t0
                rerun = dt if rerun is None else min(rerun, dt)
            stages = (_counts(spark) - st0) // repeat if st0 >= 0 else -1
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        finally:
            try:
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keys()):
                    jmap[rid].unpersist()
            except Exception:
                pass
        rows.append(
            {
                "name": name,
                "build": round(build_s, 3),
                "first": round(first_s, 3),
                "cached": round(cached, 3),
                "rerun": round(rerun, 3),
                "overhead": round(max(rerun - cached, 0.0), 3),
                "stages_per_run": stages,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    rows.sort(key=lambda r: -r["rerun"])
    print("\n== sorted by rerun (bench-equivalent) ==")
    tot_r = sum(r["rerun"] for r in rows)
    tot_c = sum(r["cached"] for r in rows)
    tot_o = sum(r["overhead"] for r in rows)
    for r in rows:
        print(
            f"{r['name']:28s} rerun={r['rerun']:7.3f} cached={r['cached']:7.3f} "
            f"overhead={r['overhead']:7.3f} build={r['build']:6.3f} stages={r['stages_per_run']}"
        )
    print(f"{'TOTAL':28s} rerun={tot_r:7.3f} cached={tot_c:7.3f} overhead={tot_o:7.3f}")


if __name__ == "__main__":
    main()
