"""Long-stream soak for the bounded-state streaming dedup operators
(VERDICT r9 item 7): drive ``streaming_bloom_dedup`` and
``streaming_minhash_candidates`` through 50–100 REAL micro-batches
(``maxFilesPerTrigger=1`` + availableNow → one file per micro-batch,
with a mid-run restart from checkpoint) and verify what the few-batch
pytests cannot:

- state-store size stays FLAT (bloom: constant bitmap bytes;
  minhash: per-bucket member lists plateau at max_bucket),
- pair/row emission stays LINEAR in arrivals (no quadratic tail from
  the degenerate bucket once the cap engages).

A third mode soaks ``streaming_duplicate_windows`` with a sliding
processing-time TTL.  Its mechanics differ by necessity (measured in
round 10, documented on the operator): availableNow drains pending
timers with empty micro-batches, and the ``statestore`` reader cannot
load ProcessingTimeTimeout stores — so the dupwin soak runs a
CONTINUOUS ``processingTime`` trigger while files are fed live, and
reads state size from the engine's own progress metrics
(``stateOperators[].numRowsTotal``), asserting the row count PLATEAUS
at the TTL horizon while cumulative distinct contents keep growing.

Usage: python tools/soak_streaming.py [n_batches] [workdir] [bloom|minhash|dupwin]
Prints a markdown table for SCALE_METRICS.md.

$SOAK_STATE_PROVIDER=rocksdb switches the state store to Spark's
RocksDBStateStoreProvider (rocksdbjni ships in this build) — the
100 TB streaming posture: state lives off-heap/on-disk per executor
instead of as JVM-heap HDFSBackedStateStore maps, and commit overhead
is what the provider's changelog does, not a full-map HDFS snapshot.
The table gains a commit-ms column (sum of
stateOperators[].commitTimeMs across progress events) so the two
providers' commit overhead can be compared mechanically.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_ROWS = 200
DUP_FRACTION = 0.4  # of each batch: re-deliveries of earlier content
BOILER_FRACTION = 0.2  # minhash: identical boilerplate (degenerate bucket)


def _uniq_text(doc_id: int) -> str:
    # token stride keeps distinct docs DISSIMILAR (no shared n-grams
    # between ids), so minhash pairs come only from intended content
    return "unique document body " + " ".join(
        f"tok{(doc_id * 1000003 + j * 7919) % 999983}" for j in range(30)
    )


def _short_text(doc_id: int) -> str:
    # dupwin: ~20 dissimilar words → a bounded window-content count per
    # doc, so the per-batch state growth is interpretable
    return " ".join(f"w{(doc_id * 777767 + j * 104729) % 999983}" for j in range(20))


def _mk_batch(spark, b: int, kind: str, seen_texts: set):
    """One micro-batch.  bloom: 40% exact re-deliveries of the previous
    batch's uniques + 60% fresh.  minhash: 20% identical boilerplate
    (the degenerate bucket that must hit the cap) + 80% fresh
    dissimilar docs.  dupwin: 1 recurring boilerplate (TTL refreshed
    forever) + 20 duplicates of the previous batch + 79 one-shot
    uniques whose window contents must EXPIRE.  ``seen_texts`` tracks
    exact first-occurrences so expected emission is data-derived."""
    rows = []
    base = b * BATCH_ROWS
    if kind == "dupwin":
        for i in range(BATCH_ROWS):
            doc_id = base + i
            if i == 0:
                text = "recurring boilerplate " + _short_text(0)
            elif i <= 20 and b:
                text = _short_text(base - BATCH_ROWS + i)
            else:
                text = _short_text(doc_id)
            seen_texts.add(text)
            rows.append((doc_id, text))
        return spark.createDataFrame(rows, "doc_id long, text string")
    n_dup = int(BATCH_ROWS * DUP_FRACTION) if (kind == "bloom" and b) else 0
    n_boiler = int(BATCH_ROWS * BOILER_FRACTION) if kind == "minhash" else 0
    for i in range(BATCH_ROWS):
        doc_id = base + i
        if i < n_boiler:
            text = "identical boilerplate legal footer shared by every page"
        elif i < n_boiler + n_dup:
            text = _uniq_text(base - BATCH_ROWS + i)  # previous batch
        else:
            text = _uniq_text(doc_id)
        seen_texts.add(text)
        rows.append((doc_id, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, src_glob: str, sink: str, ckpt: str, builder) -> tuple[float, int, int]:
    """→ (wall s, Σ state commitTimeMs, n progress events with state)."""
    t0 = time.time()
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src_glob)
    q = (
        builder(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    if q.exception() is not None:
        raise RuntimeError(q.exception())
    commit_ms = 0
    n_prog = 0
    for p in q.recentProgress:
        ops = (p or {}).get("stateOperators") or []
        if ops:
            n_prog += 1
            commit_ms += sum(int(op.get("commitTimeMs", 0)) for op in ops)
    return time.time() - t0, commit_ms, n_prog


def _state_rows(spark, ckpt: str):
    return spark.read.format("statestore").load(ckpt).collect()


def _soak_dupwin(spark, work: str, n_batches: int):
    """Continuous-trigger soak for the TTL window-owner state: feed one
    file per ~0.8 s under trigger(processingTime=500ms) and sample the
    engine's stateOperators[].numRowsTotal per progress event — the TTL
    must hold the row count at the horizon plateau while cumulative
    distinct window contents keep growing linearly."""
    from akvorado_spark.streaming.state import streaming_duplicate_windows

    src = os.path.join(work, "dupwin", "in")
    sink = os.path.join(work, "dupwin", "out")
    ckpt = os.path.join(work, "dupwin", "ckpt")
    os.makedirs(src)
    seen: set = set()
    _mk_batch(spark, 0, "dupwin", seen).coalesce(1).write.parquet(
        os.path.join(src, "b0000")
    )
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        streaming_duplicate_windows(
            stream, "text", "doc_id", window=40, stride=10, ttl_seconds=15.0
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    t0 = time.time()
    series: dict[int, int] = {}

    def sample():
        lp = q.lastProgress
        if lp and lp.get("stateOperators"):
            series[lp["batchId"]] = lp["stateOperators"][0]["numRowsTotal"]

    for b in range(1, n_batches):
        _mk_batch(spark, b, "dupwin", seen).coalesce(1).write.parquet(
            os.path.join(src, f"b{b:04d}")
        )
        time.sleep(0.8)
        sample()
    # keep the query alive one TTL past the last feed so the tail's
    # one-shot contents visibly expire in the sampled series
    end = time.time() + 25
    while time.time() < end:
        time.sleep(1.0)
        sample()
    q.stop()
    q.awaitTermination(60)
    n_out = 0
    try:
        n_out = spark.read.parquet(sink).count()
    except Exception:  # noqa: BLE001 — zero-emission sink may be empty
        pass
    return sorted(series.items()), n_out, len(seen), time.time() - t0


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_streaming"
    shutil.rmtree(work, ignore_errors=True)

    from akvorado_spark.session import get_spark
    from akvorado_spark.streaming.state import (
        streaming_bloom_dedup,
        streaming_minhash_candidates,
    )

    spark = get_spark("soak_streaming")
    provider = os.environ.get("SOAK_STATE_PROVIDER", "hdfs").lower()
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        # $SOAK_ROCKSDB_CHANGELOG=1 → per-commit changelog upload
        # instead of a full RocksDB snapshot per batch (this 4.1 build
        # exposes the conf): the r11 soak showed full-snapshot commits
        # COSTLIER than HDFS at tiny state; changelog checkpointing is
        # the production posture that amortizes snapshots to every
        # minBatchesToRetain-th commit (VERDICT r11 #5)
        if os.environ.get("SOAK_ROCKSDB_CHANGELOG", "").lower() in ("1", "true"):
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                "true",
            )
            provider = "rocksdb+changelog"
    print(f"# state store provider: {provider}")
    results = []
    kinds = (sys.argv[3],) if len(sys.argv) > 3 else ("bloom", "minhash", "dupwin")
    failures = []

    if "dupwin" in kinds:
        series, n_out, n_texts, wall = _soak_dupwin(spark, work, n_batches)
        rows = [n for _b, n in series]
        third = max(1, len(rows) // 3)
        mid_peak = max(rows[third : 2 * third], default=0)
        late_peak = max(rows[2 * third :], default=0)
        peak = max(rows, default=0)
        # each one-shot text contributes >=10 distinct window contents;
        # without TTL expiry the state would end near this floor
        unbounded_floor = n_texts * 10
        print("\n| op | batches | wall s | state peak | mid→late peak | "
              "unbounded floor | emitted rows |")
        print("|---|---|---|---|---|---|---|")
        print(
            f"| dupwin (ttl=15s, continuous trigger) | {n_batches} | {wall:.1f} "
            f"| {peak} | {mid_peak}→{late_peak} | ≥{unbounded_floor} | {n_out} |"
        )
        if late_peak > 1.5 * max(mid_peak, 1):
            failures.append(
                f"dupwin state still growing: mid {mid_peak} -> late {late_peak}"
            )
        if peak >= unbounded_floor:
            failures.append(
                f"dupwin TTL not expiring: peak {peak} vs unbounded floor "
                f"{unbounded_floor}"
            )
        kinds = tuple(k for k in kinds if k != "dupwin")

    for kind in kinds:
        src = os.path.join(work, kind, "in")
        sink = os.path.join(work, kind, "out")
        ckpt = os.path.join(work, kind, "ckpt")
        os.makedirs(src)

        if kind == "bloom":
            builder = lambda s: streaming_bloom_dedup(  # noqa: E731
                s, "text", buckets=64, bits_per_shard=1 << 17
            )
        else:
            builder = lambda s: streaming_minhash_candidates(  # noqa: E731
                s, "text", "doc_id", n_hashes=16, bands=4, max_bucket=64
            )

        half = n_batches // 2
        mid_metrics = {}
        wall = 0.0
        commit_ms = 0
        n_prog = 0
        seen_texts: set = set()
        for phase, (lo, hi) in enumerate([(0, half), (half, n_batches)]):
            for b in range(lo, hi):
                _mk_batch(spark, b, kind, seen_texts).coalesce(1).write.parquet(
                    os.path.join(src, f"b{b:04d}")
                )
            # phase 2 restarts the query from the checkpoint — the soak
            # also exercises state-store recovery at depth
            w, c, p = _run(spark, src + "/*", sink, ckpt, builder)
            wall += w
            commit_ms += c
            n_prog += p
            st = _state_rows(spark, ckpt)
            if kind == "bloom":
                size = sum(
                    len(bytes(r["value"]["groupState"]["bitmap"])) for r in st
                )
                metrics = {"state_rows": len(st), "state_bytes": size}
            else:
                sizes = [len(r["value"]["groupState"]["members"]) for r in st]
                metrics = {
                    "state_rows": len(st),
                    "state_ids": sum(sizes),
                    "max_bucket_members": max(sizes),
                }
            if phase == 0:
                mid_metrics = metrics
            else:
                out = spark.read.parquet(sink)
                n_out = out.count()
                results.append(
                    (kind, n_batches, wall, mid_metrics, metrics, n_out, out,
                     len(seen_texts), commit_ms, n_prog)
                )

    if results:
        print(f"\n| op ({provider}) | batches | wall s | state @N/2 | state @N "
              "| emitted rows | commit ms/batch |")
        print("|---|---|---|---|---|---|---|")
    for kind, nb, wall, mid, fin, n_out, out, n_uniq_texts, commit_ms, n_prog in results:
        per_batch_ms = commit_ms / n_prog if n_prog else float("nan")
        print(
            f"| {kind} | {nb} | {wall:.1f} | {mid} | {fin} | {n_out} "
            f"| {per_batch_ms:.0f} |"
        )
        if kind == "bloom":
            if fin["state_bytes"] != mid["state_bytes"]:
                failures.append(f"bloom state grew: {mid} -> {fin}")
            # exact expectation: first occurrences only; Bloom may
            # falsely DROP a few (never falsely pass)
            if not (0.97 * n_uniq_texts) <= n_out <= n_uniq_texts:
                failures.append(
                    f"bloom emission off: {n_out} vs {n_uniq_texts} uniques"
                )
        else:
            cap = 64
            if fin["max_bucket_members"] > cap:
                failures.append(f"minhash bucket over cap: {fin}")
            # linearity: under-cap clique C(cap,2) per band once, then
            # 1 star pair per band per over-cap boilerplate arrival —
            # cumulative pairs stay far below the full clique
            bands = 4
            boiler = nb * int(BATCH_ROWS * BOILER_FRACTION)
            budget = bands * (cap * (cap - 1) // 2 + (boiler - cap)) * 2
            quad = bands * boiler * (boiler - 1) // 2
            if n_out > budget:
                failures.append(
                    f"minhash pairs {n_out} exceed linear budget {budget} "
                    f"(full clique would be {quad})"
                )
            # per-batch emission flatness on the tail: once the cap is
            # in force (past batch 2) emission per batch must be flat
            from pyspark.sql import functions as F

            per_batch = (
                out.withColumn("b", (F.col("id_b") / BATCH_ROWS).cast("long"))
                .groupBy("b")
                .count()
                .orderBy("b")
                .collect()
            )
            counts = [r["count"] for r in per_batch if r["b"] >= 2]
            if counts:
                mean = sum(counts) / len(counts)
                tail = counts[-max(1, len(counts) // 4):]
                if max(tail) > 4 * mean:
                    failures.append(
                        f"minhash per-batch tail spikes: max {max(tail)} vs mean {mean:.0f}"
                    )
    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print("\nOK: state flat/capped, emission linear across all batches")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
