"""Metadata cache — access-expiry + staleness-driven refresh scheduling.

The reference fronts its SNMP/gNMI metadata pollers with a cache keyed
by (exporter IP, ifindex) whose entries carry TWO clocks: the last time
the answer was *updated* (a ``Put`` from a poller) and the last time it
was *accessed* (a flow lookup).  ``Expire`` drops entries idle past a
cutoff (last access), while ``NeedUpdates`` lists entries whose data is
stale (last update) so the orchestrator re-polls only what flows still
use (outlet/metadata/cache.go, semantics pinned by
outlet/metadata/cache_test.go:97-330).

Spark-first shape: the cache is a plain DataFrame — a small dimension
table (one row per interface actually seen in traffic, thousands to a
few million rows) — and every operation is a single aggregation or
broadcast join, so the same code serves a driver-side snapshot or a
cluster-wide refresh plan.  Each op is functional: it returns a NEW
cache frame; persist with :func:`cache_save` / :func:`cache_load`
(the reference's gob Save/Load, cache.go).

Two-clock upsert invariant: ``put`` refreshes both clocks; ``touch``
(lookup) refreshes only ``__accessed``; merging keeps max() of each
clock independently so replayed/out-of-order micro-batches converge to
the same cache state regardless of arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: cache key — exporter address + interface index.
KEY = ("ExporterAddress", "IfIndex")
_CLOCKS = ("__updated", "__accessed")


def _answer_cols(cache: DataFrame) -> list[str]:
    return [c for c in cache.columns if c not in KEY and c not in _CLOCKS]


def empty_cache(spark, answer_schema: str = (
        "ExporterName string, InterfaceName string, "
        "InterfaceDescription string, InterfaceSpeed long")) -> DataFrame:
    """An empty cache frame; answer columns default to the reference's
    provider.Answer (exporter name + interface name/description/speed)."""
    return spark.createDataFrame(
        [], f"ExporterAddress binary, IfIndex long, {answer_schema}, "
            "__updated long, __accessed long")


def cache_put(cache: DataFrame, entries: DataFrame, now: int) -> DataFrame:
    """Upsert poller answers: new values win, both clocks move to
    ``now`` (cache.go Put — a Put counts as an access too, pinned by
    TestExpire's first entry expiring on the access clock)."""
    stamped = entries.select(
        *KEY, *[F.col(c) for c in entries.columns if c not in KEY],
    ).withColumn("__updated", F.lit(now).cast("long")) \
     .withColumn("__accessed", F.lit(now).cast("long"))
    return _merge(cache, stamped)


def _merge(cache: DataFrame, incoming: DataFrame) -> DataFrame:
    """One groupBy: answer follows the freshest update; each clock keeps
    its own max so touches and puts commute."""
    answers = _answer_cols(cache)
    unioned = cache.unionByName(incoming.select(*cache.columns))
    rank = F.struct(F.col("__updated"), *[F.col(a) for a in answers])
    return unioned.groupBy(*KEY).agg(
        *[F.max_by(F.col(a), rank).alias(a) for a in answers],
        F.max("__updated").alias("__updated"),
        F.max("__accessed").alias("__accessed"),
    )


def cache_lookup(cache: DataFrame, queries: DataFrame, now: int,
                 ) -> tuple[DataFrame, DataFrame]:
    """Batch lookup: returns ``(answers, touched_cache)``.

    ``answers`` is the queries frame joined with the cached answer
    columns plus a ``__hit`` flag; ``touched_cache`` has ``__accessed``
    bumped to ``now`` for every hit key — the reference's
    Lookup-refreshes-the-entry behavior (TestExpireRefresh)."""
    keys = queries.select(*KEY).distinct()
    answers = queries.join(F.broadcast(cache), on=list(KEY), how="left") \
        .withColumn("__hit", F.col("__updated").isNotNull()) \
        .drop(*_CLOCKS)
    touched = cache.join(
        F.broadcast(keys.withColumn("__touch", F.lit(True))),
        on=list(KEY), how="left",
    ).withColumn(
        "__accessed",
        F.when(F.col("__touch"), F.greatest("__accessed", F.lit(now).cast("long")))
         .otherwise(F.col("__accessed")),
    ).drop("__touch")
    return answers, touched


def touch_from_flows(cache: DataFrame, flows: DataFrame, now: int) -> DataFrame:
    """Bump the access clock for every (exporter, in-if) and
    (exporter, out-if) pair a flow batch referenced — the micro-batch
    equivalent of per-flow Lookup calls keeping hot interfaces alive."""
    keys = (
        flows.select(F.col("ExporterAddress"), F.col("InIf").alias("IfIndex"))
        .unionByName(
            flows.select(F.col("ExporterAddress"), F.col("OutIf").alias("IfIndex")))
        .where(F.col("IfIndex").isNotNull())
        .distinct()
    )
    _, touched = cache_lookup(cache, keys, now)
    return touched


def cache_maintain(cache: DataFrame, wire_batch: DataFrame, now: int,
                   idle_ttl_s: int = 30 * 60) -> DataFrame:
    """One micro-batch of cache lifecycle at the wire-decode stage
    (where flows still carry integer InIf/OutIf): touch every
    (exporter, ifindex) the batch referenced, then expire entries idle
    past ``idle_ttl_s`` — after which :func:`cache_need_updates` over
    the result is the poller's refresh plan.  This is the outlet
    worker's per-flow Lookup + the orchestrator's periodic Expire in
    one pass (outlet/metadata/root.go, cache_test.go:97-243)."""
    return cache_expire(touch_from_flows(cache, wire_batch, now),
                        now - idle_ttl_s)


def cache_expire(cache: DataFrame, cutoff: int) -> DataFrame:
    """Drop entries whose last ACCESS predates ``cutoff`` (cache.go
    Expire; strictly-before, pinned by TestExpire's -9/-19/-29 ladder)."""
    return cache.where(F.col("__accessed") >= F.lit(cutoff).cast("long"))


def cache_need_updates(cache: DataFrame, cutoff: int) -> DataFrame:
    """Keys whose last UPDATE predates ``cutoff`` — the refresh plan the
    pollers should re-query, grouped per exporter like the reference's
    map[addr][]ifindex (cache.go NeedUpdates, TestNeedUpdates)."""
    return (
        cache.where(F.col("__updated") < F.lit(cutoff).cast("long"))
        .groupBy("ExporterAddress")
        .agg(F.sort_array(F.collect_list("IfIndex")).alias("IfIndexes"))
    )


def cache_save(cache: DataFrame, path: str) -> None:
    """Persist the cache snapshot (cache.go Save — gob file there,
    parquet here so a restarted job reloads where it left off)."""
    cache.coalesce(1).write.mode("overwrite").parquet(path)


def cache_load(spark, path: str) -> DataFrame:
    """Reload a saved snapshot; raises the engine's missing-path error
    like the reference's fs.ErrNotExist contract (TestLoadNotExist)."""
    return spark.read.parquet(path)
