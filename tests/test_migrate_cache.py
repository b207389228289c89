"""Schema reconciliation (T8) + result cache (§4) tests."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from akvorado_spark.plans.migrate import diff_schema, read_reconciled, reconcile
from akvorado_spark.query.cache import ResultCache

V1 = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("old", T.IntegerType()),
    ]
)
V2 = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.IntegerType()),  # added
        # "old" dropped
    ]
)


def test_diff_schema_add_modify_drop():
    v2b = T.StructType(
        [T.StructField("a", T.StringType())] + [f for f in V2.fields[1:]]
    )
    steps = {(s.kind, s.column) for s in diff_schema(V1, v2b)}
    assert steps == {("modify", "a"), ("add", "c"), ("drop", "old")}


def test_reconcile_roundtrip_and_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "x", 7), (2, "y", 8)], V1).write.parquet(path)

    # zero-rewrite read path: added column comes back NULL, dropped pruned
    through = read_reconciled(spark, path, V2)
    assert through.columns == ["a", "b", "c"]
    assert through.filter(F.col("c").isNull()).count() == 2

    steps = reconcile(spark, path, V2, apply=True)
    assert {(s.kind, s.column) for s in steps} == {("add", "c"), ("drop", "old")}
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"a", "b", "c"}
    # idempotent: second run reports nothing
    assert reconcile(spark, path, V2, apply=True) == []


def test_result_cache_ttl_and_hits():
    cache = ResultCache(ttl_s=1000)
    calls = []

    def compute():
        calls.append(1)
        return [1, 2, 3]

    req = {"dimensions": ["SrcAS"], "limit": 10}
    assert cache.get_or_compute(req, compute) == [1, 2, 3]
    assert cache.get_or_compute(dict(reversed(req.items())), compute) == [1, 2, 3]
    assert len(calls) == 1  # key is order-insensitive → second call hits
    assert cache.hits == 1 and cache.misses == 1

    expired = ResultCache(ttl_s=0)
    expired.get_or_compute(req, compute)
    expired.get_or_compute(req, compute)
    assert len(calls) == 3  # ttl 0 → recompute


def test_result_cache_lru_cap():
    """max_entries is a hard cap under distinct-key hammering
    (VERDICT r9 #8), and eviction is LRU: a recently-hit entry
    outlives colder ones inserted after it."""
    cache = ResultCache(ttl_s=1000, max_entries=8)
    for i in range(100):
        cache.put({"q": i}, i)
        assert len(cache._store) <= 8
    # entries 92..99 remain; touch 92 so it becomes most-recent
    assert cache.get({"q": 92}) == 92
    # 8 fresh inserts evict everything EXCEPT the touched entry +7 new
    for i in range(100, 107):
        cache.put({"q": i}, i)
    assert cache.get({"q": 92}) == 92  # survived: it was hot
    assert cache.get({"q": 93}) is None  # evicted: cold
    assert len(cache._store) <= 8
    # re-put of an existing key must not evict anyone
    cache.put({"q": 92}, 920)
    assert cache.get({"q": 92}) == 920
    assert len(cache._store) <= 8


def test_graph_line_cached_roundtrip(spark, tmp_path):
    from datetime import datetime, timezone

    from akvorado_spark.plans.rollup import FlowStore
    from akvorado_spark.query.cache import ResultCache
    from akvorado_spark.query.graph import GraphRequest, graph_line_cached
    from akvorado_spark.schema.definition import flows_schema
    from akvorado_spark.sources.fixtures import flows_df

    store = FlowStore(spark, str(tmp_path / "cachestore"))
    store.write_main(flows_schema().ingest(flows_df(spark, n=2000)))
    store.build_rollups()
    req = GraphRequest(
        start=datetime(2024, 1, 1, tzinfo=timezone.utc),
        end=datetime(2024, 1, 1, 6, tzinfo=timezone.utc),
        dimensions=("ExporterName",),
        units="fps",
        points=12,
        limit=3,
    )
    cache = ResultCache(ttl_s=60)
    first = graph_line_cached(store, req, cache)
    second = graph_line_cached(store, req, cache)
    assert first == second and cache.hits == 1 and cache.misses == 1
    # a different request misses
    req2 = GraphRequest(
        start=req.start, end=req.end, dimensions=("InIfName",), units="fps",
        points=12, limit=3,
    )
    graph_line_cached(store, req2, cache)
    assert cache.misses == 2


def test_graph_sankey_cached_roundtrip(spark, tmp_path):
    from datetime import datetime, timezone

    from akvorado_spark.plans.rollup import FlowStore
    from akvorado_spark.query.cache import ResultCache
    from akvorado_spark.query.graph import GraphRequest, graph_sankey_cached
    from akvorado_spark.schema.definition import flows_schema
    from akvorado_spark.sources.fixtures import flows_df

    store = FlowStore(spark, str(tmp_path / "skstore"))
    store.write_main(flows_schema().ingest(flows_df(spark, n=2000)))
    store.build_rollups()
    req = GraphRequest(
        start=datetime(2024, 1, 1, tzinfo=timezone.utc),
        end=datetime(2024, 1, 1, 6, tzinfo=timezone.utc),
        dimensions=("ExporterName",), units="l3bps", limit=3,
    )
    cache = ResultCache(ttl_s=60)
    first = graph_sankey_cached(store, req, cache)
    second = graph_sankey_cached(store, req, cache)
    assert first == second and first and cache.hits == 1
