"""Metadata cache parity — sequences from outlet/metadata/cache_test.go."""

import ipaddress

import pytest

from akvorado_spark.sources.metadata_cache import (
    KEY,
    cache_expire,
    cache_load,
    cache_lookup,
    cache_need_updates,
    cache_put,
    cache_save,
    empty_cache,
    touch_from_flows,
)

MIN = 60  # the reference sequences step in minutes
T = 1_700_000_000


def ip(s: str) -> bytes:
    a = ipaddress.ip_address(s)
    return (b"\x00" * 10 + b"\xff\xff" + a.packed) if a.version == 4 else a.packed


def entry(spark, addr, ifindex, exporter, name, desc, speed=0):
    return spark.createDataFrame(
        [(ip(addr), ifindex, exporter, name, desc, speed)],
        "ExporterAddress binary, IfIndex long, ExporterName string, "
        "InterfaceName string, InterfaceDescription string, InterfaceSpeed long")


def lookup_one(spark, cache, addr, ifindex, now=0):
    q = spark.createDataFrame([(ip(addr), ifindex)],
                              "ExporterAddress binary, IfIndex long")
    answers, touched = cache_lookup(cache, q, now)
    row = answers.collect()[0]
    return row, touched


def keys_of(cache):
    return sorted((bytes(r.ExporterAddress), r.IfIndex)
                  for r in cache.select(*KEY).collect())


def test_simple_lookup(spark):
    """cache_test.go:67-95 — one hit, two distinct misses."""
    cache = empty_cache(spark)
    cache = cache_put(cache, entry(spark, "127.0.0.1", 676, "localhost",
                                   "Gi0/0/0/1", "Transit", 1000), T)
    hit, _ = lookup_one(spark, cache, "127.0.0.1", 676)
    assert hit["__hit"] and hit.ExporterName == "localhost"
    assert (hit.InterfaceName, hit.InterfaceDescription, hit.InterfaceSpeed) == \
        ("Gi0/0/0/1", "Transit", 1000)
    miss1, _ = lookup_one(spark, cache, "127.0.0.1", 787)
    miss2, _ = lookup_one(spark, cache, "127.0.0.2", 676)
    assert not miss1["__hit"] and not miss2["__hit"]
    assert cache.count() == 1


def _three_entry_cache(spark):
    """Puts at T, T+10min, T+20min (cache_test.go:99-128)."""
    cache = empty_cache(spark)
    cache = cache_put(cache, entry(spark, "127.0.0.1", 676, "localhost",
                                   "Gi0/0/0/1", "Transit"), T)
    cache = cache_put(cache, entry(spark, "127.0.0.1", 678, "localhost2",
                                   "Gi0/0/0/2", "Peering"), T + 10 * MIN)
    cache = cache_put(cache, entry(spark, "127.0.0.2", 678, "localhost3",
                                   "Gi0/0/0/1", "IX"), T + 20 * MIN)
    return cache


def test_expire_ladder(spark):
    """cache_test.go:97-190 — access-clock expiry, oldest first."""
    cache = _three_entry_cache(spark)
    now = T + 30 * MIN
    cache = cache_expire(cache, now - 60 * MIN)
    assert len(keys_of(cache)) == 3
    cache = cache_expire(cache, now - 29 * MIN)
    assert keys_of(cache) == [(ip("127.0.0.1"), 678), (ip("127.0.0.2"), 678)]
    cache = cache_expire(cache, now - 19 * MIN)
    assert keys_of(cache) == [(ip("127.0.0.2"), 678)]
    cache = cache_expire(cache, now - 9 * MIN)
    assert keys_of(cache) == []
    # re-put after total expiry → entry survives a later, looser cutoff
    cache = cache_put(cache, entry(spark, "127.0.0.1", 676, "localhost",
                                   "Gi0/0/0/1", "Transit"), now)
    now += 10 * MIN
    cache = cache_expire(cache, now - 19 * MIN)
    hit, _ = lookup_one(spark, cache, "127.0.0.1", 676)
    assert hit["__hit"] and hit.ExporterName == "localhost"


def test_expire_refresh(spark):
    """cache_test.go:192-243 — Lookup bumps the access clock, so a
    touched old entry outlives an untouched newer one."""
    cache = _three_entry_cache(spark)
    now = T + 30 * MIN
    _, cache = lookup_one(spark, cache, "127.0.0.1", 676, now=now)
    now += 10 * MIN
    cache = cache_expire(cache, now - 29 * MIN)
    assert keys_of(cache) == [(ip("127.0.0.1"), 676), (ip("127.0.0.2"), 678)]
    hit, _ = lookup_one(spark, cache, "127.0.0.1", 676)
    assert hit.InterfaceDescription == "Transit"


def test_need_updates(spark):
    """cache_test.go:245-330 — update-clock staleness plan, including a
    refreshing Put that both renews entry 1 and replaces its answer."""
    cache = _three_entry_cache(spark)
    now = T + 30 * MIN
    cache = cache_put(cache, entry(spark, "127.0.0.1", 676, "localhost1",
                                   "Gi0/0/0/1", "Transit"), now)
    now += 10 * MIN

    def plan(minutes):
        rows = cache_need_updates(cache, now - minutes * MIN).collect()
        return {bytes(r.ExporterAddress): list(r.IfIndexes) for r in rows}

    assert plan(9) == {ip("127.0.0.1"): [676, 678], ip("127.0.0.2"): [678]}
    assert plan(19) == {ip("127.0.0.1"): [678], ip("127.0.0.2"): [678]}
    assert plan(29) == {ip("127.0.0.1"): [678]}
    assert plan(39) == {}
    # the refreshing Put replaced the answer (new values win)
    hit, _ = lookup_one(spark, cache, "127.0.0.1", 676)
    assert hit.ExporterName == "localhost1"


def test_save_load_roundtrip(spark, tmp_path):
    """cache_test.go:340-394 — a reloaded snapshot expires identically."""
    cache = _three_entry_cache(spark)
    target = str(tmp_path / "cache")
    cache_save(cache, target)
    reloaded = cache_load(spark, target)
    now = T + 30 * MIN
    reloaded = cache_expire(reloaded, now - 29 * MIN)
    assert keys_of(reloaded) == [(ip("127.0.0.1"), 678), (ip("127.0.0.2"), 678)]
    hit, _ = lookup_one(spark, reloaded, "127.0.0.2", 678)
    assert hit.ExporterName == "localhost3" and hit.InterfaceDescription == "IX"


def test_load_not_exist(spark, tmp_path):
    """cache_test.go:332-338."""
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        cache_load(spark, str(tmp_path / "does-not-exist"))


def test_cache_maintain_touch_then_expire(spark):
    """One micro-batch pass: referenced keys survive the idle TTL,
    unreferenced ones expire, and the stale set is the refresh plan."""
    from akvorado_spark.sources.metadata_cache import cache_maintain

    cache = _three_entry_cache(spark)          # puts at T, T+10m, T+20m
    now = T + 55 * MIN  # idle cutoff T+25m: outlives entry 3's T+20m access
    wire = spark.createDataFrame(
        [(ip("127.0.0.1"), 678, 678)],
        "ExporterAddress binary, InIf long, OutIf long")
    cache = cache_maintain(cache, wire, now, idle_ttl_s=30 * MIN)
    assert keys_of(cache) == [(ip("127.0.0.1"), 678)]
    plan = cache_need_updates(cache, now - 30 * MIN).collect()
    assert [(bytes(r.ExporterAddress), list(r.IfIndexes)) for r in plan] == \
        [(ip("127.0.0.1"), [678])]


def test_touch_from_flows_keeps_hot_interfaces(spark):
    """A flow batch referencing InIf/OutIf pairs keeps exactly those
    entries alive through an expiry pass."""
    cache = _three_entry_cache(spark)
    now = T + 30 * MIN
    flows = spark.createDataFrame(
        [(ip("127.0.0.1"), 676, 9999)],  # OutIf 9999 is not cached: no-op
        "ExporterAddress binary, InIf long, OutIf long")
    cache = touch_from_flows(cache, flows, now)
    cache = cache_expire(cache, now - 9 * MIN)
    assert keys_of(cache) == [(ip("127.0.0.1"), 676)]
