"""Prefix-attribute dimension sources (SURVEY §2.1 S12/S13;
reference outlet/geoip/, common/remotedatasource/, outlet/networks/root.go).

The reference merges three prefix→attribute sources into one trie:
user config, a polled remote HTTP JSON source, and GeoIP MMDBs.  The
Spark form of all three is the same: a small ``networks`` dimension
frame ``(lo BINARY, hi BINARY, plen INT, attrs...)`` that the LPM
join (operators/lpm.py) consumes, refreshed per batch and broadcast.

- ``networks_from_config``: in-process list of (cidr, attrs) dicts.
- ``networks_from_json``: a JSON file/dir of ``{prefix: {attrs}}``
  objects — the remote-source shape, read with ``spark.read.json``.
- GeoIP MMDB parsing needs a reader library this container doesn't
  ship; ``networks_from_geoip`` is a clearly-marked stub that accepts
  pre-extracted (cidr, country, state, city, asn) rows, which is what
  the MMDB walk produces.

Merge semantics: sources are concatenated; overlapping prefixes
resolve by longest-prefix-match with attribute inheritance inside
``lpm_join`` — exactly the reference's flattened-trie behavior
(outlet/networks/root.go:55-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range

NETWORK_ATTRS = ("name", "role", "site", "region", "tenant", "country", "state", "city", "asn")


def _rows(entries: list[tuple[str, dict]]) -> list[tuple]:
    out = []
    for cidr, attrs in entries:
        lo, hi = prefix_range(cidr)
        out.append(
            (lo, hi, prefix_mapped_len(cidr))
            + tuple(attrs.get(a) for a in NETWORK_ATTRS)
        )
    return out


def _schema() -> str:
    attr_types = ", ".join(
        f"{a} {'long' if a == 'asn' else 'string'}" for a in NETWORK_ATTRS
    )
    return f"lo binary, hi binary, plen int, {attr_types}"


def networks_from_config(
    spark: SparkSession, entries: list[tuple[str, dict]]
) -> DataFrame:
    """User-config networks: [(cidr, {name|role|site|...}), ...]."""
    from akvorado_spark.sources.tables import local_df

    return local_df(spark, _rows(entries), _schema())


def networks_from_json(spark: SparkSession, path: str) -> DataFrame:
    """Remote-source shape (S13): JSON objects
    ``{"prefix": "10.0.0.0/8", "name": ..., "role": ...}``."""
    raw = spark.read.json(path)
    entries = [
        (r["prefix"], {a: r[a] for a in NETWORK_ATTRS if a in raw.columns and r[a] is not None})
        for r in raw.collect()  # dimension source: small by construction
    ]
    return networks_from_config(spark, entries)


def networks_from_geoip(
    spark: SparkSession, extracted: list[tuple[str, str, str, str, int]]
) -> DataFrame:
    """S12: pre-extracted (cidr, country, state, city, asn) rows →
    networks dimension.  ``networks_from_mmdb`` feeds this from real
    MMDB bytes via the pure-Python reader in ``sources/mmdb.py``."""
    entries = [
        (cidr, {"country": co, "state": st, "city": ci, "asn": asn})
        for cidr, co, st, ci, asn in extracted
    ]
    return networks_from_config(spark, entries)


def networks_from_mmdb(spark: SparkSession, *dbs: bytes) -> DataFrame:
    """S12: one networks dimension from MMDB file bytes (country/city
    and/or ASN databases), walked by the in-repo MaxMind-DB reader.
    Hot-reload = re-calling this on file change and re-broadcasting —
    the reference watches the files the same way (outlet/geoip/)."""
    from akvorado_spark.sources.mmdb import read_mmdb_networks

    entries: list[tuple[str, dict]] = []
    for data in dbs:
        entries.extend(read_mmdb_networks(data))
    return networks_from_config(spark, entries)


def merge_networks(*sources: DataFrame) -> DataFrame:
    """Concatenate sources with their configuration order attached as
    ``__prio``: overlapping prefixes resolve longest-first as always,
    and equal-length ties go to the LATEST source — the reference walks
    its databases in configuration order and later trie inserts replace
    earlier ones (outlet/geoip/iter.go)."""
    from pyspark.sql import functions as F

    out = sources[0].withColumn("__prio", F.lit(0))
    for i, s in enumerate(sources[1:], start=1):
        out = out.unionByName(s.withColumn("__prio", F.lit(i)))
    return out
