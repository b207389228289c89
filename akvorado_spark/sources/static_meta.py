"""Static metadata provider (S16's static form): subnet-keyed exporter
configuration with per-ifindex interface attributes and an optional
Default interface fallback — the Spark re-expression of the reference's
``outlet/metadata/provider/static`` (root.go, config.go; semantics
mirrored from its TestStaticProvider).

Config shape (one entry per exporter subnet)::

    {
        "2001:db8:1::/48": {
            "name": "router-a", "region": "eu", "role": "edge",
            "site": "par", "group": "blue", "tenant": "acme",
            "default": {"name": "Default0", "description": "...", "speed": 1000},
            "ifindexes": {10: {"name": "Gi10", "speed": 1000,
                               "provider": "transit101",
                               "connectivity": "transit",
                               "boundary": "external"}},
        },
    }

Resolution per flow: the exporter address LPM-matches a config subnet
(longest wins, like the reference's SubnetMap); each direction's
ifindex looks up the subnet's interface map with the Default as
fallback; a miss with no default leaves the interface attrs NULL — the
reference skips such flows ("metadata missing"), which
``drop_unresolved=True`` (default) reproduces.

Scale shape: the config is dimension-sized, so the whole lookup is a
broadcast LPM join carrying ONE map column per subnet
(ifindex → attrs struct) plus the default struct; the per-direction
resolution is an ``element_at``/``coalesce`` projection — no extra
join per interface, no shuffle on the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from akvorado_spark.functions.ip import prefix_mapped_len, prefix_range
from akvorado_spark.operators.lpm import lpm_join

_IFACE_TYPE = T.StructType(
    [
        T.StructField("Name", T.StringType()),
        T.StructField("Description", T.StringType()),
        T.StructField("Speed", T.LongType()),
        T.StructField("Provider", T.StringType()),
        T.StructField("Connectivity", T.StringType()),
        T.StructField("Boundary", T.StringType()),
    ]
)

_EXPORTER_ATTRS = ("Name", "Group", "Role", "Site", "Region", "Tenant")


def _iface(d: dict | None):
    if d is None:
        return None
    return (
        d.get("name", ""),
        d.get("description", ""),
        int(d.get("speed", 0)),
        d.get("provider", ""),
        d.get("connectivity", ""),
        d.get("boundary", "undefined"),
    )


def static_metadata_frame(spark: SparkSession, exporters: dict[str, dict]) -> DataFrame:
    """Compile the static config into the LPM-joinable snapshot."""
    rows = []
    for cidr, cfg in exporters.items():
        lo, hi = prefix_range(cidr)
        rows.append(
            (
                cidr,
                lo,
                hi,
                prefix_mapped_len(cidr),
                cfg.get("name", ""),
                cfg.get("group", ""),
                cfg.get("role", ""),
                cfg.get("site", ""),
                cfg.get("region", ""),
                cfg.get("tenant", ""),
                {int(k): _iface(v) for k, v in (cfg.get("ifindexes") or {}).items()},
                _iface(cfg.get("default")),
            )
        )
    schema = T.StructType(
        [
            T.StructField("prefix", T.StringType()),
            T.StructField("lo", T.BinaryType()),
            T.StructField("hi", T.BinaryType()),
            T.StructField("plen", T.IntegerType()),
            T.StructField("ExporterName", T.StringType()),
            T.StructField("ExporterGroup", T.StringType()),
            T.StructField("ExporterRole", T.StringType()),
            T.StructField("ExporterSite", T.StringType()),
            T.StructField("ExporterRegion", T.StringType()),
            T.StructField("ExporterTenant", T.StringType()),
            T.StructField("__ifmap", T.MapType(T.LongType(), _IFACE_TYPE)),
            T.StructField("__ifdefault", _IFACE_TYPE),
        ]
    )
    return spark.createDataFrame(rows, schema)


def resolve_static_metadata(
    wire: DataFrame,
    meta: DataFrame,
    drop_unresolved: bool = True,
) -> DataFrame:
    """Attach exporter + interface attributes from the static config to
    a wire frame carrying (ExporterAddress, InIf, OutIf).

    ``drop_unresolved``: reproduce the reference's skip — a flow whose
    exporter matches no subnet, or whose ifindex misses a map with no
    Default, is dropped ("metadata missing", enricher.go:86-89).
    """
    attrs = [f"Exporter{a}" for a in _EXPORTER_ATTRS if a != "Name"]
    attrs = ["ExporterName", *attrs, "__ifmap", "__ifdefault"]
    df = lpm_join(wire, meta, "ExporterAddress", attrs=attrs)
    for side in ("In", "Out"):
        iface = F.coalesce(
            F.element_at(F.col("__ifmap"), F.col(f"{side}If").cast("long")),
            F.col("__ifdefault"),
        )
        df = df.withColumn(f"__{side}_iface", iface)
        for fld in _IFACE_TYPE.fieldNames():
            df = df.withColumn(f"{side}If{fld}", F.col(f"__{side}_iface.{fld}"))
    df = df.drop("__ifmap", "__ifdefault", "__In_iface", "__Out_iface")
    if drop_unresolved:
        df = df.filter(
            F.coalesce(F.col("ExporterName"), F.lit("")) != ""
        ).filter(F.col("InIfName").isNotNull() & F.col("OutIfName").isNotNull())
    return df
