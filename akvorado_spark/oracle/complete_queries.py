"""Oracle-checked exporters-table and autocomplete queries
(SURVEY §2.3 J8, §2.9 T6, §2.6 O4, §2.7 U2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from akvorado_spark.oracle.flows_view import oracle_view_sql, register_spark_view
from akvorado_spark.oracle.registry import register
from akvorado_spark.plans.exporters import exporters_frame, latest_exporters
from akvorado_spark.query.complete import complete_asn, complete_port
from akvorado_spark.sources.dictionaries import TCP_PORTS, UDP_PORTS

# --- exporters table: unpivot + replacing-merge ----------------------------


def _spark_exporters(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    df = spark.table("flows_v").select(
        "TimeReceived",
        "ExporterAddress",
        "ExporterName",
        "InIfName",
        "OutIfName",
        "InIfSpeed",
        "OutIfSpeed",
    )
    latest = latest_exporters(exporters_frame(df), ttl=None)
    return latest.select(
        "ExporterName",
        "IfName",
        F.unix_micros(F.col("TimeReceived").cast("timestamp")).alias("ts_us"),
        "IfSpeed",
    ).orderBy("ExporterName", "IfName")


def _oracle_exporters() -> str:
    return f"""
WITH src AS (SELECT * FROM {oracle_view_sql()}),
unp AS (
  SELECT TimeReceived, ExporterAddress, ExporterName, InIfName AS IfName, InIfSpeed AS IfSpeed FROM src
  UNION ALL
  SELECT TimeReceived, ExporterAddress, ExporterName, OutIfName, OutIfSpeed FROM src
),
latest AS (
  SELECT ExporterAddress, IfName, MAX(TimeReceived) AS TimeReceived
  FROM unp GROUP BY ExporterAddress, IfName
),
merged AS (
  SELECT u.ExporterAddress, u.IfName, u.TimeReceived,
         MAX(u.ExporterName) AS ExporterName, MAX(u.IfSpeed) AS IfSpeed
  FROM unp u JOIN latest l
    ON u.ExporterAddress = l.ExporterAddress AND u.IfName = l.IfName
   AND u.TimeReceived = l.TimeReceived
  GROUP BY u.ExporterAddress, u.IfName, u.TimeReceived
)
SELECT ExporterName, IfName, epoch_us(TimeReceived) AS ts_us, IfSpeed
FROM merged ORDER BY ExporterName, IfName"""


register("exporters_table", _spark_exporters, _oracle_exporters())


# --- autocomplete ----------------------------------------------------------

_AS_NAMES = [
    (64512, "blue-net"),
    (64513, "bluebird-net"),
    (64514, "green-net"),
    (64515, "lagoon-blue"),
    (15169, "Google"),
]
_PREFIX = "blue"
_LIMIT = 10


def _spark_complete_asn(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    return complete_asn(
        spark.table("flows_v"), _PREFIX, _AS_NAMES, _LIMIT, column="SrcAS"
    )


def _oracle_complete_asn() -> str:
    vals = ", ".join(f"({a}, '{n}')" for a, n in _AS_NAMES)
    return f"""
WITH source AS (SELECT * FROM {oracle_view_sql()}),
dico(asn, name) AS (VALUES {vals}),
seen AS (
  SELECT 'AS' || CAST(s.SrcAS AS STRING) AS label, d.name AS detail, 1 AS rank,
         row_number() OVER (ORDER BY COUNT(*) DESC, s.SrcAS) AS ord
  FROM source s JOIN dico d ON s.SrcAS = d.asn
  WHERE position(lower('{_PREFIX}') IN lower(d.name)) > 0
  GROUP BY s.SrcAS, d.name
),
fromdict AS (
  SELECT 'AS' || CAST(asn AS STRING) AS label, name AS detail, 2 AS rank,
         row_number() OVER (
           ORDER BY position(lower('{_PREFIX}') IN lower(name)), asn) AS ord
  FROM dico WHERE position(lower('{_PREFIX}') IN lower(name)) > 0
),
u AS (
  SELECT * FROM seen WHERE ord <= {_LIMIT}
  UNION ALL
  SELECT * FROM fromdict WHERE ord <= {_LIMIT}
)
SELECT label, detail FROM u
GROUP BY label, detail ORDER BY MIN(rank), MIN(ord), label LIMIT {_LIMIT}"""





def _spark_complete_port(spark, sf_dir):
    register_spark_view(spark, sf_dir)
    return complete_port(spark.table("flows_v"), "dom", _LIMIT, column="DstPort")


def _oracle_complete_port() -> str:
    tcp_vals = ", ".join(f"({p}, '{n}', 6)" for p, n in TCP_PORTS)
    udp_vals = ", ".join(f"({p}, '{n}', 17)" for p, n in UDP_PORTS)
    return f"""
WITH source AS (SELECT * FROM {oracle_view_sql()}),
dico(port, name, proto) AS (VALUES {tcp_vals}, {udp_vals}),
seen AS (
  SELECT CAST(s.DstPort AS STRING) AS label, d.name AS detail, 1 AS rank,
         row_number() OVER (ORDER BY COUNT(*) DESC, s.DstPort, s.Proto) AS ord
  FROM source s JOIN dico d ON s.DstPort = d.port AND s.Proto = d.proto
  WHERE s.Proto IN (6, 17)
    AND position(lower('dom') IN lower(d.name)) > 0
  GROUP BY s.DstPort, s.Proto, d.name
),
known AS (SELECT DISTINCT port, name FROM dico),
fromdict AS (
  SELECT CAST(port AS STRING) AS label, name AS detail, 2 AS rank,
         row_number() OVER (
           ORDER BY position(lower('dom') IN lower(name)), port) AS ord
  FROM known WHERE position(lower('dom') IN lower(name)) > 0
),
u AS (
  SELECT * FROM seen WHERE ord <= {_LIMIT}
  UNION ALL
  SELECT * FROM fromdict WHERE ord <= {_LIMIT}
)
SELECT label, detail FROM u
GROUP BY label, detail ORDER BY MIN(rank), MIN(ord), label LIMIT {_LIMIT}"""





# --- exporter-table completion (single-branch O4; reference
# console/filter.go:489-532 queries the exporters table directly) -----------

_IF_PREFIX = "0/"


def _spark_complete_ifname(spark, sf_dir):
    from akvorado_spark.query.complete import complete_exporter

    register_spark_view(spark, sf_dir)
    df = spark.table("flows_v").select(
        "TimeReceived",
        "ExporterAddress",
        "ExporterName",
        "InIfName",
        "OutIfName",
        "InIfSpeed",
        "OutIfSpeed",
    )
    latest = latest_exporters(exporters_frame(df), ttl=None)
    return complete_exporter(
        latest, _IF_PREFIX, _LIMIT, column="IfName", detail="interface name"
    )


def _oracle_complete_ifname() -> str:
    return f"""
WITH src AS (SELECT * FROM {oracle_view_sql()}),
unp AS (
  SELECT ExporterAddress, InIfName AS IfName FROM src
  UNION ALL
  SELECT ExporterAddress, OutIfName FROM src
),
names AS (
  SELECT DISTINCT IfName AS label FROM unp
  WHERE position(lower('{_IF_PREFIX}') IN lower(IfName)) > 0
)
SELECT label, 'interface name' AS detail FROM names
ORDER BY position(lower('{_IF_PREFIX}') IN lower(label)), label LIMIT {_LIMIT}"""


# Tagged UNION of the three completion branches (dictionary-backed ASN,
# port, exporter-table interface) — one correctness slot, each branch
# still hash-gated through its own ranking pipeline.
def _complete_suite_spark(spark, sf_dir):
    parts = []
    for name, fn in (
        ("complete_asn", _spark_complete_asn),
        ("complete_port", _spark_complete_port),
        ("complete_ifname", _spark_complete_ifname),
    ):
        df = fn(spark, sf_dir)
        parts.append(df.select(F.lit(name).alias("variant"), "label", "detail"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _complete_suite_oracle() -> str:
    return " UNION ALL ".join(
        f"SELECT '{name}' AS variant, label, detail FROM ({sql})"
        for name, sql in (
            ("complete_asn", _oracle_complete_asn()),
            ("complete_port", _oracle_complete_port()),
            ("complete_ifname", _oracle_complete_ifname()),
        )
    )


register("complete_suite", _complete_suite_spark, _complete_suite_oracle())


# --- exporters-list widget (reference console/widgets.go:111-132) ----------


def _spark_widget_exporters(spark, sf_dir):
    """Exporters-list widget (reference console/widgets.go:111-132).

    The reference serves this from the T6-materialized exporters table
    (``SELECT ExporterName .. GROUP BY .. ORDER BY``) — a trivial query
    over a small dimension table that FlowIngest maintains
    incrementally (plans/exporters.py).  The J8/T6 derivation pipeline
    itself is oracle-gated by ``exporters_table``; here, widget-on-raw
    semantics is a single-column distinct — dictionary-encoded scan,
    partial-agg distinct, no unpivot — which also matches the DISTINCT
    oracle exactly even if an exporter was renamed mid-window (the
    latest-merge path would keep only the newest name)."""
    register_spark_view(spark, sf_dir)
    return (
        spark.table("flows_v")
        .select("ExporterName")
        .distinct()
        .orderBy("ExporterName")
    )


def _oracle_widget_exporters() -> str:
    return f"""
SELECT DISTINCT ExporterName FROM {oracle_view_sql()}
ORDER BY ExporterName"""


register("widget_exporters", _spark_widget_exporters, _oracle_widget_exporters())
