"""Wire-record → flows-schema bridge.

The decoders (sources/wire.py) emit the reference's ``FlowMessage``
fixed fields: epoch seconds, 16-byte addresses, interface *indexes*.
The flows table wants timestamps, interface *names* and the exporter /
network attribute columns.  The reference crosses this gap inside its
enrichment step via the metadata lookup keyed by (exporter IP,
ifindex) (J6, outlet/metadata/root.go:175); this module is that
adapter for the Spark pipeline:

    decode_binary(raw, WIRE_SCHEMA, ...)        # bytes → wire rows
      → wire_to_flows(wire, interfaces=...)     # ifindex → names, typing
      → enrich(...)                             # networks LPM, classifiers
      → FlowIngest.process_batch / store

Scale: the interface table is per-(exporter, ifindex) — thousands of
rows at most — so both direction joins broadcast; the fact stream
stays shuffle-free through the bridge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from akvorado_spark.schema.definition import FlowSchema, flows_schema

# wire columns consumed by the bridge rather than stored directly
_WIRE_ONLY = ("InIf", "OutIf", "TCPFlags")

_DIRECTION_LABELS = {0: "ingress", 1: "egress"}


def wire_to_flows(
    wire: DataFrame,
    schema: FlowSchema | None = None,
    interfaces: DataFrame | None = None,
) -> DataFrame:
    """Type and name a decoded wire frame into the flows-schema shape.

    ``interfaces``: optional metadata snapshot with columns
    (ExporterAddress, IfIndex, Name, Description, Speed, ...) — the
    J6 lookup; joined once per direction with a broadcast hint.
    Missing lookups fall back to the numeric ifindex as the name, so
    rows are never dropped (the reference keeps flows whose metadata
    poll hasn't answered yet)."""
    schema = schema or flows_schema()
    df = wire.withColumn("TimeReceived", F.timestamp_seconds(F.col("TimeReceived")))
    df = df.withColumn(
        "FlowDirection",
        F.element_at(
            F.create_map(
                *[x for k, v in _DIRECTION_LABELS.items() for x in (F.lit(k), F.lit(v))]
            ),
            F.coalesce(F.col("FlowDirection"), F.lit(-1)).cast("int"),
        ),
    ).withColumn("FlowDirection", F.coalesce("FlowDirection", F.lit("undefined")))

    if interfaces is not None:
        attr_cols = [c for c in interfaces.columns if c not in ("ExporterAddress", "IfIndex")]
        for side, idx_col in (("InIf", "InIf"), ("OutIf", "OutIf")):
            sel = interfaces.select(
                "ExporterAddress",
                F.col("IfIndex").alias(idx_col),
                *[F.col(c).alias(f"__{side}_{c}") for c in attr_cols],
            )
            df = df.join(F.broadcast(sel), on=["ExporterAddress", idx_col], how="left")
            for c in attr_cols:
                df = df.withColumnRenamed(f"__{side}_{c}", f"{side}{c}")
    for side in ("InIf", "OutIf"):
        name = f"{side}Name"
        fallback = F.col(side).cast("string")
        if name in df.columns:
            df = df.withColumn(name, F.coalesce(F.col(name), fallback))
        else:
            df = df.withColumn(name, fallback)

    # project onto the stored schema, casting and defaulting
    out = []
    present = set(df.columns)
    for c in schema.stored():
        if c.generated:
            continue  # filled by schema.ingest()
        if c.name in present:
            out.append(F.col(c.name).cast(c.dtype).alias(c.name))
        else:
            out.append(F.lit(None).cast(c.dtype).alias(c.name))
    return df.select(*out)
