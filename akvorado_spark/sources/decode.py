"""Flow decoders (SURVEY §2.1 S5-S8).

The reference's wire pipeline carries ``RawFlow`` protobufs
(common/pb/rawflow.proto:6-34): ``{time_received, payload bytes,
source_address, decoder, ...}``; the outlet decodes NetFlow v5/v9 /
IPFIX / sFlow payloads into flow rows (outlet/flow/decoder/).

Decoding strategy here:

- **JSON decoder** (S7, the reference's gob test decoder analog):
  fully implemented — ``from_json`` against the flows schema, pure
  JVM, usable as the test/replay ingress.
- **NetFlow/sFlow binary decoders** (S5/S6): real parsers live in
  ``sources/wire.py`` (NetFlow v5 / v9 / IPFIX with template state,
  sFlow v5 with raw-header + extended records); plug them in via
  ``decode_binary(raw, WIRE_SCHEMA, "netflow",
  netflow_batch_parser())``.  Without a ``parse_batch`` callable the
  stub below raises, keeping the plumbing testable in isolation.

Scale: decode is mapInPandas over the raw stream — embarrassingly
parallel per Kafka partition; template state for NetFlow v9/IPFIX
would live in a per-exporter keyed state store
(applyInPandasWithState) keyed by source_address.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# RawFlow transport record (reference common/pb/rawflow.proto:6-34)
RAW_FLOW_SCHEMA = T.StructType(
    [
        T.StructField("time_received", T.TimestampType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("source_address", T.BinaryType()),
        T.StructField("decoder", T.StringType()),  # netflow | sflow | json
        T.StructField("timestamp_source", T.StringType()),
        T.StructField("decapsulation", T.StringType()),
        T.StructField("use_source_address", T.BooleanType()),
        T.StructField("rate_limit", T.LongType()),
    ]
)


def decode_json(raw: DataFrame, flow_schema: T.StructType, payload_col: str = "payload") -> DataFrame:
    """S7: JSON payload → flow rows, one-to-many via an array payload.

    Accepts either a single JSON object or a JSON array of objects per
    payload (a datagram can carry several flow records)."""
    js = F.col(payload_col).cast("string")
    arr = F.when(
        F.startswith(F.trim(js), F.lit("[")),
        F.from_json(js, T.ArrayType(flow_schema)),
    ).otherwise(F.array(F.from_json(js, flow_schema)))
    return raw.select(F.explode(arr).alias("f")).select("f.*")


def _stub_parser(kind: str) -> Callable:
    def parse_batch(payloads, source_addresses):  # pragma: no cover
        raise NotImplementedError(
            f"{kind} byte-level parsing is stubbed in this build "
            f"(reference outlet/flow/decoder/{kind}/decode.go); pass "
            f"parse_batch= to decode_binary to supply one."
        )

    return parse_batch


# RAW_FLOW column → parse_batch keyword, applied PER MESSAGE (the
# reference threads pb.RawFlow fields 1/6/7/4 through decoder.Options /
# post-decode override for every RawFlow independently,
# outlet/flow/decoder.go:34-52) — a mixed batch where exporters request
# different timestamp sources or decapsulation decodes each record with
# its own settings.
_OPTION_COLS = {
    "time_received": "times",
    "timestamp_source": "ts_sources",
    "decapsulation": "decaps",
    "use_source_address": "use_src",
}


def decode_binary(
    raw: DataFrame,
    flow_schema: T.StructType,
    kind: str = "netflow",
    parse_batch: Callable | None = None,
) -> DataFrame:
    """S5/S6/S8 plumbing: mapInPandas over RawFlow batches.

    ``parse_batch(payloads: pd.Series[bytes], source_addresses:
    pd.Series[bytes], **options) -> pd.DataFrame`` must return rows
    matching ``flow_schema``.  Template state (NetFlow v9/IPFIX)
    belongs in the parser closure keyed by source_address.

    Per-message options: every RAW_FLOW_SCHEMA option column present in
    ``raw`` that the parser's signature accepts (``times``,
    ``ts_sources``, ``decaps``, ``use_src``) is forwarded as a Series
    aligned with ``payloads`` — per-record fidelity to
    outlet/core/worker.go applying RawFlow options one message at a
    time.  Legacy two-argument parsers keep working.
    """
    import inspect

    parser = parse_batch or _stub_parser(kind)
    names = [f.name for f in flow_schema.fields]
    try:
        accepted = set(inspect.signature(parser).parameters)
    except (TypeError, ValueError):  # builtins / C callables
        accepted = set()
    raw_cols = set(raw.columns)
    forward = {
        col: kw
        for col, kw in _OPTION_COLS.items()
        if kw in accepted and col in raw_cols
    }

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            kwargs = {kw: pdf[col] for col, kw in forward.items()}
            out = parser(pdf["payload"], pdf["source_address"], **kwargs)
            yield out[names]

    return raw.filter(F.col("decoder") == kind).mapInPandas(run, flow_schema)
