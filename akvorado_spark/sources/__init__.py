from akvorado_spark.sources.tables import TABLE_NAMES, load_table, load_tables
from akvorado_spark.sources.wire import (
    WIRE_SCHEMA,
    TemplateCache,
    netflow_batch_parser,
    parse_netflow,
    parse_sflow,
    sflow_batch_parser,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "WIRE_SCHEMA",
    "TemplateCache",
    "netflow_batch_parser",
    "parse_netflow",
    "parse_sflow",
    "sflow_batch_parser",
]
