from akvorado_spark.filtering.parser import FilterError, parse_filter
from akvorado_spark.filtering.model import FilterSchema, flow_filter_schema
from akvorado_spark.filtering.compile import CompiledFilter, compile_filter

__all__ = [
    "FilterError",
    "FilterSchema",
    "CompiledFilter",
    "compile_filter",
    "flow_filter_schema",
    "parse_filter",
]
