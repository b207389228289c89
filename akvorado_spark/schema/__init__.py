from akvorado_spark.schema.definition import (
    FlowColumn,
    FlowSchema,
    flows_schema,
)

__all__ = ["FlowColumn", "FlowSchema", "flows_schema"]
