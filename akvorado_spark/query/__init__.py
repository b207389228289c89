from akvorado_spark.query.line import LineRequest, compile_line, oracle_line_sql

__all__ = ["LineRequest", "compile_line", "oracle_line_sql"]
