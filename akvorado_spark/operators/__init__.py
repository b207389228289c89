from akvorado_spark.operators.lpm import lpm_join

__all__ = ["lpm_join"]
