from akvorado_spark.operators.asof import asof_join
from akvorado_spark.operators.lpm import lpm_join
from akvorado_spark.operators.rangejoin import range_join

__all__ = ["asof_join", "lpm_join", "range_join"]
