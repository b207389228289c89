from akvorado_spark.functions.time import time_bucket_us, time_bucket_ts

__all__ = ["time_bucket_us", "time_bucket_ts"]
