from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser
from timeseriesfuser_spark.operators.fill import forward_fill
from timeseriesfuser_spark.operators.resample import resample_last_interval

__all__ = ["TimeSeriesFuser", "forward_fill", "resample_last_interval"]
