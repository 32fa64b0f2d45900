from opentsdb_spark.operators.downsample import downsample  # noqa: F401
from opentsdb_spark.operators.groupby import cross_series_aggregate  # noqa: F401
from opentsdb_spark.operators.rate import rate  # noqa: F401
