from opentsdb_spark.functions.aggregators import AGGREGATORS, AggSpec, get_aggregator  # noqa: F401
from opentsdb_spark.functions.filters import FILTERS, build_tag_filter, register_filter  # noqa: F401
