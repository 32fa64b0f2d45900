"""opentsdb_spark — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of
OpenTSDB (reference: /root/reference, read-only), re-expressed as idiomatic
Spark DataFrame / SQL plans. The reference defines WHAT is computed (tagged
time-series model, tag filters, downsampling, rate conversion,
interpolation-aware cross-series aggregation, expression layers, rollups,
metadata APIs); Spark defines HOW (Catalyst plans, columnar scans,
shuffle-based parallelism, whole-stage codegen). No row-at-a-time UDFs on
the hot path.

Package layout:
  model        query model dataclasses (mirrors TSQuery/TSSubQuery/pojo.Query)
  timeparse    OpenTSDB date/interval syntax ("5m-ago", "2013/01/01-00:00:00")
  session      tuned SparkSession builder
  sources/     point-model loaders & line-protocol parsers
  functions/   aggregator + tag-filter registries (Column builders)
  operators/   downsample, fill, rate, cross-series aggregation, topk, joins
  plans/       TSQuery -> DataFrame compiler, rollup routing
  streaming/   Structured Streaming ingest, dedup, rollup writer
  pipeline/    large-scale data-pipeline extras (dedup, ANN, text, multimodal)
  serializer   OpenTSDB JSON response shape
"""

__version__ = "0.1.0"
