"""Structured Streaming ingest — the Spark analog of the reference's TSD
server ingest path (SURVEY.md §2.9).

Reference semantics to reproduce:
  * telnet ``put`` and HTTP /api/put JSON land points idempotently keyed by
    (series, timestamp); last-write-wins on duplicates
    (tsd.storage.fix_duplicates, src/utils/Config.java:98-99,281-286)
  * no watermark machinery exists — points may arrive for any past time and
    are written to their hour-row; here: append-only sink partitioned by
    date, with dedup applied at compaction/query time (the reference equally
    resolves duplicates at read/compaction,
    src/core/CompactionQueue.java:66-69)
  * real-time publisher hook (src/tsd/RTPublisher.java, invoked at
    src/core/TSDB.java:1438-1444) -> optional second sink via foreachBatch
  * rollups are generated externally in the reference (arrive via
    /api/rollup, src/tsd/RollupDataPointRpc.java); here we can produce them
    ourselves with watermarked tumbling windows.

Scale notes: the sink is an append to date-partitioned Parquet — no global
state. Dedup is bounded per (series, ts) key inside a partition; the rollup
stream keeps only the open windows within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opentsdb_spark.sources.points import parse_put_lines, point_validity_col

# /api/put JSON body schema (reference src/tsd/PutDataPointRpc.java — the
# IncomingDataPoint fields: metric, timestamp, value, tags)
PUT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("value", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_put_stream(spark: SparkSession, path: str | None = None,
                    host: str | None = None, port: int | None = None) -> DataFrame:
    """Stream telnet ``put`` lines from a text-file directory or socket and
    parse them into points (reference src/tsd/PutDataPointRpc.java:742-775)."""
    if path is not None:
        lines = spark.readStream.format("text").load(path)
    elif host is not None and port is not None:
        lines = spark.readStream.format("socket").option("host", host).option("port", port).load()
    else:
        raise ValueError("need path or host/port")
    return parse_put_lines(lines, "value")


def parse_put_json(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse /api/put-style JSON objects (one per line/row) into points —
    shared by the streaming source and the batch /api/put handler. Rows
    failing JSON parse, numeric conversion, or point validity
    (checkMetricAndTags analog) are dropped; the handler diffs counts for
    its details response."""
    parsed = lines.select(F.from_json(col, PUT_JSON_SCHEMA).alias("p")).select("p.*")
    ts_ms = F.when(F.col("timestamp") >= 1_000_000_000_000, F.col("timestamp")).otherwise(
        F.col("timestamp") * 1000
    )
    return parsed.where(F.col("metric").isNotNull()).select(
        "metric",
        F.timestamp_millis(ts_ms).alias("ts"),
        F.col("value").cast("double").alias("value"),
        F.when(F.col("value").rlike(r"^-?\d+$"), F.col("value").cast("long")).alias("value_long"),
        "tags",
    ).where(F.col("value").isNotNull()).where(point_validity_col())


def read_json_stream(spark: SparkSession, path: str) -> DataFrame:
    """Stream /api/put-style JSON objects (one per line) into points."""
    return parse_put_json(spark.readStream.format("text").load(path))


# --- write-path point filter plugins ----------------------------------------
# WriteableDataPointFilterPlugin analog (reference src/core/
# WriteableDataPointFilterPlugin.java:86-117: allowDataPoint called per point
# before storage). Spark-first shape: a plugin is a callable
# (points DataFrame) -> boolean Column (the keep-predicate), so filtering
# stays inside whole-stage codegen instead of a per-point callback.
INGEST_FILTERS: list = []


def register_ingest_filter(fn) -> None:
    INGEST_FILTERS.append(fn)


def apply_ingest_filters(points: DataFrame) -> DataFrame:
    """AND every registered keep-predicate over the point frame (both batch
    import and the streaming sink route through this)."""
    for fn in INGEST_FILTERS:
        points = points.where(fn(points))
    return points


def dedup_last_write_wins(points: DataFrame, ingest_time_col: str | None = None) -> DataFrame:
    """Resolve duplicate (series, ts) points — fix_duplicates=true semantics
    (reference src/utils/Config.java:98-99: last write wins). Without an
    ingest-time column the max value wins (deterministic tie-break)."""
    from pyspark.sql import Window

    from opentsdb_spark.sources.points import series_id_col

    if ingest_time_col is None:
        # one WINNING ROW via max over the (value, value_long) struct —
        # independent max(value)/max(value_long) could pair a value from
        # one duplicate with the long of another, fabricating a point
        # neither write contained
        return (
            points.groupBy("metric", "tags", "ts")
            .agg(F.max(F.struct("value", "value_long")).alias("__w"))
            .select(
                "metric", "tags", "ts",
                F.col("__w.value").alias("value"),
                F.col("__w.value_long").alias("value_long"),
            )
        )
    w = Window.partitionBy(series_id_col(), F.col("ts")).orderBy(F.desc(ingest_time_col))
    return (
        points.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def write_points_stream(
    points: DataFrame,
    path: str,
    checkpoint: str,
    rt_publisher=None,
    trigger_seconds: int | None = None,
):
    """Append the point stream to a date-partitioned Parquet table.

    rt_publisher: optional callable(batch_df, batch_id) invoked per
    micro-batch — the RTPublisher plugin hook analog. Registered ingest
    filters (WriteableDataPointFilterPlugin analogs) gate every batch."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        out = apply_ingest_filters(batch).withColumn("dt", F.to_date("ts"))
        out.write.mode("append").partitionBy("dt").parquet(path)
        if rt_publisher is not None:
            rt_publisher(batch, batch_id)

    writer = points.writeStream.foreachBatch(_sink).option("checkpointLocation", checkpoint)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def rollup_stream(
    points: DataFrame,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Continuously produce rollup rows (sum/count/min/max per series per
    tumbling window) — the engine-side generator for the rollup tables the
    reference ingests via /api/rollup (SURVEY.md §2.9; schema per
    FIXTURES.md §2). Late data beyond the watermark is dropped (documented
    deviation: the reference accepts arbitrarily late rollup points; run a
    periodic batch backfill with plans.rollup.generate_rollup to catch
    stragglers)."""
    from opentsdb_spark.sources.points import series_id_col

    label = {"1 hour": "1h", "1 day": "1d", "10 minutes": "10m"}.get(interval, interval)
    out = (
        points.withWatermark("ts", watermark)
        .groupBy(F.window("ts", interval).alias("w"), series_id_col().alias("series_id"))
        .agg(
            F.first("metric").alias("metric"),
            F.first("tags").alias("tags"),
            F.sum("value").alias("sum"),
            F.count("value").alias("count"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .select(
            "metric",
            F.col("w.start").alias("ts"),
            "tags",
            F.expr("stack(4, 'sum', sum, 'count', CAST(count AS DOUBLE), 'min', min, 'max', max) AS (aggregator, value)"),
        )
        .withColumn("interval", F.lit(label))
    )
    return out


# /api/rollup JSON body (reference src/tsd/RollupDataPointRpc.java — an
# IncomingDataPoint plus interval + aggregator)
ROLLUP_JSON_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("value", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("interval", T.StringType()),
        T.StructField("aggregator", T.StringType()),
    ]
)

# /api/histogram JSON body (reference src/tsd/HistogramDataPointRpc.java +
# SimpleHistogram codec: buckets keyed "lower,upper")
HISTOGRAM_JSON_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("buckets", T.MapType(T.StringType(), T.LongType())),
        T.StructField("underflow", T.LongType()),
        T.StructField("overflow", T.LongType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _ts_ms_col(c):
    return F.when(c >= 1_000_000_000_000, c).otherwise(c * 1000)


def parse_rollup_json(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse /api/rollup JSON lines into rollup rows (FIXTURES.md §2 shape:
    metric, ts, tags, aggregator, value, interval)."""
    p = lines.select(F.from_json(F.col(col), ROLLUP_JSON_SCHEMA).alias("p")).select("p.*")
    return p.where(F.col("metric").isNotNull()).select(
        "metric",
        F.timestamp_millis(_ts_ms_col(F.col("timestamp"))).alias("ts"),
        "tags",
        F.lower("aggregator").alias("aggregator"),
        F.col("value").cast("double").alias("value"),
        "interval",
    ).where(F.col("value").isNotNull())


def parse_histogram_json(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse /api/histogram JSON lines into the histogram frame
    (operators.histogram.HISTOGRAM_SCHEMA): bucket map keys 'lower,upper'
    become typed structs."""
    p = lines.select(F.from_json(F.col(col), HISTOGRAM_JSON_SCHEMA).alias("p")).select("p.*")
    buckets = F.array_sort(
        F.transform(
            F.map_entries("buckets"),
            lambda e: F.struct(
                F.split(e["key"], ",")[0].cast("float").alias("lower"),
                F.split(e["key"], ",")[1].cast("float").alias("upper"),
                e["value"].alias("count"),
            ),
        )
    )
    return p.where(F.col("metric").isNotNull()).select(
        "metric",
        F.timestamp_millis(_ts_ms_col(F.col("timestamp"))).alias("ts"),
        buckets.alias("buckets"),
        F.coalesce("underflow", F.lit(0)).alias("underflow"),
        F.coalesce("overflow", F.lit(0)).alias("overflow"),
        "tags",
    )


def compact_points(spark: SparkSession, path: str, out_path: str,
                   target_partitions: int | None = None) -> None:
    """Maintenance compaction: rewrite the append-only point table with
    last-write-wins dedup and coalesced files — the batch analog of the
    reference's CompactionQueue (src/core/CompactionQueue.java:40-80, which
    rewrites a row's many cells into one) plus small-file OPTIMIZE."""
    df = spark.read.parquet(path)
    cols = [c for c in df.columns if c not in ("dt", "hr")]
    deduped = dedup_last_write_wins(df.select(*cols))
    out = deduped.withColumn("dt", F.to_date("ts"))
    if target_partitions:
        out = out.coalesce(target_partitions)
    out.write.mode("overwrite").partitionBy("dt").parquet(out_path)
