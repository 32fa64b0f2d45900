"""Histogram data points: merge aggregation + percentile extraction.

Reference semantics:
  * a histogram point is bucketed counts {[lower,upper): count} plus
    underflow/overflow (SimpleHistogram, src/core/SimpleHistogram.java:38-70)
  * aggregation across histograms is bucket-wise SUM only
    (src/core/HistogramAggregation.java:20-21,
    src/core/HistogramAggregationIterator.java)
  * percentile(p in [1,100]) walks buckets in order accumulating counts and
    returns the MIDPOINT (lower+upper)/2 of the first bucket whose
    cumulative share reaches p (src/core/SimpleHistogram.java:133-164)

Spark shape: buckets live as array<struct<lower,upper,count>>; merge =
explode -> groupBy(lower,upper) -> sum — a single shuffle; percentile =
cumulative-sum window per group then min-by over qualifying buckets. All
native expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

HISTOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField(
            "buckets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lower", T.FloatType()),
                        T.StructField("upper", T.FloatType()),
                        T.StructField("count", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField("underflow", T.LongType()),
        T.StructField("overflow", T.LongType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)


def synthesize_histograms(
    points: DataFrame,
    bucket_width: float,
    group_cols: tuple[str, ...],
    bucket_ms: int,
) -> DataFrame:
    """Build histogram points from raw numeric points (a histogram codec
    analog for testing/demo: fixed-width value buckets per time bucket)."""
    lower = F.floor(F.col("value") / bucket_width) * bucket_width
    b = F.timestamp_millis(
        F.unix_millis("ts") - F.unix_millis("ts") % F.lit(bucket_ms)
    )
    per_bucket = (
        points.withColumn("__t", b)
        .withColumn("__lo", lower.cast("float"))
        .groupBy(*group_cols, "__t", "__lo")
        .agg(F.count("*").cast("long").alias("count"))
    )
    return (
        per_bucket.groupBy(*group_cols, "__t")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__lo").alias("lower"),
                        (F.col("__lo") + F.lit(float(bucket_width))).cast("float").alias("upper"),
                        F.col("count"),
                    )
                )
            ).alias("buckets")
        )
        .withColumnRenamed("__t", "ts")
        .withColumn("underflow", F.lit(0).cast("long"))
        .withColumn("overflow", F.lit(0).cast("long"))
    )


def merge_histograms(hists: DataFrame, group_cols: tuple[str, ...]) -> DataFrame:
    """Bucket-wise SUM across histograms within each group (the only
    histogram aggregation the reference supports)."""
    exploded = hists.select(
        *group_cols, F.explode("buckets").alias("bk")
    ).select(*group_cols, "bk.lower", "bk.upper", "bk.count")
    return (
        exploded.groupBy(*group_cols, "lower", "upper")
        .agg(F.sum("count").alias("count"))
    )


def histogram_percentile(
    merged: DataFrame, group_cols: tuple[str, ...], perc: float
) -> DataFrame:
    """Reference percentile: first bucket (ascending) whose cumulative count
    share >= perc, emitting the bucket midpoint
    (src/core/SimpleHistogram.java:133-164)."""
    if not 1.0 <= perc <= 100.0:
        raise ValueError("perc must be in [1, 100]")
    w = Window.partitionBy(*group_cols).orderBy("lower").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(*group_cols)
    df = (
        merged.withColumn("__cum", F.sum("count").over(w))
        .withColumn("__tot", F.sum("count").over(wt))
        .where(F.col("__cum") * 100.0 / F.col("__tot") >= perc)
    )
    mid = (F.col("lower") + F.col("upper")) / 2.0
    return (
        df.withColumn("__mid", mid)
        .groupBy(*group_cols)
        .agg(F.min_by("__mid", "lower").alias("value"))
    )
