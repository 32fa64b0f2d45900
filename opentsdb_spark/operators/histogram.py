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


# ---- codec registry (reference src/core/HistogramCodecManager.java:40-120:
# ---- maps a codec id byte to a decoder turning raw payloads into bucket
# ---- maps). Here a codec is a function raw-bytes-column -> buckets-array
# ---- column expression; ingest picks the codec by the point's codec id.
HistogramCodec = "Callable[[Column], Column]"
HISTOGRAM_CODECS: dict[int, object] = {}


def register_histogram_codec(codec_id: int):
    def deco(fn):
        HISTOGRAM_CODECS[codec_id] = fn
        return fn

    return deco


def get_histogram_codec(codec_id: int):
    try:
        return HISTOGRAM_CODECS[codec_id]
    except KeyError:
        raise ValueError(f"no histogram codec registered for id {codec_id}") from None


@register_histogram_codec(0)
def simple_histogram_json_codec(raw):
    """Codec 0 = SimpleHistogram JSON ({'b': {'lo,hi': n, ...}, 'u': n,
    'o': n}, reference SimpleHistogramDecoder) parsed natively."""
    j = raw.cast("string")
    m = F.from_json(j, "b map<string,bigint>, u bigint, o bigint")
    buckets = F.array_sort(
        F.transform(
            F.map_entries(m["b"]),
            lambda e: F.struct(
                F.split(e["key"], ",")[0].cast("float").alias("lower"),
                F.split(e["key"], ",")[1].cast("float").alias("upper"),
                e["value"].alias("count"),
            ),
        )
    )
    return F.struct(
        buckets.alias("buckets"),
        F.coalesce(m["u"], F.lit(0)).cast("long").alias("underflow"),
        F.coalesce(m["o"], F.lit(0)).cast("long").alias("overflow"),
    )


def decode_histogram_points(raw_points: DataFrame, codec_id_col: str = "codec_id",
                            raw_col: str = "raw", strict: bool = True) -> DataFrame:
    """Route raw histogram payloads through their registered codec (the
    HistogramCodecManager dispatch): one pass per registered codec id,
    unioned — each codec is a native expression, so this stays codegen.

    strict (default, matching the reference's decode throw for an unknown
    codec id): a payload whose codec_id has no registered codec raises
    instead of silently vanishing from the union (which would truncate
    every percentile computed downstream). The check is one short-circuit
    lookup job — histogram frames are ingested batches, not corpus scans;
    pass strict=False to skip it on a pre-validated frame."""
    if strict:
        # NULL codec ids must hit the probe too: ~isin(...) is NULL (not
        # true) for a NULL codec_id, which would let exactly the silent
        # union truncation strict mode exists to prevent slip through
        bad = (
            raw_points.where(
                F.col(codec_id_col).isNull()
                | ~F.col(codec_id_col).isin(list(HISTOGRAM_CODECS))
            )
            .select(codec_id_col)
            .first()
        )
        if bad is not None:
            raise ValueError(
                f"unknown histogram codec id {bad[0]} "
                f"(registered: {sorted(HISTOGRAM_CODECS)})"
            )
    parts = []
    for cid, codec in sorted(HISTOGRAM_CODECS.items()):
        part = raw_points.where(F.col(codec_id_col) == cid).withColumn(
            "__h", codec(F.col(raw_col))
        )
        parts.append(
            part.select(
                *[c for c in raw_points.columns if c not in (codec_id_col, raw_col)],
                F.col("__h.buckets").alias("buckets"),
                F.col("__h.underflow").alias("underflow"),
                F.col("__h.overflow").alias("overflow"),
            )
        )
    if not parts:
        raise ValueError("no histogram codecs registered")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
