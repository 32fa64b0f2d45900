"""Per-series downsampling with fill policies.

Semantics (reference src/core/DownsamplingSpecification.java:107-191,
src/core/Downsampler.java:28-515):
  * fixed intervals: bucket start = ts - (ts % interval)   (:452-454)
  * calendar intervals ('Nc'): buckets aligned to calendar boundaries in a
    query timezone (:135-147)
  * '0all': a single bucket spanning [query_start, query_end]  (:354-379)
  * fill policies for EMPTY buckets across the whole query range
    (reference src/core/FillPolicy.java:22-28,
    src/core/FillingDownsampler.java:25-120): none|zero|nan|null|scalar.

Spark shape: one shuffle (groupBy series+bucket); the dense-grid fill is a
`sequence()` explode over the distinct-series frame (no Python loop, no
UDF). At scale the grid size is bounded by range/interval — downsampling
always *reduces* cardinality before the cross-series stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.functions.aggregators import get_aggregator
from opentsdb_spark.model import DownsampleSpec

_CAL_TRUNC = {"m": "minute", "h": "hour", "d": "day", "w": "week", "n": "month", "y": "year"}


def bucket_col(ts_col, interval_ms: int):
    """Fixed-interval bucket start: ts - ts % interval (epoch-ms arithmetic)."""
    ms = F.unix_millis(ts_col)
    return F.timestamp_millis(ms - ms % F.lit(interval_ms))


def calendar_bucket_col(ts_col, unit: str, timezone: str):
    """Calendar-aligned bucket start in ``timezone`` (reference
    DownsamplingSpecification.java:135-147): shift into the zone, truncate,
    shift back — all JVM-side datetime expressions."""
    trunc = _CAL_TRUNC[unit]
    local = F.from_utc_timestamp(ts_col, timezone)
    return F.to_utc_timestamp(F.date_trunc(trunc, local), timezone)


def downsample(
    points: DataFrame,
    spec: DownsampleSpec,
    start_ms: int | None = None,
    end_ms: int | None = None,
    series_cols: tuple[str, ...] = ("metric", "tags"),
) -> DataFrame:
    """Downsample each series independently.

    Input: point frame with ``series_cols`` + (ts, value).
    Output: same series columns + (ts=bucket start, value=aggregated), one
    row per non-empty bucket — or per grid bucket when fill != 'none'.
    """
    agg = get_aggregator(spec.aggregator)
    if spec.run_all or spec.interval_ms == 0:
        # single bucket over the whole range, stamped at query start
        # (reference Downsampler.java:354-379)
        if start_ms is None:
            raise ValueError("'0all' downsample requires query start")
        bucket = F.timestamp_millis(F.lit(start_ms))
    elif spec.calendar:
        if spec.calendar_n == 1:
            bucket = calendar_bucket_col(F.col("ts"), spec.calendar_unit or "d", spec.timezone)
        elif spec.calendar_unit in ("m", "h"):
            # N-multiple sub-day calendar buckets ('15mc', '6hc'): floor the
            # LOCAL wall-clock epoch to N*unit, shift back to UTC — aligned
            # to local midnight like the reference's Calendar stepping
            # (DownsamplingSpecification.java:135-147)
            unit_ms = 60_000 if spec.calendar_unit == "m" else 3_600_000
            step = spec.calendar_n * unit_ms
            local_ms = F.unix_millis(F.from_utc_timestamp(F.col("ts"), spec.timezone))
            floored = F.timestamp_millis(local_ms - local_ms % F.lit(step))
            bucket = F.to_utc_timestamp(floored, spec.timezone)
        else:
            raise NotImplementedError(
                "calendar downsample supports N=1 for d/w/n/y and any N for m/h"
            )
    else:
        bucket = bucket_col(F.col("ts"), spec.interval_ms)

    out = (
        points.withColumn("__bucket", bucket)
        .groupBy(*series_cols, "__bucket")
        .agg(agg.builder(F.col("value"), F.unix_millis("ts")).alias("value"))
        .withColumnRenamed("__bucket", "ts")
    )

    if spec.fill != "none":
        out = _fill_grid(out, spec, start_ms, end_ms, series_cols)
    return out


def _fill_grid(
    buckets: DataFrame,
    spec: DownsampleSpec,
    start_ms: int | None,
    end_ms: int | None,
    series_cols: tuple[str, ...],
) -> DataFrame:
    """Emit every grid bucket in [start, end) per series, filling empties
    (reference FillingDownsampler.java:25-120: fill spans the whole query
    range, not just interior gaps)."""
    if start_ms is None or end_ms is None:
        raise ValueError("fill policies require query start/end")
    if spec.calendar:
        raise NotImplementedError("fill grid for calendar intervals not yet supported")
    iv = spec.interval_ms
    first = start_ms - start_ms % iv
    last = (end_ms - 1) - ((end_ms - 1) % iv)
    fill_val = {
        "zero": F.lit(0.0),
        "nan": F.lit(float("nan")),
        "null": F.lit(None).cast("double"),
        "scalar": F.lit(float(spec.fill_scalar)),
    }[spec.fill]

    # tags is a map column: Spark disallows set ops / join equality on maps,
    # so deduplicate + join on a canonical series-id string instead
    if "tags" in series_cols:
        from opentsdb_spark.sources.points import series_id_col

        buckets = buckets.withColumn("__sid", series_id_col("metric", "tags"))
        series = buckets.groupBy("__sid").agg(
            *[F.first(c).alias(c) for c in series_cols]
        )
        join_keys = ["__sid", "ts"]
    else:
        series = buckets.select(*series_cols).distinct()
        join_keys = [*series_cols, "ts"]

    grid = series.withColumn(
        "ts",
        F.explode(
            F.sequence(
                F.timestamp_millis(F.lit(first)),
                F.timestamp_millis(F.lit(last)),
                F.expr(f"INTERVAL {iv} MILLISECONDS"),
            )
        ),
    )
    cols = ["value"] if "tags" not in series_cols else ["__sid", "ts", "value"]
    if "tags" in series_cols:
        grid = grid.join(buckets.select(*cols), on=join_keys, how="left").drop("__sid")
    else:
        grid = grid.join(buckets.select(*join_keys, "value"), on=join_keys, how="left")
    return grid.withColumn("value", F.coalesce(F.col("value"), fill_val))
