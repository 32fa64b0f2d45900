"""Rate conversion (derivative) with counter semantics.

Reference: src/core/RateSpan.java:119-180 (populateNextRate),
src/core/RateOptions.java:27-97.

Per series, for each adjacent pair (t0,v0) -> (t1,v1):
    rate = (v1 - v0) / ((t1 - t0) / 1000 seconds)
Counter mode: if v1 < v0 the counter wrapped:
    diff = counter_max - v0 + v1
    if drop_resets: drop the point instead                    (:149-156)
    elif reset_value > 0 and rate > reset_value: rate = 0     (:165-171)
First point: the reference computes the first rate against a synthetic
(t=0, v=0) point "for backward compatibility" (RateSpan.java:108-114).
``first_vs_zero=True`` reproduces that; the default drops the first point
(the sane semantics; deviation documented in SURVEY.md §7.4.4).

Spark shape: a single window (partitionBy series, orderBy ts) — one shuffle
keyed by series, which co-locates each series' points exactly like the
reference's per-Span iterator, but parallel across series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentsdb_spark.model import RateOptions


def rate(
    points: DataFrame,
    options: RateOptions | None = None,
    series_cols: tuple[str, ...] = ("metric", "tags"),
    first_vs_zero: bool | None = None,
) -> DataFrame:
    """Convert each series' values to per-second rates of change.

    ``first_vs_zero`` overrides ``options.first_vs_zero`` when given —
    the query surface reaches the quirk through RateOptions (m= spec
    'rate{...,fvz}', JSON rateOptions.firstVsZero)."""
    opts = options or RateOptions()
    if first_vs_zero is None:
        first_vs_zero = opts.first_vs_zero
    # partition key: maps can't be partition keys pre-canonicalization, so
    # key on a deterministic string when tags is among the series columns
    part_cols = list(series_cols)
    df = points
    if "tags" in part_cols:
        from opentsdb_spark.sources.points import series_id_col

        df = df.withColumn("__sid", series_id_col("metric", "tags"))
        part_cols = [c for c in part_cols if c != "tags"] + ["__sid"]

    w = Window.partitionBy(*part_cols).orderBy("ts")
    t1 = F.unix_millis("ts").cast("double") / 1000.0
    t0 = F.lag(t1).over(w)
    v1 = F.col("value")
    v0 = F.lag(v1).over(w)
    if first_vs_zero:
        t0 = F.coalesce(t0, F.lit(0.0))
        v0 = F.coalesce(v0, F.lit(0.0))

    dt = t1 - t0
    diff = v1 - v0
    plain_rate = diff / dt

    if opts.counter:
        wrapped_diff = F.lit(float(opts.counter_max)) - v0 + v1
        wrapped_rate = wrapped_diff / dt
        if opts.drop_resets:
            rate_col = F.when(diff < 0, F.lit(None).cast("double")).otherwise(plain_rate)
        elif opts.reset_value > 0:
            rate_col = F.when(
                diff >= 0, plain_rate
            ).otherwise(
                F.when(wrapped_rate > float(opts.reset_value), F.lit(0.0)).otherwise(wrapped_rate)
            )
        else:
            rate_col = F.when(diff >= 0, plain_rate).otherwise(wrapped_rate)
    else:
        rate_col = plain_rate

    out = df.withColumn("value", rate_col).where(F.col("value").isNotNull())
    return out.drop("__sid") if "__sid" in df.columns else out
