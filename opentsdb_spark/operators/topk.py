"""Top-k series selection.

Reference: highestMax keeps the n series with the highest maximum value
(src/query/expression/HighestMax.java:33-151); highestCurrent keeps the n
series with the highest most-recent value (HighestCurrent.java).

Spark shape: score per series (one partial-aggregated groupBy), rank with a
row_number window over the (tiny) per-series score frame, then a broadcast
semi-join back onto the points — the big frame is scanned once and never
sorted globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _topk(points: DataFrame, series_cols: tuple[str, ...], score, n: int) -> DataFrame:
    scores = points.groupBy(*series_cols).agg(score.alias("__score"))
    # deterministic tie-break on the series key columns
    w = Window.orderBy(F.desc("__score"), *[F.asc(c) for c in series_cols])
    top = (
        scores.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n)
        .select(*series_cols)
    )
    return points.join(F.broadcast(top), on=list(series_cols), how="leftsemi")


def highest_max(points: DataFrame, series_cols: tuple[str, ...], n: int) -> DataFrame:
    """Keep the n series with the highest max(value)."""
    return _topk(points, series_cols, F.max("value"), n)


def highest_current(points: DataFrame, series_cols: tuple[str, ...], n: int) -> DataFrame:
    """Keep the n series with the highest most-recent value."""
    return _topk(points, series_cols, F.max_by("value", F.unix_millis("ts")), n)
