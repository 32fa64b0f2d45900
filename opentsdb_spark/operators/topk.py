"""Top-k series selection.

Reference: highestMax keeps the n series with the highest maximum value
(src/query/expression/HighestMax.java:33-151); highestCurrent keeps the n
series with the highest most-recent value (HighestCurrent.java).

Spark shape: score per series (one partial-aggregated groupBy), pick the top
n with orderBy+limit — Catalyst compiles that to TakeOrderedAndProject, a
DISTRIBUTED top-n (each partition keeps its local top n, the driver merges n
rows per partition) — then a broadcast semi-join back onto the points. The
big frame is scanned once; nothing is globally sorted and no single-partition
window exists at any series cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _topk(points: DataFrame, series_cols: tuple[str, ...], score, n: int) -> DataFrame:
    scores = points.groupBy(*series_cols).agg(score.alias("__score"))
    # deterministic tie-break on the series key columns; orderBy+limit =>
    # TakeOrderedAndProject (per-partition top-n + driver merge), never a
    # global sort or an unpartitioned window
    top = (
        scores.orderBy(F.desc("__score"), *[F.asc(c) for c in series_cols])
        .limit(n)
        .select(*series_cols)
    )
    return points.join(F.broadcast(top), on=list(series_cols), how="leftsemi")


def highest_max(points: DataFrame, series_cols: tuple[str, ...], n: int) -> DataFrame:
    """Keep the n series with the highest max(value)."""
    return _topk(points, series_cols, F.max("value"), n)


def highest_current(points: DataFrame, series_cols: tuple[str, ...], n: int) -> DataFrame:
    """Keep the n series with the highest most-recent value."""
    return _topk(points, series_cols, F.max_by("value", F.unix_millis("ts")), n)
