"""Metadata / discovery operators (SURVEY.md §2.11).

  suggest  /api/suggest prefix autocomplete, capped at 25
           (reference src/tsd/SuggestRpc.java, src/uid/UniqueId.java:88-89,
           960-976 — scans the UID table by prefix)
  lookup   /api/search/lookup — series by metric and/or tag pairs; tag-key
           terms AND'd, bare values OR'd
           (reference src/search/TimeSeriesLookup.java:48-70)
  last     /api/query/last — most recent point per series
           (reference src/tsd/QueryRpc.java:802-839, src/meta/TSUIDQuery.java)

The reference needs dedicated UID/meta tables for these; on Spark they are
small aggregations over the point frame itself (or over a maintained
series-index table for 100 TB deployments — see streaming.ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.sources.points import series_id_col

SUGGEST_MAX = 25  # reference src/uid/UniqueId.java:88-89


def suggest(points: DataFrame, kind: str, prefix: str = "", limit: int = SUGGEST_MAX) -> DataFrame:
    """Prefix autocomplete over metric / tagk / tagv names."""
    if kind == "metrics":
        names = points.select(F.col("metric").alias("name"))
    elif kind == "tagk":
        names = points.select(F.explode(F.map_keys("tags")).alias("name"))
    elif kind == "tagv":
        names = points.select(F.explode(F.map_values("tags")).alias("name"))
    else:
        raise ValueError(f"suggest kind must be metrics|tagk|tagv, got {kind!r}")
    return (
        names.where(F.col("name").startswith(prefix))
        .distinct()
        .orderBy("name")
        .limit(limit)
    )


def lookup(
    points: DataFrame,
    metric: str | None = None,
    tag_pairs: dict[str, str | None] | None = None,
    values: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct series matching metric and/or tag terms.

    tag_pairs: {tagk: tagv or None} — None means "key present, any value";
    pairs are AND'd. ``values`` are bare tag values, OR'd
    (reference TimeSeriesLookup.java:48-70).
    Returns (series_id, metric, tags).
    """
    df = points
    if metric:
        df = df.where(F.col("metric") == metric)
    for k, v in (tag_pairs or {}).items():
        if v is None:
            df = df.where(F.map_contains_key(F.col("tags"), k))
        else:
            df = df.where(F.col("tags").getItem(k) == v)
    if values:
        pred = None
        for v in values:
            c = F.array_contains(F.map_values("tags"), v)
            pred = c if pred is None else (pred | c)
        df = df.where(pred)
    return (
        df.withColumn("series_id", series_id_col())
        .groupBy("series_id")
        .agg(F.first("metric").alias("metric"), F.first("tags").alias("tags"))
    )


def last_points(points: DataFrame, metric: str | None = None, back_scan_ms: int | None = None,
                now_ms: int | None = None) -> DataFrame:
    """Most recent point per series (optionally bounded to a back-scan
    window, mirroring the reference's hour-row back_scan)."""
    df = points
    if metric:
        df = df.where(F.col("metric") == metric)
    if back_scan_ms is not None:
        if now_ms is None:
            raise ValueError("back_scan needs now_ms")
        df = df.where(F.unix_millis("ts") >= now_ms - back_scan_ms)
    return (
        df.withColumn("series_id", series_id_col())
        .groupBy("series_id")
        .agg(
            F.first("metric").alias("metric"),
            F.max_by("value", F.unix_millis("ts")).alias("value"),
            F.max(F.unix_millis("ts")).alias("ts_ms"),
        )
    )
