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


# ---- search plugin surface (reference src/search/SearchPlugin.java:40-160:
# ---- implementations receive index/delete callbacks for TSMeta / UIDMeta /
# ---- annotations and serve executeQuery). The Spark analog: plugins get
# ---- DATAFRAMES, not single objects — an index event is a frame of rows to
# ---- (re)index; executeQuery receives the query dict and the point frame.
SEARCH_PLUGINS: list[object] = []


class SearchPlugin:
    """Subclass and override what you index; register with
    register_search_plugin(). All hooks receive DataFrames so a plugin can
    ship them to an external indexer partition-parallel (foreachPartition),
    never through the driver."""

    def index_tsmeta(self, frame: DataFrame) -> None:  # pragma: no cover
        pass

    def index_uidmeta(self, frame: DataFrame) -> None:  # pragma: no cover
        pass

    def index_annotation(self, frame: DataFrame) -> None:  # pragma: no cover
        pass

    def delete_tsmeta(self, tsuids: list[str]) -> None:  # pragma: no cover
        pass

    def execute_query(self, points: DataFrame, query: dict):  # pragma: no cover
        raise NotImplementedError


def register_search_plugin(plugin: "SearchPlugin") -> None:
    SEARCH_PLUGINS.append(plugin)


def notify_search_plugins(event: str, payload) -> None:
    """Fan an index/delete event out to every registered plugin (the
    reference calls the plugin after each meta write, TSDB.java:1100-1160)."""
    for p in SEARCH_PLUGINS:
        getattr(p, event)(payload)
