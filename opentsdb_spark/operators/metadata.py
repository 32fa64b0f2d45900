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


SEARCH_TYPES = ("tsmeta", "tsmeta_summary", "tsuids", "uidmeta", "annotation")


def search_meta(
    points: DataFrame,
    search_type: str,
    query: str = "",
    annotations: DataFrame | None = None,
) -> DataFrame:
    """Built-in /api/search backend over the derived meta frames.

    The reference hands every non-LOOKUP search to the SearchPlugin
    (src/tsd/SearchRpc.java:84-93, src/search/SearchQuery.java types TSMETA /
    TSMETA_SUMMARY / TSUIDS / UIDMETA / ANNOTATION) and errors out when none
    is installed; here the DataFrame-native default serves the same shapes
    directly — a registered SearchPlugin can still take over in the handler.
    ``query`` is a case-insensitive substring match over the type's
    searchable text (plugin engines define their own syntax; substring is
    the engine-neutral default). Returns an UNCOLLECTED, deterministically
    ordered frame — the handler pages with offset/limit so the plan compiles
    to TakeOrderedAndProject, never a full driver collect."""
    from opentsdb_spark.operators.uid import tsmeta_frame, uid_listing

    q = (query or "").lower()

    def _match(col):
        return F.lower(col).contains(q) if q else F.lit(True)

    if search_type == "tsuids":
        base = tsmeta_frame(points).select("tsuid")
        return base.where(_match(F.col("tsuid"))).orderBy("tsuid")
    if search_type == "tsmeta":
        base = tsmeta_frame(points)
        return (
            base.where(_match(F.col("tsuid")))
            .select(
                "tsuid",
                F.unix_millis("created").alias("created_ms"),
                F.unix_millis("last_received").alias("last_received_ms"),
                "total_dps",
            )
            .orderBy("tsuid")
        )
    if search_type == "tsmeta_summary":
        base = (
            points.withColumn("tsuid", series_id_col())
            .groupBy("tsuid")
            .agg(F.first("metric").alias("metric"), F.first("tags").alias("tags"))
        )
        return base.where(_match(F.col("tsuid"))).orderBy("tsuid")
    if search_type == "uidmeta":
        parts = [
            uid_listing(points, kind).select(
                F.lit(ref_kind).alias("type"), "name", "points",
                F.unix_millis("first_seen").alias("first_seen_ms"),
                F.unix_millis("last_seen").alias("last_seen_ms"),
            )
            for kind, ref_kind in (("metrics", "METRIC"), ("tagk", "TAGK"), ("tagv", "TAGV"))
        ]
        u = parts[0].unionByName(parts[1]).unionByName(parts[2])
        return u.where(_match(F.col("name"))).orderBy("type", "name")
    if search_type == "annotation":
        if annotations is None:
            raise ValueError("annotation search needs an annotations frame")
        searchable = F.concat_ws(
            " ", F.coalesce("tsuid", F.lit("")), F.coalesce("description", F.lit("")),
            F.coalesce("notes", F.lit("")),
        )
        return (
            annotations.where(_match(searchable))
            .orderBy(F.col("start_time"), F.col("tsuid"))
        )
    raise ValueError(f"search type must be one of {SEARCH_TYPES}, got {search_type!r}")


# ---- search plugin surface (reference src/search/SearchPlugin.java:40-160:
# ---- implementations receive index/delete callbacks for TSMeta / UIDMeta /
# ---- annotations and serve executeQuery). The Spark analog: plugins get
# ---- DATAFRAMES, not single objects — an index event is a frame of rows to
# ---- (re)index; executeQuery receives the query dict and the point frame.
SEARCH_PLUGINS: list[object] = []


class SearchPlugin:
    """Subclass and override what you index; register with
    register_search_plugin(). Hook set mirrors the reference's abstract
    plugin (src/search/SearchPlugin.java:65-164: initialize/shutdown/version/
    collectStats + index/delete per doc type + executeQuery). Index hooks
    receive DataFrames so a plugin can ship them to an external indexer
    partition-parallel (foreachPartition), never through the driver."""

    def initialize(self, spark) -> None:  # pragma: no cover
        pass

    def shutdown(self) -> None:  # pragma: no cover
        pass

    def version(self) -> str:  # pragma: no cover
        return "2.0.0"

    def collect_stats(self) -> dict:  # pragma: no cover
        return {}

    def index_tsmeta(self, frame: DataFrame) -> None:  # pragma: no cover
        pass

    def index_uidmeta(self, frame: DataFrame) -> None:  # pragma: no cover
        pass

    def index_annotation(self, frame: DataFrame) -> None:  # pragma: no cover
        pass

    def delete_tsmeta(self, tsuids: list[str]) -> None:  # pragma: no cover
        pass

    def delete_uidmeta(self, kind: str, name: str) -> None:  # pragma: no cover
        pass

    def delete_annotation(self, tsuid: str | None, start_ms: int) -> None:  # pragma: no cover
        pass

    def execute_query(self, points: DataFrame, query: dict):  # pragma: no cover
        raise NotImplementedError


class FrameIndexSearchPlugin(SearchPlugin):
    """Working index backend over DataFrames — the engine-native analog of
    the reference's Elasticsearch plugin (SearchPlugin.java's contract:
    maintain one document index per meta type, newest record wins, serve
    /api/search from the index instead of the primary store).

    One deduplicated frame per doc type; index_* anti-joins the incoming
    keys out of the held frame then unions (last write wins), delete_*
    anti-filters. Frames stay lazy — nothing is collected; at scale the held
    frame is a lineage over the meta deltas, so a production subclass would
    checkpoint it to a table every N updates (same role as the reference
    plugin's bulk-flush timer)."""

    _KEYS = {
        "tsmeta": ("tsuid",),
        "uidmeta": ("kind", "name"),
        "annotation": ("tsuid", "start_time"),
    }

    def __init__(self) -> None:
        self.indexes: dict[str, DataFrame] = {}
        self.stats = {"index_calls": 0, "delete_calls": 0}

    def _merge(self, doc_type: str, frame: DataFrame) -> None:
        keys = list(self._KEYS[doc_type])
        cur = self.indexes.get(doc_type)
        if cur is not None:
            # null-safe key equality: GLOBAL annotations carry tsuid=NULL
            # (Annotation.java global notes), and a plain on=keys anti-join
            # never matches NULL keys — re-indexing a global annotation
            # would keep the stale row alongside the new one, breaking
            # last-write-wins. eqNullSafe treats NULL as a joinable value.
            incoming = frame.select(*keys).distinct()
            cond = None
            for k in keys:
                c = cur[k].eqNullSafe(incoming[k])
                cond = c if cond is None else (cond & c)
            kept = cur.join(incoming, on=cond, how="left_anti")
            frame = kept.unionByName(frame, allowMissingColumns=True)
        self.indexes[doc_type] = frame
        self.stats["index_calls"] += 1

    def index_tsmeta(self, frame: DataFrame) -> None:
        self._merge("tsmeta", frame)

    def index_uidmeta(self, frame: DataFrame) -> None:
        self._merge("uidmeta", frame)

    def index_annotation(self, frame: DataFrame) -> None:
        self._merge("annotation", frame)

    def delete_tsmeta(self, tsuids: list[str]) -> None:
        if "tsmeta" in self.indexes:
            self.indexes["tsmeta"] = self.indexes["tsmeta"].where(
                ~F.col("tsuid").isin(list(tsuids))
            )
            self.stats["delete_calls"] += 1

    def delete_uidmeta(self, kind: str, name: str) -> None:
        if "uidmeta" in self.indexes:
            self.indexes["uidmeta"] = self.indexes["uidmeta"].where(
                ~((F.col("kind") == kind) & (F.col("name") == name))
            )
            self.stats["delete_calls"] += 1

    def delete_annotation(self, tsuid: str | None, start_ms: int) -> None:
        if "annotation" in self.indexes:
            key = (F.col("tsuid") == tsuid) if tsuid is not None else F.col("tsuid").isNull()
            self.indexes["annotation"] = self.indexes["annotation"].where(
                ~(key & (F.unix_millis("start_time") == start_ms))
            )
            self.stats["delete_calls"] += 1

    def collect_stats(self) -> dict:
        return dict(self.stats)

    def execute_query(self, points: DataFrame, query: dict):
        """Serve /api/search for an indexed type; defer to the built-in
        backend (NotImplementedError -> handler fallback) otherwise."""
        doc_type = query.get("type", "tsmeta")
        if doc_type not in self.indexes:
            raise NotImplementedError
        df = self.indexes[doc_type]
        q = query.get("query", "")
        if q:
            # match-all-fields substring semantics over string columns,
            # the plugin-side analog of search_meta's filter
            str_cols = [c for c, t in df.dtypes if t == "string"]
            pred = F.lit(False)
            for c in str_cols:
                pred = pred | F.col(c).contains(q)
            df = df.where(pred)
        return df


def register_search_plugin(plugin: "SearchPlugin") -> None:
    SEARCH_PLUGINS.append(plugin)


def notify_search_plugins(event: str, *payload) -> None:
    """Fan an index/delete event out to every registered plugin (the
    reference calls the plugin after each meta write, TSDB.java:1100-1160)."""
    for p in SEARCH_PLUGINS:
        getattr(p, event)(*payload)
