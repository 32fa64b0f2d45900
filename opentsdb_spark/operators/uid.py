"""/api/uid — name-registry operations, Spark-style.

The reference assigns fixed-width UIDs to metric/tagk/tagv strings
(src/uid/UniqueId.java:95-170) and exposes assignment, rename and meta CRUD
via src/tsd/UniqueIdRpc.java. A columnar engine needs no UID dictionary
(Parquet dictionary-encodes strings), so:

  * uid_listing  -> the dictionary VIEW: distinct names per kind with
    first/last-seen stats (what UIDMeta carries, src/meta/UIDMeta.java)
  * rename_*     -> the write-side rename operation as a frame rewrite
    (the reference's rename mutates the dictionary row; here names are
    values, so rename = map over the affected column)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uid_listing(points: DataFrame, kind: str) -> DataFrame:
    """Distinct names of one kind with usage stats: (name, points,
    first_seen, last_seen)."""
    if kind == "metrics":
        named = points.select(F.col("metric").alias("name"), "ts")
    elif kind == "tagk":
        named = points.select(F.explode(F.map_keys("tags")).alias("name"), "ts")
    elif kind == "tagv":
        named = points.select(F.explode(F.map_values("tags")).alias("name"), "ts")
    else:
        raise ValueError("kind must be metrics|tagk|tagv")
    return named.groupBy("name").agg(
        F.count("*").alias("points"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


def rename_metric(points: DataFrame, old: str, new: str) -> DataFrame:
    """UID rename analog for metrics (reference UniqueIdRpc rename)."""
    return points.withColumn(
        "metric", F.when(F.col("metric") == old, F.lit(new)).otherwise(F.col("metric"))
    )


def rename_tagk(points: DataFrame, old: str, new: str) -> DataFrame:
    """Rename a tag KEY across all series."""
    renamed = F.map_from_entries(
        F.transform(
            F.map_entries("tags"),
            lambda e: F.struct(
                F.when(e["key"] == old, F.lit(new)).otherwise(e["key"]).alias("key"),
                e["value"].alias("value"),
            ),
        )
    )
    return points.withColumn("tags", renamed)


def rename_tagv(points: DataFrame, tagk: str, old: str, new: str) -> DataFrame:
    """Rename one tag VALUE under a specific key."""
    renamed = F.map_from_entries(
        F.transform(
            F.map_entries("tags"),
            lambda e: F.struct(
                e["key"].alias("key"),
                F.when((e["key"] == tagk) & (e["value"] == old), F.lit(new))
                .otherwise(e["value"])
                .alias("value"),
            ),
        )
    )
    return points.withColumn("tags", renamed)
