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

from opentsdb_spark.session import empty_df, tiny_df
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


UID_REGISTRY_SCHEMA = "kind string, name string, uid string"
UID_WIDTH_BYTES = 3  # reference default width (src/uid/UniqueId.java)


def _candidate_uid(kind: str, name: str, salt: int) -> str:
    """Deterministic UID candidate: sha256(kind:name:salt) truncated to the
    3-byte space, rendered like UniqueId.uidToString (6 hex chars)."""
    import hashlib

    h = hashlib.sha256(f"{kind}:{name}:{salt}".encode()).digest()
    return h[:UID_WIDTH_BYTES].hex()


# UniqueIdFilterPlugin analog (reference src/uid/UniqueIdFilterPlugin.java:
# 89-100 allowUIDAssignment). UID assignment is a driver-side metadata path
# (a handful of names per request), so plugins are plain callables
# (kind, name) -> bool; False blocks the assignment into <kind>_errors.
UID_FILTERS: list = []


def register_uid_filter(fn) -> None:
    UID_FILTERS.append(fn)


def _uid_assignment_allowed(kind: str, name: str) -> bool:
    return all(fn(kind, name) for fn in UID_FILTERS)


def uid_assign(
    registry: DataFrame | None,
    requests: dict[str, list[str]],
    spark=None,
) -> tuple[dict[str, dict[str, str]], DataFrame]:
    """/api/uid/assign (reference src/tsd/UniqueIdRpc.java:107-160
    handleAssign): assign UIDs to new metric/tagk/tagv names; names already
    registered land in the ``<kind>_errors`` map with the reference's
    'Name already exists with UID: x' message.

    Deviation (documented): the reference allocates UIDs from a central
    atomic counter (src/uid/UniqueId.java allocateUid) — the one piece of
    state a 1000-executor writer fleet cannot share cheaply. Here the UID is
    a deterministic hash of (kind, name) probed against the registry
    snapshot on collision, so any executor can compute it without
    coordination; collisions in the 2^24 space are resolved by salting.
    Assignment is metadata-path (a handful of names per request), so the
    registry lookups collect small semi-joined subsets, never the data.
    """
    kinds = {"metric", "tagk", "tagv"}
    requests = {k: v for k, v in requests.items() if v}
    if not requests:
        raise ValueError("Missing values to assign UIDs")
    bad = set(requests) - kinds
    if bad:
        raise ValueError(f"unknown UID kinds: {sorted(bad)}")
    spark = spark or (registry.sparkSession if registry is not None else None)
    if registry is None:
        registry = empty_df(spark, UID_REGISTRY_SCHEMA)

    wanted = [(k, n) for k, names in requests.items() for n in names]
    key_pred = None
    for k, n in wanted:
        c = (F.col("kind") == k) & (F.col("name") == n)
        key_pred = c if key_pred is None else (key_pred | c)
    existing = {
        (r["kind"], r["name"]): r["uid"]
        for r in registry.where(key_pred).collect()
    }
    # uids already taken per kind, restricted to the candidate probe space
    probe_budget = 16
    cand_uids = {
        _candidate_uid(k, n, s) for k, n in wanted for s in range(probe_budget)
    }
    taken: dict[str, set] = {}
    for r in registry.where(F.col("uid").isin(list(cand_uids))).collect():
        taken.setdefault(r["kind"], set()).add(r["uid"])

    response: dict[str, dict[str, str]] = {}
    new_rows: list[tuple[str, str, str]] = []
    for kind, names in requests.items():
        results: dict[str, str] = {}
        errors: dict[str, str] = {}
        for name in names:
            if (kind, name) in existing:
                errors[name] = f"Name already exists with UID: {existing[(kind, name)]}"
                continue
            if not _uid_assignment_allowed(kind, name):
                errors[name] = "UID assignment denied by filter plugin"
                continue
            for salt in range(probe_budget):
                uid = _candidate_uid(kind, name, salt)
                if uid not in taken.setdefault(kind, set()):
                    taken[kind].add(uid)
                    results[name] = uid
                    new_rows.append((kind, name, uid))
                    existing[(kind, name)] = uid
                    break
            else:  # pragma: no cover — 16 straight 24-bit collisions
                errors[name] = "UID space exhausted for probe budget"
        response[kind] = dict(sorted(results.items()))
        if errors:
            response[f"{kind}_errors"] = dict(sorted(errors.items()))
    if new_rows:
        registry = registry.unionByName(
            tiny_df(spark, new_rows, UID_REGISTRY_SCHEMA)
        )
    return response, registry


UIDMETA_SCHEMA = (
    "kind string, name string, description string, notes string, "
    "display_name string, custom map<string,string>"
)
TSMETA_SCHEMA = (
    "tsuid string, description string, notes string, units string, "
    "data_type string, retention int, max double, min double, "
    "custom map<string,string>"
)


def uidmeta_upsert(
    meta: DataFrame | None,
    kind: str,
    name: str,
    description: str | None = None,
    notes: str | None = None,
    display_name: str | None = None,
    custom: dict[str, str] | None = None,
    spark=None,
) -> DataFrame:
    """UIDMeta create/update keyed by (kind, name) — the editable fields of
    src/meta/UIDMeta.java:60-120 served by /api/uid/uidmeta
    (src/tsd/UniqueIdRpc.java:223-285). Provided fields overwrite, missing
    ones keep the stored value (syncToStorage overwrite=false). Pass
    meta=None to start an empty registry."""
    if kind not in ("metrics", "tagk", "tagv"):
        raise ValueError("kind must be metrics|tagk|tagv")
    spark = spark or (meta.sparkSession if meta is not None else None)
    new = tiny_df(
        spark, [(kind, name, description, notes, display_name, custom)],
        UIDMETA_SCHEMA)
    if meta is None:
        return new
    key = (F.col("kind") == kind) & (F.col("name") == name)
    old = meta.where(key).select(*[F.col(c).alias(f"o_{c}") for c in meta.columns])
    merged = new.join(old, F.lit(True), "left").select(
        "kind", "name",
        *[F.coalesce(c, f"o_{c}").alias(c)
          for c in ("description", "notes", "display_name", "custom")],
    )
    return meta.where(~key).unionByName(merged)


def uidmeta_delete(meta: DataFrame, kind: str, name: str) -> DataFrame:
    return meta.where(~((F.col("kind") == kind) & (F.col("name") == name)))


def tsmeta_frame(points: DataFrame) -> DataFrame:
    """Derived per-series TSMeta skeleton (reference src/meta/TSMeta.java
    counters maintained on write): tsuid, created (first point),
    last_received, total_dps. One groupBy over the point feed."""
    from opentsdb_spark.sources.points import series_id_col

    return (
        points.withColumn("tsuid", series_id_col())
        .groupBy("tsuid")
        .agg(
            F.min("ts").alias("created"),
            F.max("ts").alias("last_received"),
            F.count("*").alias("total_dps"),
        )
    )


def tsmeta_upsert(
    meta: DataFrame | None,
    tsuid: str,
    spark=None,
    **fields,
) -> DataFrame:
    """TSMeta editable-field upsert keyed by tsuid (/api/uid/tsmeta,
    src/tsd/UniqueIdRpc.java:287-380; editable fields TSMeta.java:120-175).
    Join against ``tsmeta_frame(points)`` for the derived counters."""
    cols = ("description", "notes", "units", "data_type", "retention", "max",
            "min", "custom")
    bad = set(fields) - set(cols)
    if bad:
        raise ValueError(f"unknown TSMeta fields: {sorted(bad)}")
    row = (tsuid, *[fields.get(c) for c in cols])
    spark = spark or (meta.sparkSession if meta is not None else None)
    new = tiny_df(spark, [row], TSMETA_SCHEMA)
    if meta is None:
        return new
    key = F.col("tsuid") == tsuid
    old = meta.where(key).select(*[F.col(c).alias(f"o_{c}") for c in meta.columns])
    merged = new.join(old, F.lit(True), "left").select(
        "tsuid", *[F.coalesce(c, f"o_{c}").alias(c) for c in cols]
    )
    return meta.where(~key).unionByName(merged)


def tsmeta_delete(meta: DataFrame, tsuid: str) -> DataFrame:
    return meta.where(F.col("tsuid") != tsuid)


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


# ---- meta maintenance sweeps (reference src/tools/MetaSync.java,
# ---- src/tools/MetaPurge.java: the `uid metasync` / `uid metapurge` CLI
# ---- tools — walk the data table creating/updating meta for every
# ---- UID/TSUID seen, or wipe all meta rows).


def meta_sync(
    points: DataFrame,
    uidmeta: DataFrame | None = None,
    tsmeta: DataFrame | None = None,
    notify: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Reconcile the meta registries against the point store
    (MetaSync.java:40-200 semantics as two set-based joins instead of a
    row-at-a-time scan):

      * every live UID name (metric/tagk/tagv) and every live TSUID gets a
        registry row; rows that already exist keep their edited fields
      * registry rows whose name/series no longer appears in the store are
        dropped (the reference leaves them for MetaPurge; an immutable-lake
        rewrite reconciles both directions in one pass — flagged in the
        docstring because it subsumes the purge of orphans)
      * registered search plugins are re-indexed with the synced frames
        (MetaSync notifies plugins per entry, MetaSync.java:47-49)

    Returns (uidmeta', tsmeta') — lazy frames; callers persist."""
    spark = points.sparkSession
    live_uid = None
    for kind in ("metrics", "tagk", "tagv"):
        part = uid_listing(points, kind).select(F.lit(kind).alias("kind"), "name")
        live_uid = part if live_uid is None else live_uid.unionByName(part)
    if uidmeta is None:
        uidmeta = empty_df(spark, UIDMETA_SCHEMA)
    synced_uid = live_uid.join(uidmeta, on=["kind", "name"], how="left").select(
        "kind", "name", "description", "notes", "display_name", "custom"
    )

    live_ts = tsmeta_frame(points).select("tsuid")
    if tsmeta is None:
        tsmeta = empty_df(spark, TSMETA_SCHEMA)
    synced_ts = live_ts.join(tsmeta, on="tsuid", how="left").select(
        "tsuid", "description", "notes", "units", "data_type", "retention",
        "max", "min", "custom"
    )

    if notify:
        from opentsdb_spark.operators.metadata import notify_search_plugins

        notify_search_plugins("index_uidmeta", synced_uid)
        notify_search_plugins("index_tsmeta", synced_ts)
    return synced_uid, synced_ts


def meta_purge(spark) -> tuple[DataFrame, DataFrame]:
    """Wipe ALL UIDMeta and TSMeta rows (MetaPurge.java:34-100
    purgeUIDMeta/purgeTSMeta). Returns the emptied registries; the
    reference mutates storage directly and does not notify plugins —
    neither does this."""
    return (
        empty_df(spark, UIDMETA_SCHEMA),
        empty_df(spark, TSMETA_SCHEMA),
    )
