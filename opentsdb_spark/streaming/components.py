"""Streaming connected-component maintenance — the clustering twin of
the incremental dedup / ANN indexes in ``streaming.docs`` /
``streaming.embeddings``.

Near-dup PAIRS arrive continuously (from the streaming MinHash/band
verdicts); the dedup CLUSTERS they imply must evolve with them — merge
when a new edge bridges two components, absorb brand-new cliques — and
downstream consumers (canonical selection, leakage-safe splits) read the
labels, not the edges. Re-running the full historical CC every
micro-batch is exactly what a 100 TB pipeline cannot afford, so each
batch runs ``pipeline.cluster.incremental_components`` (work bounded by
touched-component mass + arriving edges) and persists only the DELTA —
changed or brand-new (id, component) rows — as that batch's partition of
a labels parquet index under the shared Hadoop-FS append/compact/
crash-recovery discipline. The current labels are resolved
latest-version-wins per id over a ``__ver`` DATA column (``__batch_id``
is the partition column and compaction folds it to -1, so the version
must ride inside the rows to survive folding).

By incremental_components' split-invariance (property-tested), the
resolved labels after any batch sequence equal the one-shot
``connected_components`` over all edges seen — pinned by tests and by
the hash-checked ``dedup_components_stream`` catalog row."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.streaming.docs import (
    _append_index_rows, _read_index_if_exists, compact_index,
)


def resolve_labels(spark, labels_path: str,
                   exclude_batch_id: int | None = None) -> DataFrame | None:
    """Current (id, component) view of the labels index: one row per id,
    highest ``__ver`` wins (a relabeled id has rows from several batches;
    max_by keeps the newest — a map-side-combinable aggregate on the
    narrow label rows). ``__ver`` is a data column precisely so index
    compaction (which folds partitions into ``__batch_id=-1``) cannot
    erase the ordering. ``exclude_batch_id`` drops that batch's own
    partition first (replay safety)."""
    idx = _read_index_if_exists(spark, labels_path)
    if idx is None:
        return None
    if exclude_batch_id is not None and "__batch_id" in idx.columns:
        idx = idx.where(
            F.col("__batch_id").isNull()
            | (F.col("__batch_id") != exclude_batch_id))
    return idx.groupBy("id").agg(
        F.expr("max_by(component, __ver)").alias("component"))


def components_update_batch(
    pairs_batch: DataFrame,
    labels_path: str,
    batch_id: int | None = None,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """One micro-batch of streaming component maintenance: resolve the
    persisted labels (excluding this batch's own partition, so a crash
    replay recomputes identically), run incremental_components against
    the arriving pairs, and persist the DELTA — rows whose label changed
    plus brand-new ids — as this batch's partition. Returns the delta
    frame (id, component): the batch's "cluster membership changed"
    notifications a downstream canonical-selection step consumes.

    Eager (writes the index), like the dedup/ANN batch functions; the
    returned frame is localCheckpoint-materialized."""
    from opentsdb_spark.pipeline.cluster import (
        connected_components, incremental_components)

    spark = pairs_batch.sparkSession
    prev = resolve_labels(spark, labels_path, exclude_batch_id=batch_id)
    if prev is None:
        labels = connected_components(
            pairs_batch, src=src, dst=dst, max_iter=max_iter)
        delta = labels.localCheckpoint()
    else:
        labels = incremental_components(
            prev, pairs_batch, id_col="id", src=src, dst=dst,
            max_iter=max_iter)
        # delta = changed or new rows only — the untouched corpus never
        # rewrites (label rows are 24 bytes; the anti-join keys on both
        # columns, so a relabel to a new min IS a delta row)
        delta = labels.join(prev, on=["id", "component"], how="left_anti") \
            .localCheckpoint()
    if batch_id is None:
        # Direct (no-batch-id) updates must still WIN latest-wins
        # resolution over earlier numbered batches, so derive the version
        # monotonically: max existing __ver + 1 (0 on a fresh index). The
        # old constant -1 sorted BELOW every numbered batch (a late direct
        # relabel silently lost in resolve_labels' max_by) and tied two
        # successive direct calls (nondeterministic max_by between them).
        # CONSTRAINT: direct calls must not interleave with an ACTIVE /
        # resumable stream — after batches 0..N a direct update takes
        # __ver N+1, which a LATER resumed batch N+1 would reuse (ties in
        # max_by again) and any replayed batch <= N+1 would lose to. Stop
        # (or fully drain) the stream before direct repairs, or restart
        # the stream with a fresh checkpoint after them.
        idx = _read_index_if_exists(spark, labels_path)
        mx = None if idx is None else idx.agg(F.max("__ver")).first()[0]
        ver = 0 if mx is None else int(mx) + 1
    else:
        ver = int(batch_id)
    _append_index_rows(
        delta.withColumn("__ver", F.lit(ver).cast("long"))
        .withColumn("__batch_id", F.lit(batch_id).cast("long")),
        labels_path, batch_id,
    )
    return delta


def streaming_components_sink(
    pairs: DataFrame,
    out_path: str,
    labels_path: str,
    checkpoint: str,
    compact_after: int | None = 64,
    **kwargs,
):
    """writeStream.foreachBatch wiring for components_update_batch: each
    micro-batch's label deltas append to ``out_path`` and fold into the
    persistent labels index; past ``compact_after`` batch partitions the
    index compacts in place (latest-wins resolution unchanged — the
    ``__ver`` data column survives the partition fold). Returns the
    DataStreamWriter (caller picks the trigger and calls start())."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        delta = components_update_batch(
            batch, labels_path, batch_id=batch_id, **kwargs)
        delta.write.mode("append").parquet(out_path)
        if compact_after is not None:
            compact_index(batch.sparkSession, labels_path,
                          keep_batch_id=batch_id,
                          max_partitions=compact_after)

    return pairs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
