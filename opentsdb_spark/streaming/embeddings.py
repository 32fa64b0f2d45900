"""Streaming embedding-index maintenance — the similarity twin of the
incremental dedup in ``streaming.docs``.

A production ingest pipeline wants similarity verdicts AT ARRIVAL time:
each new document's embedding is scored against the corpus indexed so
far (near-dup suppression, link-to-cluster, eval-set contamination),
and then joins that corpus for later arrivals. Spark's streaming state
store cannot hold a corpus of vectors, so — exactly like the MinHash
signature index — the only state is a pair of partitioned parquet
indexes maintained through foreachBatch with the shared Hadoop-FS
append/compact/crash-recovery discipline of ``streaming.docs``:

* ``bucket_index``: (vec_id, table, bucket) — the hyperplane-LSH keys,
  8-byte join material, tables rows per vector;
* ``vec_index``: (vec_id, embedding) — one row per vector for the exact
  cosine re-score (the verify side, like the signature index).

Per micro-batch the work is BATCH-bounded on the compute side: bucket
hashing runs only on arriving vectors; the candidate lookup is an
equijoin of the (broadcastable) batch bucket set against the bucket
index; only candidate ids join the vec_index for scoring. The corpus is
scanned, never shuffled — the same scale shape as the batch ``lsh_topk``
with the corpus-side bucket pass amortized into the index.

Verdicts are pinned equal to the batch ``lsh_topk`` on the same prefix
corpus (same tables/bits/seed -> same candidates -> same exact cosines),
replay-idempotent via the ``__batch_id`` partition discipline, and
stable across index compaction (tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.streaming.docs import (
    _append_index_rows, _read_index_if_exists, compact_index,
)


def ann_index_batch(
    batch: DataFrame,
    bucket_index_path: str,
    vec_index_path: str,
    batch_id: int | None = None,
    k: int = 5,
    tables: int = 10,
    bits: int = 6,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bit_exact: bool = False,
) -> DataFrame:
    """One micro-batch of streaming ANN: score each arriving vector's
    top-``k`` cosine neighbors among the vectors indexed by EARLIER
    batches, then add this batch to the index.

    Semantics match ``pipeline.similarity.lsh_topk(embeddings=corpus,
    queries=batch)`` exactly (pinned by tests): a corpus vector is a
    candidate if it collides with the query in ANY table; candidates are
    exactly cosine-scored; ties rank by neighbor id. The first batch sees
    an empty corpus and emits no rows (novel by definition). Returns
    (query_id = arriving id, vec_id = corpus neighbor, cosine, rank).

    Replay safety (foreachBatch at-least-once): this ``batch_id``'s own
    index partitions are excluded from the lookup, and the index appends
    are dynamic overwrites of this batch's partition — a replayed batch
    recomputes identical verdicts and leaves the indexes unchanged.
    Eager (writes the indexes): a sink building block, not a lazy
    operator — the returned frame is localCheckpoint-materialized."""
    from pyspark.sql import Window

    from opentsdb_spark.pipeline.similarity import (
        _as_double, _cosine_pairs_udf, with_hyperplane_buckets,
    )

    spark = batch.sparkSession
    vecs = batch.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    # bucket pass on ARRIVING vectors only; localCheckpoint so the
    # verdict plan and the two index appends share one computation
    bb = with_hyperplane_buckets(
        vecs, "v", tables, bits, dim, seed, bit_exact=bit_exact,
    ).select(id_col, "v", "tb.table", "tb.bucket").localCheckpoint()

    def _live(path: str) -> DataFrame | None:
        idx = _read_index_if_exists(spark, path)
        if idx is not None and batch_id is not None \
                and "__batch_id" in idx.columns:
            idx = idx.where(
                F.col("__batch_id").isNull()
                | (F.col("__batch_id") != batch_id))
        return idx

    bidx = _live(bucket_index_path)
    vidx = _live(vec_index_path)
    if bidx is None or vidx is None:
        # JVM-side empty frame: createDataFrame([]) parallelizes into
        # defaultParallelism Python partitions (~6 CPU-s per action on
        # local[32] — the cms_probe autopsy), range(0) costs nothing
        empty = spark.range(0).select(
            F.col("id").alias("query_id"),
            F.col("id").alias(id_col),
            F.lit(0.0).alias("cosine"),
            F.lit(0).cast("int").alias("rank"))
        verdicts = empty.localCheckpoint()
    else:
        # candidate = collision in any table. The batch bucket set is the
        # SMALL side — broadcast it so the corpus-sized bucket index
        # streams through the join without shuffling
        cands = (
            bidx.select(id_col, "table", "bucket")
            .join(F.broadcast(bb.select(F.col(id_col).alias("query_id"),
                                        "table", "bucket")),
                  on=["table", "bucket"])
            .select("query_id", id_col)
            .dropDuplicates(["query_id", id_col])
        )
        scored = (
            cands.join(vidx.select(id_col, F.col("embedding").alias("cv")),
                       on=id_col)
            .join(F.broadcast(bb.select(F.col(id_col).alias("query_id"),
                                        F.col("v").alias("qv"))
                              .dropDuplicates(["query_id"])),
                  on="query_id")
            # default scoring kernel regardless of bit_exact — lsh_topk's
            # bit_exact flag selects only the BUCKET fold path, and the
            # streamed verdicts must match it bit for bit
            .withColumn("cosine",
                        _cosine_pairs_udf()(F.col("qv"), F.col("cv")))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc(id_col))
        verdicts = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", id_col, "cosine", "rank")
            .localCheckpoint()
        )
    # every arriving vector joins the corpus (similarity search indexes
    # the whole stream — unlike dedup, a near-duplicate is still a valid
    # future neighbor; callers wanting dedup semantics filter upstream).
    # First write wins ACROSS batches: a vec_id re-arriving later must
    # not append a second index row — the candidate-scoring join would
    # return two embedding rows for that id and the duplicate would
    # occupy two of the k top-k slots, diverging from batch lsh_topk.
    # The already-indexed ids WITHIN this batch's id set are batch-
    # bounded (semi-join of the corpus ids against the broadcast batch
    # ids — an id-only pruned scan), so the anti-join's build side stays
    # broadcastable however large the corpus. Replay-safe: _live already
    # excludes this batch's own partitions, so a replayed batch sees the
    # same prior corpus and overwrites its partition with identical rows.
    fresh = bb
    if vidx is not None:
        already = (
            vidx.select(id_col)
            .join(F.broadcast(bb.select(id_col).dropDuplicates([id_col])),
                  on=id_col, how="left_semi")
            .dropDuplicates([id_col])
        )
        fresh = bb.join(F.broadcast(already), on=id_col, how="left_anti")
    _append_index_rows(
        fresh.select(id_col, "table", "bucket",
                     F.lit(batch_id).cast("long").alias("__batch_id")),
        bucket_index_path, batch_id,
    )
    _append_index_rows(
        fresh.select(id_col, F.col("v").alias("embedding"))
        .dropDuplicates([id_col])
        .withColumn("__batch_id", F.lit(batch_id).cast("long")),
        vec_index_path, batch_id,
    )
    return verdicts


def streaming_ann_sink(
    embeddings: DataFrame,
    out_path: str,
    bucket_index_path: str,
    vec_index_path: str,
    checkpoint: str,
    compact_after: int | None = 64,
    **kwargs,
):
    """writeStream.foreachBatch wiring for ann_index_batch: each
    micro-batch's neighbor verdicts append to ``out_path`` and the batch
    joins the persistent index pair. Past ``compact_after`` batch
    partitions both indexes compact in place (verdicts unchanged — the
    row SET is identical, see compact_index; None disables). Returns the
    DataStreamWriter (caller picks the trigger and calls start())."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        verdicts = ann_index_batch(
            batch, bucket_index_path, vec_index_path,
            batch_id=batch_id, **kwargs)
        verdicts.write.mode("append").parquet(out_path)
        if compact_after is not None:
            compact_index(batch.sparkSession, bucket_index_path,
                          keep_batch_id=batch_id,
                          max_partitions=compact_after)
            compact_index(batch.sparkSession, vec_index_path,
                          keep_batch_id=batch_id,
                          max_partitions=compact_after)

    return embeddings.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
