"""Streaming document-feed operators — the ingest-side of the training-data
pipeline (batch counterparts live in opentsdb_spark.pipeline).

A crawl/firehose document stream wants dedup + quality gating BEFORE the
corpus lands on the lake, so obviously-junk and duplicate documents never
consume storage. Both operators below are Structured-Streaming-safe: pure
narrow expressions plus (for dedup) watermark-bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FileSystem API —
    resolves bare local paths, file:/ URIs, and hdfs://, s3a://, ... alike
    (any filesystem whose connector is on Spark's classpath), so every
    index-maintenance operation below works wherever the index parquet
    itself is readable. Replaces the round-8 os.* calls, which silently
    degraded (no compaction, no legacy detection, no crash recovery) the
    moment the index left the driver's local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def _rename_or_raise(fs, src, dst) -> None:
    """Hadoop rename returns False instead of raising (e.g. dst's parent
    missing, cross-filesystem move) — a silent False at a compaction swap
    point would corrupt the index, so fail loudly; foreachBatch retries
    the batch and the crash-recovery paths clean up the debris."""
    if not fs.rename(src, dst):
        raise RuntimeError(f"rename failed: {src} -> {dst}")


def _read_index_if_exists(spark, path: str) -> DataFrame | None:
    """Read a parquet state index, or None if it does not exist yet.

    Probes by attempting the read instead of a filesystem stat so an index
    on HDFS/S3 (any filesystem Spark can read) is found — a local-only
    stat would silently see an empty corpus every micro-batch and disable
    cross-batch dedup with no error. An index left half-swapped by a
    compaction crash (old dir present, live path missing) is recovered
    before answering — via the Hadoop FileSystem API, so the recovery too
    works on any filesystem."""
    try:
        return spark.read.parquet(path)
    except Exception as e:  # AnalysisException: PATH_NOT_FOUND
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            fs, live = _hadoop_fs(spark, path)
            old_p = spark._jvm.org.apache.hadoop.fs.Path(
                path.rstrip("/") + ".__compact_old")
            if fs.exists(old_p):  # crashed between the compaction renames
                _rename_or_raise(fs, old_p, live)
                return spark.read.parquet(path)
            return None
        raise


def _legacy_flat_index(spark, path: str) -> bool:
    """True when an index dir still has the pre-partitioned layout
    (root-level part files from the old mode('append') writer) — mixing
    partition subdirectories into it would make partition discovery fail
    on every later read ('Conflicting directory structures'). Detection
    goes through the Hadoop FileSystem API so a legacy index on a REMOTE
    filesystem is recognized too (an os.listdir probe saw only local dirs
    and would have written partition subdirs into a remote flat root)."""
    try:
        fs, root = _hadoop_fs(spark, path)
        if not fs.exists(root) or not fs.getFileStatus(root).isDirectory():
            return False
        return any(
            st.getPath().getName().startswith("part-")
            for st in fs.listStatus(root))
    except Exception:
        return False


def _append_index_rows(df: DataFrame, path: str,
                       batch_id: int | None) -> None:
    """Append one micro-batch's index rows, idempotently under replay.

    The index is partitioned by ``__batch_id``; a numbered batch writes
    with DYNAMIC partition overwrite, so a foreachBatch replay of batch N
    rewrites the ``__batch_id=N`` partition in place instead of appending
    a second copy — the index never accumulates duplicate rows (or
    collapse/candidate cost) across crash replays. Direct calls with no
    batch_id APPEND into the null partition instead (an overwrite there
    would wipe every earlier no-batch-id call's rows). A legacy
    pre-partitioned index keeps the old flat-append behavior (and its
    duplicate-on-replay semantics) rather than corrupting its layout. One
    file per batch (coalesce) keeps the fragment count equal to the batch
    count until compaction."""
    if _legacy_flat_index(df.sparkSession, path):
        df.coalesce(1).write.mode("append").parquet(path)
    elif batch_id is None:
        df.coalesce(1).write.mode("append") \
            .partitionBy("__batch_id").parquet(path)
    else:
        df.coalesce(1).write.mode("overwrite") \
            .option("partitionOverwriteMode", "dynamic") \
            .partitionBy("__batch_id").parquet(path)
    # a replay overwrite rewrites files under an already-read path — drop
    # the cached file listing so the next corpus read sees the new files
    df.sparkSession.catalog.refreshByPath(path)


def compact_index(
    spark,
    path: str,
    keep_batch_id: int | None = None,
    max_partitions: int = 64,
) -> bool:
    """Compact a streaming state index once it has grown past
    ``max_partitions`` batch partitions (one parquet fragment per
    micro-batch otherwise grows forever).

    All committed batches' rows are folded into a single ``__batch_id=-1``
    partition; ``keep_batch_id`` (the CURRENT, possibly-uncommitted batch)
    keeps its own partition so a foreachBatch replay of it can still
    exclude its own rows — only the latest uncommitted batch can replay,
    so folding older ids is safe. Verdicts are unchanged by compaction
    (the corpus row SET is identical; only the partition layout moves).

    Swap discipline: build the compacted index in a tmp dir, then
    rename-swap (same pattern as operators.tree.treesync) — readers see
    either the old or the new index, never a partial one. A crash BETWEEN
    the two renames leaves the index at ``path + '.__compact_old'``; both
    the next read (_read_index_if_exists) and the next compaction restore
    it before proceeding, so no state is lost. All filesystem operations
    go through the Hadoop FileSystem API, so compaction works wherever
    the index lives — local disk, file:/ URIs, HDFS, object stores. On
    S3-style stores a directory rename is copy+delete (not atomic), but
    the two-rename discipline still recovers every crash point: the live
    path and the old path never both hold partial state. Returns True if
    a compaction ran."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    fs, live = _hadoop_fs(spark, path)
    tmp = jpath(path.rstrip("/") + ".__compact_tmp")
    old = jpath(path.rstrip("/") + ".__compact_old")
    if fs.exists(tmp):  # debris from a crashed prior compaction
        fs.delete(tmp, True)
    if fs.exists(old):
        if not fs.exists(live):          # crashed between the renames: the
            _rename_or_raise(fs, old, live)  # old dir IS the live index
        else:
            fs.delete(old, True)         # swap completed, cleanup died
    if not fs.exists(live) or not fs.getFileStatus(live).isDirectory():
        return False  # no index yet — nothing to compact
    parts = [
        st.getPath().getName() for st in fs.listStatus(live)
        if st.getPath().getName().startswith("__batch_id=")
    ]
    if len(parts) <= max_partitions:
        return False
    idx = spark.read.parquet(path)
    fold = F.col("__batch_id").cast("long")
    if keep_batch_id is not None:
        fold = F.when(F.col("__batch_id") == keep_batch_id, fold).otherwise(-1)
    else:
        fold = F.lit(-1)
    compacted = idx.withColumn("__batch_id", fold)
    compacted.coalesce(1).write.mode("overwrite") \
        .partitionBy("__batch_id").parquet(path.rstrip("/") + ".__compact_tmp")
    _rename_or_raise(fs, live, old)
    _rename_or_raise(fs, tmp, live)
    fs.delete(old, True)
    spark.catalog.refreshByPath(path)  # drop the stale file-listing cache
    return True


def streaming_exact_dedup(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str | None = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact duplicate documents as they stream in.

    The dedup key is sha2(content) — 32 bytes of state per distinct document
    instead of the body. With an event-time column the state is bounded by
    the watermark horizon (``dropDuplicatesWithinWatermark``): a duplicate
    arriving later than the watermark is NOT caught here — unbounded exact
    dedup is the batch path's job (pipeline.dedup.exact_dedup over the
    lake), this stage only keeps the hot window clean. Without an event
    time the state grows with distinct documents (use only for bounded
    replays)."""
    keyed = docs.withColumn("__k", F.sha2(F.col(content_col).cast("binary"), 256))
    if event_time_col is not None:
        keyed = keyed.withWatermark(event_time_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["__k"]).drop("__k")
    return keyed.dropDuplicates(["__k"]).drop("__k")


def streaming_quality_gate(
    docs: DataFrame,
    min_words: int = 5,
    max_symbol_ratio: float = 0.5,
    content_col: str = "text",
) -> DataFrame:
    """Stateless quality gate: word-count floor + symbol-ratio ceiling +
    boilerplate marker rejection (pipeline.text.boilerplate_flags signals,
    streaming-safe because it is a pure filter)."""
    from opentsdb_spark.pipeline.text import BOILERPLATE_MARKERS

    text = F.col(content_col)
    n = F.length(text).cast("double")
    symbol_ratio = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")) / F.greatest(
        n, F.lit(1.0)
    )
    return docs.where(
        # \S+ extraction (see pipeline.text._words): trim+split counts a
        # phantom token on trailing newlines and 1 on empty docs
        (F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))) >= min_words)
        & (symbol_ratio <= max_symbol_ratio)
        & (F.regexp_count(text, F.lit(BOILERPLATE_MARKERS)) == 0)
    )


def neardup_filter_batch(
    batch: DataFrame,
    index_path: str,
    batch_id: int | None = None,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_new_bands: int | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One micro-batch of streaming MinHash near-dup suppression against a
    PERSISTENT band index (the production shape: the index parquet is the
    only state, shared across restarts and with the batch pipeline; Spark's
    in-memory dedup state can't hold a corpus).

    A document is a near-duplicate when fewer than ``min_new_bands``
    (default: half) of its LSH band keys are unseen — i.e. most bands
    collide with the index or with an earlier doc in this batch
    (keep-first within the batch by lowest id). Documents SHORTER than
    ``shingle_n`` words have no shingle identity: they pass through
    un-indexed (novel by definition) rather than silently vanishing.
    Survivors' bands are APPENDED to the index tagged with ``batch_id``;
    on a foreachBatch REPLAY (at-least-once semantics) the same batch_id's
    own rows are excluded from the collision lookup, so the recomputed
    keep set is identical — output rows may duplicate on replay (standard
    for parquet foreachBatch sinks) but never disappear. The returned
    frame is localCheckpoint-materialized, so the caller's write does not
    re-run the signature pipeline.

    Scale shape: band keys are 8-byte (band, hash) pairs; the index join is
    a broadcast-free equijoin on those keys and the index only ever grows
    by survivors' bands. This function runs eager jobs (it writes the
    index) — it is a sink building block, not a lazy operator."""
    from pyspark.sql import Window

    from opentsdb_spark.pipeline.dedup import minhash_signature

    spark = batch.sparkSession
    if min_new_bands is None:
        min_new_bands = bands - bands // 2
    r = num_hashes // bands
    sigs = minhash_signature(batch, content_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.xxhash64(F.slice("signature", b * r + 1, r)).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh").persist()
    try:
        index = _read_index_if_exists(spark, index_path)
        if index is not None:
            if batch_id is not None and "__batch_id" in index.columns:
                # replay safety: this batch's previously-appended bands must
                # not count as collisions against itself. NULL batch ids
                # (direct calls / pre-column index files) are OTHER batches
                # and must stay — a bare != would null them out of the join
                index = index.where(
                    F.col("__batch_id").isNull() | (F.col("__batch_id") != batch_id)
                )
            fresh = banded.join(index.select("band", "bh"),
                                on=["band", "bh"], how="left_anti")
        else:
            fresh = banded
        # keep-first WITHIN the batch: a band key claimed by a lower id in
        # this same batch is not fresh for higher ids
        w = Window.partitionBy("band", "bh").orderBy(id_col)
        fresh = fresh.withColumn("__rn", F.row_number().over(w)).where("__rn = 1")
        new_counts = fresh.groupBy(id_col).agg(F.count("*").alias("__new"))
        kept_ids = new_counts.where(F.col("__new") >= min_new_bands).select(id_col)
        # short docs (no signature row) pass through un-indexed; the id set
        # comes from the PERSISTED banded frame (same ids as sigs — a doc
        # has band rows iff it has a signature), so this does not re-run
        # the signature aggregation per micro-batch
        shorties = batch.join(
            banded.select(id_col).distinct(), on=id_col, how="left_anti"
        )
        kept = (
            batch.join(kept_ids, on=id_col, how="left_semi")
            .unionByName(shorties)
            .localCheckpoint()  # materialize: caller's write must not
        )                        # re-run the signature pipeline
        # append the SURVIVORS' full band sets (not just the fresh keys) so
        # a future near-identical doc collides on every band; replay-
        # idempotent dynamic overwrite of this batch's partition
        _append_index_rows(
            banded.join(kept_ids, on=id_col, how="left_semi").select(
                "band", "bh", F.lit(batch_id).cast("long").alias("__batch_id")
            ),
            index_path, batch_id,
        )
    finally:
        banded.unpersist()
    return kept


def incremental_dedup_batch(
    batch: DataFrame,
    sig_index_path: str,
    batch_id: int | None = None,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One micro-batch of VERIFIED incremental dedup — the streaming face
    of ``pipeline.dedup.incremental_dedup_minhash``: the batch operator
    itself runs against a persistent (id, signature) parquet index, so the
    stream and the batch pipeline produce the SAME verdict schema
    (keep / dup_kind / dup_of / est_jaccard), the same threshold-verified
    decisions, and share the exact-clone collapse machinery.

    Contrast with ``neardup_filter_batch``: that one keeps only 8-byte
    (band, bh) keys as state and decides on a collision-count heuristic —
    cheaper state, no verify. This one stores one signature row per kept
    doc (8*num_hashes bytes) and pays the signature re-join for exact
    est_jaccard agreement — the choice is state size vs verdict fidelity.

    Kept docs' signatures append to the index tagged with ``batch_id``; on
    a foreachBatch REPLAY the same batch_id's rows are excluded from the
    corpus side, so recomputed verdicts are identical (rows may duplicate
    in downstream parquet on replay — standard at-least-once — but
    verdicts never flip; the index write itself is a dynamic partition
    overwrite of this batch's partition, so replays do not duplicate index
    rows either). Eager (writes the index): a sink building block, not a
    lazy operator."""
    from opentsdb_spark.pipeline.dedup import (
        incremental_dedup_minhash, minhash_signature,
    )

    spark = batch.sparkSession
    idx = _read_index_if_exists(spark, sig_index_path)
    if idx is not None:
        corpus_sigs = idx
        if batch_id is not None and "__batch_id" in corpus_sigs.columns:
            corpus_sigs = corpus_sigs.where(
                F.col("__batch_id").isNull() | (F.col("__batch_id") != batch_id)
            )
        corpus_sigs = corpus_sigs.select(id_col, "signature")
    else:
        corpus_sigs = minhash_signature(
            batch.limit(0), content_col, id_col, num_hashes, shingle_n)
    # signatures computed ONCE per micro-batch: the verdict pass and the
    # index append below share this frame (the dominant per-batch cost is
    # the tokenize + shingle + fold pass — running it twice doubled it)
    batch_sigs = minhash_signature(
        batch, content_col, id_col, num_hashes, shingle_n
    ).localCheckpoint()
    verdicts = incremental_dedup_minhash(
        batch, corpus_sigs, num_hashes=num_hashes, bands=bands,
        shingle_n=shingle_n, threshold=threshold,
        content_col=content_col, id_col=id_col, new_sigs=batch_sigs,
    ).localCheckpoint()  # materialize: the index write below must not
    #                      re-run the verdict plan, nor the caller's write
    kept_ids = verdicts.where(F.col("keep")).select(id_col)
    # only KEPT docs join the corpus (dropped dups must not become dedup
    # targets themselves — same rule as the batch funnel's canonical set);
    # short docs have no signature row, so the semi-join skips them
    _append_index_rows(
        batch_sigs.join(kept_ids, on=id_col, how="left_semi")
        .select(id_col, "signature",
                F.lit(batch_id).cast("long").alias("__batch_id")),
        sig_index_path, batch_id,
    )
    return verdicts


def streaming_incremental_dedup_sink(
    docs: DataFrame,
    out_path: str,
    sig_index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    compact_after: int | None = 64,
    **kwargs,
):
    """writeStream.foreachBatch wiring for incremental_dedup_batch: each
    micro-batch is verdict-filtered against the shared signature index;
    kept documents append to the output parquet. Once the index exceeds
    ``compact_after`` batch partitions it is compacted in place (verdicts
    unchanged — see compact_index; None disables). Returns the
    DataStreamWriter (caller picks the trigger and calls start())."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        verdicts = incremental_dedup_batch(
            batch, sig_index_path, batch_id=batch_id, id_col=id_col, **kwargs)
        kept = batch.join(verdicts.where(F.col("keep")).select(id_col),
                          on=id_col, how="left_semi")
        kept.write.mode("append").parquet(out_path)
        if compact_after is not None:
            compact_index(batch.sparkSession, sig_index_path,
                          keep_batch_id=batch_id, max_partitions=compact_after)

    return docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )


def streaming_neardup_sink(
    docs: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint: str,
    compact_after: int | None = 64,
    **kwargs,
):
    """writeStream.foreachBatch wiring for neardup_filter_batch: each
    micro-batch is near-dup-filtered against the shared index and survivors
    append to the output parquet. Once the index exceeds ``compact_after``
    batch partitions it is compacted in place (None disables). Returns the
    DataStreamWriter (caller picks the trigger and calls start())."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        kept = neardup_filter_batch(batch, index_path, batch_id=batch_id, **kwargs)
        kept.write.mode("append").parquet(out_path)
        if compact_after is not None:
            compact_index(batch.sparkSession, index_path,
                          keep_batch_id=batch_id, max_partitions=compact_after)

    return docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )


def streaming_source_mix(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    source_col: str = "source",
    event_time_col: str = "ts",
    content_col: str = "text",
    id_col: str = "doc_id",
    **gopher_kwargs,
):
    """Windowed per-source mixture monitor — the STREAMING twin of
    ``pipeline.text.source_mix_report``: for each event-time window and
    source, the arriving document count, Gopher-gate survivor count and
    surviving word volume. The live dashboard a mixture-weighting step
    watches: a source whose survival rate collapses mid-crawl (extractor
    regression) or whose volume share spikes (crawler loop) shows up a
    window later, not at the next batch re-run.

    Shape: the Gopher flags are pure narrow expressions computed IN the
    keyed select (``gopher_filter(keep_cols=...)`` — a streaming
    aggregation cannot join the gate verdicts back by id), then ONE
    watermark-bounded groupBy(window, source) whose state is
    windows x sources rows of three longs. Late documents beyond the
    watermark are dropped by the engine; emit in append mode to get one
    final row per closed (window, source) — counts match the batch
    report on the same feed minus watermark-dropped rows (pinned by
    test)."""
    from opentsdb_spark.pipeline.text import gopher_filter

    gated = gopher_filter(
        docs, content_col=content_col, id_col=id_col,
        keep_cols=(source_col, event_time_col), **gopher_kwargs,
    )
    kept_l = F.col("kept").cast("long")
    return (
        gated.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window).alias("win"), source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept_l).alias("n_kept"),
            F.sum(F.col("n_words") * kept_l).alias("kept_words"),
        )
    )
