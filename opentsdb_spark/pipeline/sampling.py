"""Deterministic sampling / dataset-split operators for training pipelines.

A 100-TB corpus cannot be split with ``df.randomSplit`` (non-reproducible
across re-runs and cluster layouts) or with a shuffle-based sample. Both
operators here key every decision on a PER-ROW DETERMINISTIC hash of the
document id, so:
  * re-running the pipeline yields byte-identical splits (lineage-safe),
  * the split is a narrow map — no shuffle, no extra scan,
  * adding documents never moves an existing document between splits.

The default hash is Spark's ``xxhash64`` (seeded). For cross-engine
verification the hash is pluggable — the catalog query mirrors a pure
integer multiplicative hash (Knuth 2654435761) that evaluates identically
in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.session import tiny_df

_BUCKETS = 10_000


def _default_hash_bucket(id_col: Column, seed: int) -> Column:
    return F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(_BUCKETS))


def knuth_hash_bucket(id_col: Column) -> Column:
    """SQL-mirrorable bucket: ((id % 100003) * 2654435761 % 1000003) % 10000.
    Pure 64-bit-safe integer arithmetic — identical in Spark, DuckDB, or any
    ANSI engine; use for oracle-checked splits, xxhash64 for production."""
    return ((id_col % 100003) * 2654435761 % 1000003) % _BUCKETS


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    bucket: Column | None = None,
) -> DataFrame:
    """Assign every row to a named split by hash-bucket range.

    ``weights`` maps split name -> fraction (must sum to ~1); assignment is
    by cumulative ranges over 10k buckets in the given key order, so
    {"train": .9, "val": .05, "test": .05} puts buckets [0,9000) in train,
    [9000,9500) in val, [9500,10000) in test. Adds a ``split`` column."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = bucket if bucket is not None else _default_hash_bucket(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    fractions: dict,
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    bucket: Column | None = None,
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its hash bucket
    falls below fraction*10k for its stratum value. Unlike
    ``DataFrame.sampleBy`` this is reproducible row-exact across runs and
    partitionings, and it is a pure narrow filter (predicate-pushable).
    Strata missing from ``fractions`` are dropped (fraction 0)."""
    b = bucket if bucket is not None else _default_hash_bucket(F.col(id_col), seed)
    thresh = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in (kv[0], int(round(kv[1] * _BUCKETS)))]
    )
    return docs.where(b < F.coalesce(thresh[F.col(strata_col)], F.lit(0)))


def temperature_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    bucket: Column | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling across corpus sources.

    Keeps an expected ``target_frac`` of the corpus while re-weighting the
    source mix: kept docs per source are proportional to ``n_g ** alpha``
    (alpha < 1 upweights small sources toward uniform, alpha = 1 preserves
    the natural mix — the temperature trick of multilingual LM sampling).
    Per-source keep rate r_g = min(1, C * n_g**(alpha-1)) with
    C = target_frac * N_total / sum_g(n_g**alpha); a source capped at rate 1
    delivers all its rows (slight under-delivery of the global target
    rather than over-sampling others).

    Scale shape: one partial-agg count per source (tiny result), the rate
    table joins back via BROADCAST, and the keep decision is the same
    deterministic id-hash bucket as hash_split — no shuffle of the corpus,
    reproducible row-exact across runs and partitionings. Adds a ``rate``
    column. NULL sources form their own mixture group (an inner join on the
    raw source key would silently DROP unlabeled docs while still counting
    them in N_total)."""
    key = F.coalesce(F.col(source_col), F.lit("\x00__null_source__"))
    keyed = docs.withColumn("__src_key", key)
    n = F.col("n").cast("double")
    cnt = keyed.groupBy("__src_key").agg(F.count("*").alias("n"))
    tot = cnt.agg(
        F.sum(F.pow(n, F.lit(alpha))).alias("sum_pow"),
        F.sum("n").alias("n_total"),
    )
    rates = cnt.crossJoin(F.broadcast(tot)).select(
        "__src_key",
        F.least(
            F.lit(1.0),
            F.lit(target_frac)
            * F.col("n_total").cast("double")
            / F.col("sum_pow")
            * F.pow(n, F.lit(alpha - 1.0)),
        ).alias("rate"),
    )
    b = bucket if bucket is not None else _default_hash_bucket(F.col(id_col), seed)
    return keyed.join(F.broadcast(rates), on="__src_key").where(
        b < F.col("rate") * _BUCKETS
    ).drop("__src_key")


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    shards: int = 32,
    token_col: Column | None = None,
    id_col: str = "doc_id",
    content_col: str = "text",
    bucket: Column | None = None,
    shard_col: Column | None = None,
    order_cols: list | None = None,
) -> DataFrame:
    """Greedy contiguous sequence packing for LM training batches.

    Assigns each document a (shard, bin) so that consecutive documents in a
    shard accumulate into ~``max_tokens``-token training sequences:
    bin = floor((running_token_total - own_tokens) / max_tokens) over the
    shard's deterministic order. A document whose tokens straddle a bin
    boundary starts in its computed bin (the packer downstream truncates or
    pads — this operator only decides grouping).

    By default documents shard by a deterministic id-hash and pack in id
    order. Pass ``shard_col`` + ``order_cols`` to pack in an UPSTREAM
    order instead — e.g. range-sharded on an interleave key and packed in
    (interleave_key, source, id) order, so the training sequences preserve
    the mixture proportions the interleave stage established (the
    pipeline_end_to_end composition).

    Scale shape: sharding is deterministic (a document always lands in the
    same shard regardless of cluster layout), and the cumulative sum is a
    window PARTITIONED BY shard — shards bound window state, so no
    single-partition global window at any corpus size. Output adds shard,
    n_tokens, and bin columns."""
    from pyspark.sql import Window

    tok = (
        token_col
        if token_col is not None
        # \S+ runs: trim+split miscounted trailing-\n and empty docs
        else F.size(F.regexp_extract_all(F.col(content_col), F.lit(r"\S+"), F.lit(0)))
    )
    if shard_col is not None:
        out = docs.withColumn("shard", shard_col)
    else:
        b = bucket if bucket is not None else _default_hash_bucket(F.col(id_col), 1)
        out = docs.withColumn("shard", (b % shards).cast("int"))
    out = out.withColumn("n_tokens", tok.cast("long"))
    w = Window.partitionBy("shard").orderBy(*(order_cols or [id_col]))
    running = F.sum("n_tokens").over(w)
    return out.withColumn(
        "bin", F.floor((running - F.col("n_tokens")) / F.lit(max_tokens))
    )


def _bigram_concat(words: Column) -> Column:
    """unigrams ++ adjacent bigrams over an ALREADY-STAGED word-array
    column. ``words`` must be a bare column reference (staged through its
    own select), never an inline split/regexp expression: the HOF lambdas
    below are CodegenFallback-interpreted and re-evaluate their argument
    per element, so an inline word split turns O(n) into O(n^2) — the
    fingerprint/chunk staging precedent."""
    bigrams = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # so the pad row collapses to the bare last word — drop it by
        # requiring a space
        lambda g: g.contains(" "),
    )
    return F.concat(words, bigrams)


def uni_bigram_array(content_col: str) -> Column:
    """Array of lowered unigrams ++ adjacent bigrams — THE gram shape of
    the DSIR featurizer (Xie et al. 2023 §2.2), shared by the importance
    weighter (exploded + hashed) and the quality classifier (fed whole to
    HashingTF). One definition so the null-pad edge case stays fixed
    everywhere. NOTE: this inlines the word split into the HOF tree —
    convenient for one-shot use, but a hot path should stage the split
    (see ``_hashed_ngram_feats``) so the interpreted lambdas don't
    re-evaluate it."""
    words = F.regexp_extract_all(F.lower(F.col(content_col)), F.lit(r"\S+"), F.lit(0))
    return _bigram_concat(words)


def _hashed_ngram_feats(docs: DataFrame, content_col: str, id_col: str,
                        n_buckets: int, hash_fn,
                        extra: dict[str, Column] | None = None) -> DataFrame:
    """(id[, *extra], bucket) rows — one per unigram/bigram OCCURRENCE,
    bucketed by hash into ``n_buckets`` (the DSIR paper's hashed n-gram
    featurizer, Xie et al. 2023 §2.2: uni+bi-grams hashed into 10k
    buckets). The word split is STAGED through its own projection so the
    interpreted bigram lambdas evaluate it once per row, not per element;
    ``extra`` carries per-doc flag columns (e.g. the DSIR target
    predicate) through the explode so callers need no corpus re-scan."""
    extra = extra or {}
    staged = docs.select(
        id_col, *[c.alias(n) for n, c in extra.items()],
        F.regexp_extract_all(
            F.lower(F.col(content_col)), F.lit(r"\S+"), F.lit(0)
        ).alias("__w"),
    )
    return staged.select(
        id_col, *extra.keys(),
        F.explode(_bigram_concat(F.col("__w"))).alias("__g"),
    ).select(
        id_col, *extra.keys(),
        F.pmod(hash_fn(F.col("__g")), F.lit(n_buckets)).alias("bucket"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 10_007,
    smoothing: float = 0.5,
    content_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023): score every document by how target-like its hashed
    n-gram features are,

        log w(doc) = sum over feature occurrences f of
                     ln p_target(f) - ln p_raw(f)

    with unigram+bigram features hashed into ``n_buckets`` buckets and
    Laplace-smoothed bag-of-buckets probabilities fit on the TARGET subset
    (rows matching ``target_pred``) vs the WHOLE corpus. Selecting the
    top-weight documents importance-resamples the corpus toward the target
    distribution — the standard domain-matching data-selection op.

    Scale shape (round-13 autopsy): TWO corpus explode passes total. The
    target flag rides the featurizer as a per-doc column, so ONE pass
    builds the <= n_buckets (bucket, raw_n, tgt_n) table — map-side
    combinable, persisted so the totals/ratio diamond doesn't re-run the
    explode — and the only other pass is the per-doc scoring join against
    the BROADCAST ratio table. No separate target count() action: the
    unseen-bucket Laplace floor s/(tgt_tot + s*B) is algebraically the
    present-bucket formula (tgt_n + s)/(tgt_tot + s*B) at tgt_n = 0, so
    one uniform expression covers both and the scalar never leaves the
    plan. (The previous shape ran the featurizer ~4.5x: two prob tables,
    a target count action, and the scoring join — and inlined the word
    split into the interpreted bigram lambdas on every pass.)

    Returns (id, n_feats, log_weight)."""
    from opentsdb_spark.pipeline.dedup import _persist_small

    hash_fn = hash_fn or F.xxhash64
    feats = _hashed_ngram_feats(docs, content_col, id_col, n_buckets,
                                hash_fn, extra={"__t": target_pred})
    bcnt = _persist_small(
        feats.groupBy("bucket").agg(
            F.count("*").alias("__rn"),
            F.count_if(F.col("__t")).alias("__tn"),
        ),
        True,
    )
    tots = bcnt.agg(F.sum("__rn").alias("__rt"), F.sum("__tn").alias("__tt"))
    sB = F.lit(smoothing * n_buckets)
    ratio = bcnt.crossJoin(F.broadcast(tots)).select(
        "bucket",
        (
            F.log((F.col("__tn") + F.lit(smoothing)) / (F.col("__tt") + sB))
            - F.log((F.col("__rn") + F.lit(smoothing)) / (F.col("__rt") + sB))
        ).alias("log_ratio"),
    )
    return (
        feats.drop("__t").join(F.broadcast(ratio), on="bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    priority: Column | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select documents per ``group_col`` in priority order until each
    group's cumulative token count reaches ``budget_tokens`` — the "give me
    N tokens of the best data per source/domain" step that turns a scored
    corpus into a fixed-size training mixture.

    A doc is kept while the tokens accumulated BEFORE it are under budget,
    so every group overshoots by at most one document (the standard greedy
    contract). The default priority is token count descending; ties always
    break by doc id ascending so the selection is deterministic.

    100 TB shape (default priority): a window partitioned by the
    low-cardinality source key would SORT EACH WHOLE SOURCE IN ONE TASK —
    the skew magnet of naive budget selection. Instead the running sum is
    two-phase: (1) aggregate (group, n_tokens) value-buckets — a map-side
    combinable groupBy whose result is bounded by #groups x distinct token
    counts — and cumsum THAT tiny frame per group; (2) rank docs only
    WITHIN their (group, n_tokens) bucket (row_number by doc id — far
    finer partitions than whole sources) and combine:
    cum = bucket_prefix + rank * n_tokens. Token counts are one codegen
    regexp count, no tokenizer explode; nothing collects.

    A caller-supplied ``priority`` column falls back to the direct
    per-group window (custom priorities are not bucketable in general —
    acceptable when groups are balanced; pre-bucket the priority yourself
    when one group dominates).
    """
    from pyspark.sql import Window

    toks = F.coalesce(
        F.regexp_count(F.col(content_col), F.lit(r"\S+")), F.lit(0)
    ).cast("long")
    base = docs.select(
        id_col, group_col, toks.alias("n_tokens"),
    )
    if priority is not None:
        w = Window.partitionBy(group_col).orderBy(priority, F.asc(id_col))
        cum = base.withColumn(
            "cum_tokens", F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
        return (
            cum.where(F.col("cum_tokens") - F.col("n_tokens") < budget_tokens)
            .select(id_col, group_col, "n_tokens", "cum_tokens")
        )

    # phase 1: per-(group, token-count) bucket totals, cumsum over the
    # bucket frame only (rows = groups x distinct counts, not docs)
    per_val = base.groupBy(group_col, "n_tokens").agg(
        F.sum("n_tokens").alias("tok_sum"))
    wv = Window.partitionBy(group_col).orderBy(F.desc("n_tokens"))
    per_val = per_val.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("tok_sum").over(
                wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).where(F.col("cum_before") < budget_tokens)  # whole tail buckets drop early

    # phase 2: rank only within the (group, value) bucket; the join against
    # the pruned bucket frame also prunes fully-dropped docs pre-window
    wb = Window.partitionBy(group_col, "n_tokens").orderBy(F.asc(id_col))
    cum = (
        base.join(per_val, on=[group_col, "n_tokens"])
        .withColumn("__rn", F.row_number().over(wb))
        .withColumn(
            "cum_tokens",
            F.col("cum_before") + F.col("__rn") * F.col("n_tokens"))
    )
    return (
        cum.where(
            F.col("cum_before") + (F.col("__rn") - 1) * F.col("n_tokens")
            < budget_tokens)
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )


def repeat_upweight(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Epoch-style mixture replication: repeat each group's documents
    ``weights[group]`` times, with the fractional part resolved per-doc by a
    deterministic hash draw — the "2.5 epochs of books, 0.5 of web" recipe
    step that turns mixture weights into a materialized training corpus.

    copies(doc) = floor(w) + 1 if pmod(xxhash64(id), 2^20) < frac_threshold
    where frac_threshold = round(frac * 2^20) is fixed PER GROUP at plan
    time (integer, so engines agree exactly). Groups absent from
    ``weights`` default to weight 1.0 (pass 0.0 to drop a group). Output is
    one row per copy with ``copy_idx`` 0..n-1 (all original columns kept).

    Scale shape: the weight table broadcasts (a handful of groups);
    replication is a narrow explode over the scan — no shuffle, and the
    hash draw needs no RNG state, so replays and retries are idempotent."""
    spark = docs.sparkSession
    rows = [(g, int(w), int(round((w - int(w)) * (1 << 20))))
            for g, w in weights.items()]
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {g!r}")
    wdf = tiny_df(spark, rows, f"{group_col} string, __base int, __thr int")
    u = F.pmod(F.xxhash64(F.col(id_col)), F.lit(1 << 20))
    n = (
        F.coalesce(F.col("__base"), F.lit(1))
        + F.when(u < F.coalesce(F.col("__thr"), F.lit(0)), 1).otherwise(0)
    )
    # sequence(0, -1) would yield [0, -1] (Spark infers a negative step):
    # guard n == 0 with an empty array, which explode drops
    copies = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.join(F.broadcast(wdf), on=group_col, how="left")
        .withColumn("copy_idx", F.explode(copies))
        .drop("__base", "__thr")
    )


def shard_assign(
    docs: DataFrame,
    shard_tokens: int,
    n_buckets: int = 1024,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to an output shard of ~``shard_tokens`` tokens,
    deterministically — the "write the corpus as N balanced training files"
    step. Docs are laid out in the global order (bucket, xxhash64(id), id)
    (i.e. hash-shuffled, so shards are unbiased samples of the corpus) and a
    shard boundary falls every ``shard_tokens`` tokens of running sum; a doc
    straddling a boundary stays in the shard where it started, so shards
    overshoot by at most one document.

    100 TB shape: the exact global running sum WITHOUT a global sort. The
    cumsum splits two-phase like ``token_budget_select``: (1) per-bucket
    token totals — a map-side-combinable groupBy bounded at ``n_buckets``
    rows — carry the cross-bucket offsets (the one single-task window runs
    over that bounded frame only, never over docs); (2) each doc ranks
    within its own hash bucket (window partitioned by bucket over 24-byte
    rows), and cum_before = bucket offset + within-bucket prefix. Raise
    ``n_buckets`` so corpus_tokens / n_buckets stays executor-sized.

    Returns (id, n_tokens, bucket, shard).
    """
    from pyspark.sql import Window

    # fail fast: shard_tokens=0 would make the shard DIV yield NULL shards
    # silently (and write_token_shards a null partition); same guard style
    # as binned_percentile_downsample / bloom_decontaminate
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    toks = F.coalesce(
        F.regexp_count(F.col(content_col), F.lit(r"\S+")), F.lit(0)
    ).cast("long")
    base = docs.select(
        id_col,
        toks.alias("n_tokens"),
        F.xxhash64(F.col(id_col)).alias("__h"),
    ).withColumn("bucket", F.pmod(F.col("__h"), F.lit(n_buckets)))
    per_bucket = base.groupBy("bucket").agg(F.sum("n_tokens").alias("__tok_sum"))
    # bounded: exactly n_buckets rows. The constant-VALUED non-foldable
    # partition spec (bucket*0) is the same single partition but keeps
    # WindowExec's "No Partition Defined" warning out of bench/driver logs
    # (see sample_fixed_n) — the warning flags unbounded one-task windows,
    # and this one is n_buckets rows by construction
    wo = Window.partitionBy(F.col("bucket") * F.lit(0)).orderBy("bucket")
    offsets = per_bucket.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__tok_sum").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select("bucket", "__offset")
    wb = Window.partitionBy("bucket").orderBy(F.asc("__h"), F.asc(id_col))
    cum = (
        base.join(F.broadcast(offsets), on="bucket")
        .withColumn(
            "__within",
            F.coalesce(
                F.sum("n_tokens").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("__cum_before", F.col("__offset") + F.col("__within"))
    )
    return cum.select(
        id_col, "n_tokens", "bucket",
        F.expr(f"__cum_before DIV {int(shard_tokens)}").alias("shard"),
    )


def write_token_shards(
    docs: DataFrame,
    out_dir: str,
    shard_tokens: int,
    n_buckets: int = 1024,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the corpus as token-balanced parquet shards: join the
    ``shard_assign`` verdicts back to the full rows and write parquet
    partitioned by ``shard`` (each shard directory is one ~shard_tokens
    training file set). Returns the shard manifest (shard, n_docs,
    n_tokens) computed from the SAME assignment frame that was written.

    The assignment frame is 32 bytes/doc; the payload-wide join is the only
    full-width stage and flows straight into the writer — no extra
    shuffle beyond the partitioned write itself. The assignment is
    persisted (per-thread scratch registry, release_scratch() to unpin in
    long-lived processes) so the write and the returned manifest share one
    computation instead of re-scanning the corpus."""
    from pyspark.storagelevel import StorageLevel

    from opentsdb_spark.operators.groupby import _register_scratch

    assigned = _register_scratch(
        shard_assign(docs, shard_tokens, n_buckets, content_col, id_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    joined = docs.join(assigned.select(id_col, "shard"), on=id_col)
    joined.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )


def class_balance(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic class balancing: down-sample every class to the size
    of the smallest one, keeping each class's rows with the lowest
    xxhash64(id) — a seedless, order-independent "random" subset that is
    identical on every run and engine (the classifier-training prep step).

    Scale shape: class sizes are one tiny groupBy; the min joins back as a
    broadcast one-row frame. Selection ranks ONLY the (label, hash, id)
    triple frame — 24-byte rows, not payloads — in a per-class window, and
    the kept ids semi-join the full rows back. At extreme skew (one class =
    half the corpus) pre-bucket the hash as in ``token_budget_select``.

    Returns the kept rows of ``df`` (all original columns).
    """
    from pyspark.sql import Window

    sizes = df.groupBy(label_col).agg(F.count("*").alias("__n"))
    m = sizes.agg(F.min("__n").alias("__m"))
    ids = df.select(
        label_col, id_col, F.xxhash64(F.col(id_col)).alias("__h"))
    w = Window.partitionBy(label_col).orderBy(F.asc("__h"), F.asc(id_col))
    kept = (
        ids.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(m))
        .where(F.col("__rn") <= F.col("__m"))
        .select(label_col, id_col)
    )
    return df.join(kept, on=[label_col, id_col], how="leftsemi")


def _two_phase_group_rank(base: DataFrame, group_cols: list[str],
                          id_col: str, n_buckets: int,
                          bucket: Column | None = None,
                          order: list[Column] | None = None,
                          bucket_desc: bool = False,
                          broadcast_offsets: bool = True) -> DataFrame:
    """Dense 1-based rank within each group in (bucket, order...) order,
    with NO per-group global sort — the shared two-phase machinery of
    interleave_sources / global_shuffle / cap_per_group (and the token
    cumsum variant in shard_assign): per-(group, bucket) counts are a
    map-side-combinable groupBy bounded at groups x n_buckets rows,
    cross-bucket offsets ride one window over that bounded frame only,
    and each row ranks inside its own (group, bucket) window — a group
    with 10^11 rows never lands in one task.

    Default order is (pmod(__h, n_buckets), __h asc, id asc) — ``base``
    must then carry the hash column ``__h``. Pass ``bucket`` (a NON-NULL
    integer Column that is a monotone coarsening of ``order``) plus
    ``order`` for a custom total order, e.g. quantized-quality buckets
    with (quality desc, id asc) inside; set ``bucket_desc`` when higher
    buckets rank first. Adds ``__b``/``__off``/``__rn`` scratch and
    ``n_rank``. group_cols may be empty (one global rank).

    ``broadcast_offsets``: the offsets frame is groups x n_buckets rows —
    broadcast-safe when the group count is known small (interleave's
    sources, global_shuffle's single group) but a per-DOMAIN cap can see
    millions of groups, where a forced broadcast is a driver OOM at
    exactly the scale the op targets; pass False there for a plain equi-
    join (AQE still upgrades it to broadcast at runtime when the frame is
    actually small).

    Null-group safety: the offsets come back via an equi-JOIN, and a join
    treats NULL != NULL (unlike the GROUP BY that built the counts) — so
    grouping runs on non-null surrogate keys and null-group rows rank in
    their own group instead of silently vanishing."""
    from pyspark.sql import Window

    if n_buckets < 1:
        # pmod(_, 0) yields NULL buckets and the offsets equi-join would
        # silently drop every row (the null-key join trap)
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if bucket is None:
        bucket = F.pmod(F.col("__h"), F.lit(n_buckets))
    if order is None:
        order = [F.asc("__h"), F.asc(id_col)]
    gkeys = [f"__gk{i}" for i in range(len(group_cols))]
    base = base.withColumn("__b", bucket)
    for gk, c in zip(gkeys, group_cols):
        base = base.withColumn(
            gk, F.coalesce(F.col(c).cast("string"), F.lit("\x00__null__")))
    counts = base.groupBy(*gkeys, "__b").agg(F.count("*").alias("__n"))
    # bounded frame (groups x n_buckets rows). With NO group keys (the
    # global-shuffle form) an empty spec would make WindowExec log "No
    # Partition Defined" on every run — partition on a constant-valued
    # non-foldable expression instead (same single partition, see
    # sample_fixed_n)
    wo_keys = gkeys if gkeys else [F.col("__b") * F.lit(0)]
    wo = Window.partitionBy(*wo_keys).orderBy(
        F.desc("__b") if bucket_desc else F.asc("__b"))
    offsets = counts.withColumn(
        "__off",
        F.coalesce(
            F.sum("__n").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select(*gkeys, "__b", "__off")
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    wb = Window.partitionBy(*gkeys, "__b").orderBy(*order)
    return (
        base.join(offsets, on=[*gkeys, "__b"])
        .withColumn("__rn", F.row_number().over(wb))
        .withColumn("n_rank", F.col("__off") + F.col("__rn"))
        .drop(*gkeys)
    )


def interleave_sources(
    docs: DataFrame,
    weights: dict[str, float],
    n_buckets: int = 1024,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic proportional source interleaving — the "mix the
    curated sources at these rates" step between a corpus and its training
    shards. Every doc gets an ``interleave_key`` such that sorting (or
    range-sharding) by (interleave_key, group, id) yields a stream whose
    every prefix contains each source in ~proportion to its weight: doc
    rank r within source s (1-based, hash-shuffled order) lands at key
    floor(r * 2^20 / w20(s)) with w20 = round(weight * 2^20), i.e. a
    weight-2 source emits twice as often as a weight-1 source. Integer
    arithmetic end to end — the key is reproducible in any engine, and a
    fixed-point weight cannot drift between the planner and a SQL replica.
    Sources absent from ``weights`` default to weight 1.0; weights must be
    > 0 (a 0-rate source should be filtered out, not divided by).

    Scale shape — NO per-source global sort: rank-within-source uses the
    same two-phase trick as ``shard_assign``: docs hash into ``n_buckets``,
    per-(source, bucket) counts (a map-side-combinable groupBy bounded at
    sources x n_buckets rows) carry cross-bucket offsets via a window over
    that bounded frame only, and each doc ranks inside its own (source,
    bucket) window — so a source with 10^11 docs never lands in one task,
    which a naive Window.partitionBy(source).row_number() would force.

    Returns (id, group, n_rank, interleave_key)."""
    from pyspark.sql import Window

    if not weights:
        raise ValueError("weights must name at least one source")
    w20 = {}
    for g, w in weights.items():
        if not w > 0:
            raise ValueError(f"weight for {g!r} must be > 0, got {w}")
        w20[g] = max(1, int(round(float(w) * (1 << 20))))
    spark = docs.sparkSession
    wdf = tiny_df(
        spark, [(g, v) for g, v in sorted(w20.items())],
        f"{group_col} string, __w20 long")
    base = docs.select(
        group_col, id_col, F.xxhash64(F.col(id_col)).alias("__h")
    )
    ranked = _two_phase_group_rank(base, [group_col], id_col, n_buckets)
    return (
        ranked.join(F.broadcast(wdf), on=group_col, how="left")
        .select(
            id_col, group_col,
            F.col("n_rank").cast("long").alias("n_rank"),
            F.expr(f"(n_rank * {1 << 20}) div coalesce(__w20, {1 << 20})")
            .cast("long").alias("interleave_key"),
        )
    )


def global_shuffle(
    docs: DataFrame,
    seed: int = 0,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seeded corpus shuffle — the "randomize the training
    order" step before sharding: every row gets a DENSE global position
    1..N in a pseudo-random but fully reproducible order. The order is
    (bucket, h, id) where h = xxhash64(seed, id) — changing ``seed`` gives
    an independent permutation, and any engine (or a re-run after a crash)
    reproduces the same order bit for bit, which a `rand()`-based shuffle
    cannot promise across retries.

    100 TB shape: a dense global rank with NO global sort — the same
    two-phase trick as ``shard_assign``: per-bucket counts (map-side
    -combinable, bounded at ``n_buckets`` rows) carry cross-bucket offsets
    through one bounded window, and each row ranks inside its own hash
    bucket. Shuffled payload is the 24-byte (id, h, bucket) frame; join
    positions back to the wide corpus by id.

    Returns (id, pos) with pos in [1, N]."""
    base = docs.select(
        id_col,
        F.xxhash64(F.lit(int(seed)).cast("long"), F.col(id_col)).alias("__h"),
    )
    return _two_phase_group_rank(base, [], id_col, n_buckets).select(
        id_col, F.col("n_rank").cast("long").alias("pos"))


def _quality_rank_frame(docs: DataFrame, group_col: str, id_col: str,
                        quality_col, quality_desc: bool,
                        n_buckets: int) -> DataFrame:
    """The narrow quality-ordered rank frame behind cap_per_group's scale
    path: (group, id, __q, __b, ..., n_rank) with the dense per-group
    (quality, id) rank computed through quantized buckets. Factored out so
    tests can assert the per-(group, __b) partition bound directly.

    The quantization bounds are PER GROUP (one tiny groupBy(group)
    min/max, joined back on the group key — AQE broadcasts it when
    small): a mega-group whose scores occupy a sliver of the global range
    still spreads over its own n_buckets, so the no-single-task-window
    guarantee holds for every group, not just on globally-spread scores.
    Equal scores never straddle a bucket boundary (the coarsening is
    monotone within the group), so the bucket-major rank reproduces the
    exact sequential (quality, id) order bit for bit."""
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    base = docs.select(group_col, id_col, q.cast("double").alias("__q"))
    # non-null surrogate key for the stats join: an equi-join treats
    # NULL != NULL, which would silently drop null-group rows (the same
    # trap _two_phase_group_rank guards its offsets join against)
    base = base.withColumn(
        "__gq", F.coalesce(F.col(group_col).cast("string"),
                           F.lit("\x00__null__")))
    stats = base.groupBy("__gq").agg(
        F.min("__q").alias("__mn"), F.max("__q").alias("__mx"))
    span = F.col("__mx") - F.col("__mn")
    frac = F.when(span > 0, (F.col("__q") - F.col("__mn")) / span) \
        .otherwise(F.lit(0.0))
    qb = F.least(F.floor(frac * n_buckets).cast("long"),
                 F.lit(n_buckets - 1))
    # NULL quality ranks last: a sentinel bucket beyond every real one
    # in the chosen direction (and it keeps the join key non-null)
    sentinel = F.lit(-1 if quality_desc else n_buckets).cast("long")
    bucket = F.when(F.col("__q").isNull(), sentinel).otherwise(qb)
    order = [F.col("__q").desc_nulls_last() if quality_desc
             else F.col("__q").asc_nulls_last(), F.asc(id_col)]
    return _two_phase_group_rank(
        base.join(stats, on="__gq").drop("__gq"), [group_col], id_col,
        n_buckets, bucket=bucket, order=order, bucket_desc=quality_desc,
        broadcast_offsets=False)


_SIMPLE_SORT_RE = None  # compiled lazily


def _sort_spec_from_jvm(ob) -> tuple[str, str, str] | None:
    """(name, direction, null_ordering) read off the column's JVM
    expression tree — the authoritative source (a SortOrder node carries
    its direction and nullOrdering as typed fields). Returns None for
    non-Column inputs, computed expressions, multi-part names, or when no
    JVM column is available (e.g. Spark Connect), in which case the
    caller falls back to the repr regex (whose assumption is pinned by
    test_route_order_by_repr_assumption so a PySpark repr change fails
    loudly instead of silently re-routing callers)."""
    def _bare_name(attr) -> str | None:
        if attr.getClass().getSimpleName() != "UnresolvedAttribute":
            return None  # computed expression — never routable
        parts = attr.nameParts()
        if parts.size() != 1:
            return None  # multi-part (a.b) — not a bare top-level column
        return str(parts.head())

    try:
        node = ob._jc.node()  # classic PySpark 4.x ColumnNode
        cls = node.getClass().getSimpleName()
        if cls != "SortOrder":
            # a bare Column sorts ASC NULLS FIRST — never routable, but
            # report it so the caller need not fall back to the regex
            name = _bare_name(node)
            return None if name is None else (name, "ASC", "NULLS FIRST")
        name = _bare_name(node.child())
        if name is None:
            return None
        desc = "Descending" in node.sortDirection().getClass().getSimpleName()
        last = "NullsLast" in node.nullOrdering().getClass().getSimpleName()
        return (name, "DESC" if desc else "ASC",
                "NULLS LAST" if last else "NULLS FIRST")
    except Exception:
        return None


def _route_order_by_to_quality(order_by, schema=None) -> tuple[str, bool] | None:
    """Detect a ``cap_per_group(order_by=...)`` that is really just a
    single-column sort the scale-safe quality path can serve, and return
    (quality_col, quality_desc) — else None.

    Routable: exactly one entry naming a bare column whose NULL placement
    matches the quality path's nulls-LAST sentinel — ``F.desc(c)`` /
    ``"c DESC"`` (DESC defaults to NULLS LAST) and the explicit
    ``asc_nulls_last`` / ``desc_nulls_last`` forms — AND whose resolved
    type survives the quality path's cast to double order-faithfully
    (numeric / timestamp / boolean). A string or date order column would
    cast to NULL (every row in the sentinel bucket, rank degenerating to
    id-ASC), so when ``schema`` is given and the column is missing or
    non-numeric the sort is NOT routed and the caller keeps the exact
    window semantics (with the scale warning). A bare string /
    ``F.col(c)`` / ``F.asc(c)`` is ASC NULLS FIRST and would change where
    NULL scores land, so it is likewise not routed; computed expressions
    are never routed. The sort spec is read from the JVM SortOrder
    expression when available; the repr regex is only a fallback."""
    global _SIMPLE_SORT_RE
    if _SIMPLE_SORT_RE is None:
        import re

        _SIMPLE_SORT_RE = re.compile(
            r"^(?:Column<')?([A-Za-z_][A-Za-z0-9_]*)"
            r"(?: (ASC|DESC))?(?: NULLS (FIRST|LAST))?(?:'>)?$"
        )
    entries = list(order_by)
    if len(entries) != 1:
        return None
    ob = entries[0]
    spec = None if isinstance(ob, str) else _sort_spec_from_jvm(ob)
    if spec is not None:
        name, direction, nulls = spec
        nulls = nulls.replace("NULLS ", "")
        if "." in name or "`" in name:
            return None  # multi-part / quoted — not a bare top-level column
    else:
        m = _SIMPLE_SORT_RE.match(ob if isinstance(ob, str) else str(ob))
        if m is None:
            return None
        name, direction, nulls = m.group(1), m.group(2) or "ASC", m.group(3)
        if nulls is None:
            nulls = "LAST" if direction == "DESC" else "FIRST"
    if nulls != "LAST":
        return None
    if schema is not None and not _cast_to_double_is_order_faithful(schema, name):
        return None
    return name, direction == "DESC"


def _cast_to_double_is_order_faithful(schema, name: str) -> bool:
    """True when ``cast(col AS double)`` is a monotone, null-preserving
    image of the column's native order — the precondition for routing an
    order_by through the quantized quality rank. Numeric types and
    timestamps (epoch seconds) qualify; boolean (false<true → 0.0<1.0)
    qualifies; strings/dates/binary cast to NULL or reorder, so they must
    keep the exact window path.

    DecimalType with precision > 15 is EXCLUDED: such values can exceed
    double's 53-bit mantissa, so distinct decimals collapse under the
    cast and the quantized rank's tiebreak could differ from the exact
    window sort. LongType stays routed — the quality path is quantized by
    design and integer quality scores beyond 2^53 do not occur in
    practice — but note the cast is only order-faithful up to 2^53; a
    caller ranking on raw 64-bit hashes should use the exact window path
    (hash order_by columns are not quality scores and are not routed
    here in any catalog use)."""
    from pyspark.sql import types as T

    field = next((f for f in schema.fields if f.name == name), None)
    if field is None:
        return False
    if isinstance(field.dataType, T.DecimalType):
        return field.dataType.precision <= 15
    return isinstance(field.dataType,
                      (T.NumericType, T.TimestampType, T.TimestampNTZType,
                       T.BooleanType))


def leakage_safe_split(
    docs: DataFrame,
    weights: dict[str, float],
    pairs: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    bucket_fn=None,
) -> DataFrame:
    """Dedup-aware train/val/test split: near-duplicate documents NEVER
    straddle a split boundary. A plain hash_split leaks — a val doc's
    near-duplicate lands in train with probability train_frac, and the
    eval measures memorization of the duplicate, not generalization. Here
    every document's split bucket keys on its near-dup CLUSTER
    representative (connected-component min id over the ``pairs`` graph;
    singletons key on themselves), so a whole clique moves as one unit
    and the leak cannot exist by construction. Expected split sizes hold
    at the CLUSTER level (exactly what you want: measuring them at the
    doc level would double-count clique mass).

    ``pairs`` is any near-dup pair frame (ngram_jaccard_pairs,
    minhash_lsh_pairs, embedding_dup_pairs...). ``bucket_fn`` maps the
    component id Column to a [0, 10000) bucket — default the seeded
    xxhash64 bucket; pass ``knuth_hash_bucket`` for a SQL-replicable
    split (the hash_split contract).

    100 TB shape: connected_components' degree-bounded large-star/
    small-star rounds + one id equi-join; the split itself stays a
    narrow map on the component key. Returns docs + (component, split)."""
    from opentsdb_spark.pipeline.cluster import dedup_assign_clusters

    comp = dedup_assign_clusters(docs, pairs, id_col=id_col) \
        .select(id_col, "component")
    keyed = docs.join(comp, on=id_col)
    b = (bucket_fn(F.col("component")) if bucket_fn is not None
         else _default_hash_bucket(F.col("component"), seed))
    return hash_split(keyed, weights, id_col=id_col, bucket=b)


def quality_percentile(
    docs: DataFrame,
    quality_col: str | Column = "quality",
    group_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-group PERCENTILE RANK of a quality score — the calibration
    step before cross-source mixing: raw quality scores are not
    comparable across sources (a classifier score of 0.7 can be p20 in a
    curated source and p95 in a crawl), so mixture policies threshold on
    each doc's WITHIN-SOURCE percentile instead. pct = (rank - 1) /
    (n - 1) under the deterministic (score asc, id asc) order — 0 for the
    group's worst doc, 1 for its best, 0.5 for the single-member group
    (no order to place it in). NULL scores keep a NULL pct (they cannot
    be calibrated; gate them upstream).

    100 TB shape: the rank is cap_per_group's quantized-bucket two-phase
    machinery (per-group min/max quantization -> per-(group, bucket)
    windows — a mega-source never lands in one rank task); group sizes
    ride the same bounded count frame. Only the narrow (group, id, score)
    projection shuffles; the wide corpus joins back by id.

    Returns docs + (group_rank, pct)."""
    ranked = _quality_rank_frame(docs, group_col, id_col, quality_col,
                                 False, n_buckets)
    # non-null surrogate for the sizes join (NULL != NULL in equi-joins)
    gk = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00__null__"))
    ranked = ranked.withColumn("__gq", gk)
    sizes = ranked.groupBy("__gq").agg(
        F.sum(F.col("__q").isNotNull().cast("long")).alias("__n"))
    pct = F.when(
        F.col("__q").isNull(), F.lit(None).cast("double")
    ).when(
        F.col("__n") == 1, F.lit(0.5)
    ).otherwise(
        (F.col("n_rank") - 1).cast("double") / (F.col("__n") - 1).cast("double")
    )
    narrow = ranked.join(sizes, on="__gq").select(
        id_col,
        F.col("n_rank").cast("int").alias("group_rank"),
        pct.alias("pct"),
    )
    return docs.join(narrow, on=id_col)


def cap_per_group(
    docs: DataFrame,
    max_per_group: int,
    group_col: str = "source",
    order_by=None,
    quality_col: str | Column | None = None,
    quality_desc: bool = True,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain/source document cap — the classic crawl-hygiene stage: a
    handful of mega-domains (link farms, mirror hosts) otherwise dominate
    the corpus. Keeps the ``max_per_group`` best documents of each group
    under a DETERMINISTIC order and returns the capped corpus with the
    group's selection rank alongside. Orders, in priority:
      * ``quality_col`` (+ ``quality_desc``): keep the top-quality docs
        per group under (quality, id asc) — THE real use (quality-capped
        crawls), scale-safe (see below);
      * ``order_by`` (list of Columns): arbitrary per-group window order —
        single-task per group, small/medium groups only;
      * default: xxhash64(id) asc, id asc — an unbiased reproducible
        sample.

    100 TB shape: both the default hash order AND the quality order rank
    through the shared two-phase machinery (``_two_phase_group_rank``) —
    per-(group, bucket) counts + bounded offset windows — so a mega-group
    NEVER lands in one rank task. The quality path buckets on a QUANTIZED
    quality key: a tiny PER-GROUP min/max aggregate maps each group's
    scores monotonically onto ``n_buckets`` integer buckets over that
    group's own range (equal scores share a bucket, so lexicographic
    (bucket, score, id) equals (score, id) exactly and the distributed
    rank is bit-equal to the sequential per-group sort); NULL scores rank
    last in their own sentinel bucket. Per-group bounds (not global ones)
    make the no-single-task-window guarantee hold for EVERY group: a
    mega-domain whose scores cluster in a sliver of the global range
    still spreads across its own n_buckets (pinned by a skewed-score
    partition test). The rank shuffles only the narrow (group, key, id)
    projection; survivors join the wide corpus back by id, so document
    text never enters the rank shuffle, and the survivor set is bounded
    at groups x max_per_group however large the crawl. The per-group
    stats and offsets frames are bounded at groups / groups x n_buckets
    rows and are deliberately NOT force-broadcast (group cardinality is
    unbounded for per-domain caps — AQE upgrades the joins at runtime
    when the frames are actually small). A constant-quality group
    degenerates to one bucket (the honest limit: there is no order to
    split on).

    A custom ``order_by`` cannot bucket (the key is arbitrary) and falls
    back to a per-group window over the full frame — fine for
    small/medium groups, an anti-pattern for crawl-scale corpora, so:
    a single-column ``order_by`` with NULLS-LAST placement (e.g.
    ``[F.desc("score")]``) is routed through the scale-safe quality path
    automatically (gaining the deterministic id tie-break), and any
    genuinely arbitrary order warns once that the plan contains a
    whole-group single-task window."""
    from pyspark.sql import Window

    if max_per_group < 1:
        raise ValueError(f"max_per_group must be >= 1, got {max_per_group}")
    if quality_col is None and order_by is not None:
        routed = _route_order_by_to_quality(order_by, schema=docs.schema)
        if routed is not None:
            quality_col, quality_desc = routed
            order_by = None
    if quality_col is not None:
        ranked = _quality_rank_frame(docs, group_col, id_col, quality_col,
                                     quality_desc, n_buckets)
        ranked = ranked.withColumn("group_rank", F.col("n_rank"))
    elif order_by is None:
        base = docs.select(group_col, id_col,
                           F.xxhash64(F.col(id_col)).alias("__h"))
        ranked = _two_phase_group_rank(base, [group_col], id_col, 1024,
                                       broadcast_offsets=False)
        ranked = ranked.withColumn("group_rank", F.col("n_rank"))
    else:
        import warnings

        warnings.warn(
            "cap_per_group(order_by=...) with a non-routable order runs a "
            "whole-group single-task window — unscalable for crawl-sized "
            "groups; pass quality_col= (or a single nulls-last column) "
            "for the bucketed scale-safe rank",
            stacklevel=2,
        )
        w = Window.partitionBy(group_col).orderBy(*list(order_by))
        ranked = docs.withColumn("group_rank", F.row_number().over(w))
    ranked = (
        ranked.where(F.col("group_rank") <= max_per_group)
        .select(id_col, F.col("group_rank").cast("int").alias("group_rank"))
    )
    return docs.join(ranked, on=id_col)


def sample_fixed_n(
    docs: DataFrame,
    n: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-size corpus sample: exactly ``n`` rows (fewer
    only if the corpus is smaller), selected as the lowest values of
    xxhash64(seed, id) — an unbiased, seed-reproducible spot-check sample
    (eyeballing, labeling batches, quick evals) where rand()-based
    sampling changes members on every retry and fraction-based sampling
    cannot promise an exact count.

    100 TB shape: orderBy(...).limit(n) compiles to TakeOrderedAndProject
    — each partition keeps only its local top-n (a bounded heap), and the
    driver merges #partitions x n candidate rows; there is NO global sort
    and no shuffle of the corpus (plan-pinned in tests). sample_rank is
    the 1-based rank within the sample.

    Returns the sampled docs' rows + sample_rank."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.xxhash64(F.lit(int(seed)).cast("long"), F.col(id_col))
    out = (
        docs.withColumn("__h", h)
        .orderBy(F.asc("__h"), F.asc(id_col))
        .limit(n)
    )
    # the sample is at most n rows: rank it with a tiny single-partition
    # window (bounded by n, never by the corpus). Partitioning on a
    # constant-VALUED but non-foldable expression (id*0 — a plain literal
    # gets constant-folded back to an empty spec) is semantically the same
    # single partition but keeps WindowExec's "No Partition Defined"
    # warning out of the logs: the warning flags unbounded single-task
    # windows, and this one is bounded by n rows post-limit
    from pyspark.sql import Window

    w = Window.partitionBy(F.col(id_col) * F.lit(0)).orderBy(
        F.asc("__h"), F.asc(id_col))
    return (
        out.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .drop("__h")
    )


def weighted_sample(
    docs: DataFrame,
    n: int,
    weight_col: str | Column = "n_chars",
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sample without replacement — sequential
    Poisson / order sampling (Ohlsson, "Sequential Poisson Sampling",
    J. Official Statistics 14(2), 1998): each row gets priority
    q_i = u_i / w_i and the ``n`` SMALLEST priorities win, which draws
    rows with probability approximately proportional to weight (pi-ps).
    The classic use: sample a fixed-size eval/inspection set where long
    or high-quality documents should be proportionally more likely, yet
    the draw must replay bit-identically across reruns and engines.

    u_i is a deterministic uniform in [0, 1): the low 53 bits of
    xxhash64(seed, id) divided by 2^53 — integer mod plus ONE IEEE
    division, no transcendentals, so the priority (and therefore the
    selected set and its order) is bit-identical in any engine that
    reproduces xxhash64 (the DuckDB oracle does, via xxh64_sql). A
    weight-aware A-ES key (u^(1/w)) would need pow/log, whose libm
    rounding differs across engines; sequential Poisson gives the same
    inclusion probabilities to first order from pure mul/div.

    Rows with NULL or non-positive weight are zero-probability units and
    are excluded (standard pi-ps convention).

    100 TB shape: identical to sample_fixed_n — the priority is a narrow
    map expression and orderBy(...).limit(n) compiles to
    TakeOrderedAndProject (bounded per-partition heaps + a driver merge
    of #partitions x n candidates); the corpus never shuffles and never
    sorts globally. Returns the winning rows + (priority, sample_rank).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("double")
    m = F.lit(1 << 53).cast("long")
    h = F.xxhash64(F.lit(int(seed)).cast("long"), F.col(id_col))
    u = (((h % m) + m) % m).cast("double") / F.lit(float(1 << 53))
    out = (
        docs.where(w.isNotNull() & (w > 0))
        .withColumn("priority", u / w)
        .orderBy(F.asc("priority"), F.asc(id_col))
        .limit(n)
    )
    from pyspark.sql import Window

    # bounded post-limit rank; constant-valued non-foldable partition spec
    # keeps WindowExec's "No Partition Defined" warning out of the logs
    # (see sample_fixed_n)
    rw = Window.partitionBy(F.col(id_col) * F.lit(0)).orderBy(
        F.asc("priority"), F.asc(id_col))
    return out.withColumn("sample_rank", F.row_number().over(rw).cast("int"))
