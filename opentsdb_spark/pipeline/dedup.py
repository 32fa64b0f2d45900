"""Document deduplication operators.

All-native column expressions; every candidate-generation step is a hash
shuffle keyed by a bucket (band / simhash-band / blocking key), never an
unblocked cross join — the n² stays inside small buckets, which is what
survives a 100×  scale-up.

  exact_dedup          hash-groupBy on content
  ngram_jaccard_pairs  blocked pairwise Jaccard over word n-gram sets
  minhash_lsh_pairs    shingle -> minhash signature -> banded LSH buckets
                       -> in-bucket verification
  simhash_pairs        64-bit SimHash -> 16-bit band buckets -> Hamming check
  embedding_dup_pairs  cosine >= threshold within LSH sign-buckets
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _persist_small(df: DataFrame, enabled: bool) -> DataFrame:
    """Persist a derived frame that the downstream plan references more than
    once. Spark shares no common subplans, so without this each reference
    re-executes the full lineage — for signature/gram frames that means
    re-SCANNING THE CORPUS per reference (measured 4 scans in the minhash
    candidate join). The persisted frame is normally orders of magnitude
    smaller than the corpus (fixed-width signatures vs. documents);
    MEMORY_AND_DISK spills instead of evicting to recompute. Two call sites
    deliberately persist CORPUS-cardinality (but fixed-width, text-free)
    frames — strip_boilerplate_chunks' per-chunk key frame and
    substring duplication's per-window frame, both one ~20-byte row per
    chunk/window — where the measured alternative was re-running the chunk/
    window explode over the full text per consumer; at scale those persists
    are bounded by rows x ~20 B of MEMORY_AND_DISK scratch (spill, never
    recompute) and each site records its measured justification in place.
    Callers that manage their own lifecycle
    can pass persist=False and cache/checkpoint externally.

    Every persist registers with the per-thread scratch registry, so a
    long-lived serving process can release a request's whole working set
    with one release_scratch() call (same contract as the grid-join
    scratch frames) instead of leaking one cached frame per request."""
    if not enabled:
        return df
    from pyspark.storagelevel import StorageLevel

    from opentsdb_spark.operators.groupby import _register_scratch

    return _register_scratch(df.persist(StorageLevel.MEMORY_AND_DISK))


def exact_dedup(docs: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per distinct content value.

    The groupBy key is sha2(content) — a 32-byte shuffle key regardless of
    document size, so at corpus scale the shuffle carries hashes + one
    representative content per distinct key (map-side combined), never every
    document body as a key. SHA-256 collisions are cryptographically
    negligible, and identical contents always collide, so the grouping is
    exact."""
    key = F.sha2(F.col(content_col).cast("binary"), 256)
    return (
        docs.groupBy(key.alias("__k"))
        .agg(
            F.min(id_col).alias(id_col),
            F.first(content_col).alias(content_col),
            F.count("*").alias("dup_count"),
        )
        .select(id_col, content_col, "dup_count")
    )


def snapshot_diff(
    docs_a: DataFrame,
    docs_b: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-level diff between two corpus snapshots (crawl N vs crawl
    N+1): one verdict row per document id —
      * ``added``     — id only in B (new crawl coverage);
      * ``removed``   — id only in A (lost coverage / takedowns);
      * ``changed``   — id in both, content differs (page updated, or an
        extraction/encoding regression when the rate spikes);
      * ``unchanged`` — id in both, content byte-identical.
    The distribution-level audits (vocab_drift, embedding_drift) say WHAT
    moved; this says WHICH documents — run it before incremental dedup so
    only added/changed docs re-enter the pipeline.

    Scale shape: each side collapses to (id, sha2) — 40-byte rows however
    large the documents — and the diff is ONE full-outer equi-join on the
    id; document text never shuffles. SHA-256 collisions are
    cryptographically negligible (the exact_dedup argument), and the
    catalog oracle compares raw text server-side, so a collision would
    surface as a value mismatch rather than pass silently.

    Presence is carried by explicit per-side markers, NOT by hash
    nullity: sha2(NULL content) is NULL, so a hash-nullity proxy would
    misreport a present-with-NULL-text document as added/removed. With
    the markers, NULL-content rows diff like any other value
    (NULL <=> NULL is unchanged, NULL vs text is changed)."""
    a = docs_a.select(
        F.col(id_col),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("__ha"),
        F.lit(True).alias("__in_a"))
    b = docs_b.select(
        F.col(id_col),
        F.sha2(F.col(content_col).cast("binary"), 256).alias("__hb"),
        F.lit(True).alias("__in_b"))
    j = a.join(b, on=id_col, how="full")
    status = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(F.col("__ha").eqNullSafe(F.col("__hb")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, status.alias("status"))


def md5_hash64(c) -> F.Column:
    """Cross-engine 60-bit string hash: first 15 hex chars of md5 as a
    BIGINT. ~3× slower than xxhash64 (the production default) but exactly
    reproducible in DuckDB (``CAST('0x0' || substring(md5(s),1,15) AS
    BIGINT)``) — the ``*_md5`` catalog variants use it so the full
    MinHash/SimHash pipelines get hash-checked oracles instead of rows-only
    entries."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _gram_frame(docs: DataFrame, content_col: str, id_col: str, n: int,
                distinct: bool = True, extra_cols: tuple = ()) -> DataFrame:
    """(id, grams) with the tokenizer materialized as its own projection —
    inlining split() into the transform lambda makes codegen re-split the
    text once per n-gram (O(len²) per doc); staging it as a bound column
    attribute evaluates it once per row.

    Documents shorter than n words have no n-gram identity and are dropped
    (without the size guard, F.sequence(0, negative) yields a DESCENDING
    index list and slice(_, 0, n) aborts the whole job on the first short
    doc — guaranteed on a real corpus)."""
    # \S+ extraction, not a \s+ split: split's '' boundary tokens gave
    # empty docs the gram set [''] (all empty docs paired at jaccard 1.0)
    # and put phantom ''-joined grams in every doc with trailing whitespace
    words = docs.select(
        id_col, *extra_cols,
        F.regexp_extract_all(F.col(content_col), F.lit(r"\S+"), F.lit(0)).alias("__w"),
    )
    if n == 1:
        g1 = F.array_distinct("__w") if distinct else F.col("__w")
        return (words.select(id_col, *extra_cols, g1.alias("grams"))
                .where(F.size("grams") > 0))
    # the sliding join runs in an Arrow-batched pandas UDF: the
    # transform(sequence, slice+array_join) expression form is
    # CodegenFallback, ~13us of interpreter overhead PER GRAM (3.4s for a
    # 250k-gram corpus scan; this path is ~0.2s). Gram strings are
    # byte-identical (" ".join == array_join(_, " ")) and first-occurrence
    # order is preserved (dict.fromkeys == array_distinct), so every hash
    # oracle downstream is unaffected.
    grams = _shingle_udf(n, distinct)(F.col("__w"))
    return (
        words.where(F.size("__w") >= n)
        .select(id_col, *extra_cols, grams.alias("grams"))
    )


def _shingle_udf(n: int, distinct: bool = True):
    @F.pandas_udf("array<string>")
    def shingle(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            seq = (" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
            out.append(list(dict.fromkeys(seq)) if distinct else list(seq))
        return pd.Series(out)

    return shingle


_CLONE_PROBE_RSD = 0.01
_CLONE_PROBE_MARGIN = 4.0  # bypass only when est. distinct >= (1 - 4*rsd) * n


def _should_collapse(collapse_identical, keyed: DataFrame, key_expr) -> bool:
    """Adaptive exact-clone gate shared by every *_pairs collapse path.

    ``collapse_identical`` semantics:
      - ``False``   -> never collapse.
      - ``"force"`` -> always collapse (no probe) — what the bit-exactness
        tests pin against the direct path.
      - ``True`` / ``"auto"`` -> probe clone mass with ONE map-side
        -combinable aggregate (count vs approx_count_distinct, HLL++
        partials — no row shuffle) and collapse only when the estimated
        distinct-key count falls short of the row count by more than the
        HLL error margin. Clone-light corpora (the common case) then skip
        the clique window and the 3 expansion joins entirely; output is
        bit-identical either way (pinned by test_*_collapse_bitexact), so
        a borderline probe can only affect cost, never results.

    Safety at 100 TB: a clone-heavy corpus (mirrors, replays — the
    quadratic failure mode collapse exists for) has distinct << count, far
    outside the HLL error band, so the probe cannot misread it as
    clone-free. The marginal band (< ~4% clone mass) is exactly where the
    direct path's extra clique work is negligible. The probe runs on the
    already-persisted key frame, so it doubles as the cache warm-up for
    the downstream plan references rather than an extra corpus scan."""
    if collapse_identical is False:
        return False
    if collapse_identical == "force":
        return True
    # memoize per analyzed-plan identity: a serving process (or a best-of-N
    # bench) re-issuing the same operator over the same corpus plan pays
    # the probe job once, not per call. Keyed on Catalyst's semanticHash of
    # the projected key frame — same source + params -> same hash. A stale
    # hit (data mutated under an identical plan, e.g. a rewritten parquet
    # path) can only mis-route PERFORMANCE, never results (both paths are
    # bit-identical), which is the correct trade for a gate.
    try:
        probe_key = (
            keyed.select(key_expr.alias("__k"))
            ._jdf.queryExecution().analyzed().semanticHash()
        )
    except Exception:
        probe_key = None
    if probe_key is not None and probe_key in _PROBE_CACHE:
        verdict = _PROBE_CACHE[probe_key]
        _record_probe(verdict)
        return verdict
    row = keyed.agg(
        F.count("*").alias("__n"),
        F.approx_count_distinct(key_expr, _CLONE_PROBE_RSD).alias("__d"),
    ).first()
    n, d = row["__n"], row["__d"]
    verdict = d < n * (1.0 - _CLONE_PROBE_MARGIN * _CLONE_PROBE_RSD)
    if probe_key is not None:
        if len(_PROBE_CACHE) >= 256:  # bound a long-lived server's footprint
            _PROBE_CACHE.clear()
        _PROBE_CACHE[probe_key] = verdict
    _record_probe(verdict)
    return verdict


_PROBE_CACHE: dict[int, bool] = {}

# observability tap for the adaptive gate: every probe DECISION (fresh or
# memoized; True = collapse, False = bypass) appends here, so a harness
# (tools/scale_check.py) can attribute verdicts to the query it just built
# by clearing before and reading after. Self-bounded so a long-lived
# server that never reads it cannot grow it past ~1024 entries.
PROBE_EVENTS: list[bool] = []


def _record_probe(verdict: bool) -> None:
    if len(PROBE_EVENTS) >= 1024:
        del PROBE_EVENTS[:512]
    PROBE_EVENTS.append(verdict)


def _clone_members(keyed: DataFrame, id_col: str, key_col: str,
                   persist: bool) -> DataFrame:
    """(id, __rep) clique tagging: __rep = min id among rows sharing
    ``key_col`` — one window shuffle keyed by the (possibly wide) clone key,
    output is 16-byte rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col)
    return _persist_small(
        keyed.withColumn("__rep", F.min(id_col).over(w)).select(id_col, "__rep"),
        persist,
    )


def _expand_clone_pairs(rep_pairs: DataFrame, members: DataFrame,
                        score_col: str, id_col: str,
                        within_value=None,
                        within_scores: DataFrame | None = None,
                        within_members: DataFrame | None = None) -> DataFrame:
    """Expand representative-level verified pairs back to member pairs with
    id-only joins — the single implementation shared by every clone-collapse
    path (MinHash / n-gram / 64-bit bands / embeddings / incremental).

    Within-clique pairs get exactly one of:
      - ``within_value`` (a Column literal): the score identical clone keys
        force under an exact metric — 1.0 for Jaccard/agreement, 0 for
        Hamming. Pass neither value nor scores to skip within pairs
        entirely (threshold unsatisfiable).
      - ``within_scores`` ((__rep, score_col) rows, already threshold
        -filtered): the computed self-score when the metric is
        floating-point (cosine) and the literal cannot be assumed
        bit-exact.
    ``within_members`` restricts which cliques emit within pairs (e.g. the
    max_df-surviving subset); defaults to all of ``members``. Cross-clique
    expansion always uses the full membership. Callers must guarantee ids
    are UNIQUE in ``members`` — duplicate id rows would multiply expanded
    pairs."""
    ma = members.select(F.col("__rep").alias("id_a"), F.col(id_col).alias("__ma"))
    mb = members.select(F.col("__rep").alias("id_b"), F.col(id_col).alias("__mb"))
    cross = (
        rep_pairs.join(ma, on="id_a").join(mb, on="id_b")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            score_col,
        )
    )
    if within_value is None and within_scores is None:
        return cross
    wm = within_members if within_members is not None else members
    m1 = wm.select(F.col("__rep").alias("__r"), F.col(id_col).alias("id_a"))
    m2 = wm.select(F.col("__rep").alias("__r"), F.col(id_col).alias("id_b"))
    base = m1.join(m2, on="__r").where(F.col("id_a") < F.col("id_b"))
    if within_scores is not None:
        within = (
            base.join(within_scores.withColumnRenamed("__rep", "__r"), on="__r")
            .select("id_a", "id_b", score_col)
        )
    else:
        within = base.select("id_a", "id_b", within_value.alias(score_col))
    return cross.unionByName(within)


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
    collapse_identical: bool | str = True,
) -> DataFrame:
    """Exact n-gram-set Jaccard via an inverted-index candidate join.

    Any pair with jaccard > 0 shares >= 1 gram, so candidates from a
    gram-equijoin are exhaustive for threshold > 0 — no all-pairs block
    (O(n²) per block dies at scale; the index join's cost is Σ df(gram)²,
    bounded by ``max_df``). Setting max_df drops grams appearing in more
    docs than the cap from CANDIDATE GENERATION only (the Jaccard itself is
    exact over full gram sets) — pairs linked solely by ultra-common grams
    are below any useful threshold anyway. Empty documents never pair.

    ``collapse_identical`` (default ``True`` = adaptive: one HLL probe
    bypasses the whole collapse on clone-light corpora, ``"force"`` always
    collapses, ``False`` never — see ``_should_collapse``) merges documents
    with identical gram LISTS into one representative before the index join
    and verify —
    the same exact-clone guard as minhash_lsh_pairs: clone clusters
    (mirrors, reprints) otherwise cost |clique|^2 inverted-index candidates
    and gram-array verifies. Identical lists imply identical sets, so
    within-clique Jaccard is exactly 1.0 and cross-clique pairs inherit the
    representative value. ``max_df`` keeps its MEMBER-level doc-frequency
    semantics under collapsing: each representative gram row carries its
    clique size into the frequency sum, and a clique whose every gram is
    pruned emits no within pairs (exactly as its members would never
    become candidates in the direct path) — so the output is bit-identical
    either way and the hash-checked oracle holds for both settings.
    Gram-less docs never enter the clique frame, so they still never pair.
    NOTE: the default adaptive gate runs one small Spark job (the clone-
    mass probe) at operator-CONSTRUCTION time, making this builder eager;
    pass ``collapse_identical="force"``/``False`` where plan construction
    must stay lazy.

    The gram frame feeds the inverted index (twice via the self-join) and
    both exact-verify re-joins — persisted so tokenization runs once
    (_persist_small)."""
    g = _persist_small(_gram_frame(docs, content_col, id_col, n), persist)
    if not _should_collapse(collapse_identical, g, F.xxhash64(F.col("grams"))):
        return _gram_index_verify(g, threshold, max_df, id_col)
    # clique key = sha2 of the JSON-serialized gram list (injective
    # serialization; 256-bit equality is the same identity standard
    # exact_dedup applies to content) — the clique window then shuffles
    # 40-byte (id, key) rows instead of whole gram arrays, which measurably
    # halved the collapse overhead on clone-light corpora
    keyed = g.select(
        id_col, F.sha2(F.to_json(F.col("grams")), 256).alias("__k")
    )
    members = _clone_members(keyed, id_col, "__k", persist)
    rep_ids = members.where(F.col(id_col) == F.col("__rep")).select(id_col)
    rep_g = g.join(rep_ids, on=id_col, how="left_semi")
    df_weights = None
    if max_df is not None:
        df_weights = members.groupBy("__rep").agg(F.count("*").alias("__w")) \
            .withColumnRenamed("__rep", id_col)
    rep_pairs, e_kept = _gram_index_verify(rep_g, threshold, max_df, id_col,
                                           df_weights=df_weights,
                                           return_kept=True)
    within_members = members
    if max_df is not None:
        # a clique whose grams are ALL pruned never pairs in the direct
        # path — gate its within-expansion on having >= 1 surviving gram.
        # Only MULTI-member cliques have within pairs at all, so the gate
        # filters e_kept down to those reps BEFORE the distinct (clone
        # -light corpora: near-empty filter, no corpus-wide aggregation)
        multi_ids = df_weights.where(F.col("__w") > 1).select(id_col)
        surviving = (
            e_kept.join(multi_ids, on=id_col, how="left_semi")
            .select(F.col(id_col).alias("__rep")).distinct()
        )
        within_members = members.join(surviving, on="__rep", how="left_semi")
    return _expand_clone_pairs(
        rep_pairs, members, "jaccard", id_col,
        within_value=None if threshold > 1.0 else F.lit(1.0),
        within_members=within_members,
    )


def _gram_index_verify(g: DataFrame, threshold: float, max_df: int | None,
                       id_col: str, df_weights: DataFrame | None = None,
                       return_kept: bool = False):
    """Inverted-index candidates + exact Jaccard verify over a gram frame.
    Candidate generation joins on xxhash64(gram), not the (long) gram
    string — 8-byte shuffle keys; the exact Jaccard re-rank uses the real
    gram sets so a hash collision can only add a candidate, never a
    result. ``df_weights`` ((id, __w) rows) makes the max_df frequency sum
    count each row as __w documents (clique sizes under clone collapse);
    ``return_kept`` also returns the kept (id) occurrence frame (one row
    per surviving (gram, doc) occurrence — id column only)."""
    e = g.select(
        id_col, F.explode(F.transform("grams", lambda s: F.xxhash64(s))).alias("gram")
    )
    if max_df is not None:
        # Count FIRST, collect SECOND (2 occurrence exchanges, per-key
        # state bounded by max_df). The round-13 single-aggregate fold
        # collected every gram's FULL id list before the max_df filter, so
        # one over-cap hot gram (a stop-gram shingle with df ~ corpus
        # size) built an unbounded aggregation buffer in one task —
        # exactly the skewed-hot-key case max_df exists to defend against.
        # Now a map-side-combinable count derives the OVER-CAP gram set —
        # provably small: <= total_occurrences / max_df keys, 8 bytes each
        # — an anti-join drops those occurrences (AQE broadcasts the tiny
        # over set; its shuffle fallback shares the groupBy(gram)
        # partitioning), and only then does the collect-carrying aggregate
        # run, over under-cap grams only. Still 1 exchange fewer than the
        # pre-r13 count + semi-join + self-join chain, and kept grams
        # expand to exactly the old candidate set: ids per gram are unique
        # up to xxhash64 collisions, the sorted strictly-after expansion
        # emits each unordered pair once, and the id_a < id_b guard plus
        # the same pair distinct absorb collision duplicates, so `cands`
        # is set-identical to the self-join form (oracle-pinned).
        if df_weights is not None:
            # member-weighted df = rep count + Σ (clique_size - 1) over
            # MULTI-member cliques only, folded INTO the count pass: a
            # left join with the tiny multi-clique weight table (bounded
            # by #reps with clones — AQE broadcasts it, with a shuffle
            # fallback for clone-saturated corpora) rides the same
            # occurrence stream the count aggregates, so the weighted df
            # costs no second pass over e (the r13 form ran a separate
            # inner-join + aggregate + count⋈corr join; Σ coalesce(w-1,0)
            # over a left join is the same sum by linearity).
            multi = df_weights.where(F.col("__w") > 1)
            cnt = (
                e.join(multi, on=id_col, how="left")
                .groupBy("gram").agg(
                    (F.count("*")
                     + F.sum(F.coalesce(F.col("__w") - 1, F.lit(0))))
                    .alias("__df"))
            )
        else:
            cnt = e.groupBy("gram").agg(F.count("*").alias("__df"))
        over = cnt.where(F.col("__df") > max_df).select("gram")
        kept = (
            e.join(over, on="gram", how="left_anti")
            .groupBy("gram").agg(F.collect_list(id_col).alias("__ids"))
        )
        # C(df,2) ordered-pair expansion via two generator nodes (no
        # interpreted lambda): posexplode anchors id_a, slice takes the
        # strictly-after suffix of the sorted id list
        cands = (
            kept.select(F.array_sort("__ids").alias("__s"))
            .select("__s", F.posexplode("__s").alias("__i", "id_a"))
            .select("id_a", F.explode(
                F.slice("__s", F.col("__i") + F.lit(2),
                        F.size("__s") - F.col("__i") - F.lit(1))).alias("id_b"))
            .where(F.col("id_a") < F.col("id_b"))
            .distinct()
        )
        e = kept.select(F.explode("__ids").alias(id_col))
    else:
        a = e.select(F.col(id_col).alias("id_a"), "gram")
        b = e.select(F.col(id_col).alias("id_b"), "gram")
        cands = a.join(b, on="gram").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
        e = e.select(id_col)
    ga = g.select(F.col(id_col).alias("id_a"), F.col("grams").alias("ga"))
    gb = g.select(F.col(id_col).alias("id_b"), F.col("grams").alias("gb"))
    pairs = cands.join(ga, on="id_a").join(gb, on="id_b")
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = (F.size("ga") + F.size("gb")).cast("double") - inter
    jac = inter / union
    out = (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return (out, e) if return_kept else out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    ``min_shared`` distinct word n-grams with ANY benchmark document — the
    standard pre-training hygiene pass (n-gram overlap against eval sets).

    Scale shape: the benchmark gram-hash set is tiny next to the corpus, so
    it BROADCASTS; corpus grams stream through the hash join in place (no
    corpus shuffle, no self-join). Joining on xxhash64(gram) keeps the
    broadcast at 8 bytes/gram; a collision can only overcount shared grams
    for a doc, never miss contamination.

    Returns (id, shared_grams, contaminated) for every input doc (docs
    shorter than n words have no n-gram identity: shared_grams = 0).
    """
    bench = (
        _gram_frame(benchmark, content_col, id_col, n)
        .select(F.explode("grams").alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    corpus = (
        _gram_frame(docs, content_col, id_col, n)
        .select(id_col, F.explode("grams").alias("g"))
        .select(id_col, F.xxhash64("g").alias("gh"))
    )
    hits = (
        corpus.join(F.broadcast(bench), on="gh")
        .groupBy(id_col)
        .agg(F.count_distinct("gh").alias("shared_grams"))
    )
    shared = F.coalesce(F.col("shared_grams"), F.lit(0))
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            shared.cast("long").alias("shared_grams"),
            (shared >= min_shared).alias("contaminated"),
        )
    )


def minhash_xor_constant(i: int) -> int:
    """Deterministic pseudo-random odd 64-bit constant for the i-th minhash
    'permutation' (splitmix64-style multiply-add, as a signed two's-complement
    value) — module-level so oracle SQL builders emit the same constants."""
    x = (i * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) % (1 << 64)
    return x - (1 << 64) if x >= (1 << 63) else x


def minhash_signature(docs: DataFrame, content_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, shingle_n: int = 3,
                      hash_fn=None) -> DataFrame:
    """MinHash signatures: word-shingle sets hashed by num_hashes seeded
    xxhash64 'permutations'; signature[i] = min hash under seed i.

    Shape: explode shingles once, hash each shingle ONCE (xxhash64), then
    derive the i-th 'permutation' as h XOR c_i (fixed splitmix64-style odd
    constants) — 64 vectorized min() aggregates in a single groupBy. This
    is ~64× fewer string hashes than hashing per (shingle, seed), and XOR
    avoids multiply-overflow errors under ANSI sessions. (A nested
    transform-over-transform formulation recomputes the tokenizer per
    element and is ~20× slower again.)"""

    hash_fn = hash_fn or F.xxhash64
    g = _gram_frame(docs, content_col, id_col, shingle_n)
    # NARROW MAP, no shuffle: grams are hashed JVM-side (oracle-parity
    # xxhash64/md5), then the 64 XOR-min folds run per Arrow batch in numpy.
    # The previous explode + 64-min-aggregate groupBy shuffled every gram
    # hash AND generated an aggregate method big enough that janino-compiled
    # code ran interpreted — re-JITed per bench query, it dominated the
    # dedup family's CPU bill (measured ~7s of the 9s incremental cold run
    # in signatures alone at sf0.1). Signed-int64 XOR and min are
    # bit-identical between numpy and the JVM expressions, so every
    # hash-checked oracle is unaffected.
    hashed = g.select(
        id_col, F.transform("grams", lambda s: hash_fn(s)).alias("__hs")
    )
    return hashed.select(
        id_col, _minhash_fold_udf(num_hashes)(F.col("__hs")).alias("signature")
    )


def _minhash_fold_udf(num_hashes: int):
    """signature[i] = min over the doc's gram hashes of (h XOR c_i) — one
    (n_grams x num_hashes) numpy broadcast per doc, Arrow-batched."""
    import numpy as np

    consts = np.array(
        [minhash_xor_constant(i) for i in range(num_hashes)], dtype=np.int64
    )

    @F.pandas_udf("array<bigint>")
    def fold(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            a = np.asarray(h, dtype=np.int64)
            out.append((a[:, None] ^ consts[None, :]).min(0))
        return pd.Series(out)

    return fold


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    content_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
    persist: bool = True,
    max_bucket: int | None = None,
    collapse_identical: bool | str = True,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidates, verified on the signature.

    ``collapse_identical`` (default ``True`` = adaptive probe / ``"force"``
    / ``False`` — see ``_should_collapse``) first merges documents with
    BIT-IDENTICAL signatures into one representative node, runs the banded
    candidate/verify machinery on representatives only, then expands
    verdicts back to member pairs with id-only joins. NOTE: the default
    adaptive gate runs one small Spark job (the clone-mass probe) at
    operator-CONSTRUCTION time, making this builder eager; pass
    ``collapse_identical="force"``/``False`` where plan construction must
    stay lazy. Exact clone clusters
    (mirrors, boilerplate reprints, replicated shards) otherwise cost
    |clique|^2 VERIFY work with two 64-long arrays per pair — measured 2x
    end-to-end on a 100x-replicated corpus — while the collapsed form pays
    the quadratic only in 24-byte output rows, which the answer itself
    requires. Within-clique pairs get est_jaccard = 1.0 exactly (identical
    signatures agree on every component), cross-clique pairs inherit their
    representatives' estimate: the emitted pair set and every value are
    bit-identical to the uncollapsed form, so the hash-checked oracles hold
    for both settings.

    ``max_bucket`` (opt-in) skips band buckets holding more than that many
    documents before the self-join — the hot-bucket guard the simhash path
    has. A bucket of B docs costs B^2/2 candidate rows; on a corpus with a
    boilerplate near-clone cluster of 10^4 copies one bucket alone is 5e7
    pairs PER BAND. Skipped-bucket members still pair through their other
    bands (any-band collision), so only pathological clone-clusters lose
    recall — the same trade as simhash_pairs' cap. Default None preserves
    exact all-pairs semantics (the hash-checked oracles). With collapsing
    on, bucket sizes count REPRESENTATIVES (distinct signatures), so exact
    clone mass no longer trips the cap.

    rows-per-band r = num_hashes/bands; two docs collide in a band iff that
    band of the signature matches exactly; candidates are then scored by
    signature agreement (estimate of Jaccard) and filtered by threshold.

    ``hash_fn`` swaps the string hash (default xxhash64); with a non-default
    hash the band key hashes the comma-joined band slice (a canonical string
    any engine can form) instead of xxhash64's native array input.

    The signature frame feeds four plan references (both self-join sides,
    both verify re-joins) — it is persisted so the corpus is scanned and
    shingle-hashed once, not four times (see _persist_small)."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    sigs = _persist_small(
        minhash_signature(docs, content_col, id_col, num_hashes, shingle_n, hash_fn), persist
    )
    if _should_collapse(collapse_identical, sigs, F.xxhash64(F.col("signature"))):
        return _collapsed_lsh_pairs(
            sigs, num_hashes, bands, threshold, id_col, hash_fn, persist, max_bucket
        )
    banded = minhash_band_keys(sigs, num_hashes, bands, id_col, hash_fn)
    return _banded_verify(sigs, banded, num_hashes, threshold, id_col, max_bucket)


def _banded_verify(sigs: DataFrame, banded: DataFrame, num_hashes: int,
                   threshold: float, id_col: str,
                   max_bucket: int | None) -> DataFrame:
    """Candidate generation + signature verify shared by the direct and
    collapsed MinHash paths: dedup candidates on bare id pairs (8B keys),
    then re-join the signatures — dragging the 64-long signature arrays
    through the distinct shuffle costs ~64x the row width for nothing."""
    if max_bucket is not None:
        bucket_sizes = banded.groupBy("band", "bh").agg(F.count("*").alias("__n"))
        banded = banded.join(
            bucket_sizes.where(F.col("__n") <= max_bucket).select("band", "bh"),
            on=["band", "bh"], how="left_semi",
        )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    cands = (
        a.join(b, on=["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sa"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sb"))
    pairs = cands.join(sa, on="id_a").join(sb, on="id_b")
    # Arrow-batched agreement count: the zip_with+filter expression form is
    # CodegenFallback — 64 x 2 interpreted lambda steps PER PAIR dominated
    # the verify stage once replication made candidates clique-quadratic
    # (measured 100x sweep: ~200s of the 250s total). The estimate is an
    # exact integer count / num_hashes on both forms, so values (and every
    # hash-checked oracle) are bit-identical.
    return (
        pairs.withColumn("est_jaccard", _sig_agreement_udf(num_hashes)(F.col("sa"), F.col("sb")))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def _collapsed_lsh_pairs(sigs: DataFrame, num_hashes: int, bands: int,
                         threshold: float, id_col: str, hash_fn,
                         persist: bool, max_bucket: int | None) -> DataFrame:
    """Exact-clone collapse for the MinHash pipeline: one representative per
    distinct signature runs the banded candidate/verify machinery; member
    pairs are re-expanded with id-only joins. Output is bit-identical to the
    direct path (see minhash_lsh_pairs docstring) while clone cliques cost
    |clique|^2 only in 24-byte output rows, not signature-array verifies.

    Shape: one window shuffle keyed by the signature (clique tagging), one
    id semi-join to pull representative signatures, then the standard
    pipeline over the DEDUPLICATED signature frame."""
    members = _clone_members(sigs, id_col, "signature", persist)
    rep_ids = members.where(F.col(id_col) == F.col("__rep")).select(id_col)
    rep_sigs = sigs.join(rep_ids, on=id_col, how="left_semi")
    banded = minhash_band_keys(rep_sigs, num_hashes, bands, id_col, hash_fn)
    rep_pairs = _banded_verify(rep_sigs, banded, num_hashes, threshold,
                               id_col, max_bucket)
    return _expand_clone_pairs(
        rep_pairs, members, "est_jaccard", id_col,
        within_value=None if threshold > 1.0 else F.lit(1.0),
    )


def minhash_band_keys(sigs: DataFrame, num_hashes: int, bands: int,
                      id_col: str = "doc_id", hash_fn=None) -> DataFrame:
    """Banded LSH keys (id, band, bh) derived from a signature frame.

    The signature frame IS the persistable dedup index: band keys are a
    cheap narrow projection (bands slices + hashes per row, no shuffle), so
    an incremental pipeline saves only (id, signature) parquet and re-derives
    band keys at join time instead of storing them x bands wide."""
    r = num_hashes // bands

    def _band_hash(sl):
        if hash_fn is None:
            return F.xxhash64(sl)
        return hash_fn(F.array_join(F.transform(sl, lambda x: x.cast("string")), ","))

    return sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), _band_hash(F.slice("signature", b * r + 1, r)).alias("bh")
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")


def incremental_dedup_minhash(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    content_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
    persist: bool = True,
    collapse_identical: bool | str = True,
    new_sigs: DataFrame | None = None,
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus MinHash index plus
    itself — the production incremental shape: the corpus is never re-read
    or re-shingled, only its saved (id, signature) frame joins in.

    Per new doc the verdict is deterministic and one row wide:
      - ``dup_kind='corpus'`` if any corpus signature agrees >= threshold;
        ``dup_of`` = the best-matching corpus id (highest est_jaccard, ties
        to the lowest id), ``est_jaccard`` = that match's estimate.
      - else ``dup_kind='batch'`` if any SMALLER-id batch doc agrees >=
        threshold (keep-first within the batch, regardless of whether the
        smaller doc itself got dropped against the corpus — the standard
        one-pass LSH rule, documented rather than chasing transitive
        chains); ``dup_of`` = the smallest such id.
      - else keep: ``keep=true``, kind/dup_of/est NULL. Docs too short to
        shingle (< shingle_n words) have no signature and always keep.

    ``collapse_identical`` (default ``True`` = adaptive probe over the
    UNION of both sides' signatures / ``"force"`` / ``False`` — see
    ``_should_collapse``) applies the exact-clone guard on
    BOTH sides: identical signatures run candidates/verify once per clique
    representative and verdicts broadcast to members through id-only
    joins. Verdicts stay bit-identical because a representative is its
    clique's MINIMUM id: the corpus best (max est, ties to lowest id)
    always lands on a representative, and the smallest matching smaller
    batch id is either the member's own clique rep or a partner clique's
    rep below it — both rep-level facts. NOTE: the default adaptive gate
    runs one small Spark job (the clone-mass probe) at operator-
    CONSTRUCTION time, making this builder eager; pass
    ``collapse_identical="force"``/``False`` where plan construction must
    stay lazy. Clone-heavy streams (replays,
    mirrored feeds) otherwise pay |clique|^2 signature verifies.

    Scale shape: batch signatures are computed once and persisted (the
    batch is the small side — typically << corpus); both candidate joins
    key on 8-byte (band, bh) pairs with bare ids, signatures re-join only
    on verified candidates. The corpus frame feeds several plan references
    (clique window / band keys / verify re-join), so it is persisted too —
    one scan of the signature parquet, and a caller that passes freshly
    COMPUTED signatures is not re-shingled per reference."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    # ``new_sigs`` lets a caller that already computed the batch signatures
    # (e.g. the streaming sink, which also appends them to its index) pass
    # them in — otherwise the tokenize + shingle + fold pass would run
    # twice per micro-batch
    new_sigs = _persist_small(
        new_sigs if new_sigs is not None else
        minhash_signature(new_docs, content_col, id_col, num_hashes, shingle_n, hash_fn),
        persist,
    )
    corpus_sigs = _persist_small(corpus_sigs, persist)
    agree = _sig_agreement_udf(num_hashes)

    def _verify(cands: DataFrame, self_sigs: DataFrame, other_sigs: DataFrame,
                other_id: str) -> DataFrame:
        nsig = self_sigs.select(F.col(id_col).alias("__nid"),
                                F.col("signature").alias("__nsig"))
        osig = other_sigs.select(
            F.col(id_col).alias(other_id), F.col("signature").alias("__osig")
        )
        return (
            cands.join(nsig, on="__nid").join(osig, on=other_id)
            .withColumn("est_jaccard", agree(F.col("__nsig"), F.col("__osig")))
            .where(F.col("est_jaccard") >= threshold)
        )

    def _corpus_best(nsigs: DataFrame, csigs: DataFrame,
                     nb_: DataFrame) -> DataFrame:
        # (__nid, __corpus_of, __corpus_est): best corpus match per new doc
        cb_ = minhash_band_keys(csigs, num_hashes, bands, id_col, hash_fn)
        cand_c = (
            nb_.select(F.col(id_col).alias("__nid"), "band", "bh")
            .join(cb_.select(F.col(id_col).alias("__cid"), "band", "bh"),
                  on=["band", "bh"])
            .select("__nid", "__cid").distinct()
        )
        w = Window.partitionBy("__nid").orderBy(F.desc("est_jaccard"), F.asc("__cid"))
        return (
            _verify(cand_c, nsigs, csigs, "__cid")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("__nid", F.col("__cid").alias("__corpus_of"),
                    F.col("est_jaccard").alias("__corpus_est"))
        )

    def _batch_smaller_pairs(nsigs: DataFrame, nb_: DataFrame) -> DataFrame:
        # verified (__nid, __bid) with __bid < __nid — shares the batch-side
        # band frame with _corpus_best (derived once per branch below)
        cand_b = (
            nb_.select(F.col(id_col).alias("__bid"), "band", "bh")
            .join(nb_.select(F.col(id_col).alias("__nid"), "band", "bh"),
                  on=["band", "bh"])
            .where(F.col("__bid") < F.col("__nid"))
            .select("__nid", "__bid").distinct()
        )
        return _verify(cand_b, nsigs, nsigs, "__bid").select("__nid", "__bid")

    # clone probe over BOTH sides at once: within-corpus, within-batch and
    # cross-side exact dups all shrink under collapse, and any of them pulls
    # estimated distinct below the union row count
    union_keys = corpus_sigs.select(
        F.xxhash64(F.col("signature")).alias("__k")
    ).unionByName(new_sigs.select(F.xxhash64(F.col("signature")).alias("__k")))
    if _should_collapse(collapse_identical, union_keys, F.col("__k")):
        cm = _clone_members(corpus_sigs, id_col, "signature", persist)
        bm = _clone_members(new_sigs, id_col, "signature", persist)
        c_reps = corpus_sigs.join(
            cm.where(F.col(id_col) == F.col("__rep")).select(id_col),
            on=id_col, how="left_semi")
        b_reps = new_sigs.join(
            bm.where(F.col(id_col) == F.col("__rep")).select(id_col),
            on=id_col, how="left_semi")
        # corpus best lands on corpus reps (max est ties break to the clique
        # minimum = the rep); every batch clique member inherits its rep's
        rep_nb = minhash_band_keys(b_reps, num_hashes, bands, id_col, hash_fn)
        best_c = (
            bm.join(_corpus_best(b_reps, c_reps, rep_nb)
                    .withColumnRenamed("__nid", "__rep"), on="__rep", how="inner")
            .select(F.col(id_col).alias("__nid"), "__corpus_of", "__corpus_est")
        )
        # batch keep-first via rep-level pairs: for member b of clique R,
        # matching smaller ids are exactly {partner reps < b} plus R itself
        # when b is not the rep (a partner clique with rep > b has ALL
        # members > b, since the rep is that clique's minimum)
        pr = _batch_smaller_pairs(b_reps, rep_nb)
        partners = (
            pr.select(F.col("__nid").alias("__rep"), F.col("__bid").alias("__p"))
            .unionByName(
                pr.select(F.col("__bid").alias("__rep"), F.col("__nid").alias("__p")))
        )
        pm = (
            bm.join(partners, on="__rep")
            .where(F.col("__p") < F.col(id_col))
            .groupBy(id_col).agg(F.min("__p").alias("__pmin"))
            .withColumnRenamed(id_col, "__nid")
        )
        own = (
            bm.where(F.col(id_col) != F.col("__rep"))
            .select(F.col(id_col).alias("__nid"), F.col("__rep").alias("__own"))
        )
        best_b = (
            own.join(pm, on="__nid", how="full")
            .select("__nid", F.least("__own", "__pmin").alias("__batch_of"))
            .where(F.col("__batch_of").isNotNull())
        )
    else:
        nb = minhash_band_keys(new_sigs, num_hashes, bands, id_col, hash_fn)
        best_c = _corpus_best(new_sigs, corpus_sigs, nb)
        best_b = (
            _batch_smaller_pairs(new_sigs, nb)
            .groupBy("__nid")
            .agg(F.min("__bid").alias("__batch_of"))
        )
    out = (
        new_docs.select(F.col(id_col).alias("__nid"))
        .join(best_c, on="__nid", how="left")
        .join(best_b, on="__nid", how="left")
    )
    kind = (
        F.when(F.col("__corpus_of").isNotNull(), F.lit("corpus"))
        .when(F.col("__batch_of").isNotNull(), F.lit("batch"))
    )
    return out.select(
        F.col("__nid").alias(id_col),
        kind.isNull().alias("keep"),
        kind.alias("dup_kind"),
        F.when(F.col("__corpus_of").isNotNull(), F.col("__corpus_of"))
        .otherwise(F.col("__batch_of")).alias("dup_of"),
        F.when(F.col("__corpus_of").isNotNull(), F.col("__corpus_est"))
        .alias("est_jaccard"),
    )


def _sig_agreement_udf(num_hashes: int):
    """est-Jaccard = (# equal signature components) / num_hashes, one numpy
    comparison per Arrow batch. Integer count -> bit-identical to the
    zip_with/filter expression fold it replaces."""

    @F.pandas_udf("double")
    def agree(sa: pd.Series, sb: pd.Series) -> pd.Series:
        import numpy as np

        if len(sa) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack([np.asarray(x, dtype=np.int64) for x in sa.to_numpy()])
        B = np.vstack([np.asarray(x, dtype=np.int64) for x in sb.to_numpy()])
        return pd.Series((A == B).sum(1) / float(num_hashes))

    return agree


def simhash(docs: DataFrame, content_col: str = "text", id_col: str = "doc_id",
            hash_fn=None) -> DataFrame:
    """64-bit SimHash over words: bit b of the hash is the sign of the sum
    over tokens of (+1 if bit b of xxhash64(token) else -1)."""
    hash_fn = hash_fn or F.xxhash64
    # NARROW MAP, no shuffle — same rationale as minhash_signature: tokens
    # hash JVM-side (oracle parity), the 64 sign-sums fold per Arrow batch
    # in numpy instead of a 64-sum groupBy whose generated aggregate ran
    # interpreted and re-JITed per query. Empty docs drop exactly as the
    # explode+groupBy dropped them (no tokens -> no group).
    words = docs.select(
        id_col,
        F.regexp_extract_all(F.col(content_col), F.lit(r"\S+"), F.lit(0)).alias("__w"),
    ).where(F.size("__w") > 0)
    hashed = words.select(
        id_col, F.transform("__w", lambda w: hash_fn(w)).alias("__hs")
    )
    return hashed.select(id_col, _simhash_fold_udf()(F.col("__hs")).alias("simhash"))


def _simhash_fold_udf():
    """64-bit SimHash fold over a doc's token hashes: bit b is set when
    sum over tokens of ((h>>b & 1) * 2 - 1) is > 0 — bit-identical to the
    shiftright/shiftleft SQL expressions it replaces (arithmetic shift and
    &1 agree on the sign bit; ties (sum == 0) leave the bit clear)."""
    import numpy as np

    shifts = np.arange(64, dtype=np.int64)

    @F.pandas_udf("long")
    def fold(hs: pd.Series) -> pd.Series:
        out = []
        for h in hs:
            a = np.asarray(h, dtype=np.int64)
            bits = ((a[:, None] >> shifts[None, :]) & 1) * 2 - 1
            pos = (bits.sum(0) > 0).astype(np.uint64)
            v = int((pos << shifts.astype(np.uint64)).sum())
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.Series(out)

    return fold


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    content_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
    persist: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates collide on one of four 16-bit
    bands, verified by exact Hamming distance via bit_count(xor).

    Exhaustive for max_hamming <= 3 (pigeonhole over 4 bands); beyond that
    recall < 1 by construction. ``max_bucket`` drops band buckets holding
    more docs than the cap — a hot bucket (near-identical corpus slice)
    would otherwise cost |bucket|² at candidate generation.

    The 8-byte-per-doc simhash frame feeds multiple plan references —
    band_pairs_64 persists it so tokenize+hash runs once."""
    sh = simhash(docs, content_col, id_col, hash_fn)
    return band_pairs_64(sh, "simhash", id_col, max_hamming, max_bucket,
                         persist=persist)


def band_pairs_64(
    hashes: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    collapse_identical: bool | str = True,
    persist: bool = True,
) -> DataFrame:
    """Hamming-near pairs over any 64-bit hash column (SimHash, image dHash,
    ...): candidates collide on one of four 16-bit bands, verified by exact
    ``bit_count(xor)``. Exhaustive for max_hamming <= 3 (pigeonhole over 4
    bands). NULL hashes (e.g. malformed media rows) never pair. Shuffle is
    keyed by 4-byte band buckets over an (id, hash) frame — 16 bytes/doc —
    so the candidate stage never moves payloads, matching the SimHash scale
    shape however wide the corpus rows are.

    ``collapse_identical`` (default ``True`` = adaptive probe / ``"force"``
    / ``False`` — see ``_should_collapse``) is the exact-clone guard shared
    with the MinHash/n-gram/embedding paths, keyed here on the 8-byte hash
    itself: equal hashes run candidates/verify as one representative and
    expand back with id-only joins (NOTE: the default adaptive gate runs
    one small Spark job — the clone-mass probe — at operator-CONSTRUCTION
    time; pass ``collapse_identical="force"``/``False`` where plan
    construction must stay lazy) — within-clique Hamming is exactly 0,
    cross-clique pairs inherit the representative distance, so the output
    is bit-identical either way. With collapsing on, ``max_bucket`` counts
    distinct hash values per band bucket. Ids must be UNIQUE per row —
    callers whose hash stage can emit the same id twice (oversampling)
    must dedupe first, or expansion multiplies pairs.

    The 16-byte hash frame feeds the clique window plus 3-4 plan
    references in banding/verify — persisted so an expensive upstream hash
    stage (per-image dHash, audio fingerprints) runs once."""
    hs = _persist_small(
        hashes.where(F.col(hash_col).isNotNull()).select(id_col, hash_col),
        persist,
    )
    if _should_collapse(collapse_identical, hs, F.col(hash_col)):
        members = _clone_members(hs, id_col, hash_col, persist)
        rep_ids = members.where(F.col(id_col) == F.col("__rep")).select(id_col)
        rep_pairs = _band_pairs_direct(
            hs.join(rep_ids, on=id_col, how="left_semi"),
            hash_col, id_col, max_hamming, max_bucket,
        )
        return _expand_clone_pairs(
            rep_pairs, members, "hamming", id_col,
            within_value=None if max_hamming < 0 else F.lit(0).cast("integer"),
        )
    return _band_pairs_direct(hs, hash_col, id_col, max_hamming, max_bucket)


def simhash_class_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    content_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
    persist: bool = True,
) -> DataFrame:
    """Clone-class (LINEAR-output) form of ``simhash_pairs`` — same
    banding/verify contracts, output at clone-class granularity
    (rep_a, rep_b, n_a, n_b, hamming, n_pairs) via ``band_class_pairs_64``;
    ``expand_class_pairs`` reconstructs the exact member frame (pinned by
    test). The k^2 member expansion, not candidate generation, is what
    dominated member-pair output on clone-heavy corpora at scale."""
    sh = simhash(docs, content_col, id_col, hash_fn)
    return band_class_pairs_64(sh, "simhash", id_col, max_hamming,
                               max_bucket, persist=persist)


def band_class_pairs_64(
    hashes: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    persist: bool = True,
) -> DataFrame:
    """Clone-CLASS near-dup pairs over a 64-bit hash column — the
    LINEAR-OUTPUT form of ``band_pairs_64``. Identical hashes form a clone
    class (rep = min id, n = members); the banded candidate join and exact
    Hamming verify run over one representative per class, and the output
    stays at class granularity instead of expanding back to member pairs:

      - cross-class rows ``(rep_a, rep_b, n_a, n_b, hamming, n_pairs)``
        with ``rep_a < rep_b`` and ``n_pairs = n_a * n_b`` member pairs;
      - within-class rows ``(rep, rep, n, n, 0, n*(n-1)/2)`` for n >= 2.

    ``expand_class_pairs`` reconstructs the exact ``band_pairs_64`` member
    frame from this plus the (id, __rep) membership — pinned equivalent by
    tests — so downstream consumers that only need clique mass (canonical
    selection, dedup accounting, CC edges via the rep graph) never
    materialize the k^2 member pairs a clique of k re-encodes implies.
    That k^2 blow-up, not candidate generation, is what the occupancy
    audit showed driving the member-pair output at scale: candidates stay
    FLAT under banding while replicated clones form genuine k^2-member
    cliques. Output here is linear in classes + verified class pairs.

    Same contracts as ``band_pairs_64``'s COLLAPSE path: NULL hashes never
    pair, exhaustive for max_hamming <= 3 by pigeonhole over the four
    16-bit bands, ``max_bucket`` counts distinct hash values per band
    bucket, and the only shuffles carry 16-byte (id, hash) /
    (hash, rep, n) rows. Within-class rows are emitted UNCONDITIONALLY —
    identical-hash pairs are never subject to ``max_bucket``, exactly like
    ``_expand_clone_pairs`` on the collapse path — so when ``max_bucket``
    binds, the expansion-equivalence claim is pinned against
    ``band_pairs_64``'s collapsed path (the adaptive direct path drops
    over-cap identical-hash pairs along with their bucket; the class form
    deliberately does not)."""
    hs = _persist_small(
        hashes.where(F.col(hash_col).isNotNull()).select(id_col, hash_col),
        persist,
    )
    # map-side-combinable class build — no window: (hash) -> (rep, n)
    classes = _persist_small(
        hs.groupBy(hash_col).agg(
            F.min(id_col).alias("__rep"), F.count("*").alias("__n")),
        persist,
    )
    rep_pairs = _band_pairs_direct(
        classes.select(F.col("__rep").alias(id_col), hash_col),
        hash_col, id_col, max_hamming, max_bucket,
    )
    sa = classes.select(F.col("__rep").alias("id_a"), F.col("__n").alias("n_a"))
    sb = classes.select(F.col("__rep").alias("id_b"), F.col("__n").alias("n_b"))
    cross = (
        rep_pairs.join(sa, on="id_a").join(sb, on="id_b")
        .select(
            F.col("id_a").alias("rep_a"), F.col("id_b").alias("rep_b"),
            "n_a", "n_b", "hamming",
            (F.col("n_a") * F.col("n_b")).cast("long").alias("n_pairs"),
        )
    )
    within = classes.where(F.col("__n") >= 2).select(
        F.col("__rep").alias("rep_a"), F.col("__rep").alias("rep_b"),
        F.col("__n").alias("n_a"), F.col("__n").alias("n_b"),
        F.lit(0).cast("integer").alias("hamming"),
        F.expr("__n * (__n - 1) DIV 2").cast("long").alias("n_pairs"),
    )
    return cross.unionByName(within)


def expand_class_pairs(class_pairs: DataFrame, members: DataFrame,
                       id_col: str = "doc_id",
                       score_col: str = "hamming") -> DataFrame:
    """Member-pair EXPANSION VIEW over ``band_class_pairs_64`` output:
    given the class pairs and the (id, __rep) membership (``_clone_members``
    shape), reconstruct the exact member-level frame ``band_pairs_64``
    emits — (id_a, id_b, score) with id_a < id_b, cross-class pairs
    inheriting the class score and within-class pairs scoring 0. This is
    the equivalence proof for the linear-output form (and the escape hatch
    for a consumer that genuinely needs member pairs for one bounded
    class subset — filter ``class_pairs`` first, then expand)."""
    cross_cp = class_pairs.where(F.col("rep_a") != F.col("rep_b"))
    ma = members.select(F.col("__rep").alias("rep_a"), F.col(id_col).alias("__ma"))
    mb = members.select(F.col("__rep").alias("rep_b"), F.col(id_col).alias("__mb"))
    cross = (
        cross_cp.join(ma, on="rep_a").join(mb, on="rep_b")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            score_col,
        )
    )
    within_cp = class_pairs.where(F.col("rep_a") == F.col("rep_b")) \
        .select("rep_a", score_col)
    m1 = members.select(F.col("__rep").alias("rep_a"), F.col(id_col).alias("id_a"))
    m2 = members.select(F.col("__rep").alias("rep_a"), F.col(id_col).alias("id_b"))
    within = (
        within_cp.join(m1, on="rep_a").join(m2, on="rep_a")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score_col)
    )
    return cross.unionByName(within)


def _band_pairs_direct(
    hashes: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int,
    max_bucket: int | None,
) -> DataFrame:
    banded = hashes.select(
        id_col, hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(hash_col, b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, hash_col, "bb.band", "bb.bh")
    if max_bucket is not None:
        # Count FIRST, collect SECOND — the same bounded two-aggregate
        # shape as the jaccard candidate stage (see _gram_index_verify):
        # a map-side-combinable count per (band, bh) derives the OVER-CAP
        # bucket set (provably small: <= banded_rows / max_bucket keys),
        # an anti-join drops those rows, and only then does the
        # collect-carrying aggregate gather (id, hash) members — so no
        # aggregation buffer ever holds an over-cap bucket (a degenerate
        # band value shared by ~all hashes is exactly the skew max_bucket
        # defends against). An id appears at most once per (band, bh)
        # (one bh per band per id), so the sorted strictly-after expansion
        # emits each unordered pair once per shared bucket; cross-bucket
        # duplicates fall to the same distinct the self-join form used.
        # Per-bucket state/fan-out is bounded by max_bucket exactly as
        # the join's per-key fan-out was.
        cnt = banded.groupBy("band", "bh").agg(F.count("*").alias("__c"))
        over = cnt.where(F.col("__c") > max_bucket).select("band", "bh")
        kept = (
            banded.join(over, on=["band", "bh"], how="left_anti")
            .groupBy("band", "bh").agg(
                F.collect_list(
                    F.struct(F.col(id_col).alias("i"), F.col(hash_col).alias("h"))
                ).alias("__m"))
        )
        cands = (
            kept.select(F.array_sort("__m").alias("__s"))
            .select("__s", F.posexplode("__s").alias("__i", "a"))
            .select("a", F.explode(
                F.slice("__s", F.col("__i") + F.lit(2),
                        F.size("__s") - F.col("__i") - F.lit(1))).alias("b"))
            .select(
                F.col("a.i").alias("id_a"), F.col("b.i").alias("id_b"),
                F.col("a.h").alias("ha"), F.col("b.h").alias("hb"),
            )
            .where(F.col("id_a") < F.col("id_b"))
            .distinct()
        )
    else:
        a = banded.select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("ha"), "band", "bh")
        b = banded.select(F.col(id_col).alias("id_b"), F.col(hash_col).alias("hb"), "band", "bh")
        cands = (
            a.join(b, on=["band", "bh"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ha", "hb").distinct()
        )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cands.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    tables: int = 8,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    persist: bool = True,
    collapse_identical: bool | str = True,
) -> DataFrame:
    """Embedding near-duplicates: cosine >= threshold, candidates from K
    independent random-hyperplane LSH tables (pipeline.similarity.
    hyperplane_buckets) — a pair is a candidate if its sign patterns agree
    in ANY table. For cosine 0.95 pairs the per-plane agreement is
    1 - theta/pi ≈ 0.90, so 8 tables x 8 bits gives ~0.99 recall; exact
    cosine re-rank inside buckets keeps precision at 1.

    ``collapse_identical`` (default ``True`` = adaptive probe / ``"force"``
    / ``False`` — see ``_should_collapse``) merges bit-identical vectors into
    one representative before bucketing and verify — the exact-clone guard
    shared with the MinHash/n-gram paths (NOTE: the default adaptive gate
    runs one small Spark job — the clone-mass probe — at operator-
    CONSTRUCTION time; pass ``collapse_identical="force"``/``False`` where
    plan construction must stay lazy). Because cosine is floating-point,
    within-clique pairs do NOT assume 1.0: the representative's self-cosine
    is computed with the same kernel and threshold filter, so the output
    stays bit-identical to the direct path (identical arrays give identical
    kernel results), including zero-norm vectors whose NaN self-score drops
    their clique pairs exactly as the direct path drops them.

    Shape: corpus explodes ``tables`` (table, bucket) rows per vector (8B
    keys), candidates dedup on bare id pairs, vectors re-join only for the
    surviving pairs — the heavy arrays never ride the candidate shuffle.
    Both derived frames feed two plan references each (self-join sides /
    pair re-joins), so they are persisted like the other *_pairs operators
    — without it the bucket UDF and the source scan each run twice."""
    from opentsdb_spark.pipeline.similarity import _cosine_pairs_udf, with_hyperplane_buckets

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vecs = _persist_small(embeddings.select(F.col(id_col), v.alias("v")), persist)
    banded_src = embeddings.select(F.col(id_col), F.col(vec_col))
    members = None
    within_scores = None
    if _should_collapse(collapse_identical, vecs, F.xxhash64(F.col("v"))):
        members = _clone_members(vecs, id_col, "v", persist)
        rep_ids = members.where(F.col(id_col) == F.col("__rep")).select(id_col)
        vecs = vecs.join(rep_ids, on=id_col, how="left_semi")
        banded_src = banded_src.join(rep_ids, on=id_col, how="left_semi")
        multi = (
            members.groupBy("__rep").count().where(F.col("count") > 1)
            .select(F.col("__rep").alias(id_col))
        )
        within_scores = (
            vecs.join(multi, on=id_col, how="left_semi")
            .withColumn("cosine", _cosine_pairs_udf()(F.col("v"), F.col("v")))
            .where(F.col("cosine") >= threshold)
            .select(F.col(id_col).alias("__rep"), "cosine")
        )
    banded = _persist_small(
        with_hyperplane_buckets(
            banded_src, vec_col, tables, bits, dim, seed,
        ).select(id_col, "tb.table", "tb.bucket"),
        persist,
    )
    a = banded.select(F.col(id_col).alias("id_a"), "table", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "table", "bucket")
    cands = (
        a.join(b, on=["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    pairs = cands.join(va, on="id_a").join(vb, on="id_b")
    # vectorized cosine (similarity._cosine_pairs_udf): dim-sequential numpy,
    # bit-identical to the zip_with/aggregate fold it replaces
    out = (
        pairs.withColumn("cosine", _cosine_pairs_udf()(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    if members is None:
        return out
    return _expand_clone_pairs(out, members, "cosine", id_col,
                               within_scores=within_scores)


def substring_dup_spans(
    docs: DataFrame,
    k: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """Exact substring-duplication signal (Lee et al., arXiv:2107.06499 §4
    ExactSubstr): any >= k-token span shared verbatim across documents
    contains a shared k-token window, so hashing EVERY k-token window (all
    positions, not per-doc-distinct) and flagging windows whose hash occurs
    in >= 2 distinct documents finds exactly the spans the paper's suffix
    array finds — without the global corpus sort/concatenation the suffix
    array needs. Per doc: total windows, duplicated windows, the number of
    token positions covered by the union of duplicated spans, and that
    coverage as a fraction (the "what fraction of this doc is verbatim
    elsewhere" removal criterion).

    Scale shape: windows shrink to (xxhash64, id, pos) immediately — text
    never enters a shuffle; cross-doc discovery is distinct (hash, id)
    pairs then a partial-aggregated count per 8-byte hash (a boilerplate
    window in 1e9 docs is one combiner key, never a one-task sort); span
    coverage is the interval-union length of each doc's DUPLICATED
    [pos, pos+k-1] windows, computed as a lag-window gap sum over the
    (id, pos) dup rows — PARTITIONED by doc id, whole-stage codegen, and
    the window's (id)-hash exchange is reused by the groupBy(id) after
    it, so coverage costs one shuffle of one row per dup window
    (round-13 autopsy: the original explode-k-positions + corpus-wide
    distinct + countDistinct chain was the op's dominant stage — 31 s of
    the ~50 s 30x pipeline; the interim collect_list + HOF interval fold
    that replaced it ran interpreted CodegenFallback lambdas per array
    element and is gone too). The window frame feeds three aggregates,
    so it is persisted once.

    Returns (id, n_words, n_windows, n_dup_windows, dup_tokens, dup_frac),
    one row per input doc (docs shorter than k words score zeros)."""
    win = _persist_small(
        _gram_frame(docs, content_col, id_col, k, distinct=False)
        .select(id_col, F.posexplode("grams").alias("pos", "g"))
        .select(id_col, "pos", F.xxhash64("g").alias("__h")),
        persist,
    )
    dup_h = (
        win.select("__h", id_col).distinct()
        .groupBy("__h").agg(F.count("*").alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__h")
    )
    dup_win = win.join(dup_h, on="__h", how="left_semi")
    # Coverage = interval-union length of the [pos, pos+k-1] spans:
    # positions are distinct per doc, so sorted ascending it is k (the
    # last interval) plus min(gap, k) per consecutive pair. Computed as a
    # lag-window gap sum — the window's (id)-hash exchange is REUSED by
    # the groupBy(id) right after it (same key), so coverage costs one
    # shuffle of the (id, pos) dup rows and stays whole-stage codegen;
    # the previous collect_list + zip_with/aggregate fold ran interpreted
    # CodegenFallback lambdas per array element (~6-13% of the whole op
    # at 30-100x, growing with positions per doc).
    w = Window.partitionBy(id_col).orderBy("pos")
    contrib = F.coalesce(
        F.least(F.col("pos") - F.lag("pos").over(w), F.lit(k)), F.lit(k))
    cov = (
        dup_win.withColumn("__c", contrib)
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_windows"),
             F.sum("__c").cast("int").alias("dup_tokens"))
    )
    n_win = win.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    base = docs.select(
        id_col,
        F.size(F.regexp_extract_all(F.col(content_col), F.lit(r"\S+"), F.lit(0))).alias("n_words"),
    )
    return (
        base.join(n_win, on=id_col, how="left")
        .join(cov, on=id_col, how="left")
        .select(
            id_col,
            "n_words",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.coalesce("dup_tokens", F.lit(0))
            / F.when(F.col("n_words") > 0, F.col("n_words")),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """The ExactSubstr REMOVAL transform (Lee et al., arXiv:2107.06499 §4
    reports then cuts duplicated spans): every token position covered by a
    k-token window that appears verbatim in >= 2 distinct documents is
    struck from ALL of them, and documents are rebuilt from the surviving
    tokens. Same window discovery as ``substring_dup_spans`` (which stays
    the report/threshold side of the pair); the strike-every-copy policy
    matches ``strip_boilerplate_chunks`` — the paper's keep-one-occurrence
    variant needs a global occurrence order, which is exactly the suffix
    -array machinery this formulation exists to avoid, and for training
    -data hygiene striking both copies of cross-doc boilerplate is the
    conservative choice.

    Scale shape: windows shrink to (xxhash64, id, pos) before any shuffle;
    dup discovery is distinct + a map-side-combinable count per 8-byte
    hash; each doc's DUPLICATED window positions fold to ONE sorted int
    array and expand to covered token positions doc-locally (round-13
    autopsy: the old explode-k-positions + corpus-wide distinct shuffled
    k x dup-window rows where one row per dup window suffices — the same
    fix as substring_dup_spans' interval merge). The rebuild then strikes
    positions doc-locally (array_except on the position sequence — hash
    -set semantics, no per-token join): text enters a shuffle only as the
    docs side of the final per-doc join against those covered arrays (and
    not even there when AQE broadcasts the array side).

    Returns (id, text, n_kept_tokens, n_cut_tokens) for docs keeping >= 1
    token; fully-duplicated docs vanish (their n_cut shows in the report
    op). Docs shorter than k tokens have no window identity and pass
    through whole."""
    win = _persist_small(
        _gram_frame(docs, content_col, id_col, k, distinct=False)
        .select(id_col, F.posexplode("grams").alias("pos", "g"))
        .select(id_col, "pos", F.xxhash64("g").alias("__h")),
        persist,
    )
    dup_h = (
        win.select("__h", id_col).distinct()
        .groupBy("__h").agg(F.count("*").alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__h")
    )
    # one (id, sorted positions) row per affected doc; covered token
    # positions expand doc-locally (array_except downstream is a set
    # subtract, so flatten's overlapping-interval duplicates are harmless).
    # Persisted: the rebuild's per-doc join is the only consumer, but
    # best-of-N benches / funnel compositions re-action the whole plan.
    covered = _persist_small(
        win.join(dup_h, on="__h", how="left_semi")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("__ps"))
        .select(
            id_col,
            F.flatten(F.transform(
                "__ps", lambda p: F.sequence(p, p + (k - 1))
            )).alias("__cov"),
        ),
        persist,
    )
    return _strike_rebuild(
        docs, covered,
        F.regexp_extract_all(F.col(content_col), F.lit(r"\S+"), F.lit(0)),
        id_col, "n_kept_tokens", "n_cut_tokens", arrayed=True)


def _strike_rebuild(docs: DataFrame, covered: DataFrame, items_expr,
                    id_col: str, kept_name: str, cut_name: str,
                    arrayed: bool = False) -> DataFrame:
    """Rebuild documents WITHOUT the ``covered`` (id, __t) item positions —
    shared by the span-removal ops (items = tokens) and the boilerplate
    strike-out (items = chunks). With ``arrayed=True`` the caller already
    folded coverage to one (id, __cov int-array) row per doc (duplicates
    in __cov are fine — array_except is a set subtract).

    Covered positions fold to one int-array row per affected doc; each doc
    then strikes them locally (array_except over its position sequence —
    hash-set semantics, no per-item join), so text enters a shuffle only
    as the docs side of the per-doc join (and not even there when AQE
    broadcasts the array side). ``items_expr`` is the per-doc item array
    (positions are its 0-based indices); surviving items rejoin with a
    single space. Returns (id, text, kept_name, cut_name) for docs keeping
    >= 1 item; item-less docs vanish."""
    cov = covered if arrayed else covered.groupBy(id_col).agg(
        F.collect_list("__t").alias("__cov"))
    keep_pos = F.array_except(
        F.sequence(F.lit(0), F.size("__items") - 1),
        F.coalesce(F.col("__cov"), F.array().cast("array<int>")),
    )
    return (
        docs.select(id_col, items_expr.alias("__items"))
        .where(F.size("__items") > 0)  # item-less docs vanish (no covered
        #                                rows); also guards sequence(0, -1)
        .join(cov, on=id_col, how="left")
        .select(
            id_col,
            F.transform(
                keep_pos, lambda i: F.element_at(F.col("__items"), i + 1)
            ).alias("__kt"),
            F.size("__items").alias("__tot"),
        )
        .where(F.size("__kt") >= 1)
        .select(
            id_col,
            F.array_join("__kt", " ").alias("text"),
            F.size("__kt").alias(kept_name),
            (F.col("__tot") - F.size("__kt")).cast("int").alias(cut_name),
        )
    )


def remove_duplicate_spans_keep_first(
    docs: DataFrame,
    k: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """The Lee et al. (arXiv:2107.06499 §4) keep-ONE-occurrence ExactSubstr
    removal: a k-token window occurring >= 2 times ANYWHERE in the corpus
    (cross-doc or repeated within one doc) keeps its globally FIRST
    occurrence — lowest (doc id, position) — and every later occurrence's
    k token positions are struck; documents are rebuilt from surviving
    tokens. Contrast ``remove_duplicate_spans``: that op strikes EVERY
    copy of cross-doc-duplicated windows (the conservative hygiene
    default); this one preserves exactly one copy of the duplicated
    content, the paper's original policy.

    Scale shape: the paper's suffix array imposes a global occurrence
    order; here that order needs NO global sort — the first occurrence per
    window is a map-side-combinable min(struct(id, pos)) per 8-byte window
    hash, later occurrences fall out of one equi-join on the hash against
    the dup-window frame (so a 10^9-occurrence boilerplate window costs
    one combiner cell, never a hot row_number partition), and the rebuild
    is the shared covered-position strike (text shuffles only as the docs
    side of the per-doc join).

    Returns (id, text, n_kept_tokens, n_cut_tokens) for docs keeping >= 1
    token. Docs shorter than k tokens have no window identity and pass
    through whole."""
    win = _persist_small(
        _gram_frame(docs, content_col, id_col, k, distinct=False)
        .select(id_col, F.posexplode("grams").alias("pos", "g"))
        .select(id_col, "pos", F.xxhash64("g").alias("__h")),
        persist,
    )
    first = (
        win.groupBy("__h")
        .agg(F.min(F.struct(id_col, "pos")).alias("__first"),
             F.count("*").alias("__n"))
        .where(F.col("__n") >= 2)
        .select("__h", "__first")
    )
    struck = (
        win.join(first, on="__h")
        .where(F.struct(F.col(id_col), F.col("pos")) != F.col("__first"))
    )
    # fold each doc's struck positions to one sorted array and expand the
    # k-token intervals doc-locally — same round-13 coverage fix as
    # remove_duplicate_spans (the explode + corpus-wide distinct shuffled
    # k x struck rows for nothing; array_except downstream is a set
    # subtract, so overlapping-interval duplicates are harmless)
    covered = _persist_small(  # same repeat-action economics as the
        struck.groupBy(id_col)     # strike-every-copy sibling
        .agg(F.array_sort(F.collect_list("pos")).alias("__ps"))
        .select(
            id_col,
            F.flatten(F.transform(
                "__ps", lambda p: F.sequence(p, p + (k - 1))
            )).alias("__cov"),
        ),
        persist,
    )
    return _strike_rebuild(
        docs, covered,
        F.regexp_extract_all(F.col(content_col), F.lit(r"\S+"), F.lit(0)),
        id_col, "n_kept_tokens", "n_cut_tokens", arrayed=True)


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
    min_shared: int = 1,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter instead of the
    exact gram-hash set (``decontaminate``): every benchmark n-gram sets
    ``k_hashes`` bit positions of an ``m_bits``-bit array; a corpus gram is
    flagged when ALL its positions are set. One-sided by construction —
    false positives possible (overcounts ``shared_grams``), false
    negatives impossible — the right trade for hygiene filtering.

    The k positions are disjoint bit-slices of ONE xxhash64 (the classic
    partition-the-hash construction: with w = log2(m_bits), position i is
    bits [w*i, w*i+w) of the 64-bit hash — m_bits must be a power of two
    and k*w <= 64), so the engine computes one hash per gram and pure
    bit arithmetic after — no second hash function, no 64-bit overflow,
    and the DuckDB oracle replicates it exactly from the XXH64 SQL replica.

    100 TB shape: where exact decontamination broadcasts 8 bytes per
    DISTINCT benchmark gram, the Bloom set broadcasts at most
    ``min(k * grams, m_bits)`` DISTINCT int positions — bounded by the
    filter size (2^20 positions ~ 8 MB as a broadcast join build side)
    no matter how large the benchmark suite grows, and shrinking further
    as the array saturates. The corpus never shuffles: each gram row
    streams through ``k_hashes`` chained broadcast LEFT-SEMI probes (one
    per bit-slice; surviving ALL k = every position set) — corpus rows
    are never replicated k-ways and the only aggregate is the per-doc
    flagged-gram count (the previous posexplode form tripled the corpus
    frame and paid a (doc, gram)-keyed aggregate over the matched mass,
    which at high match rates is occurrence-sized).
    """
    # slice width follows m_bits: position i is bits [w*i, w*i+w) of the
    # hash, so m_bits MUST be a power of two (the bitmask is only uniform
    # over [0, m_bits) then) and the k slices must be disjoint within 64
    # bits (overlapping slices correlate the positions and blow the
    # advertised false-positive bound)
    if m_bits <= 1 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    w = m_bits.bit_length() - 1
    if w * k_hashes > 64:
        raise ValueError(
            f"k_hashes * log2(m_bits) = {k_hashes}*{w} bits "
            "must fit the 64-bit hash")
    mask = m_bits - 1

    def slice_pos(i: int) -> F.Column:
        return (F.shiftrightunsigned(F.col("gh"), w * i)
                .bitwiseAND(mask)).cast("long")

    # persisted: the k probes each reference this frame, and without the
    # persist the benchmark shingle/distinct subtree is planned k times
    # (bounded at <= m_bits positions ~ 8 MB, so caching it is free)
    bench_pos = _persist_small(
        _gram_frame(benchmark, content_col, id_col, n)
        .select(F.explode("grams").alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
        .select(F.explode(F.array(*[slice_pos(i) for i in range(k_hashes)]))
                .alias("pos"))
        .distinct(),
        True,
    )
    corpus = (
        _gram_frame(docs, content_col, id_col, n)
        .select(id_col, F.explode("grams").alias("g"))
        .select(id_col, F.xxhash64("g").alias("gh"))
    )
    # a gram is flagged when ALL k slice positions are set: k chained
    # broadcast LEFT-SEMI probes against the position set (AND of k
    # membership tests). Per-slice testing keeps the guarantees the old
    # posexplode + count_distinct(slice-index) form guarded: duplicate
    # (id, gh) rows from an xxhash64 string collision pass or fail all k
    # probes together (count_distinct(gh) still collapses them per doc),
    # and a gram whose k slices land on the same position just tests that
    # position k times.
    flagged = corpus
    for i in range(k_hashes):
        flagged = flagged.join(
            F.broadcast(bench_pos.withColumnRenamed("pos", "__p")),
            on=slice_pos(i) == F.col("__p"), how="left_semi")
    hits = flagged.groupBy(id_col).agg(
        F.count_distinct("gh").alias("bloom_grams"))
    shared = F.coalesce(F.col("bloom_grams"), F.lit(0))
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            shared.cast("long").alias("bloom_grams"),
            (shared >= min_shared).alias("contaminated"),
        )
    )
