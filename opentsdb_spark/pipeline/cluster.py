"""Connected-component clustering for near-duplicate groups.

The pair-generating dedup operators (pipeline.dedup: ngram_jaccard_pairs,
minhash_lsh_pairs, simhash_pairs, embedding near-dup) emit EDGES of a
similarity graph; an actual dedup decision needs the graph's connected
components plus one canonical document per component (keep the canonical,
drop the rest). Transitively: A~B and B~C puts A and C in one component
even when A and C were never compared.

At 100 TB the similarity graph has billions of edges and cannot live on the
driver, so components are computed with the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", ACM SoCC'14 — public literature): converges in O(log^2 n)
rounds, each round two groupBy shuffles keyed on node id whose reducer
state is bounded by node degree, not component size. No driver-side graph
state; the only driver traffic is one (count, checksum) scalar per round
for the convergence test. ``localCheckpoint`` truncates the plan lineage
each round — without it the iterated plan doubles per round and Catalyst
re-optimization dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 30
) -> DataFrame:
    """Component label (= min node id in the component) for every node that
    appears in ``pairs``. Returns (id, component); singleton nodes absent
    from ``pairs`` are the caller's left-join concern.

    Alternating rounds:
      large-star  every neighbor v > u links to min(N(u) ∪ {u}) — after
                  this all edges point from high id to low id
      small-star  u and its (all smaller) neighbors link to their min
    Fixpoint (edge set unchanged) is a forest of stars: every node points
    straight at its component root.
    """
    # Bidirectional init via ONE explode pass, not union(e, e.reversed):
    # a union's two branches each re-evaluate the incoming pair plan, and
    # the pair GENERATORS feeding this (inverted-index joins, band joins)
    # are the expensive part of the whole dedup funnel — measured 2x the
    # entire operator's CPU at sf0.1 before this change.
    #
    # No .distinct() upstream of a groupBy+collect_set: collect_set is
    # duplicate-insensitive, so the edge SETS per stage — hence the
    # convergence trajectory and labels — are bit-identical without them.
    # Catalyst already fuses a distinct feeding an aggregate
    # (RemoveRedundantAggregates), so most were plan-neutral; the two that
    # were REAL exchanges and are gone: the init distinct (the
    # localCheckpoint right after it forced its shuffle+aggregate over the
    # full bidirectional edge set) and the final labels∪roots distinct
    # (both sides provably disjoint + distinct). Measured 1.88x on the
    # isolated CC stage at 30x (r13), results identical.
    edges = (
        pairs.select(
            F.explode(F.array(
                F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
            )).alias("e"))
        .select("e.u", "e.v")
        .where(F.col("u") != F.col("v"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # large-star over the bidirectional edge set
        nb = edges.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        nb = nb.withColumn("m", F.least("u", F.array_min("nbrs")))
        high_to_low = (
            nb.select("u", "m", F.explode("nbrs").alias("v"))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star over high->low edges (every neighbor is < u here)
        nb2 = high_to_low.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        nb2 = nb2.withColumn("m", F.array_min("nbrs"))
        stars = (
            nb2.select("m", F.explode(F.array_union("nbrs", F.array("u"))).alias("v"))
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # Convergence = the edge set is a star forest, which needs BOTH
        # conditions: (a) no source appears twice (out-degree <= 1 — a
        # node still pointing at two candidate roots is mid-merge), and
        # (b) no target is also a source (every edge points straight at
        # a root). Rounds preserve components exactly and leave edges
        # high->low, so a star forest is min-rooted per component and a
        # fixpoint — detected IN the converging round, where the previous
        # (count, checksum)-vs-previous-round signature spent a whole
        # extra large-star/small-star round (4 shuffles + checkpoint)
        # just to observe the set unchanged. Checking (a) is NOT
        # optional: a two-star merge state like {11->1, 11->10} has no
        # target-as-source yet is not converged — stopping there emits
        # two labels for node 11 (caught by the streaming-components
        # merge test; now also pinned in test_properties).
        #
        # Both conditions fold into ONE map-side-combinable per-node
        # (src_count, tgt_count) aggregate over the checkpointed stars —
        # a violation is a node with src > 1 (two candidate roots) or
        # src >= 1 AND tgt >= 1 (an edge target that is itself a source)
        # — replacing the groupBy-count + self-semi-join + union probe
        # (3 exchanges of the star frame per round -> 1 tiny one).
        probe = (
            stars.select(F.explode(F.array(
                F.struct(F.col("u").alias("n"), F.lit(1).alias("s")),
                F.struct(F.col("v").alias("n"), F.lit(0).alias("s")),
            )).alias("e"))
            .groupBy("e.n").agg(F.sum("e.s").alias("s"), F.count("*").alias("c"))
            .where((F.col("s") > 1)
                   | ((F.col("s") >= 1) & (F.col("c") > F.col("s"))))
        )
        if probe.isEmpty():
            edges = stars
            break
        # derived lazily off the checkpointed stars — one fewer
        # materialization per round; lineage stays one hop deep (no
        # distinct: the consumer is next round's collect_set groupBy)
        edges = stars.union(stars.select("v", "u"))
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    # no final distinct: `labels` is the converged stars frame (already
    # distinct, id != component on every row), `roots` is a distinct set
    # with id == component — the two sides cannot overlap
    roots = (
        labels.select(F.col("component").alias("id")).distinct()
        .withColumn("component", F.col("id"))
    )
    return labels.unionByName(roots)


def incremental_components(
    prev_labels: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "id",
    component_col: str = "component",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Maintain connected-component labels as NEW similarity edges arrive
    — the nightly-crawl companion to ``connected_components``: dedup
    clusters over a 100 TB corpus evolve batch by batch, and recomputing
    the full CC over every historical pair each night is the thing a
    production pipeline cannot afford. Equivalent BY CONSTRUCTION to the
    full recompute on (old edges ∪ new edges): a component's star edges
    (member -> label) carry exactly its connectivity, so re-running CC on
    (star edges of TOUCHED components ∪ new pairs) relabels precisely the
    components the new edges can change, and every untouched component's
    labels pass through verbatim.

    ``prev_labels`` is a prior (id, component) frame (connected_components
    / dedup_assign_clusters output — component = min member id, and every
    member has a row, roots included). Returns the same shape covering
    prev nodes ∪ new-pair nodes; labels stay min-member-id, so a new
    low-id member relabels its (touched) component exactly as a full
    recompute would.

    100 TB shape: two id equi-joins bound the working set to the
    touched-component MASS plus the new edges (the untouched corpus is
    never shuffled into the star rounds — it contributes one anti-join
    scan); the sub-CC then inherits connected_components' degree-bounded
    large-star/small-star rounds, converging fast because the prev slice
    is already a star forest."""
    prev = prev_labels.select(F.col(id_col), F.col(component_col))
    e = new_pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u") != F.col("v")).localCheckpoint()
    new_nodes = e.select(F.col("u").alias(id_col)).union(
        e.select(F.col("v").alias(id_col))).distinct()
    touched_comps = (
        prev.join(new_nodes, on=id_col, how="left_semi")
        .select(component_col).distinct()
    )
    touched = prev.join(touched_comps, on=component_col, how="left_semi")
    star = touched.where(F.col(id_col) != F.col(component_col)).select(
        F.col(id_col).alias("u"), F.col(component_col).alias("v"))
    sub = connected_components(
        star.unionByName(e), src="u", dst="v", max_iter=max_iter
    ).select(F.col("id").alias(id_col), F.col("component").alias(component_col))
    untouched = prev.join(touched_comps, on=component_col, how="left_anti") \
        .select(id_col, component_col)
    return untouched.unionByName(sub)


def dedup_assign_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    src: str = "id_a", dst: str = "id_b",
) -> DataFrame:
    """Full-corpus cluster assignment: every document labeled with its
    near-dup component and an ``is_canonical`` keep/drop flag (canonical =
    the component's min id — deterministic, join-free tie-break). Documents
    untouched by any pair are their own singleton component."""
    cc = connected_components(pairs, src, dst).withColumnRenamed("id", id_col)
    out = docs.select(id_col).join(cc, on=id_col, how="left")
    out = out.withColumn("component", F.coalesce("component", F.col(id_col)))
    return out.select(
        id_col, "component", (F.col("component") == F.col(id_col)).alias("is_canonical")
    )


def select_canonical(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware canonical selection: instead of keep-lowest-id, keep
    the HIGHEST-scoring member of each near-dup component (ties -> lowest
    id) — the production policy when a dup cluster mixes a clean original
    with mangled copies (cf. the quality-ranked dedup in RefinedWeb,
    arXiv:2306.01116 §3).

    The winner comes from a map-side-combinable max over a packed
    (score, -id) struct — no per-component window, so a giant component
    never serializes through one task. Null scores rank below every real
    score. Returns (id, component, score, is_canonical)."""
    j = clusters.select(id_col, component_col).join(
        scores.select(id_col, score_col), on=id_col, how="left"
    )
    packed = F.struct(
        F.coalesce(F.col(score_col), F.lit(float("-inf"))).alias("s"),
        (-F.col(id_col)).alias("nid"),
    )
    best = (
        j.groupBy(component_col)
        .agg(F.max(packed).alias("b"))
        .select(component_col, (-F.col("b.nid")).alias("__best_id"))
    )
    return (
        j.join(best, on=component_col)
        .select(
            id_col, component_col, score_col,
            (F.col(id_col) == F.col("__best_id")).alias("is_canonical"),
        )
    )


def dedup_pipeline(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    max_df: int = 50,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full corpus dedup funnel in one call — the composition a real
    pipeline runs nightly: (1) exact dedup (sha2 content keys, keep min
    id), (2) n-gram Jaccard near-dup pairs over the exact survivors,
    (3) connected-component clustering, (4) quality-aware canonical
    selection per cluster. Returns one row per INPUT doc:

      (id, exact_kept, component, final_kept)

    component is the near-dup cluster of the doc's exact survivor set
    (-1 for docs dropped at the exact stage); final_kept marks the single
    surviving representative of each cluster.

    Scale shape: each stage is the already-scale-shaped operator it
    composes (32-byte exact keys, df-capped inverted-index candidates,
    large-star/small-star CC, packed-struct canonical max) — staging them
    back-to-back adds no new shuffle beyond each stage's own; the final
    assembly is two left joins on the id.
    """
    from opentsdb_spark.pipeline.dedup import exact_dedup, ngram_jaccard_pairs
    from opentsdb_spark.pipeline.text import quality_scores

    keep = exact_dedup(docs, content_col=content_col, id_col=id_col)
    surv = docs.join(keep.select(id_col), on=id_col, how="leftsemi")
    pairs = ngram_jaccard_pairs(
        surv, n=n, threshold=threshold, max_df=max_df,
        content_col=content_col, id_col=id_col)
    clusters = dedup_assign_clusters(surv, pairs, id_col=id_col)
    scores = quality_scores(surv, content_col=content_col, id_col=id_col).select(
        id_col, F.col("distinct_ratio").alias("score"))
    canon = select_canonical(clusters, scores, id_col=id_col)
    return (
        docs.select(id_col)
        .join(canon.select(id_col, "component", "is_canonical"),
              on=id_col, how="left")
        .select(
            id_col,
            F.col("component").isNotNull().alias("exact_kept"),
            F.coalesce(F.col("component"), F.lit(-1)).alias("component"),
            F.coalesce(F.col("is_canonical"), F.lit(False)).alias("final_kept"),
        )
    )
