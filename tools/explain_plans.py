"""Dump formatted physical plans for the headline queries — the evidence
that filters push down, joins broadcast, and codegen spans stay wide.

    python tools/explain_plans.py [sf_dir] [name_substring]
    python tools/explain_plans.py --check [sf_dir]

--check asserts the scale invariants and exits non-zero on violation:
  * every headline plan pushes at least one non-trivial Parquet filter
  * no unpartitioned Window (single-partition sort) anywhere
  * a persisted write_points layout gets BOTH a pushed ts range filter
    (row-group pruning) AND dt partition pruning through the planner
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan_str(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _check_pushdown(spark) -> list[str]:
    """Persisted-layout invariant: ts range reaches the scan + dt prunes."""
    from pyspark.sql import functions as F

    from opentsdb_spark.model import SubQuery
    from opentsdb_spark.plans.planner import compile_subquery
    from opentsdb_spark.sources.points import read_points, write_points

    errors: list[str] = []
    base = 1704067200_000
    rows = [("m", base + d * 86_400_000, 1.0) for d in range(3)]
    df = spark.createDataFrame(rows, "metric string, ms long, value double").select(
        "metric", F.timestamp_millis("ms").alias("ts"), "value",
        F.lit(None).cast("long").alias("value_long"),
        F.create_map(F.lit("h"), F.lit("a")).alias("tags"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "pts")
        write_points(df, path)
        pts = read_points(spark, path)
        r = compile_subquery(
            pts, SubQuery(metric="m", aggregator="none"), base, base + 86_400_000 - 1
        )
        plan = _plan_str(r.df)
        if not re.search(r"PushedFilters:.*GreaterThanOrEqual\(ts", plan):
            errors.append("persisted layout: ts lower bound NOT pushed to Parquet scan")
        if not re.search(r"PushedFilters:.*LessThanOrEqual\(ts", plan):
            errors.append("persisted layout: ts upper bound NOT pushed to Parquet scan")
        if not re.search(r"PartitionFilters: \[[^\]]*dt", plan):
            errors.append("persisted layout: dt partition pruning missing")
        r.df.count()  # materialize inside the tempdir's lifetime
    return errors


def main() -> None:
    args = [a for a in sys.argv[1:]]
    check = "--check" in args
    args = [a for a in args if a != "--check"]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = args[1] if len(args) > 1 else ""

    from bench import HEADLINE
    from opentsdb_spark import catalog
    from opentsdb_spark.session import get_spark

    spark = get_spark("explain-plans")
    fns = {"flagship": catalog.flagship}
    fns.update({n: qd.fn for n, qd in catalog.CATALOG.items()})

    errors: list[str] = []
    for name in HEADLINE:
        if only and only not in name:
            continue
        df = fns[name](spark, sf_dir)
        plan = _plan_str(df)
        tree = plan.split("\n\n")[0]
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        real_pushed = [p for p in pushed if p.strip() and p.strip() != "IsNotNull(ts)"]
        n_exch = tree.count("Exchange") - tree.count("BroadcastExchange")
        n_bc = tree.count("BroadcastExchange")
        if check:
            # doc-pipeline ops scan the whole corpus by design — only
            # filtering queries must reach the Parquet scan
            filtering = name.split("_")[0] in (
                "flagship", "tsdb", "gexp", "exp", "rollup", "hist"
            ) or name == "flagship"
            if filtering and not real_pushed:
                errors.append(f"{name}: no non-trivial PushedFilters")
            # unpartitioned window = single-partition sort at scale.
            # Exemption: sample_shard_assign's cross-bucket offset cumsum
            # runs over the ALREADY-AGGREGATED per-bucket frame (exactly
            # n_buckets rows by construction, docs never enter it) — a
            # bounded single-task window is the intended plan there; the
            # doc-level windows stay bucket-partitioned (pinned by
            # tests/test_plan_evidence.py).
            bounded_window_ok = name in ("sample_shard_assign",
                                         "sample_global_shuffle")
            if (not bounded_window_ok
                    and re.search(r"Arguments:.*\[\], \[[^\]]*ASC", plan)
                    and "Window" in plan):
                errors.append(f"{name}: unpartitioned Window (single-partition sort)")
            print(f"check {name}: pushed={len(real_pushed)} shuffles={n_exch} broadcasts={n_bc}")
        else:
            print(f"===== {name} =====")
            print(tree)
            for p in pushed:
                if p.strip():
                    print(f"  PushedFilters: {p}")
            print(f"  shuffles={n_exch} broadcasts={n_bc}")
            print()

    if check and not only:
        # narrow-map invariant: deterministic sampling/scrub/split/gate ops
        # must be shuffle-free over the raw table scan (the catalog wraps
        # them in _docs(), whose small-file repartition exists only to
        # parallelize the sf test data — at corpus scale the input arrives
        # already split across thousands of files)
        from pyspark.sql import functions as F

        from opentsdb_spark.pipeline.sampling import hash_split, stratified_sample
        from opentsdb_spark.pipeline.text import boilerplate_flags, pii_scrub
        from opentsdb_spark.sources.points import load_table

        raw_docs = load_table(spark, sf_dir, "documents")
        raw_emb = load_table(spark, sf_dir, "embeddings")
        from opentsdb_spark.pipeline.text import chunk_docs, gopher_filter

        narrow_ops = {
            "gopher_filter": gopher_filter(raw_docs),
            "chunk_docs": chunk_docs(raw_docs),
            "hash_split": hash_split(raw_docs, {"train": 0.9, "val": 0.1}),
            "stratified_sample": stratified_sample(
                raw_emb, {0: 0.5}, strata_col="label", id_col="vec_id"
            ),
            "pii_scrub": pii_scrub(raw_docs),
            "boilerplate_flags": boilerplate_flags(raw_docs),
        }
        for name, df in narrow_ops.items():
            tree = _plan_str(df).split("\n\n")[0]
            n = tree.count("Exchange") - tree.count("BroadcastExchange")
            print(f"check {name}: shuffles={n} (narrow-map op)")
            if n > 0:
                errors.append(f"{name}: {n} shuffles in a narrow-map operator")

        # temperature mixture: the per-source rate table must come back as a
        # BroadcastExchange and the corpus side must not shuffle (the only
        # non-broadcast Exchange allowed is the tiny count aggregate)
        from opentsdb_spark.pipeline.sampling import pack_sequences, temperature_mixture

        tplan = _plan_str(temperature_mixture(raw_docs))
        t_bc = "BroadcastExchange" in tplan or "BroadcastHashJoin" in tplan
        t_smj = "SortMergeJoin" in tplan
        print(f"check temperature_mixture: broadcast={t_bc} sortmerge={t_smj}")
        if not t_bc or t_smj:
            errors.append("temperature_mixture: rate join is not broadcast")

        # sequence packing: the cumulative-sum window must be PARTITIONED
        # (per-shard state), never a single global window
        pplan = _plan_str(pack_sequences(raw_docs, max_tokens=512))
        import re as _re

        bad_win = _re.search(r"Window .*partitionBy=\[\]", pplan) or (
            "Window" in pplan and "shard" not in pplan
        )
        print(f"check pack_sequences: partitioned_window={not bad_win}")
        if bad_win:
            errors.append("pack_sequences: window is not partitioned by shard")

        # raw-resolution cross-series aggregation (grid-join strategy):
        # no nested-loop join (the span range-join must be the binned equi
        # join) and no shrinking unbounded-following window frame (Spark
        # re-scans those per row -> O(rows^2) per series; both regressions
        # were measured as multi-minute stages at sf0.1)
        from opentsdb_spark.operators.groupby import cross_series_aggregate
        from opentsdb_spark.sources.points import load_points

        raw_pts = load_points(spark, sf_dir).where(F.col("metric") == "signup")
        gplan = _plan_str(cross_series_aggregate(raw_pts, "sum", strategy="join"))
        has_bnlj = "BroadcastNestedLoopJoin" in gplan or "CartesianProduct" in gplan
        has_shrink = "AND UNBOUNDED FOLLOWING" in gplan.upper()
        print(f"check grid_join: nested_loop={has_bnlj} shrinking_frame={has_shrink}")
        if has_bnlj:
            errors.append("grid_join: span range join fell back to a nested loop")
        if has_shrink:
            errors.append("grid_join: O(n^2) unbounded-following window frame")

        # raw-resolution sweep strategy (the production route for
        # decomposable aggregators): prefix sums must run as per-bucket
        # local windows — never an unpartitioned global window, never a
        # packed collect_list, never a nested loop
        splan = _plan_str(cross_series_aggregate(raw_pts, "sum", strategy="sweep"))
        s_unpart = _re.search(r"partitionBy=\[\]", splan) is not None
        s_pack = "collect_list" in splan
        s_bnlj = "BroadcastNestedLoopJoin" in splan or "CartesianProduct" in splan
        print(f"check sweep: unpartitioned_window={s_unpart} pack={s_pack} nested_loop={s_bnlj}")
        if s_unpart:
            errors.append("sweep: prefix sum runs in an unpartitioned window")
        if s_pack:
            errors.append("sweep: unexpected collect_list in sweep plan")
        if s_bnlj:
            errors.append("sweep: nested-loop join in sweep plan")

        # top-k must be TakeOrderedAndProject (bounded per-partition heaps),
        # never a global Sort of the vocabulary
        from opentsdb_spark.pipeline.text import vocab_topk

        vplan = _plan_str(vocab_topk(raw_docs))
        print("check vocab_topk: TakeOrdered="
              f"{'TakeOrderedAndProject' in vplan}")
        if "TakeOrderedAndProject" not in vplan:
            errors.append("vocab_topk: top-k not planned as TakeOrderedAndProject")

        # column pruning: ops that touch only (doc_id, text) must not drag
        # the documents table's lang/source/n_chars columns through the scan
        from opentsdb_spark.pipeline.multimodal import (
            byte_stats, docs_as_raw_images, resize_images,
        )

        rplan = _plan_str(
            byte_stats(resize_images(docs_as_raw_images(raw_docs, 24, 16), 8, 6))
        )
        pruned = not re.search(r"ReadSchema:.*source", rplan)
        rtree = rplan.split("\n\n")[0]
        rshuf = rtree.count("Exchange") - rtree.count("BroadcastExchange")
        print(f"check resize_byte_stats: pruned={pruned} shuffles={rshuf}")
        if not pruned:
            errors.append("resize pipeline: unused documents columns reach the scan")
        if rshuf > 0:
            errors.append(f"resize pipeline: {rshuf} shuffles in a narrow-map chain")

        # quantized ANN must broadcast the query side (no shuffle of the
        # corpus for a handful of query vectors)
        from pyspark.sql import functions as F2

        from opentsdb_spark.pipeline.similarity import (
            brute_force_topk, dequantized_view, quantize_embeddings,
        )

        deq = dequantized_view(quantize_embeddings(raw_emb))
        qs = deq.where(F2.col("vec_id") < 3).select(
            F2.col("vec_id").alias("query_id"), "embedding"
        )
        qplan = _plan_str(brute_force_topk(deq, qs, k=5))
        has_bc = "BroadcastExchange" in qplan or "BroadcastNestedLoopJoin" in qplan
        print(f"check ann_quantized: broadcast={has_bc}")
        if not has_bc:
            errors.append("quantized ANN: query side not broadcast")

        # paragraph dedup: keep-first winner must come from a map-side-
        # combinable aggregate, never a per-paragraph row_number window
        # (one boilerplate paragraph with 10^9 copies = one task otherwise)
        from opentsdb_spark.pipeline.text import paragraph_dedup

        dplan = _plan_str(paragraph_dedup(raw_docs))
        d_win = "Window" in dplan
        print(f"check paragraph_dedup: window={d_win}")
        if d_win:
            errors.append("paragraph_dedup: winner selection uses a Window")

        # lsh_topk: the multi-table explode and the candidate dedup shuffle
        # must carry bare ids — the dim-length vectors re-join afterwards
        from opentsdb_spark.pipeline.similarity import lsh_topk

        lq = raw_emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        lplan = _plan_str(lsh_topk(raw_emb, lq, k=5))
        # the corpus-side HashAggregate for dropDuplicates must not list the
        # vector column among its grouping/agg outputs
        import re as _re2

        # formatted mode lists node details separately: find the dedup
        # node's FULL detail block (from its "(N) HashAggregate" header to
        # the next header) whose Keys line starts with query_id, and scan
        # the whole block — a dragged vector could ride Keys, Functions
        # (first()), Input, or Results
        blocks = _re2.split(r"\n(?=\(\d+\) )", lplan)
        dd_blocks = [b for b in blocks
                     if "HashAggregate" in b.split("\n", 1)[0]
                     and _re2.search(r"Keys \[\d+\]: \[query_id", b)]
        if not dd_blocks:
            # the guarded node must exist — a silent pass when plan
            # formatting drifts would report the invariant as satisfied
            errors.append("lsh_topk: candidate-dedup HashAggregate not found in plan")
            print("check lsh_topk: candidate_dedup_node=MISSING")
        else:
            dd_has_vec = any(
                _re2.search(r"\b(qv|cv|embedding)#", b) for b in dd_blocks
            )
            print(f"check lsh_topk: candidate_dedup_carries_vectors={dd_has_vec}")
            if dd_has_vec:
                errors.append("lsh_topk: candidate dedup shuffles a vector column")

        # semdedup: the within-cell pair join must be an equi join on the
        # cell key (a range/theta fallback is a nested loop over the corpus)
        from opentsdb_spark.pipeline.similarity import seeded_centroids, semdedup

        mplan = _plan_str(
            semdedup(raw_emb, threshold=0.3, centroids=seeded_centroids(8, 64))
        )
        m_bnlj = "BroadcastNestedLoopJoin" in mplan or "CartesianProduct" in mplan
        print(f"check semdedup: nested_loop={m_bnlj}")
        if m_bnlj:
            errors.append("semdedup: cell self-join fell back to a nested loop")

        def _exchange_blocks(plan: str) -> list[str]:
            """Full detail blocks of every (non-broadcast) Exchange node."""
            bl = _re2.split(r"\n(?=\(\d+\) )", plan)
            return [b for b in bl
                    if b.split("\n", 1)[0].strip().endswith("Exchange")
                    and "Broadcast" not in b.split("\n", 1)[0]]

        # substring dedup: every shuffle carries 8-byte window hashes, the
        # raw gram strings / document text must never enter an Exchange,
        # and the coverage lag-window is PARTITIONED by doc id (its
        # exchange is the same (id)-hash exchange the groupBy(id) right
        # after it reuses — a SinglePartition window would be a global
        # sort and a scale killer)
        from opentsdb_spark.pipeline.dedup import substring_dup_spans

        ssplan = _plan_str(substring_dup_spans(raw_docs, k=5))
        ss_bad = any(_re2.search(r"\b(g|text)#", b) for b in _exchange_blocks(ssplan))
        ss_unpart = "SinglePartition" in ssplan
        print(f"check substring_dedup: strings_in_shuffle={ss_bad} "
              f"unpartitioned={ss_unpart}")
        if ss_bad:
            errors.append("substring dedup: gram/text strings ride a shuffle")
        if ss_unpart:
            errors.append("substring dedup: single-partition stage in plan")

        # prototypicality: assignment is a narrow map; the ONLY shuffle is
        # the per-cell rank window, and that window is partitioned
        from opentsdb_spark.pipeline.similarity import prototypicality

        prplan = _plan_str(prototypicality(raw_emb, n_centroids=8, dim=64))
        pr_exch = len(_exchange_blocks(prplan))
        pr_unpart = "SinglePartition" in prplan
        print(f"check prototypicality: shuffles={pr_exch} unpartitioned_window={pr_unpart}")
        if pr_exch > 1:
            errors.append(f"prototypicality: {pr_exch} shuffles (expected 1: the rank window)")
        if pr_unpart:
            errors.append("prototypicality: rank window is unpartitioned")

        # covariance: the d-length embedding arrays are consumed by the
        # moment partials BEFORE any shuffle — no Exchange carries them
        from opentsdb_spark.pipeline.similarity import covariance_matrix

        cvplan = _plan_str(covariance_matrix(raw_emb, dim=64))
        cv_bad = any(_re2.search(r"\b(embedding|__v)#", b)
                     for b in _exchange_blocks(cvplan))
        print(f"check covariance: vectors_in_shuffle={cv_bad}")
        if cv_bad:
            errors.append("covariance: embedding vectors ride a shuffle")

        # ccnet buckets: the per-language band window must be partitioned
        from opentsdb_spark.pipeline.text import ccnet_buckets

        ccplan = _plan_str(ccnet_buckets(raw_docs))
        cc_unpart = "SinglePartition" in ccplan
        print(f"check ccnet_buckets: unpartitioned_window={cc_unpart}")
        if cc_unpart:
            errors.append("ccnet_buckets: band window is unpartitioned")

    if check:
        errors.extend(_check_pushdown(spark))
        if errors:
            print("\nPLAN CHECK FAILURES:")
            for e in errors:
                print(f"  FAIL {e}")
            sys.exit(1)
        print("\nall plan checks passed")


if __name__ == "__main__":
    main()
