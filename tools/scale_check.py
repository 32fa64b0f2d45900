"""Scaling experiment: replicate the sf0.1 tables K times (ids/timestamps
perturbed so keys stay unique) and measure how the headline queries scale.

    python tools/scale_check.py [K] [out_json]

Prints per-query wall seconds at 1x and Kx and the ratio. A ratio near K
means linear scaling in data volume on fixed cores (the expected shape for
scan-bound plans at constant parallelism); a ratio far above K flags a
super-linear stage (quadratic pair blow-up, single-task sort, driver
collect) that would sink a 100 TB run. Duplicated documents make the dedup
family's candidate sets denser than production — pair counts rise, so dedup
ratios above K by a small factor are expected and reported, not failed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from opentsdb_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
QUERIES = [
    "tsdb_ds_10m_avg",
    "tsdb_agg_sum_aligned_1h",
    "tsdb_agg_sum_raw_full",
    "tsdb_rate",
    "gexp_sumseries",
    "ingest_put_roundtrip",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "text_quality",
    "text_paragraph_dedup",
    "text_vocab_top50",
    "ann_lsh_top5",
    "multimodal_features",
    "dedup_substring",
    "text_ccnet_buckets",
    "embed_prototypicality",
    "embed_covariance",
    "text_hash_embedding",
    "text_bm25_top5",
    "text_bm25_fallback",
    "dedup_bloom_decontaminate",
    "tsdb_rate_ds_sum",
    "corpus_dedup_pipeline",
    "embed_pca_project",
    "tsdb_ds_1h_p95_binned",
    "text_hll_distinct",
    "text_cms_probe",
    "dedup_incremental",
    "multimodal_dhash_pairs",
    "multimodal_audio_dedup",
    "sample_shard_assign",
    "sample_interleave",
    "text_strip_boilerplate",
    "dedup_substring_removal",
    "dedup_substring_keep_first",
    "sample_global_shuffle",
    "sample_cap_per_source",
    "sample_cap_quality",
    "text_token_entropy",
    "text_source_overlap",
    "sample_fixed_n",
    "pipeline_end_to_end",
    "sample_weighted_reservoir",
    "embed_knn_graph",
    "events_funnel",
    "events_retention_cohort",
    "tsdb_anomaly_zscore",
    "multimodal_scene_cuts",
    "text_zipf_alpha",
    "embed_drift",
    "text_pmi_top20",
    "multimodal_audio_segments",
    "text_vocab_drift",
    "corpus_snapshot_diff",
    "text_length_quantiles",
    "multimodal_shot_keyframes",
    "text_gram_novelty",
    "sample_quality_percentile",
    "sample_leakage_safe_split",
    "text_intra_repetition",
    "multimodal_audio_keyclips",
]

# The long tail: every remaining catalog query (bounded-output metadata,
# filter variants, gexp/exp families, downsample/agg variants, rollups,
# UID/tree/annotations, sampling/text/multimodal variants). Mostly cheap
# — each is one line here so the sweep measures ALL plans, not just the
# headline ones.
#
# Known output-truthful ratio: tsdb_interval_join's output grows K^2
# under this replica (user ids and clock hours are shared across copies,
# so each error window genuinely contains Kx clicks and there are Kx
# windows — 725 rows at 1x, 652,500 = exactly 900x at 30x) while its
# wall grew only ~7x; the binned equi-join is SUB-output, not
# superlinear. A real Kx corpus adds new users/periods, not density in
# the same (user, hour) cells. Since round 13 the sweep records
# out_rows_base/out_rows_big per query, so this class of growth is
# machine-visible in the artifact instead of lore.
LONG_TAIL = [
    "ann_bruteforce_top5", "ann_hard_negatives", "ann_ivf_fixed_top5",
    "ann_ivf_top5", "ann_quantized_top5", "annotations_overlap",
    "corpus_funnel", "corpus_source_mix", "dedup_canonical_quality",
    "dedup_cluster_cc", "dedup_decontaminate", "dedup_embedding_cosine",
    "dedup_embedding_quantized", "dedup_minhash_md5", "dedup_simhash",
    "dedup_simhash_md5", "embed_knn_density", "embed_quantize",
    "embed_stats", "exp_divide_ieee", "exp_intersection_arith",
    "exp_ternary_max", "exp_union_fill_zero", "gexp_absolute_scale",
    "gexp_alias", "gexp_diffseries", "gexp_divideseries",
    "gexp_firstdiff", "gexp_highest_current", "gexp_highest_max",
    "gexp_movavg_2h_time", "gexp_movavg_3pt", "gexp_multiplyseries",
    "gexp_parser_scale", "gexp_timeshift_1h", "hist_p95_daily",
    "hist_query_pct_daily", "multimodal_audio_fp",
    "multimodal_audio_resample", "multimodal_audio_stats",
    "multimodal_bytes", "multimodal_dhash", "multimodal_frame_dedup",
    "multimodal_frames", "multimodal_resize", "rollup_avg_rewrite_2h",
    "rollup_count_1d", "rollup_split_seam", "sample_class_balance",
    "sample_dsir_weights", "sample_hash_split", "sample_mix_audit",
    "sample_pack_sequences", "sample_repeat_epochs", "sample_stratified",
    "sample_temperature", "sample_token_budget", "text_boilerplate",
    "text_bpe_pairs", "text_chunks", "text_fingerprint",
    "text_fingerprint_md5", "text_gopher_filter", "text_langid",
    "text_lm_score", "text_pii_scrub", "text_repetition",
    "text_tfidf_top3", "text_tokens", "text_vocab_top10_lang",
    "tree_branches", "tree_collisions", "tree_notmatched",
    "tsdb_agg_avg_aligned_1h", "tsdb_agg_avg_raw",
    "tsdb_agg_count_aligned_1h", "tsdb_agg_count_raw",
    "tsdb_agg_dev_aligned_1h", "tsdb_agg_lerp_sum",
    "tsdb_agg_median_aligned_1h", "tsdb_agg_mimmax_by_user",
    "tsdb_agg_min_aligned_1h", "tsdb_agg_mult_aligned_1h",
    "tsdb_agg_none_single", "tsdb_agg_p95_aligned_1h", "tsdb_agg_pfsum",
    "tsdb_agg_zimsum_by_user", "tsdb_asof_join", "tsdb_ds_0all_sum",
    "tsdb_ds_1d_calendar_max_zero_tz", "tsdb_ds_1d_calendar_sum",
    "tsdb_ds_1h_count", "tsdb_ds_1h_dev", "tsdb_ds_1h_diff",
    "tsdb_ds_1h_ep90r7", "tsdb_ds_1h_ep99r3", "tsdb_ds_1h_first",
    "tsdb_ds_1h_last", "tsdb_ds_1h_max_fill_zero", "tsdb_ds_1h_median",
    "tsdb_ds_1h_mult", "tsdb_ds_1h_p95", "tsdb_ds_1h_squaresum",
    "tsdb_ds_2d_calendar_sum_tz", "tsdb_dump_import_lines",
    "tsdb_explicit_tags", "tsdb_filter_iliteral_or",
    "tsdb_filter_iwildcard", "tsdb_filter_literal_or",
    "tsdb_filter_not_iliteral_or", "tsdb_filter_not_key",
    "tsdb_filter_not_literal_or", "tsdb_filter_regexp",
    "tsdb_interval_join", "tsdb_last", "tsdb_lookup_big",
    "tsdb_m_parser", "tsdb_rate_counter", "tsdb_rate_drop_resets",
    "tsdb_rate_first_vs_zero", "tsdb_sessionize", "tsdb_suggest_metrics",
    "tsdb_tsuid_direct", "uid_metrics_listing",
    "dedup_incremental_cc", "ann_pq_adc_top5", "tsdb_slo_burn_rate", "ann_ivf_pq_top5",
    "gexp_anomaly_zscore", "gexp_burn_rate",
]
QUERIES = QUERIES + LONG_TAIL

# The ONLY catalog rows outside the sweep, by design: these five drive
# fixed micro-batch REPLAYS (tempdir file feeds + processAllAvailable
# barriers + a driver-side collect/reshape of the replayed output), so
# their wall measures the replay harness, not an engine plan, and a
# data-scale ratio is ill-defined for them. Their ENGINE machinery is
# swept through the batch twins (tsdb_anomaly_zscore, tsdb_slo_burn_rate,
# dedup_incremental_cc/dedup_cluster_cc, dedup_incremental,
# corpus_source_mix). The assert keeps this exclusion list exact: a new
# catalog row must either join the sweep or be added here explicitly.
STREAMING_REPLAY_EXCLUDED = {
    "ann_incremental",
    "dedup_components_stream",
    "streaming_source_mix",
    "tsdb_anomaly_zscore_stream",
    "tsdb_slo_burn_stream",
}


def _assert_sweep_covers_catalog() -> None:
    from opentsdb_spark import catalog

    missing = set(catalog.CATALOG) - set(QUERIES) - STREAMING_REPLAY_EXCLUDED
    assert not missing, (
        f"catalog queries absent from the scale sweep: {sorted(missing)} — "
        "add them to QUERIES/LONG_TAIL or, if they are micro-batch replay "
        "harnesses, to STREAMING_REPLAY_EXCLUDED")
    stale = set(QUERIES) - set(catalog.CATALOG)
    assert not stale, f"swept queries no longer in the catalog: {sorted(stale)}"


def replicate(spark, k: int, out_dir: str) -> None:
    """K copies of each table; ids offset per copy, event timestamps nudged
    +copy ms so replicated points stay distinct (series, ts) cells."""
    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        src = f"{BASE}/{name}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if name in ("events", "documents", "embeddings"):
            copies = []
            for i in range(k):
                c = df
                if name == "events":
                    # interval arithmetic works on TIMESTAMP and NTZ alike
                    # (the driver parquet is INT64 TIMESTAMP(NANOS) -> NTZ
                    # under a bare session)
                    c = (c.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
                          .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} MILLISECOND")))
                elif name == "documents":
                    c = c.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
                else:
                    c = c.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        else:
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


_TICK = os.sysconf("SC_CLK_TCK")


def _steal_seconds() -> float:
    """Cumulative hypervisor steal (all vCPUs, /proc/stat field 8) —
    same counter bench.py budgets; see its docstring for why wall alone
    can't separate an engine regression from a stolen host window."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / _TICK
    except (OSError, IndexError, ValueError):
        return 0.0


def time_queries(spark, sf_dir: str, repeat: int = 2) -> dict[str, dict]:
    """Best-of-``repeat`` per query (same policy as bench.py): the first
    execution of a fresh plan shape pays JIT/codegen compilation that can
    dwarf the steady-state cost, and a ratio built on one cold and one
    warm run reads as a fake (anti-)scaling signal.

    Each entry also records the adaptive clone-gate's probe verdict for
    the query ("collapsed": True = exact-clone collapse engaged, False =
    probe bypassed it, None = no adaptive probe in the plan) — the gate
    changes which code path a sweep measured, so the artifact must say
    which (round-7 ratios were unreadable without it).

    OUTPUT ROWS ride the same job via ``df.observe`` (a CollectMetrics
    count over the rows the noop sink already materializes — no second
    execution), so output-truthful growth is machine-visible in the
    artifact: tsdb_interval_join's K^2 rows and the class-pair families'
    n_pairs mass used to live only in commit-message lore, and every
    future reader had to re-derive why a 13x ratio was fine."""
    from opentsdb_spark import catalog
    from opentsdb_spark.pipeline import dedup as _dedup

    out = {}
    for name in QUERIES:
        # clear scratch BETWEEN queries (not between repeats): at Kx the
        # accumulated _persist_small frames reach executor-memory scale and
        # the resulting eviction/GC churn made unchanged queries swing 2x+
        # between sweeps (bench.py at sf0.1 keeps the opposite policy — the
        # scratch is small there and sibling reuse is the measured
        # contract). Each query still warms ITSELF across its repeats.
        spark.catalog.clearCache()
        fn = catalog.CATALOG[name].fn
        best, collapsed, rows = float("inf"), None, None
        best_steal = None
        # Steal-aware repeats (same /proc/stat field bench.py budgets):
        # the first SCALE30_r13 sweep hit a stolen host window that
        # inflated a CONTIGUOUS run of big-phase entries 3-8x (e.g.
        # dedup_semantic 2.5 -> 22.5 s with zero code change) — wall
        # alone can't tell that from a regression. Record the steal
        # seen by the best repeat, and buy up to EXTRA_ON_STEAL more
        # repeats while the best repeat is steal-contaminated (>0.3 s):
        # extra repeats can only lower "best", so the best-of policy is
        # unchanged — we just refuse to certify a stolen measurement
        # while the hypervisor is actively taking the cycles.
        EXTRA_ON_STEAL, STEAL_OK_S = 2, 0.3
        runs = 0
        while runs < repeat + EXTRA_ON_STEAL:
            _dedup.PROBE_EVENTS.clear()
            obs = Observation()
            s0 = _steal_seconds()
            t0 = time.time()
            fn(spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("n")) \
                .write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            steal = _steal_seconds() - s0
            runs += 1
            if wall < best:
                best, best_steal = wall, steal
            rows = int(obs.get["n"])
            if _dedup.PROBE_EVENTS:
                collapsed = any(_dedup.PROBE_EVENTS)
            if runs >= repeat and best_steal <= STEAL_OK_S:
                break
        out[name] = {"best_s": round(best, 3), "rows": rows,
                     "collapsed": collapsed,
                     "steal_s": round(best_steal, 3)}
    return out


def main() -> None:
    argv = [a for a in sys.argv[1:]
            if a not in ("--reuse-replica", "--core")]
    reuse = "--reuse-replica" in sys.argv
    _assert_sweep_covers_catalog()  # full-list invariant, before any trim
    if "--core" in sys.argv:  # the pre-long-tail headline sweep
        QUERIES[:] = [q for q in QUERIES if q not in LONG_TAIL]
    k = int(argv[0]) if argv else 10
    out_json = argv[1] if len(argv) > 1 else None
    spark = get_spark("scale-check")
    big = f"/tmp/scale_check_sf{k}x"
    # --reuse-replica skips re-writing an existing replica dir (it is a
    # deterministic function of BASE and k, so reuse within a session is
    # safe; delete the dir after changing the replication scheme). The
    # marker file is written only after replicate() finishes, so a replica
    # half-written by a crashed run is never silently reused.
    marker = f"{big}/.replica_complete"
    if reuse and os.path.exists(marker):
        print(f"reusing replica {big}")
    else:
        print(f"replicating {BASE} x{k} -> {big}")
        replicate(spark, k, big)
        with open(marker, "w") as f:
            f.write("ok\n")
    # warmup (JVM + python worker pool)
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()

    base_t = time_queries(spark, BASE)
    big_t = time_queries(spark, big)
    report = {}
    print(f"\n{'query':28s} {'1x':>8s} {f'{k}x':>8s} {'ratio':>7s}"
          f" {'delta':>7s} {'rows 1x':>10s} {'rows Kx':>12s} collapse(1x/Kx)")
    for name in QUERIES:
        b, g = base_t[name], big_t[name]
        ratio = round(g["best_s"] / max(b["best_s"], 1e-9), 2)
        report[name] = {
            "base_s": b["best_s"], "big_s": g["best_s"], "ratio": ratio,
            "delta_s": round(g["best_s"] - b["best_s"], 3),
            "out_rows_base": b["rows"], "out_rows_big": g["rows"],
            "collapsed_base": b["collapsed"], "collapsed": g["collapsed"],
            "steal_base_s": b["steal_s"], "steal_big_s": g["steal_s"],
        }
        cb = {True: "coll", False: "pass", None: "-"}
        print(f"{name:28s} {b['best_s']:8.2f} {g['best_s']:8.2f} {ratio:7.2f}"
              f" {g['best_s'] - b['best_s']:7.2f} {b['rows']:10d} {g['rows']:12d}"
              f" {cb[b['collapsed']]}/{cb[g['collapsed']]}")
    # Ratio-optics guard: a sub-RATIO_FLOOR_S base wall is dominated by
    # the ~0.2-0.3 s fixed per-query session/plan overhead, so its ratio
    # overstates scaling (round 12: text_fingerprint read 28x while BOTH
    # absolute walls improved). The frontier ranking therefore uses
    # ratios only on >= RATIO_FLOOR_S bases, and ranks absolute Kx wall
    # separately — the real frontier is the union of both lists.
    RATIO_FLOOR_S = 0.4
    worst_ratio = sorted(
        ((r["ratio"], n) for n, r in report.items()
         if r["base_s"] >= RATIO_FLOOR_S), reverse=True)[:10]
    worst_abs = sorted(
        ((r["big_s"], n) for n, r in report.items()), reverse=True)[:10]
    print(f"\nworst ratios (base >= {RATIO_FLOOR_S}s; sub-floor bases are"
          " fixed-overhead optics — see delta column):")
    for ratio, n in worst_ratio:
        r = report[n]
        print(f"  {n:28s} ratio {ratio:6.2f}  {r['base_s']:.2f}s ->"
              f" {r['big_s']:.2f}s  rows {r['out_rows_base']} ->"
              f" {r['out_rows_big']}")
    print(f"\nworst absolute {k}x walls:")
    for wall, n in worst_abs:
        r = report[n]
        print(f"  {n:28s} {wall:6.2f}s  ratio {r['ratio']:.2f}  rows"
              f" {r['out_rows_base']} -> {r['out_rows_big']}")
    steal_base = round(sum(r["steal_base_s"] for r in report.values()), 2)
    steal_big = round(sum(r["steal_big_s"] for r in report.values()), 2)
    print(f"\nsteal certified into best repeats: base {steal_base}s,"
          f" {k}x {steal_big}s (entries with steal_big_s > 0.3 could not"
          " buy a clean repeat — distrust their ratio)")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"k": k, "cache_cleared_between_queries": True,
                       "steal_base_total_s": steal_base,
                       "steal_big_total_s": steal_big,
                       "ratio_floor_s": RATIO_FLOOR_S,
                       "worst_ratio_ge_floor":
                           [n for _, n in worst_ratio],
                       "worst_abs": [n for _, n in worst_abs],
                       "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
