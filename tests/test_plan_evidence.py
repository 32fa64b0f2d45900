"""Plan-shape evidence tests: pushed filters, partition pruning, no
single-partition windows. These assert the SCALE posture, not just answers
(SURVEY.md §7 — every operator must keep its physical plan honest at 100 TB).
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentsdb_spark.model import SubQuery, TSQuery  # noqa: E402
from opentsdb_spark.plans.planner import compile_query, compile_subquery  # noqa: E402
from opentsdb_spark.sources.points import read_points, write_points  # noqa: E402

from .conftest import EPOCH  # noqa: E402


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _mk_days(spark, days=5, per_day=48):
    rows = []
    for d in range(days):
        for i in range(per_day):
            ts = (EPOCH + d * 86400 + i * 1800) * 1000
            rows.append(("sys.cpu.user", ts, float(d * 1000 + i), {"host": f"web{i % 3}"}))
    df = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, tags map<string,string>"
    )
    return df.select(
        "metric",
        F.timestamp_millis("ts_ms").alias("ts"),
        "value",
        F.lit(None).cast("long").alias("value_long"),
        "tags",
    )


def test_time_range_pushed_and_partition_pruned(spark, tmp_path):
    """The single biggest 100-TB lever: the ts range must reach the Parquet
    scan (row-group pruning) AND the dt partition column (directory pruning).
    Reference analog: row-key start/stop scan bounds, TsdbQuery.java:795-830."""
    path = str(tmp_path / "pts")
    write_points(_mk_days(spark), path)
    pts = read_points(spark, path)

    # query day 2 only
    start_ms = (EPOCH + 2 * 86400) * 1000
    end_ms = (EPOCH + 3 * 86400) * 1000 - 1
    tsq = TSQuery(
        start=start_ms // 1000,
        end=end_ms // 1000,
        queries=(SubQuery(metric="sys.cpu.user", aggregator="none"),),
    )
    [r] = compile_query(pts, tsq)
    plan = _plan(r.df)

    # pushed row-group range on ts (not just IsNotNull)
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThanOrEqual(ts" in ln for ln in pushed), pushed
    assert any("LessThanOrEqual(ts" in ln for ln in pushed), pushed
    # partition pruning on dt
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part and any("dt" in ln for ln in part), part

    rows = r.df.collect()
    assert len(rows) == 48  # exactly one day's points survived
    assert all(start_ms <= row["ts"].timestamp() * 1000 <= end_ms for row in rows)
    assert "dt" not in r.df.columns  # layout columns dropped post-filter


def test_hour_partition_pruning_same_day(spark, tmp_path):
    path = str(tmp_path / "pts_hr")
    write_points(_mk_days(spark, days=2), path, partition_hours=True)
    pts = read_points(spark, path)

    start_ms = (EPOCH + 6 * 3600) * 1000
    end_ms = (EPOCH + 8 * 3600) * 1000 - 1
    r = compile_subquery(
        pts, SubQuery(metric="sys.cpu.user", aggregator="none"), start_ms, end_ms
    )
    plan = _plan(r.df)
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part and any("hr" in ln for ln in part), part
    assert r.df.count() == 4  # 2 hours x 2 points/hour


def test_bucketed_layout_zero_shuffle_per_series_agg(spark, tmp_path):
    """write_points_bucketed = the HBase row-key order analog (RowKey.java:
    83-105: one series' cells contiguous + time-sorted). A per-series
    downsample-aggregate over the bucketed table must run with ZERO
    exchanges: the scan itself satisfies the ClusteredDistribution because
    hash-bucketing on `series` covers any grouping set containing it."""
    from opentsdb_spark.sources.points import (
        read_points_bucketed,
        write_points_bucketed,
    )

    raw = _mk_days(spark, days=3)
    write_points_bucketed(raw, "pts_bucketed_test", str(tmp_path / "bkt"), buckets=8)
    try:
        pts = read_points_bucketed(spark, "pts_bucketed_test")

        hourly = pts.groupBy(
            "series", F.window("ts", "1 hour").start.alias("bucket")
        ).agg(F.sum("value").alias("value"))
        plan = _plan(hourly)
        assert "Exchange" not in plan, plan[:3000]

        # same numbers as the shuffled plan over the raw frame
        from opentsdb_spark.sources.points import series_id_col

        want = {
            (r["series"], r["bucket"]): r["value"]
            for r in raw.withColumn("series", series_id_col())
            .groupBy("series", F.window("ts", "1 hour").start.alias("bucket"))
            .agg(F.sum("value").alias("value"))
            .collect()
        }
        got = {(r["series"], r["bucket"]): r["value"] for r in hourly.collect()}
        assert got == want

        # last-point per series (tsdb_last analog): also exchange-free
        last = pts.groupBy("series").agg(F.max_by("value", "ts").alias("value"))
        assert "Exchange" not in _plan(last)
    finally:
        spark.sql("DROP TABLE IF EXISTS pts_bucketed_test")


def test_raw_resolution_agg_never_packs_groups(spark):
    """A cross-series aggregation with NO downsample runs at raw resolution:
    timestamps per group are unbounded, so the planner must route it off the
    pack strategy — pack's collect_list would materialize a whole group as
    one array row (the reference streams this via a k-way merge that never
    holds a group, AggregationIterator.java:39-43). Decomposable aggregators
    take the linear-time line sweep; non-decomposable ones (median) fall
    back to the grid join — neither may collect_list unbounded groups.
    Downsampled-but-unfilled queries stay on pack (grid bounded by
    range/interval)."""
    pts = _mk_days(spark, days=2)
    start_ms, end_ms = EPOCH * 1000, (EPOCH + 2 * 86400) * 1000

    raw = compile_subquery(
        pts, SubQuery(metric="sys.cpu.user", aggregator="sum"), start_ms, end_ms
    )
    assert "collect_list" not in _plan(raw.df), "raw-resolution agg took the pack path"
    # and it still computes: 2 days x 48 slots, 3 hosts summed per slot
    assert raw.df.count() == 96

    # dev is not sweep-decomposable: falls back to grid join (median would
    # show collect_list from its own per-slot builder, so test with dev)
    dev = compile_subquery(
        pts, SubQuery(metric="sys.cpu.user", aggregator="dev"), start_ms, end_ms
    )
    assert "collect_list" not in _plan(dev.df), "sweep fallback must be grid join, not pack"
    assert dev.df.count() == 96

    from opentsdb_spark.model import DownsampleSpec

    ds = compile_subquery(
        pts,
        SubQuery(
            metric="sys.cpu.user", aggregator="sum",
            downsample=DownsampleSpec(3_600_000, "avg", fill="none"),
        ),
        start_ms, end_ms,
    )
    assert "collect_list" in _plan(ds.df), "bounded downsampled agg should pack"


def test_topk_no_global_single_partition_window(spark):
    """highestMax must compile to TakeOrderedAndProject (distributed top-n),
    never an unpartitioned Window (single-partition sort)."""
    from opentsdb_spark.operators.topk import highest_max

    pts = _mk_days(spark, days=1).withColumn("host", F.col("tags")["host"])
    out = highest_max(pts, ("host",), 2)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Window" not in plan.split("TakeOrderedAndProject")[0]


def test_linear_rate_rewrite_keeps_grid_group_level(spark):
    """ds-fill(zero) -> plain rate -> sum must run on the GROUP-level grid
    (the linear-rate rewrite): the rate window partitions on the group tag
    column, never on a per-series id — the series-level grid is the one
    stage that grows with series count instead of group count. Counter
    rates are non-linear and must keep the generic per-series path."""
    from opentsdb_spark.model import DownsampleSpec, RateOptions, TagFilter

    pts = _mk_days(spark)
    mk = lambda rate_opts: TSQuery(  # noqa: E731
        start=EPOCH, end=EPOCH + 5 * 86400,
        queries=(SubQuery(
            metric="sys.cpu.user", aggregator="sum",
            downsample=DownsampleSpec(3_600_000, "sum", fill="zero"),
            rate=rate_opts,
            filters=(TagFilter("wildcard", "host", "*", group_by=True),),
        ),),
    )
    [r] = compile_query(pts, mk(RateOptions()))
    plan = _plan(r.df)
    assert "__sid" not in plan, "rewrite did not fire: series-level grid"
    assert "tag_host" in plan  # the rate window keys on the group column
    # counter mode: per-series wrap detection — generic path required
    [rc] = compile_query(pts, mk(RateOptions(counter=True)))
    assert "__sid" in _plan(rc.df)


def test_bm25_join_free_and_filter_before_explode(spark):
    """BM25's scale posture after the join-free rewrite: the scoring plan
    has NO join at all (df/N/avgdl/query-map are query-bounded literals),
    query terms filter the token ARRAY below the explode so non-hit
    tokens never materialize as rows, the hit-sized posting frame is an
    InMemoryRelation shared by the df + scoring branches, and no exchange
    carries the corpus text or token arrays."""
    from opentsdb_spark.pipeline.text import bm25_search

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common words here") for i in range(50)],
        "doc_id long, text string",
    )
    out = bm25_search(docs, [("q1", "common tok1")], k=3)
    plan = _plan(out)
    assert "Join" not in plan, "scoring plan must be join-free"
    assert "InMemoryTableScan" in plan, "posting frame not persisted"
    # the array filter sits INSIDE the explode generator: non-hit tokens
    # never materialize as rows
    assert "explode(filter(__toks" in plan
    for inp, _args in _exchange_blocks(plan):
        assert "text#" not in inp and "__toks#" not in inp, inp


def test_token_budget_no_whole_group_window(spark):
    """The two-phase budget selection must NOT sort whole sources in one
    window: the only doc-level window partitions by (source, n_tokens)
    value buckets, never by the source alone."""
    from opentsdb_spark.pipeline.sampling import token_budget_select

    docs = spark.createDataFrame(
        [(i, "w " * (i % 9), f"s{i % 2}") for i in range(40)],
        "doc_id long, text string, source string",
    )
    plan = _plan(token_budget_select(docs, budget_tokens=10))
    import re

    # every row_number window spec must carry both keys
    for spec in re.findall(r"row_number\(\) windowspecdefinition\(([^)]*)\)",
                           plan):
        assert "n_tokens" in spec, f"doc-level window missing bucket key: {spec}"


def test_shard_assign_windows_stay_bucket_partitioned(spark):
    """shard_assign's doc-level running sum must window per hash bucket,
    never globally: the only unpartitioned window is the offset cumsum over
    the aggregated n_buckets-row frame (bounded by construction), and the
    bucket offsets join back as a broadcast."""
    import re

    from opentsdb_spark.pipeline.sampling import shard_assign

    docs = spark.createDataFrame(
        [(i, "w " * (i % 9 + 1)) for i in range(60)], "doc_id long, text string"
    )
    plan = _plan(shard_assign(docs, shard_tokens=20, n_buckets=8))
    # doc-level (n_tokens-summing) windows carry the bucket partition key
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    unpartitioned = [s for s in specs if "bucket" not in s]
    partitioned = [s for s in specs if "bucket" in s]
    assert partitioned, f"expected a bucket-partitioned doc window: {specs}"
    # the offset window (post-aggregate, bounded rows) is the only one
    # allowed to run unpartitioned
    assert len(unpartitioned) <= 1, f"unexpected global windows: {unpartitioned}"
    assert "BroadcastExchange" in plan  # offsets join back broadcast


def test_dhash_pairs_never_shuffles_image_bytes(spark):
    """The dHash candidate stage must shuffle only (id, hash, band, bh)
    rows: the media binary column may not appear in any exchange below the
    pair join — image bytes stay in the map-side hash stage."""
    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, dhash_dup_pairs

    media = spark.createDataFrame(
        [(i, "image", bytearray(bytes([i % 251] * 72)),
          ("image/x-raw-gray8", 9, 8, None)) for i in range(6)],
        MEDIA_SCHEMA,
    )
    import re

    plan = _plan(dhash_dup_pairs(media, max_hamming=6))
    exchanges = re.findall(r"Exchange [^\n]*", plan)
    assert exchanges, "expected at least the band-key shuffle"
    for e in exchanges:
        assert "media#" not in e, f"image bytes in a shuffle: {e}"


def test_dhash_class_pairs_never_shuffles_image_bytes(spark):
    """The clone-class pair form keeps the same shuffle contract as the
    member form: only (id/hash/band/count) rows move — the media binary
    may not appear in any exchange."""
    import re

    from opentsdb_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, dhash_class_pairs)

    media = spark.createDataFrame(
        [(i, "image", bytearray(bytes([i % 251] * 72)),
          ("image/x-raw-gray8", 9, 8, None)) for i in range(6)],
        MEDIA_SCHEMA,
    )
    plan = _plan(dhash_class_pairs(media, max_hamming=6))
    exchanges = re.findall(r"Exchange [^\n]*", plan)
    assert exchanges, "expected at least the class-build shuffle"
    for e in exchanges:
        assert "media#" not in e, f"image bytes in a shuffle: {e}"


def test_audio_pairs_never_shuffle_audio_bytes(spark):
    """audio_fingerprint -> audio_dup_pairs: the candidate stage shuffles
    only (id, afp, band, bh) rows — the media binary may not appear in any
    exchange (same pin as the dHash image path)."""
    import re

    import numpy as np

    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, audio_dup_pairs

    rng = np.random.default_rng(7)
    rows = [
        (i, "audio",
         bytearray(rng.integers(-3000, 3000, 400, dtype=np.int64)
                   .astype("<i2").tobytes()),
         ("audio/x-raw-s16le", None, None, 1))
        for i in range(6)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    plan = _plan(audio_dup_pairs(media, max_hamming=6))
    exchanges = re.findall(r"Exchange [^\n]*", plan)
    assert exchanges, "expected at least the band-key shuffle"
    for e in exchanges:
        assert "media#" not in e, f"audio bytes in a shuffle: {e}"


def test_resample_audio_is_narrow_map(spark):
    """resample_audio must stay a shuffle-free Arrow map over the scan —
    no exchange anywhere in its plan."""
    from opentsdb_spark.pipeline.multimodal import MEDIA_SCHEMA, resample_audio

    media = spark.createDataFrame(
        [(0, "audio", bytearray(b"\x01\x00" * 64),
          ("audio/x-raw-s16le", None, None, 1))],
        MEDIA_SCHEMA,
    )
    plan = _plan(resample_audio(media, 16000, 8000))
    assert "Exchange" not in plan, "resample_audio grew a shuffle"
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_incremental_dedup_corpus_joins_on_band_keys(spark):
    """Incremental dedup's corpus candidates must join on (band, bh) keys
    with bare ids — the signature arrays re-join only after candidate
    pruning, so no exchange below the verify carries a 64-long array from
    the corpus side."""
    from opentsdb_spark.pipeline.dedup import (
        incremental_dedup_minhash, minhash_signature,
    )

    corpus = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon zeta " * 3) for i in range(4)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " * 3) for i in range(3)],
        "doc_id long, text string",
    )
    out = incremental_dedup_minhash(batch, minhash_signature(corpus), threshold=0.5)
    plan = _plan(out)
    # the band-key joins exist (SortMergeJoin or ShuffledHashJoin on bh)
    assert "bh" in plan
    # every batch doc matched the identical corpus text
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(rows[i]["dup_kind"] == "corpus" for i in range(3))


def test_bloom_broadcasts_position_set(spark):
    """Bloom decontamination joins corpus gram positions against a
    BROADCAST position table — the corpus side must not shuffle."""
    from opentsdb_spark.pipeline.dedup import bloom_decontaminate

    bench = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "a b c d e x y z"), (2, "p q r s t u v w")],
        "doc_id long, text string")
    plan = _plan(bloom_decontaminate(train, bench, n=4))
    assert "BroadcastExchange" in plan


def _exchange_blocks(plan: str):
    """(Input-line, Arguments-line) for every Exchange node of a FORMATTED
    plan — the Input list names exactly the columns the shuffle carries."""
    import re

    out = []
    for block in re.split(r"\n\n", plan):
        lines = block.splitlines()
        if lines and re.match(r"\(\d+\) Exchange", lines[0]):
            inp = next((ln for ln in lines if ln.startswith("Input")), "")
            args = next((ln for ln in lines if ln.startswith("Arguments")), "")
            out.append((inp, args))
    return out


_TEXT_MARKERS = ("text#", " chunk#", "[chunk#", "__chunks#", "__toks#",
                 "__tok#", "__kt#", "__kc#", " g#", "[g#")


def _assert_text_only_in_doc_rebuild(plan: str, hash_keys: tuple):
    """Shared pin for the strike-out/rebuild text ops: (a) no hash-keyed
    exchange (dup discovery / strike-out join) carries a text column —
    those shuffles move only 8-byte keys + int positions; (b) text appears
    in AT MOST ONE exchange, the docs side of the per-doc rebuild join,
    and that one is partitioned by doc_id alone."""
    exchanges = _exchange_blocks(plan)
    assert exchanges, "expected shuffles in the plan"
    texty = [(i, a) for i, a in exchanges
             if any(m in i for m in _TEXT_MARKERS)]
    assert len(texty) <= 1, f"text in more than one shuffle: {texty}"
    for inp, args in texty:
        assert "hashpartitioning(doc_id#" in args, (inp, args)
        assert not any(k in args for k in hash_keys), (inp, args)
    for inp, args in exchanges:
        if any(k in args for k in hash_keys):
            assert not any(m in inp for m in _TEXT_MARKERS), (inp, args)


def test_strip_boilerplate_never_shuffles_chunk_strings(spark):
    """strip_boilerplate_chunks: doc-frequency and strike-out exchanges run
    on the 8-byte __ch key only; chunk strings reach exactly one exchange
    (the docs side of the per-doc rebuild join, keyed by doc_id)."""
    from opentsdb_spark.pipeline.text import strip_boilerplate_chunks

    docs = spark.createDataFrame(
        [(i, "common header words here then body %d text flows onward" % i)
         for i in range(6)],
        "doc_id long, text string",
    )
    plan = _plan(strip_boilerplate_chunks(docs, max_df=2))
    _assert_text_only_in_doc_rebuild(plan, hash_keys=("__ch#",))


def test_remove_duplicate_spans_dup_discovery_shuffles_keys_only(spark):
    """remove_duplicate_spans: window dup discovery shuffles only
    (xxhash64, id, pos) rows — gram/token strings reach exactly one
    exchange (the docs side of the per-doc rebuild join, keyed by
    doc_id)."""
    from opentsdb_spark.pipeline.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "shared prefix of many tokens here tail one"),
         (2, "shared prefix of many tokens here tail two"),
         (3, "completely different words in this document body")],
        "doc_id long, text string",
    )
    plan = _plan(remove_duplicate_spans(docs, k=5, persist=False))
    _assert_text_only_in_doc_rebuild(plan, hash_keys=("__h#",))


def test_scene_cuts_never_shuffles_frame_bytes(spark):
    """scene_cuts' one shuffle is the per-video window partition over
    (media_id, frame_idx, dhash) rows — neither the media blob nor the
    sampled frame bytes may appear in any exchange."""
    import re

    from opentsdb_spark.pipeline.multimodal import docs_as_raw_video, scene_cuts

    docs = spark.createDataFrame(
        [(i, "x" * 400) for i in range(4)], "doc_id long, text string"
    )
    media = docs_as_raw_video(docs, 12, 8, 4, frame_ms=100)
    plan = _plan(scene_cuts(media, every_ms=100))
    exchanges = re.findall(r"Exchange [^\n]*", plan)
    assert exchanges, "expected the per-video window shuffle"
    for e in exchanges:
        assert "media#" not in e and "frame#" not in e, \
            f"video/frame bytes in a shuffle: {e}"


def test_funnel_single_aggregation_no_joins(spark):
    """funnel_steps must plan as ONE aggregation over user_id (two
    exchanges max: partial->final of the same groupBy) with NO join
    operator anywhere — the per-step join chain is exactly what the
    operator exists to avoid."""
    import re

    from opentsdb_spark.operators.funnel import funnel_steps

    ev = spark.createDataFrame(
        [(1, EPOCH * 1000, "view")],
        "user_id long, ts_ms long, event_type string",
    ).select("user_id", F.timestamp_millis("ts_ms").alias("ts"), "event_type")
    plan = _plan(funnel_steps(ev, ["view", "click", "purchase"]))
    assert "Join" not in plan, plan[:1500]
    headers = re.findall(r"\) Exchange\b", plan)
    assert len(headers) == 1, plan[:1500]
    assert "hashpartitioning(user_id" in plan, plan[:1500]


def test_anomaly_zscore_single_series_partition_shuffle(spark):
    """anomaly_zscore is one window over the per-series partition: exactly
    one exchange, partitioned by the series columns, and no join."""
    import re

    from opentsdb_spark.operators.expressions import anomaly_zscore

    df = spark.createDataFrame(
        [("m", i, float(i)) for i in range(30)],
        "metric string, ts long, value double",
    )
    plan = _plan(anomaly_zscore(df, ("metric",), lookback=5))
    assert "Join" not in plan
    headers = re.findall(r"\) Exchange\b", plan)
    assert len(headers) == 1, plan[:1500]
    assert "hashpartitioning(metric" in plan, plan[:1500]


def test_weighted_sample_is_take_ordered(spark):
    """weighted_sample compiles to TakeOrderedAndProject — bounded
    per-partition heaps, no corpus shuffle before the limit (the
    sample_fixed_n contract extended to the weighted draw)."""
    from opentsdb_spark.pipeline.sampling import weighted_sample

    docs = spark.createDataFrame([(i, i + 1) for i in range(50)],
                                 "doc_id long, w int")
    out = weighted_sample(docs, n=5, weight_col="w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan.split("TakeOrderedAndProject")[0]
