"""Rollup routing, histogram ops, annotations, streaming ingest tests."""

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from opentsdb_spark.model import DownsampleSpec
from opentsdb_spark.operators.annotations import ANNOTATION_SCHEMA, annotations_in_range
from opentsdb_spark.operators.histogram import (
    histogram_percentile, merge_histograms, synthesize_histograms,
)
from opentsdb_spark.plans.rollup import (
    RollupConfig, RollupTable, generate_rollup, routed_downsample, split_rollup_query,
)
from opentsdb_spark.sources.points import parse_put_lines
from tests.conftest import EPOCH


def _mk_points(spark, rows):
    df = spark.createDataFrame(
        [(m, (EPOCH + t) * 1000, float(v), {"h": h}) for m, t, v, h in rows],
        "metric string, ts_ms long, value double, tags map<string,string>",
    )
    return df.select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")


def test_rollup_generate_and_route(spark):
    # 4 points in hour 0, 2 in hour 1 for one series
    pts = _mk_points(spark, [("m", 60 * i, 10.0 * (i + 1), "a") for i in range(6)])
    rt = generate_rollup(pts, 3_600_000, "1h")
    rows = {(r["aggregator"], int(r["ts"].timestamp()) - EPOCH): r["value"] for r in rt.collect()}
    # hour 0 has minutes 0..59 -> points i=0..59? spacing 60s -> i=0..59 in hour0: here i 0..5*60s... i*60 sec, so i=0..59 -> first 6 points all within hour 0
    assert rows[("sum", 0)] == sum(10.0 * (i + 1) for i in range(6))
    assert rows[("count", 0)] == 6.0
    assert rows[("min", 0)] == 10.0 and rows[("max", 0)] == 60.0

    cfg = RollupConfig([RollupTable(3_600_000, "1h", rt)])
    # avg over 1h answered from rollups: sum/count
    out = routed_downsample(pts, cfg, DownsampleSpec(3_600_000, "avg"))
    assert out.collect()[0]["value"] == pytest.approx(35.0)
    # dev can't be answered from rollups: NOFALLBACK raises, FALLBACK works
    with pytest.raises(ValueError):
        routed_downsample(pts, cfg, DownsampleSpec(3_600_000, "dev"), "ROLLUP_NOFALLBACK")
    out = routed_downsample(pts, cfg, DownsampleSpec(3_600_000, "dev"), "ROLLUP_FALLBACK")
    assert out.count() == 1
    # ROLLUP_RAW ignores the table
    out = routed_downsample(pts, cfg, DownsampleSpec(3_600_000, "sum"), "ROLLUP_RAW")
    assert out.collect()[0]["value"] == 210.0


def test_planner_rollup_routing_and_usage(spark):
    """Parsed m= rollup_/pre-agg tokens drive execution: compile_subquery
    routes downsamples through RollupConfig per ROLLUP_USAGE and scans the
    pre-agg vs raw store per the _aggregate tag (TsdbQuery.java:1553-1571)."""
    from opentsdb_spark.model import SubQuery
    from opentsdb_spark.plans.planner import compile_subquery

    pts = _mk_points(spark, [("m", 60 * i, 10.0 * (i + 1), "a") for i in range(6)])
    # poisoned rollup table: value 999 per bucket proves which store answered
    rt = spark.createDataFrame(
        [("m", EPOCH * 1000, 999.0, {"h": "a"}, a, "1h") for a in ("sum", "count", "min", "max")],
        "metric string, ts_ms long, value double, tags map<string,string>, aggregator string, interval string",
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "tags", "aggregator", "value", "interval")
    cfg = RollupConfig([RollupTable(3_600_000, "1h", rt)])
    span = (EPOCH * 1000, (EPOCH + 7200) * 1000)

    def run(q, **kw):
        r = compile_subquery(pts, q, *span, rollup_cfg=cfg, **kw)
        return {r2["ts"]: r2["value"] for r2 in r.df.collect()}

    ds = DownsampleSpec(3_600_000, "sum")
    # NOFALLBACK (default): answered from the rollup table
    assert list(run(SubQuery(metric="m", aggregator="sum", downsample=ds)).values()) == [999.0]
    # ROLLUP_RAW: forced raw scan
    raw = run(SubQuery(metric="m", aggregator="sum", downsample=ds, rollup_usage="ROLLUP_RAW"))
    assert list(raw.values()) == [pytest.approx(210.0)]
    # non-rewritable aggregator: no valid rollup query -> raw data table
    dev = run(SubQuery(metric="m", aggregator="sum", downsample=DownsampleSpec(3_600_000, "dev")))
    assert list(dev.values())[0] != 999.0


def test_planner_pre_aggregate_store_routing(spark):
    from opentsdb_spark.model import SubQuery, TagFilter
    from opentsdb_spark.plans.planner import compile_subquery

    rows = [("m", 0, 1.0, "a"), ("m", 60, 2.0, "b")]
    raw = _mk_points(spark, rows)
    pre = spark.createDataFrame(
        [("m", EPOCH * 1000, 100.0, {"_aggregate": "SUM"})],
        "metric string, ts_ms long, value double, tags map<string,string>",
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    mixed = raw.unionByName(pre)
    span = (EPOCH * 1000, (EPOCH + 3600) * 1000)

    def total(q):
        r = compile_subquery(mixed, q, *span, agg_tag=True)
        return sum(x["value"] for x in r.df.collect())

    # plain query: raw rows only, pre-agg series invisible
    assert total(SubQuery(metric="m", aggregator="sum")) == pytest.approx(3.0)
    # m= pre-agg flag: groupby store only
    assert total(SubQuery(metric="m", aggregator="sum", pre_aggregate=True)) == pytest.approx(100.0)
    # explicit literal_or on _aggregate (non-RAW) implies pre-agg routing
    assert total(SubQuery(
        metric="m", aggregator="sum",
        filters=(TagFilter("literal_or", "_aggregate", "SUM"),),
    )) == pytest.approx(100.0)


def test_rollup_split(spark):
    pts = _mk_points(spark, [("m", 3600 * i, 1.0, "a") for i in range(4)])
    rt = generate_rollup(pts, 3_600_000, "1h")
    cutoff = (EPOCH + 2 * 3600) * 1000
    out = split_rollup_query(pts, RollupTable(3_600_000, "1h", rt),
                             DownsampleSpec(3_600_000, "sum"), cutoff)
    assert out.count() == 4  # 2 buckets from rollup + 2 from raw
    with pytest.raises(ValueError):
        split_rollup_query(pts, RollupTable(3_600_000, "1h", rt),
                           DownsampleSpec(3_600_000, "sum"), cutoff + 7)


def test_histogram_pipeline(spark):
    # values 0..99 at one timestamp across 2 hosts -> width-10 buckets
    pts = _mk_points(spark, [("m", 0, v, "a" if v % 2 else "b") for v in range(100)])
    hists = synthesize_histograms(pts, 10.0, ("metric", "tags"), 3_600_000)
    assert hists.count() == 2
    merged = merge_histograms(hists, ("metric", "ts"))
    rows = {r["lower"]: r["count"] for r in merged.collect()}
    assert rows[0.0] == 10 and rows[90.0] == 10
    # p50 over 100 uniform values in width-10 buckets: cum hits 50% in bucket
    # [40,50) -> midpoint 45
    p = histogram_percentile(merged, ("metric", "ts"), 50.0).collect()
    assert p[0]["value"] == pytest.approx(45.0)
    p = histogram_percentile(merged, ("metric", "ts"), 99.0).collect()
    assert p[0]["value"] == pytest.approx(95.0)
    with pytest.raises(ValueError):
        histogram_percentile(merged, ("metric", "ts"), 0.5)


def test_annotations(spark):
    rows = [
        (None, (EPOCH + 100) * 1000, (EPOCH + 200) * 1000, "global1"),
        ("m{h=a}", (EPOCH + 150) * 1000, None, "series1"),
        (None, (EPOCH + 5000) * 1000, (EPOCH + 6000) * 1000, "out-of-range"),
    ]
    df = spark.createDataFrame(
        [(t, s, e, d) for t, s, e, d in rows],
        "tsuid string, start_ms long, end_ms long, description string",
    ).select(
        "tsuid",
        F.timestamp_millis("start_ms").alias("start_time"),
        F.timestamp_millis("end_ms").alias("end_time"),
        "description",
    )
    out = annotations_in_range(df, EPOCH * 1000, (EPOCH + 300) * 1000,
                               tsuids=("m{h=a}",), include_global=True)
    descs = sorted(r["description"] for r in out.collect())
    assert descs == ["global1", "series1"]


def test_put_line_parsing(spark):
    lines = spark.createDataFrame(
        [
            ("put sys.cpu.user 1356998400 42.5 host=web01 dc=lga",),
            ("put sys.cpu.user 1356998400500 7 host=web02",),
            ("garbage line",),
            ("put missing.tags 1356998400 1.0",),
        ],
        "value string",
    )
    out = parse_put_lines(lines).collect()
    assert len(out) == 2
    by_host = {r["tags"]["host"]: r for r in out}
    assert by_host["web01"]["value"] == 42.5
    assert by_host["web01"]["tags"] == {"host": "web01", "dc": "lga"}
    assert by_host["web02"]["value_long"] == 7
    assert int(by_host["web02"]["ts"].timestamp() * 1000) == 1356998400500


def test_put_line_validity_limits(spark):
    # IncomingDataPoints.checkMetricAndTags (reference
    # src/core/IncomingDataPoints.java:110-128): >8 tags rejected, illegal
    # characters in metric/tagk/tagv rejected, Unicode letters allowed.
    nine_tags = " ".join(f"k{i}=v{i}" for i in range(9))
    eight_tags = " ".join(f"k{i}=v{i}" for i in range(8))
    lines = spark.createDataFrame(
        [
            (f"put m.ok 1356998400 1.0 {eight_tags}",),
            (f"put m.toomany 1356998400 1.0 {nine_tags}",),
            ("put bad!metric 1356998400 1.0 host=web01",),
            ("put m.badtag 1356998400 1.0 h*st=web01",),
            ("put m.badval 1356998400 1.0 host=web:01",),
            ("put métrica.日本 1356998400 2.0 höst=wèb01",),
        ],
        "value string",
    )
    out = parse_put_lines(lines).collect()
    metrics = sorted(r["metric"] for r in out)
    assert metrics == ["m.ok", "métrica.日本"]


def test_put_line_malformed_tags(spark):
    # Tags.parse rejects 3-field pairs ('a=b=c') and duplicate tag keys with
    # a per-line error (reference src/core/Tags.java parse/parseWithMetric);
    # here those lines drop instead of crashing the job on the map builder's
    # duplicate-key error.
    lines = spark.createDataFrame(
        [
            ("put m.ok 1356998400 1.0 a=b",),
            ("put m.threefield 1356998400 1.0 a=b=c",),
            ("put m.dupkey 1356998400 1.0 a=1 a=2",),
            ("put m.emptyval 1356998400 1.0 a=",),
            ("put m.nots notatime 1.0 a=b",),
            ("put m.noval 1356998400 xyz a=b",),
            ("  put m.ws 1356998400 2.0 a=b  ",),
        ],
        "value string",
    )
    out = parse_put_lines(lines).collect()
    assert sorted(r["metric"] for r in out) == ["m.ok", "m.ws"]


def test_literal_expansion_limit():
    from opentsdb_spark.functions.filters import EXPANSION_LIMIT, _split_literals

    assert _split_literals("|".join(f"v{i}" for i in range(10))) == [f"v{i}" for i in range(10)]
    with pytest.raises(ValueError, match="expansion limit"):
        _split_literals("|".join(f"v{i}" for i in range(EXPANSION_LIMIT + 1)))


def test_streaming_ingest_end_to_end(spark):
    from opentsdb_spark.streaming.ingest import read_put_stream

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        with open(os.path.join(src, "batch1.txt"), "w") as f:
            for i in range(10):
                f.write(f"put m.cpu {EPOCH + i} {i}.0 host=web01\n")
        stream = read_put_stream(spark, path=src)
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("ingest_test")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("SELECT count(*) c FROM ingest_test").collect()[0]["c"]
            assert got == 10
        finally:
            q.stop()


def test_rollup_stream(spark):
    from opentsdb_spark.streaming.ingest import rollup_stream

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b.txt"), "w") as f:
            for i in range(4):
                f.write(f"put m.cpu {EPOCH + 60 * i} {10 * (i + 1)}.0 host=web01\n")
        from opentsdb_spark.streaming.ingest import read_put_stream

        stream = rollup_stream(read_put_stream(spark, path=src), "1 hour", "2 hours")
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("rollup_test")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            # append mode only emits closed windows; with a static file the
            # watermark never advances past the open window -> 0 rows is
            # expected until more data arrives. Just assert the query runs.
            assert q.exception() is None
        finally:
            q.stop()


def test_rollup_json_parse(spark):
    from opentsdb_spark.streaming.ingest import parse_rollup_json

    lines = spark.createDataFrame(
        [('{"metric":"m","timestamp":1356998400,"value":"42.5","tags":{"h":"a"},'
          '"interval":"1h","aggregator":"SUM"}',), ("not json",)],
        "value string",
    )
    out = parse_rollup_json(lines).collect()
    assert len(out) == 1
    r = out[0]
    assert r["aggregator"] == "sum" and r["value"] == 42.5 and r["interval"] == "1h"
    assert int(r["ts"].timestamp()) == 1356998400


def test_histogram_json_parse(spark):
    from opentsdb_spark.operators.histogram import histogram_percentile, merge_histograms
    from opentsdb_spark.streaming.ingest import parse_histogram_json

    lines = spark.createDataFrame(
        [('{"metric":"msg.end2end.latency","timestamp":1356998400,'
          '"buckets":{"0,10":40,"10,20":60},"underflow":0,"overflow":0,'
          '"tags":{"host":"web01"}}',)],
        "value string",
    )
    hists = parse_histogram_json(lines)
    [r] = hists.collect()
    assert [(b["lower"], b["upper"], b["count"]) for b in r["buckets"]] == [
        (0.0, 10.0, 40), (10.0, 20.0, 60)]
    merged = merge_histograms(hists, ("metric", "ts"))
    p = histogram_percentile(merged, ("metric", "ts"), 50.0).collect()
    assert p[0]["value"] == 15.0  # cum 40% < 50 -> bucket [10,20) midpoint


def test_write_points_salted(spark, tmp_path):
    from opentsdb_spark.sources.points import write_points

    pts = _mk_points(spark, [("hot.metric", i, 1.0, f"h{i%3}") for i in range(100)])
    p = str(tmp_path / "salted")
    write_points(pts, p, salt_buckets=4)
    back = spark.read.parquet(p)
    assert back.count() == 100
    assert "dt" in back.columns


def test_compact_points(spark, tmp_path):
    from opentsdb_spark.streaming.ingest import compact_points
    from opentsdb_spark.sources.points import write_points

    pts = _mk_points(spark, [("m", i, float(i), "a") for i in range(50)])
    dup = pts.union(pts.withColumn("value", F.col("value") + 1000))  # duplicates
    src = str(tmp_path / "raw"); dst = str(tmp_path / "compacted")
    dup2 = dup.withColumn("value_long", F.lit(None).cast("long"))
    write_points(dup2, src)
    compact_points(spark, src, dst, target_partitions=2)
    back = spark.read.parquet(dst)
    assert back.count() == 50  # LWW dedup kept one point per (series, ts)
    assert back.agg(F.min("value")).collect()[0][0] == 1000.0  # max-value tiebreak


def test_streaming_stateful_rate(spark):
    from opentsdb_spark.streaming.ingest import read_put_stream
    from opentsdb_spark.streaming.stateful import streaming_rate

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b1.txt"), "w") as f:
            for i in range(5):
                f.write(f"put m.cpu {EPOCH + 30 * i} {30.0 * i} host=web01\n")
        stream = streaming_rate(read_put_stream(spark, path=src))
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("srate")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM srate ORDER BY ts").collect()
            assert len(rows) == 4
            assert all(abs(r["rate"] - 1.0) < 1e-9 for r in rows)
            # second batch: state carries the last point across micro-batches
            with open(os.path.join(src, "b2.txt"), "w") as f:
                f.write(f"put m.cpu {EPOCH + 150} 180.0 host=web01\n")
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM srate ORDER BY ts").collect()
            assert len(rows) == 5
            assert abs(rows[-1]["rate"] - 2.0) < 1e-9  # (180-120)/30s
        finally:
            q.stop()


def test_rollup_stream_emits_closed_windows(spark):
    """Append-mode rollup rows appear once the watermark passes the window
    (second batch far in the future closes the first hour)."""
    from opentsdb_spark.streaming.ingest import read_put_stream, rollup_stream

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b1.txt"), "w") as f:
            for i in range(4):
                f.write(f"put m.cpu {EPOCH + 60 * i} {10 * (i + 1)}.0 host=web01\n")
        stream = rollup_stream(read_put_stream(spark, path=src), "1 hour", "0 seconds")
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("rollup_close")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            with open(os.path.join(src, "b2.txt"), "w") as f:
                f.write(f"put m.cpu {EPOCH + 7200} 1.0 host=web01\n")  # advances watermark
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT aggregator, value FROM rollup_close ORDER BY aggregator"
            ).collect()
            got = {r["aggregator"]: r["value"] for r in rows}
            assert got == {"sum": 100.0, "count": 4.0, "min": 10.0, "max": 40.0}
        finally:
            q.stop()


def test_streaming_doc_dedup_and_gate(spark):
    import json as _json

    from opentsdb_spark.streaming.docs import (
        streaming_exact_dedup, streaming_quality_gate,
    )

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "docs")
        os.makedirs(src)
        rows = [
            {"doc_id": 0, "t": EPOCH, "text": "the quick brown fox jumps over it"},
            {"doc_id": 1, "t": EPOCH + 1, "text": "the quick brown fox jumps over it"},
            {"doc_id": 2, "t": EPOCH + 2, "text": "another document with enough words"},
            {"doc_id": 3, "t": EPOCH + 3, "text": "too short"},
            {"doc_id": 4, "t": EPOCH + 4, "text": "Copyright 2024 all rights reserved junk page footer"},
            {"doc_id": 5, "t": EPOCH + 5, "text": "!!! ??? ### $$$ %%% ^^^ &&& *** ((("},
        ]
        with open(os.path.join(src, "b1.json"), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, t long, text string")
            .json(src)
            .select("doc_id", F.timestamp_seconds("t").alias("ts"), "text")
        )
        gated = streaming_quality_gate(stream)
        deduped = streaming_exact_dedup(gated)
        q = (
            deduped.writeStream.format("memory").queryName("doc_dedup")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM doc_dedup").collect()}
        finally:
            q.stop()
        # 1 is an exact dup of 0; 3 too short; 4 boilerplate; 5 symbol soup
        assert got == {0, 2}


def test_review_fix_regressions(spark, fixture_points):
    """Pins for the round-5 core-engine review fixes."""
    import pytest
    from pyspark.sql import functions as F

    from opentsdb_spark.model import DownsampleSpec, SubQuery, TSQuery
    from opentsdb_spark.plans.planner import compile_query, delete_matching_points
    from opentsdb_spark.sources.points import series_id_col
    from tests.conftest import EPOCH

    # tsuid sub-queries (metric='') must actually delete their series
    sid = fixture_points.select(
        series_id_col("metric", "tags").alias("s")
    ).where("tags['host'] = 'web01'").first()["s"]
    tsq = TSQuery(
        start=str(EPOCH), end=str(EPOCH + 10_000),
        queries=(SubQuery(metric="", aggregator="sum", tsuids=(sid,)),),
    )
    retained = delete_matching_points(fixture_points, tsq)
    assert retained.where("tags['host'] = 'web01'").count() == 0
    assert retained.where("tags['host'] = 'web02'").count() == 300

    # 0all + a fill policy: parses and runs (was ZeroDivisionError)
    tsq0 = TSQuery(
        start=str(EPOCH), end=str(EPOCH + 10_000),
        queries=(SubQuery(
            metric="sys.cpu.user", aggregator="sum",
            downsample=DownsampleSpec(interval_ms=0, aggregator="sum",
                                      run_all=True, fill="zero"),
        ),),
    )
    [r] = compile_query(fixture_points, tsq0)
    assert r.df.count() == 1  # one 0all bucket for the summed group

    # LWW dedup pairs (value, value_long) from ONE winning row
    from opentsdb_spark.streaming.ingest import dedup_last_write_wins

    dup = spark.createDataFrame(
        [("m", 1000, 10.5, None, {"h": "a"}), ("m", 1000, 2.0, 2, {"h": "a"})],
        "metric string, ts_ms long, value double, value_long long, tags map<string,string>",
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"),
             "value", "value_long", "tags")
    [w] = dedup_last_write_wins(dup).collect()
    assert w["value"] == 10.5 and w["value_long"] is None

    # unknown histogram codec raises instead of silently truncating
    from opentsdb_spark.operators.histogram import decode_histogram_points

    raw = spark.createDataFrame([(99, "x")], "codec_id int, raw string")
    with pytest.raises(ValueError, match="unknown histogram codec id 99"):
        decode_histogram_points(raw)

    # a NULL codec id is just as unknown — ~isin() alone is NULL for NULL
    # rows, which would silently drop them from the decode union
    raw_null = spark.createDataFrame([(None, "x")], "codec_id int, raw string")
    with pytest.raises(ValueError, match="unknown histogram codec id None"):
        decode_histogram_points(raw_null)

    # bulk annotation delete without a target is a 400, not a silent no-op
    from opentsdb_spark.operators.annotations import bulk_delete_annotations

    ann = spark.createDataFrame([], "tsuid string, start_time timestamp, "
                                    "end_time timestamp, description string, "
                                    "notes string, custom map<string,string>")
    with pytest.raises(ValueError, match="tsuids.*global|global.*tsuids"):
        bulk_delete_annotations(ann, 0, 10)


def test_streaming_rate_late_point_state():
    """_rate_fn never regresses its cursor on out-of-order points."""
    import pandas as pd

    from opentsdb_spark.streaming.stateful import _rate_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    st = FakeState()
    batch1 = pd.DataFrame({"ts_ms": [100_000], "value": [10.0]})
    list(_rate_fn(("s",), iter([batch1]), st))
    assert st.get == (100_000, 10.0)
    # late point: no output, state unchanged
    late = pd.DataFrame({"ts_ms": [50_000], "value": [5.0]})
    [out] = list(_rate_fn(("s",), iter([late]), st))
    assert len(out) == 0 and st.get == (100_000, 10.0)
    # next in-order point rates against the REAL last point
    nxt = pd.DataFrame({"ts_ms": [110_000], "value": [11.0]})
    [out] = list(_rate_fn(("s",), iter([nxt]), st))
    assert len(out) == 1 and abs(out["rate"][0] - 0.1) < 1e-12


def test_streaming_neardup_sink(spark):
    """MinHash near-dup suppression across micro-batches via the persistent
    band index: a near-identical doc in a LATER batch is dropped; novel
    docs pass; the index survives between runs."""
    import json as _json

    from opentsdb_spark.streaming.docs import streaming_neardup_sink

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away to the deep green forest before dusk settles tonight")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "docs")
        os.makedirs(src)
        out = os.path.join(d, "out")
        idx = os.path.join(d, "index")

        def feed(name, rows):
            with open(os.path.join(src, name), "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")

        def run_once():
            stream = spark.readStream.schema("doc_id long, text string").json(src)
            q = streaming_neardup_sink(
                stream, out, idx, os.path.join(d, "ck")
            ).trigger(availableNow=True).start()
            q.awaitTermination(120)

        feed("b1.json", [
            {"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base},  # in-batch dup of 0 (keep-first)
            {"doc_id": 2, "text": "completely different words about spark "
                                  "engines analytics clusters shuffles and "
                                  "caches in a long enough sentence today"},
        ])
        run_once()
        feed("b2.json", [
            # same content, later batch: every band collides with the
            # index (a one-word variant is probabilistic at 16 bands —
            # raise `bands` to trade shuffle volume for recall)
            {"doc_id": 3, "text": base},
            {"doc_id": 4, "text": "yet another entirely novel document about "
                                  "gardening tulips roses and the weather in "
                                  "spring with plenty of unique words"},
        ])
        run_once()
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {0, 2, 4}


def test_neardup_batch_replay_and_short_docs(spark):
    """Replaying the same batch_id (foreachBatch at-least-once) keeps the
    same survivors; sub-shingle docs pass through un-indexed."""
    import tempfile as _tf

    from opentsdb_spark.streaming.docs import neardup_filter_batch

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    with _tf.TemporaryDirectory() as d:
        idx = os.path.join(d, "idx")
        b = spark.createDataFrame(
            [(0, long_a), (1, long_a), (2, "hi")],  # 1 dups 0; 2 is short
            "doc_id long, text string",
        )
        kept1 = {r["doc_id"] for r in
                 neardup_filter_batch(b, idx, batch_id=7).collect()}
        assert kept1 == {0, 2}
        # crash-replay of the SAME batch: identical keep set, not empty
        kept2 = {r["doc_id"] for r in
                 neardup_filter_batch(b, idx, batch_id=7).collect()}
        assert kept2 == {0, 2}
        # a LATER batch still collides with batch 7's surviving bands
        b2 = spark.createDataFrame([(3, long_a)], "doc_id long, text string")
        kept3 = {r["doc_id"] for r in
                 neardup_filter_batch(b2, idx, batch_id=8).collect()}
        assert kept3 == set()


def test_streaming_incremental_dedup_parity(spark):
    """The signature-index streaming path must reproduce the batch
    operator's verdicts exactly on a two-batch replay: batch 2's verdicts
    equal incremental_dedup_minhash(batch2, kept-batch1 signatures) row for
    row, replaying batch 2 flips nothing, and the sink keeps only
    keep=true docs."""
    import tempfile as _tf

    from opentsdb_spark.pipeline.dedup import (
        incremental_dedup_minhash, minhash_signature,
    )
    from opentsdb_spark.streaming.docs import incremental_dedup_batch

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    t2 = "one two three four five six seven eight nine ten eleven " * 2
    with _tf.TemporaryDirectory() as d:
        idx = os.path.join(d, "sig_idx")
        b1 = spark.createDataFrame(
            [(0, t1), (1, t1), (2, "hi")],  # 1 dups 0 in-batch; 2 short
            "doc_id long, text string",
        )
        v1 = {r["doc_id"]: (r["keep"], r["dup_kind"], r["dup_of"]) for r in
              incremental_dedup_batch(b1, idx, batch_id=1,
                                      threshold=0.5).collect()}
        assert v1 == {0: (True, None, None), 1: (False, "batch", 0),
                      2: (True, None, None)}
        b2 = spark.createDataFrame(
            [(3, t1), (4, t2), (5, t2)],  # 3 dups corpus; 5 dups 4 in-batch
            "doc_id long, text string",
        )

        def snap():
            return {r["doc_id"]: (r["keep"], r["dup_kind"], r["dup_of"],
                                  r["est_jaccard"]) for r in
                    incremental_dedup_batch(b2, idx, batch_id=2,
                                            threshold=0.5).collect()}

        got = snap()
        # the pure batch operator against the same corpus state (kept docs
        # of batch 1 = doc 0 only; doc 2 is short and never indexed)
        want = {r["doc_id"]: (r["keep"], r["dup_kind"], r["dup_of"],
                              r["est_jaccard"]) for r in
                incremental_dedup_minhash(
                    b2, minhash_signature(b1.where("doc_id = 0")),
                    threshold=0.5).collect()}
        assert got == want
        assert got[3] == (False, "corpus", 0, 1.0)
        assert got[4][0] is True and got[5][:3] == (False, "batch", 4)
        # crash-replay of batch 2: identical verdicts (its own index rows
        # are excluded from the corpus side)
        assert snap() == got


@pytest.mark.parametrize("uri_prefix", ["", "file:"])
def test_index_replay_is_idempotent_and_compaction_preserves_verdicts(
        spark, uri_prefix):
    """(a) Replaying a batch must not grow the signature index (dynamic
    partition overwrite rewrites the batch's partition in place); (b)
    compacting the index folds committed batches into one partition
    without changing any later verdict; (c) a replay of the kept
    (uncommitted) batch still excludes its own rows after compaction.
    Parameterized over a bare local path AND a file: URI — the compaction
    swap goes through the Hadoop FileSystem API (round-8's os.rename
    silently skipped compaction for anything but bare local paths), so
    the URI form exercises the exact code path an HDFS/S3 index takes."""
    import tempfile as _tf

    from opentsdb_spark.streaming.docs import (
        compact_index, incremental_dedup_batch,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    t2 = "one two three four five six seven eight nine ten eleven " * 2
    t3 = "red orange yellow green blue indigo violet pink brown black " * 2
    b1 = spark.createDataFrame([(0, t1), (1, t2)], "doc_id long, text string")
    b2 = spark.createDataFrame([(2, t3)], "doc_id long, text string")
    b3 = spark.createDataFrame(  # 3 dups corpus-batch-1; 4 novel
        [(3, t1), (4, "totally fresh words about ships sailing oceans "
                      "under starry skies tonight forever")],
        "doc_id long, text string")

    def run(idx, compact_after_b2):
        incremental_dedup_batch(b1, idx, batch_id=1, threshold=0.5)
        incremental_dedup_batch(b2, idx, batch_id=2, threshold=0.5)
        n_before = spark.read.parquet(idx).count()
        # replay of batch 2 (at-least-once): index must NOT grow
        incremental_dedup_batch(b2, idx, batch_id=2, threshold=0.5)
        assert spark.read.parquet(idx).count() == n_before
        if compact_after_b2:
            assert compact_index(spark, idx, keep_batch_id=2,
                                 max_partitions=1)
            parts = {r["__batch_id"] for r in
                     spark.read.parquet(idx).select("__batch_id").collect()}
            assert parts == {-1, 2}  # batch 1 folded; current batch kept
            assert spark.read.parquet(idx).count() == n_before
            # replay of the KEPT batch post-compaction: own rows excluded
            incremental_dedup_batch(b2, idx, batch_id=2, threshold=0.5)
        v = {r["doc_id"]: (r["keep"], r["dup_kind"], r["dup_of"],
                           r["est_jaccard"]) for r in
             incremental_dedup_batch(b3, idx, batch_id=3,
                                     threshold=0.5).collect()}
        return v

    with _tf.TemporaryDirectory() as d:
        plain = run(uri_prefix + os.path.join(d, "idx_plain"),
                    compact_after_b2=False)
        compacted = run(uri_prefix + os.path.join(d, "idx_compact"),
                        compact_after_b2=True)
    assert compacted == plain
    assert plain[3][:3] == (False, "corpus", 0) and plain[4][0] is True


def test_compaction_crash_recovery_restores_half_swapped_index(spark):
    """A crash BETWEEN the two compaction renames leaves the live index at
    path + '.__compact_old' (and possibly tmp debris). Both the next read
    and the next compaction must restore it — through the Hadoop
    FileSystem API, so the same recovery works beyond local disk."""
    import shutil
    import tempfile as _tf

    from opentsdb_spark.streaming.docs import (
        _read_index_if_exists, compact_index,
    )

    rows = spark.createDataFrame([(0, 11, 1), (1, 22, 2)],
                                 "band int, bh long, __batch_id long")
    with _tf.TemporaryDirectory() as d:
        # recovery via the READ path
        idx = os.path.join(d, "idx")
        rows.write.partitionBy("__batch_id").parquet(idx)
        shutil.move(idx, idx + ".__compact_old")  # simulate the crash point
        got = _read_index_if_exists(spark, "file:" + idx)
        assert got is not None and got.count() == 2
        assert os.path.isdir(idx)  # live path restored on disk
        assert not os.path.isdir(idx + ".__compact_old")
        # recovery via the COMPACTION path (with tmp debris on top)
        idx2 = os.path.join(d, "idx2")
        rows.write.partitionBy("__batch_id").parquet(idx2)
        shutil.move(idx2, idx2 + ".__compact_old")
        os.makedirs(idx2 + ".__compact_tmp")  # crashed mid-write debris
        # under max_partitions: returns False but must still have recovered
        assert compact_index(spark, idx2, max_partitions=64) is False
        assert os.path.isdir(idx2)
        assert not os.path.isdir(idx2 + ".__compact_old")
        assert not os.path.isdir(idx2 + ".__compact_tmp")
        assert spark.read.parquet(idx2).count() == 2


def test_legacy_flat_index_detected_through_hadoop_fs(spark):
    """A pre-partitioned (flat) index must be detected via the Hadoop
    FileSystem API — including through a file: URI, the stand-in for any
    remote filesystem — so _append_index_rows keeps flat-appending instead
    of writing __batch_id= subdirectories into the flat root (which would
    fail every later read with 'Conflicting directory structures')."""
    import tempfile as _tf

    from opentsdb_spark.streaming.docs import (
        _append_index_rows, _legacy_flat_index,
    )

    with _tf.TemporaryDirectory() as d:
        idx = os.path.join(d, "flat_idx")
        rows = spark.createDataFrame([(0, 1, 1)],
                                     "band int, bh long, __batch_id long")
        rows.coalesce(1).write.mode("append").parquet(idx)  # legacy layout
        assert _legacy_flat_index(spark, idx)
        assert _legacy_flat_index(spark, "file:" + idx)  # remote-style URI
        assert not _legacy_flat_index(spark, os.path.join(d, "nope"))
        # an append into a legacy index (addressed by URI) must stay flat:
        # no __batch_id= partition subdirectory may appear in the root
        more = spark.createDataFrame([(1, 2, 7)],
                                     "band int, bh long, __batch_id long")
        _append_index_rows(more, "file:" + idx, batch_id=7)
        assert not any(f.startswith("__batch_id=") for f in os.listdir(idx))
        assert spark.read.parquet(idx).count() == 2  # read still works


def test_neardup_null_batch_id_index_rows_still_collide(spark):
    """Index rows written without a batch_id (NULL) must still count as
    collisions for batched runs (NULL != id is NULL, not true)."""
    import tempfile as _tf

    from opentsdb_spark.streaming.docs import neardup_filter_batch

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    with _tf.TemporaryDirectory() as d:
        idx = os.path.join(d, "idx")
        seed = spark.createDataFrame([(0, text)], "doc_id long, text string")
        neardup_filter_batch(seed, idx)  # batch_id=None -> NULL rows
        # a SECOND no-batch-id call must ACCUMULATE into the null
        # partition, not overwrite it (dynamic overwrite would silently
        # wipe doc 0's bands here)
        seed2 = spark.createDataFrame([(5, other)], "doc_id long, text string")
        neardup_filter_batch(seed2, idx)
        b = spark.createDataFrame([(1, text), (6, other)],
                                  "doc_id long, text string")
        kept = neardup_filter_batch(b, idx, batch_id=3).collect()
        assert kept == []  # BOTH seeded calls must suppress their clones


def test_streaming_sessions(spark):
    from opentsdb_spark.streaming.ingest import read_put_stream
    from opentsdb_spark.streaming.stateful import streaming_sessions

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        with open(os.path.join(src, "batch1.txt"), "w") as f:
            # session 1: three events 60s apart; session 2 after a 45-min
            # gap; a final event 6h later advances the watermark past both
            for i in range(3):
                f.write(f"put m.s {EPOCH + 60 * i} 1.0 host=web01\n")
            f.write(f"put m.s {EPOCH + 2820} 5.0 host=web01\n")
            f.write(f"put m.s {EPOCH + 21600} 9.0 host=web01\n")
        stream = streaming_sessions(read_put_stream(spark, path=src),
                                    gap="30 minutes", watermark="10 minutes")
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("sessions_test")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT * FROM sessions_test ORDER BY session_start"
            ).collect()
        finally:
            q.stop()
        # both closed sessions emitted (the 6h event's session stays open)
        assert len(rows) == 2
        s1, s2 = rows
        assert s1["n_events"] == 3 and abs(s1["sum_value"] - 3.0) < 1e-9
        assert s2["n_events"] == 1 and abs(s2["sum_value"] - 5.0) < 1e-9
        # session window = [first_event, last_event + gap)
        assert (s1["session_end"] - s1["last_ts"]).total_seconds() == 1800


def test_streaming_hll_registers(spark):
    """The sparse HLL register build (pipeline.sketch.hll_registers) is a
    plain watermarked max aggregate, so it runs unchanged as a Structured
    Streaming windowed aggregation: append mode emits each window's
    registers once the watermark closes it, and hll_estimate over the
    materialized sink equals the batch pipeline on the same rows."""
    import json as _json

    from opentsdb_spark.pipeline.sketch import hll_estimate, hll_registers

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "toks")
        os.makedirs(src)
        rows = [{"t": EPOCH + i, "token": f"tok{i % 57}"} for i in range(500)]
        with open(os.path.join(src, "b1.json"), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        stream = (
            spark.readStream.schema("t long, token string").json(src)
            .select(F.timestamp_seconds("t").alias("ts"), "token")
            .withWatermark("ts", "10 seconds")
            .select(F.window("ts", "1 hour").alias("w"), "token")
        )
        regs = hll_registers(stream, ("w",), "token", p=10)
        q = (
            regs.writeStream.format("memory").outputMode("append")
            .queryName("hll_regs")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            with open(os.path.join(src, "b2.json"), "w") as f:
                f.write(_json.dumps({"t": EPOCH + 7200, "token": "flush"}) + "\n")
            q.processAllAvailable()
            sink = spark.sql(
                f"SELECT w, bucket, r FROM hll_regs "
                f"WHERE w.start = timestamp_seconds({EPOCH})")
            [got] = hll_estimate(sink, ("w",), p=10).collect()
        finally:
            q.stop()
        batch = spark.createDataFrame(
            [(r["token"],) for r in rows], "token string"
        ).withColumn("g", F.lit("x"))
        [want] = hll_estimate(
            hll_registers(batch, ("g",), "token", p=10), ("g",), p=10
        ).collect()
        assert got["est"] == want["est"]
        assert got["v_zero"] == want["v_zero"]
        assert got["reg_sum"] == want["reg_sum"]
        # sanity: 57 distinct tokens, estimate in range
        assert abs(want["est"] - 57) / 57 < 0.15


def test_streaming_source_mix_matches_batch_report(spark):
    """Closed windows emit per-(window, source) counts equal to the batch
    source_mix_report on the same feed; a document later than the
    watermark is dropped by the engine and never counted."""
    import json as _json

    from opentsdb_spark.pipeline.text import source_mix_report
    from opentsdb_spark.streaming.docs import streaming_source_mix

    good = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to the deep green forest before dusk settles in")
    bad = "x y"  # fails the word-count gate
    rows = [
        (0, "s1", EPOCH + 60, good), (1, "s1", EPOCH + 120, bad),
        (2, "s2", EPOCH + 200, good),
        (3, "s1", EPOCH + 3660, good),  # second window
    ]
    late = (4, "s2", EPOCH + 30, good)  # arrives after watermark passed
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)

        def feed(name, rs):
            with open(os.path.join(src, name), "w") as f:
                for i, s, t, x in rs:
                    f.write(_json.dumps(
                        {"doc_id": i, "source": s, "ts": t, "text": x}) + "\n")

        stream = streaming_source_mix(
            spark.readStream.schema(
                "doc_id long, source string, ts long, text string")
            .json(src)
            .withColumn("ts", F.timestamp_seconds("ts")),
            window="1 hour", watermark="10 minutes",
        )
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("smix")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            feed("b1.json", rows)
            q.processAllAvailable()
            # push the watermark past every window END (late filtering
            # keys on the window column: a row is dropped only once its
            # whole window is older than the watermark)
            feed("b2.json", [(5, "s3", EPOCH + 99_999, good)])
            q.processAllAvailable()
            # the late doc's window closed and was emitted — it must be
            # dropped, not resurrect a second window-1 s2 row
            feed("b3.json", [late])
            q.processAllAvailable()
        finally:
            q.stop()
        out_rows = spark.sql("select * from smix").collect()
        keys = [(int(r["win"]["start"].timestamp()), r["source"])
                for r in out_rows]
        assert len(keys) == len(set(keys))  # one append row per closed key
        got = {
            (int(r["win"]["start"].timestamp()), r["source"]):
                (r["n_docs"], r["n_kept"], r["kept_words"])
            for r in out_rows
        }
    batch = spark.createDataFrame(
        [(i, s, x) for i, s, t, x in rows], "doc_id long, source string, text string")
    # window 1 (EPOCH hour): s1 = docs 0,1 (1 kept), s2 = doc 2
    h = EPOCH - EPOCH % 3600
    [w1s1] = [v for k, v in got.items() if k == (h, "s1")]
    assert w1s1[0] == 2 and w1s1[1] == 1 and w1s1[2] > 0
    assert got[(h, "s2")][0] == 1  # the late doc was dropped
    assert got[(h + 3600, "s1")] == (1, 1, got[(h + 3600, "s1")][2])
    # cross-check totals per source vs the batch report (late doc absent
    # from the feed frame too)
    agg = {}
    for (w, s), (n, k, kw) in got.items():
        if w > h + 3600:
            continue  # the watermark-push sentinel doc
        a = agg.setdefault(s, [0, 0, 0])
        a[0] += n; a[1] += k; a[2] += kw
    for r in source_mix_report(batch).collect():
        assert agg[r["source"]] == [r["n_docs"], r["n_kept"], r["kept_words"]], r


def _ann_vecs(n0: int, n1: int, dim: int = 8, seed: int = 5):
    """Deterministic pseudo-random vectors [(id, vec)] for ids n0..n1-1."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n0, n1):
        rows.append((i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)]))
    return rows


_ANN_KW = dict(k=3, tables=4, bits=4, dim=8, seed=11, bit_exact=True)


def test_streaming_ann_matches_batch_lsh_topk(spark):
    """Streamed per-batch ANN verdicts must equal the batch lsh_topk run
    against the prefix corpus (same tables/bits/seed -> same candidates,
    same exact cosines, same id tie-breaks); the first batch sees an
    empty corpus; a crash-replay of a batch flips nothing and does not
    grow either index."""
    import tempfile as _tf

    from opentsdb_spark.pipeline.similarity import lsh_topk
    from opentsdb_spark.streaming.embeddings import ann_index_batch

    b1 = spark.createDataFrame(_ann_vecs(0, 6),
                               "vec_id long, embedding array<double>")
    b2 = spark.createDataFrame(_ann_vecs(6, 10),
                               "vec_id long, embedding array<double>")
    b3 = spark.createDataFrame(_ann_vecs(10, 14),
                               "vec_id long, embedding array<double>")

    def batch_want(corpus_df, batch_df):
        return sorted(map(tuple, lsh_topk(
            corpus_df,
            batch_df.select(F.col("vec_id").alias("query_id"), "embedding"),
            **_ANN_KW).collect()))

    with _tf.TemporaryDirectory() as d:
        bidx = os.path.join(d, "buckets")
        vidx = os.path.join(d, "vecs")

        def stream_got(batch_df, bid):
            return sorted(map(tuple, ann_index_batch(
                batch_df, bidx, vidx, batch_id=bid, **_ANN_KW).collect()))

        assert stream_got(b1, 1) == []  # empty corpus: novel by definition
        got2 = stream_got(b2, 2)
        assert got2 == batch_want(b1, b2) and got2
        nb = spark.read.parquet(bidx).count()
        nv = spark.read.parquet(vidx).count()
        # crash-replay of batch 2: identical verdicts, indexes unchanged
        assert stream_got(b2, 2) == got2
        assert spark.read.parquet(bidx).count() == nb
        assert spark.read.parquet(vidx).count() == nv
        got3 = stream_got(b3, 3)
        assert got3 == batch_want(b1.unionByName(b2), b3) and got3


def test_streaming_ann_compaction_preserves_verdicts(spark):
    """Folding committed batches into one index partition must not change
    any later verdict (the row SET is identical), for BOTH indexes."""
    import tempfile as _tf

    from opentsdb_spark.streaming.docs import compact_index
    from opentsdb_spark.streaming.embeddings import ann_index_batch

    b1 = spark.createDataFrame(_ann_vecs(0, 6),
                               "vec_id long, embedding array<double>")
    b2 = spark.createDataFrame(_ann_vecs(6, 10),
                               "vec_id long, embedding array<double>")
    b3 = spark.createDataFrame(_ann_vecs(10, 14),
                               "vec_id long, embedding array<double>")

    def run(d, compact):
        bidx, vidx = os.path.join(d, "b"), os.path.join(d, "v")
        ann_index_batch(b1, bidx, vidx, batch_id=1, **_ANN_KW)
        ann_index_batch(b2, bidx, vidx, batch_id=2, **_ANN_KW)
        if compact:
            assert compact_index(spark, bidx, keep_batch_id=2,
                                 max_partitions=1)
            assert compact_index(spark, vidx, keep_batch_id=2,
                                 max_partitions=1)
            # replay of the kept batch post-compaction still excludes
            # its own rows
            ann_index_batch(b2, bidx, vidx, batch_id=2, **_ANN_KW)
        return sorted(map(tuple, ann_index_batch(
            b3, bidx, vidx, batch_id=3, **_ANN_KW).collect()))

    with _tf.TemporaryDirectory() as d1, _tf.TemporaryDirectory() as d2:
        assert run(d1, False) == run(d2, True)


def test_streaming_ann_rearriving_id_first_write_wins(spark):
    """A vec_id re-arriving in a later batch must NOT append a second
    index row: the duplicate would join twice at candidate scoring and
    occupy two of the k top-k slots, diverging from batch lsh_topk.
    First write wins — the index keeps the original embedding, and later
    verdicts equal the batch run on the first-write corpus."""
    import tempfile as _tf

    from opentsdb_spark.pipeline.similarity import lsh_topk
    from opentsdb_spark.streaming.embeddings import ann_index_batch

    b1 = spark.createDataFrame(_ann_vecs(0, 6),
                               "vec_id long, embedding array<double>")
    # batch 2 re-sends id 2 with a DIFFERENT embedding alongside new ids
    b2 = spark.createDataFrame(
        _ann_vecs(6, 10) + [(2, [9.0] * 8)],
        "vec_id long, embedding array<double>")
    b3 = spark.createDataFrame(_ann_vecs(10, 14),
                               "vec_id long, embedding array<double>")
    with _tf.TemporaryDirectory() as d:
        bidx, vidx = os.path.join(d, "b"), os.path.join(d, "v")
        ann_index_batch(b1, bidx, vidx, batch_id=1, **_ANN_KW)
        ann_index_batch(b2, bidx, vidx, batch_id=2, **_ANN_KW)
        vid = spark.read.parquet(vidx)
        assert vid.count() == vid.select("vec_id").distinct().count() == 10
        [kept] = vid.where("vec_id = 2").collect()
        [orig] = [v for i, v in _ann_vecs(0, 6) if i == 2]
        assert list(kept["embedding"]) == orig  # first write won
        # bucket index carries each id's keys exactly once per table
        bkt = spark.read.parquet(bidx).where("vec_id = 2")
        assert bkt.count() == _ANN_KW["tables"]
        # and batch-3 verdicts equal batch lsh_topk on the first-write
        # corpus (b1 + b2's genuinely-new ids)
        corpus = b1.unionByName(b2.where("vec_id >= 6"))
        want = sorted(map(tuple, lsh_topk(
            corpus,
            b3.select(F.col("vec_id").alias("query_id"), "embedding"),
            **_ANN_KW).collect()))
        got = sorted(map(tuple, ann_index_batch(
            b3, bidx, vidx, batch_id=3, **_ANN_KW).collect()))
        assert got == want and got


def test_streaming_ann_sink_end_to_end(spark):
    """foreachBatch wiring: verdicts land in the output parquet batch by
    batch through a real file-source stream."""
    import json as _json

    from opentsdb_spark.pipeline.similarity import lsh_topk
    from opentsdb_spark.streaming.embeddings import streaming_ann_sink

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "emb")
        os.makedirs(src)
        out = os.path.join(d, "out")

        def feed(name, rows):
            with open(os.path.join(src, name), "w") as f:
                for vid, vec in rows:
                    f.write(_json.dumps(
                        {"vec_id": vid, "embedding": vec}) + "\n")

        def run_once():
            stream = spark.readStream.schema(
                "vec_id long, embedding array<double>").json(src)
            q = streaming_ann_sink(
                stream, out, os.path.join(d, "b"), os.path.join(d, "v"),
                os.path.join(d, "ck"), **_ANN_KW,
            ).trigger(availableNow=True).start()
            q.awaitTermination(120)

        feed("b1.json", _ann_vecs(0, 6))
        run_once()
        feed("b2.json", _ann_vecs(6, 10))
        run_once()
        got = sorted(map(tuple, spark.read.parquet(out).collect()))
        want = sorted(map(tuple, lsh_topk(
            spark.createDataFrame(_ann_vecs(0, 6),
                                  "vec_id long, embedding array<double>"),
            spark.createDataFrame(_ann_vecs(6, 10),
                                  "vec_id long, embedding array<double>")
            .select(F.col("vec_id").alias("query_id"), "embedding"),
            **_ANN_KW).collect()))
        assert got == want and got


def test_streaming_zscore_equals_batch(spark):
    """The streamed trailing z-score must equal the BATCH anomaly_zscore
    bit-for-bit on the same in-order feed (the streaming==batch proof
    pattern), including warm-up NULLs and flags — across a micro-batch
    boundary so state round-trips through the store."""
    from opentsdb_spark.operators.expressions import anomaly_zscore
    from opentsdb_spark.streaming.ingest import read_put_stream
    from opentsdb_spark.streaming.stateful import streaming_zscore

    vals = [10.0, 11.0, 10.5, 10.2, 10.8, 10.4, 100.0, 10.6, 10.3, 10.7]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        # two files written AROUND a processAllAvailable -> two
        # micro-batches: state crosses the boundary through the store
        with open(os.path.join(src, "b1.txt"), "w") as f:
            for i, v in enumerate(vals[:6]):
                f.write(f"put m.lat {EPOCH + 60 * i} {v} host=web01\n")
        stream = streaming_zscore(
            read_put_stream(spark, path=src),
            lookback=5, threshold=2.0, min_points=3,
        )
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("szscore")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            with open(os.path.join(src, "b2.txt"), "w") as f:
                for i, v in enumerate(vals[6:], start=6):
                    f.write(f"put m.lat {EPOCH + 60 * i} {v} host=web01\n")
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            int(r["ts"].timestamp()): r
            for r in spark.sql("select * from szscore").collect()
        }
    batch_df = spark.createDataFrame(
        [("s", EPOCH + 60 * i, v) for i, v in enumerate(vals)],
        "series_id string, ts long, value double",
    )
    want = {
        int(r["ts"]): r
        for r in anomaly_zscore(batch_df, ("series_id",), lookback=5,
                                threshold=2.0, min_points=3).collect()
    }
    assert set(got) == set(want) and len(got) == len(vals)
    for ts, w in want.items():
        g = got[ts]
        assert g["is_anomaly"] == w["is_anomaly"], ts
        if w["zscore"] is None:
            assert g["zscore"] is None, ts
        else:
            assert g["zscore"] == w["zscore"], (ts, g["zscore"], w["zscore"])
    # the spike got flagged somewhere
    assert any(r["is_anomaly"] for r in got.values())


def test_streaming_zscore_null_nan_points_dropped(spark):
    """NULL/NaN-valued points must be dropped at the keyed select — they
    neither emit a row nor enter the trailing window nor occupy a window
    SLOT — so streamed == batch-on-the-prefiltered-feed holds on feeds
    with gaps (ADVICE r9; batch's rows-window would count a NULL row as a
    frame slot, so pre-filtering is the equivalence contract)."""
    import json as _json

    from opentsdb_spark.operators.expressions import anomaly_zscore
    from opentsdb_spark.streaming.stateful import streaming_zscore

    vals = [10.0, 11.0, None, 10.2, float("nan"), 10.4, 50.0, 10.6]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        with open(os.path.join(src, "b1.json"), "w") as f:
            for i, v in enumerate(vals):
                rec = {"metric": "m.lat", "tags": {"host": "web01"},
                       "ts": EPOCH + 60 * i,
                       "value": "NaN" if v is not None and v != v else v}
                f.write(_json.dumps(rec) + "\n")
        pts = (
            spark.readStream.schema(
                "metric string, tags map<string,string>, ts long, value double"
            )
            .json(src)
            .withColumn("ts", F.timestamp_seconds("ts"))
        )
        stream = streaming_zscore(pts, lookback=4, threshold=2.0, min_points=2)
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("szscore_null")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            int(r["ts"].timestamp()): r
            for r in spark.sql("select * from szscore_null").collect()
        }
    # batch on the PRE-FILTERED feed (null/NaN removed before the
    # operator — the documented equivalence contract; a NULL row left in
    # place would still occupy a rows-window slot batch-side)
    batch_df = spark.createDataFrame(
        [("s", EPOCH + 60 * i, v) for i, v in enumerate(vals)
         if v is not None and v == v],
        "series_id string, ts long, value double",
    )
    want = {
        int(r["ts"]): r
        for r in anomaly_zscore(batch_df, ("series_id",), lookback=4,
                                threshold=2.0, min_points=2).collect()
    }
    assert set(got) == set(want) and len(got) == 6  # 8 points - None - NaN
    for ts, w in want.items():
        assert got[ts]["zscore"] == w["zscore"], ts
        assert got[ts]["is_anomaly"] == w["is_anomaly"], ts
    assert any(r["is_anomaly"] for r in got.values())


def test_streaming_zscore_late_point_state():
    """Late points emit nothing and never regress the cursor or window."""
    import pandas as pd

    from opentsdb_spark.streaming.stateful import _make_zscore_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists = True
            self._v = v

    fn = _make_zscore_fn(3, 2.0, 2)
    st = FakeState()
    b1 = pd.DataFrame({"ts_ms": [60_000, 120_000, 180_000],
                       "value": [1.0, 2.0, 3.0]})
    [out] = list(fn(("s",), iter([b1]), st))
    assert len(out) == 3 and st.get[0] == 180_000
    assert list(st.get[1]) == [1.0, 2.0, 3.0]
    late = pd.DataFrame({"ts_ms": [120_000], "value": [99.0]})
    [out] = list(fn(("s",), iter([late]), st))
    assert len(out) == 0 and st.get[0] == 180_000
    assert list(st.get[1]) == [1.0, 2.0, 3.0]
    # window trims to lookback on the next in-order point
    nxt = pd.DataFrame({"ts_ms": [240_000], "value": [4.0]})
    [out] = list(fn(("s",), iter([nxt]), st))
    assert len(out) == 1 and list(st.get[1]) == [2.0, 3.0, 4.0]
    assert out["zscore"][0] == (4.0 - 2.0) / 1.0  # mean 2, var 1 over [1,2,3]


def test_streaming_burn_rate_equals_batch(spark):
    """The streamed multi-window burn rate must equal the BATCH
    slo_burn_rate bit-for-bit on the same in-order feed — burns, NULLs
    and flags — across a micro-batch boundary so the (bads, tots) state
    round-trips through the store; a late bucket is dropped without
    touching state."""
    import json as _json

    from opentsdb_spark.operators.expressions import slo_burn_rate
    from opentsdb_spark.streaming.stateful import streaming_burn_rate

    rows = [
        (0, 2, 10), (1, 3, 10), (2, 0, 0), (3, 0, 0),
        (4, 5, 10), (5, 5, 10), (6, 0, 10), (7, 1, 10),
    ]
    late = (1, 9, 9)  # event time behind the cursor -> dropped
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)

        def feed(name, rs):
            with open(os.path.join(src, name), "w") as f:
                for i, b, t in rs:
                    f.write(_json.dumps(
                        {"m": "api", "ts": EPOCH + 3600 * i,
                         "bad": b, "total": t}) + "\n")

        buckets = (
            spark.readStream
            .schema("m string, ts long, bad long, total long")
            .json(src)
            .withColumn("ts", F.timestamp_seconds("ts"))
        )
        stream = streaming_burn_rate(
            buckets, short_window=2, long_window=4,
            error_budget=0.2, factor=1.5, series_col="m")
        q = (
            stream.writeStream.format("memory").outputMode("append")
            .queryName("sburn")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            feed("b1.json", rows[:4])
            q.processAllAvailable()
            feed("b2.json", rows[4:] + [late])
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            int(r["ts"].timestamp()): r
            for r in spark.sql("select * from sburn").collect()
        }
    spark.catalog.dropTempView("sburn")
    batch = spark.createDataFrame(
        [("api", EPOCH + 3600 * i, b, t) for i, b, t in rows],
        "metric string, ts long, bad long, total long")
    want = {
        int(r["ts"]): r
        for r in slo_burn_rate(batch, ("metric",), short_window=2,
                               long_window=4, error_budget=0.2,
                               factor=1.5).collect()
    }
    assert set(got) == set(want) and len(got) == len(rows)  # late dropped
    for ts, w in want.items():
        g = got[ts]
        assert g["is_burning"] == w["is_burning"], ts
        for c in ("burn_short", "burn_long"):
            if w[c] is None:
                assert g[c] is None, (ts, c)
            else:
                assert g[c] == w[c], (ts, c, g[c], w[c])
    assert any(r["is_burning"] for r in got.values())
    assert any(r["burn_short"] is None for r in got.values())  # 0-traffic


def test_streaming_components_match_full_cc_and_replay(spark):
    """Streamed label maintenance: after any batch sequence the resolved
    labels equal the one-shot connected_components over all edges seen —
    including a batch that MERGES two earlier components under a new min
    — a crash-replay of a batch flips nothing and does not grow the
    index, and compaction preserves the latest-wins resolution (the
    version rides in the rows, not the folded partition column)."""
    import tempfile as _tf

    from opentsdb_spark.pipeline.cluster import connected_components
    from opentsdb_spark.streaming.components import (
        components_update_batch, resolve_labels)
    from opentsdb_spark.streaming.docs import compact_index

    b1 = [(10, 11), (20, 21)]          # two components: min 10, min 20
    b2 = [(11, 20), (30, 31)]          # merges them under 10; new clique
    b3 = [(1, 21)]                     # relabels the merged comp to 1
    edges = lambda rs: spark.createDataFrame(rs, "id_a long, id_b long")

    def resolved(path):
        return {r["id"]: r["component"]
                for r in resolve_labels(spark, path).collect()}

    def full(rs):
        return {r["id"]: r["component"]
                for r in connected_components(edges(rs)).collect()}

    with _tf.TemporaryDirectory() as d:
        path = os.path.join(d, "labels")
        components_update_batch(edges(b1), path, batch_id=1)
        assert resolved(path) == full(b1)
        d2 = components_update_batch(edges(b2), path, batch_id=2)
        assert resolved(path) == full(b1 + b2)
        # the merge batch rewrote the 20-component's labels
        assert {r["id"] for r in d2.collect()} >= {20, 21, 30, 31}
        n_rows = spark.read.parquet(path).count()
        # crash replay: identical resolution, index unchanged
        components_update_batch(edges(b2), path, batch_id=2)
        assert resolved(path) == full(b1 + b2)
        assert spark.read.parquet(path).count() == n_rows
        # compaction folds partitions; latest-wins must survive
        assert compact_index(spark, path, keep_batch_id=2, max_partitions=1)
        assert resolved(path) == full(b1 + b2)
        d3 = components_update_batch(edges(b3), path, batch_id=3)
        assert resolved(path) == full(b1 + b2 + b3)
        # the relabel-to-1 touched every member of the merged component
        assert {r["component"] for r in d3.collect()} == {1}


def test_streaming_components_sink_end_to_end(spark):
    """foreachBatch wiring: label deltas land batch by batch through a
    real file-source stream and the final resolution equals full CC."""
    import json as _json
    import tempfile as _tf

    from opentsdb_spark.pipeline.cluster import connected_components
    from opentsdb_spark.streaming.components import (
        resolve_labels, streaming_components_sink)

    batches = [[(0, 1), (2, 3)], [(1, 2)], [(4, 5)]]
    with _tf.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        pairs = spark.readStream.schema("id_a long, id_b long").json(src)
        q = streaming_components_sink(
            pairs, os.path.join(d, "out"), os.path.join(d, "labels"),
            os.path.join(d, "ck"), compact_after=2).start()
        try:
            for i, b in enumerate(batches):
                with open(os.path.join(src, f"b{i}.json"), "w") as f:
                    for a, bb in b:
                        f.write(_json.dumps({"id_a": a, "id_b": bb}) + "\n")
                q.processAllAvailable()
        finally:
            q.stop()
        got = {r["id"]: r["component"] for r in
               resolve_labels(spark, os.path.join(d, "labels")).collect()}
        allp = [e for b in batches for e in b]
        want = {r["id"]: r["component"] for r in connected_components(
            spark.createDataFrame(allp, "id_a long, id_b long")).collect()}
        assert got == want
        out = spark.read.parquet(os.path.join(d, "out"))
        assert out.count() >= len(want)  # every final label was a delta once


def test_components_direct_update_wins_latest(spark):
    """Direct (batch_id=None) label updates must WIN latest-wins
    resolution over earlier numbered batches, and two successive direct
    calls must resolve deterministically to the later one (advisor
    finding: the old constant __ver=-1 sorted below every numbered batch
    and tied direct calls with each other)."""
    import tempfile as _tf

    from opentsdb_spark.streaming.components import (
        components_update_batch, resolve_labels)

    edges = lambda rs: spark.createDataFrame(rs, "id_a long, id_b long")

    def resolved(path):
        return {r["id"]: r["component"]
                for r in resolve_labels(spark, path).collect()}

    with _tf.TemporaryDirectory() as d:
        path = os.path.join(d, "labels")
        components_update_batch(edges([(10, 11), (20, 21)]),
                                path, batch_id=0)
        components_update_batch(edges([(30, 31)]), path, batch_id=1)
        # direct relabel AFTER numbered batches: merges 10- and 20-comps
        components_update_batch(edges([(11, 20)]), path)
        got = resolved(path)
        assert got[10] == got[11] == got[20] == got[21] == 10
        # second direct relabel must beat the first (monotone __ver)
        components_update_batch(edges([(1, 21)]), path)
        got = resolved(path)
        assert got[1] == got[10] == got[21] == 1
        vers = {r["__ver"] for r in
                spark.read.parquet(path).select("__ver").collect()}
        assert vers == {0, 1, 2, 3}  # derived max+1, never -1
