"""End-to-end slice tests (SURVEY.md §7.1)."""

import math

import pytest
from pyspark.sql import functions as F

from opentsdb_spark.model import DownsampleSpec, RateOptions, SubQuery, TagFilter, TSQuery
from opentsdb_spark.operators.downsample import downsample
from opentsdb_spark.operators.groupby import cross_series_aggregate
from opentsdb_spark.operators.rate import rate
from opentsdb_spark.plans.planner import compile_query
from opentsdb_spark.serializer import serialize_subquery
from opentsdb_spark.timeparse import parse_datetime_ms, parse_downsample_interval, parse_duration_ms
from tests.conftest import EPOCH


def test_timeparse():
    assert parse_duration_ms("5m") == 300_000
    assert parse_datetime_ms("1h-ago", now_ms=10_000_000_000_000) == 10_000_000_000_000 - 3_600_000
    assert parse_datetime_ms("now", now_ms=42) == 42
    assert parse_datetime_ms(1356998400) == 1356998400 * 1000
    assert parse_datetime_ms("1356998400500") == 1356998400500
    assert parse_datetime_ms("2013/01/01-00:00:00") == 1356998400 * 1000
    assert parse_datetime_ms("2013/01/01", tz="America/New_York") == 1356998400 * 1000 + 5 * 3600 * 1000
    assert parse_downsample_interval("10m") == (600_000, False, "m", 10)
    assert parse_downsample_interval("1dc") == (86_400_000, True, "d", 1)
    assert parse_downsample_interval("0all") == (0, False, None, 0)


def test_filters(fixture_points):
    tags = F.col("tags")
    from opentsdb_spark.functions.filters import build_tag_filter

    n = fixture_points.where(build_tag_filter(tags, "literal_or", "host", "web01")).count()
    assert n == 300
    n = fixture_points.where(build_tag_filter(tags, "iliteral_or", "host", "WEB01|WEB02")).count()
    assert n == 600
    n = fixture_points.where(build_tag_filter(tags, "not_literal_or", "host", "web01")).count()
    assert n == 300
    n = fixture_points.where(build_tag_filter(tags, "wildcard", "host", "web*")).count()
    assert n == 600
    n = fixture_points.where(build_tag_filter(tags, "regexp", "host", "web0[2-9]")).count()
    assert n == 300
    n = fixture_points.where(build_tag_filter(tags, "not_key", "missing", "")).count()
    assert n == 600
    n = fixture_points.where(build_tag_filter(tags, "not_key", "host", "")).count()
    assert n == 0


def test_downsample_10m_sum(fixture_points):
    spec = DownsampleSpec(interval_ms=600_000, aggregator="sum")
    out = downsample(fixture_points, spec).where(F.col("tags")["host"] == "web01")
    rows = {r["ts"].timestamp(): r["value"] for r in out.collect()}
    # web01: values 1..300 at EPOCH+30*(i+1); bucket EPOCH..EPOCH+600 holds
    # i+1 for 30*(i+1) in [0,600) -> values 1..19 -> sum 190
    assert rows[EPOCH] == sum(range(1, 20))
    assert rows[EPOCH + 600] == sum(range(20, 40))


def test_downsample_fill_zero(spark):
    rows = [("m", (EPOCH + 0) * 1000, 1.0, {"h": "a"}), ("m", (EPOCH + 120) * 1000, 3.0, {"h": "a"})]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double, tags map<string,string>")
    df = df.select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    spec = DownsampleSpec(interval_ms=60_000, aggregator="sum", fill="zero")
    out = downsample(df, spec, start_ms=EPOCH * 1000, end_ms=(EPOCH + 240) * 1000)
    vals = {r["ts"].timestamp(): r["value"] for r in out.collect()}
    assert vals == {EPOCH: 1.0, EPOCH + 60: 0.0, EPOCH + 120: 3.0, EPOCH + 180: 0.0}


def test_linear_rewrite_null_group_values(spark):
    """The linear rewrite's group-level zero fill must keep REAL sums when
    the group-by tag value is NULL (e.g. a not_key group): a plain join
    on the group columns never matches null keys and silently zeroed
    every bucket — the fill merge has to treat nulls as equal."""
    rows = [("m", 1000 * 3600 * 1000, 10.0, {"dc": "x"}),
            ("m", 1001 * 3600 * 1000, 20.0, {"dc": "x"}),
            ("m", 1002 * 3600 * 1000, 40.0, {"dc": "y"})]
    pts = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, tags map<string,string>"
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value",
             F.lit(None).cast("long").alias("value_long"), "tags")
    tsq = TSQuery(
        start=1000 * 3600, end=1004 * 3600,
        queries=(SubQuery(
            metric="m", aggregator="sum",
            downsample=DownsampleSpec(3_600_000, "sum", fill="zero"),
            filters=(TagFilter("not_key", "host", "", group_by=True),),
        ),),
    )
    [r] = compile_query(pts, tsq)
    vals = {r["ts"].timestamp() // 3600: r["value"]
            for r in r.df.collect()}
    assert vals == {1000: 10.0, 1001: 20.0, 1002: 40.0, 1003: 0.0}


def test_downsample_0all(fixture_points):
    spec = DownsampleSpec(interval_ms=0, aggregator="max", run_all=True)
    out = downsample(fixture_points, spec, start_ms=EPOCH * 1000, end_ms=(EPOCH + 10**6) * 1000)
    vals = {r["tags"]["host"]: r["value"] for r in out.collect()}
    assert vals == {"web01": 300.0, "web02": 300.0}


def test_rate(spark):
    # 30s spacing, +30 per step -> rate 1.0/s; counter rollover case
    rows = [("m", (EPOCH + 30 * i) * 1000, float(30 * i), {"h": "a"}) for i in range(5)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double, tags map<string,string>")
    df = df.select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    out = rate(df).orderBy("ts").collect()
    assert len(out) == 4
    assert all(abs(r["value"] - 1.0) < 1e-12 for r in out)

    # counter reset: 10, 20, 5 with counter_max=256 -> diff = 256-20+5 = 241
    rows = [("m", EPOCH * 1000, 10.0, {"h": "a"}), ("m", (EPOCH + 10) * 1000, 20.0, {"h": "a"}),
            ("m", (EPOCH + 20) * 1000, 5.0, {"h": "a"})]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double, tags map<string,string>")
    df = df.select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    out = rate(df, RateOptions(counter=True, counter_max=256)).orderBy("ts").collect()
    assert [round(r["value"], 6) for r in out] == [1.0, 24.1]
    out = rate(df, RateOptions(counter=True, counter_max=256, drop_resets=True)).collect()
    assert len(out) == 1
    out = rate(df, RateOptions(counter=True, counter_max=256, reset_value=10)).orderBy("ts").collect()
    assert [round(r["value"], 6) for r in out] == [1.0, 0.0]


def test_cross_series_sum_aligned(fixture_points):
    out = cross_series_aggregate(fixture_points, "sum", ())
    vals = [r["value"] for r in out.collect()]
    assert all(v == 301.0 for v in vals)  # i+1 + 301-(i+1)
    assert len(vals) == 300


def test_cross_series_lerp(offset_points):
    # series a at t=0,30,..: 10,20..; series b at t=15,45,..: 5,10..
    # At t=30 (a=20 present), b is interior-missing: lerp(5@15, 10@45 -> 7.5)
    out = cross_series_aggregate(offset_points, "sum", ())
    vals = {int(r["ts"].timestamp()) - EPOCH: r["value"] for r in out.collect()}
    assert vals[30] == 20.0 + 7.5
    # At t=0 b hasn't started -> only a contributes
    assert vals[0] == 10.0
    # At t=15 a interior: lerp(10@0, 20@30 -> 15) + b 5 = 20
    assert vals[15] == 15.0 + 5.0


def test_cross_series_zimsum(offset_points):
    out = cross_series_aggregate(offset_points, "zimsum", ())
    vals = {int(r["ts"].timestamp()) - EPOCH: r["value"] for r in out.collect()}
    assert vals[30] == 20.0  # b missing -> 0
    assert vals[15] == 5.0  # a missing -> 0


def test_planner_end_to_end(fixture_points):
    tsq = TSQuery(
        start=EPOCH,
        end=EPOCH + 100000,
        queries=(
            SubQuery(
                metric="sys.cpu.user",
                aggregator="sum",
                downsample=DownsampleSpec(interval_ms=600_000, aggregator="avg"),
                filters=(TagFilter("wildcard", "host", "web*", group_by=True),),
            ),
        ),
    )
    [res] = compile_query(fixture_points, tsq)
    assert res.group_tagks == ("host",)
    rows = serialize_subquery(res)
    assert len(rows) == 2
    by_host = {r["tags"]["host"]: r for r in rows}
    assert by_host["web01"]["metric"] == "sys.cpu.user"
    # first 10m bucket avg over web01 = mean(1..19) = 10
    assert by_host["web01"]["dps"][str(EPOCH)] == pytest.approx(10.0)
    assert by_host["web02"]["dps"][str(EPOCH)] == pytest.approx(sum(range(282, 301)) / 19)


def test_planner_explicit_tags(fixture_points):
    tsq = TSQuery(
        start=EPOCH, end=EPOCH + 100000,
        queries=(SubQuery(metric="sys.cpu.user", aggregator="sum", explicit_tags=True,
                          filters=(TagFilter("literal_or", "host", "web01"),)),),
    )
    [res] = compile_query(fixture_points, tsq)
    assert res.df.count() == 0  # series have {host,dc}, not exactly {host}


def test_strict_none_arity(fixture_points):
    """strict_none rejects an agg=none query matching >1 series, mirroring
    the reference None aggregator's more-than-one-value IllegalDataException
    (Aggregators.java:434-461); a single-series match passes through raw,
    and the default stays permissive (the reference's own query routing
    emits each span separately, TsdbQuery.java:1006-1027)."""
    multi = TSQuery(
        start=EPOCH, end=EPOCH + 100000,
        queries=(SubQuery(metric="sys.cpu.user", aggregator="none"),),
    )
    with pytest.raises(ValueError, match="More than one value in aggregator none"):
        compile_query(fixture_points, multi, strict_none=True)
    # permissive default: every series passes through, keyed by series_id
    [res] = compile_query(fixture_points, multi)
    assert res.df.select("series_id").distinct().count() == 2
    single = TSQuery(
        start=EPOCH, end=EPOCH + 100000,
        queries=(SubQuery(metric="sys.cpu.user", aggregator="none",
                          filters=(TagFilter("literal_or", "host", "web01"),)),),
    )
    [res] = compile_query(fixture_points, single, strict_none=True)
    assert res.df.count() == 300
    # downsampling with the NONE aggregator is rejected outright
    # (TsdbQuery.java:664-667)
    with pytest.raises(ValueError, match="NONE aggregator for downsampling"):
        downsample(fixture_points, DownsampleSpec(600_000, "none"))


def test_rate_mode_prev_interp(offset_points):
    # after rate, cross-series LERP degrades to PREV (AggregationIterator.java:744-752)
    out = cross_series_aggregate(offset_points, "sum", (), rate_mode=True)
    vals = {int(r["ts"].timestamp()) - EPOCH: r["value"] for r in out.collect()}
    assert vals[30] == 20.0 + 5.0  # b uses prev value 5 (not lerp 7.5)


def test_cross_series_strategies_agree(offset_points):
    """pack and join interpolation strategies must produce identical output."""
    for agg in ["sum", "zimsum", "pfsum", "mimmin"]:
        a = cross_series_aggregate(offset_points, agg, (), strategy="pack")
        b = cross_series_aggregate(offset_points, agg, (), strategy="join")
        ra = sorted((int(r["ts"].timestamp()), r["value"]) for r in a.collect())
        rb = sorted((int(r["ts"].timestamp()), r["value"]) for r in b.collect())
        assert ra == rb, agg
    with pytest.raises(ValueError):
        cross_series_aggregate(offset_points, "sum", (), strategy="bogus")


def test_calendar_bucket_n_multiples(spark):
    """N>1 calendar buckets mirror DateTime.previousInterval
    (reference src/utils/DateTime.java:450-612): year-anchored d steps that
    RESET each year, 2wc collapsing to the current week, Jan-anchored month
    groups, and Nyc == 1yc."""
    from opentsdb_spark.operators.downsample import calendar_bucket_col

    iso = [
        "2023-12-31 10:00:00",  # day 365 of 2023
        "2024-01-01 00:30:00",
        "2024-01-02 23:59:59",
        "2024-01-03 05:00:00",
        "2024-05-20 12:00:00",
        "2024-12-31 12:00:00",  # day 366 of leap 2024
    ]
    df = spark.createDataFrame([(s,) for s in iso], "s string").select(
        F.to_timestamp("s").alias("ts")
    )

    def buckets(unit, n, tz="UTC"):
        out = df.select(calendar_bucket_col(F.col("ts"), unit, tz, n).alias("b"))
        return [str(r["b"]) for r in out.collect()]

    # 2dc: 2023 anchor Jan1'23 -> day365 starts a bucket; 2024 restarts
    assert buckets("d", 2) == [
        "2023-12-31 00:00:00", "2024-01-01 00:00:00", "2024-01-01 00:00:00",
        "2024-01-03 00:00:00", "2024-05-20 00:00:00", "2024-12-30 00:00:00",
    ]
    # 2wc collapses to the point's own (ISO Monday) week
    assert buckets("w", 2) == buckets("w", 1)
    # 3nc: Jan-anchored quarters
    assert [b[:10] for b in buckets("n", 3)] == [
        "2023-10-01", "2024-01-01", "2024-01-01",
        "2024-01-01", "2024-04-01", "2024-10-01",
    ]
    # Nyc == 1yc for any N (reference anchors at the point's own year)
    assert buckets("y", 5) == buckets("y", 1)


def test_calendar_fill_grid_with_n(spark):
    """1dc and 2dc fill grids span the whole query range per series."""
    rows = [("m", "2024-01-03 10:00:00", 5.0, {"h": "a"})]
    pts = spark.createDataFrame(rows, "metric string, s string, value double, tags map<string,string>") \
        .select("metric", F.to_timestamp("s").alias("ts"), "value",
                F.lit(None).cast("long").alias("value_long"), "tags")
    start = 1704067200000  # 2024-01-01 UTC
    end = start + 6 * 86_400_000  # 2024-01-07
    spec = DownsampleSpec(86_400_000, "sum", fill="zero", calendar=True,
                          calendar_unit="d", timezone="UTC")
    out = downsample(pts, spec, start_ms=start, end_ms=end).collect()
    got = {str(r["ts"])[:10]: r["value"] for r in out}
    assert len(out) == 6 and got["2024-01-03"] == 5.0
    assert sum(v == 0.0 for v in got.values()) == 5

    spec2 = DownsampleSpec(2 * 86_400_000, "sum", fill="zero", calendar=True,
                           calendar_unit="d", calendar_n=2, timezone="UTC")
    out2 = downsample(pts, spec2, start_ms=start, end_ms=end).collect()
    got2 = sorted(str(r["ts"])[:10] for r in out2)
    assert got2 == ["2024-01-01", "2024-01-03", "2024-01-05"]


def test_retention_sweep(spark, tmp_path):
    import time

    from pyspark.sql import functions as F

    from opentsdb_spark.sources.points import (
        read_points, retention_sweep, write_points,
    )

    now_ms = int(time.time() * 1000)
    day = 86_400_000
    rows = [("m", now_ms - d * day, float(d)) for d in range(5)]
    df = spark.createDataFrame(rows, "metric string, ms long, value double").select(
        "metric", F.timestamp_millis("ms").alias("ts"), "value",
        F.lit(None).cast("long").alias("value_long"),
        F.create_map(F.lit("h"), F.lit("a")).alias("tags"),
    )
    path = str(tmp_path / "pts")
    write_points(df, path)
    # dry run reports but deletes nothing
    listed = retention_sweep(path, keep_days=2, now_ms=now_ms, dry_run=True)
    assert len(listed) == 2  # days 3 and 4 are strictly older than the cutoff
    assert read_points(spark, path).count() == 5
    dropped = retention_sweep(path, keep_days=2, now_ms=now_ms)
    assert dropped == listed
    kept = read_points(spark, path)
    assert kept.count() == 3
    assert kept.agg(F.max("value")).first()[0] == 2.0
    # idempotent
    assert retention_sweep(path, keep_days=2, now_ms=now_ms) == []


def test_binned_percentile_error_bound(spark, fixture_points):
    """Fixed-bin p95 is within w/2 of the exact estimator on every bucket
    (operators/downsample.py binned_percentile_downsample)."""
    from opentsdb_spark.operators.downsample import binned_percentile_downsample

    w = 512.0 / 256
    approx = binned_percentile_downsample(
        fixture_points, 3_600_000, 0.95, 0.0, 512.0, 256)
    exact = downsample(fixture_points, DownsampleSpec(3_600_000, "p95"))
    a = {(r.metric, str(sorted(r.tags.items())), r.ts): r.value
         for r in approx.collect()}
    e = {(r.metric, str(sorted(r.tags.items())), r.ts): r.value
         for r in exact.collect()}
    assert set(a) == set(e) and a
    for k, v in e.items():
        # bin-midpoint vs interpolated exact: bounded by one bin width
        # (rank conventions differ by <1 position across a bin edge)
        assert abs(a[k] - v) <= w, (k, a[k], v)


def test_binned_percentile_clamps_and_q1(spark):
    from opentsdb_spark.operators.downsample import binned_percentile_downsample

    rows = [("m", (EPOCH + i) * 1000, float(v), {"h": "a"})
            for i, v in enumerate([5.0, 9999.0, -50.0, 5.0])]
    df = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, tags map<string,string>"
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    out = binned_percentile_downsample(df, 3_600_000, 1.0, 0.0, 10.0, 10)
    [r] = out.collect()
    # q=1 -> rank 4 -> the 9999 value, clamped into the top bin [9,10)
    assert r.value == pytest.approx(9.5)
    out0 = binned_percentile_downsample(df, 3_600_000, 0.25, 0.0, 10.0, 10)
    [r0] = out0.collect()
    # rank 1 -> the -50 value, clamped into the bottom bin [0,1)
    assert r0.value == pytest.approx(0.5)


def test_binned_percentile_validation(spark, fixture_points):
    from opentsdb_spark.operators.downsample import binned_percentile_downsample

    with pytest.raises(ValueError):
        binned_percentile_downsample(fixture_points, 3_600_000, 0.0, 0.0, 1.0)
    with pytest.raises(ValueError):
        binned_percentile_downsample(fixture_points, 3_600_000, 0.5, 2.0, 1.0)
    with pytest.raises(ValueError):
        binned_percentile_downsample(fixture_points, 3_600_000, 0.5, 0.0, 1.0, nbins=1)
