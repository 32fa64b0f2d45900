"""Tests pinned to the reference's own unit-test vectors.

Fixtures transcribed from:
  /root/reference/test/core/TestDownsampler.java:40-105
  /root/reference/test/core/TestRateSpan.java:30-66
(only the data values and expected outputs — the harness is ours).
"""

import pytest
from pyspark.sql import functions as F

from opentsdb_spark.model import DownsampleSpec, RateOptions
from opentsdb_spark.operators.downsample import calendar_bucket_col, downsample
from opentsdb_spark.operators.groupby import cross_series_aggregate
from opentsdb_spark.operators.rate import rate

BASE = 1356998400000  # 2013-01-01T00:00:00Z in ms

# TestDownsampler.java DATA_POINTS (ts_ms, value)
DS_POINTS = [
    (BASE, 40.0),
    (BASE + 2000000, 50.0),
    (BASE + 3600000, 40.0),
    (BASE + 3605000, 50.0),
    (BASE + 7200000, 40.0),
    (BASE + 9200000, 50.0),
]


def _one_series(spark, pts):
    df = spark.createDataFrame(
        [("m", t, v, {"h": "a"}) for t, v in pts],
        "metric string, ts_ms long, value double, tags map<string,string>",
    )
    return df.select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")


def test_downsampler_1000s_avg(spark):
    """TestDownsampler.testDownsampler:82-105 exact buckets + values."""
    out = downsample(_one_series(spark, DS_POINTS), DownsampleSpec(1_000_000, "avg"))
    rows = sorted((int(r["ts"].timestamp() * 1000), r["value"]) for r in out.collect())
    assert rows == [
        (BASE - 400000, 40.0),
        (BASE + 1600000, 50.0),
        (BASE + 3600000, 45.0),
        (BASE + 6600000, 40.0),
        (BASE + 8600000, 50.0),
    ]


def test_rate_first_vs_zero(spark):
    """TestRateSpan.java:40-48 RATE_DATA_POINTS — the first rate is computed
    against a synthetic (0,0) point (RateSpan.java:108-114)."""
    out = rate(_one_series(spark, DS_POINTS), first_vs_zero=True).orderBy("ts").collect()
    got = [r["value"] for r in out]
    expected = [
        40.0 / 1356998400,
        10.0 / 2000.0,
        -10.0 / (1357002000 - 1356998400 - 2000),
        10.0 / 5.0,
        -10.0 / (1357005600 - 1357002005),
        10.0 / 2000.0,
    ]
    assert got == pytest.approx(expected, rel=1e-12)


def test_rate_counter_max_70(spark):
    """TestRateSpan.java RATES_FOR_COUNTER — counter rollover at max=70."""
    out = rate(
        _one_series(spark, DS_POINTS),
        RateOptions(counter=True, counter_max=70),
        first_vs_zero=True,
    ).orderBy("ts").collect()
    got = [r["value"] for r in out]
    expected = [
        40.0 / 1356998400,
        10.0 / 2000.0,
        (40.0 + 20) / 1600.0,
        10.0 / 5.0,
        (40.0 + 20) / 3595,
        10.0 / 2000.0,
    ]
    assert got == pytest.approx(expected, rel=1e-12)


def test_rate_drop_resets(spark):
    out = rate(
        _one_series(spark, DS_POINTS),
        RateOptions(counter=True, counter_max=70, drop_resets=True),
        first_vs_zero=True,
    ).orderBy("ts").collect()
    got = [r["value"] for r in out]
    assert got == pytest.approx(
        [40.0 / 1356998400, 10.0 / 2000.0, 10.0 / 5.0, 10.0 / 2000.0], rel=1e-12
    )


def test_mim_sentinels_ignore_missing(spark):
    """mimmin/mimmax must ignore series that are missing at a timestamp
    (Aggregators.java:95-103 MAX/MIN sentinel interpolation)."""
    rows = [
        ("m", BASE, 10.0, {"h": "a"}),
        ("m", BASE + 60000, 30.0, {"h": "a"}),
        ("m", BASE + 30000, 5.0, {"h": "b"}),
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, tags map<string,string>"
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    out = cross_series_aggregate(df, "mimmin", ())
    vals = {int(r["ts"].timestamp() * 1000) - BASE: r["value"] for r in out.collect()}
    # at +30000: a is interior-missing -> +MAX sentinel, so min = b's 5
    assert vals == {0: 10.0, 30000: 5.0, 60000: 30.0}
    out = cross_series_aggregate(df, "mimmax", ())
    vals = {int(r["ts"].timestamp() * 1000) - BASE: r["value"] for r in out.collect()}
    # at +30000: a -> -MAX sentinel, max = 5; at 0/60000 b is exterior -> only a
    assert vals == {0: 10.0, 30000: 5.0, 60000: 30.0}


def test_calendar_day_est(spark):
    """Calendar '1dc' in a -05:00 zone: 04:00Z belongs to the PREVIOUS
    local day, whose bucket starts at 05:00Z of that day
    (DownsamplingSpecification.java:135-147 + Downsampler timezone
    handling)."""
    rows = [
        ("m", BASE + 4 * 3600_000, 1.0, {"h": "a"}),   # 2013-01-01T04:00Z = Dec 31 23:00 EST
        ("m", BASE + 6 * 3600_000, 2.0, {"h": "a"}),   # 2013-01-01T06:00Z = Jan 1 01:00 EST
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, tags map<string,string>"
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    spec = DownsampleSpec(86_400_000, "sum", calendar=True, calendar_unit="d",
                          timezone="America/New_York")
    out = downsample(df, spec)
    buckets = sorted((int(r["ts"].timestamp() * 1000), r["value"]) for r in out.collect())
    dec31_est_start = BASE - 24 * 3600_000 + 5 * 3600_000  # 2012-12-31T05:00Z
    jan1_est_start = BASE + 5 * 3600_000
    assert buckets == [(dec31_est_start, 1.0), (jan1_est_start, 2.0)]


def test_calendar_week_and_month(spark):
    rows = [("m", BASE + 10 * 86_400_000, 1.0, {"h": "a"})]  # 2013-01-11 (Fri)
    df = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, tags map<string,string>"
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    out = downsample(df, DownsampleSpec(30 * 86_400_000, "sum", calendar=True, calendar_unit="n"))
    [r] = out.collect()
    assert int(r["ts"].timestamp() * 1000) == BASE  # month bucket -> Jan 1
    out = downsample(df, DownsampleSpec(7 * 86_400_000, "sum", calendar=True, calendar_unit="w"))
    [r] = out.collect()
    # Spark date_trunc('week') -> Monday 2013-01-07
    assert int(r["ts"].timestamp() * 1000) == BASE + 6 * 86_400_000


def test_calendar_multi_hour(spark):
    """'6hc' in a -05:00 zone: buckets anchor at local midnight (05:00Z)."""
    rows = [("m", BASE + h * 3600_000, 1.0, {"h": "a"}) for h in (5, 7, 12)]
    df = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, tags map<string,string>"
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value", "tags")
    spec = DownsampleSpec(6 * 3600_000, "sum", calendar=True, calendar_unit="h",
                          calendar_n=6, timezone="America/New_York")
    out = downsample(df, spec)
    buckets = sorted((int(r["ts"].timestamp() * 1000), r["value"]) for r in out.collect())
    # local midnight = BASE+5h (00:00 EST); 05Z,07Z -> [23:00 prev local 6h?]:
    # local hours 0,2 -> bucket [00:00,06:00) local = BASE+5h UTC; 12Z = 07:00
    # local -> bucket [06:00,12:00) local = BASE+11h UTC
    assert buckets == [(BASE + 5 * 3600_000, 2.0), (BASE + 11 * 3600_000, 1.0)]


def test_upper_median_matches_reference(spark):
    """Aggregators.java:397-431 Median: sorted.get(size/2) — UPPER median
    for even counts, never interpolated."""
    from opentsdb_spark.functions.aggregators import get_aggregator
    from pyspark.sql import functions as F

    agg = get_aggregator("median")
    for vals, want in [([1.0, 2.0, 3.0, 4.0], 3.0),  # even -> upper
                       ([5.0, 1.0, 9.0], 5.0),
                       ([2.0], 2.0),
                       ([4.0, 4.0, 1.0, 8.0], 4.0)]:
        df = spark.createDataFrame([(v, i) for i, v in enumerate(vals)],
                                   "value double, t long")
        got = df.agg(agg.builder(F.col("value"), F.col("t")).alias("m")).collect()[0]["m"]
        assert got == want, (vals, got, want)


def test_percentile_estimators_match_commons_math(spark):
    """pNN = commons-math DEFAULT (pos=q(n+1)), ep*r7 = R-7, ep*r3 = R-3
    (pos=rint(nq), half-even) — reference Aggregators.java:124-173,905-948."""
    import math

    from pyspark.sql import functions as F

    from opentsdb_spark.functions.aggregators import get_aggregator

    def legacy(xs, q):
        a, n = sorted(xs), len(xs)
        pos = q * (n + 1)
        if pos < 1:
            return a[0]
        if pos >= n:
            return a[-1]
        f = math.floor(pos)
        return a[f - 1] + (pos - f) * (a[f] - a[f - 1])

    def r7(xs, q):
        a, n = sorted(xs), len(xs)
        pos = (n - 1) * q + 1
        f = math.floor(pos)
        if f >= n:
            return a[-1]
        return a[f - 1] + (pos - f) * (a[f] - a[f - 1])

    def r3(xs, q):
        a, n = sorted(xs), len(xs)
        if q <= 0.5 / n:
            return a[0]
        # round-half-even like FastMath.rint
        pos = round(n * q)
        if pos < 1:
            return a[0]
        if pos >= n:
            return a[-1]
        return a[pos - 1]

    import random

    rng = random.Random(11)
    cases = [[1.0, 2.0], [3.0, 1.0, 2.0], list(map(float, range(1, 1001)))]
    cases += [[rng.uniform(0, 100) for _ in range(rng.randrange(1, 25))] for _ in range(5)]
    for xs in cases:
        df = spark.createDataFrame([(v, i) for i, v in enumerate(xs)],
                                   "value double, t long")
        for name, ref, q in [("p95", legacy, 0.95), ("p50", legacy, 0.5),
                             ("ep95r7", r7, 0.95), ("ep50r7", r7, 0.5),
                             ("ep95r3", r3, 0.95), ("ep50r3", r3, 0.5)]:
            agg = get_aggregator(name)
            got = df.agg(agg.builder(F.col("value"), F.col("t")).alias("x")
                         ).collect()[0]["x"]
            want = ref(xs, q)
            assert got == pytest.approx(want, rel=1e-12), (name, len(xs), got, want)


def test_simple_histogram_percentiles(spark):
    """Reference TestSimpleHistogram.testPercentile / testPercentileList
    (test/core/TestSimpleHistogram.java:270-338): bucket-midpoint
    percentiles over [1,6):5 [6,10):10 [10,20):1 (+overflow 5, which the
    reference's percentile walk EXCLUDES from the total) -> p50 = 8.0;
    with a trailing empty [20,40) bucket -> p99 = 15.0. (An out-of-range
    percentile is a ValueError here where the reference returns -1 — we
    fail loud instead of emitting a sentinel value.)"""
    import pytest as _pytest

    from opentsdb_spark.operators.histogram import histogram_percentile, merge_histograms

    rows = [
        ("m", [(1.0, 6.0, 5), (6.0, 10.0, 10), (10.0, 20.0, 1), (20.0, 40.0, 0)], 0, 5),
    ]
    hists = spark.createDataFrame(
        rows,
        "metric string, buckets array<struct<lower float, upper float, count long>>, "
        "underflow long, overflow long",
    )
    merged = merge_histograms(hists, ("metric",))
    [p50] = histogram_percentile(merged, ("metric",), 50.0).collect()
    assert p50["value"] == 8.0
    [p99] = histogram_percentile(merged, ("metric",), 99.0).collect()
    assert p99["value"] == 15.0
    with _pytest.raises(ValueError):
        histogram_percentile(merged, ("metric",), 1000.0)


def test_filling_downsampler_vectors(spark):
    """Reference TestFillingDownsampler.testNaNMissingInterval /
    testZeroMissingInterval (test/core/TestFillingDownsampler.java:47-112):
    9 points of 1.0 at base+25ms*k, 100ms-sum over [base, base+900ms) ->
    buckets [NaN,3,NaN,2,NaN,NaN,4,NaN,NaN] (nan fill) / zeros (zero fill)."""
    import math

    from opentsdb_spark.model import DownsampleSpec
    from opentsdb_spark.operators.downsample import downsample

    base = 500
    ks = [4, 5, 7, 12, 15, 24, 25, 26, 27]
    df = spark.createDataFrame(
        [("m", base + 25 * k, 1.0) for k in ks],
        "metric string, ts_ms long, value double",
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value",
             F.create_map(F.lit("h"), F.lit("a")).alias("tags"))
    expect = [float("nan"), 3.0, float("nan"), 2.0, float("nan"),
              float("nan"), 4.0, float("nan"), float("nan")]
    for fill, exp in (
        ("nan", expect),
        ("zero", [0.0 if e != e else e for e in expect]),
    ):
        spec = DownsampleSpec(interval_ms=100, aggregator="sum", fill=fill)
        rows = downsample(df, spec, base, base + 36 * 25).orderBy("ts").collect()
        got = [(r["ts"].timestamp() * 1000, r["value"]) for r in rows]
        assert [t for t, _ in got] == [base + 100 * i for i in range(9)]
        for (_, v), e in zip(got, exp):
            assert (math.isnan(v) and math.isnan(e)) or v == e


def test_queryrpc_parse_vectors():
    """Reference TestQueryRpc parse vectors (test/tsd/TestQueryRpc.java:
    246-320): two-brace-group m= specs, filter typing, empty brace groups,
    and the malformed specs that must 400."""
    import pytest as _pytest

    from opentsdb_spark.parse import parse_m_subquery

    # grouped {colo=lga} + non-grouped {host=wildcard(*quirm)}
    q = parse_m_subquery("sum:sys.cpu.0{colo=lga}{host=wildcard(*quirm)}")
    types = {(f.tagk, f.type, f.group_by) for f in q.filters}
    assert ("colo", "literal_or", True) in types
    assert ("host", "wildcard", False) in types
    # same tagk in both groups keeps BOTH filters
    q = parse_m_subquery("sum:sys.cpu.0{host=quirm|tsort}{host=wildcard(*quirm)}")
    assert len(q.filters) == 2
    assert {f.type for f in q.filters} == {"literal_or", "wildcard"}
    # {}{} = no filters at all
    q = parse_m_subquery("sum:sys.cpu.0{}{}")
    assert q.filters == ()
    # malformed: missing close brace / missing '=' / unknown filter name
    for bad in (
        "sum:sys.cpu.0{host=wildcard(*tsort)}{host=wildcard(*quirm",
        "sum:sys.cpu.0{host=wildcard(*tsort)}{hostwildcard(*quirm)}",
        "sum:sys.cpu.0{host=nosuchfilter(*tsort)}",
    ):
        with _pytest.raises(ValueError):
            parse_m_subquery(bad)
    # explicit_tags token rides between aggregator and metric
    q = parse_m_subquery("sum:explicit_tags:sys.cpu.0{host=web01}")
    assert q.explicit_tags and q.metric == "sys.cpu.0"


def test_aggregation_iterator_double_spans(spark):
    """Reference TestAggregationIterator.testAggregate_doubleSpans
    (test/core/TestAggregationIterator.java:91-114): span1 = (0s:40,
    10s:50, 30s:70), span2 = (10s:37, 20s:48), LERP sum ->
    [40, 87, 60+48=108, 70] — 60 is span1's interpolated value at 20s and
    span2 contributes nothing outside its [10s, 20s] range."""
    from opentsdb_spark.operators.groupby import cross_series_aggregate
    from tests.conftest import EPOCH

    base = EPOCH * 1000
    rows = (
        [("m", base, 40.0, "s1"), ("m", base + 10_000, 50.0, "s1"),
         ("m", base + 30_000, 70.0, "s1")]
        + [("m", base + 10_000, 37.0, "s2"), ("m", base + 20_000, 48.0, "s2")]
    )
    df = spark.createDataFrame(
        rows, "metric string, ts_ms long, value double, host string"
    ).select("metric", F.timestamp_millis("ts_ms").alias("ts"), "value",
             F.create_map(F.lit("host"), F.col("host")).alias("tags"))
    for strategy in ("pack", "join", "sweep"):
        out = {int(r["ts"].timestamp() * 1000 - base): r["value"]
               for r in cross_series_aggregate(df, "sum", strategy=strategy).collect()}
        assert out == {0: 40.0, 10_000: 87.0, 20_000: 108.0, 30_000: 70.0}, strategy
