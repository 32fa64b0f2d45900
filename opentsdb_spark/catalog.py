"""Driver-facing query catalog: every implemented operator exposed as a
(PySpark query, DuckDB oracle SQL) pair over the driver's testdata tables.

The events table is the raw point feed (FIXTURES.md §6) via the
events_to_points contract (sources/points.py):
    metric = event_type
    tags   = {user: str(user_id), k: first int in props, big: 'yes' if value>100}

Conventions keeping Spark and DuckDB hash-identical:
  * timestamps are BIGINT epoch ms (raw points: ts_ms) or bucket-start epoch
    seconds (downsampled: ts_sec)
  * every double output is round(x, 4) cast to DOUBLE on both sides
  * every aggregate/computed column is aliased identically on both sides
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentsdb_spark.model import DownsampleSpec, RateOptions, SubQuery, TagFilter, TSQuery
from opentsdb_spark.operators.downsample import calendar_bucket_col, downsample
from opentsdb_spark.operators.groupby import cross_series_aggregate
from opentsdb_spark.operators.metadata import last_points, suggest
from opentsdb_spark.operators.rate import rate
from opentsdb_spark.plans.planner import compile_query
from opentsdb_spark.sources.points import load_points, load_table

# January 2024 — the events table's full span at every sf (TESTDATA.md)
START_SEC = 1704067200
END_SEC = 1706745600
START_MS = START_SEC * 1000
END_MS = END_SEC * 1000

# ---- DuckDB fragments mirroring events_to_points ---------------------------
U = "CAST(user_id AS VARCHAR)"
K = "regexp_extract(props, '[0-9]+')"
BIG = "CASE WHEN value > 100.0 THEN 'yes' END"
SID = (
    "event_type || '{' || CASE WHEN value > 100.0 THEN 'big=yes,' ELSE '' END"
    " || 'k=' || regexp_extract(props, '[0-9]+')"
    " || ',user=' || CAST(user_id AS VARCHAR) || '}'"
)
TS_MS = "epoch_ms(ts)"
H_SEC = "CAST(epoch_ms(ts) // 3600000 * 3600 AS BIGINT)"
M10_SEC = "CAST(epoch_ms(ts) // 600000 * 600 AS BIGINT)"
# Canonical cross-engine rounding: floor(x*1e4 + 0.5 + eps) / 1e4. Plain
# round() breaks on exact-decimal ties (e.g. avg hitting 0.60125): Spark's
# BigDecimal HALF_UP and DuckDB's scaled-double round can disagree by 1e-4.
# This formula is pure IEEE mul/add/floor/div — bit-identical in both
# engines; the +1e-7 bias shifts the boundary off exact-decimal rationals.
RND = "floor(({}) * 10000 + 0.5000001) / 10000"


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible; driver does rows-only check


CATALOG: dict[str, QueryDef] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        CATALOG[name] = QueryDef(name, fn, sql)
        return fn

    return deco


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_points(spark, sf_dir)


def _vr(c) -> F.Column:
    # must mirror RND exactly (see comment there)
    return (
        F.floor(c * F.lit(10000.0) + F.lit(0.5000001)) / F.lit(10000.0)
    ).cast("double").alias("value_r")


def _tag(name: str):
    return F.col("tags").getItem(name).alias(name)


def _ts_sec():
    return (F.unix_millis("ts") / 1000).cast("long").alias("ts_sec")


def _ts_ms():
    return F.unix_millis("ts").alias("ts_ms")


def _dedup(points: DataFrame) -> DataFrame:
    """Duplicate-timestamp resolution before rate (the reference requires
    strictly increasing timestamps per series, RateSpan.java:127-131;
    fix_duplicates analog, src/utils/Config.java:98-99) — keep max value.
    Truncates to ms so Spark and the ms-based oracle dedup identically."""
    return (
        points.withColumn("ts", F.timestamp_millis(F.unix_millis("ts")))
        .groupBy("metric", "tags", "ts")
        .agg(F.max("value").alias("value"))
    )


# =============================================================== filters ====


@register(
    "tsdb_filter_literal_or",
    f"""SELECT event_type AS metric, {SID} AS series_id, {TS_MS} AS ts_ms,
               {RND.format('value')} AS value_r
        FROM events
        WHERE event_type = 'purchase' AND {U} IN ('3','7','11')""",
)
def tsdb_filter_literal_or(spark, sf_dir):
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(metric="purchase", aggregator="none",
                          filters=(TagFilter("literal_or", "user", "3|7|11"),)),),
    )
    [r] = compile_query(_pts(spark, sf_dir), tsq)
    return r.df.select("metric", "series_id", _ts_ms(), _vr(F.col("value")))


@register(
    "tsdb_filter_iwildcard",
    f"""SELECT event_type AS metric, {SID} AS series_id, {TS_MS} AS ts_ms,
               {RND.format('value')} AS value_r
        FROM events
        WHERE event_type = 'click' AND {K} LIKE '1%'""",
)
def tsdb_filter_iwildcard(spark, sf_dir):
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(metric="click", aggregator="none",
                          filters=(TagFilter("iwildcard", "k", "1*"),)),),
    )
    [r] = compile_query(_pts(spark, sf_dir), tsq)
    return r.df.select("metric", "series_id", _ts_ms(), _vr(F.col("value")))


@register(
    "tsdb_filter_regexp",
    f"""SELECT event_type AS metric, {SID} AS series_id, {TS_MS} AS ts_ms,
               {RND.format('value')} AS value_r
        FROM events
        WHERE event_type = 'view' AND regexp_matches({U}, '^1[0-9]$')""",
)
def tsdb_filter_regexp(spark, sf_dir):
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(metric="view", aggregator="none",
                          filters=(TagFilter("regexp", "user", "^1[0-9]$"),)),),
    )
    [r] = compile_query(_pts(spark, sf_dir), tsq)
    return r.df.select("metric", "series_id", _ts_ms(), _vr(F.col("value")))


@register(
    "tsdb_filter_not_literal_or",
    f"""SELECT event_type AS metric, {SID} AS series_id, {TS_MS} AS ts_ms,
               {RND.format('value')} AS value_r
        FROM events
        WHERE event_type = 'error' AND {K} NOT IN ('1','2','3','4','5')""",
)
def tsdb_filter_not_literal_or(spark, sf_dir):
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(metric="error", aggregator="none",
                          filters=(TagFilter("not_literal_or", "k", "1|2|3|4|5"),)),),
    )
    [r] = compile_query(_pts(spark, sf_dir), tsq)
    return r.df.select("metric", "series_id", _ts_ms(), _vr(F.col("value")))


@register(
    "tsdb_filter_not_key",
    f"""SELECT event_type AS metric, {SID} AS series_id, {TS_MS} AS ts_ms,
               {RND.format('value')} AS value_r
        FROM events
        WHERE event_type = 'signup' AND NOT value > 100.0""",
)
def tsdb_filter_not_key(spark, sf_dir):
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(metric="signup", aggregator="none",
                          filters=(TagFilter("not_key", "big", ""),)),),
    )
    [r] = compile_query(_pts(spark, sf_dir), tsq)
    return r.df.select("metric", "series_id", _ts_ms(), _vr(F.col("value")))


@register(
    "tsdb_explicit_tags",
    f"""SELECT event_type AS metric, {SID} AS series_id, {TS_MS} AS ts_ms,
               {RND.format('value')} AS value_r
        FROM events
        WHERE event_type = 'purchase' AND NOT value > 100.0""",
)
def tsdb_explicit_tags(spark, sf_dir):
    # queried key set {user, k} == tag set only when the 'big' tag is absent
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(metric="purchase", aggregator="none", explicit_tags=True,
                          filters=(TagFilter("wildcard", "user", "*"),
                                   TagFilter("wildcard", "k", "*"))),),
    )
    [r] = compile_query(_pts(spark, sf_dir), tsq)
    return r.df.select("metric", "series_id", _ts_ms(), _vr(F.col("value")))


# ============================================================ downsample ====


@register(
    "tsdb_ds_10m_avg",
    f"""SELECT event_type AS metric, {U} AS user, {K} AS k, {BIG} AS big,
               {M10_SEC} AS ts_sec, {RND.format('avg(value)')} AS value_r
        FROM events WHERE event_type = 'purchase'
        GROUP BY event_type, user_id, {K}, value > 100.0, {M10_SEC}""",
)
def tsdb_ds_10m_avg(spark, sf_dir):
    df = _pts(spark, sf_dir).where(F.col("metric") == "purchase")
    out = downsample(df, DownsampleSpec(600_000, "avg"))
    return out.select("metric", _tag("user"), _tag("k"), _tag("big"), _ts_sec(), _vr(F.col("value")))


@register(
    "tsdb_ds_0all_sum",
    f"""SELECT event_type AS metric, {U} AS user, {K} AS k, {BIG} AS big,
               CAST({START_SEC} AS BIGINT) AS ts_sec,
               {RND.format('sum(value)')} AS value_r
        FROM events WHERE event_type = 'view'
        GROUP BY event_type, user_id, {K}, value > 100.0""",
)
def tsdb_ds_0all_sum(spark, sf_dir):
    df = _pts(spark, sf_dir).where(F.col("metric") == "view")
    out = downsample(df, DownsampleSpec(0, "sum", run_all=True), start_ms=START_MS, end_ms=END_MS)
    return out.select("metric", _tag("user"), _tag("k"), _tag("big"), _ts_sec(), _vr(F.col("value")))


@register(
    "tsdb_ds_1d_calendar_sum",
    f"""SELECT event_type AS metric, {U} AS user,
               CAST(epoch_ms(date_trunc('day', ts)) // 1000 AS BIGINT) AS ts_sec,
               {RND.format('sum(value)')} AS value_r
        FROM events WHERE event_type = 'click'
        GROUP BY event_type, user_id, date_trunc('day', ts)""",
)
def tsdb_ds_1d_calendar_sum(spark, sf_dir):
    # calendar-day buckets, then a second (cheap) groupBy collapsing the k/big
    # tag split — i.e. downsample per series then zimsum across series by user
    df = _pts(spark, sf_dir).where(F.col("metric") == "click")
    spec = DownsampleSpec(86_400_000, "sum", calendar=True, calendar_unit="d", timezone="UTC")
    per_series = downsample(df, spec)
    out = (
        per_series.select("metric", _tag("user"), "ts", "value")
        .groupBy("metric", "user", "ts")
        .agg(F.sum("value").alias("value"))
    )
    return out.select("metric", "user", _ts_sec(), _vr(F.col("value")))


@register(
    "tsdb_ds_1h_max_fill_zero",
    f"""WITH f AS (
          SELECT {U} AS user, {K} AS k, {BIG} AS big, value, {H_SEC} AS b
          FROM events
          WHERE event_type = 'signup' AND {U} IN ('1','2','3')
        ),
        s AS (SELECT DISTINCT user, k, big FROM f),
        g AS (SELECT s.user, s.k, s.big, gs.b
              FROM s CROSS JOIN (SELECT unnest(generate_series({START_SEC}, {END_SEC - 3600}, 3600)) AS b) gs),
        p AS (SELECT user, k, big, b, max(value) AS v FROM f GROUP BY ALL)
        SELECT 'signup' AS metric, g.user, g.k, g.big, CAST(g.b AS BIGINT) AS ts_sec,
               {RND.format('coalesce(p.v, 0.0)')} AS value_r
        FROM g LEFT JOIN p ON g.user = p.user AND g.k = p.k
               AND g.big IS NOT DISTINCT FROM p.big AND g.b = p.b""",
)
def tsdb_ds_1h_max_fill_zero(spark, sf_dir):
    tags = F.col("tags")
    df = (
        _pts(spark, sf_dir)
        .where(F.col("metric") == "signup")
        .where(tags["user"].isin("1", "2", "3"))
    )
    out = downsample(df, DownsampleSpec(3_600_000, "max", fill="zero"),
                     start_ms=START_MS, end_ms=END_MS)
    return out.select("metric", _tag("user"), _tag("k"), _tag("big"), _ts_sec(), _vr(F.col("value")))


# ================================================================== rate ====


@register(
    "tsdb_rate",
    f"""WITH d AS (
          SELECT {SID} AS series_id, epoch_ms(ts) AS t, max(value) AS v
          FROM events WHERE event_type = 'error'
          GROUP BY {SID}, epoch_ms(ts)
        )
        SELECT 'error' AS metric, series_id, CAST(t AS BIGINT) AS ts_ms,
               {RND.format('(v - lag(v) OVER w) / ((t - lag(t) OVER w) / 1000.0)')} AS value_r
        FROM d WINDOW w AS (PARTITION BY series_id ORDER BY t)
        QUALIFY lag(v) OVER w IS NOT NULL""",
)
def tsdb_rate(spark, sf_dir):
    df = _dedup(_pts(spark, sf_dir).where(F.col("metric") == "error"))
    out = rate(df)
    from opentsdb_spark.sources.points import series_id_col

    return out.select(
        "metric", series_id_col().alias("series_id"), _ts_ms(), _vr(F.col("value"))
    )


@register(
    "tsdb_rate_counter",
    f"""WITH d AS (
          SELECT {SID} AS series_id, epoch_ms(ts) AS t, max(value) AS v
          FROM events WHERE event_type = 'click'
          GROUP BY {SID}, epoch_ms(ts)
        ),
        r AS (
          SELECT series_id, t,
                 v - lag(v) OVER w AS dv,
                 (t - lag(t) OVER w) / 1000.0 AS dt,
                 lag(v) OVER w AS pv
          FROM d WINDOW w AS (PARTITION BY series_id ORDER BY t)
        )
        SELECT 'click' AS metric, series_id, CAST(t AS BIGINT) AS ts_ms,
               {RND.format('''CASE WHEN dv >= 0 THEN dv / dt
                     WHEN (10000.0 - pv + (pv + dv)) / dt > 100.0 THEN 0.0
                     ELSE (10000.0 - pv + (pv + dv)) / dt END''')} AS value_r
        FROM r WHERE dv IS NOT NULL""",
)
def tsdb_rate_counter(spark, sf_dir):
    df = _dedup(_pts(spark, sf_dir).where(F.col("metric") == "click"))
    out = rate(df, RateOptions(counter=True, counter_max=10_000, reset_value=100))
    from opentsdb_spark.sources.points import series_id_col

    return out.select(
        "metric", series_id_col().alias("series_id"), _ts_ms(), _vr(F.col("value"))
    )


# ======================================== cross-series aggregation ==========


@register(
    "tsdb_agg_zimsum_by_user",
    f"""SELECT event_type AS metric, {U} AS user, {TS_MS} AS ts_ms,
               {RND.format('sum(value)')} AS value_r
        FROM events WHERE event_type = 'view'
        GROUP BY event_type, user_id, epoch_ms(ts)""",
)
def tsdb_agg_zimsum_by_user(spark, sf_dir):
    # zim interpolation contributes zeros at other series' timestamps, so the
    # per-timestamp sum equals the plain SQL sum — checked end-to-end here;
    # interpolating aggregators are pinned by unit tests (tests/test_slice.py)
    df = _pts(spark, sf_dir).where(F.col("metric") == "view")
    out = cross_series_aggregate(df, "zimsum", ("user",))
    return out.select("metric", "user", _ts_ms(), _vr(F.col("value")))


@register(
    "tsdb_agg_mimmax_by_user",
    f"""SELECT event_type AS metric, {U} AS user, {TS_MS} AS ts_ms,
               {RND.format('max(value)')} AS value_r
        FROM events WHERE event_type = 'error'
        GROUP BY event_type, user_id, epoch_ms(ts)""",
)
def tsdb_agg_mimmax_by_user(spark, sf_dir):
    df = _pts(spark, sf_dir).where(F.col("metric") == "error")
    out = cross_series_aggregate(df, "mimmax", ("user",))
    return out.select("metric", "user", _ts_ms(), _vr(F.col("value")))


def _aligned_sql(metric: str, per_series_agg: str, cross_agg: str) -> str:
    return f"""WITH f AS (
          SELECT {U} AS user, {K} AS k, {BIG} AS big, value, {H_SEC} AS b
          FROM events
          WHERE event_type = '{metric}' AND {U} IN ('1','2','3')
        ),
        s AS (SELECT DISTINCT user, k, big FROM f),
        g AS (SELECT s.user, s.k, s.big, gs.b
              FROM s CROSS JOIN (SELECT unnest(generate_series({START_SEC}, {END_SEC - 3600}, 3600)) AS b) gs),
        p AS (SELECT user, k, big, b, {per_series_agg}(value) AS v FROM f GROUP BY ALL)
        SELECT '{metric}' AS metric, g.user, CAST(g.b AS BIGINT) AS ts_sec,
               {RND.format(f'{cross_agg}(coalesce(p.v, 0.0))')} AS value_r
        FROM g LEFT JOIN p ON g.user = p.user AND g.k = p.k
               AND g.big IS NOT DISTINCT FROM p.big AND g.b = p.b
        GROUP BY g.user, g.b"""


def _aligned_query(spark, sf_dir, metric: str, per_series_agg: str, cross_agg: str):
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(
            metric=metric, aggregator=cross_agg,
            downsample=DownsampleSpec(3_600_000, per_series_agg, fill="zero"),
            filters=(TagFilter("literal_or", "user", "1|2|3", group_by=True),),
        ),),
    )
    [r] = compile_query(_pts(spark, sf_dir), tsq)
    return r.df.select("metric", "user", _ts_sec(), _vr(F.col("value")))


@register("tsdb_agg_sum_aligned_1h", _aligned_sql("purchase", "sum", "sum"))
def tsdb_agg_sum_aligned_1h(spark, sf_dir):
    return _aligned_query(spark, sf_dir, "purchase", "sum", "sum")


@register("tsdb_agg_avg_aligned_1h", _aligned_sql("click", "avg", "avg"))
def tsdb_agg_avg_aligned_1h(spark, sf_dir):
    return _aligned_query(spark, sf_dir, "click", "avg", "avg")


@register("tsdb_agg_count_aligned_1h", _aligned_sql("view", "max", "count"))
def tsdb_agg_count_aligned_1h(spark, sf_dir):
    return _aligned_query(spark, sf_dir, "view", "max", "count")


@register("tsdb_agg_min_aligned_1h", _aligned_sql("error", "min", "min"))
def tsdb_agg_min_aligned_1h(spark, sf_dir):
    return _aligned_query(spark, sf_dir, "error", "min", "min")


# ============================================================== metadata ====


@register(
    "tsdb_suggest_metrics",
    "SELECT DISTINCT event_type AS name FROM events WHERE event_type LIKE 'p%'",
)
def tsdb_suggest_metrics(spark, sf_dir):
    return suggest(_pts(spark, sf_dir), "metrics", "p")


@register(
    "tsdb_last",
    f"""SELECT {SID} AS series_id, event_type AS metric,
               {RND.format('arg_max(value, ts)')} AS value_r,
               CAST(max(epoch_ms(ts)) AS BIGINT) AS ts_ms
        FROM events WHERE event_type = 'signup'
        GROUP BY {SID}, event_type""",
)
def tsdb_last(spark, sf_dir):
    out = last_points(_pts(spark, sf_dir), metric="signup")
    return out.select("series_id", "metric", _vr(F.col("value")), "ts_ms")


# ============================================================== flagship ====


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum:1h-avg:purchase{user=*} grouped by user — the SURVEY §7.1 slice."""
    tsq = TSQuery(
        start=START_SEC, end=END_SEC,
        queries=(SubQuery(
            metric="purchase", aggregator="sum",
            downsample=DownsampleSpec(3_600_000, "avg"),
            filters=(TagFilter("wildcard", "user", "*", group_by=True),),
        ),),
    )
    [r] = compile_query(load_points(spark, sf_dir), tsq)
    return r.df.select("metric", "user", _ts_sec(), _vr(F.col("value")))
