"""gexp — Graphite-style expression functions (/api/query/gexp).

Registry mirrors the reference's ExpressionFactory
(src/query/expression/ExpressionFactory.java:31-60): absolute, scale,
alias, sumSeries/sum, diffSeries/difference, multiplySeries/multiply,
divideSeries/divide, movingAverage, highestCurrent, highestMax, timeShift,
shift, firstDiff. Nested calls compose naturally as DataFrame
transformations (src/query/expression/Expressions.java:105-163).

Frames here are grouped query results: [*series_cols, ts, value]. The
multi-series functions delegate to the UNION series-join engine, exactly as
the reference does (DiffSeries.java:60-75 builds an ExpressionIterator with
SetOperator.UNION and 'a - b - ...').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentsdb_spark.model import FillPolicy
from opentsdb_spark.operators.join import evaluate_expression, series_join
from opentsdb_spark.operators.topk import highest_current, highest_max  # noqa: F401 (re-export)

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def absolute(df: DataFrame) -> DataFrame:
    """abs(v) per point (reference src/query/expression/Absolute.java)."""
    return df.withColumn("value", F.abs("value"))


def scale(df: DataFrame, factor: float) -> DataFrame:
    """v * factor (reference src/query/expression/Scale.java)."""
    return df.withColumn("value", F.col("value") * F.lit(float(factor)))


def alias_series(df: DataFrame, name: str) -> DataFrame:
    """Attach/replace an output alias column (reference Alias.java; @tag
    substitution resolved against the series columns)."""
    out = name
    cols = set(df.columns)
    parts: list = []
    i = 0
    while i < len(out):
        if out[i] == "@":
            j = i + 1
            while j < len(out) and (out[j].isalnum() or out[j] == "_"):
                j += 1
            tag = out[i + 1:j]
            parts.append(F.col(tag) if tag in cols else F.lit("@" + tag))
            i = j
        else:
            j = out.find("@", i)
            j = len(out) if j < 0 else j
            parts.append(F.lit(out[i:j]))
            i = j
    return df.withColumn("alias", F.concat(*parts) if parts else F.lit(name))


def time_shift(df: DataFrame, shift_ms: int) -> DataFrame:
    """Shift series timestamps by +/- shift_ms (reference TimeShift.java —
    'shifts the timestamps forward or back')."""
    return df.withColumn("ts", F.timestamp_millis(F.unix_millis("ts") + F.lit(shift_ms)))


def first_diff(df: DataFrame, series_cols: tuple[str, ...]) -> DataFrame:
    """First difference v - prev(v) per series (reference
    FirstDifference.java). The first point of each series is dropped."""
    w = Window.partitionBy(*series_cols).orderBy("ts")
    out = df.withColumn("value", F.col("value") - F.lag("value").over(w))
    return out.where(F.col("value").isNotNull())


def moving_average(
    df: DataFrame,
    series_cols: tuple[str, ...],
    count: int | None = None,
    time_ms: int | None = None,
) -> DataFrame:
    """Trailing moving average by point count or time window (reference
    src/query/expression/MovingAverage.java; also the internal
    Aggregators.MovingAverage, src/core/Aggregators.java:709-808)."""
    if (count is None) == (time_ms is None):
        raise ValueError("specify exactly one of count / time_ms")
    if count is not None:
        w = Window.partitionBy(*series_cols).orderBy("ts").rowsBetween(-(count - 1), 0)
    else:
        w = (
            Window.partitionBy(*series_cols)
            .orderBy(F.unix_millis("ts"))
            .rangeBetween(-time_ms, 0)
        )
    return df.withColumn("value", F.avg("value").over(w))


def _nary(frames: list[DataFrame], series_cols: tuple[str, ...], op: str,
          fill: FillPolicy | None) -> DataFrame:
    """UNION-join n frames and apply 'a <op> b <op> ...'."""
    if len(frames) < 2 or len(frames) > 26:
        raise ValueError(f"must have 2 to 26 series sets, got {len(frames)}")
    ids = tuple(_LETTERS[i] for i in range(len(frames)))
    variables = dict(zip(ids, frames))
    fills = {vid: fill for vid in ids} if fill is not None else {}
    joined = series_join(variables, series_cols, "union", fills)
    expr = f" {op} ".join(ids)
    out = evaluate_expression(joined, expr, ids)
    return out.select(*series_cols, "ts", "value")


def sum_series(frames: list[DataFrame], series_cols: tuple[str, ...] = ()) -> DataFrame:
    """Point-wise sum across series sets (reference SumSeries.java)."""
    return _nary(frames, series_cols, "+", FillPolicy("zero"))


def diff_series(frames: list[DataFrame], series_cols: tuple[str, ...] = ()) -> DataFrame:
    """Point-wise difference a - b - ... (reference DiffSeries.java:53-63)."""
    return _nary(frames, series_cols, "-", FillPolicy("zero"))


def multiply_series(frames: list[DataFrame], series_cols: tuple[str, ...] = ()) -> DataFrame:
    """Point-wise product (reference MultiplySeries.java). Missing sides
    fill 1 so a lone series passes through unscaled."""
    return _nary(frames, series_cols, "*", FillPolicy("scalar", 1.0))


def divide_series(frames: list[DataFrame], series_cols: tuple[str, ...] = ()) -> DataFrame:
    """Point-wise quotient a / b (reference DivideSeries.java). Missing sides
    fill 0 like every gexp variable (TimeSyncedIterator.java:74 hardcodes
    FillPolicy.ZERO), and division by zero follows JEXL's Java-double
    semantics: x/0 -> +-Infinity, 0/0 -> NaN (ExpressionIterator.java:346
    executes the script on doubles)."""
    return _nary(frames, series_cols, "/", FillPolicy("zero"))


def anomaly_zscore(
    df: DataFrame,
    series_cols: tuple[str, ...],
    lookback: int = 24,
    threshold: float = 2.0,
    min_points: int = 3,
) -> DataFrame:
    """Trailing z-score anomaly detection per series — the alerting-side
    companion to moving_average: each point is scored against the mean and
    sample-stddev of the PREVIOUS ``lookback`` points of its own series
    (the point itself excluded, so a spike cannot mask itself), and
    flagged when |z| exceeds ``threshold``. Points whose trailing window
    holds fewer than ``min_points`` values, or whose window variance is
    zero, get NULL zscore / false flag (warm-up and flat-line are not
    anomalies).

    The moments are computed from explicit sum / sum-of-squares window
    aggregates — var = (sumsq - n*mean^2) / (n-1) — rather than
    stddev_samp(), so the arithmetic is plain IEEE mul/add/div/sqrt that
    any engine replays bit-identically in frame order (the catalog
    hash-checks this against DuckDB running the SAME formula; Welford-ish
    built-in stddevs differ in low bits across engines).

    Scale shape: one shuffle (the per-series window partition), bounded
    O(1) running state per frame step. Feed it the DOWNSAMPLED grid, not
    raw points — the window is per-series, so skew follows the largest
    single series, same exposure as every per-series operator."""
    if lookback < 2:
        raise ValueError(f"lookback must be >= 2, got {lookback}")
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy("ts")
        .rowsBetween(-lookback, -1)
    )
    v = F.col("value").cast("double")
    n = F.count("value").over(w).cast("double")
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    mean = s / n
    var = (ss - n * mean * mean) / (n - F.lit(1.0))
    z = F.when(
        (n >= F.lit(float(min_points))) & (var > 0),
        (v - mean) / F.sqrt(var),
    )
    return df.withColumn("zscore", z).withColumn(
        "is_anomaly",
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))).otherwise(F.lit(False)),
    )


def slo_burn_rate(
    df: DataFrame,
    series_cols: tuple[str, ...],
    short_window: int = 1,
    long_window: int = 6,
    error_budget: float = 0.05,
    factor: float = 2.0,
    bad_col: str = "bad",
    total_col: str = "total",
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE-workbook
    multiwindow multi-burn-rate pattern, public) over per-bucket
    (bad, total) event counts: the burn rate of a trailing window is
    (sum bad / sum total) / error_budget — 1.0 means the error budget
    burns exactly at its sustainable pace, ``factor``x means the budget
    exhausts factor-times too fast. An alert fires only when BOTH the
    short window (fast detection) AND the long window (flap suppression)
    burn above ``factor``, trailing windows INCLUDING the current bucket
    — a page-worthy burn must be visible at both horizons.

    Ratios are ratio-of-sums over the window (never an average of
    per-bucket ratios — low-traffic buckets must not dominate), NULL
    while a window has no traffic. Windows are row-counted trailing
    frames over the downsampled grid, same contract as anomaly_zscore:
    feed the bucketed (bad, total) series, not raw events.

    Scale shape: ONE per-series window partition shuffle carrying two
    longs per bucket; both window sums share the frame machinery;
    alerting is a plain expression. Returns df + (burn_short_r..., the
    two burn rates and the alert flag)."""
    if short_window < 1 or long_window <= short_window:
        raise ValueError(
            f"need long_window > short_window >= 1, got "
            f"{short_window}/{long_window}")
    if not (0 < error_budget < 1):
        raise ValueError(f"error_budget must be in (0,1), got {error_budget}")

    def burn(nbuckets: int):
        w = (Window.partitionBy(*series_cols).orderBy("ts")
             .rowsBetween(-(nbuckets - 1), 0))
        bad = F.sum(F.col(bad_col).cast("double")).over(w)
        tot = F.sum(F.col(total_col).cast("double")).over(w)
        return F.when(tot > 0, (bad / tot) / F.lit(float(error_budget)))

    bs, bl = burn(short_window), burn(long_window)
    alert = (
        F.when(bs.isNotNull() & bl.isNotNull(),
               (bs >= F.lit(float(factor))) & (bl >= F.lit(float(factor))))
        .otherwise(F.lit(False))
    )
    return (
        df.withColumn("burn_short", bs)
        .withColumn("burn_long", bl)
        .withColumn("is_burning", alert)
    )


def anomaly_points(
    df: DataFrame,
    series_cols: tuple[str, ...],
    lookback: int = 24,
    threshold: float = 2.0,
    min_points: int = 3,
) -> DataFrame:
    """gexp-facing form of ``anomaly_zscore``: the ANOMALY series — only
    the points whose trailing |z| exceeds ``threshold``, valued at the
    z-score. A gexp function must return one [*group tagks, ts, value]
    series per group, so the full scored frame cannot ride through the
    expression tree; the marker-series cut keeps the threshold parameter
    load-bearing (it decides which points exist) and renders directly as
    alert markers over the raw series in the graph layer. The full
    (value, zscore, is_anomaly) detail stays available on the Python
    operator."""
    scored = anomaly_zscore(df, series_cols, lookback=lookback,
                            threshold=threshold, min_points=min_points)
    return scored.where(F.col("is_anomaly")).select(
        *series_cols, "ts", F.col("zscore").alias("value"))


def burn_points(
    bad: DataFrame,
    total: DataFrame,
    series_cols: tuple[str, ...],
    short_window: int = 1,
    long_window: int = 6,
    error_budget: float = 0.05,
    factor: float = 2.0,
) -> DataFrame:
    """gexp-facing form of ``slo_burn_rate``: BURNING buckets only, valued
    at the effective burn rate ``least(burn_short, burn_long)`` — the
    page-worthy magnitude, since the multiwindow alert condition is
    exactly min(burns) >= factor when both horizons share the factor.
    ``bad`` and ``total`` are two aligned [*series_cols, ts, value]
    series (numerator and denominator MUST arrive separately: a
    pre-divided ratio series would force averaging per-bucket ratios,
    which lets zero-traffic buckets dominate — the exact failure
    ratio-of-sums exists to avoid). Sides are outer-joined on
    (*series_cols, ts) with missing sides as 0 traffic, so a grid gap on
    one side cannot silently drop the bucket."""
    b = bad.select(*series_cols, "ts", F.col("value").alias("bad"))
    t = total.select(*series_cols, "ts", F.col("value").alias("total"))
    j = b.join(t, on=[*series_cols, "ts"], how="full_outer").select(
        *series_cols, "ts",
        F.coalesce("bad", F.lit(0.0)).alias("bad"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )
    out = slo_burn_rate(j, series_cols, short_window=short_window,
                        long_window=long_window, error_budget=error_budget,
                        factor=factor)
    return out.where(F.col("is_burning")).select(
        *series_cols, "ts",
        F.least("burn_short", "burn_long").alias("value"))
