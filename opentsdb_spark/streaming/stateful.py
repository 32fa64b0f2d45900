"""Custom stateful streaming operators (applyInPandasWithState).

The reference's TSD computes rate-of-change on the fly while serving a
query (src/core/RateSpan.java) — in a continuous pipeline that becomes a
stateful stream: to emit a rate for each arriving point you must remember
the previous (timestamp, value) PER SERIES across micro-batches. That is
exactly GroupState; everything else in this engine is stateless DataFrame
ops, so this module is deliberately the only custom-state code.

State size is O(#live series) × 16 bytes — bounded, no watermark needed
(matching the reference: a series' last point never expires while the TSD
runs; pass a GroupStateTimeout if series churn matters).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("rate", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("last_ts_ms", T.LongType()), T.StructField("last_value", T.DoubleType())]
)


def _rate_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (series_id,) = key
    if state.exists:
        last_ts, last_v = state.get
    else:
        last_ts, last_v = None, None
    out_rows: list[tuple[Any, ...]] = []
    for pdf in batches:
        pdf = pdf.sort_values("ts_ms")
        for ts_ms, v in zip(pdf["ts_ms"], pdf["value"]):
            if last_ts is None or ts_ms > last_ts:
                if last_ts is not None:
                    rate = (v - last_v) / ((ts_ms - last_ts) / 1000.0)
                    out_rows.append((series_id, pd.Timestamp(ts_ms, unit="ms"), rate))
                # the cursor only ever advances: a LATE point (ts <= last)
                # emits nothing AND must not regress the state, or the next
                # in-order point rates across an already-rated interval
                # (the reference RateSpan never steps backwards)
                last_ts, last_v = int(ts_ms), float(v)
    if last_ts is not None:
        state.update((last_ts, last_v))
    yield pd.DataFrame(out_rows, columns=["series_id", "ts", "rate"])


def streaming_rate(points: DataFrame) -> DataFrame:
    """Continuous per-series rate over a point stream.

    Input: streaming point frame (metric, ts, value, tags). Output stream:
    (series_id, ts, rate) — one row per input point after the series' first
    (the first has no predecessor; the reference's synthetic-zero quirk is
    NOT reproduced here, matching our batch default)."""
    from opentsdb_spark.sources.points import series_id_col

    keyed = points.select(
        series_id_col().alias("series_id"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value"),
    )
    return keyed.groupBy("series_id").applyInPandasWithState(
        _rate_fn,
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessions(
    points: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation over the live point stream — the
    streaming form of the batch ``tsdb_sessionize`` catalog query, built
    ENTIRELY from native operators: watermark + ``session_window`` groupBy
    (dynamic-gap state is managed by Spark's session-window state store;
    no custom GroupState needed, which is why this lives beside — not
    inside — the applyInPandasWithState rate).

    Per (metric, series) session: event count, value sum, first/last event
    time. In append mode a session emits once the watermark passes its
    close (event-time end + gap); state is bounded by live sessions x
    O(32B). Late points inside the watermark re-open/merge sessions —
    exactly the semantics a TSD-side "activity burst" monitor wants."""
    from opentsdb_spark.sources.points import series_id_col

    keyed = points.withColumn("series_id", series_id_col())
    return (
        keyed.withWatermark("ts", watermark)
        .groupBy("metric", "series_id", F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "metric", "series_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "sum_value", "first_ts", "last_ts",
        )
    )


ZSCORE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("zscore", T.DoubleType(), True),
        T.StructField("is_anomaly", T.BooleanType(), False),
    ]
)

_ZSCORE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("window", T.ArrayType(T.DoubleType())),
    ]
)


def _make_zscore_fn(lookback: int, threshold: float, min_points: int):
    def _zscore_fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series_id,) = key
        if state.exists:
            last_ts, window = state.get
            window = list(window)
        else:
            last_ts, window = None, []
        out_rows: list[tuple[Any, ...]] = []
        for pdf in batches:
            pdf = pdf.sort_values("ts_ms")
            for ts_ms, v in zip(pdf["ts_ms"], pdf["value"]):
                if last_ts is not None and ts_ms <= last_ts:
                    continue  # cursor never regresses (see _rate_fn)
                v = float(v)
                # moments accumulate SEQUENTIALLY over the trailing
                # window, the same left-to-right IEEE order the batch
                # operator's window sum uses — the streaming==batch test
                # pins exact equality, not approximate
                n = float(len(window))
                z = None
                if n >= min_points:
                    s = ss = 0.0
                    for w in window:
                        s += w
                        ss += w * w
                    mean = s / n
                    var = (ss - n * mean * mean) / (n - 1.0)
                    if var > 0:
                        z = (v - mean) / var**0.5
                out_rows.append(
                    (series_id, pd.Timestamp(ts_ms, unit="ms"), v, z,
                     bool(z is not None and abs(z) > threshold))
                )
                window.append(v)
                if len(window) > lookback:
                    window = window[-lookback:]
                last_ts = int(ts_ms)
        if last_ts is not None:
            state.update((last_ts, window))
        yield pd.DataFrame(
            out_rows,
            columns=["series_id", "ts", "value", "zscore", "is_anomaly"],
        )

    return _zscore_fn


def streaming_zscore(
    points: DataFrame,
    lookback: int = 24,
    threshold: float = 2.0,
    min_points: int = 3,
) -> DataFrame:
    """Continuous per-series trailing z-score anomaly flags — the
    streaming twin of operators/expressions.anomaly_zscore, for alerting
    on the live (typically pre-downsampled) point stream instead of a
    stored grid. Same contract: each arriving point is scored against the
    mean/sample-stddev of the series' previous ``lookback`` in-order
    points (itself excluded); warm-up (< min_points) and zero-variance
    windows emit NULL zscore / false flag. Late points (event time at or
    before the cursor) are dropped without touching state, like the
    streaming rate.

    The state is O(#live series x lookback) doubles, and the moment
    accumulation replays the batch window-sum's sequential IEEE order —
    tests pin the streamed output EXACTLY equal to the batch operator on
    the same in-order feed, the same streaming==batch proof the HLL
    register build uses.

    NULL/NaN-valued points are dropped at the keyed select — they can
    neither be scored nor contribute moments, and appending them would
    poison the trailing window. The equivalence contract on feeds with
    gaps is therefore streamed == batch ON THE PRE-FILTERED feed (pinned
    by test): a NULL row left in place batch-side would still occupy a
    rows-window SLOT even though count/sum skip it, and a NaN would
    propagate through the batch window sums for ``lookback`` rows."""
    if lookback < 2:
        raise ValueError(f"lookback must be >= 2, got {lookback}")
    if min_points < 2:
        raise ValueError(f"min_points must be >= 2, got {min_points}")
    from opentsdb_spark.sources.points import series_id_col

    keyed = points.select(
        series_id_col().alias("series_id"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value"),
    ).filter(
        F.col("value").isNotNull() & ~F.isnan(F.col("value").cast("double"))
    )
    return keyed.groupBy("series_id").applyInPandasWithState(
        _make_zscore_fn(int(lookback), float(threshold), int(min_points)),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=_ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BURN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("bad", T.LongType(), True),
        T.StructField("total", T.LongType(), True),
        T.StructField("burn_short", T.DoubleType(), True),
        T.StructField("burn_long", T.DoubleType(), True),
        T.StructField("is_burning", T.BooleanType(), False),
    ]
)

_BURN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("bads", T.ArrayType(T.DoubleType())),
        T.StructField("tots", T.ArrayType(T.DoubleType())),
    ]
)


def _make_burn_fn(short_window: int, long_window: int, error_budget: float,
                  factor: float):
    def _burn_fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series_id,) = key
        if state.exists:
            last_ts, bads, tots = state.get
            bads, tots = list(bads), list(tots)
        else:
            last_ts, bads, tots = None, [], []
        out_rows: list[tuple[Any, ...]] = []
        for pdf in batches:
            pdf = pdf.sort_values("ts_ms")
            for ts_ms, bad, total in zip(pdf["ts_ms"], pdf["bad"],
                                         pdf["total"]):
                if last_ts is not None and ts_ms <= last_ts:
                    continue  # cursor never regresses (see _rate_fn)
                bads.append(float(bad))
                tots.append(float(total))
                if len(bads) > long_window:
                    bads, tots = bads[-long_window:], tots[-long_window:]

                def burn(n: int):
                    # left-to-right over the trailing frame, the batch
                    # window-sum's order (exact for integral doubles)
                    bs = ts_ = 0.0
                    for b in bads[-n:]:
                        bs += b
                    for t in tots[-n:]:
                        ts_ += t
                    if ts_ > 0:
                        return (bs / ts_) / error_budget
                    return None

                s, lo = burn(short_window), burn(long_window)
                out_rows.append(
                    (series_id, pd.Timestamp(int(ts_ms), unit="ms"),
                     int(bad), int(total), s, lo,
                     bool(s is not None and lo is not None
                          and s >= factor and lo >= factor))
                )
                last_ts = int(ts_ms)
        if last_ts is not None:
            state.update((last_ts, bads, tots))
        yield pd.DataFrame(
            out_rows,
            columns=["series_id", "ts", "bad", "total", "burn_short",
                     "burn_long", "is_burning"],
        )

    return _burn_fn


def streaming_burn_rate(
    buckets: DataFrame,
    short_window: int = 1,
    long_window: int = 6,
    error_budget: float = 0.05,
    factor: float = 2.0,
    series_col: str = "series_id",
) -> DataFrame:
    """Continuous multi-window SLO burn-rate alerting — the streaming
    twin of operators/expressions.slo_burn_rate, for paging off the live
    pre-bucketed (bad, total) stream instead of a stored grid. Same
    contract: trailing ratio-of-sums INCLUDING the current bucket over
    both windows divided by the error budget, alert only when BOTH
    exceed ``factor``; zero-traffic windows give NULL burn and no alert.
    Late buckets (event time at or before the series cursor) are dropped
    without touching state, like the streaming rate/zscore.

    State is O(#live series x long_window) doubles; window sums fold
    left-to-right in the batch frame's order (exact for integral
    counts), so tests pin the streamed output EXACTLY equal to the batch
    operator on the same in-order feed."""
    if short_window < 1 or long_window <= short_window:
        raise ValueError(
            f"need long_window > short_window >= 1, got "
            f"{short_window}/{long_window}")
    if not (0 < error_budget < 1):
        raise ValueError(f"error_budget must be in (0,1), got {error_budget}")
    keyed = buckets.select(
        F.col(series_col).cast("string").alias("series_id"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("bad").cast("long").alias("bad"),
        F.col("total").cast("long").alias("total"),
    ).filter(F.col("bad").isNotNull() & F.col("total").isNotNull())
    return keyed.groupBy("series_id").applyInPandasWithState(
        _make_burn_fn(int(short_window), int(long_window),
                      float(error_budget), float(factor)),
        outputStructType=BURN_OUTPUT_SCHEMA,
        stateStructType=_BURN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
