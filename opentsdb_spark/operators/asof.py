"""Temporal joins: as-of (most-recent-match) and interval containment.

The operator the DataFrame API lacks natively: for every left row, attach
the latest right row with the same key and ``right.ts <= left.ts``
(direction='backward'; 'forward' takes the earliest right row at-or-after).
The classic uses: enrich trades with the prevailing quote, join metric
points to the most recent config/annotation state, attach each event to the
last snapshot before it. The reference's /api/query/last + back_scan
(src/tsd/QueryRpc.java, src/core/TSQuery last-point path) answers the
degenerate single-timestamp form of the same question.

Implementation is the UNION-SCAN formulation, not a range join: tag each
side, union by name, and carry the right row's payload forward (backward
direction) with ``last(..., ignorenulls=True)`` over a per-key window
ordered by (ts, side) — right rows sort before left rows at equal
timestamps, so ties match (>= semantics, like DuckDB's ASOF JOIN).

Scale shape: ONE shuffle (the per-key window partition), no range/theta
join (Spark plans those as broadcast-nested-loop — O(|L| x |R|) per key),
no per-left-row subquery. Each partition is a single ordered sweep with
O(payload) state, the same shape a 1000-executor cluster wants: skew only
if one key dominates, the same exposure any per-key operator has.

Rows carry forward within a key regardless of gap size; pass
``tolerance_ms`` to null matches older than the window (pandas
merge_asof's ``tolerance``).

Determinism: if the right side holds DUPLICATE (key, ts) rows the winner
would be partition-order dependent (both here and in database ASOF joins)
— pre-aggregate the right side to one row per (key, ts) first; the
catalog entry does exactly that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_ms: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's
    ``right_cols`` (renamed with ``suffix``) and its timestamp
    ``ts{suffix}`` — NULLs when no right row qualifies. ``direction``:
    'backward' = latest right at-or-before, 'forward' = earliest right
    at-or-after."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    keys = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != ts_col]
    rside = right.select(
        *keys, ts_col, *[F.col(c).alias(c + suffix) for c in right_cols]
    ).withColumn("__side", F.lit(0))
    u = left.withColumn("__side", F.lit(1)).unionByName(
        rside, allowMissingColumns=True
    )
    ts = F.col(ts_col)
    order = [ts.asc(), F.col("__side").asc()] if direction == "backward" else [
        ts.desc(), F.col("__side").asc()
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the carried state is ONE struct per right row, not per-column lasts:
    # a per-column last(ignorenulls) would skip a matched row's NULL payload
    # and resurrect a STALE older value (a (value, ts) pair corresponding to
    # no actual right row — DuckDB ASOF/pandas merge_asof return the matched
    # row's NULL). The struct itself is non-null whenever a right row
    # exists, so the whole row wins or loses atomically.
    payload = F.last(
        F.when(
            F.col("__side") == 0,
            F.struct(ts.alias("__ts"), *[F.col(c + suffix) for c in right_cols]),
        ),
        ignorenulls=True,
    ).over(w)
    carried = {c + suffix: payload[c + suffix] for c in right_cols}
    carried["ts" + suffix] = payload["__ts"]
    out = u.select(
        *[c for c in left.columns],
        *[v.alias(k) for k, v in carried.items()],
        "__side",
    ).where(F.col("__side") == 1).drop("__side")
    if tolerance_ms is not None:
        gap = F.abs(
            F.unix_millis(F.col(ts_col)) - F.unix_millis(F.col("ts" + suffix))
        )
        keep = F.col("ts" + suffix).isNotNull() & (gap <= tolerance_ms)
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(keep, F.col(c + suffix)).alias(c + suffix)
                for c in right_cols
            ],
            F.when(keep, F.col("ts" + suffix)).alias("ts" + suffix),
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_ms: int = 600_000,
) -> DataFrame:
    """Distributed interval-containment join: every (point, interval) pair
    with equal ``on`` keys and ``start <= point.ts <= end`` (closed on both
    ends) — the temporal join behind "which events fell inside this outage
    window / annotation span / maintenance period".

    Spark plans a raw BETWEEN theta-join as a broadcast-nested-loop —
    O(|points| x |intervals|) per key. Here both sides BIN to fixed
    ``bucket_ms`` buckets (the same binned-equi-join trick the raw-agg grid
    strategy uses, operators/groupby.py): a point lands in exactly one
    bucket, an interval explodes to the buckets it covers, and the join is
    a plain hash equi-join on (keys..., bucket) with the exact containment
    predicate as a post-filter. Each qualifying pair matches exactly once
    (the point's single bucket), so no dedup pass. Pick ``bucket_ms`` near
    the TYPICAL interval length: the interval-side blowup is
    ~len/bucket_ms + 1 rows while bucket population stays bounded.

    Column names must be disjoint apart from ``on`` (pre-rename the
    sides); zero/negative-length intervals where end < start match
    nothing."""
    keys = list(on)
    pb = points.withColumn(
        "__b", F.floor(F.unix_millis(F.col(point_ts)) / F.lit(bucket_ms))
    )
    iv = intervals.where(F.col(end_col) >= F.col(start_col))
    ib = iv.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_millis(F.col(start_col)) / F.lit(bucket_ms)),
                F.floor(F.unix_millis(F.col(end_col)) / F.lit(bucket_ms)),
            )
        ),
    )
    return (
        pb.join(ib, on=[*keys, "__b"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
