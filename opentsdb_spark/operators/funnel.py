"""Ordered-event analytics: step funnels and retention cohorts.

The event-stream companions to operators/asof.py's temporal joins and the
sessionizer: given a raw event feed (the same table events_to_points
ingests — FIXTURES.md §6), answer the two classic product/ops questions a
time-series store adjoins:

  * funnel_steps — how far does each user get through an ORDERED sequence
    of event types (view -> click -> purchase), where each step must occur
    at-or-after the previous step's completion (ClickHouse's windowFunnel
    semantics, strictness 'default': intervening events are allowed,
    equal timestamps satisfy '>=')?
  * retention_cohorts — of the users first seen on day D, how many were
    active again on day D+k (the classic triangle matrix)?

Scale shape (both): ONE aggregation over user_id with per-user state
bounded by that user's OWN events (funnel: the step-typed timestamps;
retention: the distinct active days) — no self-joins, no per-step join
chain (k steps as k joins = k shuffles and k plan branches), no window
over the whole feed. The funnel's sequential min-chain runs as
higher-order array expressions (sort_array + filter + element_at) AFTER
the single groupBy, entirely JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_ms: int | None = None,
) -> DataFrame:
    """Per-user funnel progress through ``steps`` (ordered event types).

    Semantics: t1 = the user's EARLIEST step-1 event; t_i (i>1) = the
    earliest step-i event at-or-after t_{i-1}; with ``window_ms``, every
    t_i must additionally fall within ``window_ms`` of t1 (the
    windowFunnel contract). Users with no step-1 event emit no row.

    Returns one row per funnel-entered user:
      (user, stage, step_ts_1 .. step_ts_n)  — stage = furthest step
    reached (1-based), step_ts_i = epoch-ms of the step's completion
    (NULL past the reached stage).

    The greedy earliest-completion chain is the standard funnel
    definition and is optimal: taking the earliest valid t_i never
    excludes a deeper completion that a later t_i would allow.

    100 TB shape: one groupBy(user) — min() for step 1 and
    sort_array(collect_list()) of each LATER step's timestamps, then the
    chain resolves per user via array filter/element_at expressions.
    Shuffle rows are (user, t1, arrays of step-typed ts only); per-user
    memory is that user's funnel-step event count. A mega-user is the
    only skew exposure — identical to sessionization's.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    ts_ms = F.unix_millis(F.col(ts_col))
    typ = F.col(type_col)

    aggs: list[Column] = [
        F.min(F.when(typ == steps[0], ts_ms)).alias("__t1")
    ]
    for i, s in enumerate(steps[1:], start=2):
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(typ == s, ts_ms))
            ).alias(f"__a{i}")
        )
    per_user = (
        events.where(typ.isin(steps))
        .groupBy(F.col(user_col))
        .agg(*aggs)
        .where(F.col("__t1").isNotNull())
    )

    # resolve the chain: t_i = first element of the sorted step-i array
    # that is >= t_{i-1} (and <= t1 + window). try_element_at(filter(...),
    # 1) on a SORTED array IS the min of the qualifying suffix (try_: an
    # empty qualifying suffix is NULL, not an ANSI index error).
    out = per_user.withColumn("step_ts_1", F.col("__t1"))
    deadline = (
        F.col("__t1") + F.lit(int(window_ms)) if window_ms is not None else None
    )
    # NOTE: the predicate must be a ONE-parameter callable — F.filter
    # dispatches on arity, and a second (default) parameter would be bound
    # to the element INDEX, silently replacing the captured column
    def _mk_qual(prev_col):
        def _qual(x):
            cond = x >= prev_col
            if deadline is not None:
                cond = cond & (x <= deadline)
            return cond

        return _qual

    for i in range(2, len(steps) + 1):
        prev = F.col(f"step_ts_{i - 1}")
        out = out.withColumn(
            f"step_ts_{i}",
            F.when(
                prev.isNotNull(),
                F.try_element_at(F.filter(F.col(f"__a{i}"), _mk_qual(prev)),
                                 F.lit(1)),
            ),
        )
    stage = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage = stage + F.when(F.col(f"step_ts_{i}").isNotNull(), 1).otherwise(0)
    return out.select(
        F.col(user_col),
        stage.cast("int").alias("stage"),
        *[F.col(f"step_ts_{i}") for i in range(1, len(steps) + 1)],
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily retention triangle: users are cohorted by the calendar day of
    their FIRST event; each (cohort_date, day_offset) cell counts the
    cohort's users active day_offset days later (offset 0 = the cohort's
    size). Returns (cohort_date, day_offset, n_users).

    100 TB shape: one groupBy(user) collects the user's distinct active
    days as a set (bounded by the span in days, not the event count),
    min() of the set is the cohort day; explode + a second aggregation on
    the tiny (cohort, offset) key space produce the triangle. Two
    shuffles total — the first carries (user, day-set) rows only, the
    second at most cohort_days x span rows per partition after partial
    aggregation. No distinct-count over the raw feed, no user x day
    self-join."""
    d = F.to_date(F.col(ts_col))
    per_user = events.groupBy(F.col(user_col)).agg(
        F.collect_set(d).alias("__days")
    )
    exploded = per_user.select(
        F.array_min("__days").alias("cohort_date"),
        F.explode("__days").alias("__day"),
    )
    return (
        exploded.groupBy(
            "cohort_date",
            F.datediff(F.col("__day"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .select("cohort_date", F.col("day_offset").cast("int").alias("day_offset"),
                "n_users")
    )
