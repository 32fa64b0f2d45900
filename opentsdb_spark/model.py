"""Query model — dataclasses mirroring the reference's query IR.

Mirrors (semantically, not structurally):
  TSQuery       reference src/core/TSQuery.java:47-109
  TSSubQuery    reference src/core/TSSubQuery.java:52-92,212-240
  TagVFilter    reference src/query/filter/TagVFilter.java:70 (group_by flag)
  Downsampling  reference src/core/DownsamplingSpecification.java:107-191
  RateOptions   reference src/core/RateOptions.java:27-97
  pojo.Query    reference src/query/pojo/{Query,Metric,Expression,Join}.java

The model is engine-input only; compilation to a DataFrame lives in
plans/planner.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TagFilter:
    """One tag-value filter (reference src/query/filter/TagVFilter.java).

    type: literal_or | iliteral_or | not_literal_or | not_iliteral_or |
          wildcard | iwildcard | regexp | not_key  (plugin names allowed —
          see functions/filters.py registry)
    group_by: True -> this tag key becomes a grouping key
              (reference src/core/TsdbQuery.java:675-689 findGroupBys)
    """

    type: str
    tagk: str
    filter: str = ""
    group_by: bool = False


@dataclass(frozen=True)
class DownsampleSpec:
    """interval-agg[-fill][,timezone] (reference
    src/core/DownsamplingSpecification.java:107-191).

    interval_ms: bucket width in ms; 0 => "0all" single bucket over range
    calendar: True for 'Nc' calendar-aligned buckets (reference :135-147)
    fill: none | zero | nan | null | scalar (reference src/core/FillPolicy.java)
    """

    interval_ms: int
    aggregator: str
    fill: str = "none"
    fill_scalar: float = 0.0
    calendar: bool = False
    calendar_unit: str | None = None  # 'd','w','month','y','h','m' for calendar mode
    calendar_n: int = 1
    timezone: str = "UTC"
    run_all: bool = False  # "0all": one bucket spanning [start, end]


@dataclass(frozen=True)
class RateOptions:
    """Rate conversion options (reference src/core/RateOptions.java:27-97)."""

    counter: bool = False
    counter_max: int = (1 << 63) - 1
    reset_value: int = 0  # rate > reset_value -> emit 0 (when counter)
    drop_resets: bool = False
    # The reference ALWAYS computes each series' first rate against a
    # synthetic (t=0, v=0) origin "for backward compatibility"
    # (src/core/RateSpan.java:108-114), emitting value/epoch_seconds for the
    # first point. This engine's documented default DROPS the first point
    # instead (a rate needs two observations; the quirk's output is a
    # near-zero artifact of the epoch). Opt into reference behavior per
    # query: m=...rate{...,fvz}: or rateOptions {"firstVsZero": true}.
    first_vs_zero: bool = False


@dataclass(frozen=True)
class SubQuery:
    """One m= sub-query (reference src/core/TSSubQuery.java)."""

    metric: str
    aggregator: str = "sum"
    downsample: DownsampleSpec | None = None
    rate: RateOptions | None = None
    filters: tuple[TagFilter, ...] = ()
    explicit_tags: bool = False
    # TSUID-direct query (reference src/core/TsdbQuery.java:552-571)
    tsuids: tuple[str, ...] = ()
    # rollup routing hint (reference src/core/TsdbQuery.java:197-215)
    rollup_usage: str = "ROLLUP_NOFALLBACK"
    # prefer the pre-aggregated (grouped) table when one is routed
    # (reference src/tsd/QueryRpc.java:664-665 setPreAggregate)
    pre_aggregate: bool = False
    # histogram percentile query: non-empty routes the sub-query to the
    # histogram table (reference src/core/TSSubQuery.java:94-95,414-423,
    # src/core/TsdbQuery.java:807 isHistogramQuery); kept sorted like
    # setPercentiles does
    percentiles: tuple[float, ...] = ()
    # emit one series per histogram bucket, metric suffixed _bucket_lo_hi
    # (reference src/core/HistogramBucketDataPointsAdaptor.java:180-191)
    show_histogram_buckets: bool = False


@dataclass(frozen=True)
class TSQuery:
    """Top-level query (reference src/core/TSQuery.java:47-109).

    start/end accept OpenTSDB date syntax (timeparse.parse_datetime).
    """

    start: str | int
    end: str | int | None = None
    queries: tuple[SubQuery, ...] = ()
    timezone: str = "UTC"
    ms_resolution: bool = False
    # output options (reference src/core/TSQuery.java:71-94, parsed from
    # query-string params in src/tsd/QueryRpc.java:542-568)
    show_tsuids: bool = False
    show_query: bool = False
    show_stats: bool = False
    show_summary: bool = False
    # annotation controls (reference TSQuery no_annotations /
    # with_global_annotations, QueryRpc.java:542-548)
    no_annotations: bool = False
    with_global_annotations: bool = False


# ---------------------------------------------------------------- exp (v2) --


@dataclass(frozen=True)
class FillPolicy:
    """NumericFillPolicy (reference src/query/expression/NumericFillPolicy.java)."""

    policy: str = "zero"  # zero | nan | null | scalar
    value: float = 0.0


@dataclass(frozen=True)
class ExpMetric:
    """A named metric variable in an exp query (reference src/query/pojo/Metric.java)."""

    id: str
    metric: str
    aggregator: str = "sum"
    downsample: DownsampleSpec | None = None
    rate: RateOptions | None = None
    filters: tuple[TagFilter, ...] = ()
    fill_policy: FillPolicy = field(default_factory=FillPolicy)


@dataclass(frozen=True)
class ExpJoin:
    """Series-set join (reference src/query/pojo/Join.java:28-79).

    operator: 'intersection' | 'union'
    use_query_tags: join only on tag keys referenced by query filters
    include_agg_tags: include aggregated-away tag keys in the join key
    """

    operator: str = "intersection"
    use_query_tags: bool = False
    include_agg_tags: bool = True


@dataclass(frozen=True)
class ExpExpression:
    """Arithmetic expression over metric variables
    (reference src/query/pojo/Expression.java:43-55, JEXL -> here F.expr)."""

    id: str
    expr: str
    join: ExpJoin = field(default_factory=ExpJoin)
    # excluded from the generated __hash__: the one mutable field in the
    # frozen model family (hash(query) must work like every other class;
    # eq still compares it)
    fill_policies: dict[str, FillPolicy] = field(default_factory=dict, hash=False)


@dataclass(frozen=True)
class ExpQuery:
    """v2 expression query (reference src/query/pojo/Query.java)."""

    start: str | int
    end: str | int | None
    metrics: tuple[ExpMetric, ...]
    expressions: tuple[ExpExpression, ...]
    outputs: tuple[str, ...] = ()
