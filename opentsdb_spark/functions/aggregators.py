"""Aggregator registry — the engine's single aggregation vocabulary.

Mirrors the reference registry (src/core/Aggregators.java:175-203) used by
BOTH aggregation stages: per-series downsampling
(src/core/Downsampler.java) and cross-series group-by aggregation
(src/core/AggregationIterator.java). Each aggregator declares:

  builder  (value_col, ts_col) -> aggregate Column (native Spark, JVM-side)
  interp   how the cross-series alignment stage fills a series' missing
           value at another series' timestamp
           (reference src/core/Aggregators.java:38-44 Interpolation enum):
             lerp  linear interpolation between neighbors
             zim   zero if missing
             max   +inf sentinel  (i.e. missing ignored by min)
             min   -inf sentinel  (i.e. missing ignored by max)
             prev  previous value carried forward

Percentile notes: p50..p999 use Spark's exact ``percentile`` (linear
interpolation, matching commons-math default/R-7 closely); ep*r7 map to the
same; ep*r3 map to ``percentile_approx`` — the R-3 estimator difference is
documented, not reproduced bit-exactly (SURVEY.md §7.4.5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

Builder = Callable[[Column, Column], Column]


@dataclass(frozen=True)
class AggSpec:
    name: str
    builder: Builder
    interp: str = "lerp"  # lerp | zim | max | min | prev
    downsample_only: bool = False


AGGREGATORS: dict[str, AggSpec] = {}


def _reg(name: str, builder: Builder, interp: str = "lerp", downsample_only: bool = False) -> None:
    AGGREGATORS[name] = AggSpec(name, builder, interp, downsample_only)


def get_aggregator(name: str) -> AggSpec:
    try:
        return AGGREGATORS[name]
    except KeyError:
        raise ValueError(f"unknown aggregator: {name!r} (have {sorted(AGGREGATORS)})") from None


def _product(v: Column, _ts: Column) -> Column:
    # product has no native aggregate; fold a collected list JVM-side with a
    # higher-order function (group sizes = series-per-timestamp, small)
    # (reference 'mult', src/core/Aggregators.java:463-487)
    return F.aggregate(F.collect_list(v), F.lit(1.0), lambda acc, x: acc * x)


def _percentile(q: float) -> Builder:
    """commons-math DEFAULT estimation (the reference's plain pNN family,
    src/core/Aggregators.java:905-948 via new Percentile(p)): pos = q*(n+1),
    clamped, linear interpolation between the two neighbors. This is NOT
    R-7 — Spark's built-in percentile() (R-7) differs on small groups."""
    def b(v: Column, _ts: Column) -> Column:
        arr = F.array_sort(F.collect_list(v))
        n = F.size(arr)
        pos = F.lit(q) * (n + 1).cast("double")
        fpos = F.floor(pos)
        d = pos - fpos
        i = fpos.cast("int")
        interp = F.get(arr, i - 1) + d * (F.get(arr, i) - F.get(arr, i - 1))
        return (
            F.when(pos < 1.0, F.get(arr, 0))
            .when(pos >= n.cast("double"), F.get(arr, n - 1))
            .otherwise(interp)
            .cast("double")
        )

    return b


def _percentile_r7(q: float) -> Builder:
    # Spark's exact percentile IS Hyndman-Fan R-7 (pos = (n-1)q + 1,
    # linear) — matches commons-math EstimationType.R_7 bit-for-bit
    return lambda v, _ts: F.percentile(v, F.lit(q))


def _percentile_r3(q: float) -> Builder:
    """commons-math EstimationType.R_3: pos = rint(n*q) (half-to-even),
    0 when q <= 1/(2n); exact element selection, no interpolation."""
    def b(v: Column, _ts: Column) -> Column:
        arr = F.array_sort(F.collect_list(v))
        n = F.size(arr)
        nd = n.cast("double")
        pos = F.when(F.lit(q) <= 0.5 / nd, F.lit(0.0)).otherwise(F.rint(nd * F.lit(q)))
        return (
            F.when(pos < 1.0, F.get(arr, 0))
            .when(pos >= nd, F.get(arr, n - 1))
            .otherwise(F.get(arr, pos.cast("int") - 1))
            .cast("double")
        )

    return b


# --- the core set (reference src/core/Aggregators.java:175-203) -------------
_reg("sum", lambda v, t: F.sum(v), "lerp")
_reg("min", lambda v, t: F.min(v), "lerp")
_reg("max", lambda v, t: F.max(v), "lerp")
_reg("avg", lambda v, t: F.avg(v), "lerp")
def _upper_median(v: Column, _ts: Column) -> Column:
    # EXACT reference semantics (:397-431): sort, take element size/2
    # (0-indexed) — the UPPER median for even counts, not the interpolated
    # midpoint. Element selection also hash-matches across engines where an
    # interpolated average of two doubles might not.
    arr = F.array_sort(F.collect_list(v))
    return F.get(arr, (F.size(arr) / 2).cast("int")).cast("double")


_reg("median", _upper_median, "lerp")  # upper median (:397-431)
_reg("none", lambda v, t: F.first(v), "zim")  # raw passthrough; planner special-cases
_reg("mult", _product, "lerp")
_reg("dev", lambda v, t: F.coalesce(F.stddev_samp(v), F.lit(0.0)), "lerp")  # σ n−1 (:489-571); 1 pt -> 0
_reg("diff", lambda v, t: F.max_by(v, t) - F.min_by(v, t), "lerp")  # last − first (:573-618)
_reg("count", lambda v, t: F.count(v), "zim")
_reg("zimsum", lambda v, t: F.sum(v), "zim")
_reg("mimmin", lambda v, t: F.min(v), "max")  # missing ignored (:95-103)
_reg("mimmax", lambda v, t: F.max(v), "min")
_reg("pfsum", lambda v, t: F.sum(v), "prev")  # previous-fill sum (:50-55)
_reg("squareSum", lambda v, t: F.sum(v * v), "lerp")  # Σv² (:105-106,263-295)
_reg("first", lambda v, t: F.min_by(v, t), "lerp", downsample_only=True)  # (:810-830)
_reg("last", lambda v, t: F.max_by(v, t), "lerp", downsample_only=True)  # (:832-852)

# --- percentile family (:124-173) -------------------------------------------
for _q, _name in [(0.5, "p50"), (0.75, "p75"), (0.9, "p90"), (0.95, "p95"), (0.99, "p99"), (0.999, "p999")]:
    _reg(_name, _percentile(_q), "lerp")
    _reg(f"ep{_name[1:]}r7", _percentile_r7(_q), "lerp")
    _reg(f"ep{_name[1:]}r3", _percentile_r3(_q), "lerp")
