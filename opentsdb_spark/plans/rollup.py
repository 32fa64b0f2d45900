"""Rollup / pre-aggregate tables: generation, routing, query rewrite, split.

Reference semantics:
  * rollup points = pre-aggregated numeric points tagged with the producing
    aggregator + interval (src/rollup/RollUpDataPoint.java,
    src/rollup/RollupUtils.java:107-167)
  * a downsample query is rewritten to read the pre-aggregated table when an
    interval matches (transformDownSamplerToRollupQuery,
    src/core/TsdbQuery.java:197-215,542-545), with usage modes
    ROLLUP_RAW / ROLLUP_NOFALLBACK / ROLLUP_FALLBACK / ROLLUP_FALLBACK_RAW
    (src/core/TsdbQuery.java:197-215)
  * aggregate-over-rollup rewrites: avg = SUM/COUNT, count = sum of counts
    (src/core/Downsampler.java:163-221)
  * split queries: old data answered from the rollup table, data newer than
    a cutoff from raw (src/core/TsdbQuery.java:819-847,
    src/core/SplitRollupQuery.java)

Spark shape: the rollup table is Parquet partitioned like the raw table;
routing is a Python-level planner rule (SURVEY.md §7.3 — a Catalyst rule is
unnecessary). Reading N× fewer pre-aggregated rows is the entire win at
100 TB: a 1h rollup of second-resolution data is ~3600× smaller.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentsdb_spark.model import DownsampleSpec
from opentsdb_spark.operators.downsample import bucket_col

ROLLUP_AGGS = ("sum", "count", "min", "max")


def generate_rollup(points: DataFrame, interval_ms: int, interval_label: str) -> DataFrame:
    """Batch rollup generation: one pass computing sum/count/min/max per
    (series, bucket), unpivoted to the rollup row shape (FIXTURES.md §2:
    metric, ts, value, tags, interval, aggregator)."""
    return (
        points.withColumn("__b", bucket_col(F.col("ts"), interval_ms))
        .groupBy("metric", "tags", "__b")
        .agg(
            F.sum("value").alias("sum"),
            F.count("value").cast("double").alias("count"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .select(
            "metric",
            F.col("__b").alias("ts"),
            "tags",
            F.expr(
                "stack(4, 'sum', sum, 'count', count, 'min', min, 'max', max)"
                " AS (aggregator, value)"
            ),
        )
        .withColumn("interval", F.lit(interval_label))
    )


@dataclass
class RollupTable:
    interval_ms: int
    interval_label: str
    df: DataFrame  # rollup rows: metric, ts, tags, aggregator, value, interval


@dataclass
class RollupConfig:
    tables: list[RollupTable] = field(default_factory=list)
    # rollup generation lag SLA: data newer than (now - sla_ms) is assumed
    # not yet rolled up and answers from raw via split_rollup_query — the
    # planner's analog of the reference's last-rollup-timestamp split
    # (src/core/SplitRollupQuery.java, TsdbQuery.java:819-847). None =
    # tables assumed complete through query end.
    sla_ms: int | None = None

    def best_match(self, interval_ms: int) -> RollupTable | None:
        """Largest rollup interval that evenly divides the query interval
        (the reference picks the matching RollupInterval;
        src/core/TsdbQuery.java:542-548)."""
        candidates = [t for t in self.tables if interval_ms and interval_ms % t.interval_ms == 0]
        return max(candidates, key=lambda t: t.interval_ms) if candidates else None


# aggregator -> (rollup agg to read, final combine expr over the value col)
_REWRITE = {
    "sum": ("sum", "sum"),
    "zimsum": ("sum", "sum"),
    "min": ("min", "min"),
    "mimmin": ("min", "min"),
    "max": ("max", "max"),
    "mimmax": ("max", "max"),
    "count": ("count", "sum"),  # count of raw points = sum of rollup counts
}


def rollup_downsample(
    rollup: RollupTable,
    spec: DownsampleSpec,
    series_cols: tuple[str, ...] = ("metric", "tags"),
) -> DataFrame:
    """Answer a downsample query from a rollup table.

    avg is rewritten to sum/count (reference src/core/Downsampler.java:163-221);
    sum/min/max/count re-aggregate their own rollup stream. Unsupported
    aggregators (dev, percentiles, ...) must fall back to raw — enforced by
    raising so the planner routes per its ROLLUP_USAGE mode."""
    if spec.calendar or spec.run_all:
        raise ValueError("rollup path supports fixed intervals only")
    if spec.fill != "none":
        # rollup re-aggregation produces no fill grid; a filled downsample
        # must scan raw so the grid/interpolation semantics match the
        # Downsampler exactly — the planner's ValueError fallback routes it
        # there (tableToBeScanned, src/core/TsdbQuery.java:1553-1571)
        raise ValueError("fill policies cannot be answered from rollups")
    b = bucket_col(F.col("ts"), spec.interval_ms)
    df = rollup.df
    if spec.aggregator == "avg":
        pv = (
            df.where(F.col("aggregator").isin("sum", "count"))
            .groupBy(*series_cols, b.alias("__b"))
            .pivot("aggregator", ["sum", "count"])
            .agg(F.sum("value"))
        )
        out = pv.select(
            *series_cols,
            F.col("__b").alias("ts"),
            (F.col("sum") / F.col("count")).alias("value"),
        )
        return out
    try:
        read_agg, combine = _REWRITE[spec.aggregator]
    except KeyError:
        raise ValueError(
            f"aggregator {spec.aggregator!r} cannot be answered from rollups"
        ) from None
    combine_fn = {"sum": F.sum, "min": F.min, "max": F.max}[combine]
    return (
        df.where(F.col("aggregator") == read_agg)
        .groupBy(*series_cols, b.alias("__b"))
        .agg(combine_fn("value").alias("value"))
        .withColumnRenamed("__b", "ts")
    )


def routed_downsample(
    raw_points: DataFrame,
    config: RollupConfig | None,
    spec: DownsampleSpec,
    usage: str = "ROLLUP_NOFALLBACK",
    start_ms: int | None = None,
    end_ms: int | None = None,
    series_cols: tuple[str, ...] = ("metric", "tags"),
    cutoff_ms: int | None = None,
) -> DataFrame:
    """Planner rule: choose rollup vs raw per the query's ROLLUP_USAGE
    (reference src/core/TsdbQuery.java:197-215).

    ``cutoff_ms``: the last-rolled-up boundary (RollupConfig.sla_ms resolved
    against 'now' by the caller). Ranges entirely older answer from the
    table, entirely newer from raw, straddling ones split at the
    interval-aligned cutoff (SplitRollupQuery.java, TsdbQuery.java:819-847)."""
    from opentsdb_spark.operators.downsample import downsample

    def _raw() -> DataFrame:
        return downsample(raw_points, spec, start_ms, end_ms, series_cols)

    if usage == "ROLLUP_RAW" or config is None:
        return _raw()
    table = config.best_match(spec.interval_ms)
    if table is None:
        if usage in ("ROLLUP_FALLBACK", "ROLLUP_FALLBACK_RAW"):
            return _raw()
        raise ValueError(f"no rollup table matches interval {spec.interval_ms}ms")
    try:
        if cutoff_ms is not None:
            aligned = cutoff_ms - (cutoff_ms % spec.interval_ms)
            if start_ms is not None and start_ms >= aligned:
                return _raw()  # entire range newer than the last rollup
            if end_ms is None or end_ms > aligned:
                return split_rollup_query(
                    raw_points, table, spec, aligned, series_cols,
                    start_ms=start_ms, end_ms=end_ms,
                )
        return rollup_downsample(table, spec, series_cols)
    except ValueError:
        if usage in ("ROLLUP_FALLBACK", "ROLLUP_FALLBACK_RAW"):
            return _raw()
        raise


def split_rollup_query(
    raw_points: DataFrame,
    rollup: RollupTable,
    spec: DownsampleSpec,
    cutoff_ms: int,
    series_cols: tuple[str, ...] = ("metric", "tags"),
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> DataFrame:
    """Old data from the rollup table + recent data from raw, unioned at a
    cutoff (reference src/core/TsdbQuery.java:819-847, SplitRollupQuery.java).
    The cutoff must be bucket-aligned so no bucket straddles the seam.
    ``start_ms``/``end_ms`` bound the raw-side downsample grid when given
    (the rollup side is bounded by the caller's range predicate)."""
    from opentsdb_spark.operators.downsample import downsample

    if cutoff_ms % spec.interval_ms != 0:
        raise ValueError("cutoff must be aligned to the downsample interval")
    old = rollup_downsample(rollup, spec, series_cols).where(
        F.unix_millis("ts") < cutoff_ms
    )
    recent_start = None if start_ms is None and end_ms is None else (
        cutoff_ms if start_ms is None else max(start_ms, cutoff_ms))
    recent = downsample(
        raw_points.where(F.unix_millis("ts") >= cutoff_ms), spec,
        recent_start, end_ms, series_cols,
    )
    return old.unionByName(recent)


# ---------------------------------------------------------------- storage
#
# The reference expects rollups to be MATERIALIZED by an external batch job
# (docs/rollups: "OpenTSDB does not generate rollups itself"; the TSD only
# ingests them via RollUpDataPointRpc and reads them per the JSON config
# file named by tsd.rollups.config, src/rollup/RollupConfig.java:44-67 —
# one entry per interval, each naming its storage table). On Spark the
# batch job IS the engine: one groupBy pass per interval over the raw
# partitioned layout, written dt-partitioned exactly like the raw table so
# rollup queries get the same partition pruning. `rollups.json` plays the
# role of the reference's rollup-config file.

ROLLUP_MANIFEST = "rollups.json"


def write_rollup_table(rollup_df: DataFrame, path: str) -> None:
    """Persist one rollup table dt-partitioned (sources.points.write_points
    layout): date directories prune before any file opens, so a dashboard's
    1-week query over a year-long 1h rollup reads ~2% of the files."""
    out = rollup_df.withColumn("dt", F.to_date("ts"))
    out.write.mode("overwrite").partitionBy("dt").parquet(path)


def build_rollup_tables(
    points: DataFrame, base_dir: str, intervals: list[str] | tuple[str, ...] = ("1h", "1d")
) -> list[str]:
    """Materialize one rollup table per interval label under ``base_dir``
    and write the ``rollups.json`` manifest (the reference's
    tsd.rollups.config JSON: an entry per interval naming its table,
    src/rollup/RollupConfig.java:44-67,85-106 — duplicate intervals
    rejected there, and here).

    Each interval is an independent groupBy over the same scan; at 100 TB
    the sum/count/min/max rollup of second-resolution data is ~3600x (1h)
    to ~86400x (1d) smaller than raw, which is the entire point: every
    dashboard query that downsamples to a multiple of a built interval
    reads the small table instead of the corpus."""
    import json
    import os

    from opentsdb_spark.timeparse import parse_duration_ms

    labels = list(intervals)
    if len(set(labels)) != len(labels):
        raise ValueError("only one rollup of each interval can be configured")
    manifest = []
    for label in labels:
        ms = parse_duration_ms(label)
        if ms <= 0:
            raise ValueError(f"rollup interval must be positive: {label!r}")
        path = os.path.join(base_dir, label)
        write_rollup_table(generate_rollup(points, ms, label), path)
        manifest.append({"interval": label, "interval_ms": ms, "table": label})
    os.makedirs(base_dir, exist_ok=True)
    with open(os.path.join(base_dir, ROLLUP_MANIFEST), "w") as fh:
        json.dump({"intervals": manifest}, fh, indent=2)
    return [os.path.join(base_dir, e["table"]) for e in manifest]


def load_rollup_config(spark, base_dir: str) -> RollupConfig:
    """Attach a ``build_rollup_tables`` directory as a RollupConfig.

    Reads the manifest (not the directory listing) so partially-written or
    foreign subdirectories are never attached, mirroring the reference's
    config-file-driven table registry. The frames keep their ``dt``
    partition column: the planner's time_range_predicate emits partition
    pruning over it before routing picks a table."""
    import json
    import os

    with open(os.path.join(base_dir, ROLLUP_MANIFEST)) as fh:
        meta = json.load(fh)
    tables = [
        RollupTable(
            int(e["interval_ms"]),
            e["interval"],
            spark.read.parquet(os.path.join(base_dir, e["table"])),
        )
        for e in meta["intervals"]
    ]
    return RollupConfig(tables)
