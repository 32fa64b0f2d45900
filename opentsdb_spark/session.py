"""SparkSession builder tuned for the engine.

Settings chosen for scale-out behavior (AQE, skew handling, partition
coalescing) while remaining correct on local[N]. The session timezone is
pinned to UTC because OpenTSDB timestamps are Unix epoch (reference:
src/core/Const.java:88-92 second/ms masks) and all bucket arithmetic is
epoch-based; calendar downsampling applies explicit per-query timezones
instead (reference: src/core/DownsamplingSpecification.java:135-147).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "opentsdb-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    cpus: local parallelism; defaults to $SPARK_GRAFT_CPUS or '*'.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cpus}]"
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")  # JEXL-like expression semantics
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata stores event-time as INT64 TIMESTAMP(NANOS) which
        # Spark's vectorized reader rejects; read as long ns + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # local-mode driver IS the executor: 8g starved the 32-thread JVM
        # once a session accumulated a few persisted sf0.1 frames (GC churn
        # inflated late-session queries ~10x); the target box has 128 GiB
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
