"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query DataFrame on /root/testdata/sf0.001
queries()      -> {name: fn(spark, sf_dir) -> DataFrame} per SURVEY.md §2 op
oracle_sql()   -> {name: DuckDB SQL} equivalent oracle per query

All real logic lives in the opentsdb_spark package; the catalog module pairs
every implemented operator with its oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from opentsdb_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in catalog.CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    # callable sql entries resolve lazily (data-dependent literals, e.g.
    # trained IVF centroids) — see catalog.QueryDef.sql / resolve_sql.
    # A lazy resolve that fails (gate parquet unavailable in this
    # environment) degrades THAT entry to rows-only instead of taking the
    # whole oracle map down with it.
    out: dict[str, str] = {}
    for name, qd in catalog.CATALOG.items():
        if qd.sql is None:
            continue
        try:
            sql = catalog.resolve_sql(qd)
        except Exception:  # noqa: BLE001 — degrade one entry, keep the rest
            continue
        if sql is not None:
            out[name] = sql
    return out
