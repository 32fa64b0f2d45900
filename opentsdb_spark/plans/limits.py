"""Query limit guards.

Reference: byte / data-point ceilings abort over-large queries
(src/core/TsdbQuery.java:527-536, src/query/QueryLimitOverride.java —
per-metric overrides of tsd.query.limits.data_points / .bytes). On Spark
the scan itself is distributed, so the guard protects the driver/collect
side: count the result lazily and refuse before materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class QueryLimitExceeded(RuntimeError):
    pass


# process-wide default ceiling, the analog of tsd.query.limits.data_points
# (0 = disabled, the reference's default). Every API handler consults this
# before collecting to the driver; a per-request "max_data_points" overrides
# it (QueryLimitOverride.java's per-metric override generalized per-request).
DEFAULT_MAX_DATA_POINTS = 0


def configure(max_data_points: int) -> None:
    global DEFAULT_MAX_DATA_POINTS
    DEFAULT_MAX_DATA_POINTS = int(max_data_points)


def request_limit(request: dict) -> int:
    return int(request.get("max_data_points", DEFAULT_MAX_DATA_POINTS))


def enforce_data_point_limit(df: DataFrame, max_data_points: int) -> DataFrame:
    """Raise if the result exceeds the ceiling (0 = unlimited, the default,
    matching tsd.query.limits defaults). Uses limit(n+1).count() so the scan
    short-circuits instead of counting everything."""
    if max_data_points <= 0:
        return df
    n = df.limit(max_data_points + 1).count()
    if n > max_data_points:
        raise QueryLimitExceeded(
            f"query would return more than {max_data_points} data points"
        )
    return df
