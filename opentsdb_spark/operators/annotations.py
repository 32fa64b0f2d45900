"""Annotations — time-bounded notes on a series (TSUID) or global.

Reference: src/meta/Annotation.java (fields tsuid/start/end/description/
notes/custom; global when tsuid is empty), served by /api/annotation
(src/tsd/AnnotationRpc.java). The reference's getGlobalAnnotations /
getAnnotations scan the data table over a time range; here annotations are
a small DataFrame filtered natively and merged onto query output at the
serialization layer (matching how HttpJsonSerializer attaches them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANNOTATION_SCHEMA = T.StructType(
    [
        T.StructField("tsuid", T.StringType(), True),  # null => global
        T.StructField("start_time", T.TimestampType(), False),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
        T.StructField("custom", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def annotations_in_range(
    annotations: DataFrame,
    start_ms: int,
    end_ms: int,
    tsuids: tuple[str, ...] = (),
    include_global: bool = True,
) -> DataFrame:
    """Annotations overlapping [start, end] for the given series (and/or
    global ones) — the /api/annotation query path."""
    overlap = (F.unix_millis("start_time") <= end_ms) & (
        F.coalesce(F.unix_millis("end_time"), F.unix_millis("start_time")) >= start_ms
    )
    df = annotations.where(overlap)
    preds = []
    if tsuids:
        preds.append(F.col("tsuid").isin(list(tsuids)))
    if include_global:
        preds.append(F.col("tsuid").isNull())
    if preds:
        p = preds[0]
        for q in preds[1:]:
            p = p | q
        df = df.where(p)
    return df
