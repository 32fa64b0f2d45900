"""Streaming document-feed operators — the ingest-side of the training-data
pipeline (batch counterparts live in opentsdb_spark.pipeline).

A crawl/firehose document stream wants dedup + quality gating BEFORE the
corpus lands on the lake, so obviously-junk and duplicate documents never
consume storage. Both operators below are Structured-Streaming-safe: pure
narrow expressions plus (for dedup) watermark-bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str | None = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact duplicate documents as they stream in.

    The dedup key is sha2(content) — 32 bytes of state per distinct document
    instead of the body. With an event-time column the state is bounded by
    the watermark horizon (``dropDuplicatesWithinWatermark``): a duplicate
    arriving later than the watermark is NOT caught here — unbounded exact
    dedup is the batch path's job (pipeline.dedup.exact_dedup over the
    lake), this stage only keeps the hot window clean. Without an event
    time the state grows with distinct documents (use only for bounded
    replays)."""
    keyed = docs.withColumn("__k", F.sha2(F.col(content_col).cast("binary"), 256))
    if event_time_col is not None:
        keyed = keyed.withWatermark(event_time_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["__k"]).drop("__k")
    return keyed.dropDuplicates(["__k"]).drop("__k")


def streaming_quality_gate(
    docs: DataFrame,
    min_words: int = 5,
    max_symbol_ratio: float = 0.5,
    content_col: str = "text",
) -> DataFrame:
    """Stateless quality gate: word-count floor + symbol-ratio ceiling +
    boilerplate marker rejection (pipeline.text.boilerplate_flags signals,
    streaming-safe because it is a pure filter)."""
    from opentsdb_spark.pipeline.text import BOILERPLATE_MARKERS

    text = F.col(content_col)
    n = F.length(text).cast("double")
    symbol_ratio = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")) / F.greatest(
        n, F.lit(1.0)
    )
    return docs.where(
        (F.size(F.split(F.trim(text), r"\s+")) >= min_words)
        & (symbol_ratio <= max_symbol_ratio)
        & (F.regexp_count(text, F.lit(BOILERPLATE_MARKERS)) == 0)
    )
