"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched mapInPandas
stages. The actual codecs (PIL/ffmpeg/...) are NOT in this container, so the
decode step is STUBBED: ``decoder='real'`` raises NotImplementedError at the
call site, while ``decoder='fake'`` is a deterministic byte-statistics fake
that keeps the Spark-side plumbing — schema, batching, partition parallelism,
UDF signatures — fully real and testable.

Scale notes: media bytes dominate row size, so operators select the binary
column as late as possible (column pruning keeps metadata-only plans off the
blobs) and mapInPandas streams Arrow batches without materializing a
partition at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("media", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def docs_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Demo adapter: wrap the documents table's text bytes as fake media
    blobs so the plumbing has real (deterministic) binary data to chew on."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        out = []
        for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["media"]):
            arr = np.frombuffer(blob, dtype=np.uint8) if blob is not None else np.array([], np.uint8)
            n = int(arr.size)
            if n:
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts[counts > 0] / n
                ent = float(-(p * np.log2(p)).sum())
                mean = float(arr.mean())
            else:
                ent, mean = 0.0, 0.0
            out.append((int(mid), kind, n, mean, ent))
        yield pd.DataFrame(out, columns=["media_id", "kind", "n_bytes", "byte_mean", "byte_entropy"])


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract each blob via Arrow-batched mapInPandas.

    decoder='real' requires the codec libraries (PIL / soundfile / ffmpeg),
    which this environment does not ship — stubbed."""
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding needs codec libraries not present in this "
            "container; use decoder='fake' for the deterministic byte-stats path"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")
    cols = media.select("media_id", "kind", "media")
    return cols.mapInPandas(_fake_features, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — stub (needs PIL). The plumbing contract: same schema
    out, meta.width/height updated, media re-encoded."""
    raise NotImplementedError("image resize needs PIL; not shipped in this container")


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling — stub (needs ffmpeg). Contract: explodes each
    video row into frame rows (media_id, frame_ts_ms, frame binary)."""
    raise NotImplementedError("frame sampling needs ffmpeg; not shipped in this container")
