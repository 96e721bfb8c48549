"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs —
the same model the log table uses for Kafka values. Decode/resize/feature
steps run as Arrow-batched Pandas UDFs over ``mapInPandas``; the actual
codec libraries (Pillow, ffmpeg, torchaudio) are NOT in this container, so
the decode kernels are STUBBED with a deterministic fake, clearly marked —
the Spark-side contract (schemas, batching, partition sizing) is real and
tested.

Scale notes: media rows are large (MBs); the operators repartition by an
explicit ``target_rows_per_batch`` so a 100 TB corpus maps to bounded-memory
Arrow batches, and metadata-only predicates (width/duration filters) are
evaluated BEFORE decode so parquet column pruning skips payload bytes
entirely for filtered rows.
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
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic media table from documents (payload = text
    bytes standing in for encoded media; metadata derived from doc stats).
    Lets the multimodal plumbing be tested without codec libs."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col(id_col) % 3 + 1).cast("int")).alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            (F.length(text_col) % 1024 + 32).cast("int").alias("width"),
            (F.length(text_col) % 768 + 32).cast("int").alias("height"),
            (F.length(text_col) * 10).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = "media_id long, kind string, features array<double>, n_bytes long"


def extract_features(
    media: DataFrame, target_rows_per_batch: int = 256, decode=None
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The iterator form processes one bounded Arrow batch at a time, so
    executor memory is ~batch_size × row_size regardless of corpus size.

    ``decode`` swaps in a real kernel (Pillow/ffmpeg — not in this
    container); the default is a deterministic STUB (8 'pixels' from byte
    statistics; a real one would ``raise NotImplementedError`` without the
    codec libs). The kernel is defined INSIDE this function on purpose:
    cloudpickle then serializes it by value, so executor Python workers
    never need this package importable on their own sys.path — the
    closure-shipping rule for every Pandas-UDF operator here.
    """

    def _decode_stub(payload: bytes) -> list[float]:
        if payload is None:
            return [0.0] * 8
        n = len(payload)
        return [float(payload[i * n // 8] if n else 0) for i in range(8)]

    decode_fn = decode or _decode_stub

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(decode_fn),
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                }
            )

    conf = media.sparkSession.conf
    conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(target_rows_per_batch))
    return media.mapInPandas(op, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through, rewrites metadata. Filter is
    metadata-only → evaluated before any payload read (column pruning)."""
    images = media.filter(F.col("kind") == "image")
    return images.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index —
    pure plan arithmetic (sequence + explode), decode deferred to
    extract_features on the exploded rows."""
    videos = media.filter(F.col("kind") == "video")
    return videos.withColumn(
        "frame_ms",
        F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))),
    ).select("media_id", "frame_ms", "payload", "meta")
