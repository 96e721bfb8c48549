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


def audio_chunks(
    media: DataFrame, chunk_ms: int = 5000, overlap_ms: int = 1000
) -> DataFrame:
    """Fixed-window audio segmentation with overlap (the ASR/audio-LM
    preprocessing sibling of text chunk_documents): chunk i covers
    [i*stride, i*stride + chunk_ms), stride = chunk_ms - overlap_ms; the
    final chunk is clipped to the clip's duration. Pure plan arithmetic —
    sequence + explode over metadata; the payload column rides along
    untouched and decode (not bundled here) happens downstream on the
    exploded rows, so a duration filter prunes payload I/O entirely.
    """
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap_ms must be smaller than chunk_ms")
    stride = chunk_ms - overlap_ms
    audio = media.filter(F.col("kind") == "audio")
    dur = F.col("meta.duration_ms")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((dur - F.lit(overlap_ms)) / F.lit(stride)).cast("int"),
    )
    start = F.col("chunk_id").cast("long") * stride
    return (
        audio.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .withColumn("chunk_start_ms", start)
        .withColumn("chunk_end_ms", F.least(start + chunk_ms, dur.cast("long")))
        .select(
            "media_id", "chunk_id", "chunk_start_ms", "chunk_end_ms", "payload"
        )
    )


def caption_pairs(
    media: DataFrame,
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_caption_tokens: int = 32,
    min_caption_tokens: int = 3,
) -> DataFrame:
    """(image, caption) pair construction for contrastive/captioning
    training: join image media rows to their source documents, truncate the
    caption to a token budget, and gate on a minimum length (the CLIP-style
    quality filter that drops unusable pairs). One key-equi join — both
    sides partition on the id, Catalyst broadcasts the smaller; the payload
    column never shuffles more than the join demands.

    Emits (media_id, caption, n_caption_tokens, payload_bytes, width,
    height) — the feed for a downstream encode kernel.
    """
    images = media.filter(F.col("kind") == "image")
    words = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    docs = documents.select(
        F.col(id_col).alias("media_id"),
        F.concat_ws(" ", F.slice(words, 1, max_caption_tokens)).alias("caption"),
        F.least(F.size(words), F.lit(max_caption_tokens)).alias(
            "n_caption_tokens"
        ),
    )
    return (
        images.join(docs, "media_id")
        .filter(F.col("n_caption_tokens") >= min_caption_tokens)
        .select(
            "media_id",
            "caption",
            "n_caption_tokens",
            F.octet_length("payload").alias("payload_bytes"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
        )
    )


def pack_multimodal(
    media: DataFrame,
    documents: DataFrame,
    capacity: int = 8192,
    image_tokens: int = 576,
    audio_ms_per_token: int = 80,
    video_ms_per_token: int = 40,
    n_shards: int = 32,
) -> DataFrame:
    """Multimodal sequence packing: interleave every document (text tokens)
    with every media item (fixed vision-token cost per image — the ViT
    patch-grid constant — and duration-proportional costs for audio/video)
    into one global training stream, then chunk it every ``capacity``
    tokens. The multimodal twin of sampling.pack_sequences, and it reuses
    that operator's sharded parallel prefix sum verbatim — the item stream
    is (item_id % n_shards, item_id)-ordered, so the running offset never
    serializes through one task.

    Item ids interleave deterministically: text item = 2*doc_id, media
    item = 2*media_id + 1 — a doc's caption-ish text and its media land
    adjacent in the stream, the packing boundary semantics a curriculum
    loader relies on. Token costs are plan arithmetic; no decode happens
    here.
    """
    from starlight_for_kafka_spark.operators.sampling import pack_sequences

    words = F.split(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " ")
    text_items = documents.select(
        (F.col("doc_id") * 2).alias("item_id"),
        F.lit("text").alias("modality"),
        F.size(words).cast("long").alias("cost"),
    )
    media_cost = (
        F.when(F.col("kind") == "image", F.lit(image_tokens).cast("long"))
        .when(
            F.col("kind") == "audio",
            # integer DIV, not float /: 80 is not a power of two, so float
            # division could flip a truncation boundary
            F.expr(f"CAST(meta.duration_ms AS LONG) DIV {audio_ms_per_token}"),
        )
        .otherwise(
            F.expr(f"CAST(meta.duration_ms AS LONG) DIV {video_ms_per_token}")
        )
    )
    media_items = media.select(
        (F.col("media_id") * 2 + 1).alias("item_id"),
        F.col("kind").alias("modality"),
        media_cost.alias("cost"),
    )
    items = text_items.unionByName(media_items)
    return pack_sequences(
        items, "cost", capacity, order_col="item_id", n_shards=n_shards
    ).select(
        "item_id", "modality", "cost", "start_tok", "pack_id", "n_packs_spanned"
    )
