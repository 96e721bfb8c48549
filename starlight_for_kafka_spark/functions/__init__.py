from starlight_for_kafka_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)
from starlight_for_kafka_spark.functions.hashing import (
    md5_hash64,
    shingles,
    stable_hash64,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "md5_hash64",
    "shingles",
    "stable_hash64",
    "word_shingles",
]
