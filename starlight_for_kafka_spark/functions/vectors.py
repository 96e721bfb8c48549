"""Vector functions over array<float> embedding columns.

All JVM-side (F.zip_with / F.aggregate — whole-stage-codegen'd higher-order
functions), so similarity scans stay off the Python path entirely. At 100 TB
the brute-force scan is embarrassingly parallel: no shuffle, one pass,
predicate-prunable when combined with LSH bucketing (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM higher-order fns)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
