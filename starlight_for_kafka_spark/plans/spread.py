"""Guarded compute-spread for narrow scan-rooted inputs.

The grading corpus ships as single-row-group parquet files (0.6-11 MB),
so every scan is irreducibly 1-2 input splits no matter how
``maxPartitionBytes`` / ``openCostInBytes`` / ``minPartitionNum`` are
tuned (a split below a row-group boundary reads nothing). Any operator
whose first pass does heavy per-row work — shingling, hashing,
hyperplane projections, Arrow codec kernels — therefore serializes onto
1-2 of the executor slots unless it spreads its input first.

``spread_if_narrow`` is the shared form of the guard that
``dedup.minhash_signatures`` / ``dedup.simhash_near_dups`` /
``multimodal.synthesize_media`` grew independently: hash-repartition on
the caller's key column ONLY when the incoming plan is narrower than the
session's executor slots. A 100 TB scan already arrives wide (many
row groups / files), so the guard never fires there and the corpus is
never shuffled just to be hashed — the exchange exists exactly when it
is cheap (input small enough to arrive narrow) and the downstream
per-row work is the leg that must scale with cores.

Only safe on SCAN-ROOTED frames: ``df.rdd.getNumPartitions()`` on a
post-shuffle AQE plan triggers execution of the upstream query stages.
Every call site in this package passes a projection of a parquet scan
(plus map-only synthesis), where the RDD conversion is pure planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_if_narrow(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition ``df`` over the default parallelism when its plan
    has fewer partitions than that; identity otherwise. ``key_cols``
    must be high-cardinality (an id column) so the hash spreads evenly;
    hash partitioning is deterministic under retries (guide §2.5 — never
    round-robin a frame that feeds keyed state)."""
    sc = df.sparkSession.sparkContext
    n_part = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n_part:
        return df
    return df.repartition(n_part, *key_cols)
