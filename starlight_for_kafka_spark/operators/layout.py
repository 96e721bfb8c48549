"""Data-layout operators: multi-dimensional clustering for scan pruning.

The reference's only layout lever is per-partition offset order (segment
files, `storage/PartitionLog.java`), which prunes exactly one dimension —
the offset. A 100 TB lakehouse needs pruning on MORE than one column
(e.g. time AND key, or partition AND producer id): Z-ordering (Morton
1966; the technique behind Delta's OPTIMIZE ZORDER BY and the clustering
in most lakehouse engines) interleaves the bits of several rank-normalized
columns into one sort key, so sorting by that single key co-locates rows
that are close in EVERY dimension — and parquet min/max footer stats then
prune files for predicates on any of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append a ``zkey`` column: the Morton (Z-order) interleave of the
    given columns, each min-max normalized to ``bits`` bits.

    Normalization is (v - min) * (2^bits - 1) / (max - min), floored —
    min/max are ONE partial-combining aggregation broadcast back, so the
    whole keying is a map-only second scan (Delta's OPTIMIZE ZORDER uses
    range-partition ids instead; min-max keeps the key a pure, exactly
    reproducible function of the value, which is what lets an external
    engine — or the DuckDB oracle — compute the identical key). Skewed
    columns get skewed bit-buckets under min-max; pre-transform (log,
    clamp) or pre-rank such columns if their spread matters.

    The interleave is integer arithmetic only (shift/and/sum) — exact in
    any engine. ``len(cols) * bits`` must stay ≤ 63.

    A constant column (max == min) normalizes to 0 and contributes
    nothing; a null value yields a null zkey (sort it wherever your write
    path sorts nulls).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed int64")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__mx_{i}") for i, c in enumerate(cols)],
    )
    scale = float((1 << bits) - 1)
    out = df.crossJoin(F.broadcast(stats))
    norms = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"__mn_{i}"), F.col(f"__mx_{i}")
        norms.append(
            F.when(mx == mn, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    (F.col(c).cast("double") - mn) * F.lit(scale) / (mx - mn)
                ).cast("long")
            )
            .alias(f"__n_{i}")
        )
    out = out.select("*", *norms)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i in range(n):
            bit = F.shiftright(F.col(f"__n_{i}"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    drop = [f"__mn_{i}" for i in range(n)] + [f"__mx_{i}" for i in range(n)] + [
        f"__n_{i}" for i in range(n)
    ]
    return out.withColumn("zkey", z).drop(*drop)


def cluster_by_zorder(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition and sort the DataFrame by its Z-order key — the
    write-side half of OPTIMIZE ZORDER: each output partition (→ parquet
    file) covers a compact Morton-curve segment, so every clustered
    column's min/max footer range is narrow and predicates on ANY of the
    clustered columns prune files.

    ``repartitionByRange`` samples to pick bounds (one extra pass);
    ``n_partitions`` should target the file size your scan wants
    (spark.sql.files.maxPartitionBytes). The zkey column is kept so the
    writer can also sort data WITHIN files for page-level stats.
    """
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(n_partitions, "zkey").sortWithinPartitions(
        "zkey"
    )
