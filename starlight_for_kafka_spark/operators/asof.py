"""As-of join: for each left row, the latest right row at or before it.

Not a reference operator (the broker's only time lookup is
LIST_OFFSETS-by-timestamp, KafkaRequestHandler.java:1348, which is a
degenerate as-of per partition) — but the natural event-time join over a
log table: attribution (purchase → latest prior view), state-at-time
lookups, offset-at-time resolution across streams.

Spark-first implementation: UNION the two sides with a tag, one window per
key ordered by (ts, tag, tiebreak), and carry the right payload forward
with last(ignorenulls). This is ONE shuffle on the key and a linear pass —
no range-condition join, whose inequality predicate would force a
broadcast-nested-loop or a per-key cross product. At 100 TB the union
approach keeps as-of cost identical to a groupBy over the combined stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
    match_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row joined to the latest ``right``
    row with ``right_ts <= left_ts`` per key (inclusive, matching DuckDB's
    ASOF JOIN ``>=`` semantics). Rows with no prior match keep nulls.

    ``right_payload`` names the right columns to carry (default: all
    non-key, non-ts columns). ``tiebreak`` orders same-timestamp rows
    deterministically when provided. ``match_col``, when set, adds a
    boolean column that is true iff a right row matched — the ONLY
    reliable match signal, since a matched right row may legitimately
    carry all-null payload fields.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    if match_col is not None:
        right = right.withColumn("__m", F.lit(True))
        right_payload = list(right_payload) + ["__m"]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns collide with left columns: {sorted(overlap)}; "
            "rename the right side first"
        )
    # the payload rides as ONE struct, carried atomically: per-column
    # last(ignorenulls) would let a right row's NULL field resurrect the
    # PREVIOUS version's value for that column — mixing table versions a
    # changelog never contained (and hiding tombstoned values). The struct
    # itself is non-null for every right row, so ignorenulls skips only
    # the interleaved left rows.
    r_struct = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.struct(*right_payload).alias("__rp"),
    )
    rp_type = r_struct.schema["__rp"].dataType
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__tag", F.lit(1))
        .withColumn("__rp", F.lit(None).cast(rp_type))
    )
    r_tagged = r_struct.withColumn("__tag", F.lit(0))
    left_cols = [c for c in left.columns]
    combined = l_tagged.select(
        *on, "__ts", "__tag", *[c for c in left_cols if c not in on], "__rp"
    ).unionByName(
        r_tagged.select(
            *on,
            "__ts",
            "__tag",
            *[F.lit(None).cast(l_tagged.schema[c].dataType).alias(c)
              for c in left_cols if c not in on],
            "__rp",
        )
    )
    order = [F.col("__ts"), F.col("__tag")]
    if tiebreak:
        # the payload rides inside __rp now; a right-side tiebreak column
        # is ordered via its struct field (left rows carry a null struct,
        # but their relative order is already fixed by __tag)
        order.append(
            F.col(f"__rp.{tiebreak}") if tiebreak in right_payload else F.col(tiebreak)
        )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.select(
        *on,
        "__tag",
        *[c for c in left_cols if c not in on],
        F.last("__rp", ignorenulls=True).over(w).alias("__rp"),
    )
    out = (
        carried.filter(F.col("__tag") == 1)
        .select(
            "*", *[F.col(f"__rp.{c}").alias(c) for c in right_payload]
        )
        .drop("__tag", "__rp")
    )
    if match_col is not None:
        out = out.withColumn(
            match_col, F.coalesce(F.col("__m"), F.lit(False))
        ).drop("__m")
    return out


def as_of_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward as-of: every ``left`` row joined to the EARLIEST ``right``
    row with ``right_ts >= left_ts`` per key — time-to-next-event queries
    (next purchase after a view, next error after a deploy).

    Same one-shuffle union+window plan as the backward join, reflected:
    the window runs unbounded-following and carries the right payload
    BACKWARD with first(ignorenulls). No range join, no per-key cross
    product — cost identical to the backward variant at any scale.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns collide with left columns: {sorted(overlap)}; "
            "rename the right side first"
        )
    # same atomic-struct carry as the backward join (see comment there)
    r_struct = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.struct(*right_payload).alias("__rp"),
    )
    rp_type = r_struct.schema["__rp"].dataType
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__tag", F.lit(1))
        .withColumn("__rp", F.lit(None).cast(rp_type))
    )
    r_tagged = r_struct.withColumn("__tag", F.lit(2))
    left_cols = [c for c in left.columns]
    combined = l_tagged.select(
        *on, "__ts", "__tag", *[c for c in left_cols if c not in on], "__rp"
    ).unionByName(
        r_tagged.select(
            *on,
            "__ts",
            "__tag",
            *[F.lit(None).cast(l_tagged.schema[c].dataType).alias(c)
              for c in left_cols if c not in on],
            "__rp",
        )
    )
    # ascending (ts, tag): at equal ts the left row (tag 1) sorts before the
    # right row (tag 2), so first() over the FOLLOWING frame includes the
    # same-timestamp right row — inclusive >= semantics
    order = [F.col("__ts"), F.col("__tag")]
    if tiebreak:
        order.append(
            F.col(f"__rp.{tiebreak}") if tiebreak in right_payload else F.col(tiebreak)
        )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = combined.select(
        *on,
        "__tag",
        *[c for c in left_cols if c not in on],
        F.first("__rp", ignorenulls=True).over(w).alias("__rp"),
    )
    return (
        carried.filter(F.col("__tag") == 1)
        .select("*", *[F.col(f"__rp.{c}").alias(c) for c in right_payload])
        .drop("__tag", "__rp")
    )
