"""KTable / GlobalKTable — changelog tables and stream–table joins.

Reference workloads (its own test suite):
  * KTable = changelog: latest value per key, restored after restart
    (tests/.../streams/KTableTest.java:80-109)
  * KStream ⋈ GlobalKTable inner/left with re-keying KeyValueMapper
    (tests/.../streams/GlobalKTableTest.java:94,130,167)

Spark-first: a KTable over a log is a latest-wins aggregation (the same
``max_by`` shape as offset-log compaction); a GlobalKTable join is a
broadcast stream–static join — Catalyst's broadcast hash join IS the
"global table replicated to every instance" semantics, executor-local with
no shuffle of the stream side, which is exactly what scales at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ktable_latest(
    log: DataFrame, key_cols: list[str], order_cols: list[str] | None = None
) -> DataFrame:
    """Materialize the KTable view: latest record per key in log order
    (KTableTest.java:80 — k writes to one key yield the last value).
    Tombstones (null value) delete the key, matching compacted-topic
    semantics (KopLogValidator.validateKey:446 requires keys for this)."""
    order_cols = order_cols or ["partition", "offset"]
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.filter(F.col("value").isNotNull())


def stream_global_table_join(
    stream: DataFrame,
    table: DataFrame,
    key_mapper: Column,
    table_key: str,
    how: str = "inner",
) -> DataFrame:
    """KStream ⋈ GlobalKTable (GlobalKTableTest.java:94 inner, :130 left):
    re-key the stream with ``key_mapper`` (the KeyValueMapper), broadcast
    the table, join. ``how`` ∈ {inner, left}."""
    keyed = stream.withColumn("__join_key", key_mapper)
    return keyed.join(
        F.broadcast(table), keyed["__join_key"] == table[table_key], how
    ).drop("__join_key")


def compact_topic(
    log: DataFrame,
    key_cols: list[str] | None = None,
    tombstone_horizon=None,
) -> DataFrame:
    """Kafka log compaction: per (partition, key) keep only the record at
    the highest offset; a null value (tombstone) deletes the key
    (KopLogValidator.validateKey:446 requires keys on compacted topics;
    compaction itself is the broker-side analog of the coordinator's
    latest-wins recovery).

    ``tombstone_horizon`` models ``delete.retention.ms``: tombstones
    YOUNGER than the horizon timestamp are retained in the compacted
    output so lagging read-from-compacted consumers still observe the
    deletion; tombstones at/older than the horizon are removed outright
    (Kafka's two-phase delete). ``None`` drops all tombstones — the
    fully-settled view.

    Unlike :func:`ktable_latest` (a global per-key view), compaction is
    per-partition — the same scope the broker compacts in. One shuffle on
    (partition, key); at rest this is the natural job to run under a
    partition-pruned predicate (compact one partition at a time).
    """
    key_cols = key_cols or ["key"]
    w = Window.partitionBy("partition", *key_cols).orderBy(F.col("offset").desc())
    latest = (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    keep = F.col("value").isNotNull()
    if tombstone_horizon is not None:
        keep = keep | (F.col("timestamp") >= F.lit(tombstone_horizon))
    return latest.filter(keep)


def table_aggregate(
    log: DataFrame,
    key_cols: list[str],
    group_key: list,
    aggs: list,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """KGroupedTable aggregation — ``KTable.groupBy(mapper).aggregate/
    reduce/count`` (the adder+SUBTRACTOR pattern of the Streams DSL):
    aggregate the CURRENT table contents, re-keyed by a selector, not the
    stream of updates.

    Kafka Streams must maintain this incrementally with both an adder and
    a subtractor because every upsert first RETRACTS the key's previous
    value from its old group; expressed Spark-first the retraction
    machinery vanishes — materialize the latest-wins table
    (:func:`ktable_latest`, which already folds tombstones) and run a
    plain aggregation over it. The streaming analog is an update-mode
    aggregation over the compacted state, which the engine maintains
    incrementally without user-written subtractors.

    Scale: the latest-wins pass is one key shuffle; the re-keyed
    aggregation partial-combines map-side. Two shuffles total — the same
    count as the two changelog topics (repartition + changelog) Kafka
    Streams materializes for this operation.
    """
    table = ktable_latest(log, key_cols, order_cols)
    return table.groupBy(*group_key).agg(*aggs)


def table_table_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """KTable ⋈ KTable: both sides are latest-wins views; a plain relational
    join once materialized. Catalyst picks broadcast vs sort-merge by size."""
    return left.join(right, on, how)


def ktable_fk_join(
    left: DataFrame,
    right: DataFrame,
    fk_col: str,
    right_key: str,
    payload: list[str] | None = None,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """KTable ⋈ KTable on a FOREIGN key (KIP-213, Kafka Streams 2.4+
    ``KTable#join(KTable, Function<V, KO>, ...)``) — the join the plain
    ``table_table_join`` cannot express: each left-table row names its join
    partner via a foreign-key *extracted from its value*, and the result
    stays keyed by the LEFT table's primary key.

    Kafka Streams implements this with two internal repartition topics —  a
    "subscription" stream re-keyed by FK shipped to the right table's
    partitions, and a "response" stream re-keyed back to the left PK —
    because its state stores are key-partitioned and a lookup must run
    where the data lives. Spark-first, that whole two-hop dataflow IS a
    shuffle hash/sort-merge join on ``left.fk == right.pk``: Catalyst
    co-partitions both sides on the FK in one exchange each, and when the
    right table is dimension-sized it broadcasts, collapsing KIP-213's
    machinery into a map-side hash join with zero shuffles of the big side.

    Null-FK semantics match KIP-213: a left row whose FK is null is never
    subscribed — dropped under ``how='inner'``, emitted with null right
    payload under ``how='left'``. ``how`` ∈ {inner, left}.

    ``payload`` selects the right-table columns to carry (default: all but
    the key). Pass ``broadcast_right=True`` to force the broadcast plan
    when statistics under-estimate the dimension side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    payload = payload or [c for c in right.columns if c != right_key]
    clash = sorted(set(payload) & set(left.columns))
    if clash:
        raise ValueError(
            "right payload columns collide with left table columns "
            f"{clash}: alias them on the right side first (the result is "
            "keyed and shaped by the LEFT table, so its names win)"
        )
    r = right.select(
        F.col(right_key).alias("__fk_pk"),
        *[F.col(c) for c in payload],
        F.lit(True).alias("__fk_matched"),
    )
    if broadcast_right:
        r = F.broadcast(r)
    joined = left.join(r, left[fk_col] == r["__fk_pk"], "left")
    if how == "inner":
        # explicit marker, not payload nullability (a matched right row may
        # legitimately carry null payload fields)
        joined = joined.filter(F.col("__fk_matched"))
    return joined.drop("__fk_pk", "__fk_matched")


def stream_table_join(
    stream: DataFrame,
    changelog: DataFrame,
    on: list[str],
    stream_ts: str = "ts",
    changelog_ts: str = "ts",
    payload: list[str] | None = None,
    how: str = "inner",
    tiebreak: str | None = None,
) -> DataFrame:
    """KStream ⋈ KTable — the non-global, co-partitioned stream–table join
    (Kafka Streams' other table join; the reference proves the GlobalKTable
    variant in GlobalKTableTest.java and the KTable changelog semantics in
    KTableTest.java:80). Each stream record sees the table's value AS OF its
    own event time: the changelog's latest update at or before the record —
    versioned-KTable temporal semantics, not the latest-overall value (which
    would be a plain join against ``ktable_latest`` and racy on replay).

    Spark-first: delegates to the as-of union+window plan — ONE shuffle on
    the join key, which is exactly Kafka Streams' co-partitioning
    requirement for this join; no range-join or per-key cross product.
    ``how``: 'inner' drops stream records with no table value yet (Kafka
    Streams inner stream-table join), 'left' keeps them with nulls. The
    inner filter uses an explicit match marker carried through the as-of
    window — NOT payload nullability, which would misdrop a genuinely
    matched changelog row whose payload fields are legitimately null.
    """
    from .asof import as_of_join

    joined = as_of_join(
        stream,
        changelog,
        on,
        stream_ts,
        changelog_ts,
        payload,
        tiebreak=tiebreak,
        match_col="__matched",
    )
    if how == "inner":
        joined = joined.filter(F.col("__matched"))
    return joined.drop("__matched")
