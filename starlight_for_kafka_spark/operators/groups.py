"""Consumer-group semantics as tables.

Reference: the group coordinator stores commits in a compacted keyed log and
recovers state latest-wins (kafka-impl/.../coordinator/group/
GroupMetadataManager.java:415-429 storeOffsets, :718 doLoadGroupsAndOffsets;
key/value wire schemas GroupMetadataConstants.java:64-147; expiry
GroupMetadata.removeExpiredOffsets:624).

Spark-first: the commit log is an append-only DataFrame
(group, topic, partition, offset, metadata, commit_ts); every coordinator
read becomes a latest-wins aggregation — a single shuffle on the group key,
map-side combinable, no state machine required. The Structured Streaming
checkpoint plays the JOIN/SYNC/HEARTBEAT role (the engine, not the client,
owns assignment), so those APIs reduce to introspection queries here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COMMIT_COLUMNS = ["group", "topic", "partition", "offset", "metadata", "commit_ts"]


def derive_commits_from_events(
    events: DataFrame, n_groups: int = 4, n_partitions: int = 8
) -> DataFrame:
    """Deterministic synthetic offset-commit log from the events table
    (fixture F5): each event is a commit by group g{user_id % n_groups}
    for partition user_id % n_partitions at offset event_id."""
    return events.select(
        F.concat(F.lit("g"), (F.col("user_id") % n_groups).cast("string")).alias("group"),
        F.lit("events").alias("topic"),
        (F.col("user_id") % n_partitions).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("event_type").alias("metadata"),
        F.col("ts").alias("commit_ts"),
    )


def committed_offsets(commits: DataFrame) -> DataFrame:
    """OFFSET_FETCH / group recovery: latest commit per (group, topic,
    partition), ties broken by offset (reference replays the compacted log
    in order — last write wins, GroupMetadataManager.java:718).

    One shuffle on the composite key; at scale this is the same plan as the
    reference's recovery scan, but parallel over partitions.
    """
    w = Window.partitionBy("group", "topic", "partition").orderBy(
        F.col("commit_ts").desc(), F.col("offset").desc()
    )
    return (
        commits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .select(*COMMIT_COLUMNS)
    )


def offset_fetch(commits: DataFrame, group: str) -> DataFrame:
    """OFFSET_FETCH for one group (KafkaRequestHandler.java:1130,
    GroupCoordinator.handleFetchOffsets:837)."""
    return committed_offsets(commits.filter(F.col("group") == group))


def expire_offsets(commits: DataFrame, min_commit_ts) -> DataFrame:
    """Offset retention sweep (GroupMetadata.removeExpiredOffsets:624):
    drop commits older than the retention horizon before compaction."""
    return commits.filter(F.col("commit_ts") >= F.lit(min_commit_ts))


def list_groups(commits: DataFrame) -> DataFrame:
    """LIST_GROUPS (KafkaRequestHandler.java:2125)."""
    return commits.select("group").distinct()


def describe_groups(commits: DataFrame) -> DataFrame:
    """DESCRIBE_GROUPS-style introspection: per group, topics touched,
    partitions owned, last activity (GroupCoordinator.handleDescribeGroup:596)."""
    return commits.groupBy("group").agg(
        F.countDistinct("topic").alias("n_topics"),
        F.countDistinct("topic", "partition").alias("n_partitions"),
        F.max("commit_ts").alias("last_commit_ts"),
        F.count("*").alias("n_commits"),
    )


def delete_group(commits: DataFrame, group: str) -> DataFrame:
    """DELETE_GROUPS (KafkaRequestHandler.java:2161): tombstone the group —
    on a log table this is a filter; on Delta it would be a DELETE."""
    return commits.filter(F.col("group") != group)


def consumer_lag(commits: DataFrame, log_end_offsets: DataFrame) -> DataFrame:
    """Lag = log-end-offset − committed offset per (group, topic, partition).
    The ops query behind every Kafka lag exporter; broadcast the (small)
    end-offsets side."""
    committed = committed_offsets(commits)
    ends = log_end_offsets.select(
        "partition", F.col("offset").alias("log_end_offset")
    )
    return (
        committed.join(F.broadcast(ends), "partition", "left")
        .withColumn("lag", F.col("log_end_offset") - F.col("offset") - 1)
        .select("group", "topic", "partition", "offset", "log_end_offset", "lag")
    )
