"""Consumer-group offset semantics tests, mirroring
GroupMetadataManagerTest (latest-wins recovery) and offset expiry."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from starlight_for_kafka_spark.operators import groups


def test_committed_offsets_latest_wins(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("g1", "t", 0, 5, "", t0),
        ("g1", "t", 0, 9, "", t0 + datetime.timedelta(seconds=10)),  # winner
        ("g1", "t", 0, 7, "", t0 + datetime.timedelta(seconds=5)),
        ("g1", "t", 1, 3, "", t0),
        ("g2", "t", 0, 1, "", t0),
    ]
    commits = spark.createDataFrame(
        rows, "group string, topic string, partition int, offset long, metadata string, commit_ts timestamp"
    )
    out = {
        (r.group, r.topic, r.partition): r.offset
        for r in groups.committed_offsets(commits).collect()
    }
    assert out == {("g1", "t", 0): 9, ("g1", "t", 1): 3, ("g2", "t", 0): 1}


def test_committed_offsets_tie_broken_by_offset(spark):
    t0 = datetime.datetime(2024, 1, 1)
    commits = spark.createDataFrame(
        [("g", "t", 0, 5, "", t0), ("g", "t", 0, 8, "", t0)],
        "group string, topic string, partition int, offset long, metadata string, commit_ts timestamp",
    )
    assert groups.committed_offsets(commits).first().offset == 8


def test_expiry_then_compaction(spark):
    t0 = datetime.datetime(2024, 1, 1)
    commits = spark.createDataFrame(
        [("g", "t", 0, 5, "", t0), ("g", "t", 0, 9, "", t0 + datetime.timedelta(days=8))],
        "group string, topic string, partition int, offset long, metadata string, commit_ts timestamp",
    )
    fresh = groups.expire_offsets(commits, t0 + datetime.timedelta(days=1))
    assert groups.committed_offsets(fresh).count() == 1
    assert groups.committed_offsets(fresh).first().offset == 9


def test_group_introspection_on_events(events):
    commits = groups.derive_commits_from_events(events)
    listed = {r.group for r in groups.list_groups(commits).collect()}
    assert listed == {"g0", "g1", "g2", "g3"}
    desc = {r.group: r for r in groups.describe_groups(commits).collect()}
    assert all(d.n_topics == 1 for d in desc.values())
    remaining = groups.list_groups(groups.delete_group(commits, "g0")).count()
    assert remaining == 3


def test_consumer_lag(events, log):
    commits = groups.derive_commits_from_events(events)
    lag = groups.consumer_lag(commits, log.latest_offsets())
    assert lag.filter(F.col("lag").isNull()).count() == 0
    # committed offsets are event_ids (can exceed partition length); lag is
    # just the arithmetic — check one row against hand computation
    r = lag.filter((F.col("group") == "g1") & (F.col("partition") == 1)).first()
    assert r.lag == r.log_end_offset - r.offset - 1
