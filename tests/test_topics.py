"""Topic/config DDL tests: the CREATE/DELETE_TOPICS, CREATE_PARTITIONS,
DESCRIBE/ALTER_CONFIGS surface on the Spark catalog, plus produce/fetch
through a catalog topic end-to-end."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from starlight_for_kafka_spark.sources import topics


@pytest.fixture()
def topic(spark, tmp_path):
    name = f"t_{uuid.uuid4().hex[:8]}"
    topics.create_topic(
        spark, name, num_partitions=4,
        configs={"retention.ms": "86400000"},
        location=str(tmp_path / name),
    )
    yield name
    topics.delete_topic(spark, name)


def test_create_describe_alter_topic(spark, topic):
    assert topic in topics.list_topics(spark)
    cfg = topics.describe_configs(spark, topic)
    assert cfg["kafka.num.partitions"] == "4"
    assert cfg["retention.ms"] == "86400000"

    topics.alter_configs(spark, topic, {"retention.ms": "3600000", "cleanup.policy": "compact"})
    cfg = topics.describe_configs(spark, topic)
    assert cfg["retention.ms"] == "3600000"
    assert cfg["cleanup.policy"] == "compact"


def test_create_partitions_grow_only(spark, topic):
    topics.create_partitions(spark, topic, 8)
    assert topics.describe_configs(spark, topic)["kafka.num.partitions"] == "8"
    with pytest.raises(ValueError, match="only grow"):
        topics.create_partitions(spark, topic, 2)


def test_produce_fetch_through_catalog_topic(spark, topic, log):
    topics.append_records(spark, topic, log.df)
    got = topics.read_topic(spark, topic)
    assert got.count() == log.df.count()
    # partition pruning works through the catalog: one partition only
    one = got.filter(F.col("partition") == 3)
    assert one.count() == log.df.filter(F.col("partition") == 3).count()
    # offsets survive the round trip dense and ordered
    mx = one.agg(F.max("offset").alias("m"), F.count("*").alias("n")).first()
    assert mx.m == mx.n - 1


def test_delete_topic_removes_from_catalog(spark, tmp_path):
    name = f"t_{uuid.uuid4().hex[:8]}"
    topics.create_topic(spark, name, location=str(tmp_path / name))
    assert name in topics.list_topics(spark)
    topics.delete_topic(spark, name)
    assert name not in topics.list_topics(spark)


def test_describe_cluster(spark):
    from starlight_for_kafka_spark.sources.topics import describe_cluster

    row = describe_cluster(spark).first()
    assert row.engine == "spark" and row.is_controller
    assert row.parallelism >= 1 and row.cluster_id


def test_normalize_kafka_records_matches_log_schema(spark):
    """The Kafka-source column mapping must yield a LogTable-compatible
    frame (same shape the reference serves over the wire), with null
    headers normalized to an empty array."""
    import datetime

    from starlight_for_kafka_spark.sources import LogTable
    from starlight_for_kafka_spark.sources.kafka import normalize_kafka_records

    raw = spark.createDataFrame(
        [
            (
                b"k1", b"v1", "t", 0, 7,
                datetime.datetime(2024, 1, 1), 0,
                [("h1", b"x")],
            ),
            (b"k2", None, "t", 1, 9, datetime.datetime(2024, 1, 2), 0, None),
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int, "
        "headers array<struct<key:string,value:binary>>",
    )
    log = LogTable(normalize_kafka_records(raw))  # schema gate
    rows = {r.offset: r for r in log.df.collect()}
    assert rows[9].value is None and rows[9].headers == []
    assert [h.key for h in rows[7].headers] == ["h1"]
    # operators run unchanged on the normalized frame
    assert {r.partition: r.offset for r in log.latest_offsets().collect()} == {0: 8, 1: 10}


def test_read_topics_and_subscribe_pattern(spark, log, tmp_path):
    from starlight_for_kafka_spark.sources import topics as t

    for name in ("sub_orders", "sub_clicks", "other_log"):
        t.create_topic(spark, name, num_partitions=4, location=str(tmp_path / name))
        t.append_records(spark, name, log.df.limit(10))
    try:
        multi = t.read_topics(spark, ["sub_orders", "sub_clicks"])
        assert multi.count() == 20
        assert set(r.topic for r in multi.select("topic").distinct().collect()) == {
            "sub_orders", "sub_clicks"
        }
        # regex subscription resolves against the catalog
        pat = t.subscribe_pattern(spark, "sub_.*")
        assert pat.count() == 20
        # a topic predicate collapses the union: only one scan survives
        from starlight_for_kafka_spark.plans import plan_string

        one = multi.filter(F.col("topic") == "sub_orders")
        pruned = plan_string(one)
        assert "sub_orders" in pruned and "sub_clicks" not in pruned
        import pytest as _pytest

        with _pytest.raises(ValueError):
            t.subscribe_pattern(spark, "nomatch_.*")
    finally:
        for name in ("sub_orders", "sub_clicks", "other_log"):
            t.delete_topic(spark, name)


def test_api_versions_gating_matches_reference_dispatch(spark):
    """The served-API set mirrors KafkaCommandDecoder.java:282-385 (33
    keys), unserved keys fall to UNSUPPORTED_VERSION (the default ->
    handleError arm), and an API_VERSIONS request outside 0..3 is gated
    even though the key itself is served."""
    from starlight_for_kafka_spark.sources.topics import (
        API_VERSIONS_RANGE,
        HANDLED_APIS,
        api_versions,
    )

    assert len(HANDLED_APIS) == 33
    assert dict(HANDLED_APIS)[18] == "API_VERSIONS"
    assert dict(HANDLED_APIS)[2] == "LIST_OFFSETS"
    assert API_VERSIONS_RANGE == (0, 3)

    reqs = spark.createDataFrame(
        [
            (1, 0, 7),    # PRODUCE any version: dispatched
            (2, 4, 0),    # LEADER_AND_ISR: not served
            (3, 18, 3),   # API_VERSIONS v3: ok
            (4, 18, 4),   # API_VERSIONS v4: own-version gate
            (5, 66, 0),   # LIST_TRANSACTIONS: served
            (6, 67, 0),   # beyond the table: not served
        ],
        "correlation_id int, api_key int, api_version int",
    )
    out = {r.correlation_id: r for r in api_versions(reqs).collect()}
    assert out[1].handled and out[1].error_code == "NONE"
    assert not out[2].handled and out[2].error_code == "UNSUPPORTED_VERSION"
    assert out[3].error_code == "NONE"
    assert out[4].handled and out[4].error_code == "UNSUPPORTED_VERSION"
    assert out[5].api_name == "LIST_TRANSACTIONS" and out[5].error_code == "NONE"
    assert not out[6].handled
