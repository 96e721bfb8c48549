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
