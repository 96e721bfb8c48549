"""Live-Kafka source: plug a real topic into the engine.

The engine's log schema (sources/logtable.py KAFKA_RECORD_SCHEMA) is by
construction the schema Spark's Kafka source emits — the same shape the
reference serves over the wire (key/value bytes, headers, timestamp,
partition, offset; kafka-impl/.../utils/ByteBufUtils.java:172-278). So a
live topic drops into every operator here unchanged: fetch windows, group
offset queries, windowed aggregations, read-committed scans.

The spark-sql-kafka connector jar is not bundled with this environment;
``read_kafka_stream``/``read_kafka_batch`` raise a clear error when the
source is unavailable, while ``normalize_kafka_records`` — the only logic
of ours in the path — is a pure column mapping, testable without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .logtable import LOG_COLUMNS


def normalize_kafka_records(df: DataFrame) -> DataFrame:
    """Map Spark's Kafka source columns onto the engine's log schema.

    The source emits (key binary, value binary, topic string, partition
    int, offset long, timestamp timestamp, timestampType int, headers
    array<struct<key:string,value:binary>>); we keep the log columns and
    normalize a missing/null headers column to an empty array so
    header-projection operators never branch on nullability.
    """
    cols = dict.fromkeys(df.columns)
    headers = (
        F.coalesce(
            F.col("headers"),
            F.array().cast("array<struct<key:string,value:binary>>"),
        )
        if "headers" in cols
        else F.array().cast("array<struct<key:string,value:binary>>")
    )
    return df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        headers.alias("headers"),
        F.col("timestamp").cast("timestamp").alias("timestamp"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
    ).select(*LOG_COLUMNS)


def _kafka_reader(reader, bootstrap_servers: str, topic: str, starting_offsets: str):
    return (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from a live topic, normalized to the log schema.
    Requires the spark-sql-kafka connector on the classpath."""
    try:
        raw = _kafka_reader(
            spark.readStream, bootstrap_servers, topic, starting_offsets
        ).load()
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "Kafka source unavailable: add the spark-sql-kafka-0-10 connector "
            "matching your Spark version to the classpath "
            "(spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)"
        ) from e
    return normalize_kafka_records(raw)


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Batch read of a topic's current contents (spark.read.format("kafka"))."""
    try:
        raw = _kafka_reader(
            spark.read, bootstrap_servers, topic, starting_offsets
        ).load()
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "Kafka source unavailable: add the spark-sql-kafka-0-10 connector "
            "matching your Spark version to the classpath"
        ) from e
    return normalize_kafka_records(raw)
