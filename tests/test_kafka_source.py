"""Contract tests for the live-Kafka source path — no broker needed.

The fixtures reproduce the EXACT DataFrame schema Spark's Kafka source
emits (documented in the Spark Structured Streaming + Kafka integration
guide: key/value binary, topic string, partition int, offset long,
timestamp, timestampType int, and headers array<struct<key,value>> when
includeHeaders=true). normalize_kafka_records is the only logic of ours
in that path; these tests pin its mapping onto KAFKA_RECORD_SCHEMA and
prove a normalized batch drops into the log operators unchanged —
the same claim the reference proves with live clients end-to-end
(tests/.../BasicEndToEndKafkaTest.java), checked here at the schema and
semantics level."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from starlight_for_kafka_spark.sources import LogTable
from starlight_for_kafka_spark.sources.kafka import normalize_kafka_records
from starlight_for_kafka_spark.sources.logtable import KAFKA_RECORD_SCHEMA

# the connector's output schema with includeHeaders=true, verbatim
KAFKA_SOURCE_DDL = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key:string,value:binary>>"
)


def _fixture_rows():
    t = lambda s: datetime.datetime(2024, 3, 1, 0, 0, s)  # noqa: E731
    return [
        (b"k0", b"v0", "orders", 0, 0, t(0), 0, [("h1", b"x")]),
        (b"k1", None, "orders", 0, 1, t(1), 0, None),  # tombstone, null headers
        (None, b"v2", "orders", 1, 0, t(2), 1, []),    # null key, LogAppendTime
        (b"k3", b"v3", "orders", 1, 1, t(3), 0, [("h1", None), ("h2", b"y")]),
    ]


def test_normalize_matches_log_schema(spark):
    raw = spark.createDataFrame(_fixture_rows(), KAFKA_SOURCE_DDL)
    out = normalize_kafka_records(raw)
    assert out.schema == KAFKA_RECORD_SCHEMA or [
        (f.name, f.dataType.simpleString()) for f in out.schema.fields
    ] == [(f.name, f.dataType.simpleString()) for f in KAFKA_RECORD_SCHEMA.fields]
    rows = {(r.partition, r.offset): r for r in out.collect()}
    assert rows[(0, 1)].value is None                       # tombstone preserved
    assert rows[(0, 1)].headers == []                       # null headers → []
    assert rows[(1, 0)].key is None                         # null key preserved
    assert [h.key for h in rows[(1, 1)].headers] == ["h1", "h2"]
    assert rows[(1, 1)].headers[0].value is None            # null header value ok


def test_normalize_without_headers_column(spark):
    no_headers_ddl = (
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int"
    )
    raw = spark.createDataFrame(
        [(b"k", b"v", "t", 0, 7, datetime.datetime(2024, 1, 1), 0)], no_headers_ddl
    )
    out = normalize_kafka_records(raw)
    row = out.first()
    assert row.headers == [] and row.offset == 7


def test_normalized_batch_drives_log_operators(spark):
    """A normalized connector batch IS a log table: fetch windows, high
    watermarks, and max_bytes budgets work on it unchanged."""
    raw = spark.createDataFrame(_fixture_rows(), KAFKA_SOURCE_DDL)
    log = LogTable(normalize_kafka_records(raw))
    hwm = {r.partition: r.high_watermark for r in log.high_watermarks().collect()}
    assert hwm == {0: 2, 1: 2}
    fetched = log.fetch(partition=0, start_offset=1).collect()
    assert [r.offset for r in fetched] == [1]
    tiny = log.fetch(partition=1, start_offset=0, max_bytes=1).collect()
    assert [r.offset for r in tiny] == [0]  # first record always served


def test_normalize_is_idempotent(spark):
    raw = spark.createDataFrame(_fixture_rows(), KAFKA_SOURCE_DDL)
    once = normalize_kafka_records(raw)
    twice = normalize_kafka_records(once)
    assert sorted(map(str, once.collect())) == sorted(map(str, twice.collect()))


def test_reader_unavailable_raises_clear_error(spark):
    import pytest

    from starlight_for_kafka_spark.sources.kafka import read_kafka_batch

    with pytest.raises(Exception) as exc:
        read_kafka_batch(spark, "localhost:9099", "nope").count()
    assert "kafka" in str(exc.value).lower()
