"""Structured Streaming forms of the reference's stream workloads.

The reference proves (via its Kafka Streams test suite,
tests/src/test/java/io/streamnative/pulsar/handlers/kop/streams/) that it
supports windowed/session/keyed aggregation, KTable upserts, and
stream–table joins over its log. Here each becomes a readStream →
transform → writeStream pipeline:

  * watermark = Streams "grace period" (SessionWindows.ofInactivityGapAndGrace)
  * checkpointLocation = the consumer-group committed offset (§2.3) — the
    engine owns offsets exactly like the group coordinator does
  * foreachBatch + transactional sink = the transaction coordinator (§2.4):
    a microbatch is the transaction, so commit/abort is batch atomicity

The log source is any directory the LogTable writes (file stream); against
a real Kafka cluster the same plans run off ``format("kafka")`` unchanged —
the record schema matches by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starlight_for_kafka_spark.sources.logtable import KAFKA_RECORD_SCHEMA


def read_log_stream(spark: SparkSession, path: str) -> DataFrame:
    """FETCH as a stream: tail the log directory. startingOffsets≡where the
    checkpoint left off; maxFilesPerTrigger bounds a microbatch like the
    reference's maxReadEntriesNum fetch bound."""
    return (
        spark.readStream.schema(KAFKA_RECORD_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def windowed_count_stream(
    log: DataFrame, duration: str = "500 milliseconds", watermark: str = "1 second"
) -> DataFrame:
    """Tumbling-window count (KStreamAggregationTest.java:421 streaming
    form). Watermark bounds state: late records beyond it are dropped, the
    grace-period semantic."""
    return (
        log.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", duration), F.col("key"))
        .agg(F.count("*").alias("cnt"))
    )


def session_window_count_stream(
    log: DataFrame, gap: str = "300 milliseconds", grace: str = "1 second"
) -> DataFrame:
    """Session-window count with inactivity gap + grace
    (KStreamAggregationTest.java:450 shouldCountSessionWindows):
    ``session_window`` merges events closer than ``gap``; the watermark is
    the grace period after which a session can no longer extend."""
    return (
        log.withWatermark("timestamp", grace)
        .groupBy(F.session_window("timestamp", gap), F.col("key"))
        .agg(F.count("*").alias("cnt"))
    )


def ktable_stream(log: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """KTable changelog as a stream: latest value per key. Complete-output
    max_by keyed aggregation — the streaming analog of
    operators/ktable.ktable_latest (KTableTest.java:80). State restore on
    restart comes from the checkpoint, playing the role of the reference's
    changelog-topic restore."""
    return log.groupBy("key").agg(
        F.max_by(F.col("value"), F.struct("partition", "offset")).alias("value"),
        F.max(F.struct("partition", "offset")).alias("last_position"),
    )


def idempotent_stream(log_with_pid: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Streaming idempotent produce: drop duplicate (pid, epoch, seq)
    within the watermark — bounded state, the same guarantee the
    reference's producer-state map gives within snapshot retention
    (storage/ProducerStateManager.java)."""
    return log_with_pid.withWatermark("timestamp", watermark).dropDuplicatesWithinWatermark(
        ["pid", "epoch", "seq"]
    )


def stream_global_table_join(stream: DataFrame, table: DataFrame, on, how: str = "inner") -> DataFrame:
    """Streaming KStream ⋈ GlobalKTable: stream–static broadcast join
    (GlobalKTableTest.java) — the static side re-reads per microbatch,
    which IS GlobalKTable's full-replication semantics."""
    return stream.join(F.broadcast(table), on, how)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drive a streaming query to completion over currently-available data
    (test/bench harness): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def write_exactly_once(stream_df: DataFrame, batch_fn, checkpoint: str):
    """END_TXN as batch atomicity: foreachBatch hands (df, epoch_id) to a
    transactional sink; epoch_id replay-dedup gives exactly-once — the
    Spark-native TransactionCoordinator (§2.4)."""
    return (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
