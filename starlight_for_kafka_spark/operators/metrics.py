"""Broker metrics as queries over the log.

The reference's performance surface is its Prometheus stats layer
(kafka-impl/.../RequestStats.java, 271 LoC) and the Grafana dashboard
(grafana/dashboard.json): kop_server_BYTES_IN / BYTES_OUT and
MESSAGE_IN / MESSAGE_OUT rates per topic-partition. There, counters are
bumped on the produce/fetch hot path; here the log IS the data, so the
same numbers fall out of one windowed aggregation — and can be computed
retroactively for any time range, which broker-side counters cannot.

Scale: one shuffle on (bucket, partition) with map-side partial
aggregation; bucket cardinality is small (hours × partitions), so the
reduce side is trivially tiny at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def throughput_metrics(log: DataFrame, bucket: str = "hour") -> DataFrame:
    """BYTES_IN / MESSAGE_IN per (time bucket, partition) — the reference's
    rate counters (RequestStats.java; dashboard exprs
    ``rate(kop_server_BYTES_IN...)``) recomputed from the log itself.

    ``bytes_in`` counts key+value payload octets, matching what the broker
    meters on produce; ``avg_record_bytes`` is the derived per-record cost
    the dashboard plots as BYTES_IN/MESSAGE_IN.
    """
    from starlight_for_kafka_spark.sources.logtable import record_size

    size = record_size()
    return (
        log.groupBy(
            F.date_trunc(bucket, "timestamp").alias("bucket"),
            "partition",
        )
        .agg(
            F.count("*").alias("messages_in"),
            F.sum(size.cast("long")).alias("bytes_in"),
        )
        .withColumn(
            "avg_record_bytes",
            (F.col("bytes_in") / F.col("messages_in")).cast("double"),
        )
    )
