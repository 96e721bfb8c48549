"""starlight_for_kafka_spark — a PySpark-native engine with the query and
data-processing capabilities of datastax/starlight-for-kafka.

The reference (a Kafka-protocol broker on Pulsar) defines:
  * a partitioned, offset-addressed log (produce/fetch/list_offsets/truncate)
  * consumer-group offset semantics (compacted latest-wins offset log)
  * transactions (idempotence, aborted-txn index, read-committed)
  * schema-registry typing (subjects/versions + compatibility rules)
  * the Kafka Streams workloads its test suite proves it supports
    (keyed/windowed/session aggregation, KTable, GlobalKTable joins)

This package re-expresses each of those natively in the Spark DataFrame /
SQL / Structured Streaming model — no wire protocol, no Pulsar. See
SURVEY.md for the operator-by-operator mapping.
"""

from starlight_for_kafka_spark.session import get_session, load_table

__all__ = ["get_session", "load_table"]
__version__ = "0.1.0"
