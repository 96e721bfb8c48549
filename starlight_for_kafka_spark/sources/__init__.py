from starlight_for_kafka_spark.sources.commitlog import CommitConflict, CommittedLog
from starlight_for_kafka_spark.sources.logtable import (
    KAFKA_RECORD_SCHEMA,
    LogTable,
    validate_records,
)

__all__ = [
    "KAFKA_RECORD_SCHEMA",
    "CommitConflict",
    "CommittedLog",
    "LogTable",
    "validate_records",
]
