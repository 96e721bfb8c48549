#!/usr/bin/env python
"""The coordinator janitors + multi-partition fetch added in round 5: the
timeout-abort sweep that unblocks read-committed consumers behind a dead
producer (TransactionCoordinator.java:1034), transactional-id expiration
(TransactionConfig.java:51), legacy MessageSet ingest, and a
multi-partition FETCH under one response byte budget (KIP-74,
MessageFetchContext).

    python examples/06_coordinator_janitors.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import transactions as tx
from starlight_for_kafka_spark.sources import LogTable, wire

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="coordinator-janitors")
    spark.sparkContext.setLogLevel("ERROR")

    log = LogTable.from_events(load_table(spark, SF, "events"), num_partitions=8)
    txn_log = tx.derive_txn_log(log.df).cache()

    # a dead producer's open transaction holds the LSO down...
    print("LSO before the sweep (held down by open transactions):")
    tx.last_stable_offsets(txn_log).orderBy("partition").show()

    # ...until the coordinator's timeout sweep aborts it
    now_ms = 4_000_000_000_000  # far future: every open txn exceeds its timeout
    swept = tx.abort_timed_out_transactions(txn_log, now_ms, timeout_ms=60_000)
    print("LSO after abort_timed_out_transactions (advanced to the HWM):")
    tx.last_stable_offsets(swept).orderBy("partition").show()
    print("read-committed now serves the unblocked range:")
    tx.read_committed(swept).groupBy("partition").count().orderBy("partition").show()

    # transactional-id expiration: idle non-Ongoing ids are flagged for purge
    ev = load_table(spark, SF, "events").select(
        F.concat(F.lit("txn-"), (F.col("user_id") % 12).cast("string")).alias(
            "transactional_id"
        ),
        "ts", "event_id",
        F.element_at(
            F.array(F.lit("init"), F.lit("add_partitions"), F.lit("add_offsets"),
                    F.lit("end_commit"), F.lit("end_abort")),
            (F.col("event_id") % 5).cast("int") + 1,
        ).alias("action"),
    )
    print("expire_transactional_ids (1h horizon at the corpus edge):")
    tx.expire_transactional_ids(
        ev, now_ms=1_706_659_200_000, expiration_ms=3_600_000
    ).orderBy("transactional_id").show()

    # multi-partition FETCH under ONE response byte budget, request order
    print("fetch_multi([(5,10),(1,0),(7,3)], response_max_bytes=2000):")
    log.fetch_multi([(5, 10), (1, 0), (7, 3)], response_max_bytes=2000).groupBy(
        "ridx", "partition"
    ).count().orderBy("ridx").show()

    # legacy replay: v2 batches -> v1 message sets -> typed rows again
    batches = wire.encode_wire_batches(log.df, max_records_per_batch=50)
    legacy = wire.down_convert_batches(batches, to_magic=1)
    typed = wire.ingest_message_sets(legacy)
    print("legacy v1 MessageSet ingest roundtrip row count:",
          typed.count(), "==", log.df.count())

    txn_log.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
