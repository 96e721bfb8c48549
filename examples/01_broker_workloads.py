#!/usr/bin/env python
"""Broker workloads end-to-end: what a starlight-for-kafka user runs today,
re-expressed on this engine — produce with dense offsets, fetch, time→offset
lookup, committed-offset views, read-committed scans.

    python examples/01_broker_workloads.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import groups, transactions as tx
from starlight_for_kafka_spark.sources import LogTable

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="broker-workloads")
    spark.sparkContext.setLogLevel("ERROR")

    # PRODUCE: events become a partitioned log with dense per-partition offsets
    log = LogTable.from_events(load_table(spark, SF, "events"), num_partitions=8)
    print("high watermarks:")
    log.high_watermarks().orderBy("partition").show()

    # FETCH: offset-range read (partition-pruned at rest)
    print("fetch(partition=3, offset>=10, 5 records):")
    log.fetch(partition=3, start_offset=10, max_records=5).show(truncate=40)

    # LIST_OFFSETS by timestamp
    import datetime

    ts = datetime.datetime(2024, 1, 10)
    print(f"offsets_for_times({ts}):")
    log.offsets_for_times(ts).orderBy("partition").show()

    # consumer groups: committed offsets (latest-wins compacted view) + lag
    commits = groups.derive_commits_from_events(load_table(spark, SF, "events"))
    print("consumer lag per (group, partition):")
    groups.consumer_lag(commits, log.latest_offsets()).orderBy(
        "group", "partition"
    ).show(8)

    # transactions: read-committed scan (LSO + aborted-range anti-join)
    txn_log = tx.derive_txn_log(log.df)
    visible = tx.read_committed(txn_log)
    print(
        "read_committed keeps",
        visible.count(),
        "of",
        txn_log.count(),
        "records (open txns after LSO + aborted ranges filtered)",
    )


if __name__ == "__main__":
    main()
