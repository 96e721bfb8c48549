#!/usr/bin/env python
"""The Kafka Streams workloads the reference proves in its own test suite
(KStreamAggregationTest/KTableTest/GlobalKTableTest), as batch operators:
windowed/session aggregation, KTable views, stream-table joins, and the
round-2 additions (FK join, suppress-final, branch).

    python examples/02_streams_workloads.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import ktable, windows
from starlight_for_kafka_spark.sources import LogTable

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="streams-workloads")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, SF, "events")
    log = LogTable.from_events(events, 8).df.withColumn(
        "key", F.col("key").cast("string")
    )

    print("tumbling 1h counts (top 5):")
    windows.tumbling_window_agg(
        events, "ts", "1 hour", ["event_type"], [F.count("*").alias("cnt")]
    ).orderBy(F.desc("cnt")).show(5)

    print("suppress(untilWindowCloses) — only closed windows, 30min grace:")
    windows.suppress_final(
        events, "ts", "1 hour", ["event_type"], [F.count("*").alias("cnt")],
        grace_ms=1_800_000,
    ).orderBy(F.desc("window_start_ms")).show(3)

    print("session windows (1-day gap) per user (5):")
    windows.session_window_agg(
        events, ["user_id"], "ts", 86_400_000, [F.count("*").alias("cnt")]
    ).show(5)

    print("KTable latest-per-key (5):")
    ktable.ktable_latest(log, ["key"]).select("key", "offset").show(5)

    print("KIP-213 FK join: orders -> customer dimension (5):")
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    ktable.ktable_fk_join(
        orders.select("o_orderkey", "o_custkey"),
        cust.select("c_custkey", "c_name"),
        "o_custkey", "c_custkey", how="left",
    ).show(5)

    print("KStream#split first-match-wins branches:")
    windows.branch_streams(
        events,
        [("purchase", F.col("event_type") == "purchase"),
         ("big", F.col("value") >= 100)],
    ).groupBy("branch").count().show()


if __name__ == "__main__":
    main()
