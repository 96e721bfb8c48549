#!/usr/bin/env python
"""The hot-key decision tree, runnable: diagnose skew with heavy_hitters,
then pick the right tool per workload shape — and see which workloads
need NO tool because Spark already handles them.

    python examples/07_skew_toolkit.py [sf_dir]

The rules this walks through (measured in BASELINE.md's round-6 hot-key
stress at 10M rows):

  * algebraic aggregates (count/sum/min/max) — DON'T salt: map-side
    partial combine already bounds the hot key at one row per map task.
  * rank()/row_number() <= k windows — DON'T salt on Spark >= 3.5:
    Catalyst's WindowGroupLimit pushes a partial top-k below the
    shuffle. (grouped_top_k covers engines/patterns without it.)
  * RUNNING aggregates — the real window skew: every row is needed, no
    pushdown can exist, the hot key serializes into one task's sort.
    keyed_running_sum decomposes it into range-sharded prefix sums.
  * shuffled joins — let AQE split at runtime; salted_join is for plans
    AQE can't re-plan (stream-static microbatch joins, bucket-pinned
    layouts).
"""

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import skew

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="skew-toolkit")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, SF, "events")
    # manufacture a hot key so the demo has one: user 0 owns ~20%
    events = events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(0)).otherwise(
            F.col("user_id")
        ),
    )

    # 1) diagnose BEFORE reaching for any tool
    print("heavy hitters (top-3 key shares):")
    skew.heavy_hitters(events, ["user_id"], k=3).show()

    # 2) algebraic agg: the plain plan is already skew-safe — partial
    #    combine means the hot key ships one row per map task
    print("per-user count/sum (plain groupBy — correct choice):")
    events.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    ).orderBy(F.col("n").desc()).show(5)

    # 3) top-k per key: Spark >= 3.5 de-skews the textbook window via
    #    WindowGroupLimit (see it in the plan); grouped_top_k is the
    #    portable form
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    plan = (
        events.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    print("WindowGroupLimit in the optimized plan:",
          "WindowGroupLimit" in plan)
    print("grouped_top_k (salted two-stage, same result):")
    skew.grouped_top_k(
        events, ["user_id"], [F.col("value").desc(), F.col("event_id")], 3
    ).filter(F.col("user_id") == 0).show()

    # 4) running aggregate: the window family that genuinely skews —
    #    keyed_running_sum spreads the hot key over order-range shards
    ev = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ord"), "value"
    )
    out = skew.keyed_running_sum(
        ev, ["user_id"], "ord", "value", "event_id", n_shards=8
    )
    print("per-user running spend (skew-safe, hot user):")
    out.filter(F.col("user_id") == 0).orderBy("ord", "event_id").select(
        "user_id", "event_id", "running_sum"
    ).show(5)

    # 5) joins: AQE first; salted_join where AQE can't re-plan
    dim = events.select("user_id").distinct().withColumn(
        "segment", F.pmod("user_id", F.lit(10))
    )
    print("salted_join output matches the plain join:")
    a = events.join(dim, "user_id").count()
    b = skew.salted_join(events, dim, ["user_id"]).count()
    print(f"  plain={a} salted={b} equal={a == b}")


if __name__ == "__main__":
    main()
