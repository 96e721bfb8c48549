#!/usr/bin/env python
"""The mergeable-summary toolkit for 100 TB observability and curation:
every structure here is md5-deterministic (reproducible across runs,
engines, and retries), built with partial-combining aggregations, and
MERGEABLE — per-shard/per-window summaries combine into exact
whole-corpus summaries without rescanning the data.

  * HyperLogLog        — distinct counts (global + per-day, register rollup)
  * Count-Min          — per-key frequency estimates, never undercounts
  * KMV                — distinct counts WITH union/intersection algebra
  * Bloom gate         — map-only decontamination membership test
  * Prometheus histogram — latency/size quantiles, the reference's
                           RequestStats/Grafana model recomputed from data

    python examples/04_sketches_and_observability.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import analytics, skew
from starlight_for_kafka_spark.operators.metrics import (
    histogram_quantile,
    prom_histogram,
)
from starlight_for_kafka_spark.sources import LogTable

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="sketches")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, SF, "events")

    print("== HLL distinct users (global, both estimator branches visible)")
    analytics.hll_cardinality(ev, "user_id").show()

    print("== HLL per day (the sliced report exact countDistinct can't afford)")
    by_day = ev.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
    analytics.hll_cardinality_by(by_day, "user_id", ["day"]).orderBy("day").show(5)

    print("== Count-Min: top estimated user frequencies vs exact")
    sk = skew.cm_sketch(ev, "user_id")
    est = skew.cm_estimate(sk, ev.select("user_id").distinct(), "user_id")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact"))
    est.join(exact, "user_id").orderBy(F.col("est").desc(), "user_id").show(5)

    print("== KMV set algebra: viewer/purchaser audience overlap")
    a = ev.filter("event_type = 'view'").select("user_id")
    b = ev.filter("event_type = 'purchase'").select("user_id")
    analytics.kmv_intersection(
        analytics.kmv_sketch(a, "user_id", 64),
        analytics.kmv_sketch(b, "user_id", 64),
        64,
    ).show()

    print("== Prometheus histogram + histogram_quantile over record sizes")
    log = LogTable.from_events(ev, num_partitions=8)
    from starlight_for_kafka_spark.sources.logtable import record_size

    sized = log.df.withColumn("rec_bytes", record_size())
    hist = prom_histogram(sized, "rec_bytes", [9.0, 10.0, 11.0], ["partition"])
    histogram_quantile(hist, [0.5, 0.99], ["partition"]).orderBy(
        "partition", "q"
    ).show(8)


if __name__ == "__main__":
    main()
