#!/usr/bin/env python
"""Round-4 subsystems end-to-end: byte-level durability and real decoding.

  * __consumer_offsets at-rest codec — a typed commit log serialized into
    the broker's versioned binary key/value records (mixed v1/v3 values,
    tombstones as null values) and recovered byte-level: decode, route by
    key version, latest-wins compaction with tombstone removal.
  * Producer-state snapshots — the per-transaction summary persisted with
    per-partition watermarks, then recovered as snapshot + bounded tail
    replay instead of a full-log recompute.
  * Real media decode — WAV/PPM/BMP/Y4M payloads synthesized as actual
    container bytes and parsed back by the pure-stdlib codec kernels.

    python examples/05_wire_recovery_and_media.py [sf_dir]
"""

import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import groups, multimodal
from starlight_for_kafka_spark.operators import transactions as tx
from starlight_for_kafka_spark.sources import LogTable

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="wire-recovery")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, SF, "events")

    print("== offsets topic: typed commits -> binary records (v3 values)")
    commits = groups.derive_commits_from_events(events)
    records = groups.encode_offsets_topic(commits)
    records.select(
        F.hex(F.substring("key", 1, 16)).alias("key_prefix_hex"),
        F.octet_length("value").alias("value_bytes"),
        "append_ts",
    ).show(3, truncate=False)

    print("== byte-level recovery == typed compaction")
    from_wire = groups.recover_offsets_from_wire(records)
    typed = groups.committed_offsets(commits)
    print(
        f"   wire rows={from_wire.count()}  typed rows={typed.count()}  "
        f"(ms-granularity latest-wins)"
    )
    from_wire.orderBy("group", "partition").show(5)

    print("== producer-state snapshot + bounded tail replay")
    log = LogTable.from_events(events, num_partitions=8)
    txn_log = tx.derive_txn_log(log.df)
    root = tempfile.mkdtemp(prefix="slk-example-pstate-")
    try:
        store = tx.ProducerStateStore(root)
        snap_id = store.take_snapshot(txn_log.filter(F.col("offset") < 20))
        _, watermarks = store.latest()
        tail = store.snapshot_tail(txn_log, watermarks)
        print(
            f"   snapshot {snap_id}: watermarks={watermarks}; "
            f"tail replays {tail.count()} of {txn_log.count()} rows"
        )
        recovered = store.recover(spark, txn_log)
        full = tx.txn_summary(txn_log)
        print(
            f"   recovered txns={recovered.count()}  "
            f"full-recompute txns={full.count()} (equal by construction)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print("== real media payloads, decoded by the stdlib codec kernels")
    docs = load_table(spark, SF, "documents").limit(30)
    media = multimodal.synthesize_media(docs)
    feats = multimodal.extract_features(media)
    feats.select(
        "media_id", "kind", "n_bytes",
        F.col("features")[0].alias("f0_rate_or_width"),
        F.col("features")[1].alias("f1_n_or_height"),
    ).orderBy("media_id").show(6)

    spark.stop()


if __name__ == "__main__":
    main()
