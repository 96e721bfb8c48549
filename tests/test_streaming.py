"""Structured Streaming tests: drive file-stream microbatches over a
written log and check results equal the batch forms."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from starlight_for_kafka_spark.operators import ktable as ktable_ops
from starlight_for_kafka_spark.operators import transactions as tx
from starlight_for_kafka_spark.streaming import stream_ops


def _write_log(tmp_path, log):
    path = str(tmp_path / f"log-{uuid.uuid4().hex[:6]}")
    log.write(path)
    return path


def test_windowed_count_stream_matches_batch(tmp_path, spark, log):
    path = _write_log(tmp_path, log)
    stream = stream_ops.read_log_stream(spark, path)
    agg = stream_ops.windowed_count_stream(stream, "1 hour", "1 minute")
    stream_ops.run_to_memory(agg, "win_counts", output_mode="append")
    got = spark.sql("SELECT count(*) AS n, sum(cnt) AS total FROM win_counts").first()
    batch = (
        log.df.groupBy(F.window("timestamp", "1 hour"), "key")
        .agg(F.count("*").alias("cnt"))
        .agg(F.count("*").alias("n"), F.sum("cnt").alias("total"))
        .first()
    )
    # append mode emits only watermark-closed windows; with availableNow over
    # a finite log, the final watermark closes all but the last window(s)
    assert got.total <= batch.total
    assert got.n >= batch.n - 8  # at most one open window per key tail
    assert got.total >= batch.total * 0.5


def test_ktable_stream_matches_batch_latest(tmp_path, spark, log):
    path = _write_log(tmp_path, log)
    stream = stream_ops.read_log_stream(spark, path)
    kt = stream_ops.ktable_stream(stream)
    stream_ops.run_to_memory(kt, "ktable_out", output_mode="complete")
    got = {
        bytes(r.key).decode(): bytes(r.value).decode()
        for r in spark.sql("SELECT key, value FROM ktable_out").collect()
    }
    batch = {
        bytes(r.key).decode(): bytes(r.value).decode()
        for r in ktable_ops.ktable_latest(log.df, ["key"]).collect()
    }
    assert got == batch


def test_idempotent_stream_drops_dups(tmp_path, spark, log):
    txn_log = tx.derive_txn_log(log.df)
    dups = txn_log.filter(F.col("seq") % 5 == 0).withColumn(
        "offset", F.col("offset") + 1_000_000
    )
    path = str(tmp_path / "txnlog")
    txn_log.unionByName(dups).write.parquet(path)
    stream = (
        spark.readStream.schema(txn_log.schema).option("maxFilesPerTrigger", 4).parquet(path)
    )
    deduped = stream_ops.idempotent_stream(stream, watermark="365 days")
    stream_ops.run_to_memory(deduped, "idem_out", output_mode="append")
    n = spark.sql("SELECT count(*) AS n FROM idem_out").first().n
    assert n == txn_log.count()


def test_exactly_once_foreachbatch(tmp_path, spark, log):
    path = _write_log(tmp_path, log)
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_ops.read_log_stream(spark, path)

    def sink(df, epoch_id):
        df.write.mode("append").parquet(out_dir)

    q = stream_ops.write_exactly_once(stream, sink, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == log.df.count()


def test_group_coordinator_stream_converges_to_batch_replay(tmp_path, spark, events):
    """The streaming state machine over N microbatches must land on the
    same final state as the batch replay of the full log."""
    from starlight_for_kafka_spark.operators import groups as g

    membership = g.derive_membership_from_events(events)
    path = str(tmp_path / "membership")
    # several files -> several microbatches, exercising cross-batch state
    membership.repartition(6).write.parquet(path)
    stream = (
        spark.readStream.schema(membership.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_ops.group_coordinator_stream(stream)
    stream_ops.run_to_memory(out, "coord_out", output_mode="update")
    # update mode emits one snapshot per group per batch; keep the last
    got = {
        r.group: (r.generation, r.n_members, r.state)
        for r in spark.sql("SELECT * FROM coord_out").collect()
    }
    # NOTE: memory sink in update mode appends rows; later rows overwrite in
    # dict order because SELECT preserves emission order per group
    batch = {
        r.group: (r.generation, r.n_members, r.state)
        for r in g.recover_group_state(membership).collect()
    }
    assert set(got) == set(batch)
    # cross-batch ordering caveat: the file stream orders batches by file,
    # not by ts, so generation (event count) must match exactly while the
    # live-member set matches because last-action-wins is order-insensitive
    # only within a batch. Compare generation (order-independent count).
    for grp in batch:
        assert got[grp][0] == batch[grp][0], (grp, got[grp], batch[grp])


def test_ema_stream_order_dependent_aggregate(tmp_path, spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + datetime.timedelta(seconds=i), float(v))
        for i, v in enumerate([10.0, 20.0, 30.0])
    ] + [("b", t0, 5.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    path = str(tmp_path / "ema")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = stream_ops.ema_stream(stream, alpha=0.5)
    stream_ops.run_to_memory(out, "ema_out", output_mode="update")
    got = {r.key: (r.ema, r.n) for r in spark.sql("SELECT * FROM ema_out").collect()}
    # a: 10 -> .5*20+.5*10=15 -> .5*30+.5*15=22.5 ; b: 5
    assert got["a"] == (22.5, 3)
    assert got["b"] == (5.0, 1)


def test_idempotent_sink_makes_replayed_epochs_noops(tmp_path, spark, log):
    """Exactly-once at the sink: re-delivering an epoch (as checkpoint
    recovery does) must not duplicate or clobber its output."""
    src = _write_log(tmp_path, log)
    out = str(tmp_path / "sink_out")
    sink = stream_ops.idempotent_parquet_sink(out)
    q = stream_ops.write_exactly_once(
        stream_ops.read_log_stream(spark, src), sink, str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    total = spark.read.parquet(out).count()
    assert total == log.df.count()

    # replay epoch 0 with a DIFFERENT (smaller) frame: must be a no-op
    sink(log.df.limit(3), 0)
    assert spark.read.parquet(out).count() == total

    # a genuinely new epoch still lands
    sink(log.df.limit(3), 10_000)
    assert spark.read.parquet(out).count() == total + 3


def test_hopping_window_stream_total_doubles(tmp_path, spark, log):
    """Hopping windows with slide = duration/2: every event lands in
    exactly 2 windows, so the summed counts are 2x the record count."""
    path = _write_log(tmp_path, log)
    stream = stream_ops.read_log_stream(spark, path)
    agg = stream_ops.hopping_window_count_stream(
        stream, "2 hours", "1 hour", watermark="1 minute"
    )
    stream_ops.run_to_memory(agg, "hop_counts", output_mode="complete")
    total = spark.sql("SELECT sum(cnt) AS t FROM hop_counts").first().t
    assert total == 2 * log.df.count()


def test_stream_stream_join_matches_batch_interval_join(tmp_path, spark, log):
    """Inner windowed KStream join over a finite log equals the batch
    interval_join on the same split (even/odd offsets)."""
    from starlight_for_kafka_spark.operators import windows as win

    path = _write_log(tmp_path, log)
    stream = stream_ops.read_log_stream(spark, path)
    lhs = stream.filter("offset % 2 = 0").select(
        "key", F.col("timestamp").alias("l_ts"), F.col("offset").alias("l_off")
    )
    rhs = stream.filter("offset % 2 = 1").select(
        "key", F.col("timestamp").alias("r_ts"), F.col("offset").alias("r_off")
    )
    joined = stream_ops.stream_stream_join(
        lhs, rhs, ["key"], "l_ts", "r_ts",
        before="1 hour", after="0 seconds", watermark="1 minute",
    )
    stream_ops.run_to_memory(joined, "ssj_out", output_mode="append")
    got = spark.sql("SELECT count(*) AS n FROM ssj_out").first().n

    batch_l = log.df.filter("offset % 2 = 0").select(
        "key", F.col("timestamp").alias("l_ts"), F.col("offset").alias("l_off")
    )
    batch_r = log.df.filter("offset % 2 = 1").select(
        "key", F.col("timestamp").alias("r_ts"), F.col("offset").alias("r_off")
    )
    expected = win.interval_join(
        batch_l, batch_r, ["key"], "l_ts", "r_ts", before_ms=3_600_000, after_ms=0
    ).count()
    assert expected > 0
    assert got == expected


def test_stream_stream_left_join_emits_expired_nulls(tmp_path, spark, log):
    """Outer rows emit only once the watermark passes: the finite-log run
    must produce at least the inner matches, at most the batch left join,
    and null right-sides for expired unmatched lefts."""
    from starlight_for_kafka_spark.operators import windows as win

    path = _write_log(tmp_path, log)
    stream = stream_ops.read_log_stream(spark, path)
    lhs = stream.filter("offset % 2 = 0").select(
        "key", F.col("timestamp").alias("l_ts"), F.col("offset").alias("l_off")
    )
    # sparse right side -> plenty of unmatched lefts
    rhs = stream.filter("offset % 10 = 1").select(
        "key", F.col("timestamp").alias("r_ts"), F.col("offset").alias("r_off")
    )
    joined = stream_ops.stream_stream_join(
        lhs, rhs, ["key"], "l_ts", "r_ts",
        before="5 minutes", after="0 seconds", watermark="1 minute", how="left",
    )
    stream_ops.run_to_memory(joined, "ssj_left", output_mode="append")
    got_total = spark.sql("SELECT count(*) AS n FROM ssj_left").first().n
    got_nulls = spark.sql(
        "SELECT count(*) AS n FROM ssj_left WHERE r_off IS NULL"
    ).first().n

    bl = log.df.filter("offset % 2 = 0").select(
        "key", F.col("timestamp").alias("l_ts"), F.col("offset").alias("l_off")
    )
    br = log.df.filter("offset % 10 = 1").select(
        "key", F.col("timestamp").alias("r_ts"), F.col("offset").alias("r_off")
    )
    inner = win.interval_join(bl, br, ["key"], "l_ts", "r_ts", 300_000, 0).count()
    batch_left = win.interval_join(
        bl, br, ["key"], "l_ts", "r_ts", 300_000, 0, how="left"
    ).count()
    assert inner <= got_total <= batch_left
    # most lefts are unmatched with the sparse right; expired ones emit nulls
    assert got_nulls > 0
    assert got_total == inner + got_nulls  # matched rows + emitted outer rows


def test_session_window_stream_matches_batch_sessionization(tmp_path, spark, log):
    """shouldCountSessionWindows parity (KStreamAggregationTest.java:450):
    streaming session_window counts equal the batch gap-sessionization for
    every watermark-closed session."""
    from starlight_for_kafka_spark.operators import windows as win_ops

    path = _write_log(tmp_path, log)
    stream = stream_ops.read_log_stream(spark, path)
    gap_ms = 86_400_000  # 1 day, same gap as the batch session oracle
    agg = stream_ops.session_window_count_stream(
        stream, gap=f"{gap_ms} milliseconds", grace="1 second"
    )
    stream_ops.run_to_memory(agg, "sess_counts", output_mode="append")
    got = {
        (bytes(r.key).decode(), r.start_ms): r.cnt
        for r in spark.sql(
            "SELECT key, unix_micros(session_window.start) DIV 1000 AS start_ms,"
            " cnt FROM sess_counts"
        ).collect()
    }
    batch = {
        (bytes(r.key).decode(), r.session_start_ms): r.cnt
        for r in win_ops.session_window_agg(
            log.df, ["key"], "timestamp", gap_ms, [F.count("*").alias("cnt")]
        ).collect()
    }
    # append mode withholds sessions the final watermark left open (the tail
    # session per key); everything emitted must match the batch session exactly
    assert 0 < len(got) <= len(batch)
    for k, cnt in got.items():
        assert batch[k] == cnt, k
    # ≤ one open tail session per key may be withheld; most sessions emit
    assert len(got) >= len(batch) * 0.5


def test_end_to_end_pipeline_stream_dedupe_window_sink(tmp_path, spark, log):
    """Composition proof: log stream → txn-annotated idempotent dedupe →
    tumbling-window count → exactly-once parquet sink. The streamed result
    must equal the same pipeline run as one batch, and re-running from the
    same checkpoint must write nothing new (replay safety)."""
    import glob
    import os

    path = _write_log(tmp_path, log)
    out = str(tmp_path / "pipe_out")
    ckpt = str(tmp_path / "pipe_ckpt")

    def dedupe_window(df):
        # duplicate-free per (partition, offset) — stateful dedupe on the
        # stream side — then hourly counts per key
        deduped = df.dropDuplicates(["partition", "offset"])
        return deduped.groupBy(
            F.window("timestamp", "1 hour").alias("w"), "key"
        ).agg(F.count("*").alias("cnt"))

    stream = stream_ops.read_log_stream(spark, path)
    # the stream side sees each record twice (union with itself) to prove
    # the dedupe stage earns its keep
    doubled = stream.unionByName(stream)

    def run(ck):
        q = (
            dedupe_window(doubled)
            .writeStream.outputMode("complete")
            .foreachBatch(
                lambda df, eid: df.write.mode("overwrite").parquet(out)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(ckpt)
    streamed = {
        (r.w.start, bytes(r.key).decode()): r.cnt
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.w.start, bytes(r.key).decode()): r.cnt
        for r in dedupe_window(log.df.unionByName(log.df)).collect()
    }
    assert streamed == batch
    # replay: restart from the same checkpoint — no new data, no rewrite
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(out + "/*.parquet")}
    run(ckpt)
    assert {f: os.path.getmtime(f) for f in glob.glob(out + "/*.parquet")} == mtimes


def test_txn_offset_commit_data_and_offsets_atomic(tmp_path, spark, log):
    """TXN_OFFSET_COMMIT parity (GroupCoordinator.handleTxnCommitOffsets:
    719): consumed offsets commit in the SAME unit as the output data —
    foreachBatch writes both per epoch behind one idempotence marker, so a
    replayed epoch updates neither, and offsets always equal exactly what
    the landed data covers."""
    import os

    src = _write_log(tmp_path, log)
    out = str(tmp_path / "txn_out")
    stream = stream_ops.read_log_stream(spark, src)

    def sink(df, epoch_id):
        path = os.path.join(out, f"epoch={epoch_id}")
        if os.path.exists(os.path.join(path, "data", "_SUCCESS")):
            return  # replayed epoch: neither data nor offsets move
        df.persist()
        offsets = df.groupBy("partition").agg(
            (F.max("offset") + 1).alias("offset")
        ).withColumn("group", F.lit("g-pipe"))
        # offsets first, data (with marker) last: a crash between the two
        # re-runs the epoch, overwriting both — never data without offsets
        offsets.write.mode("overwrite").parquet(os.path.join(path, "offsets"))
        df.write.mode("overwrite").parquet(os.path.join(path, "data"))
        df.unpersist()

    q = stream_ops.write_exactly_once(stream, sink, str(tmp_path / "ck"))
    q.awaitTermination(120)
    data = spark.read.parquet(out + "/epoch=*/data")
    committed = spark.read.parquet(out + "/epoch=*/offsets")
    assert data.count() == log.df.count()
    # committed offsets == exactly the high watermark of landed data
    landed = {
        r.partition: r.hwm
        for r in data.groupBy("partition").agg((F.max("offset") + 1).alias("hwm")).collect()
    }
    got = {
        r.partition: r.offset
        for r in committed.groupBy("partition").agg(F.max("offset").alias("offset")).collect()
    }
    assert got == landed
    # replay an epoch: both stay untouched
    sink(log.df.limit(5), 0)
    assert spark.read.parquet(out + "/epoch=*/data").count() == data.count()


def test_dedup_stream_drops_content_duplicates(tmp_path, spark, log):
    """A log whose tail replays earlier (key, value) contents dedupes to
    the batch-distinct digest count."""
    from starlight_for_kafka_spark.sources import LogTable

    dup_tail = log.df.filter(F.col("offset") < 20)
    doubled = LogTable(log.df).append(
        dup_tail.select("key", "value", "headers", "timestamp", "partition")
    )
    path = _write_log(tmp_path, doubled)
    stream = stream_ops.read_log_stream(spark, path)
    dd = stream_ops.dedup_stream(stream, watermark="0 seconds")
    stream_ops.run_to_memory(dd, "dedup_out", output_mode="append")
    got = spark.sql("SELECT count(*) AS n FROM dedup_out").first().n
    batch_distinct = (
        doubled.df.select(
            F.md5(F.concat(F.coalesce("key", F.lit(b"")), F.lit(b"|"),
                           F.coalesce("value", F.lit(b"")))).alias("d")
        ).distinct().count()
    )
    assert got == batch_distinct


def test_typed_avro_stream_matches_batch_decode(tmp_path, spark):
    """Streaming Avro decode over file microbatches equals the batch
    decode of the same encoded log."""
    import json

    from starlight_for_kafka_spark.operators import registry as reg

    v1 = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "k", "type": "long"}, {"name": "n", "type": "int"}]})
    rd = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "k", "type": "long"}, {"name": "n", "type": "long"},
        {"name": "src", "type": "string", "default": "s"}]})
    base = spark.range(50).select(
        F.col("id").alias("k"),
        F.lit(1).cast("int").alias("schema_id"),
        F.struct(F.col("id").alias("k"), (F.col("id") * 3).cast("int").alias("n")).alias("record"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    enc = reg.avro_encode(base, {1: v1})
    path = str(tmp_path / "avro-log")
    enc.write.parquet(path)

    stream = spark.readStream.schema(enc.schema).parquet(path)
    typed = stream_ops.typed_avro_stream(stream, {1: v1}, rd)
    stream_ops.run_to_memory(typed, "avro_typed", output_mode="append")
    rows = spark.sql("SELECT typed.k AS k, typed.n AS n, typed.src AS src FROM avro_typed").collect()
    assert len(rows) == 50
    assert all(r.n == r.k * 3 and r.src == "s" for r in rows)


def test_append_mode_equals_batch_suppress_final(tmp_path, spark):
    """Streaming append mode + watermark IS suppress(untilWindowCloses):
    the memory sink must hold exactly the windows the batch suppress_final
    emits for the same grace — open windows stay withheld in state."""
    import datetime

    from starlight_for_kafka_spark.operators import windows as win_ops

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("A", base + datetime.timedelta(minutes=m)) for m in (0, 10, 70, 130, 200)
    ] + [("B", base + datetime.timedelta(minutes=m)) for m in (5, 65, 190)]
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    path = str(tmp_path / "suppress_src")
    df.write.parquet(path)

    stream = (
        spark.readStream.schema(df.schema)
        .parquet(path)
        .withWatermark("ts", "90 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("key"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "key",
            "cnt",
            F.expr("unix_micros(window.start) DIV 1000").alias("window_start_ms"),
        )
    )
    stream_ops.run_to_memory(stream, "suppress_out", output_mode="append")
    streamed = sorted(
        map(tuple, spark.table("suppress_out").collect())
    )
    batch = win_ops.suppress_final(
        df, "ts", "1 hour", ["key"], [F.count("*").alias("cnt")],
        grace_ms=90 * 60 * 1000,
    ).select("key", "cnt", "window_start_ms")
    assert streamed == sorted(map(tuple, batch.collect()))
    # suppression is real: the full batch agg has MORE windows than emitted
    full = win_ops.tumbling_window_agg(
        df, "ts", "1 hour", ["key"], [F.count("*").alias("cnt")]
    )
    assert full.count() > len(streamed) > 0


def test_txn_coordinator_stream_converges_to_batch_fold(tmp_path, spark):
    """The streaming txn state machine must land on the batch fold's result
    when each key's events arrive within one microbatch (the documented
    convergence condition). Action index = id DIV 5 so every key cycles
    through ALL five actions (init/add/commit/abort/fence paths all fire —
    a key-constant action stream would make this test vacuous), and the
    repartition is BY KEY so each microbatch carries whole keys."""
    from starlight_for_kafka_spark.operators import transactions as tx

    events = spark.range(200).select(
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
            "transactional_id"
        ),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        F.col("id").alias("event_id"),
        F.element_at(
            F.array(
                F.lit("init"), F.lit("add_partitions"), F.lit("add_offsets"),
                F.lit("end_commit"), F.lit("end_abort"),
            ),
            ((F.col("id") / 5).cast("int") % 5) + 1,
        ).alias("action"),
    )
    path = str(tmp_path / "txnev")
    events.repartition(5, "transactional_id").write.parquet(path)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_ops.txn_coordinator_stream(stream)
    stream_ops.run_to_memory(out, "txn_coord_out", output_mode="update")
    import pandas as pd

    snap = spark.table("txn_coord_out").toPandas()
    final = snap.groupby("transactional_id").last().reset_index()
    batch = tx.txn_state_machine(events).toPandas()
    merged = final.merge(batch, on="transactional_id", suffixes=("_s", "_b"))
    assert len(merged) == 5
    for col in ("final_state", "epochs", "n_committed", "n_aborted", "n_invalid"):
        assert (merged[f"{col}_s"] == merged[f"{col}_b"]).all(), merged


def test_group_coordinator_rebalance_stream_converges_to_batch_fold(
    tmp_path, spark, events
):
    """The DelayedJoin admission-window coordinator
    (GroupCoordinator.java:1113-1123) carried across microbatches must
    land on exactly the batch fold of the same log — including the
    coalesced generations and any group left mid-rebalance. The automaton
    is order-sensitive, so each group's events are delivered whole
    (repartition by group + one file per trigger)."""
    from starlight_for_kafka_spark.operators import groups as g

    membership = g.derive_membership_from_events(events)
    path = str(tmp_path / "membership_rb")
    membership.repartition(4, "group").write.parquet(path)
    stream = (
        spark.readStream.schema(membership.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_ops.group_coordinator_rebalance_stream(
        stream, rebalance_timeout_ms=3_600_000
    )
    stream_ops.run_to_memory(out, "rebalance_out", output_mode="update")
    got = {
        r.group: (r.generation, r.state, r.n_members, r.members, r.n_rejoining)
        for r in spark.sql("SELECT * FROM rebalance_out").collect()
    }
    batch = {
        r.group: (r.generation, r.state, r.n_members, r.members, r.n_rejoining)
        for r in g.recover_group_state_rebalance(
            membership, rebalance_timeout_ms=3_600_000
        ).collect()
    }
    assert got == batch
    # the window semantics must actually coalesce: strictly fewer
    # generations than the per-event bump model
    per_event = {
        r.group: r.generation for r in g.recover_group_state(membership).collect()
    }
    assert all(got[grp][0] < per_event[grp] for grp in got)


def test_latency_histogram_stream_converges_to_batch(tmp_path, spark, log):
    from pyspark.sql import functions as F

    from starlight_for_kafka_spark.operators.metrics import bucket_le
    from starlight_for_kafka_spark.sources.logtable import record_size
    from starlight_for_kafka_spark.streaming import stream_ops

    src = tmp_path / "histlog"
    log.df.write.parquet(str(src))
    stream = (
        spark.readStream.schema(log.df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("rec_bytes", record_size())
    )
    buckets = [9.0, 10.0, 11.0]
    hist = stream_ops.latency_histogram_stream(stream, "rec_bytes", buckets)
    stream_ops.run_to_memory(hist, "hist_out", output_mode="complete")
    got = sorted(
        (r.window.start, r.le, r.n)
        for r in spark.table("hist_out").collect()
    )
    batch = sorted(
        (r.window.start, r.le, r.n)
        for r in log.df.withColumn("rec_bytes", record_size())
        .groupBy(F.window("timestamp", "1 hour"), bucket_le("rec_bytes", buckets).alias("le"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == batch and got


def test_sketch_streams_converge_to_batch(tmp_path, spark, log):
    from pyspark.sql import functions as F

    from starlight_for_kafka_spark.functions.hashing import md5_hash64
    from starlight_for_kafka_spark.operators.skew import _cm_positions
    from starlight_for_kafka_spark.streaming import stream_ops

    src = tmp_path / "sketchlog"
    log.df.write.parquet(str(src))

    def stream():
        return (
            spark.readStream.schema(log.df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withColumn("k", F.col("key").cast("string"))
        )

    batch_df = log.df.withColumn("k", F.col("key").cast("string"))

    hll = stream_ops.hll_registers_stream(stream(), "k")
    stream_ops.run_to_memory(hll, "hll_regs", output_mode="complete")
    got = sorted(
        (r.window.start, r.idx, r.M) for r in spark.table("hll_regs").collect()
    )
    h = md5_hash64(F.col("k"))
    suffix = h.bitwiseAND(F.lit((1 << 52) - 1))
    rho = F.when(suffix == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.regexp_replace(F.bin(suffix), "^0+", ""))
    )
    want = sorted(
        (r.window.start, r.idx, r.M)
        for r in batch_df.groupBy(
            F.window("timestamp", "1 hour"),
            F.shiftrightunsigned(h, 52).alias("idx"),
        )
        .agg(F.max(rho).alias("M"))
        .collect()
    )
    assert got == want and got

    cm = stream_ops.cm_sketch_stream(stream(), "k")
    stream_ops.run_to_memory(cm, "cm_out", output_mode="complete")
    got_cm = sorted(
        (r.window.start, r.row, r.col, r.c)
        for r in spark.table("cm_out").collect()
    )
    want_cm = sorted(
        (r.window.start, r.row, r.col, r.c)
        for r in batch_df.select(
            "timestamp", _cm_positions("k", 1024, 4).alias("e")
        )
        .groupBy(
            F.window("timestamp", "1 hour"),
            F.col("e.row").alias("row"),
            F.col("e.col").alias("col"),
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert got_cm == want_cm and got_cm


def test_offsets_wire_recovery_stream_converges_to_batch(tmp_path, spark, events):
    """The streaming byte-level recovery over several microbatches (keys
    deliberately SPLIT across batches — the fold is a max, order-free)
    must converge to the batch recover_offsets_from_wire view, including
    tombstone deletion."""
    import datetime

    from pyspark.sql import functions as F

    from starlight_for_kafka_spark.operators import groups as g

    commits = g.derive_commits_from_events(events).limit(400)
    # tombstone one key's latest record: group g1 partition 3
    tomb = (F.col("group") == "g1") & (F.col("partition") == 3)
    latest_ts = (
        commits.filter(tomb).agg(F.max("commit_ts")).first()[0]
        or datetime.datetime(2024, 1, 1)
    )
    extra = spark.createDataFrame(
        [("g1", "events", 3, 10**9, "del",
          latest_ts + datetime.timedelta(days=1), True)],
        "group string, topic string, partition int, offset long, "
        "metadata string, commit_ts timestamp, tomb boolean",
    )
    typed = commits.withColumn("tomb", F.lit(False)).unionByName(extra)
    records = g.encode_offsets_topic(typed, tombstone_col="tomb")
    path = str(tmp_path / "wire_records")
    records.repartition(5).write.parquet(path)  # keys split across batches

    stream = (
        spark.readStream.schema(records.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_ops.offsets_wire_recovery_stream(stream)
    stream_ops.run_to_memory(out, "wire_out", output_mode="update")
    rows = spark.sql("SELECT * FROM wire_out").collect()
    final = {}
    for r in rows:  # memory sink appends; last emission per key wins
        final[(r.group, r.topic, r.partition)] = r
    streamed = {
        k: (r.offset, r.metadata, r.commit_ts_ms)
        for k, r in final.items()
        if not r.deleted
    }
    batch = {
        (r.group, r.topic, r.partition): (
            r.offset, r.metadata,
            int(r.commit_ts.timestamp() * 1000),
        )
        for r in g.recover_offsets_from_wire(records).collect()
    }
    assert ("g1", "events", 3) not in streamed  # tombstoned key gone
    assert streamed == batch and len(batch) > 0


def test_dedup_stream_digest_no_separator_collision(tmp_path, spark):
    """key=b'a|'/value=b'b' and key=b'a'/value=b'|b' are DISTINCT records;
    a raw concat digest collided them and silently dropped one."""
    import datetime

    rows = [
        (b"a|", b"b", [], datetime.datetime(2024, 1, 1), 0, 0),
        (b"a", b"|b", [], datetime.datetime(2024, 1, 1), 0, 1),
        (b"a", b"|b", [], datetime.datetime(2024, 1, 1), 0, 2),  # true dup
        (b"", b"x", [], datetime.datetime(2024, 1, 1), 0, 3),
        (None, b"x", [], datetime.datetime(2024, 1, 1), 0, 4),  # NULL != b''
    ]
    df = spark.createDataFrame(
        rows,
        "key binary, value binary, headers array<struct<key:string,value:binary>>, "
        "timestamp timestamp, partition int, offset long",
    )
    path = str(tmp_path / "dd")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = stream_ops.dedup_stream(stream)
    stream_ops.run_to_memory(out, "dd_out", output_mode="append")
    kept = sorted(r.offset for r in spark.sql("SELECT * FROM dd_out").collect())
    assert len(kept) == 4 and 0 in kept and 3 in kept and 4 in kept


def test_offsets_wire_recovery_stream_without_append_ts(tmp_path, spark):
    """A raw (key, value)-only dump (no append_ts column) must recover via
    the embedded commit timestamp, mirroring the batch twin's fallback."""
    import datetime

    from pyspark.sql import functions as F

    from starlight_for_kafka_spark.operators import groups as g

    ts = datetime.datetime(2024, 1, 1)
    commits = spark.createDataFrame(
        [("g0", "t", 0, 5, "old", ts), ("g0", "t", 0, 9, "new",
          ts + datetime.timedelta(hours=1))],
        "group string, topic string, partition int, offset long, "
        "metadata string, commit_ts timestamp",
    )
    records = g.encode_offsets_topic(commits).drop("append_ts")
    path = str(tmp_path / "raw_records")
    records.write.parquet(path)
    stream = spark.readStream.schema(records.schema).parquet(path)
    out = stream_ops.offsets_wire_recovery_stream(stream)
    stream_ops.run_to_memory(out, "raw_wire_out", output_mode="update")
    rows = spark.sql("SELECT * FROM raw_wire_out").collect()
    assert len(rows) == 1 and rows[0].offset == 9 and rows[0].metadata == "new"


def test_txn_coordinator_timeout_stream_aborts_dead_producer(tmp_path, spark):
    """A producer that goes silent mid-transaction must be aborted by the
    event-time state timeout once the watermark passes its deadline — the
    streaming twin of tx.abort_timed_out_transactions; a live producer
    whose events keep arriving is untouched."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ev(tid, i, action, minutes):
        return (tid, t0 + datetime.timedelta(minutes=minutes), i, action)

    schema = "transactional_id string, ts timestamp, event_id long, action string"
    # batch 1: dead goes Ongoing then vanishes; chatty goes Ongoing and
    # will KEEP adding; alive merely inits (Empty never aborts on timeout)
    b1 = [ev("dead", 1, "init", 0), ev("dead", 2, "add_partitions", 1),
          ev("chatty", 7, "init", 0), ev("chatty", 8, "add_partitions", 1),
          ev("alive", 3, "init", 0)]
    # batch 2: alive completes a txn 2h later -> watermark jumps past the
    # 30-minute deadlines for the NEXT batch; chatty adds again at 100min
    # — under a (wrong) last-event-anchored deadline that would re-arm to
    # 130min > the 121min watermark and never fire, while the START-
    # anchored deadline stays at 31min (txnStartTimestamp semantics)
    b2 = [ev("chatty", 9, "add_partitions", 100),
          ev("alive", 4, "add_partitions", 120), ev("alive", 5, "end_commit", 121)]
    # batch 3: runs with watermark=121min > both 31min deadlines -> fire
    b3 = [ev("alive", 6, "noop", 180)]
    path = str(tmp_path / "txn_timeout_events")
    for i, rows in enumerate([b1, b2, b3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        # one file per batch, in order
        import glob as _glob, os as _os
        fs = sorted(_glob.glob(path + "/part-*"), key=_os.path.getmtime)
        _os.rename(fs[-1], _os.path.join(path, f"batch-{i}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_ops.txn_coordinator_timeout_stream(stream, timeout_ms=30 * 60_000)
    stream_ops.run_to_memory(out, "txn_timeout_out", output_mode="update")
    rows = spark.sql("SELECT * FROM txn_timeout_out").collect()
    final = {}
    for r in rows:  # update mode appends to memory sink; last emission wins
        final[r.transactional_id] = r
    assert final["dead"].final_state == "CompleteAbort"
    assert final["dead"].n_aborted == 1 and final["dead"].epochs == 1
    # the deadline anchors at txn START: a producer that keeps adding
    # partitions past its timeout still aborts at start + timeout
    assert final["chatty"].final_state == "CompleteAbort"
    assert final["chatty"].n_aborted == 1 and final["chatty"].epochs == 1
    assert final["alive"].final_state == "CompleteCommit"
    assert final["alive"].n_committed == 1 and final["alive"].n_aborted == 0


def test_txn_timeout_stream_stale_timeout_emits_nothing(tmp_path, spark):
    """A transaction that completes AFTER its start+timeout deadline was
    armed leaves the (un-clearable) event-time timeout registered; when
    the watermark later crosses it, the stale fire must be a true no-op —
    no state change AND no re-emitted snapshot row (a duplicate here
    double-counts in downstream consumers of the update stream)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ev(tid, i, action, minutes):
        return (tid, t0 + datetime.timedelta(minutes=minutes), i, action)

    schema = "transactional_id string, ts timestamp, event_id long, action string"
    # b1: t goes Ongoing -> deadline armed at start(0min)+30min = 30min
    b1 = [ev("t", 1, "init", 0), ev("t", 2, "add_partitions", 1)]
    # b2: t commits at 5min (before the deadline passes); w's init at
    # 120min drags the watermark far past t's stale 30min deadline
    b2 = [ev("t", 3, "end_commit", 5), ev("w", 4, "init", 120)]
    # b3: runs with watermark=120min -> t's stale timeout fires
    b3 = [ev("w", 5, "noop", 180)]
    path = str(tmp_path / "txn_stale_events")
    import glob as _glob, os as _os
    for i, rows in enumerate([b1, b2, b3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        fs = sorted(_glob.glob(path + "/part-*"), key=_os.path.getmtime)
        _os.rename(fs[-1], _os.path.join(path, f"batch-{i}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_ops.txn_coordinator_timeout_stream(stream, timeout_ms=30 * 60_000)
    stream_ops.run_to_memory(out, "txn_stale_out", output_mode="update")
    rows = spark.sql("SELECT * FROM txn_stale_out").collect()
    t_rows = [r for r in rows if r.transactional_id == "t"]
    # exactly the two REAL transitions (Ongoing, CompleteCommit) — the
    # stale fire in b3 must not re-emit the b2 snapshot
    assert [r.final_state for r in t_rows] == ["Ongoing", "CompleteCommit"]
    assert t_rows[-1].n_committed == 1 and t_rows[-1].n_aborted == 0


def test_txn_id_expiry_stream_purges_idle_ids(tmp_path, spark):
    """With id_expiration_ms on, an idle non-Ongoing id times out into the
    terminal Dead state and its coordinator state REMOVES — a later event
    for the id rebuilds from scratch (fresh epoch, counters reset),
    proving the purge actually happened (TransactionConfig
    transactionalIdExpirationMs; streaming twin of
    tx.expire_transactional_ids)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ev(tid, i, action, minutes):
        return (tid, t0 + datetime.timedelta(minutes=minutes), i, action)

    schema = "transactional_id string, ts timestamp, event_id long, action string"
    b1 = [ev("gone", 1, "init", 0), ev("gone", 2, "add_partitions", 1),
          ev("gone", 3, "end_commit", 2), ev("keeper", 4, "init", 0)]
    # keeper completes a txn at 150min -> watermark jumps past gone's
    # 62min expiry deadline (last activity 2min + 60min horizon)
    b2 = [ev("keeper", 5, "add_partitions", 150), ev("keeper", 6, "end_commit", 151)]
    b3 = [ev("keeper", 7, "noop", 240)]      # gone expires here (wm=151)
    b4 = [ev("gone", 8, "init", 300)]        # rebuilds from scratch
    path = str(tmp_path / "txn_expiry_events")
    import glob as _glob, os as _os
    for i, rows in enumerate([b1, b2, b3, b4]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        fs = sorted(_glob.glob(path + "/part-*"), key=_os.path.getmtime)
        _os.rename(fs[-1], _os.path.join(path, f"batch-{i}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_ops.txn_coordinator_timeout_stream(
        stream, timeout_ms=30 * 60_000, id_expiration_ms=60 * 60_000
    )
    stream_ops.run_to_memory(out, "txn_expiry_out", output_mode="update")
    rows = spark.sql("SELECT * FROM txn_expiry_out").collect()
    gone = [r for r in rows if r.transactional_id == "gone"]
    states = [r.final_state for r in gone]
    assert "Dead" in states  # the terminal expiry emission
    # the post-purge rebuild starts from scratch: epoch 1, counters reset
    assert states[-1] == "Empty"
    assert gone[-1].epochs == 1 and gone[-1].n_committed == 0
    # before expiry the id HAD a committed txn — proves state was purged,
    # not merely relabeled
    assert any(r.n_committed == 1 for r in gone)
    keeper = [r for r in rows if r.transactional_id == "keeper"]
    assert keeper[-1].final_state == "CompleteCommit"


def test_knn_serving_stream_equals_batch(tmp_path, spark):
    """The streaming serving twin: queries arriving in microbatches get
    EXACTLY the batch knn_join result (stateless by construction), and
    the corpus bucket pass is computed once, not per batch."""
    from starlight_for_kafka_spark import load_table
    from starlight_for_kafka_spark.operators import similarity
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    q_batch = (
        emb.filter(F.col("vec_id") % 5 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    corpus = emb.filter(F.col("vec_id") % 5 != 0)

    qdir = str(tmp_path / "queries")
    # several files so availableNow delivers multiple microbatches
    q_batch.repartition(4).write.parquet(qdir)
    stream = (
        spark.readStream.schema(q_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )
    got: list = []
    qry = stream_ops.knn_serving_stream(
        stream,
        corpus,
        lambda df, epoch: got.extend(
            (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in df.collect()
        ),
        checkpoint=str(tmp_path / "ckpt"),
        k=3,
        n_planes=4,
    )
    qry.awaitTermination(120)
    expect = sorted(
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in similarity.knn_join(
            q_batch, corpus, k=3, method="lsh", n_planes=4
        ).collect()
    )
    assert sorted(got) == expect


def test_incremental_ingest_stream_rejects_mismatched_index_params(
    tmp_path, spark
):
    """The at-rest (digest, signature) index is valid only for the exact
    shingle parameters it was built with — a changed shingle_k yields
    same-LENGTH signatures whose buckets never match, silently admitting
    every duplicate. The _PARAMS.json guard must refuse the probe."""
    import pytest

    qdir = tmp_path / "in"
    qdir.mkdir()
    schema = "doc_id int, text string"
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], schema
    ).coalesce(1).write.parquet(str(qdir / "b0"))
    corpus_dir = str(tmp_path / "corpus")

    def run(ck, shingle_k):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(qdir / "*"))
        )
        q = stream_ops.incremental_ingest_stream(
            stream, corpus_dir, checkpoint=str(tmp_path / ck),
            shingle_k=shingle_k, threshold=0.6, shingle_mode="word",
        )
        q.awaitTermination(120)

    run("ck1", shingle_k=3)
    assert (tmp_path / "corpus_index" / "_PARAMS.json").exists()
    with pytest.raises(Exception, match="built with"):
        run("ck2", shingle_k=2)


def test_incremental_ingest_stream_grows_corpus_and_drops_cross_batch_dups(
    tmp_path, spark
):
    """Recurring-crawl loop: batch 2's near-dup of a batch-1 survivor is
    dropped against the GROWN corpus; replaying an epoch is a no-op; the
    final corpus equals applying the same steps sequentially in batch."""
    from starlight_for_kafka_spark.operators import dedup as dedup_ops

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows_b1 = [(1, base), (2, "completely different content about spark engines here")]
    rows_b2 = [
        (10, base + " tail"),                       # near-dup of doc 1 -> drop
        (11, "fresh snapshot document with novel words entirely new"),
    ]
    rows_b3 = [
        (20, "fresh snapshot document with novel words entirely new"),  # exact of 11 -> drop
        (21, "a third batch brings one more genuinely new document in"),
    ]
    qdir = tmp_path / "incoming"
    qdir.mkdir()
    schema = "doc_id int, text string"
    for i, rows in enumerate([rows_b1, rows_b2, rows_b3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(qdir / f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir / "*"))
    )
    corpus_dir = str(tmp_path / "corpus")
    q = stream_ops.incremental_ingest_stream(
        stream,
        corpus_dir,
        checkpoint=str(tmp_path / "ckpt"),
        shingle_k=3,
        threshold=0.6,
        shingle_mode="word",
    )
    q.awaitTermination(180)
    final = spark.read.parquet(corpus_dir + "/*")
    ids = sorted(r.doc_id for r in final.select("doc_id").collect())
    # microbatch order isn't guaranteed to match file order, so derive the
    # expectation by applying the batch operators in the SAME admission
    # order the stream used (one epoch dir per microbatch)
    import os

    admitted: list[int] = []
    corpus = None
    for epoch in sorted(
        d for d in os.listdir(corpus_dir) if d.startswith("epoch=")
    ):
        admitted.extend(
            r.doc_id
            for r in spark.read.parquet(os.path.join(corpus_dir, epoch)).collect()
        )
    assert sorted(admitted) == ids
    # cross-batch semantics: 10 (near-dup of 1) and exactly one of {11, 20}
    # (exact duplicates across batches) must be gone
    assert 1 in ids and 2 in ids and 21 in ids
    assert 10 not in ids
    assert (11 in ids) != (20 in ids)
