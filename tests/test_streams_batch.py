"""Batch forms of the Kafka Streams workloads (KStreamAggregationTest,
KTableTest, GlobalKTableTest) checked against hand oracles."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from starlight_for_kafka_spark.operators import ktable, windows


def _kv(spark, rows):
    return spark.createDataFrame(rows, "key string, value string, ts timestamp")


T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _t(ms):
    return T0 + datetime.timedelta(milliseconds=ms)


def test_keyed_count_and_reduce(spark):
    df = _kv(
        spark,
        [("A", "a", _t(0)), ("A", "b", _t(10)), ("B", "c", _t(20)), ("B", "d", _t(30)), ("B", "e", _t(40))],
    )
    counts = {r.key: r.cnt for r in windows.keyed_count(df, "key").collect()}
    assert counts == {"A": 2, "B": 3}
    # reduce = concat in ts order (deterministic associative-with-order reduce)
    red = windows.keyed_reduce(
        df,
        ["key"],
        [F.concat_ws("+", F.array_sort(F.collect_list(F.struct("ts", "value")).getField("value"))).alias("reduced")],
    )
    out = {r.key: r.reduced for r in red.collect()}
    assert out == {"A": "a+b", "B": "c+d+e"}


def test_tumbling_window_count(spark):
    # 500ms windows as in KStreamAggregationTest.java:178
    df = _kv(
        spark,
        [("A", "a", _t(0)), ("A", "b", _t(499)), ("A", "c", _t(500)), ("B", "d", _t(999)), ("B", "e", _t(1000))],
    )
    out = windows.tumbling_window_agg(
        df, "ts", "500 milliseconds", ["key"], [F.count("*").alias("cnt")]
    )
    got = {(r.key, r.window_start_ms - int(T0.timestamp() * 1000)): r.cnt for r in out.collect()}
    assert got == {("A", 0): 2, ("A", 500): 1, ("B", 500): 1, ("B", 1000): 1}


def test_session_window_count_and_reduce(spark):
    # gap 300ms: A events at 0,100,200 (one session), 900,1000 (second)
    df = _kv(
        spark,
        [
            ("A", "a", _t(0)), ("A", "b", _t(100)), ("A", "c", _t(200)),
            ("A", "d", _t(900)), ("A", "e", _t(1000)),
            ("B", "x", _t(50)),
        ],
    )
    out = windows.session_window_agg(
        df, ["key"], "ts", 300, [F.count("*").alias("cnt")]
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append((r.session_start_ms, r.session_end_ms, r.cnt))
    a = sorted(by_key["A"])
    base = int(T0.timestamp() * 1000)
    assert [(s - base, e - base, c) for s, e, c in a] == [(0, 200, 3), (900, 1000, 2)]
    assert len(by_key["B"]) == 1 and by_key["B"][0][2] == 1


def test_ktable_latest_and_tombstone(spark):
    rows = [
        ("k1", "v1", 0, 0), ("k1", "v2", 0, 5), ("k2", "w1", 1, 0),
        ("k3", "gone", 0, 1), ("k3", None, 0, 7),  # tombstone deletes k3
    ]
    log = spark.createDataFrame(rows, "key string, value string, partition int, offset long")
    out = {r.key: r.value for r in ktable.ktable_latest(log, ["key"]).collect()}
    assert out == {"k1": "v2", "k2": "w1"}


def test_global_ktable_join_inner_and_left(spark):
    clicks = spark.createDataFrame(
        [(1, "c1"), (2, "c2"), (9, "c9")], "user_key long, click string"
    )
    regions = spark.createDataFrame(
        [("u1", "EU"), ("u2", "US")], "region_key string, region string"
    )
    mapper = F.concat(F.lit("u"), F.col("user_key").cast("string"))
    inner = ktable.stream_global_table_join(clicks, regions, mapper, "region_key", "inner")
    assert {(r.click, r.region) for r in inner.collect()} == {("c1", "EU"), ("c2", "US")}
    left = ktable.stream_global_table_join(clicks, regions, mapper, "region_key", "left")
    got = {(r.click, r.region) for r in left.collect()}
    assert got == {("c1", "EU"), ("c2", "US"), ("c9", None)}
    # the join must be broadcast (no shuffle of the stream side)
    assert "BroadcastHashJoin" in inner._jdf.queryExecution().executedPlan().toString()


def test_as_of_join_semantics(spark):
    """Inclusive <= match, null when no prior right row, per-key isolation,
    and the column-collision guard."""
    import datetime

    import pytest
    from starlight_for_kafka_spark.operators.asof import as_of_join

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, "u1", t(10)), (2, "u1", t(5)), (3, "u2", t(10)), (4, "u3", t(10))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", t(5), 100), ("u1", t(9), 101), ("u2", t(10), 200), ("u2", t(11), 201)],
        "user_id string, ts timestamp, rid long",
    )
    out = {
        r.event_id: r.rid
        for r in as_of_join(left, right, ["user_id"], "ts", "ts", ["rid"]).collect()
    }
    assert out[1] == 101  # latest prior (9 < 10)
    assert out[2] == 100  # equal timestamp is inclusive
    assert out[3] == 200  # equal ts on another key; later row (11) excluded
    assert out[4] is None  # no right rows for u3

    with pytest.raises(ValueError, match="collide"):
        as_of_join(left, right.withColumnRenamed("rid", "event_id"), ["user_id"])


def test_interval_join_window_bounds(spark):
    left = spark.createDataFrame(
        [("A", 1, _t(1000)), ("A", 2, _t(5000)), ("B", 3, _t(1000))],
        "k string, lid int, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", 10, _t(0)), ("A", 11, _t(1500)), ("A", 12, _t(4000)),
         ("B", 13, _t(3000)), ("C", 14, _t(1000))],
        "k string, rid int, r_ts timestamp",
    )
    # right in [left - 1s, left + 0.5s]
    out = windows.interval_join(
        left, right, ["k"], "l_ts", "r_ts", before_ms=1000, after_ms=500
    )
    pairs = {(r.lid, r.rid) for r in out.collect()}
    # lid=1 @1000: window [0,1500] -> rids 10,11; lid=2 @5000: [4000,5500] -> 12
    # B lid=3 @1000: [0,1500] -> no B right in range; C unmatched key
    assert pairs == {(1, 10), (1, 11), (2, 12)}
    # bounds are inclusive on both ends
    edge = windows.interval_join(
        left.filter("lid = 1"), right, ["k"], "l_ts", "r_ts", 1000, 500
    ).collect()
    assert {r.rid for r in edge} == {10, 11}
    # left-outer keeps unmatched left rows with nulls
    louter = windows.interval_join(
        left, right, ["k"], "l_ts", "r_ts", 0, 0, how="left"
    )
    assert louter.filter("rid IS NULL").count() == 3


def test_stream_table_join_versioned_semantics(spark):
    """KStream ⋈ KTable: each stream record sees the changelog value as of
    its event time; inner drops records before the first table update."""
    from starlight_for_kafka_spark.operators.ktable import stream_table_join

    stream = spark.createDataFrame(
        [("u1", 5, "s1"), ("u1", 15, "s2"), ("u1", 25, "s3"), ("u2", 10, "s4")],
        ["user", "ts", "sid"],
    )
    changelog = spark.createDataFrame(
        [("u1", 10, "v1"), ("u1", 20, "v2")], ["user", "ts", "val"]
    )
    inner = {
        (r.sid): r.val
        for r in stream_table_join(
            stream, changelog, ["user"], "ts", "ts", ["val"], how="inner"
        ).collect()
    }
    # s1 precedes any table value -> dropped; s2 sees v1; s3 sees v2; u2 has no state
    assert inner == {"s2": "v1", "s3": "v2"}
    left = {
        r.sid: r.val
        for r in stream_table_join(
            stream, changelog, ["user"], "ts", "ts", ["val"], how="left"
        ).collect()
    }
    assert left == {"s1": None, "s2": "v1", "s3": "v2", "s4": None}


def test_cogroup_single_shuffle_and_state(spark):
    from starlight_for_kafka_spark.operators.windows import cogroup_aggregate
    from starlight_for_kafka_spark.plans.inspect import exchange_count

    a = spark.createDataFrame([("u1", 1.0), ("u1", 2.0), ("u2", 5.0)], ["k", "value"])
    b = spark.createDataFrame([("u1", 10.0)], ["k", "value"])
    out = cogroup_aggregate({"a": a, "b": b}, ["k"])
    rows = {r.k: r for r in out.collect()}
    assert (rows["u1"].a_count, rows["u1"].a_sum, rows["u1"].b_count, rows["u1"].b_sum) == (2, 3.0, 1, 10.0)
    assert (rows["u2"].a_count, rows["u2"].b_count, rows["u2"].b_sum) == (1, 0, None)
    assert rows["u1"].total_count == 3
    # one shuffle for N streams, not N
    assert exchange_count(out) == 1


def test_as_of_forward_semantics(spark):
    from starlight_for_kafka_spark.operators.asof import as_of_join_forward

    left = spark.createDataFrame(
        [("u", 10, "l1"), ("u", 20, "l2"), ("u", 30, "l3")], ["k", "ts", "lid"]
    )
    right = spark.createDataFrame(
        [("u", 20, "r20"), ("u", 25, "r25")], ["k", "ts", "val"]
    )
    out = {
        r.lid: r.val
        for r in as_of_join_forward(left, right, ["k"], "ts", "ts", ["val"]).collect()
    }
    # inclusive >=: l2@20 sees r20; l3@30 has no later right -> null
    assert out == {"l1": "r20", "l2": "r20", "l3": None}


def test_stream_table_join_inner_keeps_null_payload_match(spark):
    """A matched changelog row whose payload field is legitimately NULL
    must survive the inner join; only truly unmatched stream rows drop."""
    import datetime

    from starlight_for_kafka_spark.operators.ktable import stream_table_join

    t = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    stream = spark.createDataFrame(
        [("k1", t(5), "e1"), ("k2", t(5), "e2"), ("k3", t(5), "e3")],
        "k string, ts timestamp, event string",
    )
    changelog = spark.createDataFrame(
        [("k1", t(1), None), ("k2", t(2), "v2"), ("k3", t(9), "late")],
        "k string, ts timestamp, val string",
    )
    out = stream_table_join(stream, changelog, ["k"], how="inner")
    got = {r.k: r.val for r in out.collect()}
    # k1 matched (null payload) → kept; k2 matched → kept; k3's only
    # changelog row is in the future → no as-of match → dropped
    assert got == {"k1": None, "k2": "v2"}


def test_ktable_fk_join_semantics(spark):
    """KIP-213: result keyed by left PK; null FK never matches (dropped on
    inner, null payload on left); matched right rows may carry null payload."""
    left = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y"), (3, None, "z"), (4, 99, "w")],
        "pk int, fk int, lv string",
    )
    right = spark.createDataFrame(
        [(10, "ten"), (20, None)], "rk int, rv string"
    )
    out_left = {
        r.pk: (r.rv, r.matched)
        for r in ktable.ktable_fk_join(left, right, "fk", "rk", how="left")
        .withColumn("matched", F.col("rv").isNotNull())
        .collect()
    }
    assert out_left[1] == ("ten", True)
    assert out_left[2] == (None, False)  # matched but payload is null...
    # ...which is why inner must use the marker, not payload nullability:
    inner = ktable.ktable_fk_join(left, right, "fk", "rk", how="inner")
    assert sorted(r.pk for r in inner.collect()) == [1, 2]
    assert out_left[3] == (None, False)  # null FK -> no subscription
    assert out_left[4] == (None, False)  # dangling FK


def test_ktable_fk_join_broadcast_plan(spark):
    left = spark.range(100).select(
        F.col("id").alias("pk"), (F.col("id") % 10).alias("fk")
    )
    right = spark.range(10).select(F.col("id").alias("rk"), F.lit("v").alias("rv"))
    plan = ktable.ktable_fk_join(
        left, right, "fk", "rk", broadcast_right=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_suppress_final_grace_boundary(spark):
    """Stream time = 02:30. 1h windows, 30min grace: [00,01) closes at
    01:30 <= 02:30 -> emitted; [01,02) closes at 02:30 <= 02:30 -> emitted;
    [02,03) closes at 03:30 -> withheld."""
    df = _kv(
        spark,
        [
            ("A", "a", _t(0)),
            ("A", "b", _t(3_600_000)),
            ("A", "c", _t(2 * 3_600_000 + 1_800_000)),
        ],
    )
    out = windows.suppress_final(
        df, "ts", "1 hour", ["key"], [F.count("*").alias("cnt")], grace_ms=1_800_000
    )
    starts = sorted(r.window_start_ms for r in out.collect())
    base = int(T0.timestamp() * 1000)
    assert starts == [base, base + 3_600_000]


def test_branch_first_match_wins_and_drop(spark):
    df = spark.createDataFrame(
        [(1, "purchase", 900.0), (2, "view", 600.0), (3, "view", 10.0)],
        "id int, event_type string, value double",
    )
    preds = [
        ("purchase", F.col("event_type") == "purchase"),
        ("big", F.col("value") >= 500),
    ]
    out = {r.id: r.branch for r in windows.branch_streams(df, preds).collect()}
    # id=1 satisfies BOTH predicates -> first declared wins
    assert out == {1: "purchase", 2: "big"}  # id=3 dropped (no default)
    with_default = {
        r.id: r.branch
        for r in windows.branch_streams(df, preds, default="rest").collect()
    }
    assert with_default[3] == "rest"


def test_merge_streams_union(spark):
    a = _kv(spark, [("A", "a", _t(0))])
    b = _kv(spark, [("B", "b", _t(1))])
    assert windows.merge_streams(a, b).count() == 2


def test_table_aggregate_counts_current_table_not_updates(spark):
    """KGroupedTable semantics: only the LATEST value per key counts —
    an upsert must move the key between groups, never double-count (the
    retraction the Streams subtractor exists for)."""
    from pyspark.sql import functions as F

    from starlight_for_kafka_spark.operators.ktable import table_aggregate

    rows = [
        # key k1: v short then LONG (group by value length parity)
        ("k1", "aa", 0, 0), ("k1", "bbb", 0, 1),
        # key k2: single value
        ("k2", "cc", 0, 2),
        # key k3: tombstone deletes it
        ("k3", "dd", 0, 3), ("k3", None, 0, 4),
    ]
    log = spark.createDataFrame(
        rows, "key string, value string, partition int, offset long"
    )
    out = {
        r.grp: r.n for r in table_aggregate(
            log, ["key"],
            group_key=[(F.length("value") % 2).alias("grp")],
            aggs=[F.count("*").alias("n")],
        ).collect()
    }
    # k1 counts ONCE, in its latest group (len 3 -> odd); k2 in even;
    # k3 is gone entirely
    assert out == {1: 1, 0: 1}


def test_stream_table_join_null_update_is_visible_not_resurrected(spark):
    """A changelog update that sets a field to NULL must be what stream
    records see as of that time — per-column carry would resurrect the
    previous version's value (and mix fields across versions)."""
    from starlight_for_kafka_spark.operators.ktable import stream_table_join

    _t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    changelog = spark.createDataFrame(
        [("k1", _t(1), "v1", 1), ("k1", _t(3), None, 2)],
        "key string, ts timestamp, val string, ver int",
    )
    stream = spark.createDataFrame(
        [("k1", _t(2), "e1"), ("k1", _t(5), "e2")],
        "key string, ts timestamp, ev string",
    )
    out = {r.ev: (r.val, r.ver, r["__matched"] if "__matched" in r else True)
           for r in stream_table_join(
               stream, changelog, ["key"], payload=["val", "ver"], how="left"
           ).collect()}
    assert out["e1"][0] == "v1" and out["e1"][1] == 1
    # as of t5 the table row is version 2 with val=NULL — both fields from
    # the SAME version, never (val='v1', ver=2)
    assert out["e2"][0] is None and out["e2"][1] == 2
