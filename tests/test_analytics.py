"""Behavioral-analytics operators: ordered funnel and cohort retention."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from starlight_for_kafka_spark.operators import analytics, dedup


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_funnel_ordering_and_chain_break(spark):
    rows = [
        # u1 completes in order
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # u2 clicks BEFORE viewing -> chain breaks at step 2
        (2, _ts(1), "click"),
        (2, _ts(2), "view"),
        (2, _ts(3, 1), "purchase"),  # purchase without a later click
        # u3 never views -> absent from output
        (3, _ts(1), "click"),
        # u4: click at the SAME instant as view must NOT count (strict >)
        (4, _ts(1), "view"),
        (4, _ts(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.user_id: r for r in analytics.funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].steps_completed == 3
    assert out[1].step_1 < out[1].step_2 < out[1].step_3
    assert out[2].steps_completed == 1 and out[2].step_2 is None and out[2].step_3 is None
    assert out[4].steps_completed == 1 and out[4].step_2 is None


def test_funnel_picks_earliest_valid_step(spark):
    rows = [
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(4), "click"),  # later click must not win
        (1, _ts(3), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = analytics.funnel(df, ["view", "click", "purchase"]).collect()[0]
    assert r.step_2 == _ts(2) and r.step_3 == _ts(3)


def test_cohort_retention_matrix(spark):
    rows = [
        # cohort week of Jan 1 (Monday): u1 active weeks 0 and 2, u2 week 0 only
        (1, _ts(2)),
        (1, _ts(16)),
        (2, _ts(3)),
        # cohort week of Jan 8: u3 active weeks 0 and 1
        (3, _ts(9)),
        (3, _ts(17)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in analytics.cohort_retention(df).collect()}
    w1 = datetime.date(2024, 1, 1)
    w2 = datetime.date(2024, 1, 8)
    assert out == {(w1, 0): 2, (w1, 2): 1, (w2, 0): 1, (w2, 1): 1}


def test_duplicated_ngram_fraction_flags_copies(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    rows = [
        (1, base + " iota kappa"),        # shares the leading 8-gram with doc 2
        (2, base + " lambda mu"),
        (3, "one two three four five six seven eight nine"),  # unique grams
        (4, "short doc"),                  # < 8 words -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.duplicated_ngram_fraction(df, ngram_k=8).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].dup_grams == 1 and out[2].dup_grams == 1
    assert out[1].n_grams == 3  # 10 words -> 3 distinct 8-grams
    assert out[3].dup_grams == 0 and out[3].dup_frac == 0.0
    assert abs(out[1].dup_frac - 1 / 3) < 1e-12


def test_funnel_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), "view")], "user_id long, ts timestamp, event_type string"
    )
    plan = analytics.funnel(df, ["view", "click"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_ts_similarity_exact_match_ranks_first(spark):
    from starlight_for_kafka_spark.operators.analytics import ts_similarity_search

    rows = []
    # u1: series containing the exact pattern [1,2,3] ending at t=4
    for t, v in enumerate([5, 5, 1, 2, 3, 5]):
        rows.append(("u1", t, v))
    # u2: a near miss [1,2,4] ending at t=2
    for t, v in enumerate([1, 2, 4]):
        rows.append(("u2", t, v))
    series = spark.createDataFrame(rows, ["user_id", "day", "cnt"])
    out = ts_similarity_search(series, [1, 2, 3], k=2).collect()
    assert (out[0].user_id, out[0].day, out[0].dist2) == ("u1", 4, 0)
    assert (out[1].user_id, out[1].day, out[1].dist2) == ("u2", 2, 1)


def test_active_users_rolling_window_semantics(spark):
    import datetime

    from starlight_for_kafka_spark.operators.analytics import active_users

    t = datetime.datetime
    rows = [
        ("u1", t(2024, 1, 1)), ("u2", t(2024, 1, 1)),
        ("u1", t(2024, 1, 3)),
        ("u3", t(2024, 1, 10)),  # u1/u2 aged out of the 7-day window by now
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {str(r.day): (r.dau, r.wau) for r in active_users(df).collect()}
    assert out == {
        "2024-01-01": (2, 2),
        "2024-01-03": (1, 2),   # trailing window still holds u1+u2
        "2024-01-10": (1, 1),   # old users aged out
    }


def test_event_transitions_probabilities_sum_to_one(spark, events):
    from starlight_for_kafka_spark.operators import analytics

    out = analytics.event_transitions(events, order_tiebreak="event_id")
    sums = (
        out.groupBy("from_type").agg(F.sum("prob").alias("p")).collect()
    )
    assert sums and all(abs(r.p - 1.0) < 1e-9 for r in sums)
    # counts conserve: sum(cnt) == total consecutive pairs
    total = out.agg(F.sum("cnt")).collect()[0][0]
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_ts_anomaly_flags_injected_spike(spark):
    import datetime

    from starlight_for_kafka_spark.operators import analytics

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # 30 calm hours of 10 events, then one 100-event spike hour
    for h in range(30):
        n = 100 if h == 29 else 10
        for i in range(n):
            rows.append((base + datetime.timedelta(hours=h, seconds=i), "click"))
    # tiny jitter so variance is nonzero
    rows.append((base + datetime.timedelta(hours=5, seconds=70), "click"))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r.bucket_ms: r for r in analytics.ts_anomaly(df).collect()}
    spike_ms = int((base + datetime.timedelta(hours=29)).timestamp() * 1000)
    calm_ms = int((base + datetime.timedelta(hours=15)).timestamp() * 1000)
    assert out[spike_ms].anomaly is True
    assert out[calm_ms].anomaly is False
    # the scoring window excludes the bucket itself (no leakage)
    assert out[spike_ms].mean_prev < 15


def test_grouped_top_k_equals_plain_window(spark, events):
    from pyspark.sql import Window

    from starlight_for_kafka_spark.operators import skew

    out = skew.grouped_top_k(
        events,
        ["event_type"],
        [F.col("value").desc(), F.col("event_id").asc()],
        5,
        n_salts=8,
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    plain = (
        events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    cols = ["event_type", "event_id", "rank"]
    assert sorted(map(tuple, out.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_ts_anomaly_gap_hours_surface_as_zero_count_anomalies(spark):
    """A metric that silently drops to nothing mid-series must emit
    zero-count bucket rows (negative z), not stretch the trailing window
    across the gap (r2 ADVICE fix)."""
    import datetime

    from starlight_for_kafka_spark.operators.analytics import ts_anomaly

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # steady 10 events/hour for 30 hours, except hour 27 is silent
    for h in range(30):
        if h == 27:
            continue
        for i in range(10):
            rows.append(("api", t0 + datetime.timedelta(hours=h, minutes=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.bucket_ms: r for r in ts_anomaly(df, z_threshold=3.0).collect()}
    assert len(out) == 30                      # densified: the gap row exists
    gap_ms = int((t0 + datetime.timedelta(hours=27)).replace(
        tzinfo=datetime.timezone.utc).timestamp() * 1000)
    gap = out[gap_ms]
    # 24 constant predecessors -> var 0, z undefined (null); the
    # zero-variance deviation still flags
    assert gap.cnt == 0 and gap.z is None and gap.anomaly
    # steady hours stay unflagged
    assert sum(r.anomaly for r in out.values()) == 1


def test_pagerank_ring_is_uniform_and_conserves_mass(spark):
    from starlight_for_kafka_spark.operators.analytics import pagerank

    # directed 4-ring: perfectly symmetric -> stationary = uniform 1/N at
    # every iteration, so 10 power steps must return exactly 0.25 each
    ring = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "src string, dst string"
    )
    out = {r.node: r.rank for r in pagerank(ring).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    for v in out.values():
        assert abs(v - 0.25) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_star_and_dangling_redistribution(spark):
    from starlight_for_kafka_spark.operators.analytics import pagerank

    # a,b,c all point at hub; hub has NO out-edges (dangling) — its mass
    # must redistribute uniformly, total stays 1, hub ranks highest
    star = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub")], "src string, dst string"
    )
    out = {r.node: r.rank for r in pagerank(star, iterations=20).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert out["hub"] > out["a"] == out["b"] == out["c"]


def test_pagerank_weighted_edge_shifts_mass(spark):
    from starlight_for_kafka_spark.operators.analytics import pagerank

    # s splits 9:1 between x and y -> x must outrank y
    g = spark.createDataFrame(
        [("s", "x", 9.0), ("s", "y", 1.0), ("x", "s", 1.0), ("y", "s", 1.0)],
        "src string, dst string, w double",
    )
    out = {r.node: r.rank for r in pagerank(g, weight_col="w").collect()}
    assert out["x"] > out["y"]
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_pagerank_zero_out_weight_node_is_dangling(spark):
    from starlight_for_kafka_spark.operators.analytics import pagerank

    # z's only out-edge weighs 0: it must classify as dangling (mass
    # redistributed uniformly), not leak rank through NULL 0/0 shares
    g = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0), ("a", "z", 1.0), ("z", "a", 0.0)],
        "src string, dst string, w double",
    )
    out = {r.node: r.rank for r in pagerank(g, weight_col="w").collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_hll_cardinality_within_error_band_both_branches(spark):
    from starlight_for_kafka_spark.operators.analytics import hll_cardinality

    # raw-HLL regime: n >> 2.5m -> relative error ~ 1.04/sqrt(256) = 6.5%
    big = spark.range(50_000).selectExpr("cast(id as string) as v")
    r = hll_cardinality(big, "v").first()
    assert r.exact == 50_000 and abs(r.rel_err) < 0.15
    assert r.n_zero_registers == 0
    # linear-counting regime: empty registers present
    small = spark.range(80).selectExpr("cast(id as string) as v")
    s = hll_cardinality(small, "v").first()
    assert s.n_zero_registers > 0 and abs(s.rel_err) < 0.25


def test_hll_registers_merge_equals_union_sketch(spark):
    from starlight_for_kafka_spark.operators.analytics import hll_registers

    a = spark.range(0, 3000).selectExpr("cast(id as string) as v")
    b = spark.range(1500, 5000).selectExpr("cast(id as string) as v")
    union = a.unionByName(b)
    merged = (
        hll_registers(a, "v")
        .unionByName(hll_registers(b, "v"))
        .groupBy("idx")
        .agg(F.max("M").alias("M"))
    )
    direct = hll_registers(union, "v")
    got = sorted((r.idx, r.M) for r in merged.collect())
    want = sorted((r.idx, r.M) for r in direct.collect())
    assert got == want  # sketch union IS register-wise max


def test_cm_sketch_one_sided_and_mergeable(spark):
    from starlight_for_kafka_spark.operators.skew import cm_estimate, cm_sketch

    a = spark.range(5000).selectExpr("cast(id % 300 as long) as v")
    b = spark.range(5000, 9000).selectExpr("cast(id % 450 as long) as v")
    union = a.unionByName(b)
    keys = union.select("v").distinct()
    est = {r.v: r.est for r in cm_estimate(cm_sketch(union, "v"), keys, "v").collect()}
    exact = {r.v: r.n for r in
             union.groupBy("v").agg(F.count("*").alias("n")).collect()}
    # one-sided guarantee: never underestimates
    assert all(est[k] >= n for k, n in exact.items())
    # tight at this load factor (N/width ~ 9)
    assert sum(est[k] - n for k, n in exact.items()) / len(exact) < 40
    # mergeability: summed per-shard counters == whole-input sketch
    merged = (
        cm_sketch(a, "v")
        .unionByName(cm_sketch(b, "v"))
        .groupBy("row", "col")
        .agg(F.sum("c").alias("c"))
    )
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, cm_sketch(union, "v").collect()))
    assert got == want


def test_hll_ignores_nulls_and_handles_empty_input(spark):
    from starlight_for_kafka_spark.operators.analytics import hll_cardinality

    vals = spark.createDataFrame(
        [(str(i),) for i in range(50)] + [(None,)], "v string"
    )
    with_null = hll_cardinality(vals, "v").first()
    without = hll_cardinality(vals.filter("v IS NOT NULL"), "v").first()
    # a NULL is not an element: estimate and registers must not move
    assert with_null.estimate == without.estimate
    assert with_null.n_zero_registers == without.n_zero_registers
    empty = hll_cardinality(vals.filter("v = 'nope'"), "v").first()
    assert empty.estimate == 0.0 and empty.n_zero_registers == 256


def test_cm_sketch_ignores_nulls(spark):
    from starlight_for_kafka_spark.operators.skew import cm_estimate, cm_sketch

    df = spark.createDataFrame([("a",), ("a",), (None,), (None,)], "v string")
    sk = cm_sketch(df, "v")
    # no counters at unreachable NULL positions
    assert sk.filter("col IS NULL").count() == 0
    est = {r.v: r.est for r in
           cm_estimate(sk, df.select("v").distinct(), "v").collect()}
    assert est == {"a": 2}  # NULL key dropped, not reported as est=0


def test_prom_histogram_and_quantile_known_values(spark):
    from starlight_for_kafka_spark.operators.metrics import (
        histogram_quantile,
        prom_histogram,
    )

    # 100 values 1..100, buckets at 10/50/90: p50 interpolates inside
    # (10,50], p99 lands in +Inf and clamps to the highest finite bound
    df = spark.range(1, 101).selectExpr("cast(id as double) as v")
    h = prom_histogram(df, "v", [10.0, 50.0, 90.0])
    cums = {r.le: r.cum for r in h.collect()}
    assert cums == {10.0: 10, 50.0: 50, 90.0: 90, float("inf"): 100}
    q = {r.q: r.value for r in histogram_quantile(h, [0.5, 0.99]).collect()}
    # rank 50 closes the (10,50] bucket exactly: 10 + 40 * (50-10)/40 = 50
    assert q[0.5] == 50.0
    assert q[0.99] == 90.0  # +Inf clamp


def test_prom_histogram_mergeable_bucketwise(spark):
    from starlight_for_kafka_spark.operators.metrics import prom_histogram

    a = spark.range(1, 60).selectExpr("cast(id as double) as v")
    b = spark.range(60, 101).selectExpr("cast(id as double) as v")
    buckets = [25.0, 75.0]
    # cumulative histograms sum bucket-wise across shards
    merged = (
        prom_histogram(a, "v", buckets)
        .unionByName(prom_histogram(b, "v", buckets))
        .groupBy("le")
        .agg(F.sum("cum").alias("cum"))
    )
    whole = prom_histogram(a.unionByName(b), "v", buckets)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_cardinality_by_per_group_and_rollup(spark):
    from starlight_for_kafka_spark.operators.analytics import (
        hll_cardinality_by,
        hll_registers,
    )

    df = spark.createDataFrame(
        [("d1", str(i)) for i in range(400)]
        + [("d2", str(i)) for i in range(200, 500)],
        "day string, v string",
    )
    out = {r.day: r for r in hll_cardinality_by(df, "v", ["day"]).collect()}
    assert out["d1"].exact == 400 and abs(out["d1"].rel_err) < 0.15
    assert out["d2"].exact == 300 and abs(out["d2"].rel_err) < 0.15
    # rollup: register-wise max across days == sketch of the union
    per_day = hll_registers(df, "v", group_cols=["day"])
    rolled = per_day.groupBy("idx").agg(F.max("M").alias("M"))
    union = hll_registers(df, "v")
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, union.collect())
    )


def test_prom_histogram_null_and_duplicate_bucket_edges(spark):
    from starlight_for_kafka_spark.operators.metrics import (
        cumulative_from_sparse,
        histogram_quantile,
        prom_histogram,
    )

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 15.0), (None, 5.0), ("b", None)],
        "g string, v double",
    )
    # NULL group rows and NULL observations are dropped, not mis-joined
    h = prom_histogram(df, "v", [10.0, 20.0], ["g"])
    cums = {(r.g, r.le): r.cum for r in h.collect()}
    assert cums == {
        ("a", 10.0): 1, ("a", 20.0): 2, ("a", float("inf")): 2,
    }
    # duplicate bucket bounds collapse instead of double-counting
    d2 = spark.createDataFrame([(5.0,), (15.0,)], "v double")
    h2 = {r.le: r.cum for r in
          prom_histogram(d2, "v", [10.0, 10.0, 20.0]).collect()}
    assert h2 == {10.0: 1, 20.0: 2, float("inf"): 2}
    # sparse counts (stream/shard shape) densify to the same grid the
    # quantile needs: the empty 10-bucket must anchor interpolation
    sparse = spark.createDataFrame(
        [(5.0, 5), (15.0, 0), (25.0, 5)], "le double, n long"
    ).filter("n > 0")
    dense = cumulative_from_sparse(sparse, [5.0, 15.0, 25.0])
    q = {r.q: r.value for r in histogram_quantile(dense, [0.6]).collect()}
    # rank 6 lands in the 25-bucket: lower bound must be 15, not 5
    assert abs(q[0.6] - (15.0 + 10.0 * 1 / 5)) < 1e-9


def test_kmv_sketch_estimates_and_exact_small_path(spark):
    from starlight_for_kafka_spark.operators.analytics import (
        kmv_estimate_distinct,
        kmv_intersection,
        kmv_sketch,
    )

    a = spark.range(0, 3000).selectExpr("'a' || cast(id as string) as v")
    b = spark.range(2000, 6000).selectExpr("'a' || cast(id as string) as v")
    sa, sb = kmv_sketch(a, "v", 128), kmv_sketch(b, "v", 128)
    est_a = kmv_estimate_distinct(sa, 128).first().estimate
    assert abs(est_a / 3000 - 1) < 0.5  # ~1/sqrt(k) noise, generous band
    r = kmv_intersection(sa, sb, 128).first()
    assert abs(r.est_union / 6000 - 1) < 0.5
    assert 0 <= r.est_intersection <= r.est_union
    # under-k sketch: the estimate is EXACT
    small = spark.range(40).selectExpr("cast(id as string) as v")
    assert kmv_estimate_distinct(kmv_sketch(small, "v", 128), 128).first().estimate == 40.0
    # NULLs are not elements
    withnull = small.unionByName(
        spark.createDataFrame([(None,)], "v string")
    )
    assert kmv_sketch(withnull, "v", 128).count() == 40


def test_keyed_running_sum_equals_plain_window(spark, events):
    from pyspark.sql import Window

    from starlight_for_kafka_spark.operators import skew

    ev = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ord"),
        F.col("value").cast("decimal(20,6)").alias("v"),
    )
    out = skew.keyed_running_sum(
        ev, ["user_id"], "ord", "v", "event_id", n_shards=8
    )
    w = Window.partitionBy("user_id").orderBy("ord", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    plain = ev.withColumn("running_sum", F.sum("v").over(w))
    cols = ["user_id", "event_id", "running_sum"]
    assert sorted(map(tuple, out.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_keyed_running_sum_single_hot_key_and_explicit_boundaries(spark, events):
    """A 100%-hot key (every row one user) still matches the serial
    window — the per-shard decomposition is exact for any key layout —
    and caller-pinned boundaries replay the engine's sharding."""
    from pyspark.sql import Window

    from starlight_for_kafka_spark.operators import skew

    ev = events.select(
        F.lit(7).alias("user_id"),
        "event_id",
        F.unix_micros("ts").alias("ord"),
        F.col("value").cast("decimal(20,6)").alias("v"),
    )
    bounds = [
        r["b"]
        for r in ev.select(
            F.percentile_approx("ord", [0.25, 0.5, 0.75], 1_000_000).alias("bs")
        )
        .select(F.explode("bs").alias("b"))
        .collect()
    ]
    out = skew.keyed_running_sum(
        ev, ["user_id"], "ord", "v", "event_id", n_shards=4,
        boundaries=bounds,
    )
    w = Window.partitionBy("user_id").orderBy("ord", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    plain = ev.withColumn("running_sum", F.sum("v").over(w))
    cols = ["event_id", "running_sum"]
    assert sorted(map(tuple, out.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_keyed_running_sum_negatives_nulls_and_local_relation(spark):
    """Review regressions: (1) shard totals must be the shard SUM, not
    max of the local cumsum — negative values make the final cumulative
    row smaller than an interior one; (2) NULL values follow the serial
    window's null-skipping semantics (NULL only before any non-NULL);
    (3) in-memory (LocalRelation) inputs must not crash the offsets
    self-join — including through a column-pruned action like .count(),
    which re-binds the shard expression differently than .collect();
    (4) NULL KEYS are kept as their own partition like the serial window
    (a plain equi-join rebase null-rejects and silently drops them)."""
    from pyspark.sql import Window

    from starlight_for_kafka_spark.operators import skew

    rows = [
        (1, 1, 1, 5.0), (1, 2, 2, -3.0), (1, 3, 10, 1.0),   # negative
        (2, 4, 1, None), (2, 5, 10, None), (2, 6, 11, 4.0),  # leading NULLs
        (3, 7, 12, None),                                    # all-NULL key
        (None, 8, 2, 2.0), (None, 9, 10, 3.0),               # NULL key
    ]
    df = spark.createDataFrame(rows, "k int, id int, ord int, v double")
    out = skew.keyed_running_sum(
        df, ["k"], "ord", "v", "id", boundaries=[5]
    )
    assert out.count() == len(rows)  # pruned action + no NULL-key drop
    w = Window.partitionBy("k").orderBy("ord", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    plain = df.withColumn("running_sum", F.sum("v").over(w))
    cols = ["k", "id", "running_sum"]
    assert sorted(
        map(tuple, out.select(*cols).collect()),
        key=lambda t: (t[0] is None, t),
    ) == sorted(
        map(tuple, plain.select(*cols).collect()),
        key=lambda t: (t[0] is None, t),
    )
    # plan contract: the null-safe rebase join must stay a hash-keyed
    # join (null-safe equality IS hash-partitionable) — a regression to
    # BroadcastNestedLoopJoin/CartesianProduct would be quadratic at scale
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_keyed_running_agg_max_min_count_equal_plain_windows(spark):
    """The monoid dispatch: running max/min/count all match their serial
    windows, including NULL-skipping semantics and a hot key."""
    from pyspark.sql import Window

    from starlight_for_kafka_spark.operators import skew

    rows = [
        (1, 1, 1, 5.0), (1, 2, 2, -3.0), (1, 3, 10, 1.0), (1, 4, 11, None),
        (2, 5, 1, None), (2, 6, 10, 4.0), (2, 7, 12, 2.0),
        (3, 8, 3, None),
    ] + [(9, 100 + i, i, float(i % 7 - 3)) for i in range(50)]  # hot key
    df = spark.createDataFrame(rows, "k int, id int, ord int, v double")
    w = Window.partitionBy("k").orderBy("ord", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    for agg, fn in [("max", F.max), ("min", F.min), ("count", F.count)]:
        out = skew.keyed_running_agg(
            df, ["k"], "ord", "v", "id", agg=agg, boundaries=[5, 20],
            out_col="r",
        )
        plain = df.withColumn("r", fn("v").over(w))
        assert sorted(map(tuple, out.select("k", "id", "r").collect())) == \
            sorted(map(tuple, plain.select("k", "id", "r").collect())), agg
