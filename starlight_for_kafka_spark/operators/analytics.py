"""Behavioral analytics over event logs: ordered funnels and cohort
retention.

The reference proves its event-log semantics through Kafka Streams
workloads (SURVEY.md §2.5, `tests/.../streams/KStreamAggregationTest.java`);
funnel and retention are the canonical downstream consumers of exactly that
log shape (user-keyed, time-ordered events). Both operators are built so the
expensive pass is ONE user-keyed shuffle with map-side partial aggregation —
at 100 TB the cost is the shuffle of (user, small-struct) pairs, never a
per-step self-join over the raw log.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from starlight_for_kafka_spark.functions.hashing import md5_hash64


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: for each user, the earliest time each step was
    reached STRICTLY AFTER the previous step (classic web-analytics funnel;
    equivalent to the per-step `JOIN ... WHERE ts > prev` cascade, but in
    one user-keyed shuffle).

    Plan shape: filter to funnel event types (pushed to the scan), then k
    chained RUNNING-MIN window expressions over one (user, ts-ordered)
    sort: ``cand_i = ts WHEN type = step_i AND ts > running_min(cand_{i-1})``
    and ``running_min(cand_i)`` feeds step i+1. The per-user final step
    times fall out of a groupBy(user) min over the candidate columns, which
    reuses the window's hash partitioning (no second exchange). State per
    row is k longs — NEVER a per-user collect_list, whose size is bounded
    only by a user's event count (the thing a bot account blows up at
    100×). This is ClickHouse's windowFunnel state machine expressed as
    Catalyst window algebra.

    Correctness of the chaining: the default RANGE frame (unbounded
    preceding → current row, ties included) makes running_min(cand_{i-1})
    at a step-i event equal the true earliest chain-eligible step-(i-1)
    time whenever that time is < ts (the minimal eligible event sorts
    strictly earlier); when it is = ts the strict ``>`` rejects the row
    under either frame tie-handling, so the chain is deterministic.

    Returns one row per user who reached step 1: ``step_1..step_k``
    timestamps (null once the chain breaks) and ``steps_completed``.
    """
    steps = list(steps)
    ev = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col), F.col(ts_col).alias("__t"), F.col(type_col).alias("__e")
    )
    # Default RANGE frame: unbounded preceding -> current row, ties included.
    w = Window.partitionBy(user_col).orderBy("__t")

    prev_run: Column | None = None
    cands: list[Column] = []
    for i, st in enumerate(steps, 1):
        c = F.col("__e") == F.lit(st)
        if prev_run is not None:
            # __t > NULL is NULL -> when() yields NULL: chain breaks for free
            c = c & (F.col("__t") > prev_run)
        cand = F.when(c, F.col("__t")).alias(f"__cand_{i}")
        ev = ev.select("*", cand)
        cands.append(F.col(f"__cand_{i}"))
        prev_run = F.min(F.col(f"__cand_{i}")).over(w)

    agg = [
        F.min(f"__cand_{i}").alias(f"step_{i}") for i in range(1, len(steps) + 1)
    ]
    out = ev.groupBy(user_col).agg(*agg)
    completed = sum(
        (F.col(f"step_{i}").isNotNull().cast("int") for i in range(1, len(steps) + 1)),
        start=F.lit(0),
    )
    return out.withColumn("steps_completed", completed.cast("long")).filter(
        F.col("step_1").isNotNull()
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-active ISO week,
    counted in every later week they were active.

    One user-keyed shuffle (collect the user's distinct active weeks;
    cohort week = its minimum), then an explode + re-aggregate whose input
    is already one row per (user, week) — the second shuffle moves only the
    deduplicated activity matrix, orders of magnitude smaller than the log.

    Returns (cohort_week date, week_offset long, n_users long).
    """
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    per_user = (
        df.select(F.col(user_col).alias("u"), week.alias("w"))
        .groupBy("u")
        .agg(F.array_sort(F.collect_set("w")).alias("weeks"))
    )
    exploded = per_user.select(
        F.col("weeks")[0].alias("cohort_week"), F.explode("weeks").alias("week")
    )
    return (
        exploded.groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def ts_similarity_search(
    series: DataFrame,
    pattern: Sequence[float],
    k: int = 25,
    key_col: str = "user_id",
    t_col: str = "day",
    val_col: str = "cnt",
) -> DataFrame:
    """Top-k subsequence similarity search over keyed time series: find the
    k windows (of length len(pattern), ending at an observed point) whose
    values are nearest the query pattern by squared euclidean distance.

    Distributed subsequence matching in the spirit of "Time Series
    Similarity Search for Streaming Data in Distributed Systems" (EDBT'19),
    expressed Spark-first: the sliding window is len(pattern) lag() columns
    over ONE per-key shuffle — no self-join of the series against shifted
    copies, no collect. With integer-valued series the distance arithmetic
    is exact in both engines, so results are engine-portable bit-for-bit.
    The global top-k is a TakeOrderedAndProject (per-partition heads, then
    a k-row driver merge), not a full sort.
    """
    m = len(pattern)
    w = Window.partitionBy(key_col).orderBy(t_col)
    dist = None
    for i, q in enumerate(pattern):
        c = F.lag(val_col, m - 1 - i).over(w) if m - 1 - i > 0 else F.col(val_col)
        d = (c - F.lit(q)) * (c - F.lit(q))
        dist = d if dist is None else dist + d
    return (
        series.withColumn("dist2", dist)
        .filter(F.col("dist2").isNotNull())
        .orderBy("dist2", key_col, t_col)
        .limit(k)
        .select(key_col, t_col, val_col, "dist2")
    )


def active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Exact DAU + trailing-window active users (WAU-style) per day.

    Rolling DISTINCT cannot be summed from daily distincts, and a running
    per-window set is state the size of the user base. Spark-first instead:
    each (user, active-day) pair CONTRIBUTES to the ``window_days`` windows
    ending on day..day+w-1 — a map-only explode — and the trailing count
    is then one plain count-distinct per window end. Cost is w× the
    (user, day) pair count (already deduplicated, tiny vs the event log),
    all map-side until the final keyed aggregation; no per-day self-joins,
    no running state.

    Reported only for days with activity (window ends align with the DAU
    series).
    """
    ud = (
        df.select(
            F.col(user_col).alias("user"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.countDistinct("user").alias("dau"))
    contrib = ud.select(
        "user",
        F.explode(
            F.sequence(F.lit(0), F.lit(window_days - 1))
        ).alias("__i"),
        "day",
    ).select("user", F.date_add(F.col("day"), F.col("__i")).alias("wday"))
    wau = (
        contrib.join(dau.select(F.col("day").alias("wday")), "wday")
        .groupBy("wday")
        .agg(F.countDistinct("user").alias("wau"))
    )
    return dau.join(wau, dau["day"] == wau["wday"]).select("day", "dau", "wau")


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for every consecutive (event, next-event) pair within a user's
    time-ordered history, the count and the conditional probability
    P(to | from) — the session-flow / next-action model behind journey
    analysis and behavioral anomaly detection.

    Plan shape: ONE user-keyed shuffle for the ``lead`` window (the same
    co-partitioning every per-user operator here rides), then a
    (from, to)-keyed aggregation whose output is |event types|² rows —
    tiny — and the per-``from`` totals join against it is a broadcast of a
    |event types|-row table. The raw log is never shuffled twice and never
    self-joined. ``order_tiebreak`` breaks timestamp ties deterministically
    (pass the event id; without it equal-ts pairs are engine-dependent).
    """
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.withColumn("__next", F.lead(type_col).over(w))
        .filter(F.col("__next").isNotNull())
        .select(F.col(type_col).alias("from_type"), F.col("__next").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("cnt"))
    totals = counts.groupBy("from_type").agg(F.sum("cnt").alias("from_total"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .withColumn("prob", F.col("cnt") / F.col("from_total"))
        .select("from_type", "to_type", "cnt", "prob")
    )


def ts_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket_ms: int = 3_600_000,
    trailing: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection on bucketed event counts:
    each (key, hour) volume is scored against the mean/std of its own
    PREVIOUS ``trailing`` buckets (never including itself — no leakage),
    and flagged when |z| exceeds the threshold. The on-call "did this
    metric just spike" primitive, over the same metric vocabulary as
    operators/metrics.py.

    Variance is computed from explicit sum/sum-of-squares over the window
    — not ``stddev_samp`` — for two reasons: the expression is identical
    arithmetic in any engine (population of ints → IEEE-deterministic
    doubles, no Welford implementation variance), and sum/sumsq partial-
    aggregate map-side. The window state per key is ``trailing`` rows of
    three longs; keys partition the tiny bucketed table, not the raw log.

    Buckets are DENSIFIED per key (sequence over the key's min→max
    bucket, zero-filled): a metric that drops to nothing mid-series emits
    zero-count rows that score as negative-z anomalies, instead of the
    trailing window silently stretching across the gap — the
    silent-outage case a rows-based window over observed buckets cannot
    see. Densification is generated in TWO explode levels (8k-bucket
    chunks, then buckets within a chunk) so no single row ever holds the
    whole span as one array: one corrupt far-past timestamp against a
    fine bucket_ms would otherwise ask ``sequence`` for a billions-wide
    array and abort the job at Spark's array-length cap. The dense series
    is still span/bucket_ms ROWS per key — same output, bounded memory.
    """
    chunk = 8192
    ms = F.expr(f"unix_micros({ts_col}) DIV 1000")
    observed = (
        df.withColumn("bucket_ms", (ms - ms % F.lit(bucket_ms)).cast("long"))
        .groupBy(key_col, "bucket_ms")
        .agg(F.count("*").alias("cnt"))
    )
    dense = (
        observed.groupBy(key_col)
        .agg(F.min("bucket_ms").alias("__lo"), F.max("bucket_ms").alias("__hi"))
        .select(
            key_col,
            "__hi",
            F.explode(
                F.sequence("__lo", "__hi", F.lit(bucket_ms * chunk).cast("long"))
            ).alias("__cs"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence(
                    "__cs",
                    F.least(
                        F.col("__cs") + F.lit(bucket_ms * (chunk - 1)).cast("long"),
                        F.col("__hi"),
                    ),
                    F.lit(bucket_ms).cast("long"),
                )
            ).alias("bucket_ms"),
        )
    )
    bucketed = dense.join(observed, [key_col, "bucket_ms"], "left").withColumn(
        "cnt", F.coalesce("cnt", F.lit(0).cast("long"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ms")
        .rowsBetween(-trailing, -1)
    )
    n = F.count("cnt").over(w)
    s = F.sum("cnt").over(w)
    ss = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    mean = s / n
    var = (ss - (s * s) / n) / (n - 1)
    z = (F.col("cnt") - mean) / F.sqrt(var)
    return (
        bucketed.withColumn("n_prev", n)
        .withColumn("mean_prev", mean)
        .withColumn("z", F.when((n >= 2) & (var > 0), z))
        .withColumn(
            "anomaly",
            # |z| beyond threshold, or ANY deviation from a zero-variance
            # baseline (a constant metric that moves has z = ±inf; z stays
            # null, the flag still fires)
            F.coalesce(F.abs(F.col("z")) > z_threshold, F.lit(False))
            | ((n >= 2) & (var == 0) & (F.col("cnt") != mean)),
        )
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank over an edge list, a FIXED number of power
    iterations (Page et al. 1999) — the source-authority signal a web-scale
    corpus curation pipeline ranks domains/hosts with (Common-Crawl-style
    pipelines gate on exactly this class of centrality) before quality
    sampling:

        r'(v) = (1-d)/N + d · [ Σ_{u→v} r(u)·w(u,v)/W(u)  +  dangling/N ]

    where W(u) is u's total out-weight and ``dangling`` is the rank mass
    sitting on nodes with no out-edges (redistributed uniformly, the
    standard correction). Unweighted graphs pass ``weight_col=None``
    (every edge weighs 1).

    Scale shape: the same driver-loop-over-distributed-steps idiom as
    dedup.connected_components — each iteration is ONE join of the rank
    table against the (pre-normalized, localCheckpointed) edge table plus
    one dst-keyed partial-combining aggregation; ranks re-checkpoint per
    round to cut lineage. Contribution sums use plain ``sum`` (map-side
    combinable — an in-row sorted fold would collect_list a celebrity
    node's 10^8 in-edges into one task); float summation order is
    therefore engine/run-dependent in the last ulps, and ranks should be
    compared ROUNDED (the fixed-point iteration is a contraction, so
    low-bit noise shrinks rather than compounds).
    """
    from starlight_for_kafka_spark.plans.checkpoints import RollingCheckpoint

    # keep=1: every read of generation N-1 happens while generation N
    # materializes (the dangling sum is in-plan, not a post-checkpoint
    # consumer), so superseded generations release immediately
    roll = RollingCheckpoint(edges.sparkSession, keep=1)
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    nodes_plain = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if iterations == 0:
        # degenerate case: uniform ranks, no loop — build it as a pure
        # plan so no checkpoint is ever pinned (a pinned input with no
        # rolling generation would have nothing to release it)
        n0 = nodes_plain.count()
        return nodes_plain.select("node", F.lit(1.0 / n0).alias("rank"))
    try:
        # A node whose out-edges all weigh 0 has no usable out-links: keep it
        # OUT of out_w so it classifies as dangling (its mass redistributes
        # uniformly) instead of silently leaking rank through NULL w/0 shares.
        out_w = (
            e.groupBy("src")
            .agg(F.sum("w").alias("total_w"))
            .filter(F.col("total_w") != 0.0)
        )
        # pre-normalize edge weights once: share(u,v) = w/W(u).
        # pin_partitioned, not pin: the loop joins this table on src
        # EVERY round, and localCheckpoint would erase the partitioning
        # (UnknownPartitioning -> one full edge re-shuffle per
        # iteration); hash-partitioned + persisted, the per-round join
        # needs no exchange on the edge side — per-iteration shuffle is
        # O(ranks), not O(edges), the difference that matters when the
        # edge table is the 100 TB side
        norm_e = roll.pin_partitioned(
            e.join(out_w, "src")
            .select("src", "dst", (F.col("w") / F.col("total_w")).alias("share")),
            "src",
        )
        # the rank table carries each node's danglingness as a FLAG
        # (__has_out) instead of a separate dangling_nodes table, and the
        # rank table ITSELF is the left side of the per-round update (it
        # holds every node by construction, so a pinned node table in the
        # loop is redundant). Round-10 rework (guide §2.4): the old shape
        # paid, per iteration, one dangling_nodes ⋈ ranks join (two
        # O(nodes) exchanges) purely to sum a subset, plus a full pinned
        # node-table read + exchange for the re-emit join. Now the
        # dangling mass is a shuffle-free filter+sum over the rank table
        # and the re-emit join reads no second table.
        has_out = out_w.select(F.col("src").alias("node")).distinct()
        state0 = roll(
            nodes_plain.join(
                has_out.withColumn("__has", F.lit(True)), "node", "left"
            ).select(
                "node", F.coalesce("__has", F.lit(False)).alias("__has_out")
            )
        )
        n_nodes = state0.count()
    except BaseException:
        # setup checkpoints (norm_e / state0) are real Spark jobs; a
        # failure here must not leak the already-pinned ones
        roll.abort()
        raise
    base = (1.0 - damping) / n_nodes
    ranks = state0.select(
        "node", F.lit(1.0 / n_nodes).alias("rank"), "__has_out"
    )
    try:
        for _ in range(iterations):
            # dangling mass stays IN-PLAN as a broadcast 1-row aggregate — a
            # .first() here would run a whole extra job per iteration just to
            # ferry one scalar through the driver (measured ~2x the loop's
            # wall time at sf0.1; at cluster scale it is also a per-iteration
            # scheduling barrier)
            dangling = ranks.filter(~F.col("__has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dmass")
            )
            contribs = (
                norm_e.join(ranks, norm_e["src"] == ranks["node"])
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
            )
            # contribs leaves its aggregation HashPartitioning(dst) — the
            # join key — so only the rank side exchanges here
            ranks = (
                ranks.join(contribs, ranks["node"] == contribs["dst"], "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    ranks["node"],
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("inflow"), F.lit(0.0))
                            + F.col("__dmass") / F.lit(float(n_nodes))
                        )
                    ).alias("rank"),
                    "__has_out",
                )
            )
            ranks = roll(ranks)
    except BaseException:
        # no result will be returned — nothing may stay pinned
        roll.abort()
        raise
    # the final checkpoint holds the result; the edge/node inputs and
    # superseded rank generations release their pinned blocks NOW
    # instead of leaking into the rest of the session
    roll.finish()
    return ranks.select("node", "rank")


def hll_cardinality(
    df: DataFrame,
    value_col: str,
    b: int = 8,
    with_exact: bool = True,
) -> DataFrame:
    """Distinct-count estimation with a HyperLogLog sketch (Flajolet et
    al. 2007) built entirely from DataFrame aggregations — the mergeable
    cardinality sketch a 100 TB pipeline uses where countDistinct's
    exact shuffle is unaffordable (vocabulary sizes, per-shard user
    counts, dedup-rate monitoring). Spark's own approx_count_distinct is
    the same HLL++ family but its RNG/register layout is engine-private;
    this one derives every register from md5, so the estimate is
    bit-reproducible across runs AND engines (the DuckDB oracle replays
    the identical registers).

    Layout: m = 2^``b`` registers; the 60-bit md5 hash splits into a
    ``b``-bit register index (top bits) and a (60-b)-bit suffix whose
    leading-zero count + 1 is the register rank. Register ranks come from
    string-length-of-bin() — exact integer arithmetic, no float log2
    boundary hazard. The register sum Σ 2^-M_j runs in FIXED-POINT
    (Σ 2^(F-M_j) as BIGINT, F = suffix width + 1), so it is exact and
    order-independent — a float sum would drift by summation order and
    break cross-engine parity. Small-range correction: linear counting
    when E <= 2.5m and empty registers exist (the standard estimator).

    Emits ONE row: (m, n_zero_registers, estimate[, exact, rel_err]).
    ``with_exact=True`` adds the exact countDistinct for harness/audit
    use — turn it off at scale (it is the expensive shuffle the sketch
    exists to avoid).

    Scale: register construction is one partial-combining aggregation
    to 2^b rows; registers merge across shards/streams with max() —
    sketch union is register-wise max, which groupBy(max) gives for
    free (see the mergeability test). NULL values are not elements
    (matching countDistinct) and are dropped before hashing. An empty
    input reports estimate 0 via the linear-counting branch.
    """
    return _hll_estimate(df, value_col, [], b, with_exact, include_m=True)


def _hll_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    b: int,
    with_exact: bool,
    include_m: bool = False,
) -> DataFrame:
    """The ONE estimator shared by hll_cardinality and
    hll_cardinality_by (fixed-point register sum, linear-counting
    branch, ANSI-safe rel_err) — a correction applied to one must reach
    both, and their oracles, by construction."""
    field = (60 - b) + 1  # rho ranges 1..field
    m = 1 << b
    # Flajolet's bias constants: the closed form is the m >= 128 asymptote;
    # small register counts use the paper's tabulated values (alpha_16/32/64)
    # or the raw-estimate bias silently grows.
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    if m < 16:
        raise ValueError(f"hll: b must be >= 4 (got b={b}, m={m})")

    regs = hll_registers(df, value_col, b, group_cols)
    # coalesce: an EMPTY register table sums to NULL; 0 makes s_int the
    # all-empty m * 2^field, which lands in linear counting -> estimate 0
    aggs = [
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {field} - M)")), F.lit(0).cast("long")
        ).alias("__s_present"),
        F.count("*").alias("__n_present"),
    ]
    summed = regs.groupBy(*group_cols).agg(*aggs) if group_cols else regs.agg(*aggs)
    scale = float(1 << field)
    stats = summed.select(
        *group_cols,
        (F.col("__s_present") + (F.lit(m) - F.col("__n_present")) * F.lit(1 << field))
        .alias("__s_int"),
        (F.lit(m) - F.col("__n_present")).alias("n_zero_registers"),
    )
    raw_e = F.lit(alpha * m * m * scale) / F.col("__s_int")
    v = F.col("n_zero_registers")
    est = F.when(
        (raw_e <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw_e)
    lead = [F.lit(m).alias("m")] if include_m else []
    out = stats.select(
        *group_cols,
        *lead,
        "n_zero_registers",
        F.round(est, 4).alias("estimate"),
    )
    if with_exact:
        if group_cols:
            exact = df.groupBy(*group_cols).agg(
                F.countDistinct(value_col).alias("exact")
            )
            # null-SAFE join: a NULL group key is a legitimate slice (the
            # sketch side keeps it — only value NULLs are filtered), and a
            # null-unsafe equi-join would silently drop it exactly when
            # with_exact=True (prom_histogram filters null groups for the
            # same reason; here the slice is kept instead)
            cond = None
            for g in group_cols:
                eq = out[g].eqNullSafe(exact[g])
                cond = eq if cond is None else (cond & eq)
            out = out.join(exact, cond).drop(*[exact[g] for g in group_cols])
        else:
            out = out.crossJoin(df.agg(F.countDistinct(value_col).alias("exact")))
        out = out.withColumn(
            "rel_err",
            # NULL when exact == 0 (relative error is undefined; ANSI
            # mode would otherwise throw on the empty-input divide)
            F.when(
                F.col("exact") > 0,
                F.round((F.col("estimate") - F.col("exact")) / F.col("exact"), 4),
            ),
        )
    return out


def hll_registers(
    df: DataFrame,
    value_col: str,
    b: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The raw (idx, M) register table of :func:`hll_cardinality` — the
    mergeable form: union register tables from any number of shards and
    fold with groupBy(idx).max(M) to sketch the union of the inputs.
    With ``group_cols`` the registers are per group (one sketch per day /
    tenant / source — the per-slice distinct-count table). NULLs are
    dropped (a NULL is not an element: it would otherwise mint a phantom
    (NULL, NULL) register that deflates n_zero and poisons cross-shard
    merges)."""
    group_cols = group_cols or []
    idx, rho = hll_register_cols(value_col, b)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("M"))
    )


def hll_register_cols(value_col: str, b: int = 8):
    """The (idx, rho) register expressions of the md5 HLL — ONE
    definition shared by the batch register table and the streaming
    twin, because registers derived by even slightly different math are
    silently non-mergeable (register-wise max of mismatched layouts
    produces garbage with no error)."""
    suffix_bits = 60 - b
    field = suffix_bits + 1
    h = md5_hash64(F.col(value_col).cast("string"))
    suffix = h.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    # leading zeros of the suffix within its field = suffix_bits - bitlen;
    # bitlen via length(bin()) is exact (no float log2 boundary hazard)
    rho = F.when(suffix == 0, F.lit(field)).otherwise(
        F.lit(field) - F.length(F.regexp_replace(F.bin(suffix), "^0+", ""))
    )
    return F.shiftrightunsigned(h, suffix_bits), rho


def hll_cardinality_by(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    b: int = 8,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group :func:`hll_cardinality` — one HLL estimate per group
    (distinct users per DAY, vocabulary per SOURCE), the sliced
    cardinality report a 100 TB pipeline cannot afford as exact
    countDistinct per slice. Same register math, same fixed-point sum,
    same linear-counting branch; emits one row per group.

    Scale: the whole computation is two group-keyed partial-combining
    aggregations (group x 2^b register rows, then group rows) — the
    per-slice sketch table is also the mergeable artifact to persist for
    rollups (day -> week = register-wise max across days).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use hll_cardinality")
    return _hll_estimate(df, value_col, group_cols, b, with_exact)


def kmv_sketch(df: DataFrame, value_col: str, k: int = 64) -> DataFrame:
    """K-Minimum-Values sketch (Bar-Yossef et al. 2002): the k smallest
    md5 hash values of the column's distinct elements — the member of
    the sketch family that supports SET OPERATIONS: unions merge by
    re-taking the k smallest of the combined sketches, and intersections
    estimate via the Jaccard fraction inside the union sketch
    (:func:`kmv_intersection`), which HLL registers cannot do. NULLs are
    not elements. Deterministic md5 -> the sketch (and every estimate)
    reproduces across runs and engines.

    Scale: one distinct-hash shuffle bounded by the value cardinality,
    then a k-row TakeOrderedAndProject — the sketch is k longs, a
    control-plane object by construction.
    """
    h = md5_hash64(F.col(value_col).cast("string"))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(h.alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_estimate_distinct(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: if the sketch holds
    fewer than k hashes the count is EXACT (every distinct element is in
    it); otherwise est = (k-1) * 2^60 / max(hv) — the classic k-th
    minimum spacing estimator over the 60-bit hash space."""
    return sketch.agg(
        F.count("*").alias("__n"), F.max("hv").alias("__mx")
    ).select(
        F.round(
            F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("__mx")
            ),
            4,
        ).alias("estimate")
    )


def kmv_intersection(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """Intersection-size estimate from two KMV sketches: build the union
    sketch (k smallest of both), count how many of its members appear in
    BOTH inputs (c), estimate J = c/k, and |A ∩ B| = J * |A ∪ B| with
    the union size from :func:`kmv_estimate_distinct`. Everything runs
    on 3k rows — the sketches, never the data.

    Emits one row (k, n_common, est_union, est_intersection)."""
    union = (
        sketch_a.unionByName(sketch_b).distinct().orderBy("hv").limit(k)
    )
    both = sketch_a.join(sketch_b, "hv").select("hv")
    common = union.join(both, "hv")
    stats = union.agg(
        F.count("*").alias("__n"), F.max("hv").alias("__mx")
    ).crossJoin(common.agg(F.count("*").alias("n_common")))
    est_union = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("__mx"))
    return stats.select(
        F.lit(k).alias("k"),
        "n_common",
        F.round(est_union, 4).alias("est_union"),
        F.round(
            (F.col("n_common").cast("double") / F.col("__n")) * est_union, 4
        ).alias("est_intersection"),
    )
