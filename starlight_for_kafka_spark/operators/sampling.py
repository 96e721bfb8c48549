"""Sampling and sequence-packing operators for training-data pipelines.

Both are deterministic by construction (hash-gated / fixed-total-order), so
they are exactly reproducible across engines — the property a training run
needs for resumable, auditable data selection. No reference analog (the
reference is a broker); these extend the pipeline-operator family of
operators/dedup.py and operators/text.py.

Scale notes per operator below; nothing here uses a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from starlight_for_kafka_spark.functions.hashing import md5_hash64


def _es_key(weight_col: str, key_col: str):
    """The ONE Efraimidis-Spirakis ranking key shared by weighted_sample
    and weighted_sample_per_group: u = (md5_60bit + 0.5)/2^60, key =
    round(ln(u)/w, 9). Shared so the global and per-group samplers can
    never drift apart (and the oracles replay one formula, not two)."""
    w = F.col(weight_col).cast("double")
    h = md5_hash64(F.col(key_col).cast("string"))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    return w, F.round(F.log(u) / w, 9)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``md5_hash64(key) % 10000 < fraction[stratum] * 10000``.

    Hash-gated rather than random so the sample is (a) reproducible across
    runs and engines, (b) stable under re-partitioning, and (c) consistent
    for the same key across derived tables — the properties `df.sampleBy`
    (RNG per task) cannot give. Resolution is 1/10000 per stratum.

    Scale: pure map-side filter — no shuffle, no state, the predicate
    whole-stage-codegens into the scan, and at the parquet layer the
    stratum filter can still partition-prune if the table is laid out by
    stratum.
    """
    # hash the STRING form of the key: md5(varchar) is the cross-engine
    # common denominator (md5 of a long's raw bytes is not portable).
    # SALTED ("strat:") like assign_split/shuffle_rank: an unsalted gate
    # would correlate with epoch_resample's gate on the same key, so
    # composing the two samplers (a recommended pipeline) would draw from
    # the same hash stream and bias realized duplication rates.
    gate = F.pmod(
        md5_hash64(F.concat(F.lit("strat:"), F.col(key_col).cast("string"))),
        F.lit(10_000),
    )
    cut = F.coalesce(
        *[
            F.when(F.col(strata_col) == s, F.lit(int(round(f * 10_000))))
            for s, f in sorted(fractions.items())
        ],
        F.lit(int(round(default_fraction * 10_000))),
    )
    return df.filter(gate < cut)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-Res
    (Efraimidis & Spirakis 2006): each row draws u ~ U(0,1) and competes
    with key u^(1/w); the top-``n`` keys are exactly a weight-proportional
    sample without replacement. Ranking runs in log space
    (ln(u)/w, monotone in u^(1/w)) and u derives from md5(key) rather
    than an RNG, so the sample is reproducible across runs, engines, and
    repartitioning — the same determinism contract as stratified_sample
    (an RNG-per-task sample silently changes membership under retries).

    Rows with NULL, NaN, or non-positive weight are excluded (E–S
    requires finite w > 0; NaN would otherwise pass a plain ``w > 0``
    filter under Spark's NaN-is-greatest ordering and saturate the
    sample with NaN sort keys). Ranking keys are
    rounded to 9 dp with a ``key_col`` tie-break so the selection
    boundary is engine-portable. ``key_col`` must be unique per row.

    Scale: one map-side key computation + sort-limit, which Spark plans
    as TakeOrderedAndProject — per-partition top-n then an n·P driver
    merge, no full sort, no shuffle of the data. For sample sizes beyond
    driver comfort (n in the hundreds of millions), switch to the
    two-stage skew.grouped_top_k shape instead.
    """
    # 60-bit hash -> u in (0,1); +0.5 keeps u strictly inside the interval
    w, es = _es_key(weight_col, key_col)
    return (
        df.filter((w > 0) & ~F.isnan(w))
        .withColumn("__es", es)
        .orderBy(F.col("__es").desc(), F.col(key_col).asc())
        .limit(n)
        .drop("__es")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    n: int,
    key_col: str,
) -> DataFrame:
    """Per-group Efraimidis–Spirakis sampling: the :func:`weighted_sample`
    competition run independently inside every group — the per-source /
    per-language quota draw a mixture pipeline makes (sample n docs per
    language, weight by quality or length) with the same determinism
    contract.

    Emits the group columns, the payload, and ``rank`` (1-based within
    the group).

    Scale: per-group top-n goes through skew.grouped_top_k — salted local
    top-n then an exact re-rank over <= n * salts rows per group. A hot
    group (one language dominating the corpus) never funnels through a
    single task, unlike a plain per-group window.
    """
    from starlight_for_kafka_spark.operators.skew import grouped_top_k

    w, es = _es_key(weight_col, key_col)
    keyed = df.filter((w > 0) & ~F.isnan(w)).withColumn("__es", es)
    return grouped_top_k(
        keyed,
        group_cols,
        [F.col("__es").desc(), F.col(key_col).asc()],
        k=n,
    ).drop("__es")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    order_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Sequence packing for pretraining: concatenate all documents into one
    token stream in a fixed total order and chunk it every ``capacity``
    tokens. Emits each document's ``start_tok`` (global stream offset),
    ``pack_id`` (chunk containing its first token) and ``n_packs_spanned``.

    The total order is ``(order_col % n_shards, order_col)`` — chosen so the
    global running sum decomposes into a parallel prefix sum:

      1. per-shard cumulative sums run concurrently (window partitioned by
         shard — ``n_shards`` independent sorted streams, NOT one global
         order-by, which would serialize on a single task at 100 TB);
      2. shard totals (``n_shards`` rows) get a driver-side running offset
         and broadcast-join back.

    One shuffle (the window partition) + one tiny broadcast. The oracle
    replays the same order as a plain window cumsum, so the decomposition
    is provably equivalent to the serial concat.
    """
    shard = F.pmod(F.col(order_col), F.lit(n_shards)).alias("__shard")
    w = Window.partitionBy("__shard").orderBy(order_col)
    local = df.withColumn("__shard", shard).withColumn(
        "__local_end",
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    totals = (
        local.groupBy("__shard")
        .agg(F.max("__local_end").alias("__shard_total"))
        .withColumn(
            "__shard_offset",
            F.coalesce(
                F.sum("__shard_total").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__shard_offset")
    )
    packed = local.join(F.broadcast(totals), "__shard").withColumn(
        "start_tok", F.col("__shard_offset") + F.col("__local_end") - F.col(token_col)
    )
    # integer DIV, not float /: double division loses exactness at 100 TB
    # stream offsets (>2^53 tokens is unreachable, but DIV is also faster)
    return (
        packed.withColumn("pack_id", F.expr(f"start_tok DIV {capacity}"))
        .withColumn(
            "n_packs_spanned",
            (
                F.expr(f"(start_tok + {token_col} - 1) DIV {capacity}")
                - F.col("pack_id")
                + 1
            ).cast("int"),
        )
        .drop("__shard", "__local_end", "__shard_offset")
    )


def quantile_filter(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    keep_frac: float,
    tiebreak_col: str,
    mode: str = "exact",
) -> DataFrame:
    """Keep the top ``keep_frac`` of rows per group, ranked descending by
    ``order_col`` (quality filtering: "top 25% by quality per language").

    ``mode="exact"``: window percent_rank over (order desc, tiebreak) — fully
    deterministic, but each group sorts in one task, so a dominant group
    (one language = half the corpus) serializes at 100 TB.

    ``mode="approx"``: the scale path — per-group threshold via
    ``approx_percentile`` (t-digest sketch, map-side mergeable, no sort),
    broadcast the tiny per-group threshold table, filter. Two linear scans,
    no ordering state; the boundary is approximate by the sketch accuracy
    (1e-4 relative error here), which is the right trade when the filter
    feeds a statistical pipeline rather than an audit.
    """
    if mode == "exact":
        w = Window.partitionBy(*group_cols).orderBy(
            F.desc(order_col), F.asc(tiebreak_col)
        )
        return (
            df.withColumn("__pr", F.percent_rank().over(w))
            .filter(F.col("__pr") <= keep_frac)
            .drop("__pr")
        )
    if mode == "approx":
        thresholds = df.groupBy(*group_cols).agg(
            F.expr(
                f"approx_percentile({order_col}, {1.0 - keep_frac}, 10000)"
            ).alias("__cut")
        )
        return (
            df.join(F.broadcast(thresholds), group_cols)
            .filter(F.col(order_col) >= F.col("__cut"))
            .drop("__cut")
        )
    raise ValueError(f"unknown mode: {mode!r}")


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    max_rows: int,
) -> DataFrame:
    """Anti-overrepresentation cap: keep at most ``max_rows`` rows per group
    (per-domain caps in corpus curation). Selection order is the MD5 hash
    of the key, so the kept subset is a uniform, deterministic sample of
    the group rather than whatever sorts first — and it is stable across
    runs, engines, and partitioning.

    Scale: one shuffle on the group key + a per-group sort. When a single
    group dominates (one domain = a third of the corpus), pre-gate with
    :func:`stratified_sample` at ~(max_rows / est_group_size) to shrink the
    sorted set, then cap exactly — the sort then touches ~max_rows rows
    per group instead of the whole group.
    """
    order = md5_hash64(F.col(key_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def mixture_weights(
    df: DataFrame, group_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled mixture weights for corpus reweighting: each
    group's sampling weight is ``share**alpha`` renormalized to sum to 1
    (alpha=1 reproduces natural proportions, alpha=0 uniform; alpha~0.5 is
    the multilingual-LM convention for upweighting low-resource groups).
    ``epochs`` is the implied duplication factor per group when drawing
    ``total`` examples from the reweighted mixture.

    One full-size aggregation (count per group, map-side partial combine),
    then all arithmetic runs on the tiny per-group frame — the
    unpartitioned windows touch #groups rows, not corpus rows, so the
    single-task stage is O(#domains) at any corpus scale.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    everything = Window.partitionBy()
    total = F.sum("n_docs").over(everything)
    w_raw = F.pow(F.col("n_docs") / total, F.lit(alpha))
    weight = w_raw / F.sum(w_raw).over(everything)
    return counts.select(
        group_col,
        "n_docs",
        F.round(weight, 9).alias("weight"),
        F.round(weight * total / F.col("n_docs"), 9).alias("epochs"),
    )


def assign_split(
    df: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test split assignment: hash(seed, id) mod 1e6
    lands in consecutive proportional buckets. Map-only — no shuffle, no
    sampling state — so membership is reproducible per-document regardless
    of partitioning, parallelism, or corpus growth (a doc's split never
    changes when other docs are added: the hash depends only on (seed, id)).
    That stability is the property an eval set needs — resampling on every
    corpus refresh leaks train docs into held-out sets.

    ``splits`` maps name -> fraction (must sum to ~1); default 98/1/1.
    Returns the input plus a ``split`` column.
    """
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = md5_hash64(F.concat(F.lit(f"split{seed}:"), F.col(id_col).cast("string")))
    bucket = F.pmod(h, F.lit(1_000_000))
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = bucket < F.lit(int(round(acc * 1_000_000)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def leakage_safe_split(
    df: DataFrame,
    dup_pairs: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Train/val/test split that keeps near-duplicate groups TOGETHER: the
    split hash is computed on each document's near-dup component
    representative (min id over the transitive closure of ``dup_pairs``)
    instead of its own id, so a document and all its near-copies land in
    the same split. A per-document split (assign_split) silently leaks:
    an eval doc with a train-set near-copy is memorization disguised as
    held-out performance — the split must be group-atomic, which is why
    dedup and splitting have to compose.

    Scale: components come from the (tiny relative to corpus) near-dup
    pair set; the representative table joins back broadcast-style; the
    gate itself stays the same map-only hash-bucket as assign_split.
    Stability: a doc's split depends only on (seed, its component min id),
    so adding unrelated docs never reshuffles existing membership; a NEW
    near-dup edge can only pull docs INTO its group's split (the safe
    direction — the group stays atomic).

    Returns the input plus ``component`` (the representative id — the
    doc's own id when it has no near-dups) and ``split``.
    """
    from starlight_for_kafka_spark.operators.dedup import connected_components

    comps = connected_components(dup_pairs)
    rep = comps.select(F.col("node").alias(id_col), F.col("component").alias("__rep"))
    # rep is bounded by NEAR-DUP volume (one row per doc appearing in any
    # pair), which grows with the corpus's duplication rate — not a
    # constant. No forced broadcast: AQE picks broadcast when the dup
    # sliver is actually small and falls back to a shuffle join on a
    # dup-heavy corpus where a forced broadcast would exhaust the driver.
    tagged = (
        df.join(rep, id_col, "left")
        .withColumn("component", F.coalesce(F.col("__rep"), F.col(id_col)))
        .drop("__rep")
    )
    return assign_split(tagged, splits, id_col="component", seed=seed)


def shuffle_rank(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic corpus shuffle for training-order randomization:
    every row gets a dense ``shuffle_pos`` in [0, n) following the
    pseudorandom total order (hash(seed,id) mod n_shards, hash(seed,id), id).

    A naive row_number() over a global ORDER BY serializes the whole corpus
    through ONE task — the classic 100 TB trap. Like pack_sequences, the
    leading shard term makes the global order decompose into a parallel
    prefix: per-shard ranks run as n_shards independent windows (one
    shuffle), shard row-counts (n_shards rows) get a driver-side running
    offset and broadcast back. Equivalent to the serial order by
    construction, at full cluster parallelism.
    """
    h = md5_hash64(F.concat(F.lit(f"shuf{seed}:"), F.col(id_col).cast("string")))
    local = df.withColumn("__h", h).withColumn(
        "__shard", F.pmod(F.col("__h"), F.lit(n_shards))
    )
    w = Window.partitionBy("__shard").orderBy("__h", id_col)
    local = local.withColumn("__local_rank", F.row_number().over(w))
    offsets = (
        local.groupBy("__shard")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__offset")
    )
    return (
        local.join(F.broadcast(offsets), "__shard")
        .withColumn("shuffle_pos", F.col("__offset") + F.col("__local_rank") - 1)
        .drop("__h", "__shard", "__local_rank", "__offset")
    )


def interleave_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic mixture interleaving: assign every row a sortable
    ``interleave_key`` such that reading the corpus in key order emits
    sources at rates proportional to their mixture ``weights`` — the
    training-data ORDERING step that pairs with mixture_weights /
    epoch_resample (a weight-resampled corpus still needs its sources
    spread evenly through the epoch, not concatenated). Source s's i-th
    row (in a seeded pseudorandom per-source order) gets
    key = (i + 0.5) / w_s — the classic stride interleave, so a source
    with twice the weight appears twice as often in any key range.

    Per-source ranks use the same sharded parallel-prefix construction
    as shuffle_rank (rank order = (hash mod n_shards, hash, id)): no
    per-source global window ever serializes a dominant source. Rows
    whose source has no weight are dropped (weight 0). Emits the input
    columns + (src_rank, interleave_key).

    TIE-BREAK CONTRACT: equal-weight sources collide on the key at every
    rank ((i + 0.5)/w is identical for both), and 6-dp rounding can
    collide unequal weights too — so a deterministic epoch write must
    sort by (interleave_key, source, src_rank), never the key alone
    (range-partition + sortWithinPartitions on all three). Both tie-break
    columns are emitted for exactly this reason.
    """
    h = md5_hash64(F.concat(F.lit(f"il{seed}:"), F.col(id_col).cast("string")))
    local = df.withColumn("__h", h).withColumn(
        "__shard", F.pmod(F.col("__h"), F.lit(n_shards))
    )
    w = Window.partitionBy(source_col, "__shard").orderBy("__h", id_col)
    local = local.withColumn("__lr", F.row_number().over(w))
    offsets = (
        local.groupBy(source_col, "__shard")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.partitionBy(source_col)
                    .orderBy("__shard")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(source_col, "__shard", "__offset")
    )
    positive = [(s, wt) for s, wt in sorted(weights.items()) if wt > 0]
    if not positive:
        raise ValueError(
            "interleave_sources: weights must contain at least one positive entry"
        )
    wcol = F.coalesce(
        *[F.when(F.col(source_col) == s, F.lit(float(wt))) for s, wt in positive]
    )
    return (
        local.join(F.broadcast(offsets), [source_col, "__shard"])
        .withColumn("src_rank", F.col("__offset") + F.col("__lr") - 1)
        .withColumn("__w", wcol)
        .filter(F.col("__w").isNotNull())
        .withColumn(
            "interleave_key",
            F.round((F.col("src_rank") + F.lit(0.5)) / F.col("__w"), 6),
        )
        .drop("__h", "__shard", "__lr", "__offset", "__w")
    )


def epoch_resample(
    df: DataFrame,
    weights: DataFrame,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Materialize a temperature-reweighted corpus from mixture_weights
    output: each doc appears floor(epochs) times, plus one more iff its
    deterministic hash gate falls below frac(epochs) — so group-level
    duplication converges to exactly ``epochs`` in expectation while
    staying reproducible across runs, engines and repartitioning (same
    properties as stratified_sample's hash gate; RNG-based resampling has
    none of them).

    Output adds a ``copy`` index (1..n per doc) so downstream shuffling /
    packing can treat duplicates as distinct examples.

    Scale: broadcast join of the #groups-row weights table + a map-side
    sequence explode — no shuffle of the corpus; expansion factor is the
    mixture's epoch sum, the same data volume any epoch-sampling trainer
    would read.
    """
    e = weights.select(group_col, "epochs")
    # salted distinctly from stratified_sample's gate (see its comment): a
    # corpus pre-filtered by that sampler must still see an independent
    # draw here, or frac(epochs) realizes as frac/fraction instead of frac
    gate = F.pmod(
        md5_hash64(F.concat(F.lit("epoch:"), F.col(id_col).cast("string"))),
        F.lit(10_000),
    )
    n_extra = (gate < F.round((F.col("epochs") - F.floor(F.col("epochs"))) * 10_000)).cast("int")
    n = (F.floor(F.col("epochs")).cast("int") + n_extra).alias("__n")
    return (
        df.join(F.broadcast(e), group_col)
        .withColumn("__n", n)
        .filter(F.col("__n") >= 1)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n", "epochs")
    )


def packing_stats(
    df: DataFrame,
    token_col: str,
    capacity: int,
    order_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Packing-efficiency diagnostics over :func:`pack_sequences`: the
    one-row report a pipeline checks before committing a capacity choice —
    how many documents cross pack boundaries (each crossing is a truncated
    or padded training example, the cost packing exists to minimize), how
    full the stream's final pack is, and docs-per-pack dispersion.

    Derived entirely from the pack assignment (already computed in one
    shuffle + broadcast); the stats are two tiny aggregations over
    (docs) and (packs) — the packed stream itself is gapless by
    construction, so per-pack utilization is ``capacity`` everywhere
    except the final pack and needs no per-pack scan.
    """
    packed = pack_sequences(df, token_col, capacity, order_col, n_shards)
    per_pack = packed.groupBy("pack_id").agg(
        F.count("*").alias("docs_starting")
    )
    return (
        packed.agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).alias("total_tokens"),
            F.sum((F.col("n_packs_spanned") > 1).cast("long")).alias(
                "boundary_crossers"
            ),
            (F.max(F.col("start_tok") + F.col(token_col)) / capacity).alias(
                "__packs_frac"
            ),
        )
        .crossJoin(
            F.broadcast(
                per_pack.agg(
                    F.count("*").alias("packs_with_starts"),
                    F.max("docs_starting").alias("max_docs_per_pack"),
                )
            )
        )
        .select(
            "n_docs",
            "total_tokens",
            F.ceil("__packs_frac").cast("long").alias("n_packs"),
            "boundary_crossers",
            (F.col("boundary_crossers") / F.col("n_docs")).alias("crosser_frac"),
            (
                F.col("total_tokens")
                / (F.ceil("__packs_frac") * F.lit(capacity))
            ).alias("fill_frac"),
            "packs_with_starts",
            "max_docs_per_pack",
        )
    )
