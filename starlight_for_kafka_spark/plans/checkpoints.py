"""Rolling localCheckpoint management for driver-loop operators.

The iterative operators (pagerank, connected components) localCheckpoint
their state table every round to cut lineage. Each eager checkpoint PINS
an RDD in executor storage memory, and a checkpointed generation is only
read for one or two rounds — yet left pinned, ten iterations hold ten
generations of state blocks. In a long-lived session (or a bench running
many operators back-to-back) the leak starves unified memory and
measurably degrades later Arrow-heavy stages (observed: a media-decode
stage 5-20x slower behind ~20 stale pinned RDDs at 10x scale).

``RollingCheckpoint`` wraps ``df.localCheckpoint(eager=True)``:

  * ``roll = RollingCheckpoint(spark); df = roll(df)`` inside the loop —
    each call checkpoints the new generation and unpersists generations
    older than ``keep`` (default 2: the previous generation often feeds a
    convergence check AFTER the new one is created, so it must survive
    one extra round — and an unpersisted localCheckpoint CANNOT be
    recomputed, its lineage is truncated by construction).
  * ``roll.pin(df)`` for loop-invariant inputs (edge tables) — pinned for
    the whole loop, released by ``finish()``.
  * ``roll.finish()`` after the loop — releases pinned inputs and every
    generation except the NEWEST (the returned DataFrame's contents live
    in it).

The pinned RDD id is read EXACTLY off the checkpointed Dataset: its
analyzed plan is a LogicalRDD whose ``rdd`` IS the RDD localCheckpoint
pinned (Dataset.rdd would wrap it in a new conversion RDD whose
unpersist releases nothing). Exact attribution matters: a diff of the
context's persistent-RDD map around the call — the obvious alternative —
also captures any CALLER cache that happens to materialize inside the
checkpoint action (e.g. pagerank over a df whose parent was .cache()d
but not yet materialized) and would then silently unpersist the user's
cache on finish(). Verified live: cache id and checkpoint id both appear
in the map during one eager checkpoint; only the LogicalRDD id is ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pinned_ids(sc) -> set[int]:
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def release_session_storage(spark) -> None:
    """Benchmark/test session hygiene: drop the SQL cache, unpersist every
    persistent RDD, and force a FULL JVM gc. Unpersisted blocks and
    shuffle referents otherwise linger in old-gen and thrash a later
    query's large Arrow allocations (measured 5-20x inflation of a media
    decode stage behind heavy dedup/codec queries at 10x scale).

    This releases EVERYTHING, including caches the caller still wants —
    it is for between-measurement resets (bench.py, bench_scale.py, test
    fixtures), never inside an operator; operators use RollingCheckpoint
    for surgical release."""
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


class RollingCheckpoint:
    """Checkpoint successive generations of a loop's state DataFrame,
    releasing superseded generations' storage as the loop advances."""

    def __init__(self, spark, keep: int = 2):
        if keep < 1:
            raise ValueError("keep must be >= 1 (the newest generation)")
        self._sc = spark.sparkContext
        self._keep = keep
        self._gens: list[set[int]] = []
        self._static: set[int] = set()
        self._persisted: list[DataFrame] = []

    def _checkpoint(self, df: DataFrame) -> tuple[DataFrame, set[int]]:
        out = df.localCheckpoint(eager=True)
        plan = out._jdf.queryExecution().analyzed()
        # a checkpointed Dataset's analyzed plan is a LogicalRDD holding
        # the pinned RDD itself; if a Spark version ever changes that
        # shape, fail loudly rather than mis-attribute (see module doc)
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            raise RuntimeError(
                "localCheckpoint no longer yields a LogicalRDD plan "
                f"(got {plan.getClass().getName()}); RollingCheckpoint "
                "needs updating for this Spark version"
            )
        return out, {int(plan.rdd().id())}

    def pin(self, df: DataFrame) -> DataFrame:
        """Checkpoint a loop-invariant input; released by finish()."""
        out, ids = self._checkpoint(df)
        self._static |= ids
        return out

    def pin_partitioned(
        self, df: DataFrame, *cols: str, num_partitions: int | None = None
    ) -> DataFrame:
        """Pin a loop-invariant input WITH its hash partitioning visible
        to Catalyst. ``localCheckpoint`` erases outputPartitioning (the
        plan collapses to a LogicalRDD with UnknownPartitioning — see
        any post-checkpoint explain), so a loop that joins the pinned
        table on the same key every round pays a full re-shuffle of it
        every round; at cluster scale that is O(iterations x table)
        instead of O(table). ``persist`` keeps the logical plan, and an
        InMemoryRelation PRESERVES the repartition's HashPartitioning —
        per-round joins keyed on ``cols`` then need no exchange on this
        side (only a sort). Lineage is not cut, which is exactly right
        for a loop-INVARIANT input: its lineage never grows.

        Materialized eagerly (count) like the checkpoint path; released
        by finish()/abort() with the other pinned inputs."""
        n = (
            num_partitions
            if num_partitions is not None
            else self._sc.defaultParallelism
        )
        out = df.repartition(n, *cols).persist()
        out.count()
        self._persisted.append(out)
        return out

    def __call__(self, df: DataFrame) -> DataFrame:
        out, ids = self._checkpoint(df)
        self._gens.append(ids)
        while len(self._gens) > self._keep:
            self._release(self._gens.pop(0))
        return out

    def finish(self) -> None:
        """Release pinned inputs and all generations except the newest —
        call once the loop is done; the returned state stays live."""
        self._release(self._static)
        self._static = set()
        for df in self._persisted:
            df.unpersist()
        self._persisted = []
        while len(self._gens) > 1:
            self._release(self._gens.pop(0))

    def abort(self) -> None:
        """Release EVERYTHING, newest generation included — the failure
        path (no result will be returned), so nothing may stay pinned."""
        self._release(self._static)
        self._static = set()
        for df in self._persisted:
            df.unpersist()
        self._persisted = []
        while self._gens:
            self._release(self._gens.pop(0))

    def _release(self, ids: set[int]) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for rid in ids:
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist()
