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

The pinned RDD ids are found by diffing the context's persistent-RDD map
around the checkpoint call — the only stable public handle on the RDD a
Dataset.localCheckpoint pins (Dataset.rdd would wrap it in a new
conversion RDD whose unpersist releases nothing). The diff can attribute
a concurrent thread's cache to this loop, so single-writer-per-session
is the contract — exactly how the repo's driver-loop operators run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pinned_ids(sc) -> set[int]:
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


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

    def _checkpoint(self, df: DataFrame) -> tuple[DataFrame, set[int]]:
        before = _pinned_ids(self._sc)
        out = df.localCheckpoint(eager=True)
        return out, _pinned_ids(self._sc) - before

    def pin(self, df: DataFrame) -> DataFrame:
        """Checkpoint a loop-invariant input; released by finish()."""
        out, ids = self._checkpoint(df)
        self._static |= ids
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
        while len(self._gens) > 1:
            self._release(self._gens.pop(0))

    def _release(self, ids: set[int]) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for rid in ids:
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist()
