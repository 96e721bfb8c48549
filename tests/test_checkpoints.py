"""RollingCheckpoint: rolling release of superseded localCheckpoint
generations (plans/checkpoints.py) — the storage-hygiene contract the
driver-loop operators (pagerank, connected_components) rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from starlight_for_kafka_spark.plans.checkpoints import (
    RollingCheckpoint,
    _pinned_ids,
    release_session_storage,
)


def _clear_all(spark):
    release_session_storage(spark)


def test_rolling_releases_superseded_generations(spark):
    _clear_all(spark)
    sc = spark.sparkContext
    base = len(_pinned_ids(sc))
    roll = RollingCheckpoint(spark, keep=2)
    df = spark.range(100).withColumn("v", F.lit(0))
    for i in range(6):
        df = roll(df.withColumn("v", F.col("v") + 1))
    # at most `keep` generations pinned, never 6
    assert len(_pinned_ids(sc)) - base <= 2
    assert [r.v for r in df.limit(1).collect()] == [6]
    roll.finish()
    # newest generation survives finish — the result is still readable
    assert df.count() == 100
    assert len(_pinned_ids(sc)) - base <= 1


def test_pin_survives_rolling_and_finish_releases_it(spark):
    _clear_all(spark)
    sc = spark.sparkContext
    base = len(_pinned_ids(sc))
    roll = RollingCheckpoint(spark, keep=1)
    edges = roll.pin(spark.range(50).withColumnRenamed("id", "e"))
    state = roll(spark.range(50).withColumnRenamed("id", "node"))
    for _ in range(4):
        # the pinned input joins against every generation
        state = roll(state.join(edges, state["node"] == edges["e"]).select("node"))
    assert state.count() == 50
    pinned_during = len(_pinned_ids(sc)) - base
    assert pinned_during <= 2  # pinned input + newest generation
    roll.finish()
    assert len(_pinned_ids(sc)) - base <= 1  # only the newest generation
    assert state.count() == 50  # result still live after finish


def test_keep_must_be_positive(spark):
    import pytest

    with pytest.raises(ValueError):
        RollingCheckpoint(spark, keep=0)
