"""Schema-registry tests mirroring SchemaRegistryTest /
CompatibilityChecker.java verdicts (fixture F7 evolution chains)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from starlight_for_kafka_spark.operators import registry as reg

V1 = json.dumps(
    {"type": "record", "name": "r", "fields": [{"name": "a", "type": "string"}]}
)
V2_ADD_DEFAULT = json.dumps(
    {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "string"},
            {"name": "b", "type": "int", "default": 0},
        ],
    }
)
V2_ADD_NO_DEFAULT = json.dumps(
    {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "string"}, {"name": "b", "type": "int"}],
    }
)
V2_REMOVE = json.dumps({"type": "record", "name": "r", "fields": []})
V2_TYPE_CHANGE = json.dumps(
    {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
)


def test_backward_verdicts():
    assert reg.check_compatibility("BACKWARD", V2_ADD_DEFAULT, [V1])
    assert not reg.check_compatibility("BACKWARD", V2_ADD_NO_DEFAULT, [V1])
    assert reg.check_compatibility("BACKWARD", V2_REMOVE, [V1])  # new reader ignores old field
    assert not reg.check_compatibility("BACKWARD", V2_TYPE_CHANGE, [V1])


def test_forward_verdicts():
    # forward: old schema must read new data → removing a field w/o default breaks it
    assert reg.check_compatibility("FORWARD", V2_ADD_NO_DEFAULT, [V1])
    assert not reg.check_compatibility("FORWARD", V2_REMOVE, [V1])
    assert reg.check_compatibility("FORWARD", V2_ADD_DEFAULT, [V1])


def test_full_and_transitive():
    assert reg.check_compatibility("FULL", V2_ADD_DEFAULT, [V1])
    assert not reg.check_compatibility("FULL", V2_ADD_NO_DEFAULT, [V1])
    # transitive checks all priors: V1 → V2_ADD_DEFAULT → back to V1-shape
    assert reg.check_compatibility("BACKWARD_TRANSITIVE", V2_ADD_DEFAULT, [V1, V2_ADD_DEFAULT])
    assert reg.check_compatibility("NONE", V2_TYPE_CHANGE, [V1])


def test_register_and_latest(spark):
    r = reg.create_registry(spark)
    r = reg.register_schema(r, "topic-value", "AVRO", V1)
    r = reg.register_schema(r, "topic-value", "AVRO", V2_ADD_DEFAULT)
    with pytest.raises(ValueError):
        reg.register_schema(r, "topic-value", "AVRO", V2_TYPE_CHANGE)
    latest = reg.latest_schemas(r).collect()
    assert len(latest) == 1 and latest[0].version == 2 and latest[0].id == 2


def test_wire_format_roundtrip(spark):
    df = spark.createDataFrame([(b"payload-bytes",)], "value binary")
    wrapped = df.select(reg.prepend_schema_id(F.col("value"), 7).alias("v"))
    sid, payload = reg.strip_schema_id(F.col("v"))
    out = wrapped.select(sid.alias("sid"), payload.alias("p")).first()
    assert out.sid == 7
    assert bytes(out.p) == b"payload-bytes"


def test_typed_view_over_log(spark, log):
    typed = reg.typed_view(log.df, "k int")
    row = typed.filter(F.col("typed.k").isNotNull()).first()
    assert row is not None and isinstance(row.typed.k, int)
