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


# --------------------------------------------------------------------- #
# per-type checkers (CompatibilityChecker.createChecker:125-136)
# --------------------------------------------------------------------- #

J1 = ('{"type":"object","properties":{"id":{"type":"integer"},'
      '"name":{"type":"string"}},"required":["id"]}')
P1 = "message Evt {\n  optional int64 id = 1;\n  optional string name = 2;\n}"


def test_json_compat_widening():
    relaxed = J1.replace('"id":{"type":"integer"}', '"id":{"type":"number"}')
    assert reg.check_compatibility("BACKWARD", relaxed, [J1], "JSON")
    assert not reg.check_compatibility("FORWARD", relaxed, [J1], "JSON")
    # new required field breaks backward (old data may lack it)
    stricter = J1.replace('"required":["id"]', '"required":["id","name"]')
    assert not reg.check_compatibility("BACKWARD", stricter, [J1], "JSON")
    assert reg.check_compatibility("FORWARD", stricter, [J1], "JSON")


def test_json_compat_enum_and_closed_object():
    base = '{"type":"object","properties":{"s":{"type":"string","enum":["a","b"]}}}'
    wider = base.replace('["a","b"]', '["a","b","c"]')
    assert reg.check_compatibility("BACKWARD", wider, [base], "JSON")
    assert not reg.check_compatibility("BACKWARD", base, [wider], "JSON")
    closed = '{"type":"object","properties":{"x":{"type":"integer"}},"additionalProperties":false}'
    open_ = closed.replace(',"additionalProperties":false', "")
    assert reg.check_compatibility("BACKWARD", open_, [closed], "JSON")
    assert not reg.check_compatibility("BACKWARD", closed, [open_], "JSON")


def test_proto_compat_rules():
    added = P1.replace("}", "  optional int32 n = 3;\n}")
    assert reg.check_compatibility("BACKWARD", added, [P1], "PROTOBUF")
    retyped = P1.replace("optional string name = 2;", "optional int32 name = 2;")
    assert not reg.check_compatibility("BACKWARD", retyped, [P1], "PROTOBUF")
    relabeled = P1.replace("optional string name = 2;", "repeated string name = 2;")
    assert not reg.check_compatibility("BACKWARD", relabeled, [P1], "PROTOBUF")
    removed_ok = P1.replace("optional string name = 2;", "reserved 2;")
    assert reg.check_compatibility("BACKWARD", removed_ok, [P1], "PROTOBUF")
    removed_bad = P1.replace("  optional string name = 2;\n", "")
    assert not reg.check_compatibility("BACKWARD", removed_bad, [P1], "PROTOBUF")
    # only BACKWARD modes are supported for protobuf — reference returns
    # incompatible for the rest (CompatibilityChecker.java:120-122,148-149)
    assert not reg.check_compatibility("FORWARD", added, [P1], "PROTOBUF")
    assert not reg.check_compatibility("FULL", added, [P1], "PROTOBUF")
    assert reg.check_compatibility("BACKWARD_TRANSITIVE", added, [P1], "PROTOBUF")


def test_avro_compat_nested_resolution():
    n1 = ('{"type":"record","name":"O","fields":[{"name":"inner","type":'
          '{"type":"record","name":"I","fields":[{"name":"x","type":"int"}]}}]}')
    promoted = n1.replace('"type":"int"', '"type":"long"')
    assert reg.check_compatibility("BACKWARD", promoted, [n1], "AVRO")
    assert not reg.check_compatibility("FORWARD", promoted, [n1], "AVRO")


def test_delete_subject_and_version(spark):
    r = reg.create_registry(spark)
    r = reg.register_schema(r, "a-value", "AVRO", V1)
    r = reg.register_schema(r, "a-value", "AVRO", V2_ADD_DEFAULT)
    r = reg.register_schema(r, "b-value", "AVRO", V1)
    r2, deleted = reg.delete_subject(r, "b-value")
    assert [(x.subject, x.version) for x in deleted.collect()] == [("b-value", 1)]
    assert r2.filter(F.col("subject") == "b-value").count() == 0
    r3 = reg.delete_version(r2, "a-value", 1)
    rows = sorted((x.subject, x.version) for x in r3.collect())
    assert rows == [("a-value", 2)]  # v2 keeps its number
    latest = reg.latest_schemas(r3).first()
    assert latest.version == 2


def test_per_subject_compat_config(spark):
    """ConfigResource GET/PUT /config/{subject} + MemorySchemaStorage
    default: unset subjects resolve NONE; set modes gate registration."""
    from starlight_for_kafka_spark.operators import registry as reg_ops

    cfg = reg_ops.create_config(spark)
    assert reg_ops.get_compatibility(cfg, "anything") == "NONE"
    cfg = reg_ops.set_compatibility(cfg, "s1", "BACKWARD")
    cfg = reg_ops.set_compatibility(cfg, "s1", "FULL")  # upsert, not append
    assert reg_ops.get_compatibility(cfg, "s1") == "FULL"
    assert cfg.filter("subject = 's1'").count() == 1
    import pytest
    with pytest.raises(ValueError, match="mode"):
        reg_ops.set_compatibility(cfg, "s1", "SIDEWAYS")

    v1 = '{"type":"record","name":"U","fields":[{"name":"id","type":"long"}]}'
    bad = ('{"type":"record","name":"U","fields":[{"name":"id","type":"long"},'
           '{"name":"x","type":"long"}]}')
    reg = reg_ops.create_registry(spark)
    reg = reg_ops.register_schema(reg, "s1", "AVRO", v1, mode=None, config=cfg)
    with pytest.raises(ValueError, match="incompatible"):
        reg_ops.register_schema(reg, "s1", "AVRO", bad, mode=None, config=cfg)
    # same candidate sails through on an unconfigured (NONE) subject
    reg = reg_ops.register_schema(reg, "s2", "AVRO", v1, mode=None, config=cfg)
    reg_ops.register_schema(reg, "s2", "AVRO", bad, mode=None, config=cfg)


def test_schema_references_resolve_and_gate_compat(spark):
    """SubjectResource.CreateSchemaRequest.references: referenced
    definitions inline into the stored schema; compat checks see the
    resolved form; unresolvable references reject registration."""
    import pytest

    from starlight_for_kafka_spark.operators import registry as reg_ops

    inner_v1 = '{"type":"record","name":"Inner","fields":[{"name":"x","type":"int"}]}'
    outer = ('{"type":"record","name":"Outer","fields":['
             '{"name":"inner","type":"Inner"}]}')
    reg = reg_ops.create_registry(spark)
    reg = reg_ops.register_schema(reg, "inner-value", "AVRO", inner_v1, mode="NONE")
    reg = reg_ops.register_schema(
        reg, "outer-value", "AVRO", outer, mode="BACKWARD",
        references=[{"name": "Inner", "subject": "inner-value", "version": "latest"}],
    )
    stored = reg.filter("subject = 'outer-value'").first().definition
    assert '"Inner"' in stored and '"x"' in stored  # inlined, not a bare name
    # a v2 Outer whose reference resolves to an Inner that DROPPED x (no
    # default) is backward-incompatible THROUGH the reference
    inner_v2 = '{"type":"record","name":"Inner","fields":[{"name":"y","type":"int"}]}'
    reg2 = reg_ops.register_schema(reg, "inner2-value", "AVRO", inner_v2, mode="NONE")
    with pytest.raises(ValueError, match="incompatible"):
        reg_ops.register_schema(
            reg2, "outer-value", "AVRO", outer, mode="BACKWARD",
            references=[{"name": "Inner", "subject": "inner2-value", "version": 1}],
        )
    with pytest.raises(ValueError, match="unresolvable"):
        reg_ops.register_schema(
            reg, "outer-value", "AVRO", outer, mode="NONE",
            references=[{"name": "Inner", "subject": "nope", "version": 1}],
        )


def test_avro_decode_tombstone_and_unknown_id_null_out(spark):
    """NULL values (tombstones) and frames with an unregistered schema id
    must null out like malformed frames — never kill the task."""
    import struct

    from starlight_for_kafka_spark.functions import avro_codec as ac
    from starlight_for_kafka_spark.operators import registry as reg

    schema = '{"type":"record","name":"R","fields":[{"name":"k","type":"long"}]}'
    good = b"\x00" + struct.pack(">i", 1) + ac.encode({"k": 7}, ac.parse_schema(schema))
    unknown = b"\x00" + struct.pack(">i", 99) + b"\x02"
    log = spark.createDataFrame(
        [(0, 0, good), (0, 1, None), (0, 2, unknown)],
        "partition int, offset long, value binary",
    )
    out = {r.offset: (r.schema_id, r.typed) for r in
           reg.avro_decode(log, {1: schema}, schema).collect()}
    assert out[0][0] == 1 and out[0][1] is not None
    assert out[1] == (None, None)          # tombstone
    assert out[2][0] == 99 and out[2][1] is None  # unknown id quarantined


def test_register_after_delete_never_reuses_version(spark):
    from starlight_for_kafka_spark.operators import registry as reg

    s1 = '{"type":"record","name":"R","fields":[]}'
    r = reg.create_registry(spark)
    r = reg.register_schema(r, "s-value", "AVRO", s1, mode="NONE")
    r = reg.register_schema(r, "s-value", "AVRO", s1, mode="NONE")
    r = reg.register_schema(r, "s-value", "AVRO", s1, mode="NONE")
    r = reg.delete_version(r, "s-value", 2)
    r = reg.register_schema(r, "s-value", "AVRO", s1, mode="NONE")
    versions = sorted(x.version for x in r.filter(r.subject == "s-value").collect())
    assert versions == [1, 3, 4]  # 2 deleted, 3 NOT reissued


def test_proto_reserved_range_syntax():
    from starlight_for_kafka_spark.operators.registry import _proto_parse

    _fields, reserved, _oneofs = _proto_parse(
        "message M {\n  int64 a = 1;\n  reserved 2, 15;\n  reserved 16 to 20;\n}"
    )
    assert reserved == {2, 15, 16, 17, 18, 19, 20}


def test_compatibility_mode_case_insensitive():
    from starlight_for_kafka_spark.operators.registry import check_compatibility

    s = '{"type":"record","name":"R","fields":[]}'
    assert check_compatibility("none", s, [s]) is True


def test_proto_wire_group_widening():
    """Scalar swaps within a wire group are compatible (public protobuf
    'Updating A Message Type' rules); crossing groups is not."""
    from starlight_for_kafka_spark.operators.registry import _proto_backward_ok

    old = "message M {\n  optional int32 a = 1;\n  optional string s = 2;\n}"
    ok = [
        ("optional int32 a = 1;", "optional int64 a = 1;"),
        ("optional int32 a = 1;", "optional uint32 a = 1;"),
        ("optional int32 a = 1;", "optional bool a = 1;"),
        ("optional string s = 2;", "optional bytes s = 2;"),
    ]
    bad = [
        ("optional int32 a = 1;", "optional sint32 a = 1;"),
        ("optional int32 a = 1;", "optional fixed32 a = 1;"),
        ("optional int32 a = 1;", "optional string a = 1;"),
        ("optional string s = 2;", "optional int32 s = 2;"),
    ]
    for frm, to in ok:
        assert _proto_backward_ok(old.replace(frm, to), old), (frm, to)
    for frm, to in bad:
        assert not _proto_backward_ok(old.replace(frm, to), old), (frm, to)


def test_proto_oneof_move_rules():
    """Oneof evolution per the public Confluent/protobuf rules: one
    existing field into a NEW oneof is safe; fusing two, moving into an
    existing oneof, moving out, removing from a oneof are breaking;
    adding a brand-new field to an existing oneof is fine."""
    from starlight_for_kafka_spark.operators.registry import _proto_backward_ok

    plain = "message M {\n  optional int64 id = 1;\n  optional string name = 2;\n}"
    one_moved = "message M {\n  optional int64 id = 1;\n  oneof pick {\n    string name = 2;\n  }\n}"
    both_moved = "message M {\n  oneof pick {\n    int64 id = 1;\n    string name = 2;\n  }\n}"
    assert _proto_backward_ok(one_moved, plain)
    assert not _proto_backward_ok(both_moved, plain)
    with_oneof = one_moved
    added = one_moved.replace(
        "    string name = 2;", "    string name = 2;\n    bytes alt = 3;"
    )
    assert _proto_backward_ok(added, with_oneof)
    # moving id into the EXISTING oneof is breaking
    assert not _proto_backward_ok(both_moved, with_oneof)
    # moving name back OUT of the oneof is breaking
    assert not _proto_backward_ok(plain, with_oneof)
    # removing the oneof field entirely is breaking even when reserved
    removed = "message M {\n  optional int64 id = 1;\n  reserved 2;\n}"
    assert not _proto_backward_ok(removed, with_oneof)
    # moving between two oneofs is breaking
    other = "message M {\n  optional int64 id = 1;\n  oneof other {\n    string name = 2;\n  }\n}"
    assert not _proto_backward_ok(other, with_oneof)
