"""Avro binary codec + Confluent wire path.

Codec bytes are pinned against the examples in the public Avro spec
(§Binary Encoding gives e.g. long 1 → 0x02, "foo" → 06 66 6f 6f), then
round-trip and resolution semantics are exercised, then the Spark
operators (avro_encode / avro_decode over mapInPandas) are driven
end-to-end. Reference parity target: the broker's schema path decodes
Confluent-framed Avro per record (ByteBufUtils.java:301-312,
tests/.../SchemaRegistryTest.java)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from starlight_for_kafka_spark.functions import avro_codec as ac
from starlight_for_kafka_spark.operators import registry as reg


# --------------------------------------------------------------------- #
# binary encoding pinned to spec examples
# --------------------------------------------------------------------- #


def test_zigzag_spec_examples():
    # Avro spec binary-encoding table: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    for n, expected in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        assert ac.encode(n, "long") == expected, n


def test_string_spec_example():
    assert ac.encode("foo", "string") == b"\x06foo"


def test_array_spec_example():
    # spec: [3, 27] as array<long> → 04 06 36 00
    assert ac.encode([3, 27], {"type": "array", "items": "long"}) == b"\x04\x06\x36\x00"


def test_union_null_encoding():
    # union [null, string]: null → branch 0 → 00; "a" → 02 02 61
    u = ["null", "string"]
    assert ac.encode(None, u) == b"\x00"
    assert ac.encode("a", u) == b"\x02\x02a"


def test_float_double_little_endian():
    import struct

    assert ac.encode(1.5, "float") == struct.pack("<f", 1.5)
    assert ac.encode(1.5, "double") == struct.pack("<d", 1.5)


# --------------------------------------------------------------------- #
# roundtrip + resolution
# --------------------------------------------------------------------- #

WRITER = {
    "type": "record", "name": "Order", "fields": [
        {"name": "id", "type": "int"},
        {"name": "amount", "type": "double"},
        {"name": "tag", "type": ["null", "string"], "default": None},
        {"name": "legacy", "type": "string"},
        {"name": "items", "type": {"type": "array", "items": "int"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "nested", "type": {"type": "record", "name": "N",
                                    "fields": [{"name": "x", "type": "int"}]}},
    ],
}
READER = {
    "type": "record", "name": "Order", "fields": [
        {"name": "id", "type": "long"},
        {"name": "amount", "type": "double"},
        {"name": "tag", "type": ["null", "string"], "default": None},
        {"name": "added", "type": "string", "default": "dflt"},
        {"name": "items", "type": {"type": "array", "items": "long"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "nested", "type": {"type": "record", "name": "N",
                                    "fields": [{"name": "x", "type": "long"},
                                               {"name": "y", "type": "int", "default": 7}]}},
    ],
}
VALUE = {"id": 42, "amount": 3.5, "tag": "hi", "legacy": "old",
         "items": [1, 2, 3], "attrs": {"a": 10}, "nested": {"x": 5}}


def test_record_roundtrip_self():
    assert ac.decode(ac.encode(VALUE, WRITER), WRITER) == VALUE


def test_record_resolution():
    out = ac.decode(ac.encode(VALUE, WRITER), WRITER, READER)
    assert out == {"id": 42, "amount": 3.5, "tag": "hi", "added": "dflt",
                   "items": [1, 2, 3], "attrs": {"a": 10},
                   "nested": {"x": 5, "y": 7}}
    assert isinstance(out["id"], int)


def test_resolution_missing_default_fails():
    bad_reader = {"type": "record", "name": "Order",
                  "fields": WRITER["fields"][:4] + [{"name": "nope", "type": "int"}]}
    with pytest.raises(ValueError):
        ac.decode(ac.encode(VALUE, WRITER), WRITER, bad_reader)


def test_enum_and_fixed_roundtrip():
    sch = {"type": "record", "name": "R", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
        {"name": "f", "type": {"type": "fixed", "name": "F", "size": 3}},
    ]}
    v = {"e": "B", "f": b"xyz"}
    assert ac.decode(ac.encode(v, sch), sch) == v


def test_enum_reader_default_for_unknown_symbol():
    w = {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}
    r = {"type": "enum", "name": "E", "symbols": ["A", "B"], "default": "A"}
    assert ac.decode(ac.encode("C", w), w, r) == "A"


def test_union_branch_reresolution():
    # writer [null, int], reader [null, long]: int branch promotes
    w = ["null", "int"]
    r = ["null", "long"]
    assert ac.decode(ac.encode(5, w), w, r) == 5
    assert ac.decode(ac.encode(None, w), w, r) is None


def test_bytes_string_promotion():
    assert ac.decode(ac.encode("hi", "string"), "string", "bytes") == b"hi"
    assert ac.decode(ac.encode(b"hi", "bytes"), "bytes", "string") == "hi"


def test_negative_block_count_decode():
    # spec: arrays may be written as negative count + byte size
    payload = b"\x03\x04\x06\x36\x00"  # count -2, size 2, items 3, 27, end
    assert ac.decode(payload, {"type": "array", "items": "long"}) == [3, 27]


# --------------------------------------------------------------------- #
# can_read (full resolution compatibility)
# --------------------------------------------------------------------- #


def test_can_read_nested_and_promotion():
    assert ac.can_read(json.dumps(READER), json.dumps(WRITER))
    # reverse fails: 'legacy' in writer-as-reader has no default
    assert not ac.can_read(json.dumps(WRITER), json.dumps(READER))


def test_can_read_union_widening():
    base = {"type": "record", "name": "R",
            "fields": [{"name": "a", "type": "string"}]}
    widened = {"type": "record", "name": "R",
               "fields": [{"name": "a", "type": ["string", "int"]}]}
    assert ac.can_read(json.dumps(widened), json.dumps(base))
    assert not ac.can_read(json.dumps(base), json.dumps(widened))


def test_can_read_name_mismatch():
    a = {"type": "record", "name": "A", "fields": []}
    b = {"type": "record", "name": "B", "fields": []}
    assert not ac.can_read(json.dumps(a), json.dumps(b))


def test_to_spark_type():
    assert ac.to_spark_type(["null", "long"]) == "bigint"
    assert ac.to_spark_type({"type": "array", "items": "string"}) == "array<string>"
    assert ac.to_spark_type(READER).startswith("struct<id: bigint")


# --------------------------------------------------------------------- #
# Spark operators: Confluent-framed encode → decode with mixed writers
# --------------------------------------------------------------------- #

V1 = json.dumps({"type": "record", "name": "Evt", "fields": [
    {"name": "k", "type": "long"},
    {"name": "n", "type": "int"},
    {"name": "note", "type": "string"},
]})
V2 = json.dumps({"type": "record", "name": "Evt", "fields": [
    {"name": "k", "type": "long"},
    {"name": "n", "type": "long"},
    {"name": "tag", "type": ["null", "string"], "default": None},
]})
RD = json.dumps({"type": "record", "name": "Evt", "fields": [
    {"name": "k", "type": "long"},
    {"name": "n", "type": "long"},
    {"name": "tag", "type": ["null", "string"], "default": None},
    {"name": "src", "type": "string", "default": "log"},
]})


def test_spark_avro_roundtrip_mixed_writers(spark):
    df = spark.range(20).select(
        F.col("id").alias("k"),
        ((F.col("id") % 2) + 1).cast("int").alias("schema_id"),
    )
    rec1 = df.filter("schema_id = 1").withColumn(
        "record", F.struct(F.col("k"), (F.col("k") * 10).cast("int").alias("n"),
                           F.lit("x").alias("note")))
    rec2 = df.filter("schema_id = 2").withColumn(
        "record", F.struct(F.col("k"), (F.col("k") * 10).alias("n"),
                           F.when(F.col("k") % 3 == 0, F.lit(None).cast("string"))
                            .otherwise(F.lit("t")).alias("tag")))
    schemas = {1: V1, 2: V2}
    enc = reg.avro_encode(rec1, schemas).unionByName(reg.avro_encode(rec2, schemas))
    assert dict(enc.dtypes)["value"] == "binary"

    dec = reg.avro_decode(enc, schemas, RD)
    rows = {r.k: r for r in dec.collect()}
    assert len(rows) == 20
    for k, r in rows.items():
        assert r.typed.n == k * 10
        assert r.typed.src == "log"
        if r.schema_id == 1:
            assert r.typed.tag is None  # reader default
        else:
            assert r.typed.tag == (None if k % 3 == 0 else "t")


def test_spark_avro_wire_header(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.lit(7).cast("int").alias("schema_id"),
        F.struct(F.col("id").alias("k"), F.lit(1).cast("int").alias("n"),
                 F.lit("z").alias("note")).alias("record"))
    enc = reg.avro_encode(df, {7: V1})
    raw = bytes(enc.first().value)
    assert raw[0:1] == b"\x00" and raw[1:5] == b"\x00\x00\x00\x07"
    # strip_schema_id (column path) agrees with the kernel's framing
    sid, payload = reg.strip_schema_id(F.col("value"))
    got = enc.select(sid.alias("sid"), payload.alias("p")).first()
    assert got.sid == 7 and bytes(got.p) == raw[5:]
