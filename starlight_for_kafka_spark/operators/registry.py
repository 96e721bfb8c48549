"""Schema registry as a dimension table + compatibility checking.

Reference: a Confluent-compatible registry storing (subject, version, id,
type, definition) with BACKWARD/FORWARD/FULL(+TRANSITIVE) compatibility
enforcement (schema-registry/.../model/Schema.java, SchemaStorage.java,
CompatibilityChecker.java:88-163) and the Confluent 5-byte wire header
``0x00 + int32 schemaId`` prepended to payloads
(kafka-impl/.../utils/ByteBufUtils.prependSchemaId:301-312).

Spark-first: the registry IS a small dimension table; lookups are broadcast
joins; compatibility is a pure function over schema definitions evaluated
driver-side at registration time (it guards writes — it is not a data-plane
operator). Wire-format encode/decode are column expressions.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SUBJECT_SCHEMA = "subject string, version int, id int, type string, definition string"

MAGIC_BYTE = b"\x00"


# --------------------------------------------------------------------- #
# compatibility rules (CompatibilityChecker.java:88-163 semantics)
# --------------------------------------------------------------------- #


def _avro_fields(definition: str) -> dict[str, dict]:
    schema = json.loads(definition)
    return {f["name"]: f for f in schema.get("fields", [])}


def _can_read(reader_def: str, writer_def: str) -> bool:
    """Can data written with ``writer`` be read with ``reader``? (Avro
    record-level resolution, simplified to the rules the reference's
    checker enforces: reader-only fields need defaults; shared fields must
    keep the same type.)"""
    reader, writer = _avro_fields(reader_def), _avro_fields(writer_def)
    for name, rf in reader.items():
        if name not in writer:
            if "default" not in rf:
                return False
        elif rf.get("type") != writer[name].get("type"):
            return False
    return True


def check_compatibility(mode: str, new_def: str, prior_defs: list[str]) -> bool:
    """Verdict for registering ``new_def`` after ``prior_defs`` (oldest →
    newest) under ``mode`` — the reference's verify loop
    (CompatibilityChecker.java:139-163): non-TRANSITIVE modes check only the
    latest prior version; TRANSITIVE modes check all."""
    if not prior_defs or mode == "NONE":
        return True
    mode = mode.upper()
    transitive = mode.endswith("_TRANSITIVE")
    base = mode.replace("_TRANSITIVE", "")
    against = prior_defs if transitive else prior_defs[-1:]
    for prior in against:
        backward = _can_read(new_def, prior)  # new schema reads old data
        forward = _can_read(prior, new_def)  # old schema reads new data
        ok = {
            "BACKWARD": backward,
            "FORWARD": forward,
            "FULL": backward and forward,
        }.get(base)
        if ok is None:
            raise ValueError(f"unknown compatibility mode: {mode}")
        if not ok:
            return False
    return True


# --------------------------------------------------------------------- #
# registry table operations
# --------------------------------------------------------------------- #


def create_registry(spark: SparkSession, rows: list | None = None) -> DataFrame:
    return spark.createDataFrame(rows or [], SUBJECT_SCHEMA)


def register_schema(
    registry: DataFrame, subject: str, schema_type: str, definition: str, mode: str = "BACKWARD"
) -> DataFrame:
    """CREATE version: validate compatibility against the subject's history,
    then append with the next version/id (SchemaStorage.create path)."""
    history = [
        r.definition
        for r in registry.filter(F.col("subject") == subject).orderBy("version").collect()
    ]
    if not check_compatibility(mode, definition, history):
        raise ValueError(f"incompatible schema for subject {subject} under {mode}")
    spark = registry.sparkSession
    next_version = len(history) + 1
    next_id = (registry.agg(F.coalesce(F.max("id"), F.lit(0))).first()[0] or 0) + 1
    new_row = spark.createDataFrame(
        [(subject, next_version, next_id, schema_type, definition)], SUBJECT_SCHEMA
    )
    return registry.unionByName(new_row)


def latest_schemas(registry: DataFrame) -> DataFrame:
    """GET /subjects/{s}/versions/latest for every subject — the same
    latest-wins shape as offset compaction."""
    w = Window.partitionBy("subject").orderBy(F.col("version").desc())
    return (
        registry.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lookup_by_id(registry: DataFrame, schema_id: int) -> DataFrame:
    return registry.filter(F.col("id") == schema_id)


# --------------------------------------------------------------------- #
# Confluent wire format (ByteBufUtils.prependSchemaId:301-312)
# --------------------------------------------------------------------- #


def prepend_schema_id(value: Column, schema_id: Column | int) -> Column:
    """value → 0x00 + int32(schemaId) + value, as on the reference's decode
    path when kafkaApplyAvroSchemaOnDecode is set."""
    sid = F.lit(schema_id) if isinstance(schema_id, int) else schema_id
    header = F.concat(
        F.lit(MAGIC_BYTE),
        F.unhex(F.lpad(F.hex(sid.cast("int")), 8, "0")),
    )
    return F.concat(header, value)


def strip_schema_id(value: Column) -> tuple[Column, Column]:
    """Inverse: returns (schema_id, payload) columns."""
    sid = F.conv(F.hex(F.substring(value, 2, 4)), 16, 10).cast("int")
    payload = F.substring(value, 6, 2147483647)
    return sid, payload


def typed_view(log: DataFrame, payload_schema: str) -> DataFrame:
    """A typed view over a log table: parse JSON payloads with the subject's
    schema (from_json; Avro payloads would use from_avro — the avro jar
    isn't in this container, so JSON is the in-repo typed path and the Avro
    call is the same one-line projection)."""
    return log.withColumn(
        "typed", F.from_json(F.col("value").cast("string"), payload_schema)
    )
