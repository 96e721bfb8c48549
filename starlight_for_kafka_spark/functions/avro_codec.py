"""Pure-Python Avro binary codec (encode / decode / schema resolution).

Implements the parts of the public Apache Avro 1.11 specification the
engine needs — binary encoding (zigzag varints, length-prefixed bytes,
block-encoded arrays/maps, union index prefix) plus reader/writer schema
resolution (field matching by name, reader defaults, numeric promotions,
union branch selection) — with zero dependencies, so Confluent-framed
Avro payloads decode inside Arrow-batched Pandas UDFs without the
spark-avro jar or fastavro.

Reference behavior being re-expressed: the broker decodes/encodes real
Confluent-framed Avro on its schema path
(kafka-impl/.../utils/ByteBufUtils.java:301-312 prepends the
``0x00 + int32 id`` wire header; format/PulsarAdminSchemaManager.java
resolves the subject's Avro schema; tests/.../SchemaRegistryTest.java
round-trips typed records end-to-end).

Scale note: per-record Avro decode is inherently row-at-a-time over opaque
bytes (the JVM reference does exactly the same per record). Here it runs
inside mapInPandas over bounded Arrow batches; on a cluster with the
spark-avro jar installed, ``from_avro`` is the drop-in JVM fast path with
identical semantics — this module is the dependency-free fallback and the
authority for resolution rules (compatibility checking reuses
:func:`can_read`).
"""

from __future__ import annotations

import io
import json
import struct

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

# Avro spec "Schema Resolution": writer type → reader types it may promote to.
PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def parse_schema(schema) -> dict | list | str:
    """Normalize a schema given as JSON text or already-parsed value."""
    if isinstance(schema, str) and schema not in PRIMITIVES:
        return json.loads(schema)
    return schema


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


# --------------------------------------------------------------------- #
# binary encode
# --------------------------------------------------------------------- #


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    accum = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        accum |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (accum >> 1) ^ -(accum & 1)


def _union_branch_for(value, branches: list) -> int:
    """Pick the union branch index for a Python value at encode time."""
    def matches(schema) -> bool:
        t = _type_name(schema)
        if value is None:
            return t == "null"
        if isinstance(value, bool):
            return t == "boolean"
        if isinstance(value, int):
            return t in ("int", "long")
        if isinstance(value, float):
            return t in ("float", "double")
        if isinstance(value, str):
            return t in ("string", "enum")
        if isinstance(value, (bytes, bytearray)):
            return t in ("bytes", "fixed")
        if isinstance(value, dict):
            return t in ("record", "map")
        if isinstance(value, (list, tuple)):
            return t == "array"
        return False

    for i, br in enumerate(branches):
        if matches(br):
            return i
    raise TypeError(f"no union branch for {type(value).__name__} in {branches}")


def encode(value, schema) -> bytes:
    """Encode a Python value with ``schema`` to Avro binary (spec §Binary
    Encoding). Records are dicts, arrays are lists, maps are dicts, enums
    are symbol strings, fixed are bytes."""
    schema = parse_schema(schema)
    out = bytearray()
    _encode_into(value, schema, out)
    return bytes(out)


def _encode_into(value, schema, out: bytearray) -> None:
    if isinstance(schema, list):  # union: varint branch index + value
        idx = _union_branch_for(value, schema)
        out += _zigzag_encode(idx)
        _encode_into(value, schema[idx], out)
        return
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        b = bytes(value)
        out += _zigzag_encode(len(b))
        out += b
    elif t == "string":
        b = value.encode("utf-8")
        out += _zigzag_encode(len(b))
        out += b
    elif t == "record":
        for f in schema["fields"]:
            _encode_into(value[f["name"]], f["type"], out)
    elif t == "enum":
        out += _zigzag_encode(schema["symbols"].index(value))
    elif t == "array":
        if value:
            out += _zigzag_encode(len(value))
            for item in value:
                _encode_into(item, schema["items"], out)
        out += _zigzag_encode(0)
    elif t == "map":
        if value:
            out += _zigzag_encode(len(value))
            for k, v in value.items():
                _encode_into(k, "string", out)
                _encode_into(v, schema["values"], out)
        out += _zigzag_encode(0)
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        out += b
    else:
        raise TypeError(f"unsupported schema type: {t}")


# --------------------------------------------------------------------- #
# binary decode with reader/writer resolution (spec §Schema Resolution)
# --------------------------------------------------------------------- #


def decode(data: bytes, writer_schema, reader_schema=None):
    """Decode Avro binary written with ``writer_schema``, resolved against
    ``reader_schema`` (defaults to the writer's): writer-only fields are
    read and discarded, reader-only fields take their defaults, numeric /
    string-bytes promotions apply, and union branches re-resolve."""
    writer_schema = parse_schema(writer_schema)
    reader_schema = writer_schema if reader_schema is None else parse_schema(reader_schema)
    buf = io.BytesIO(data)
    value = _read(buf, writer_schema, reader_schema)
    return value


def _read(buf, writer, reader):
    if isinstance(writer, list):  # writer union: index picks actual branch
        idx = _zigzag_decode(buf)
        branch = writer[idx]
        if isinstance(reader, list):
            rbranch = _match_union_branch(branch, reader)
            if rbranch is None:
                raise TypeError(f"reader union has no branch for writer {branch}")
            return _read(buf, branch, rbranch)
        return _read(buf, branch, reader)
    if isinstance(reader, list) and not isinstance(writer, list):
        rbranch = _match_union_branch(writer, reader)
        if rbranch is None:
            raise TypeError(f"reader union has no branch for writer {writer}")
        return _read(buf, writer, rbranch)

    wt, rt = _type_name(writer), _type_name(reader)
    raw = _read_raw(buf, writer, reader)
    if wt == rt or wt in ("record", "enum", "array", "map", "fixed"):
        return raw
    # primitive promotions
    if rt in PROMOTIONS.get(wt, ()):
        if wt == "string" and rt == "bytes":
            return raw.encode("utf-8")
        if wt == "bytes" and rt == "string":
            return raw.decode("utf-8")
        return float(raw) if rt in ("float", "double") else int(raw)
    raise TypeError(f"cannot resolve writer {wt} against reader {rt}")


def _read_raw(buf, writer, reader):
    t = _type_name(writer)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1)[0] != 0
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_zigzag_decode(buf))
    if t == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if t == "record":
        return _read_record(buf, writer, reader)
    if t == "enum":
        symbol = writer["symbols"][_zigzag_decode(buf)]
        if _type_name(reader) == "enum" and symbol not in reader["symbols"]:
            if "default" in reader:
                return reader["default"]
            raise ValueError(f"enum symbol {symbol} not in reader")
        return symbol
    if t == "array":
        ritems = reader["items"] if _type_name(reader) == "array" else writer["items"]
        out = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec: negative count)
                n = -n
                _zigzag_decode(buf)  # block byte size, unused on decode
            for _ in range(n):
                out.append(_read(buf, writer["items"], ritems))
    if t == "map":
        rvals = reader["values"] if _type_name(reader) == "map" else writer["values"]
        out = {}
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _zigzag_decode(buf)
            for _ in range(n):
                k = buf.read(_zigzag_decode(buf)).decode("utf-8")
                out[k] = _read(buf, writer["values"], rvals)
    if t == "fixed":
        return buf.read(writer["size"])
    raise TypeError(f"unsupported schema type: {t}")


def _read_record(buf, writer, reader):
    rfields = (
        {f["name"]: f for f in reader["fields"]}
        if _type_name(reader) == "record"
        else None
    )
    out = {}
    for wf in writer["fields"]:
        rf = rfields.get(wf["name"]) if rfields is not None else wf
        if rf is None:
            _skip(buf, wf["type"])  # writer-only field: read past, discard
        else:
            out[wf["name"]] = _read(buf, wf["type"], rf["type"])
    if rfields is not None:
        wnames = {f["name"] for f in writer["fields"]}
        for name, rf in rfields.items():
            if name not in wnames:
                if "default" not in rf:
                    raise ValueError(f"reader field {name} has no default")
                out[name] = _default_value(rf["default"], rf["type"])
    return out


def _default_value(default, schema):
    """Materialize a field default (spec: for unions the default conforms to
    the FIRST branch; JSON null → None, bytes defaults are ISO-8859-1)."""
    schema = parse_schema(schema)
    if isinstance(schema, list):
        schema = schema[0]
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "bytes" and isinstance(default, str):
        return default.encode("iso-8859-1")
    if t in ("float", "double"):
        return float(default)
    return default


def _skip(buf, schema) -> None:
    schema = parse_schema(schema)
    if isinstance(schema, list):
        _skip(buf, schema[_zigzag_decode(buf)])
        return
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        buf.read(1)
    elif t in ("int", "long", "enum"):
        _zigzag_decode(buf)
    elif t == "float":
        buf.read(4)
    elif t == "double":
        buf.read(8)
    elif t in ("bytes", "string"):
        buf.read(_zigzag_decode(buf))
    elif t == "record":
        for f in schema["fields"]:
            _skip(buf, f["type"])
    elif t in ("array", "map"):
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return
            if n < 0:
                size = _zigzag_decode(buf)
                buf.read(size)
                continue
            inner = schema["items"] if t == "array" else schema["values"]
            for _ in range(n):
                if t == "map":
                    buf.read(_zigzag_decode(buf))
                _skip(buf, inner)
    elif t == "fixed":
        buf.read(schema["size"])
    else:
        raise TypeError(f"unsupported schema type: {t}")


def _match_union_branch(writer_branch, reader_union: list):
    """First reader branch the writer branch resolves against (spec: first
    match, considering promotions and named-type equality)."""
    for rb in reader_union:
        if _resolvable(writer_branch, rb):
            return rb
    return None


def _resolvable(writer, reader) -> bool:
    wt, rt = _type_name(writer), _type_name(reader)
    if wt == rt:
        if wt in ("record", "enum", "fixed"):
            return writer.get("name") == reader.get("name")
        return True
    return rt in PROMOTIONS.get(wt, ())


# --------------------------------------------------------------------- #
# full schema resolution check (drives compatibility verdicts)
# --------------------------------------------------------------------- #


def can_read(reader_schema, writer_schema) -> bool:
    """True iff data written with ``writer_schema`` is readable with
    ``reader_schema`` under the Avro spec's Schema Resolution rules —
    recursing into nested records, honoring unions, defaults, and numeric/
    string promotions. This is the full-resolution replacement for a
    flat field-by-field check (reference: CompatibilityChecker.java:88-163
    delegates to Avro's SchemaValidator, which applies these same rules)."""
    try:
        return _can_read(parse_schema(reader_schema), parse_schema(writer_schema))
    except (KeyError, TypeError, ValueError):
        return False


def _can_read(reader, writer) -> bool:
    if isinstance(writer, list):
        # every writer branch must be readable
        return all(_can_read(reader, wb) for wb in writer)
    if isinstance(reader, list):
        return any(_can_read(rb, writer) for rb in reader)
    wt, rt = _type_name(writer), _type_name(reader)
    if wt != rt:
        return rt in PROMOTIONS.get(wt, ())
    if rt == "record":
        if reader.get("name") != writer.get("name"):
            return False
        wfields = {f["name"]: f for f in writer["fields"]}
        for rf in reader["fields"]:
            wf = wfields.get(rf["name"])
            if wf is None:
                if "default" not in rf:
                    return False
            elif not _can_read(rf["type"], wf["type"]):
                return False
        return True
    if rt == "enum":
        if reader.get("name") != writer.get("name"):
            return False
        missing = set(writer["symbols"]) - set(reader["symbols"])
        return not missing or "default" in reader
    if rt == "fixed":
        return reader.get("name") == writer.get("name") and reader["size"] == writer["size"]
    if rt == "array":
        return _can_read(reader["items"], writer["items"])
    if rt == "map":
        return _can_read(reader["values"], writer["values"])
    return True


# --------------------------------------------------------------------- #
# Avro schema → Spark DDL (for typed-view output schemas)
# --------------------------------------------------------------------- #

_SPARK_TYPES = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
    "enum": "string",
    "fixed": "binary",
}


def to_spark_type(schema) -> str:
    """Spark SQL type string for an Avro schema (union[null, X] → nullable
    X, matching spark-avro's mapping)."""
    schema = parse_schema(schema)
    if isinstance(schema, list):
        non_null = [b for b in schema if _type_name(b) != "null"]
        if len(non_null) != 1:
            raise TypeError("only unions of null + one type map to Spark")
        return to_spark_type(non_null[0])
    t = _type_name(schema)
    if t in _SPARK_TYPES:
        return _SPARK_TYPES[t]
    if t == "record":
        inner = ", ".join(
            f"{f['name']}: {to_spark_type(f['type'])}" for f in schema["fields"]
        )
        return f"struct<{inner}>"
    if t == "array":
        return f"array<{to_spark_type(schema['items'])}>"
    if t == "map":
        return f"map<string, {to_spark_type(schema['values'])}>"
    raise TypeError(f"unsupported schema type: {t}")
