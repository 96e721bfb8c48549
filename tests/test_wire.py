"""Kafka wire-format codec + operators: spec-pinned bytes, CRC verify,
roundtrip through Spark, magic down-conversion."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from starlight_for_kafka_spark.functions import kafka_records as kr
from starlight_for_kafka_spark.sources import wire


def test_crc32c_check_value():
    # canonical CRC32C test vector
    assert kr.crc32c(b"123456789") == 0xE3069283


def test_batch_v2_layout_fields():
    b = kr.encode_batch_v2(
        5, [{"offset": 5, "timestamp_ms": 1000, "key": b"k", "value": b"v", "headers": []}],
        producer_id=9, producer_epoch=2, base_sequence=3,
    )
    assert struct.unpack_from(">q", b, 0)[0] == 5          # baseOffset
    assert struct.unpack_from(">b", b, 16)[0] == 2         # magic
    assert struct.unpack_from(">i", b, 8)[0] == len(b) - 12  # batchLength
    d = kr.decode_batch_v2(b)
    assert (d["producer_id"], d["producer_epoch"], d["base_sequence"]) == (9, 2, 3)


def test_crc_corruption_detected():
    import pytest

    b = bytearray(kr.encode_batch_v2(
        0, [{"offset": 0, "timestamp_ms": 1, "key": None, "value": b"x", "headers": []}]))
    b[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        kr.decode_batch_v2(bytes(b))


def test_down_convert_drops_headers_keeps_payload():
    b = kr.encode_batch_v2(7, [
        {"offset": 7, "timestamp_ms": 123, "key": b"k", "value": b"v",
         "headers": [("h", b"x")]},
        {"offset": 8, "timestamp_ms": 124, "key": None, "value": None, "headers": []},
    ])
    v1 = kr.decode_message_set_v01(kr.down_convert(b, 1))
    assert [(m["offset"], m["key"], m["value"], m["timestamp_ms"]) for m in v1] == [
        (7, b"k", b"v", 123), (8, None, None, 124)]
    v0 = kr.decode_message_set_v01(kr.down_convert(b, 0))
    assert all(m["timestamp_ms"] is None for m in v0)


def test_wire_roundtrip_through_spark(spark, log):
    batches = wire.encode_wire_batches(log.df, max_records_per_batch=16)
    meta = batches.select("partition", "base_offset", "record_count").collect()
    # batches chunk each partition's offset sequence from its base
    by_part = {}
    for r in sorted(meta, key=lambda r: (r.partition, r.base_offset)):
        by_part.setdefault(r.partition, []).append((r.base_offset, r.record_count))
    for p, chunks in by_part.items():
        expect_base = 0
        for base, count in chunks:
            assert base == expect_base
            expect_base += count

    decoded = wire.decode_wire_batches(batches)
    a = log.df.select(
        "partition", "offset", F.col("key").cast("string").alias("k"),
        F.octet_length("value").alias("vl"), F.unix_millis("timestamp").alias("ts"),
    )
    b = decoded.select(
        "partition", "offset", F.col("key").cast("string").alias("k"),
        F.octet_length("value").alias("vl"), F.unix_millis("timestamp").alias("ts"),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_down_convert_batches_operator(spark, log):
    batches = wire.encode_wire_batches(log.df.filter("partition = 0"),
                                       max_records_per_batch=32)
    legacy = wire.down_convert_batches(batches, to_magic=1)
    row = legacy.first()
    msgs = kr.decode_message_set_v01(bytes(row.message_set))
    assert len(msgs) == row.record_count
    assert msgs[0]["offset"] == row.base_offset


def test_gzip_batch_roundtrip_and_transcode():
    recs = [{"offset": 10 + i, "timestamp_ms": 1000 + i,
             "key": b"k%d" % i, "value": b"payload-" * 20 + bytes([i]),
             "headers": [("h", b"x")]} for i in range(8)]
    plain = kr.encode_batch_v2(10, recs)
    gz = kr.encode_batch_v2(10, recs, compression="gzip")
    assert len(gz) < len(plain)                    # it actually compressed
    d = kr.decode_batch_v2(gz)
    assert d["attributes"] & 0x07 == kr.COMPRESSION_GZIP
    assert d["records"] == recs                    # lossless through gzip
    # transcode gzip -> none preserves bytes-level equality with plain
    assert kr.transcode(gz, compression=None) == plain
    # and none -> gzip -> none is stable
    assert kr.transcode(kr.transcode(plain, "gzip"), None) == plain


def _codec_recs():
    return [{"offset": 10 + i, "timestamp_ms": 1000 + i,
             "key": b"k%d" % i, "value": b"payload-" * 20 + bytes([i]),
             "headers": [("h", b"x")]} for i in range(8)]


def test_snappy_lz4_zstd_roundtrip_and_codec_bits():
    """Full Kafka codec set (KopLogValidator.java:495-520): each codec
    roundtrips losslessly, sets its protocol codec bits, and transcodes
    byte-identically back to the clear encoding."""
    recs = _codec_recs()
    plain = kr.encode_batch_v2(10, recs)
    for name, bits in [("snappy", 2), ("lz4", 3), ("zstd", 4)]:
        comp = kr.encode_batch_v2(10, recs, compression=name)
        assert len(comp) < len(plain), name          # it actually compressed
        d = kr.decode_batch_v2(comp)
        assert d["attributes"] & 0x07 == bits, name
        assert d["records"] == recs, name            # lossless
        assert kr.transcode(comp, compression=None) == plain, name


def test_codec_framing_magics_spec_pinned():
    """The compressed records section must carry each codec's on-wire
    framing: snappy-java stream magic, LZ4 frame magic, zstd frame magic —
    so real Kafka clients could decode these batches."""
    recs = _codec_recs()
    def records_section(b):
        return b[61:]                                # after the 61-byte v2 header
    assert records_section(kr.encode_batch_v2(10, recs, compression="snappy"))[
        :8] == b"\x82SNAPPY\x00"
    assert records_section(kr.encode_batch_v2(10, recs, compression="lz4"))[
        :4] == bytes.fromhex("04224d18")             # LZ4 frame magic (LE)
    assert records_section(kr.encode_batch_v2(10, recs, compression="zstd"))[
        :4] == bytes.fromhex("28b52ffd")             # zstd frame magic (LE)
    assert records_section(kr.encode_batch_v2(10, recs, compression="gzip"))[
        :2] == b"\x1f\x8b"                           # gzip magic


def test_snappy_multi_chunk_roundtrip():
    """Records sections beyond the 32 KiB snappy-java block size span
    multiple framed chunks and still roundtrip losslessly."""
    recs = [{"offset": i, "timestamp_ms": i,
             "key": None, "value": bytes([i & 0xFF]) * 2000, "headers": []}
            for i in range(64)]                      # ~128 KiB of records
    comp = kr.encode_batch_v2(0, recs, compression="snappy")
    assert kr.decode_batch_v2(comp)["records"] == recs


def test_snappy_raw_block_accepted_on_decode():
    """Kafka's decompressor accepts bare raw-snappy blocks (no java
    framing); so do we."""
    import pyarrow as pa
    import struct as _s

    recs = _codec_recs()
    framed = bytearray(kr.encode_batch_v2(10, recs))
    # rebuild the covered section with a raw snappy records blob
    covered = bytearray(framed[21:])
    raw = pa.Codec("snappy").compress(bytes(covered[40:]), asbytes=True)
    covered[1] = (covered[1] & ~0x07) | kr.COMPRESSION_SNAPPY
    covered = covered[:40] + bytearray(raw)
    batch_length = 4 + 1 + 4 + len(covered)
    out = bytearray(framed[:8])
    out += _s.pack(">i", batch_length)
    out += framed[12:16]                             # leader epoch
    out += framed[16:17]                             # magic
    out += _s.pack(">I", kr.crc32c(bytes(covered)))
    out += covered
    assert kr.decode_batch_v2(bytes(out))["records"] == recs


def test_unknown_codec_raises_clearly():
    import pytest

    recs = [{"offset": 0, "timestamp_ms": 1, "key": None, "value": b"v", "headers": []}]
    with pytest.raises(ValueError, match="brotli"):
        kr.encode_batch_v2(0, recs, compression="brotli")
    # a batch claiming a reserved codec id must fail loudly, not garble
    b = bytearray(kr.encode_batch_v2(0, recs))
    import struct as _s
    covered = bytearray(b[21:])
    covered[1] = (covered[1] & ~0x07) | 5            # reserved codec id
    crc = kr.crc32c(bytes(covered))
    b[17:21] = _s.pack(">I", crc)
    b[21:] = covered
    with pytest.raises(ValueError, match="codec id 5"):
        kr.decode_batch_v2(bytes(b))


def test_down_convert_from_gzip_batch():
    recs = [{"offset": 3, "timestamp_ms": 77, "key": b"k", "value": b"v", "headers": []}]
    gz = kr.encode_batch_v2(3, recs, compression="gzip")
    msgs = kr.decode_message_set_v01(kr.down_convert(gz, 1))
    assert msgs[0] == {"offset": 3, "timestamp_ms": 77, "key": b"k", "value": b"v"}


def test_transcode_batches_operator_roundtrip(spark, log):
    gz = wire.encode_wire_batches(log.df.filter("partition = 1"),
                                  max_records_per_batch=32, compression="gzip")
    plain = wire.transcode_batches(gz, compression=None)
    a = wire.decode_wire_batches(gz).select("partition", "offset", "value")
    b = wire.decode_wire_batches(plain).select("partition", "offset", "value")
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_transcode_header_patch_is_byte_identical_to_reencode():
    """The header-patching transcode must produce byte-for-byte the same
    batch as a full decode-to-dicts/re-encode — same attributes, CRC,
    record bytes — and reject a corrupted source CRC."""
    import pytest

    from starlight_for_kafka_spark.functions import kafka_records as kr

    recs = [
        dict(offset=i, timestamp_ms=1_700_000_000_000 + i, key=b"k%d" % i,
             value=b"v" * 50, headers=[("h", b"x")])
        for i in range(20)
    ]
    b = kr.encode_batch_v2(7, recs, producer_id=3, producer_epoch=1,
                           base_sequence=2, compression="snappy")
    for target in ["lz4", "zstd", "gzip", None]:
        d = kr.decode_batch_v2(b)
        ref = kr.encode_batch_v2(
            d["base_offset"], d["records"], producer_id=d["producer_id"],
            producer_epoch=d["producer_epoch"], base_sequence=d["base_sequence"],
            compression=target,
        )
        assert kr.transcode(b, target) == ref
    corrupted = b[:30] + bytes([b[30] ^ 0xFF]) + b[31:]
    with pytest.raises(ValueError):
        kr.transcode(corrupted, "gzip")


def test_wire_timestamps_are_instants_not_session_local(spark, log):
    """The encoded bytes must carry true epoch millis regardless of the
    session timezone, and NULL timestamps must ride as Kafka's -1
    sentinel and decode back to NULL."""
    import datetime

    from pyspark.sql import functions as F

    from starlight_for_kafka_spark.functions import kafka_records as kr
    from starlight_for_kafka_spark.sources import wire

    rows = spark.createDataFrame(
        [
            (b"k1", b"v1", [], datetime.datetime(2024, 1, 1, 12, 0, 0), 0, 0),
            (b"k2", b"v2", [], None, 0, 1),
        ],
        "key binary, value binary, headers array<struct<key:string,value:binary>>, "
        "timestamp timestamp, partition int, offset long",
    )
    true_ms = rows.select(F.unix_millis("timestamp")).first()[0]
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        blob = wire.encode_wire_batches(rows, max_records_per_batch=10).first()["batch"]
        decoded_raw = kr.decode_batch_v2(bytes(blob))["records"]
        # the BYTES carry the instant, not New-York wall-clock millis
        assert decoded_raw[0]["timestamp_ms"] == true_ms
        assert decoded_raw[1]["timestamp_ms"] == -1
        back = wire.decode_wire_batches(
            wire.encode_wire_batches(rows, max_records_per_batch=10)
        )
        got = {r.offset: r.timestamp for r in back.collect()}
        assert got[1] is None
        assert back.filter(F.unix_millis("timestamp") == true_ms).count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_pre_1970_timestamp_roundtrips(spark):
    """Kafka's NO_TIMESTAMP sentinel is exactly -1; any other negative
    millis value is a legitimate pre-1970 instant and must round-trip
    (only NULL maps to the sentinel)."""
    import datetime

    rows = [
        ("k0", b"v", datetime.datetime(1969, 12, 31, 23, 59, 59), 0, 0),
        ("k1", b"v", None, 0, 1),  # NULL -> wire -1 -> NULL
        ("k2", b"v", datetime.datetime(1955, 6, 1), 0, 2),
    ]
    df = spark.createDataFrame(
        [(k, bytearray(v), ts, p, o) for k, v, ts, p, o in rows],
        "key string, value binary, timestamp timestamp, partition int, offset long",
    ).withColumn("key", F.col("key").cast("binary")).withColumn(
        "headers",
        F.lit(None).cast("array<struct<key:string,value:binary>>"),
    )
    decoded = wire.decode_wire_batches(wire.encode_wire_batches(df))
    got = {
        r.offset: r.ts for r in decoded.select(
            "offset", F.unix_millis("timestamp").alias("ts")
        ).collect()
    }
    assert got[0] == -1000
    assert got[1] is None
    assert got[2] < -400_000_000_000  # 1955 stays 1955, not NULL


def test_legacy_ingest_roundtrips_down_conversion(spark, log):
    """down_convert (v2 -> v0/v1 message set) then ingest_message_sets must
    reproduce the typed rows: v1 keeps ms timestamps, v0 has none; headers
    are gone in both (pre-v2 has no header slot)."""
    batches = wire.encode_wire_batches(log.df, max_records_per_batch=32)
    src = log.df.select(
        "partition", "offset", F.col("key").cast("string").alias("k"),
        F.octet_length("value").alias("vl"),
        F.unix_millis("timestamp").alias("ts"),
    ).collect()

    for magic, keep_ts in ((1, True), (0, False)):
        typed = wire.ingest_message_sets(
            wire.down_convert_batches(batches, to_magic=magic)
        )
        got = typed.select(
            "partition", "offset", F.col("key").cast("string").alias("k"),
            F.octet_length("value").alias("vl"),
            F.unix_millis("timestamp").alias("ts"),
        ).collect()
        a = sorted((r.partition, r.offset, r.k, r.vl, r.ts if keep_ts else None)
                   for r in src)
        b = sorted(map(tuple, got))
        assert a == b, f"magic={magic}"
        assert typed.filter(F.size("headers") != 0).count() == 0


def test_legacy_ingest_rejects_corrupt_crc(spark):
    """A flipped payload byte must fail the per-message CRC32 check."""
    import pytest as _pytest

    from starlight_for_kafka_spark.functions import kafka_records as kr

    ms = kr.down_convert(
        kr.encode_batch_v2(0, [{"offset": 0, "timestamp_ms": 5,
                                "key": b"k", "value": b"hello", "headers": None}]),
        to_magic=1,
    )
    corrupt = ms[:-1] + bytes([ms[-1] ^ 0xFF])
    df = spark.createDataFrame(
        [(0, bytearray(corrupt))], "partition int, message_set binary"
    )
    with _pytest.raises(Exception, match="CRC32"):
        wire.ingest_message_sets(df).collect()


def test_legacy_compressed_wrapper_roundtrip_and_offsets():
    """Compressed legacy sets (how every pre-0.11 producer with
    compression wrote): one wrapper message, codec bits in attributes,
    v1 inner offsets RELATIVE with the wrapper holding the last absolute
    offset, v0 inner offsets absolute. Decode must equal the plain set."""
    from starlight_for_kafka_spark.functions import kafka_records as kr

    recs = [
        {"offset": 100 + i, "timestamp_ms": 5000 + i,
         "key": f"k{i}".encode(), "value": f"v{i}".encode() * 3,
         "headers": []}
        for i in range(7)
    ]
    b = kr.encode_batch_v2(100, recs)
    for magic in (0, 1):
        plain = kr.decode_message_set_v01(kr.down_convert(b, to_magic=magic))
        for codec in ("gzip", "snappy", "lz4"):
            ms = kr.down_convert(b, to_magic=magic, compression=codec)
            got = kr.decode_message_set_v01(ms)
            assert got == plain, (magic, codec)
            assert [g["offset"] for g in got] == list(range(100, 107))
        # wrapper layout pinned: v1 wrapper offset = LAST absolute offset
        ms = kr.down_convert(b, to_magic=magic, compression="gzip")
        import struct
        assert struct.unpack_from(">q", ms, 0)[0] == 106
        attrs = ms[12 + 5]
        assert attrs & 0x07 == kr.COMPRESSION_GZIP


def test_legacy_log_append_time_wrapper_stamps_inner():
    """A v1 wrapper flagged LOG_APPEND_TIME (attribute bit 3) stamps its
    own timestamp onto every inner message."""
    from starlight_for_kafka_spark.functions import kafka_records as kr

    inner = b"".join(
        kr._encode_message_v01(i, 5000 + i, b"k", b"v", 1) for i in range(3)
    )
    w = kr._encode_message_v01(
        42, 9999, None, kr._compress("gzip", inner), 1,
        attributes=kr.COMPRESSION_GZIP | 8,
    )
    got = kr.decode_message_set_v01(w)
    assert [g["offset"] for g in got] == [40, 41, 42]
    assert all(g["timestamp_ms"] == 9999 for g in got)


def test_kafka_lz4_legacy_frame_layout_and_checksums():
    """KAFKA-3160 framing pinned at the byte level: LZ4 Frame magic,
    FLG(version 1, block-independence)=0x60, BD(64 KiB)=0x40; the HC byte
    is xxh32>>8 of the DESCRIPTOR for magic v1 (spec) but of
    MAGIC+DESCRIPTOR for magic v0 (the broken legacy variant). Decode
    accepts both, rejects anything else."""
    import struct

    from starlight_for_kafka_spark.functions import kafka_records as kr

    payload = b"legacy lz4 wrapper " * 40
    good = kr.encode_kafka_lz4(payload, broken_hc=False)
    broken = kr.encode_kafka_lz4(payload, broken_hc=True)
    for f in (good, broken):
        assert f[:4] == b"\x04\x22\x4d\x18"
        assert f[4] == 0x60 and f[5] == 0x40
        assert f[-4:] == struct.pack("<I", 0)  # end mark
        assert kr.decode_kafka_lz4(f) == payload
    # the two variants differ ONLY in the HC byte
    assert good[6] != broken[6] and good[:6] == broken[:6] and good[7:] == broken[7:]
    assert good[6] == (kr._xxh32(good[4:6]) >> 8) & 0xFF
    assert broken[6] == (kr._xxh32(broken[:6]) >> 8) & 0xFF
    # any OTHER checksum value is rejected
    bad = bytearray(good)
    bad[6] ^= 0xFF
    if bad[6] == broken[6]:  # avoid colliding with the broken variant
        bad[6] ^= 0x01
    import pytest as _pytest
    with _pytest.raises(ValueError, match="checksum"):
        kr.decode_kafka_lz4(bytes(bad))
    # xxh32 against the public test vectors
    assert kr._xxh32(b"") == 0x02CC5D05
    assert kr._xxh32(b"a") == 0x550D7456
    assert kr._xxh32(b"abc") == 0x32D153FF


def test_kafka_lz4_frame_fuzz_roundtrip():
    """Deterministic fuzz over payload shapes (empty, tiny, incompressible
    random, highly-compressible, multi-block >64 KiB) x both checksum
    variants; the pure-Python block decoder must invert pyarrow's raw
    block compressor exactly."""
    import random

    from starlight_for_kafka_spark.functions import kafka_records as kr

    rng = random.Random(42)
    payloads = [
        b"",
        b"x",
        bytes(rng.getrandbits(8) for _ in range(1000)),     # incompressible
        b"ab" * 50_000,                                     # compressible
        bytes(rng.getrandbits(8) for _ in range(70_000)),   # multi-block raw
        (b"kafka " * 20_000),                               # multi-block comp
    ]
    for payload in payloads:
        for broken in (False, True):
            f = kr.encode_kafka_lz4(payload, broken_hc=broken)
            assert kr.decode_kafka_lz4(f) == payload, (len(payload), broken)


def test_legacy_lz4_wrapper_end_to_end_both_magics():
    """v0 (broken HC) and v1 (spec HC) lz4 wrapper messages decode through
    decode_message_set_v01 — the 0.9-era lz4 producer dump replay that
    was the one declared-loud rejection left on a supported path."""
    from starlight_for_kafka_spark.functions import kafka_records as kr

    recs = [
        {"offset": 40 + i, "timestamp_ms": 7000 + i,
         "key": b"k%d" % i, "value": b"payload-%d" % i * 10, "headers": []}
        for i in range(5)
    ]
    b = kr.encode_batch_v2(40, recs)
    for magic in (0, 1):
        plain = kr.decode_message_set_v01(kr.down_convert(b, to_magic=magic))
        ms = kr.down_convert(b, to_magic=magic, compression="lz4")
        # wrapper attributes carry the lz4 codec id
        assert ms[12 + 5] & 0x07 == kr.COMPRESSION_LZ4
        assert kr.decode_message_set_v01(ms) == plain


def test_legacy_compacted_wrapper_gapped_inner_offsets():
    """After log compaction a v1 compressed wrapper's inner RELATIVE
    offsets have gaps. Kafka (AbstractLegacyRecordBatch) derives the
    absolute base from the LAST inner relative — base = wrapper_offset -
    inner[-1].relative — so gapped sets land every record correctly; the
    naive ``wrapper - (n-1)`` places only the last record right."""
    from starlight_for_kafka_spark.functions import kafka_records as kr

    # relatives 0, 2, 5 (records at base+1, base+3..4 compacted away)
    inner = b"".join(
        kr._encode_message_v01(rel, 5000 + rel, b"k%d" % rel, b"v", 1)
        for rel in (0, 2, 5)
    )
    base = 200
    w = kr._encode_message_v01(
        base + 5, 0, None, kr._compress("gzip", inner), 1,
        attributes=kr.COMPRESSION_GZIP,
    )
    got = kr.decode_message_set_v01(w)
    assert [g["offset"] for g in got] == [base, base + 2, base + 5]
    assert [g["timestamp_ms"] for g in got] == [5000, 5002, 5005]


def test_legacy_ingest_reads_compressed_sets(spark, log):
    """ingest_message_sets over wrapper-compressed legacy blobs equals the
    plain path — the real-dump replay case."""
    batches = wire.encode_wire_batches(log.df, max_records_per_batch=40)
    plain = wire.ingest_message_sets(
        wire.down_convert_batches(batches, to_magic=1)
    )
    gz = wire.ingest_message_sets(
        wire.down_convert_batches(batches, to_magic=1, compression="gzip")
    )
    cols = ["partition", "offset", F.col("key").cast("string"),
            F.octet_length("value"), F.unix_millis("timestamp")]
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, gz.select(*cols).collect())
    )


def test_kafka_lz4_block_rejects_match_offset_beyond_output():
    """A corrupt block whose match offset exceeds the bytes decoded so
    far must fail loudly — the sliced fast paths would otherwise clamp
    silently and emit wrong-length garbage into record parsing."""
    import struct

    import pytest

    from starlight_for_kafka_spark.functions.kafka_records import (
        _lz4_block_decompress,
    )

    bad = bytes([0x13]) + b"abc" + struct.pack("<H", 5) + bytes([0x00])
    with pytest.raises(ValueError, match="match offset beyond output"):
        _lz4_block_decompress(bad)


def test_kafka_lz4_block_rejects_truncated_input():
    """Corrupt blocks whose declared lengths run past the input must
    raise, not silently truncate: (a) a literal run longer than the
    remaining bytes, (b) a literal-length extension that never
    terminates, (c) a match offset cut off mid-read, (d) a match-length
    extension past the end — all on the same untrusted wire-decode path
    as the match-offset guards."""
    import struct

    import pytest

    from starlight_for_kafka_spark.functions.kafka_records import (
        _lz4_block_decompress,
    )

    # (a) token declares 10 literals, only 3 present
    with pytest.raises(ValueError, match="literal run past input"):
        _lz4_block_decompress(bytes([0xA0]) + b"abc")
    # (b) lit_len==15 extension runs off the end (every byte 255)
    with pytest.raises(ValueError, match="literal length runs past input"):
        _lz4_block_decompress(bytes([0xF0, 0xFF, 0xFF]))
    # (c) literals complete but the 2-byte match offset is truncated
    with pytest.raises(ValueError, match="truncated match offset"):
        _lz4_block_decompress(bytes([0x12]) + b"a" + b"\x01")
    # (d) match_len==15 extension runs off the end
    with pytest.raises(ValueError, match="match length runs past input"):
        _lz4_block_decompress(
            bytes([0x1F]) + b"a" + struct.pack("<H", 1) + bytes([0xFF])
        )


def test_columnar_codec_matches_scalar_paths():
    """The numpy-vectorized record codec is byte-identical to per-record
    encoding and value-identical to per-record decoding across the edge
    cases that exercise every branch: None/empty keys and values, headers
    (incl. None header values), multi-byte varints, negative-delta-free
    zigzag, every codec, and the >4-byte varint decode fallback."""
    import random

    import numpy as np

    from starlight_for_kafka_spark.functions import kafka_records as kr

    random.seed(42)

    def mkrec(i, base):
        key = (
            None
            if i % 7 == 0
            else bytes([random.getrandbits(8) for _ in range(random.choice([0, 3, 200]))])
        )
        val = (
            None
            if i % 11 == 3
            else bytes([random.getrandbits(8) for _ in range(random.choice([0, 96, 300]))])
        )
        hdrs = (
            [("h%d" % j, None if j % 2 else bytes([j]) * j) for j in range(i % 4)]
            if i % 13 == 5
            else None
        )
        return {
            "offset": base + i,
            "timestamp_ms": 1_700_000_000_000 + i * 997,
            "key": key,
            "value": val,
            "headers": hdrs,
        }

    chunks = []
    off = 10**12  # exercises multi-byte offset varints via base, deltas small
    for _ in range(8):
        n = random.randint(1, 40)
        chunks.append((off, [mkrec(i, off) for i in range(n)]))
        off += n
    for comp in [None, "gzip", "snappy", "lz4", "zstd"]:
        want = [
            kr.encode_batch_v2(
                b, r, producer_id=9, producer_epoch=2, base_sequence=4,
                compression=comp,
            )
            for b, r in chunks
        ]
        got = kr.encode_batches_v2_many(
            chunks, compression=comp, producer_id=9, producer_epoch=2,
            base_sequence=4,
        )
        assert want == got, comp

    blobs = kr.encode_batches_v2_many(chunks, compression="lz4")
    col = kr.decode_batches_v2_columnar(blobs)
    ri = 0
    for bi, blob in enumerate(blobs):
        d = kr.decode_batch_v2(blob)
        assert col["record_counts"][bi] == len(d["records"])
        assert col["producer_ids"][bi] == d["producer_id"]
        for rec in d["records"]:
            assert col["offsets"][ri] == rec["offset"]
            assert col["ts_ms"][ri] == rec["timestamp_ms"]
            assert col["keys"][ri] == rec["key"]
            assert col["values"][ri] == rec["value"]
            assert list(col["headers"][ri]) == rec["headers"]
            ri += 1

    # >4-byte varint (2^40 ts delta) forces the width-10 decode fallback
    recs = [
        {"offset": 5, "timestamp_ms": 0, "key": b"a", "value": b"b", "headers": None},
        {"offset": 6, "timestamp_ms": 2**40, "key": None, "value": b"c" * 150,
         "headers": None},
    ]
    blob = kr.encode_batches_v2_many([(5, recs)])
    assert blob[0] == kr.encode_batch_v2(5, recs)
    c = kr.decode_batches_v2_columnar(blob)
    assert c["ts_ms"][1] == 2**40 and c["values"][1] == b"c" * 150
    assert c["keys"][1] is None and c["values"][0] == b"b"

    # non-first-record base offset falls back to the per-record path
    gap = [{"offset": 7, "timestamp_ms": 1, "key": b"k", "value": b"v",
            "headers": None}]
    assert kr.encode_batches_v2_many([(5, gap)]) == [kr.encode_batch_v2(5, gap)]


def test_down_convert_many_matches_scalar():
    """The columnar legacy down-convert is byte-identical to the
    per-batch scalar path across magic x codec, with gapped offsets
    (compaction), None/empty keys and values, and a single-record set —
    the hot-ingest kernel may never drift from the reference shape."""
    import random

    random.seed(113)

    def rand_records(n):
        keys = [
            None if random.random() < 0.15
            else bytes(random.getrandbits(8) for _ in range(random.randrange(0, 40)))
            for _ in range(n)
        ]
        values = [
            None if random.random() < 0.1
            else bytes(random.getrandbits(8) for _ in range(random.randrange(0, 200)))
            for _ in range(n)
        ]
        offs, o = [], random.randrange(0, 1000)
        for _ in range(n):
            offs.append(o)
            o += random.randrange(1, 4)  # gapped (post-compaction) offsets
        ts = [1700000000000 + random.randrange(0, 10_000) for _ in range(n)]
        return [
            {"offset": o, "timestamp_ms": t, "key": k, "value": v, "headers": []}
            for o, t, k, v in zip(offs, ts, keys, values)
        ]

    for trial in range(6):
        bufs = [
            kr.encode_batch_v2(recs[0]["offset"], recs)
            for recs in (rand_records(random.randrange(1, 40)) for _ in range(5))
        ]
        for magic in (0, 1):
            for codec in (None, "gzip", "snappy", "lz4"):
                want = [kr.down_convert(b, magic, compression=codec) for b in bufs]
                got = kr.down_convert_many(bufs, magic, compression=codec)
                assert got == want, (trial, magic, codec)


def test_decode_message_sets_v01_many_matches_scalar():
    """The columnar legacy decode is value-identical to the scalar
    per-set decoder over every magic x codec combination, including the
    LOG_APPEND_TIME wrapper (bit 3) that stamps the wrapper timestamp
    onto every inner record."""
    import random

    random.seed(211)
    recs = [
        {
            "offset": 3 * i + 1,
            "timestamp_ms": 1700000000000 + i,
            "key": None if i % 7 == 0 else f"k{i}".encode(),
            "value": None if i % 11 == 0 else bytes([i % 256]) * (i % 90),
            "headers": [],
        }
        for i in range(30)
    ]
    bufs = [kr.encode_batch_v2(1, recs), kr.encode_batch_v2(1, recs[:1])]
    sets = []
    for magic in (0, 1):
        for codec in (None, "gzip", "snappy", "lz4"):
            sets += [kr.down_convert(b, magic, compression=codec) for b in bufs]
    # LOG_APPEND_TIME wrapper (crafted; down_convert never sets bit 3)
    inner = bytearray()
    for i, r in enumerate(recs[:10]):
        inner += kr._encode_message_v01(
            i, r["timestamp_ms"], r["key"], r["value"], 1
        )
    w = kr._encode_message_v01(
        99, 1700000099999, None,
        kr.encode_kafka_lz4(bytes(inner), broken_hc=False), 1,
        attributes=kr._LEGACY_CODECS["lz4"] | 0x08,
    )
    sets.append(w)
    want = [kr.decode_message_set_v01(s) for s in sets]
    offs, ts, keys, values, cnts = kr.decode_message_sets_v01_many(sets)
    flat = [r for rows in want for r in rows]
    assert cnts == [len(rows) for rows in want]
    assert offs == [r["offset"] for r in flat]
    assert ts == [r["timestamp_ms"] for r in flat]
    assert keys == [r["key"] for r in flat]
    assert values == [r["value"] for r in flat]


def test_lz4_fast_block_decompress_matches_pure_python():
    """The size-walk + C-codec block decompress inverts the raw block
    compressor exactly AND raises the same guard messages as the pure
    Python decoder on every corrupt-input class."""
    import random

    import pyarrow as pa
    import pytest

    rng = random.Random(42)
    for _ in range(30):
        raw = rng.randbytes(rng.randrange(0, 2000)) + bytes(
            [rng.randrange(0, 200)]
        ) * rng.randrange(0, 3000)
        comp = pa.Codec("lz4_raw").compress(raw, asbytes=True)
        assert kr._lz4_block_decompress_fast(comp) == raw
        assert kr._lz4_block_decompress(comp) == raw
    cases = [
        (bytes([0x13]) + b"abc" + struct.pack("<H", 5) + bytes([0x00]),
         "match offset beyond output"),
        (bytes([0xA0]) + b"abc", "literal run past input"),
        (bytes([0xF0, 0xFF, 0xFF]), "literal length runs past input"),
        (bytes([0x12]) + b"a" + b"\x01", "truncated match offset"),
        (bytes([0x1F]) + b"a" + struct.pack("<H", 1) + bytes([0xFF]),
         "match length runs past input"),
        (bytes([0x14]) + b"a" + struct.pack("<H", 0), "zero match offset"),
    ]
    for bad, msg in cases:
        with pytest.raises(ValueError, match=msg):
            kr._lz4_block_decompress(bad)
        with pytest.raises(ValueError, match=msg):
            kr._lz4_block_decompress_fast(bad)
