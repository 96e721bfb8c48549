"""offsets_wire: Kafka __consumer_offsets at-rest binary schemas. Golden
byte layouts are hand-computed from the public schema definitions
(big-endian, int16-length strings, int32-length bytes) so encode/decode
correctness does not rest on the two halves cancelling each other out."""

from __future__ import annotations

import pytest

from starlight_for_kafka_spark.functions import offsets_wire as ow


def test_offset_key_v1_golden_bytes():
    b = ow.encode_offset_key("g1", "t", 3, version=1)
    assert b == bytes.fromhex("0001" + "0002" + "6731" + "0001" + "74" + "00000003")
    assert ow.decode_key(b) == {
        "version": 1, "kind": "offset", "group": "g1", "topic": "t", "partition": 3,
    }


def test_offset_key_v0_golden_bytes():
    b = ow.encode_offset_key("g", "t", 0, version=0)
    assert b == bytes.fromhex("0000" + "0001" + "67" + "0001" + "74" + "00000000")
    assert ow.decode_key(b)["version"] == 0


def test_group_metadata_key_golden_bytes():
    b = ow.encode_group_metadata_key("grp")
    assert b == bytes.fromhex("0002" + "0003" + "677270")
    assert ow.decode_key(b) == {"version": 2, "kind": "group_metadata", "group": "grp"}


def test_offset_value_v3_golden_bytes():
    b = ow.encode_offset_value(42, "m", 1000, version=3, leader_epoch=7)
    assert b == bytes.fromhex(
        "0003" + "000000000000002a" + "00000007" + "0001" + "6d"
        + "00000000000003e8"
    )
    assert ow.decode_offset_value(b) == {
        "version": 3, "offset": 42, "metadata": "m", "commit_timestamp_ms": 1000,
        "expire_timestamp_ms": None, "leader_epoch": 7,
    }


def test_offset_value_v1_golden_bytes_with_expire():
    b = ow.encode_offset_value(5, None, 10, version=1, expire_timestamp_ms=20)
    assert b == bytes.fromhex(
        "0001" + "0000000000000005" + "ffff"  # null metadata string
        + "000000000000000a" + "0000000000000014"
    )
    d = ow.decode_offset_value(b)
    assert d["metadata"] is None and d["expire_timestamp_ms"] == 20


@pytest.mark.parametrize("version", [0, 1, 2, 3])
def test_offset_value_all_versions_roundtrip(version):
    b = ow.encode_offset_value(
        99, "meta", 123456, version=version, expire_timestamp_ms=999999,
        leader_epoch=2,
    )
    d = ow.decode_offset_value(b)
    assert d["offset"] == 99 and d["commit_timestamp_ms"] == 123456
    assert d["version"] == version
    assert d["leader_epoch"] == (2 if version == 3 else None)
    assert d["expire_timestamp_ms"] == (999999 if version == 1 else None)


def test_tombstone_is_none():
    assert ow.decode_offset_value(None) is None
    assert ow.decode_group_metadata_value(None) is None


def test_group_metadata_value_v3_golden_bytes_one_member():
    member = {
        "member_id": "m1", "group_instance_id": None, "client_id": "c",
        "client_host": "/h", "rebalance_timeout_ms": 1, "session_timeout_ms": 2,
        "subscription": b"\x01", "assignment": None,
    }
    b = ow.encode_group_metadata_value("consumer", 9, "range", "m1", [member])
    assert b == bytes.fromhex(
        "0003"                      # value version
        + "0008" + b"consumer".hex()  # protocol_type
        + "00000009"                # generation
        + "0005" + b"range".hex()   # protocol
        + "0002" + b"m1".hex()      # leader
        + "ffffffffffffffff"        # current_state_timestamp (-1)
        + "00000001"                # member count
        + "0002" + b"m1".hex()      # member_id
        + "ffff"                    # null group_instance_id
        + "0001" + b"c".hex()       # client_id
        + "0002" + b"/h".hex()      # client_host
        + "00000001"                # rebalance_timeout
        + "00000002"                # session_timeout
        + "00000001" + "01"         # subscription bytes
        + "ffffffff"                # null assignment bytes
    )
    d = ow.decode_group_metadata_value(b)
    assert d["generation"] == 9 and d["protocol"] == "range"
    m = d["members"][0]
    assert m["member_id"] == "m1" and m["group_instance_id"] is None
    assert m["subscription"] == b"\x01" and m["assignment"] is None


@pytest.mark.parametrize("version", [0, 1, 2, 3])
def test_group_metadata_all_versions_roundtrip(version):
    members = [
        {
            "member_id": f"m{i}", "group_instance_id": f"i{i}",
            "client_id": "c", "client_host": "/h",
            "rebalance_timeout_ms": 10, "session_timeout_ms": 20,
            "subscription": b"s", "assignment": b"a",
        }
        for i in range(3)
    ]
    b = ow.encode_group_metadata_value("consumer", 4, None, None, members, version=version)
    d = ow.decode_group_metadata_value(b)
    assert d["version"] == version and len(d["members"]) == 3
    assert d["protocol"] is None and d["leader"] is None
    m = d["members"][1]
    assert m["member_id"] == "m1"
    assert m["group_instance_id"] == ("i1" if version >= 3 else None)
    assert m["rebalance_timeout_ms"] == (10 if version >= 1 else None)


def test_unknown_versions_raise():
    with pytest.raises(ValueError):
        ow.encode_offset_key("g", "t", 0, version=2)
    with pytest.raises(ValueError):
        ow.decode_key(bytes.fromhex("0009" + "0001" + "67"))
    with pytest.raises(ValueError):
        ow.encode_offset_value(1, "m", 1, version=9)


def test_unknown_value_versions_raise_before_parsing():
    # a future-versioned value must raise ValueError from the version gate,
    # not a struct.error from parsing it with a v0-v3 layout
    import struct

    with pytest.raises(ValueError, match="version"):
        ow.decode_offset_value(struct.pack(">h", 9))
    with pytest.raises(ValueError, match="version"):
        ow.decode_group_metadata_value(struct.pack(">h", 9))


def test_truncated_records_raise_not_clamp():
    # Python slices clamp silently; the codec must not — a truncated
    # at-rest record decodes loudly, never to plausible shorter content
    good = ow.encode_offset_value(42, "metadata-string", 1000, version=3)
    with pytest.raises(ValueError, match="truncated"):
        ow.decode_offset_value(good[:-20])  # cuts into the metadata string
    gkey = ow.encode_group_metadata_key("group-with-a-long-name")
    with pytest.raises(ValueError, match="truncated"):
        ow.decode_key(gkey[:-5])


def test_corrupt_member_count_raises():
    b = ow.encode_group_metadata_value(
        "consumer", 1, "range", "m0",
        [{"member_id": "m0", "client_id": "c", "client_host": "/h",
          "rebalance_timeout_ms": 1, "session_timeout_ms": 2,
          "subscription": b"", "assignment": b""}],
        version=3,
    )
    # patch the member-count int32 (directly before the first member's
    # member_id) to a count the remaining bytes cannot hold
    idx = b.index(b"\x00\x00\x00\x01\x00\x02m0")
    corrupt = b[:idx] + b"\x00\x00\xff\xff" + b[idx + 4:]
    with pytest.raises(ValueError, match="corrupt group metadata"):
        ow.decode_group_metadata_value(corrupt)
