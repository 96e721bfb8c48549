"""Kafka __consumer_offsets at-rest binary schemas: versioned key/value
codecs for offset commits and group metadata.

The broker persists consumer-group state as compacted keyed binary
records; the layouts below are Apache Kafka's public on-disk schemas
(mirrored by the reference's GroupMetadataConstants.java:64-147, replayed
at GroupMetadataManager.doLoadGroupsAndOffsets:718):

  key v0/v1  (OffsetCommitKey):   int16 version, str group, str topic,
                                  int32 partition
  key v2     (GroupMetadataKey):  int16 version, str group
  value v0   (OffsetCommitValue): int64 offset, str metadata, int64 commit_ts
  value v1:  v0 + int64 expire_timestamp
  value v2:  same layout as v0 (expire_timestamp dropped again)
  value v3:  int64 offset, int32 leader_epoch, str metadata, int64 commit_ts
  group value v0..v3 (GroupMetadataValue):
      str protocol_type, int32 generation, nullable-str protocol,
      nullable-str leader, [v2+: int64 current_state_timestamp],
      int32 member_count x member:
        str member_id, [v3+: nullable-str group_instance_id],
        str client_id, str client_host, [v1+: int32 rebalance_timeout],
        int32 session_timeout, bytes subscription, bytes assignment

All integers big-endian (Kafka wire order). ``str`` is int16-length UTF-8
(-1 = null), ``bytes`` is int32-length (-1 = null). A record with a null
VALUE is a tombstone (deletion marker) for its key.

No Spark imports — shipped to executor workers by value
(register_pickle_by_value) like media_codec/avro_codec.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _pack_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _pack_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _read_str(buf: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    if n < 0:
        return None, pos
    # bounds check: a slice past the end silently clamps in Python, so a
    # truncated/corrupt record would decode to a plausible-looking shorter
    # string instead of failing loudly like the media/batch codecs do
    if pos + n > len(buf):
        raise ValueError(
            f"truncated string: declared {n} bytes, {len(buf) - pos} remain"
        )
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes | None, int]:
    (n,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    if n < 0:
        return None, pos
    if pos + n > len(buf):
        raise ValueError(
            f"truncated bytes: declared {n} bytes, {len(buf) - pos} remain"
        )
    return buf[pos : pos + n], pos + n


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------

GROUP_METADATA_KEY_VERSION = 2


def encode_offset_key(
    group: str, topic: str, partition: int, version: int = 1
) -> bytes:
    if version not in (0, 1):
        raise ValueError(f"offset key version must be 0 or 1 (got {version})")
    return (
        struct.pack(">h", version)
        + _pack_str(group)
        + _pack_str(topic)
        + struct.pack(">i", partition)
    )


def encode_group_metadata_key(group: str) -> bytes:
    return struct.pack(">h", GROUP_METADATA_KEY_VERSION) + _pack_str(group)


def decode_key(buf: bytes) -> dict:
    """Dispatch on the key version: <=1 is an offset-commit key, 2 is a
    group-metadata key — exactly how the broker's replay loop routes
    records to offset vs. group handling."""
    (version,) = struct.unpack_from(">h", buf, 0)
    pos = 2
    group, pos = _read_str(buf, pos)
    if version <= 1:
        topic, pos = _read_str(buf, pos)
        (partition,) = struct.unpack_from(">i", buf, pos)
        return {
            "version": version,
            "kind": "offset",
            "group": group,
            "topic": topic,
            "partition": partition,
        }
    if version == GROUP_METADATA_KEY_VERSION:
        return {"version": version, "kind": "group_metadata", "group": group}
    raise ValueError(f"unknown offsets-topic key version {version}")


# ---------------------------------------------------------------------------
# offset-commit values
# ---------------------------------------------------------------------------


def encode_offset_value(
    offset: int,
    metadata: str | None,
    commit_timestamp_ms: int,
    version: int = 3,
    expire_timestamp_ms: int | None = None,
    leader_epoch: int = -1,
) -> bytes:
    head = struct.pack(">h", version)
    if version in (0, 2):
        return (
            head
            + struct.pack(">q", offset)
            + _pack_str(metadata)
            + struct.pack(">q", commit_timestamp_ms)
        )
    if version == 1:
        return (
            head
            + struct.pack(">q", offset)
            + _pack_str(metadata)
            + struct.pack(">q", commit_timestamp_ms)
            + struct.pack(">q", -1 if expire_timestamp_ms is None else expire_timestamp_ms)
        )
    if version == 3:
        return (
            head
            + struct.pack(">q", offset)
            + struct.pack(">i", leader_epoch)
            + _pack_str(metadata)
            + struct.pack(">q", commit_timestamp_ms)
        )
    raise ValueError(f"unknown offset value version {version}")


def decode_offset_value(buf: bytes | None) -> dict | None:
    """None in = tombstone = None out (the compaction deletion marker)."""
    if buf is None:
        return None
    (version,) = struct.unpack_from(">h", buf, 0)
    # version gate FIRST: an unknown future version must surface as the
    # intended ValueError, not a struct.error from parsing the buffer with
    # a v0-v3 field layout it does not have
    if version < 0 or version > 3:
        raise ValueError(f"unknown offset value version {version}")
    pos = 2
    (offset,) = struct.unpack_from(">q", buf, pos)
    pos += 8
    leader_epoch = None
    if version == 3:
        (leader_epoch,) = struct.unpack_from(">i", buf, pos)
        pos += 4
    metadata, pos = _read_str(buf, pos)
    (commit_ts,) = struct.unpack_from(">q", buf, pos)
    pos += 8
    expire_ts = None
    if version == 1:
        (expire_ts,) = struct.unpack_from(">q", buf, pos)
        expire_ts = None if expire_ts == -1 else expire_ts
    return {
        "version": version,
        "offset": offset,
        "metadata": metadata,
        "commit_timestamp_ms": commit_ts,
        "expire_timestamp_ms": expire_ts,
        "leader_epoch": leader_epoch,
    }


# ---------------------------------------------------------------------------
# group-metadata values
# ---------------------------------------------------------------------------


def encode_group_metadata_value(
    protocol_type: str,
    generation: int,
    protocol: str | None,
    leader: str | None,
    members: list[dict],
    version: int = 3,
    current_state_timestamp_ms: int = -1,
) -> bytes:
    if version not in (0, 1, 2, 3):
        raise ValueError(f"unknown group metadata version {version}")
    out = [
        struct.pack(">h", version),
        _pack_str(protocol_type),
        struct.pack(">i", generation),
        _pack_str(protocol),
        _pack_str(leader),
    ]
    if version >= 2:
        out.append(struct.pack(">q", current_state_timestamp_ms))
    out.append(struct.pack(">i", len(members)))
    for m in members:
        out.append(_pack_str(m["member_id"]))
        if version >= 3:
            out.append(_pack_str(m.get("group_instance_id")))
        out.append(_pack_str(m.get("client_id", "")))
        out.append(_pack_str(m.get("client_host", "")))
        if version >= 1:
            out.append(struct.pack(">i", m.get("rebalance_timeout_ms", 0)))
        out.append(struct.pack(">i", m.get("session_timeout_ms", 0)))
        out.append(_pack_bytes(m.get("subscription", b"")))
        out.append(_pack_bytes(m.get("assignment", b"")))
    return b"".join(out)


def decode_group_metadata_value(buf: bytes | None) -> dict | None:
    if buf is None:
        return None
    (version,) = struct.unpack_from(">h", buf, 0)
    if version < 0 or version > 3:
        raise ValueError(f"unknown group metadata version {version}")
    pos = 2
    protocol_type, pos = _read_str(buf, pos)
    (generation,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    protocol, pos = _read_str(buf, pos)
    leader, pos = _read_str(buf, pos)
    current_state_ts = None
    if version >= 2:
        (current_state_ts,) = struct.unpack_from(">q", buf, pos)
        pos += 8
    (n_members,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    # each member carries at least 2 strings + 1 int + 2 byte-arrays
    # (>= 16 bytes even when everything is null/empty), so a declared
    # count the remaining buffer cannot possibly hold is corruption —
    # fail now instead of looping until a struct.error surfaces
    if n_members < 0 or n_members * 16 > len(buf) - pos:
        raise ValueError(
            f"corrupt group metadata: {n_members} members declared, "
            f"{len(buf) - pos} bytes remain"
        )
    members = []
    for _ in range(n_members):
        member_id, pos = _read_str(buf, pos)
        group_instance_id = None
        if version >= 3:
            group_instance_id, pos = _read_str(buf, pos)
        client_id, pos = _read_str(buf, pos)
        client_host, pos = _read_str(buf, pos)
        rebalance_timeout = None
        if version >= 1:
            (rebalance_timeout,) = struct.unpack_from(">i", buf, pos)
            pos += 4
        (session_timeout,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        subscription, pos = _read_bytes(buf, pos)
        assignment, pos = _read_bytes(buf, pos)
        members.append(
            {
                "member_id": member_id,
                "group_instance_id": group_instance_id,
                "client_id": client_id,
                "client_host": client_host,
                "rebalance_timeout_ms": rebalance_timeout,
                "session_timeout_ms": session_timeout,
                "subscription": subscription,
                "assignment": assignment,
            }
        )
    return {
        "version": version,
        "protocol_type": protocol_type,
        "generation": generation,
        "protocol": protocol,
        "leader": leader,
        "current_state_timestamp_ms": current_state_ts,
        "members": members,
    }
