"""Property-based tests (hypothesis): invariants that example tests miss.

Pure-Python rules (schema compatibility) get wide fuzzing; Spark-side
invariants use few, small examples since each runs real jobs.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from starlight_for_kafka_spark.operators.registry import check_compatibility

# ---------------------------------------------------------------- #
# schema-compatibility algebra (pure python — fuzz hard)
# ---------------------------------------------------------------- #

_TYPES = ["long", "string", "double", "boolean"]


@st.composite
def avro_schema(draw):
    n = draw(st.integers(0, 4))
    names = draw(
        st.lists(st.sampled_from("abcdefgh"), min_size=n, max_size=n, unique=True)
    )
    fields = []
    for name in names:
        f = {"name": name, "type": draw(st.sampled_from(_TYPES))}
        if draw(st.booleans()):
            f["default"] = {"long": 0, "string": "", "double": 0.0, "boolean": False}[
                f["type"]
            ]
        fields.append(f)
    return json.dumps({"type": "record", "name": "R", "fields": fields})


@given(new=avro_schema(), history=st.lists(avro_schema(), max_size=3))
def test_none_mode_always_compatible(new, history):
    assert check_compatibility("NONE", new, history)


@given(new=avro_schema(), history=st.lists(avro_schema(), min_size=1, max_size=3))
def test_full_implies_backward_and_forward(new, history):
    if check_compatibility("FULL", new, history):
        assert check_compatibility("BACKWARD", new, history)
        assert check_compatibility("FORWARD", new, history)


@given(new=avro_schema(), history=st.lists(avro_schema(), min_size=1, max_size=3))
def test_transitive_implies_latest_only(new, history):
    for base in ["BACKWARD", "FORWARD", "FULL"]:
        if check_compatibility(f"{base}_TRANSITIVE", new, history):
            assert check_compatibility(base, new, history)


@given(prior=avro_schema(), extra_type=st.sampled_from(_TYPES))
def test_adding_defaulted_field_is_always_full_compatible(prior, extra_type):
    schema = json.loads(prior)
    default = {"long": 0, "string": "", "double": 0.0, "boolean": False}[extra_type]
    schema["fields"] = schema["fields"] + [
        {"name": "zz_new", "type": extra_type, "default": default}
    ]
    assert check_compatibility("FULL", json.dumps(schema), [prior])


@given(new=avro_schema(), history=st.lists(avro_schema(), min_size=1, max_size=3))
def test_identical_to_latest_passes_non_transitive_modes(new, history):
    """Non-transitive modes check only the latest prior, so a schema
    identical to it is compatible both ways. (NOT true of *_TRANSITIVE:
    hypothesis found that an identical-to-latest schema can still be
    incompatible with an OLDER version — e.g. a dropped no-default field —
    which is exactly the reference's verify-all-priors loop.)"""
    for mode in ["BACKWARD", "FORWARD", "FULL"]:
        assert check_compatibility(mode, new, history + [new])


# ---------------------------------------------------------------- #
# log invariants (spark — few small examples)
# ---------------------------------------------------------------- #

_spark_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_spark_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 10_000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    )
)
def test_offsets_always_dense_per_partition(spark, rows):
    """For ANY batch, offsets per partition are exactly 0..n-1."""
    from starlight_for_kafka_spark.sources import LogTable
    import datetime

    events = spark.createDataFrame(
        [
            (eid, datetime.datetime(2024, 1, 1), uid, "t", 1.0, "{}")
            for uid, eid in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    log = LogTable.from_events(events, num_partitions=4).df
    per_part = {}
    for r in log.select("partition", "offset").collect():
        per_part.setdefault(r.partition, []).append(r.offset)
    for p, offs in per_part.items():
        assert sorted(offs) == list(range(len(offs))), (p, sorted(offs))


@_spark_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from("xyz"), st.one_of(st.none(), st.sampled_from("uvw")), st.integers(0, 30)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[3]),
    )
)
def test_compaction_idempotent_and_latest_wins(spark, rows):
    from starlight_for_kafka_spark.operators.ktable import compact_topic

    log = spark.createDataFrame(
        rows, "partition int, key string, value string, offset long"
    )
    once = compact_topic(log)
    got = {(r.partition, r.key): (r.value, r.offset) for r in once.collect()}
    # 1) at most one row per (partition, key); latest offset decides
    expected = {}
    for p, k, v, o in rows:
        cur = expected.get((p, k))
        if cur is None or o > cur[1]:
            expected[(p, k)] = (v, o)
    expected = {k: v for k, v in expected.items() if v[0] is not None}
    assert got == expected
    # 2) idempotent: compacting the compacted log is a no-op
    twice = {
        (r.partition, r.key): (r.value, r.offset)
        for r in compact_topic(once).collect()
    }
    assert twice == got


@_spark_settings
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 500)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    n_shards=st.sampled_from([1, 3, 8]),
    capacity=st.sampled_from([64, 1000]),
)
def test_pack_sequences_tiles_the_stream(spark, docs, n_shards, capacity):
    """Packing invariants for any corpus/shard/capacity: offsets start at 0,
    tile the concatenated stream gaplessly in the defined total order, and
    pack ids are consistent with the offsets."""
    from starlight_for_kafka_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", capacity, n_shards=n_shards).collect()
    assert len(out) == len(docs)
    by_order = sorted(out, key=lambda r: (r.doc_id % n_shards, r.doc_id))
    acc = 0
    for r in by_order:
        assert r.start_tok == acc          # gapless, order-respecting
        assert r.pack_id == r.start_tok // capacity
        last = r.start_tok + r.n_tokens - 1
        assert r.n_packs_spanned == last // capacity - r.pack_id + 1
        acc += r.n_tokens
    assert acc == sum(n for _, n in docs)  # total stream length preserved


@_spark_settings
@given(
    n_members=st.integers(1, 9),
    n_partitions=st.integers(1, 17),
)
def test_assignors_balanced_and_complete(spark, n_members, n_partitions):
    """For ANY group size and partition count, both assignors cover every
    partition exactly once and no member holds more than ceil(np/nm)
    (range) / differ by more than 1 (roundrobin within a topic)."""
    from starlight_for_kafka_spark.operators.groups import (
        assign_partitions_range,
        assign_partitions_roundrobin,
    )

    members = spark.createDataFrame(
        [("g", f"m{i:02d}") for i in range(n_members)], ["group", "member"]
    )
    parts = spark.createDataFrame(
        [("t", p) for p in range(n_partitions)], ["topic", "partition"]
    )
    for fn in (assign_partitions_range, assign_partitions_roundrobin):
        rows = fn(members, parts).collect()
        covered = sorted(r.partition for r in rows)
        assert covered == list(range(n_partitions)), (fn.__name__, covered)
        loads = {}
        for r in rows:
            loads[r.member] = loads.get(r.member, 0) + 1
        assert max(loads.values()) - min(loads.values() or [0]) <= 1, (
            fn.__name__, loads,
        )


@_spark_settings
@given(budget=st.integers(1, 4000))
def test_retain_bytes_suffix_and_monotone(spark, budget):
    """For ANY budget: kept offsets are a per-partition suffix, the newest
    record always survives, and a larger budget never keeps fewer rows."""
    import datetime

    from starlight_for_kafka_spark.sources import LogTable
    from starlight_for_kafka_spark.sources.logtable import KAFKA_RECORD_SCHEMA

    rows = []
    for p in range(3):
        for off in range(12):
            size = (off * 7 + p) % 40 + 1
            rows.append(
                (None, bytes([65]) * size, None,
                 datetime.datetime(2024, 1, 1 + off), p, off)
            )
    log = LogTable(spark.createDataFrame(rows, KAFKA_RECORD_SCHEMA))
    kept = log.retain_bytes(budget).df.collect()
    by_part = {}
    for r in kept:
        by_part.setdefault(r.partition, []).append(r.offset)
    for p in range(3):
        offs = sorted(by_part.get(p, []))
        assert offs and offs[-1] == 11, (p, offs)          # newest survives
        assert offs == list(range(offs[0], 12)), (p, offs)  # contiguous suffix
    bigger = log.retain_bytes(budget + 500).df.count()
    assert bigger >= len(kept)


@_spark_settings
@given(
    docs=st.lists(
        st.lists(st.integers(0, 3), min_size=1, max_size=6),  # tiles per doc
        min_size=1,
        max_size=6,
    )
)
def test_line_dedup_keeps_each_distinct_line_exactly_once(spark, docs):
    """For ANY corpus, corpus-level line dedup keeps each distinct line
    exactly once (sum of n_kept == number of distinct tiles) and never
    invents or loses lines (sum of n_lines == total tiles)."""
    from starlight_for_kafka_spark.operators.text import line_dedup

    # tile id t -> a fixed 4-word line; docs are concatenations of tiles
    def tile(t):
        return f"w{t}a w{t}b w{t}c w{t}d"

    rows = [
        (i, " ".join(tile(t) for t in tiles)) for i, tiles in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = line_dedup(df, line_words=4).collect()
    distinct_tiles = len({t for tiles in docs for t in tiles})
    total_tiles = sum(len(tiles) for tiles in docs)
    assert sum(r.n_kept for r in out) == distinct_tiles
    assert sum(r.n_lines for r in out) == total_tiles


@_spark_settings
@given(
    items=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 40)),  # (id, cost)
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    capacity=st.integers(4, 64),
)
def test_pack_sequences_stream_is_gapless_for_any_costs(spark, items, capacity):
    from starlight_for_kafka_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(items, "doc_id long, n long")
    out = sorted(
        pack_sequences(df, "n", capacity).collect(), key=lambda r: r.start_tok
    )
    pos = 0
    for r in out:
        assert r.start_tok == pos
        assert r.pack_id == pos // capacity
        pos += r.n
    assert pos == sum(c for _, c in items)


@_spark_settings
@given(
    batches=st.lists(
        st.lists(st.integers(0, 3), min_size=1, max_size=5),  # partitions hit
        min_size=1,
        max_size=4,
    )
)
def test_commitlog_offsets_dense_across_any_append_sequence(spark, tmp_path_factory, batches):
    """ANY sequence of appends through the commit protocol yields dense
    per-partition offsets with batch boundaries respected."""
    from starlight_for_kafka_spark.sources import CommittedLog

    root = str(tmp_path_factory.mktemp("cl"))
    log = CommittedLog(root)
    expected: dict[int, int] = {}
    seq = 0
    for parts in batches:
        rows = []
        for p in parts:
            rows.append((str(seq).encode(), b"v", [], None, p, seq))
            expected[p] = expected.get(p, 0) + 1
            seq += 1
        df = spark.createDataFrame(
            rows,
            "key binary, value binary, "
            "headers array<struct<key:string,value:binary>>, "
            "timestamp timestamp, partition int, seq long",
        )
        log.append(df, order_col="seq")
    got = {}
    for r in log.read(spark).select("partition", "offset").collect():
        got.setdefault(r.partition, []).append(r.offset)
    assert {p: sorted(v) for p, v in got.items()} == {
        p: list(range(n)) for p, n in expected.items()
    }


@_spark_settings
@given(
    vals=st.lists(st.integers(0, 100), min_size=1, max_size=30),
    k=st.integers(1, 5),
    n_salts=st.integers(1, 8),
)
def test_grouped_top_k_equals_plain_window_for_any_k_salts(spark, vals, k, n_salts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from starlight_for_kafka_spark.operators.skew import grouped_top_k

    df = spark.createDataFrame(
        [(i, v % 3, v) for i, v in enumerate(vals)], "id long, g int, v int"
    )
    out = grouped_top_k(df, ["g"], [F.col("v").desc(), F.col("id").asc()], k, n_salts)
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    plain = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    assert sorted(map(tuple, out.select("g", "id", "rank").collect())) == sorted(
        map(tuple, plain.select("g", "id", "rank").collect())
    )


# ---------------------------------------------------------------- #
# at-rest codec roundtrips (pure python — fuzz hard)
# ---------------------------------------------------------------- #


_ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._", min_size=0, max_size=40
)


@given(
    group=_ident,
    topic=_ident,
    partition=st.integers(-(2**31), 2**31 - 1),
    version=st.sampled_from([0, 1]),
)
def test_offset_key_roundtrip_any_strings(group, topic, partition, version):
    from starlight_for_kafka_spark.functions import offsets_wire as ow

    d = ow.decode_key(ow.encode_offset_key(group, topic, partition, version))
    assert (d["group"], d["topic"], d["partition"], d["version"]) == (
        group, topic, partition, version,
    )


@given(
    offset=st.integers(0, 2**62),
    metadata=st.one_of(st.none(), st.text(max_size=60)),
    commit_ts=st.integers(0, 2**62),
    expire=st.one_of(st.none(), st.integers(0, 2**62)),
    epoch=st.integers(-1, 2**31 - 1),
    version=st.sampled_from([0, 1, 2, 3]),
)
def test_offset_value_roundtrip_all_versions(
    offset, metadata, commit_ts, expire, epoch, version
):
    from starlight_for_kafka_spark.functions import offsets_wire as ow

    d = ow.decode_offset_value(
        ow.encode_offset_value(
            offset, metadata, commit_ts, version=version,
            expire_timestamp_ms=expire, leader_epoch=epoch,
        )
    )
    assert d["offset"] == offset and d["commit_timestamp_ms"] == commit_ts
    assert d["metadata"] == metadata
    if version == 3:
        assert d["leader_epoch"] == epoch
    if version == 1:
        assert d["expire_timestamp_ms"] == expire


@given(
    generation=st.integers(0, 2**31 - 1),
    protocol=st.one_of(st.none(), _ident),
    leader=st.one_of(st.none(), _ident),
    version=st.sampled_from([0, 1, 2, 3]),
    members=st.lists(
        st.tuples(
            _ident,                                  # member_id
            st.one_of(st.none(), _ident),            # group_instance_id
            st.binary(max_size=24),                  # subscription
            st.one_of(st.none(), st.binary(max_size=24)),  # assignment
        ),
        max_size=5,
    ),
)
def test_group_metadata_roundtrip_fuzz(generation, protocol, leader, version, members):
    from starlight_for_kafka_spark.functions import offsets_wire as ow

    mems = [
        {
            "member_id": mid, "group_instance_id": gid, "client_id": "c",
            "client_host": "/h", "rebalance_timeout_ms": 5,
            "session_timeout_ms": 6, "subscription": sub, "assignment": asn,
        }
        for mid, gid, sub, asn in members
    ]
    d = ow.decode_group_metadata_value(
        ow.encode_group_metadata_value(
            "consumer", generation, protocol, leader, mems, version=version
        )
    )
    assert d["generation"] == generation
    assert d["protocol"] == protocol and d["leader"] == leader
    assert len(d["members"]) == len(members)
    for got, (mid, gid, sub, asn) in zip(d["members"], members):
        assert got["member_id"] == mid
        assert got["subscription"] == sub
        if version >= 3:
            assert got["group_instance_id"] == gid
        assert got["assignment"] == asn


@given(
    samples=st.lists(st.integers(-32768, 32767), max_size=200),
    rate=st.integers(1, 192000),
)
def test_wav_roundtrip_fuzz(samples, rate):
    import numpy as np

    from starlight_for_kafka_spark.functions import media_codec as mc

    d = mc.decode_wav(mc.encode_wav(samples, rate))
    s = np.array(samples, dtype=np.int64)
    assert d["sample_rate"] == rate and d["n_samples"] == len(samples)
    assert d["sum"] == int(s.sum()) if len(samples) else d["sum"] == 0
    assert d["sum_sq"] == int((s * s).sum()) if len(samples) else True


@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    data=st.data(),
)
def test_ppm_bmp_stats_agree_fuzz(w, h, data):
    """For ANY pixel grid, the PPM and BMP encodings must decode to the
    same channel stats — BGR order, row padding, and bottom-up layout all
    cancel or the containers disagree."""
    from starlight_for_kafka_spark.functions import media_codec as mc

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert mc.decode_ppm(mc.encode_ppm(w, h, rgb)) == mc.decode_bmp(
        mc.encode_bmp(w, h, rgb)
    )


# ---------------------------------------------------------------- #
# RecordBatch v2 wire codec (pure python — fuzz hard)
# ---------------------------------------------------------------- #


@st.composite
def _wire_records(draw):
    n = draw(st.integers(1, 12))
    base = draw(st.integers(0, 2**40))
    ts0 = draw(st.integers(0, 2**41))
    recs = []
    for i in range(n):
        headers = [
            (draw(st.text(alphabet="abcxyz", min_size=1, max_size=6)),
             draw(st.one_of(st.none(), st.binary(max_size=8))))
            for _ in range(draw(st.integers(0, 2)))
        ]
        recs.append(
            {
                "offset": base + i,
                "timestamp_ms": ts0 + draw(st.integers(0, 10_000)),
                "key": draw(st.one_of(st.none(), st.binary(max_size=20))),
                "value": draw(st.one_of(st.none(), st.binary(max_size=60))),
                "headers": headers,
            }
        )
    return base, recs


@given(data=_wire_records(), codec=st.sampled_from([None, "gzip", "snappy", "lz4", "zstd"]))
@settings(max_examples=40, deadline=None)
def test_wire_batch_roundtrip_fuzz(data, codec):
    """Arbitrary records (null keys/values, binary headers, any codec)
    must survive encode -> transcode chain -> decode exactly."""
    from starlight_for_kafka_spark.functions import kafka_records as kr

    base, recs = data
    b = kr.encode_batch_v2(base, recs, compression=codec)
    # hop through a different codec and back to clear
    hop = "zstd" if codec != "zstd" else "lz4"
    b2 = kr.transcode(kr.transcode(b, hop), None)
    d = kr.decode_batch_v2(b2)
    assert d["base_offset"] == base
    got = d["records"]
    assert len(got) == len(recs)
    for g, r in zip(got, recs):
        assert g["offset"] == r["offset"]
        assert g["timestamp_ms"] == r["timestamp_ms"]
        assert g["key"] == r["key"] and g["value"] == r["value"]
        assert [(k, v) for k, v in g["headers"]] == r["headers"]


@given(
    data=_wire_records(),
    magic=st.sampled_from([0, 1]),
    codec=st.sampled_from([None, "gzip", "snappy"]),
)
@settings(max_examples=60, deadline=None)
def test_legacy_message_set_roundtrip_fuzz(data, magic, codec):
    """Arbitrary records must survive v2 encode -> down-convert to
    v0/v1 (plain or wrapper-compressed) -> decode_message_set_v01 with
    the documented lossy mapping: headers dropped, v0 loses timestamps
    (None), v1 keeps ms values; wrapper offsets reconstruct exactly."""
    from starlight_for_kafka_spark.functions import kafka_records as kr

    base, recs = data
    ms = kr.down_convert(
        kr.encode_batch_v2(base, recs), to_magic=magic, compression=codec
    )
    got = kr.decode_message_set_v01(ms)
    assert len(got) == len(recs)
    for g, r in zip(got, recs):
        assert g["offset"] == r["offset"]
        assert g["key"] == r["key"] and g["value"] == r["value"]
        if magic == 0:
            assert g["timestamp_ms"] is None
        else:
            assert g["timestamp_ms"] == r["timestamp_ms"]


@given(
    st.lists(
        st.lists(st.integers(-5, 5), min_size=4, max_size=4),
        min_size=4,
        max_size=10,
    ),
    st.integers(1, 3),
)
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_knn_join_brute_equals_per_query_top_k(spark, vecs, k):
    """The distributed brute kNN join must agree with N independent
    brute_force_top_k calls — same cosine rounding, same neighbor-id
    tie-break — for every query."""
    from starlight_for_kafka_spark.operators import similarity

    # drop zero vectors (cosine undefined) and dedupe exact duplicates so
    # ties stay resolvable by id deterministically
    vecs = [v for v in vecs if any(x != 0 for x in v)]
    if len(vecs) < 2:
        return
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.limit(2).withColumnRenamed("vec_id", "query_id")
    joined = similarity.knn_join(q, df, k=k, method="brute")
    got = {}
    for r in joined.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos_sim))
    for qid, qvec in [(r.query_id, r.embedding) for r in q.collect()]:
        expect = similarity.brute_force_top_k(
            df, [float(x) for x in qvec], k=k
        ).collect()
        mine = sorted(got.get(qid, []))
        assert [(m[1], m[2]) for m in mine] == [
            (e.vec_id, e.cos_sim) for e in expect
        ], (qid, mine, expect)


def _bpe_reference(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python BPE reference (Sennrich '16 with the repo's greedy
    left-to-right merge-application semantics and (count desc, left,
    right) tiebreak) — the spec bpe_train/bpe_apply are checked against."""
    vocab = {w: [c for c in w] for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), n = best
        merges.append((rank, l, r, l + r, n))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out
    return merges, {w: len(s) for w, s in vocab.items()}


@_spark_settings
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    reps=st.lists(st.integers(1, 4), min_size=12, max_size=12),
    n_merges=st.integers(1, 3),
)
def test_bpe_train_and_apply_match_pure_python_reference(
    spark, words, reps, n_merges
):
    """For ANY corpus, the distributed merge loop learns exactly the
    reference merge table and bpe_apply's token counts equal the
    reference vocab's symbol counts — including tie-heavy tiny-alphabet
    corpora and single-char words."""
    from starlight_for_kafka_spark.operators.text import bpe_apply, bpe_train

    text = " ".join(w for w, k in zip(words, reps) for _ in range(k))
    freqs: dict[str, int] = {}
    for w, k in zip(words, reps):
        freqs[w] = freqs.get(w, 0) + k
    exp_merges, exp_sizes = _bpe_reference(freqs, n_merges)

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, n_merges=n_merges).collect()]
    assert got == exp_merges, (text, got, exp_merges)

    applied = bpe_apply(docs, [(l, r) for _, l, r, _, _ in exp_merges]).collect()
    n_words = sum(freqs.values())
    n_tokens = sum(exp_sizes[w] * k for w, k in freqs.items())
    assert [(r.n_words, r.n_tokens) for r in applied] == [(n_words, n_tokens)]


@_spark_settings
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=7),
        min_size=1,
        max_size=14,
    ),
    reps=st.lists(st.integers(1, 4), min_size=14, max_size=14),
    n_merges=st.integers(1, 10),
)
def test_bpe_train_local_matches_reference(spark, words, reps, n_merges):
    """The production heap trainer (bpe_train_local: one distributed
    word-frequency collapse, then driver-side incremental pair-count
    updates over a lazy max-heap) learns EXACTLY the reference merge
    table — same argmax, same tie-break, same greedy fold — for any
    corpus, at deeper k than the distributed loop's tests (the
    incremental count deltas and heap staleness are the new surface;
    tie-heavy tiny alphabets stress both). Pinned against the same
    pure-Python reference as bpe_train, which is itself pinned to
    bpe_train — so the two trainers are transitively equal."""
    from starlight_for_kafka_spark.operators.text import bpe_train_local

    text = " ".join(w for w, k in zip(words, reps) for _ in range(k))
    freqs: dict[str, int] = {}
    for w, k in zip(words, reps):
        freqs[w] = freqs.get(w, 0) + k
    exp_merges, _ = _bpe_reference(freqs, n_merges)

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train_local(docs, n_merges=n_merges).collect()]
    assert got == exp_merges, (text, got, exp_merges)


@_spark_settings
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    reps=st.lists(st.integers(1, 4), min_size=12, max_size=12),
    n_merges=st.integers(1, 3),
)
def test_bpe_tokenize_matches_apply_and_reference(spark, words, reps, n_merges):
    """The production-vocab Pandas-UDF tokenizer (min-rank iterative)
    equals bpe_apply (rank-order expression fold) and the pure-Python
    reference on TRAINED merge lists — the invariant that makes the two
    application orders coincide (a rank-i pair only contains symbols
    built by ranks < i). Also pins emit="tokens": concatenated tokens
    reconstruct each normalized word stream."""
    from starlight_for_kafka_spark.operators.text import bpe_apply, bpe_tokenize

    text = " ".join(w for w, k in zip(words, reps) for _ in range(k))
    freqs: dict[str, int] = {}
    for w, k in zip(words, reps):
        freqs[w] = freqs.get(w, 0) + k
    exp_merges, exp_sizes = _bpe_reference(freqs, n_merges)
    merges = [(l, r) for _, l, r, _, _ in exp_merges]

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    via_expr = [(r.n_words, r.n_tokens) for r in bpe_apply(docs, merges).collect()]
    via_udf = [
        (r.n_words, r.n_tokens)
        for r in bpe_tokenize(docs, merges, emit="counts").collect()
    ]
    n_words = sum(freqs.values())
    n_tokens = sum(exp_sizes[w] * k for w, k in freqs.items())
    assert via_udf == via_expr == [(n_words, n_tokens)]

    toks = bpe_tokenize(docs, merges, emit="tokens").collect()
    assert len(toks) == 1
    assert "".join(toks[0].tokens) == "".join(text.lower().split())
    assert len(toks[0].tokens) == n_tokens
