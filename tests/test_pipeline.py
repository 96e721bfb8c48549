"""Tests for the training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) on the documents/embeddings tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from starlight_for_kafka_spark.operators import dedup, multimodal, similarity, text


def test_exact_dedup_removes_injected_dup(spark, documents):
    dup = documents.limit(1).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    with_dup = documents.unionByName(dup)
    out = dedup.exact_dedup(with_dup)
    assert out.count() == documents.count()
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0  # kept lowest id


def test_minhash_dedup_catches_near_dup(spark, documents):
    # near-dup: append a token to an existing doc
    near = (
        documents.limit(1)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    with_near = documents.unionByName(near)
    out = dedup.minhash_dedup(with_near, num_hashes=16, bands=8, threshold=0.7)
    assert out.filter(F.col("doc_id") >= 2_000_000).count() == 0
    # and it doesn't nuke everything
    assert out.count() >= documents.count() * 0.5


def test_ngram_jaccard_pairs_finds_identical(spark, documents):
    clone = documents.limit(1).withColumn("doc_id", F.col("doc_id") + 3_000_000)
    pairs = dedup.ngram_jaccard_pairs(documents.unionByName(clone), threshold=0.99)
    hits = pairs.filter(F.col("b") >= 3_000_000).collect()
    assert len(hits) == 1 and abs(hits[0].jaccard - 1.0) < 1e-9


def test_simhash_identical_docs_same_fp(spark, documents):
    clone = documents.limit(5).withColumn("doc_id", F.col("doc_id") + 4_000_000)
    fps = dedup.simhash64(documents.limit(5).unionByName(clone))
    joined = (
        fps.filter(F.col("doc_id") < 4_000_000)
        .alias("o")
        .join(
            fps.filter(F.col("doc_id") >= 4_000_000).alias("c"),
            F.col("o.doc_id") + 4_000_000 == F.col("c.doc_id"),
        )
    )
    assert joined.filter(F.col("o.simhash") != F.col("c.simhash")).count() == 0


def test_brute_force_top_k(spark, embeddings):
    qvec = [float(x) for x in embeddings.filter(F.col("vec_id") == 0).first().embedding]
    top = similarity.brute_force_top_k(embeddings, qvec, k=5).collect()
    assert len(top) == 5
    assert top[0].vec_id == 0 and abs(top[0].cos_sim - 1.0) < 1e-5
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_top_k_contains_self(spark, embeddings):
    qvec = [float(x) for x in embeddings.filter(F.col("vec_id") == 7).first().embedding]
    top = similarity.lsh_top_k(embeddings, qvec, k=5, n_planes=4).collect()
    assert top and top[0].vec_id == 7  # self is always in its own bucket


def test_ivf_assign_cells_valid(spark, embeddings):
    cents = [r.embedding for r in embeddings.orderBy("vec_id").limit(4).collect()]
    out = similarity.ivf_assign(embeddings, [[float(x) for x in c] for c in cents])
    cells = {r.ivf_cell for r in out.select("ivf_cell").distinct().collect()}
    assert cells.issubset({0, 1, 2, 3})
    # centroid vectors map to their own cell
    own = out.filter(F.col("vec_id") < 4).collect()
    assert all(r.ivf_cell == r.vec_id for r in own)


def test_ivf_top_k_probes_query_cell(spark, embeddings):
    cents = [
        [float(x) for x in r.embedding]
        for r in embeddings.orderBy("vec_id").limit(4).collect()
    ]
    qvec = cents[2]  # query IS centroid 2, so its cell is always probed
    top = similarity.ivf_top_k(embeddings, cents, qvec, k=5, nprobe=2).collect()
    assert len(top) == 5
    assert top[0].vec_id == 2 and abs(top[0].cos_sim - 1.0) < 1e-5
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)
    # nprobe=2 of 4 cells: candidates are a strict subset of the corpus
    assigned = similarity.ivf_assign(embeddings, cents)
    probed = assigned.filter(F.col("ivf_cell").isin([r.vec_id for r in top])).count()
    assert probed < embeddings.count()


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el gato la casa de madrid"),
            (3, "xyz qqq zzz"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in text.language_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_token_count_and_quality(spark, documents):
    out = text.token_count(documents)
    row = out.first()
    assert row.n_tokens == len(row.text.split())
    q = text.quality_score(documents)
    assert q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count() == 0


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "hello world")], "doc_id long, text string"
    )
    fps = text.fingerprint(df).collect()
    assert fps[0].fp_full == fps[1].fp_full


def test_multimodal_features_shape(spark, documents):
    media = multimodal.synthesize_media(documents.limit(20))
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.features) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_frame_sampling_counts(spark, documents):
    media = multimodal.synthesize_media(documents.limit(30))
    videos = media.filter(F.col("kind") == "video")
    frames = multimodal.sample_frames(media, every_ms=1000)
    expected = videos.select(
        F.sum(F.floor((F.col("meta.duration_ms") - 1) / 1000) + 1).alias("n")
    ).first().n
    assert frames.count() == expected


def test_lsh_multiprobe_recall_superset(spark, embeddings):
    """probe_hamming1 scans the query bucket plus its n_planes hamming-1
    neighbors: its top-k must be at least as similar, element-wise, as the
    single-bucket top-k (superset candidate pool), and must contain it when
    both return k rows from overlapping pools."""
    from starlight_for_kafka_spark.operators import similarity as sim

    q = [float(x) for x in embeddings.filter("vec_id = 7").first().embedding]
    single = sim.lsh_top_k(embeddings, q, k=5, n_planes=4)
    multi = sim.lsh_top_k(embeddings, q, k=5, n_planes=4, probe_hamming1=True)
    s = [(r.vec_id, r.cos_sim) for r in single.collect()]
    m = [(r.vec_id, r.cos_sim) for r in multi.collect()]
    assert len(m) >= len(s)
    for (_, ms), (_, ss) in zip(m, s):
        assert ms >= ss  # multi-probe can only improve each rank position
