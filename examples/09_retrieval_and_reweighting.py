#!/usr/bin/env python
"""The retrieval-augmented curation shape: embed once, then treat every
per-document question as a JOIN against the embedding corpus — never a
driver-side loop over queries. Three late-round-7 operators compose:

  1. ``knn_join`` — distributed kNN: top-k corpus neighbors for EVERY
     row of a query DataFrame (RAG candidate generation, cross-corpus
     matching). LSH mode buckets the corpus once and self-sizes the
     plane count; the brute mode is the recall baseline.
  2. ``soft_dedup_weights`` — keep near-duplicates but down-weight them
     by exact cluster size, so sampled mass per distinct content stays
     ~1 without losing cluster-internal diversity (SoftDeDup).
  3. ``remove_repeated_spans`` — cut cross-document >=8-word shared
     passages from every non-keeper doc (the distributed form of
     suffix-array substring dedup) before token budgets are spent on
     boilerplate.

    python examples/09_retrieval_and_reweighting.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import dedup, sampling, similarity

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="retrieval-and-reweighting")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")

    # -------- 1. batch retrieval: every 10th vector queries the rest ----
    queries = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .withColumnRenamed("vec_id", "query_id")
    )
    corpus = emb.filter(F.col("vec_id") % 10 != 0)

    ann = similarity.knn_join(
        queries, corpus, k=5, method="lsh", n_planes=None, probe_hamming1=True
    )
    exact = similarity.knn_join(queries, corpus, k=5, method="brute")
    hits = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(hits & truth) / len(truth)
    print(f"knn_join: {queries.count()} queries x {corpus.count()} corpus, "
          f"LSH recall@5 vs brute = {recall:.2f}")

    # -------- 1b. the same join over PQ codes (IVFADC): the corpus side
    # of the join carries m ints + a cell id per vector, never the floats
    rows = {
        int(r.vec_id): [float(v) for v in r.embedding]
        for r in emb.filter(F.col("vec_id") < 8).collect()
    }
    books = [[rows[c][j * 16:(j + 1) * 16] for c in range(8)] for j in range(4)]
    cents = [rows[c] for c in range(4)]
    adc = similarity.pq_knn_join(queries, corpus, books, cents, k=5, nprobe=2)
    # the FAIR baseline: ADC approximates squared-L2, so grade it against
    # the exact-L2 brute join (metric="l2"), not the cosine one. On THIS
    # corpus the 8-entry codebooks are deliberately weak quantizers —
    # the single-query harness (pq_recall) measures 0.1-0.2 here, and the
    # join adds the nprobe=2-of-4 cell restriction on top; the point of
    # the acceptance harnesses is exactly to surface that before a corpus
    # is committed to codes
    l2_truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_join(
            queries, corpus, k=5, method="brute", metric="l2"
        ).collect()
    }
    adc_hits = {(r.query_id, r.neighbor_id) for r in adc.collect()}
    print(f"pq_knn_join (IVFADC, corpus side = 4 int codes + cell id per "
          f"vector, ~5 B vs 256 B of floats): recall@5 vs exact-L2 brute "
          f"join = {len(adc_hits & l2_truth) / len(l2_truth):.2f}")

    # -------- 2. boilerplate surgery before token budgets are spent -----
    clones = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat(F.lit("mirror site header "), "text").alias("text"))
    )
    crawl = docs.unionByName(clones)
    cut = dedup.remove_repeated_spans(crawl)
    surgery = cut.filter(F.col("removed_words") > 0)
    print(f"remove_repeated_spans: {surgery.count()} of {crawl.count()} docs "
          f"lost shared passages; "
          f"{cut.agg(F.sum('removed_words')).first()[0]} words removed, "
          f"keepers untouched")

    # -------- 3. reweight instead of drop, then sample by weight --------
    weights = dedup.soft_dedup_weights(
        crawl, num_hashes=16, bands=8, shingle_k=3, threshold=0.7,
        shingle_mode="word",
    )
    clustered = weights.filter(F.col("cluster_size") > 1)
    print(f"soft_dedup_weights: {clustered.count()} docs share "
          f"{clustered.select('cluster').distinct().count()} clusters; "
          f"every cluster's total weight = 1.0 (drop-free)")

    sampled = sampling.weighted_sample(
        weights.select("doc_id", "weight"),
        weight_col="weight", n=min(100, crawl.count()), key_col="doc_id",
    )
    print(f"weighted_sample over soft weights -> {sampled.count()} docs "
          f"(duplicate clusters contribute ~one expected pick each)")

    spark.stop()


if __name__ == "__main__":
    main()
