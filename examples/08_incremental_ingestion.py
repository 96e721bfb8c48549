#!/usr/bin/env python
"""The recurring-crawl ingestion shape: a new snapshot arrives against a
corpus that is already deduped, and per-ingest cost must scale with the
BATCH, never with the corpus's duplicate structure. Three round-7
operators compose into the pass:

  1. ``dedup_lines_in_doc`` — within-document repeated-line removal, a
     pure map (zero exchanges): the cheapest hygiene step, run before
     anything that shuffles text.
  2. ``incremental_dedup`` — exact digests against the corpus: one
     anti-join on md5 digests, corpus text never shuffles.
  3. ``incremental_minhash_dedup`` — NEAR dedup against the corpus: the
     corpus side contributes LSH banding rows only and NEVER self-joins
     (re-running the full pipeline would re-emit every corpus pair
     cluster on every ingest); corpus signatures can be precomputed and
     stored with the corpus (``corpus_signatures=...``). Since round 9
     the corpus side never SHUFFLES either: the batch's distinct digests
     and buckets semi-probe the corpus (broadcast probes), so per-batch
     shuffle is batch-bounded at any corpus size — and the streaming
     loop (``incremental_ingest_stream``, example below) persists a
     narrow (id, digest, signature) index per epoch so corpus text is
     never re-hashed per batch.

    python examples/08_incremental_ingestion.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import dedup, text

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="incremental-ingestion")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, SF, "documents").select("doc_id", "text")

    # synthesize an incoming snapshot: near-dups of corpus docs, exact
    # re-crawls, internally-repetitive pages, and genuinely new docs
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    rev = F.array_join(F.reverse(F.split(norm, " ")), " ")
    batch = (
        corpus.filter(F.col("doc_id") % 20 == 0)  # near-dups (boilerplate drift)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat("text", F.lit(" updated footer")).alias("text"))
        .unionByName(
            corpus.filter(F.col("doc_id") % 20 == 5)  # exact re-crawls
            .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        )
        .unionByName(
            corpus.filter(F.col("doc_id") % 20 == 10)  # new docs (reversed text)
            .select((F.col("doc_id") + 3_000_000).alias("doc_id"),
                    rev.alias("text"))
        )
    )
    n0 = batch.count()
    print(f"incoming snapshot: {n0} docs against a {corpus.count()}-doc corpus")

    # 1. within-doc hygiene (pure map — zero exchanges, see the plan test)
    cleaned = text.dedup_lines_in_doc(batch).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )

    # 2. exact digests vs corpus (anti-join on md5 — drops the re-crawls)
    fresh = dedup.incremental_dedup(cleaned, corpus)
    n2 = fresh.count()
    print(f"after exact incremental dedup: {n2} (dropped {n0 - n2} re-crawls)")

    # 3. NEAR dedup vs corpus (asymmetric LSH probe — drops the drifted
    # near-dups; at production scale pass corpus_signatures= from store)
    kept = dedup.incremental_minhash_dedup(
        fresh, corpus, num_hashes=16, bands=4, shingle_k=3,
        threshold=0.7, shingle_mode="word",
    )
    n3 = kept.count()
    print(f"after near incremental dedup:  {n3} (dropped {n2 - n3} near-dups)")
    print("surviving id families:",
          sorted({r.doc_id // 1_000_000 for r in kept.select("doc_id").collect()}))
    spark.stop()


if __name__ == "__main__":
    main()
