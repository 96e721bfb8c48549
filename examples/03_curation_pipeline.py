#!/usr/bin/env python
"""A training-data curation pass over the documents corpus: corpus-level
line dedup, MinHash near-dup removal, quality gating, CCNet perplexity
buckets, DSIR importance weights, then sequence packing — each step a
scale-designed operator (see SURVEY.md §8 for the 100 TB rationale per
step).

    python examples/03_curation_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import dedup, sampling, text

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")
    n0 = docs.count()

    # 1. corpus-level duplicate-line removal (C4 boilerplate step)
    cleaned = text.line_dedup(docs).select(
        "doc_id", F.col("cleaned_text").alias("text"), "n_lines", "n_kept"
    )
    # 2. MinHash-LSH near-dup removal
    kept = dedup.minhash_dedup(cleaned.filter(F.length("text") > 0))
    n2 = kept.count()

    # 3. model-based quality gate
    gated = text.quality_classifier(kept.join(docs.select("doc_id", "lang"), "doc_id"))
    n3 = gated.filter("keep").count()

    # 4. CCNet perplexity terciles per language (head = best third)
    buckets = text.ccnet_bucket(
        gated.filter("keep").select("doc_id", "text", "lang")
    )
    # 5. DSIR importance weights toward the en slice
    weights = text.dsir_weights(
        gated.filter("keep").select("doc_id", "text", "lang"),
        F.col("lang") == "en",
    )

    # 6. pack the survivors into 2048-token sequences
    packed = sampling.pack_sequences(
        text.token_count(gated.filter("keep")).select("doc_id", "n_tokens"),
        "n_tokens", 2048,
    )

    print(f"corpus: {n0} docs -> near-dedup {n2} -> quality-gated {n3}")
    print("ccnet buckets:")
    buckets.groupBy("lang", "bucket").count().orderBy("lang", "bucket").show()
    print("dsir weight range:")
    weights.agg(F.min("log_weight"), F.max("log_weight")).show()
    print("packs:", packed.agg(F.max("pack_id")).collect()[0][0] + 1)


if __name__ == "__main__":
    main()
