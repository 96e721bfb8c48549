#!/usr/bin/env python
"""The corpus-governance pass: the reports you read BEFORE committing a
100 TB pipeline run, composed from the round-7 operators:

  1. ``snapshot_delta`` — diff the fresh crawl against the previous
     snapshot at digest level (text never shuffles); only the
     added/changed slice re-enters the pipeline.
  2. ``fuzzy_decontaminate`` — near-dup eval scrub over that slice: the
     benchmark broadcasts, the corpus side stays map-only; report mode
     attributes each leak to the eval item that caused it.
  3. ``filter_funnel`` — per-gate attrition (and which gates are dead
     weight) in one scan.
  4. ``threshold_sweep`` — survivor docs AND surviving token mass at
     candidate quality cut points, one pass for all of them.
  5. ``bpe_train`` — the tokenizer merge loop over the surviving slice:
     corpus touched once, each round iterates the Zipf-small vocab.
  6. ``bpe_tokenize`` — tokenize-to-count with the learned merges via
     the production Arrow-batched kernel (scales to 32k-merge vocabs).
  7. ``bpe_vocab`` + ``bpe_tokenize(emit="ids")`` — frequency-ranked
     token ids and the model-input id arrays, loop closed end to end.

    python examples/10_corpus_governance.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from starlight_for_kafka_spark import get_session, load_table
from starlight_for_kafka_spark.operators import dedup, text

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session(app="corpus-governance")
    spark.sparkContext.setLogLevel("ERROR")
    old = load_table(spark, SF, "documents").select("doc_id", "text")

    # synthesize the fresh crawl: some pages vanish, some get revised,
    # some are brand new (word-reversed so they are genuinely distinct)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    rev = F.array_join(F.reverse(F.split(norm, " ")), " ")
    new = (
        old.filter(F.col("doc_id") % 10 != 1)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 2,
                F.concat("text", F.lit(" revised content")),
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            old.filter(F.col("doc_id") % 10 == 3).select(
                (F.col("doc_id") + 9_000_000).alias("doc_id"), rev.alias("text")
            )
        )
    )

    # 1. snapshot diff: what actually needs re-processing?
    delta = dedup.snapshot_delta(old, new).localCheckpoint(eager=True)
    delta.groupBy("status").count().orderBy("status").show()
    todo_ids = delta.filter(F.col("status").isin("added", "changed")).select(
        "doc_id"
    )
    slice_df = new.join(F.broadcast(todo_ids), "doc_id")
    print(f"re-processing slice: {slice_df.count()} docs (of {new.count()})")

    # 2. eval scrub on the slice: benchmark broadcasts, slice stays map-only
    bench = old.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 7_000_000).alias("doc_id"),
        F.concat("text", F.lit(" eval answer token")).alias("text"),
    )
    leaks = dedup.fuzzy_decontaminate(
        slice_df, bench, num_hashes=16, bands=4, shingle_k=3,
        threshold=0.7, shingle_mode="word", mode="report",
    )
    print("leak attribution (which eval item taints how many docs):")
    leaks.groupBy("bench_id").agg(
        F.count("*").alias("tainted_docs"), F.max("jaccard").alias("worst")
    ).orderBy(F.desc("tainted_docs")).show(5)
    clean = dedup.fuzzy_decontaminate(
        slice_df, bench, num_hashes=16, bands=4, shingle_k=3,
        threshold=0.7, shingle_mode="word",
    )

    # 3. gate attrition: which rule removes what, which are dead weight
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    text.filter_funnel(
        clean,
        [
            ("min_chars", F.length("text") >= 200),
            ("min_words", n_words >= 30),
            ("max_words", n_words <= 2000),
        ],
    ).show()

    # 4. quality-cut calibration: docs AND token mass at each candidate cut
    scored = text.quality_score(text.token_count(clean))
    text.threshold_sweep(
        scored, "stop_ratio", [0.02, 0.05, 0.1, 0.2], weight_col="n_tokens"
    ).show()

    # 5. tokenizer training over the survivors (corpus touched once).
    # bpe_train is the oracle-exact distributed loop (~2 Spark jobs per
    # merge — right for bounded k like this); bpe_train_local is the
    # PRODUCTION trainer for 32k-merge vocabularies: the same word-freq
    # collapse, then a driver-side incremental heap — identical output,
    # property-pinned.
    merges = text.bpe_train_local(clean, n_merges=5)
    print("learned BPE merges (production heap trainer):")
    merges.show()

    # 6. tokenize-to-count with the learned merges: bpe_apply folds each
    # rank as a JVM expression (right for bounded merge lists like this
    # one); bpe_tokenize is the production path for a full 32k-merge
    # vocabulary — same output schema, Arrow-batched kernel, broadcast
    # ranks, per-partition word cache
    pairs = [(r["left"], r["right"]) for r in merges.collect()]
    print("token counts under the learned merges (production kernel):")
    text.bpe_tokenize(clean, pairs, emit="counts").show(5)

    # 7. the full loop to MODEL INPUT: frequency-ranked vocab ids, then
    # tokenize-to-ids (vocab + ranks in one broadcast, kernel map-only)
    vocab = {
        r["token"]: int(r["token_id"])
        for r in text.bpe_vocab(clean, pairs).collect()
    }
    print(f"vocab size {len(vocab)}; token-id arrays:")
    text.bpe_tokenize(clean, pairs, emit="ids", vocab=vocab).show(3)

    spark.stop()


if __name__ == "__main__":
    main()
