#!/usr/bin/env python
"""End-to-end LLM training-data pipeline over the documents corpus:

  quality filter → exact dedup → near-dup clustering → test-set
  decontamination → PII redaction → token chunking → train/val/test split

Every stage is a DataFrame transformation (the whole pipeline is ONE lazy
plan until the final actions), so Catalyst fuses the projections and the
only shuffles are the dedup candidate joins and the component rounds.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import dedup, quality
from mongo_arrow_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline")
    docs = load_tables(spark, sf_dir)["documents"]
    holdout = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    print(f"corpus={corpus.count()}  holdout={holdout.count()}")

    # 0. sketch profile: mergeable per-source HLL/KLL artifacts — the
    # audit that reruns incrementally as the corpus grows
    from mongo_arrow_spark.operators import profile

    artifacts = profile.sketch_profile(corpus, batch_col="source")
    profile.sketch_estimates(
        profile.merge_sketch_profiles(artifacts)
    ).orderBy("column").show()

    # 1. quality gate: Gopher-style bounds + repetition ceiling
    flagged = quality.gopher_quality_flags(corpus, min_tokens=20)
    rep = quality.repetition_metrics(flagged, top_ngram_n=2)
    kept = (
        flagged.join(rep.select("doc_id", "top_ngram_char_fraction"), "doc_id")
        .filter(F.col("q_keep") & (F.col("top_ngram_char_fraction") <= 0.20))
        .select("doc_id", "text", "lang", "source")
    )
    print("after quality gate:", kept.count())

    # 2. exact dedup (md5 digest, min-id survivor)
    kept = dedup.exact_dedup(kept)
    print("after exact dedup:", kept.count())

    # 3. near-dup: candidate pairs → connected components → survivors
    pairs = dedup.ngram_jaccard_pairs(kept, n=3, threshold=0.5, max_df=100)
    comps = dedup.connected_components(pairs)
    kept = dedup.dedup_survivors(kept, comps)
    print("after near-dup clustering:", kept.count())

    # 4. decontaminate against the holdout set
    kept = dedup.decontaminate(kept, holdout, threshold=0.5, max_df=100)
    print("after decontamination:", kept.count())

    # 5. PII redaction (projection only)
    kept = kept.withColumn("text", quality.pii_redact("text"))

    # 6. chunk into 128-token windows, stride 96
    chunks = quality.chunk_tokens(kept, chunk_size=128, stride=96)

    # 7. deterministic split (stable across engines and repartitioning)
    final = quality.train_split(chunks, id_col="doc_id")
    final.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("n_tokens"),
    ).orderBy("split").show()

    # 8. trainer handoff: pack chunks into fixed 256-token sequences over
    # independent hash streams (no global order — scales to any corpus),
    # then read back the per-sequence manifest a data loader consumes
    from mongo_arrow_spark.operators import packing

    with_uid = final.withColumn(
        "uid", F.concat_ws(":", F.col("doc_id"), F.col("chunk_id"))
    )
    packed = packing.pack_sequences(
        with_uid, seq_len=256, n_streams=8, id_col="uid", text_col="chunk_text"
    )
    manifest = packing.pack_manifest(packed, seq_len=256)
    manifest.orderBy("stream", "seq_id").show(5)

    # 9. next ingest: fold what we kept into a Bloom index so the NEXT
    # batch is gated against this corpus without ever rejoining it
    from mongo_arrow_spark.operators import membership

    index = membership.build_bloom_index(kept, "text", num_bits=1 << 22)
    resubmitted = kept.limit(100)
    gated = membership.probe_bloom(
        resubmitted, index, "text", num_bits=1 << 22
    )
    print(
        "re-submitted docs flagged by the Bloom gate:",
        gated.filter("maybe_member").count(), "/", resubmitted.count(),
    )

    # one-call alternative: curate() composes stages 1-9 (plus optional
    # duplicate-substring stripping, semantic dedup over an embedding
    # table, and the bloom_index gate) into a single lazy plan — see
    # operators/curate.py


if __name__ == "__main__":
    main()
