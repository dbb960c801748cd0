#!/usr/bin/env python
"""Incremental ingest-gate workflow: keep a standing corpus clean without
ever rescanning it.

Two persisted artifacts guard the door:

- a Bloom bit table (exact membership — "have we ingested these exact
  bytes before?"), and
- a MinHash-LSH index (near-duplicate membership — "is this a light edit
  of something we already hold?").

Both are built once, written as parquet, and probed by every incoming
batch; the corpus text itself is never re-read. New accepted docs extend
the LSH index incrementally (``update_lsh_index``) — signatures are
computed for the new rows only.

Run: python examples/ingest_gate.py  (uses /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import dedup, membership
from mongo_arrow_spark.session import get_spark, load_tables


def main() -> None:
    spark = get_spark("ingest_gate", shuffle_partitions=8)
    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    corpus = docs.filter(F.col("doc_id") % 2 == 0)  # the standing corpus
    batch = docs.filter(F.col("doc_id") % 2 == 1)  # today's arrivals

    art = tempfile.mkdtemp(prefix="gate_artifacts_")

    # ---- build both artifacts once (in production: a nightly job) ----
    bloom = membership.build_bloom_index(corpus, key_col="text", num_bits=1 << 20)
    bloom.write.parquet(os.path.join(art, "bloom"))
    lsh = dedup.build_lsh_index(corpus, "doc_id", "text")
    lsh.write.parquet(os.path.join(art, "lsh"))

    # ---- probe an incoming batch against the persisted artifacts ----
    bloom_idx = spark.read.parquet(os.path.join(art, "bloom"))
    lsh_idx = spark.read.parquet(os.path.join(art, "lsh"))

    flagged = membership.probe_bloom(
        batch, bloom_idx, key_col="text", num_bits=1 << 20
    )
    gated = dedup.probe_neardup(flagged, lsh_idx, threshold=0.7)

    verdicts = gated.select(
        "doc_id",
        F.col("maybe_member").alias("exact_dup_maybe"),
        F.col("neardup").alias("near_dup"),
        "neardup_best_id",
    )
    print("--- gate verdicts (first 10) ---")
    verdicts.orderBy("doc_id").show(10, truncate=False)

    accepted = gated.filter(~F.col("maybe_member") & ~F.col("neardup"))
    n_in, n_ok = batch.count(), accepted.count()
    print(f"batch: {n_in} docs → accepted {n_ok}, "
          f"gated out {n_in - n_ok} (exact-or-near duplicates)")

    # ---- extend the LSH index with what we accepted (incremental) ----
    grown = dedup.update_lsh_index(
        lsh_idx, accepted.select("doc_id", "text")
    )
    grown.write.mode("overwrite").parquet(os.path.join(art, "lsh_v2"))
    print(f"lsh index: {lsh_idx.count()} → {grown.count()} entries "
          f"(new signatures computed for accepted docs only)")

    # ---- the same flow as ONE product operator (r8) ----------------
    from mongo_arrow_spark.operators.curate import ingest_gate

    accepted2, grown2, _pars2 = ingest_gate(
        batch,
        bloom_index=bloom_idx,
        bloom_num_bits=1 << 20,
        lsh_index=lsh_idx.cache(),
        neardup_threshold=0.7,
        min_tokens=None,  # match the manual flow above (no quality gate)
    )
    print(f"ingest_gate(): accepted {accepted2.count()}, "
          f"index {grown2.count()} entries")


if __name__ == "__main__":
    main()
