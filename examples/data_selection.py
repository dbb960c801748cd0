#!/usr/bin/env python
"""Targeted data selection over a raw corpus, two published strategies:

1. **Supervised classifier gate** (CCNet/GPT-3-style): fit a Naive-Bayes
   token log-odds model from a labeled seed (here: the target language),
   score every raw document, keep the top-scoring tier.
2. **DSIR importance resampling** (Xie et al. 2023): match the TARGET
   feature distribution rather than rank by a classifier — hashed
   unigram+bigram bucket log-ratios give each document an importance
   weight, and a seeded Gumbel-top-k draws the sample WITHOUT
   replacement with probability ∝ exp(log w).

Both selections are deterministic (md5-seeded), so a re-run of this
script — or a DuckDB replay, see the battery oracles — reproduces the
same picks. At cluster scale the plans are unchanged: the model/ratio
tables are broadcast-sized, per-doc shuffles collapse map-side to ~1
row/doc, and the selection is a top-k, never a full sort.

Run: python examples/data_selection.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import quality
from mongo_arrow_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("data-selection")
    docs = load_tables(spark, sf_dir)["documents"]

    # The seed: documents already labeled target-like. Any boolean label
    # works (a hand-curated sample, a domain allowlist, an earlier
    # model's high-confidence picks); here the corpus lang tag.
    labeled = docs.withColumn("is_target", F.col("lang") == "en")
    n_target = labeled.filter("is_target").count()
    print(f"corpus={docs.count()}  target-labeled={n_target}")

    # --- 1. classifier gate ------------------------------------------
    model = quality.fit_token_logodds(labeled, "is_target")
    print(
        f"model: vocab={int(model.vocab_size)} tokens "
        f"(pos/neg token mass {int(model.pos_token_total)}/"
        f"{int(model.neg_token_total)})"
    )
    scored = quality.score_token_logodds(docs, model)
    gate = scored.filter(F.col("nb_logodds") > 0)
    print("classifier gate keeps:", gate.count())
    scored.orderBy(F.col("nb_logodds").desc()).show(5)

    # --- 2. DSIR resample --------------------------------------------
    target = docs.filter(F.col("lang") == "en")
    picked = quality.importance_resample(
        docs, target, k=100, seed="example", temperature=1.0
    )
    # how target-like is the draw vs the raw corpus? (the sample keeps
    # every raw column, lang included)
    frac = picked.agg(
        F.avg((F.col("lang") == "en").cast("double"))
    ).first()[0]
    base = docs.agg(F.avg((F.col("lang") == "en").cast("double"))).first()[0]
    print(
        f"DSIR sample of 100: target-language fraction {frac:.2f} "
        f"(corpus baseline {base:.2f})"
    )
    picked.select("doc_id", F.round("log_importance", 3).alias("log_w")).show(5)

    # --- 3. the product surface: curate() with prefit artifacts -------
    # fit once, save to parquet (scalars ride in schema metadata), then
    # any batch — or any foreachBatch micro-batch, see
    # curate.select_with_models — selects against the frozen artifacts
    import tempfile

    from mongo_arrow_spark.operators.curate import curate

    with tempfile.TemporaryDirectory() as tmp:
        quality.save_token_logodds(model, f"{tmp}/nb")
        ratio_model = quality.fit_bucket_ratios(docs, target)
        quality.save_bucket_ratios(ratio_model, f"{tmp}/dsir")
        from mongo_arrow_spark.operators import text as text_ops

        lm = text_ops.fit_ngram_lm(docs)
        text_ops.save_ngram_lm(lm, f"{tmp}/lm")
        curated = curate(
            docs,
            jaccard_threshold=None,
            nb_model=quality.load_token_logodds(spark, f"{tmp}/nb"),
            nb_min_logodds=0.0,
            dsir_model=quality.load_bucket_ratios(spark, f"{tmp}/dsir"),
            dsir_k=50,
            # CCNet tiering: drop the tail perplexity tier
            lm_model=text_ops.load_ngram_lm(spark, f"{tmp}/lm"),
        )
        print("curate() with NB gate + LM tiers + DSIR selection:",
              curated.count())

    spark.stop()


if __name__ == "__main__":
    main()
