"""Model-artifact round-trip discipline (r8): every fitted model the
selection tier produces must survive a parquet save/load with its scalar
parameters riding in schema metadata (the build_lsh_index precedent), and
a LOADED model must score bit-for-bit identically to the in-memory one —
the fit-once/score-many contract at 100 TB is an artifact on disk, not a
live DataFrame lineage.
"""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators import quality, text

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang")
    )


def _rows(df, key="doc_id"):
    return sorted((tuple(r) for r in df.collect()))


def test_token_logodds_roundtrip_bit_exact(spark, docs, tmp_path):
    model = quality.fit_token_logodds(
        docs.withColumn("pos", F.col("lang") == "en"), "pos"
    )
    path = str(tmp_path / "nb_model")
    quality.save_token_logodds(model, path)
    loaded = quality.load_token_logodds(spark, path)
    assert loaded.default_log_odds == model.default_log_odds
    assert loaded.pos_token_total == model.pos_token_total
    assert loaded.neg_token_total == model.neg_token_total
    assert loaded.vocab_size == model.vocab_size
    got = _rows(quality.score_token_logodds(docs, loaded))
    want = _rows(quality.score_token_logodds(docs, model))
    assert got == want  # bit-for-bit, no tolerance


def test_bucket_ratios_roundtrip_bit_exact(spark, docs, tmp_path):
    model = quality.fit_bucket_ratios(
        docs, docs.filter(F.col("lang") == "en"), buckets=512
    )
    path = str(tmp_path / "dsir_model")
    quality.save_bucket_ratios(model, path)
    loaded = quality.load_bucket_ratios(spark, path)
    assert loaded.default_lr == model.default_lr
    assert loaded.buckets == model.buckets == 512
    assert loaded.alpha == model.alpha
    got = _rows(quality.apply_bucket_ratios(docs, loaded).select(
        "doc_id", "log_importance"))
    want = _rows(quality.apply_bucket_ratios(docs, model).select(
        "doc_id", "log_importance"))
    assert got == want
    # and the Gumbel-top-k selection is identical under the loaded model
    got_k = _rows(quality.importance_resample(docs, None, k=20, model=loaded)
                  .select("doc_id"))
    want_k = _rows(quality.importance_resample(docs, None, k=20, model=model)
                   .select("doc_id"))
    assert got_k == want_k


def test_ngram_lm_roundtrip_bit_exact(spark, docs, tmp_path):
    model = text.fit_ngram_lm(docs, vocab_size=200, bigram_size=500)
    path = str(tmp_path / "lm_model")
    text.save_ngram_lm(model, path)
    loaded = text.load_ngram_lm(spark, path)
    assert loaded.oov_lp == model.oov_lp
    assert loaded.backoff == model.backoff
    assert loaded.vocab_size == model.vocab_size
    assert loaded.bigram_size == model.bigram_size
    assert loaded.alpha == model.alpha
    got = _rows(text.score_ngram_lm(docs, loaded))
    want = _rows(text.score_ngram_lm(docs, model))
    assert got == want


def test_load_rejects_non_artifact_parquet(spark, docs, tmp_path):
    """A plain parquet without model metadata must fail loudly, not load
    as a silently-broken model."""
    path = str(tmp_path / "plain")
    docs.select(F.col("text").alias("w"), F.lit(0.0).alias("log_odds")) \
        .limit(5).write.parquet(path)
    with pytest.raises(ValueError, match="not a save_token_logodds"):
        quality.load_token_logodds(spark, path)
    with pytest.raises(ValueError, match="not a save_bucket_ratios"):
        docs.select(F.col("doc_id").alias("b"), F.lit(0.0).alias("lr")) \
            .limit(5).write.parquet(str(tmp_path / "plain_b"))
        quality.load_bucket_ratios(spark, str(tmp_path / "plain_b"))


def test_token_logodds_max_vocab_bounds_model(spark, docs):
    """r8: max_vocab bounds the broadcast table without changing the
    smoothing — dropped tokens score the OOV default; in-vocab tokens
    keep their full-fit log-odds."""
    from pyspark.sql import functions as F  # noqa: F811

    labeled = docs.withColumn("pos", F.col("lang") == "en")
    full = quality.fit_token_logodds(labeled, "pos")
    cut = quality.fit_token_logodds(labeled, "pos", max_vocab=10)
    assert cut.tokens.count() == 10
    assert cut.default_log_odds == full.default_log_odds
    assert cut.vocab_size == full.vocab_size  # smoothing from FULL totals
    full_lo = dict(full.tokens.collect())
    for w, lo in cut.tokens.collect():
        assert lo == full_lo[w]
    # scoring still runs and stays bounded
    assert quality.score_token_logodds(docs, cut).count() == docs.count()
