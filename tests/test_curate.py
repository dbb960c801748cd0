"""curate(): the composed corpus pipeline.

The end-to-end hash oracle lives in the battery (curate_corpus). These
tests pin the stage semantics the oracle can't see: toggles, chunk-path
provenance, funnel report, and the subset/monotonicity relations between
stages.
"""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.curate import curate, curation_report
from mongo_arrow_spark.operators.quality import gopher_quality_flags


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"].select("doc_id", "text")


def test_quality_gate_applied(spark, docs):
    out = curate(docs, jaccard_threshold=None, redact_pii=False)
    flags = gopher_quality_flags(docs, "text", min_tokens=20)
    n_pass = flags.filter("q_keep").count()
    assert 0 < out.count() <= n_pass


def test_fuzzy_stage_only_removes(docs):
    no_fuzzy = curate(docs, jaccard_threshold=None)
    fuzzy = curate(docs, jaccard_threshold=0.3, max_df=100)
    assert fuzzy.count() <= no_fuzzy.count()
    # fuzzy survivors are a subset of the exact-dedup output
    extra = fuzzy.select("doc_id").exceptAll(no_fuzzy.select("doc_id"))
    assert extra.count() == 0


def test_decontaminate_drops_near_matches(docs):
    holdout = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    plain = curate(corpus, jaccard_threshold=None)
    decon = curate(
        corpus, holdout, jaccard_threshold=None, decontaminate_threshold=0.5
    )
    assert decon.count() <= plain.count()


def test_split_column_and_proportions(docs):
    out = curate(docs, jaccard_threshold=None, train=0.5, val=0.25)
    counts = dict(out.groupBy("split").count().collect())
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / total == pytest.approx(0.5, abs=0.1)


def test_chunk_path_carries_split(docs):
    out = curate(
        docs, jaccard_threshold=None, chunk_size=16, stride=16
    )
    assert {"doc_id", "chunk_id", "chunk_text", "n_chunk_tokens", "split"} <= set(
        out.columns
    )
    # every chunk's doc carries exactly one split value
    assert (
        out.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
    assert out.agg(F.max("n_chunk_tokens")).first()[0] <= 16


def test_pii_redaction_toggle(spark):
    df = spark.createDataFrame(
        [(1, "a" * 30 + " contact me at bob@example.com please " + "b" * 30)],
        "doc_id bigint, text string",
    )
    red = curate(
        df,
        jaccard_threshold=None,
        min_tokens=1,
        max_symbol_word_ratio=1.0,
        max_mean_word_len=100.0,
    )
    raw = curate(
        df,
        jaccard_threshold=None,
        min_tokens=1,
        max_symbol_word_ratio=1.0,
        max_mean_word_len=100.0,
        redact_pii=False,
    )
    assert "[PII]" in red.first()["text"]
    assert "bob@example.com" in raw.first()["text"]


def test_curation_report_funnel(docs):
    out = curate(docs, jaccard_threshold=None)
    rep = curation_report(docs, out).first()
    assert rep["n_input"] == docs.count()
    assert rep["n_output"] == out.count() == rep["n_docs"]
    assert rep["n_train"] + rep["n_val"] + rep["n_test"] == rep["n_output"]
