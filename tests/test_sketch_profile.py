"""Mergeable sketch profiles: HLL distinct / KLL quantile accuracy vs
exact answers, batch-merge == whole-corpus equivalence, and the
sketch-only cross-corpus overlap screen."""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.profile import (
    estimate_overlap,
    merge_sketch_profiles,
    sketch_estimates,
    sketch_profile,
)


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


def _est_map(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_hll_estimates_close_to_exact(docs):
    prof = merge_sketch_profiles(sketch_profile(docs))
    est = _est_map(sketch_estimates(prof))
    for col in ("doc_id", "text", "lang", "source"):
        exact = docs.select(col).distinct().count()
        got = est[col]["n_distinct_approx"]
        assert abs(got - exact) <= max(2, 0.05 * exact), (col, got, exact)
    n = docs.count()
    assert all(v["n_rows"] == n for v in est.values())


def test_kll_quantiles_close_to_exact(docs):
    prof = merge_sketch_profiles(sketch_profile(docs))
    est = _est_map(sketch_estimates(prof, quantiles=(0.5, 0.9)))
    exact_p50, exact_p90 = docs.select(
        F.percentile("n_chars", F.lit(0.5)), F.percentile("n_chars", F.lit(0.9))
    ).first()
    got = est["n_chars"]
    # KLL is rank-accurate: allow 2% rank slack translated via the range
    lo, hi = docs.select(F.min("n_chars"), F.max("n_chars")).first()
    slack = 0.05 * (hi - lo) + 1
    assert abs(got["q_0.5"] - exact_p50) <= slack
    assert abs(got["q_0.9"] - exact_p90) <= slack
    # strings carry no quantile
    assert est["text"]["q_0.5"] is None


def test_batch_merge_equals_whole(docs):
    """Per-source artifacts merged == one whole-corpus sketch (HLL merge
    is register-wise max — exactly the same registers either way)."""
    whole = _est_map(sketch_estimates(merge_sketch_profiles(sketch_profile(docs))))
    merged = _est_map(
        sketch_estimates(
            merge_sketch_profiles(sketch_profile(docs, batch_col="source"))
        )
    )
    for col, w in whole.items():
        if col == "source":
            continue  # excluded from batch profile (it's the batch key)
        m = merged[col]
        assert m["n_rows"] == w["n_rows"]
        assert m["n_distinct_approx"] == w["n_distinct_approx"], col
        assert m["n_nulls"] == w["n_nulls"]


def test_overlap_screen(docs, spark):
    """|A ∩ B| estimated from sketches alone tracks the true overlap:
    A = docs, B = half of docs plus fresh synthetic ids."""
    a = docs.select("doc_id")
    half = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    n_half = half.count()
    fresh = spark.range(1_000_000, 1_000_000 + n_half).select(
        F.col("id").alias("doc_id")
    )
    b = half.unionAll(fresh)
    pa = merge_sketch_profiles(sketch_profile(a))
    pb = merge_sketch_profiles(sketch_profile(b))
    row = estimate_overlap(pa, pb, "doc_id").first()
    true_overlap = n_half
    assert abs(row["n_overlap_approx"] - true_overlap) <= max(
        5, 0.1 * true_overlap
    ), row
    assert row["n_distinct_a"] >= row["n_overlap_approx"] - 5


def test_artifact_roundtrip(docs, tmp_path):
    """Sketch artifacts survive parquet persistence — the incremental
    workflow is write-artifact-now, merge-later."""
    prof = sketch_profile(docs, batch_col="lang")
    path = str(tmp_path / "profile_artifacts")
    prof.write.mode("overwrite").parquet(path)
    spark = docs.sparkSession
    reloaded = spark.read.parquet(path)
    est = _est_map(sketch_estimates(merge_sketch_profiles(reloaded)))
    exact = docs.select("text").distinct().count()
    got = est["text"]["n_distinct_approx"]
    assert abs(got - exact) <= max(2, 0.05 * exact)
