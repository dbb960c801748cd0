"""Bucketed (co-located) table layout: the pay-the-shuffle-once contract.

These are plan-shape gates, not row-count smoke tests: the entire value
of bucketing is the *absence* of Exchange operators, so that is what is
pinned. Row-level correctness is separately asserted against the same
join done on the raw (unbucketed) DataFrames.
"""

import os

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.sources.bucketed import (
    bucket_spec,
    colocated_join,
    read_bucketed,
    save_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tables, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    save_bucketed(
        tables["orders"],
        "t_orders_bkt",
        os.path.join(d, "orders"),
        "o_orderkey",
        num_buckets=8,
        sort_cols="o_orderkey",
    )
    save_bucketed(
        tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_bkt",
        os.path.join(d, "lineitem"),
        "o_orderkey",
        num_buckets=8,
        sort_cols="o_orderkey",
    )
    yield {
        "orders": read_bucketed(spark, "t_orders_bkt"),
        "lineitem": read_bucketed(spark, "t_lineitem_bkt"),
    }
    spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucket_spec_roundtrip(spark, bucketed):
    spec = bucket_spec(spark, "t_orders_bkt")
    assert spec == {
        "num_buckets": 8,
        "bucket_cols": ["o_orderkey"],
        "sort_cols": ["o_orderkey"],
    }


def test_colocated_join_has_no_exchange(spark, bucketed):
    """Fact-fact join on the bucket key must be exchange-free AND
    sort-free (both sides sorted within buckets at write time)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(
            bucketed["orders"],
            bucketed["lineitem"].select("o_orderkey", "l_quantity"),
            "o_orderkey",
        )
        p = _plan(j)
        assert "Exchange" not in p, f"bucketed join shuffled:\n{p}"
        assert "SortMergeJoin" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_colocated_join_matches_unbucketed(spark, tables, bucketed):
    j = colocated_join(
        bucketed["orders"].select("o_orderkey", "o_totalprice"),
        bucketed["lineitem"].select("o_orderkey", "l_quantity"),
        "o_orderkey",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice") * F.col("l_quantity")).alias("s"),
    )
    raw = (
        tables["orders"]
        .select("o_orderkey", "o_totalprice")
        .join(
            tables["lineitem"].select(
                F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
            ),
            "o_orderkey",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice") * F.col("l_quantity")).alias("s"),
        )
    )
    got, exp = j.collect()[0], raw.collect()[0]
    assert got["n"] == exp["n"]
    # double summation order differs between the two plans
    assert got["s"] == pytest.approx(exp["s"], rel=1e-12)


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed):
    """Bucketing satisfies the aggregation's required distribution too —
    a groupBy on the bucket column runs bucket-local."""
    agg = bucketed["orders"].groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    p = _plan(agg)
    assert "Exchange" not in p, f"bucketed agg shuffled:\n{p}"


def test_bucket_pruning_on_equality_filter(spark, bucketed):
    """An equality filter on the bucket column scans 1 bucket of 8.

    autoBucketedScan normally drops the bucketed layout for filter-only
    scans (no distribution requirement to satisfy); pruning needs it
    forced on — which is how a point-lookup job on a 100 TB bucketed
    table would run it.
    """
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        f = bucketed["orders"].filter(F.col("o_orderkey") == 7)
        p = _plan(f)
        assert "SelectedBucketsCount: 1 out of 8" in p, p
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )


def test_mismatched_bucket_counts_still_join_correctly(
    spark, tables, tmp_path_factory
):
    """4-bucket × 8-bucket: correctness holds; with bucket coalescing
    enabled Spark shuffles at most one side."""
    d = tmp_path_factory.mktemp("bucketed_mismatch")
    save_bucketed(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        "t_orders_bkt4",
        os.path.join(d, "orders4"),
        "o_orderkey",
        num_buckets=4,
    )
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(
            read_bucketed(spark, "t_orders_bkt4"),
            read_bucketed(spark, "t_lineitem_bkt").select(
                "o_orderkey", "l_quantity"
            ),
            "o_orderkey",
        )
        p = _plan(j)
        # coalesced: the 8-bucket side folds to 4, neither side shuffles
        assert p.count("Exchange") == 0, p
        expected = (
            tables["lineitem"]
            .join(
                tables["orders"],
                tables["lineitem"].l_orderkey == tables["orders"].o_orderkey,
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt4")
