"""Time-series operator units: downsample fill modes and grid shape
(the battery entry ts_downsample pins the zero-fill form against a
generate_series DuckDB oracle; these pin locf and the grid contract)."""

import datetime

from pyspark.sql import functions as F

from mongo_arrow_spark.operators.timeseries import downsample


def _series(spark):
    base = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        # key "a": hours 0, 1, 4 (gap at 2, 3)
        ("a", base, 10.0),
        ("a", base + datetime.timedelta(hours=1), 20.0),
        ("a", base + datetime.timedelta(hours=4), 40.0),
        # key "b": hours 0, 2 (gap at 1)
        ("b", base, 1.0),
        ("b", base + datetime.timedelta(hours=2), 3.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_downsample_no_fill_only_populated_buckets(spark):
    out = downsample(
        _series(spark), ts_col="ts", every="1 hour", keys=["k"],
        aggs={"n": F.count(F.lit(1)).cast("long"), "s": F.sum("v")},
    ).orderBy("k", "bucket").collect()
    assert [(r["k"], r["bucket"].hour, r["n"], r["s"]) for r in out] == [
        ("a", 0, 1, 10.0), ("a", 1, 1, 20.0), ("a", 4, 1, 40.0),
        ("b", 0, 1, 1.0), ("b", 2, 1, 3.0),
    ]


def test_downsample_zero_fill_densifies_per_key(spark):
    out = downsample(
        _series(spark), ts_col="ts", every="1 hour", keys=["k"],
        aggs={"s": F.sum("v")}, fill="zero",
    ).orderBy("k", "bucket").collect()
    a = [(r["bucket"].hour, r["s"]) for r in out if r["k"] == "a"]
    b = [(r["bucket"].hour, r["s"]) for r in out if r["k"] == "b"]
    assert a == [(0, 10.0), (1, 20.0), (2, 0.0), (3, 0.0), (4, 40.0)]
    assert b == [(0, 1.0), (1, 0.0), (2, 3.0)]  # grid spans per key


def test_downsample_locf_fill_carries_gauges(spark):
    out = downsample(
        _series(spark), ts_col="ts", every="1 hour", keys=["k"],
        aggs={"s": F.sum("v")}, fill="locf",
    ).orderBy("k", "bucket").collect()
    a = [(r["bucket"].hour, r["s"]) for r in out if r["k"] == "a"]
    assert a == [(0, 10.0), (1, 20.0), (2, 20.0), (3, 20.0), (4, 40.0)]


def test_downsample_rejects_bad_fill(spark):
    import pytest

    with pytest.raises(ValueError, match="fill"):
        downsample(_series(spark), fill="interpolate")
