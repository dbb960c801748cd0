"""Reference fixture-shape parity (FIXTURES.md F1-F8): the null/missing/
nested cases that were the reference's hardest bugs, re-created on the
documents source with synthesized data (no reference files copied)."""

import json
import math

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.sources import register


def _write(tmp_path, name, docs):
    p = tmp_path / name
    with open(p, "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")
    return str(p)


def test_f1_simple_missing_field(spark, tmp_path):
    """F1: doc 4 omits `data` → NULL."""
    register(spark)
    p = _write(
        tmp_path,
        "f1.jsonl",
        [{"_id": i, "data": v} for i, v in [(1, 10), (2, 20), (3, 30)]]
        + [{"_id": 4}],
    )
    df = spark.read.format("documents").load(p)
    rows = {r["_id"]: r["data"] for r in df.collect()}
    assert rows == {1: 10, 2: 20, 3: 30, 4: None}


def test_f3_nested_struct_and_list(spark, tmp_path):
    register(spark)
    p = _write(
        tmp_path,
        "f3.jsonl",
        [
            {"_id": 1, "list": [1, 2], "nested": {"str": "a", "float": 1.5}},
            {"_id": 2, "list": [], "nested": {"str": None, "float": 2.5}},
            {"_id": 3},
        ],
    )
    df = spark.read.format("documents").load(p)
    rows = {r["_id"]: r for r in df.collect()}
    assert list(rows[1]["list"]) == [1, 2]
    assert rows[1]["nested"]["str"] == "a"
    assert rows[2]["nested"]["str"] is None
    assert rows[3]["nested"] is None and rows[3]["list"] is None


def test_f4_deep_nesting_projection(spark, tmp_path):
    """F4: 3-level struct with list-of-struct leaf; nested projection."""
    register(spark)
    docs = [
        {
            "_id": i,
            "top": {
                "middle": {
                    "value": f"v{i}",
                    "bottom": [{"event": "2024-01-01T00:00:00", "value": float(i)}],
                }
            },
        }
        for i in range(3)
    ]
    docs.append({"_id": 99, "top": {"middle": {"value": "nobottom"}}})
    p = _write(tmp_path, "f4.jsonl", docs)
    df = spark.read.format("documents").load(p)
    out = df.select("_id", F.col("top.middle.value").alias("v"),
                    F.col("top.middle.bottom").alias("b")).collect()
    rows = {r["_id"]: r for r in out}
    assert rows[1]["v"] == "v1" and rows[1]["b"][0]["value"] == 1.0
    assert rows[99]["v"] == "nobottom" and rows[99]["b"] is None


def test_f5_missing_branch_is_null_not_empty(spark, tmp_path):
    """F5 invariant: projecting an absent nested list yields NULL, not []."""
    register(spark)
    p = _write(
        tmp_path,
        "f5.jsonl",
        [
            {"o": {"inner": {"lst": [{"f": 1.0}]}}},
            {"o": {"inner": {}}},
            {"o": {}},
            {},
        ],
    )
    df = spark.read.format("documents").load(p)
    vals = [r["l"] for r in df.select(F.col("o.inner.lst").alias("l")).collect()]
    assert list(vals[0])[0]["f"] == 1.0
    assert vals[1] is None and vals[2] is None and vals[3] is None


def test_f6_heterogeneous_sequence(spark, tmp_path):
    """F6 exact expected sequence under long schema, permissive:
    [1, "2", true, 4, 2.9, NaN, null, missing] →
    [1, NULL, 1, 4, 2, NULL, NULL, NULL]."""
    register(spark)
    docs = [
        {"i": 0, "a": 1},
        {"i": 1, "a": "2"},
        {"i": 2, "a": True},
        {"i": 3, "a": 4},
        {"i": 4, "a": 2.9},
        {"i": 5, "a": float("nan")},
        {"i": 6, "a": None},
        {"i": 7},
    ]
    p = tmp_path / "f6.jsonl"
    with open(p, "w") as fh:
        for d in docs:
            # json.dumps writes NaN as NaN (non-standard); our reader uses
            # python json which accepts it back
            fh.write(json.dumps(d) + "\n")
    df = (
        spark.read.format("documents")
        .option("declaredSchema", "i bigint, a bigint")
        .load(str(p))
    )
    vals = [r["a"] for r in df.orderBy("i").collect()]
    assert vals == [1, None, 1, 4, 2, None, None, None]


def test_f8_int_widening_across_order(spark, tmp_path):
    """F8: early small ints infer int32; a late 2^40 value widens the
    whole column to long (reference lib.pyx:248-255)."""
    register(spark)
    p = _write(
        tmp_path,
        "f8.jsonl",
        [{"_id": i, "value": i} for i in range(10)] + [{"_id": 10, "value": 2**40}],
    )
    df = spark.read.format("documents").load(p)
    assert dict(df.dtypes)["value"] == "bigint"
    assert df.filter(F.col("value") == 2**40).count() == 1


def test_f2_alltypes_write_roundtrip(spark, tmp_path):
    """F2-ish: one column per supported JSON-reachable type through the
    documents sink and back."""
    register(spark)
    df = spark.createDataFrame(
        [(1, 1.5, "s", True, None, [1, 2], {"x": 1})],
        "i long, f double, s string, b boolean, n string, arr array<int>, st struct<x:int>",
    )
    out = str(tmp_path / "rt")
    df.write.format("documents").mode("append").save(out)
    back = (
        spark.read.format("documents")
        .option(
            "declaredSchema",
            "i bigint, f double, s string, b boolean, n string, arr array<int>, st struct<x:int>",
        )
        .load(out)
    )
    r = back.first()
    assert (r["i"], r["f"], r["s"], r["b"], r["n"]) == (1, 1.5, "s", True, None)
    assert list(r["arr"]) == [1, 2] and r["st"]["x"] == 1
