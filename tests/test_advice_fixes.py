"""Regression tests for the round-1 advisor findings (ADVICE.md):
$regex+$options folding, $lookup sibling predicates, pushed-filter
coercion, binary-mode split seeks, $mergeObjects last-wins."""

import json

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.api import aggregate
from mongo_arrow_spark.errors import MQLTranslationError
from mongo_arrow_spark.mql import translate_expr
from mongo_arrow_spark.mql.match import translate_match
from mongo_arrow_spark.sources import register


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(
        [(1, "Alpha"), (2, "alpha"), (3, "ALPHA"), (4, "beta"), (5, None)],
        "id long, s string",
    )


# ---------------------------------------------------------- $regex+$options


def test_regex_options_case_insensitive(names):
    got = sorted(
        r["id"]
        for r in names.filter(
            translate_match({"s": {"$regex": "^al", "$options": "i"}})
        ).collect()
    )
    assert got == [1, 2, 3]  # without folding this returns [2] only


def test_regex_options_multiline_dotall(spark):
    df = spark.createDataFrame([(1, "a\nb"), (2, "axb")], "id long, s string")
    # without (?s), `.` does not match the newline in row 1
    plain = [
        r["id"]
        for r in df.filter(translate_match({"s": {"$regex": "a.b"}})).collect()
    ]
    assert plain == [2]
    got = [
        r["id"]
        for r in df.filter(
            translate_match({"s": {"$regex": "a.b", "$options": "s"}})
        ).collect()
    ]
    assert got == [1, 2]


def test_regex_unsupported_option_raises(names):
    with pytest.raises(MQLTranslationError):
        translate_match({"s": {"$regex": "a", "$options": "l"}})
    with pytest.raises(MQLTranslationError):
        translate_match({"s": {"$options": "i"}})  # $options without $regex


def test_regex_options_in_elem_match(spark):
    df = spark.createDataFrame(
        [(1, ["Foo", "bar"]), (2, ["baz"])], "id long, arr array<string>"
    )
    got = [
        r["id"]
        for r in df.filter(
            translate_match(
                {"arr": {"$elemMatch": {"$regex": "^foo", "$options": "i"}}}
            )
        ).collect()
    ]
    assert got == [1]


# ------------------------------------------------- $lookup sibling predicates


def test_lookup_let_match_sibling_predicates(spark):
    """A leading $match that carries BOTH the correlated $expr and plain
    predicates must apply the plain predicates to the foreign side (the
    round-1 fast path silently dropped them)."""
    orders = spark.createDataFrame(
        [(1, 10), (2, 20)], "o_id long, cust long"
    )
    items = spark.createDataFrame(
        [(10, "active", 1.0), (10, "dead", 2.0), (20, "active", 3.0)],
        "cust long, status string, amt double",
    )
    out = aggregate(
        orders,
        [
            {
                "$lookup": {
                    "from": "items",
                    "let": {"c": "$cust"},
                    "pipeline": [
                        {
                            "$match": {
                                "$expr": {"$eq": ["$cust", "$$c"]},
                                "status": "active",
                            }
                        }
                    ],
                    "as": "matched",
                }
            },
            {"$project": {"o_id": 1, "n": {"$size": "$matched"}}},
        ],
        collections={"items": items},
    )
    got = {r["o_id"]: r["n"] for r in out.collect()}
    assert got == {1: 1, 2: 1}  # dead row filtered out of order 1's array


# ------------------------------------------------ pushed filters on coercion


def test_pushed_filter_sees_coerced_values(spark, tmp_path):
    """EqualTo on a long column whose raw JSON value is 3.7: decode
    truncates to 3, so the pushed filter must match (round 1 compared the
    raw 3.7 and dropped the row)."""
    p = tmp_path / "d.jsonl"
    with open(p, "w") as fh:
        fh.write(json.dumps({"i": 3.7, "tag": "frac"}) + "\n")
        fh.write(json.dumps({"i": 3, "tag": "int"}) + "\n")
        fh.write(json.dumps({"i": 4, "tag": "other"}) + "\n")
    register(spark)
    df = (
        spark.read.format("documents")
        .schema("i long, tag string")
        .load(str(p))
        .filter(F.col("i") == 3)
    )
    assert sorted(r["tag"] for r in df.collect()) == ["frac", "int"]


def test_timestamp_filter_not_claimed(spark, tmp_path):
    """Timestamp predicates compare datetime-vs-raw-str if claimed; they
    must be yielded back to Spark and still evaluate correctly post-scan."""
    p = tmp_path / "t.jsonl"
    with open(p, "w") as fh:
        fh.write(json.dumps({"ts": "2024-01-01T00:00:00", "k": 1}) + "\n")
        fh.write(json.dumps({"ts": "2025-06-01T12:00:00", "k": 2}) + "\n")
    register(spark)
    df = (
        spark.read.format("documents")
        .schema("ts timestamp, k long")
        .load(str(p))
        .filter(F.col("ts") > F.lit("2024-06-01").cast("timestamp"))
    )
    assert [r["k"] for r in df.collect()] == [2]


# ----------------------------------------------------- binary-mode splitting


def test_partition_split_multibyte_utf8(spark, tmp_path):
    """Byte-range splits over JSONL whose payload is multi-byte UTF-8:
    a text-mode seek can land mid-character and crash; binary-mode seeks
    must read every doc exactly once."""
    p = tmp_path / "zh.jsonl"
    with open(p, "w", encoding="utf-8") as fh:
        for i in range(2000):
            fh.write(json.dumps({"i": i, "t": "中文字符" * 10}, ensure_ascii=False) + "\n")
    register(spark)
    df = (
        spark.read.format("documents")
        .option("partitionBytes", str(16 * 1024))
        .load(str(p))
    )
    assert df.count() == 2000
    assert df.agg(F.sum("i")).first()[0] == 2000 * 1999 // 2
    assert df.rdd.getNumPartitions() > 1


# -------------------------------------------------- $mergeObjects last-wins


def test_merge_objects_literal_docs(spark):
    df = spark.createDataFrame([(1,)], "id long")
    row = df.select(
        translate_expr(
            {"$mergeObjects": [{"a": 1, "b": 2}, {"b": 9, "c": 3}]}
        ).alias("m")
    ).first()["m"]
    assert row.asDict() == {"a": 1, "b": 9, "c": 3}


def test_merge_objects_map_columns_last_wins(spark):
    df = spark.createDataFrame(
        [({"a": 1, "b": 2}, {"b": 9, "c": 3})],
        "m1 map<string,int>, m2 map<string,int>",
    )
    got = df.select(
        translate_expr({"$mergeObjects": ["$m1", "$m2"]}).alias("m")
    ).first()["m"]
    assert got == {"a": 1, "b": 9, "c": 3}  # duplicate key: later wins


def test_merge_objects_null_input_is_empty_doc(spark):
    df = spark.createDataFrame(
        [({"a": 1}, None)], "m1 map<string,int>, m2 map<string,int>"
    )
    got = df.select(
        translate_expr({"$mergeObjects": ["$m1", "$m2"]}).alias("m")
    ).first()["m"]
    assert got == {"a": 1}
