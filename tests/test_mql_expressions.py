"""Expression-translator unit tests (model: reference test_builders/test_bson
layer — pure units, no cluster round-trips beyond one tiny df)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.errors import MQLTranslationError
from mongo_arrow_spark.mql import translate_expr


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "Alpha", [1, 2, 3], dt.datetime(2024, 3, 15, 10, 30)),
            (2, -4.5, "beta", [4], dt.datetime(2023, 12, 31, 23, 59)),
            (3, None, None, [], None),
        ],
        "id long, x double, s string, arr array<int>, ts timestamp",
    )


def eval1(df, expr, env=None):
    return [r[0] for r in df.select(translate_expr(expr, env)).collect()]


def test_field_ref_and_literals(df):
    assert eval1(df, "$id") == [1, 2, 3]
    assert eval1(df, 5) == [5, 5, 5]
    assert eval1(df, "plain") == ["plain", "plain", "plain"]


def test_arithmetic(df):
    assert eval1(df, {"$add": ["$id", 1]}) == [2, 3, 4]
    assert eval1(df, {"$multiply": ["$id", "$id", 2]}) == [2, 8, 18]
    assert eval1(df, {"$subtract": ["$id", 1]}) == [0, 1, 2]
    assert eval1(df, {"$mod": ["$id", 2]}) == [1, 0, 1]
    assert eval1(df, {"$abs": "$x"}) == [10.0, 4.5, None]
    assert eval1(df, {"$round": ["$x", 0]}) == [10.0, -4.0, None]
    assert eval1(df, {"$trunc": "$x"}) == [10.0, -4.0, None]
    assert eval1(df, {"$pow": ["$id", 2]}) == [1.0, 4.0, 9.0]


def test_comparison_logical(df):
    assert eval1(df, {"$gt": ["$id", 1]}) == [False, True, True]
    assert eval1(df, {"$and": [{"$gt": ["$id", 1]}, {"$lt": ["$id", 3]}]}) == [
        False,
        True,
        False,
    ]
    assert eval1(df, {"$cmp": ["$id", 2]}) == [-1, 0, 1]


def test_cond_switch(df):
    assert eval1(df, {"$cond": [{"$gte": ["$id", 2]}, "big", "small"]}) == [
        "small",
        "big",
        "big",
    ]
    assert eval1(df, {"$ifNull": ["$x", 0.0]}) == [10.0, -4.5, 0.0]
    sw = {
        "$switch": {
            "branches": [
                {"case": {"$eq": ["$id", 1]}, "then": "one"},
                {"case": {"$eq": ["$id", 2]}, "then": "two"},
            ],
            "default": "many",
        }
    }
    assert eval1(df, sw) == ["one", "two", "many"]


def test_strings(df):
    assert eval1(df, {"$toUpper": "$s"}) == ["ALPHA", "BETA", None]
    assert eval1(df, {"$strLenCP": "$s"}) == [5, 4, None]
    assert eval1(df, {"$substrCP": ["$s", 1, 3]}) == ["lph", "eta", None]
    assert eval1(df, {"$concat": ["$s", "!"]}) == ["Alpha!", "beta!", None]
    assert eval1(
        df, {"$regexMatch": {"input": "$s", "regex": "^a", "options": "i"}}
    ) == [True, False, None]
    assert eval1(
        df, {"$replaceOne": {"input": "$s", "find": "a", "replacement": "_"}}
    ) == ["Alph_", "bet_", None]
    assert eval1(
        df, {"$replaceAll": {"input": "$s", "find": "a", "replacement": "_"}}
    ) == ["Alph_", "bet_", None]


def test_dates(df):
    assert eval1(df, {"$year": "$ts"}) == [2024, 2023, None]
    assert eval1(df, {"$month": "$ts"}) == [3, 12, None]
    assert eval1(df, {"$hour": "$ts"}) == [10, 23, None]
    assert eval1(
        df, {"$dateToString": {"date": "$ts", "format": "%Y-%m-%d"}}
    ) == ["2024-03-15", "2023-12-31", None]
    assert eval1(df, {"$dateTrunc": {"date": "$ts", "unit": "day"}}) == [
        dt.datetime(2024, 3, 15),
        dt.datetime(2023, 12, 31),
        None,
    ]
    assert eval1(
        df, {"$dateAdd": {"startDate": "$ts", "unit": "day", "amount": 1}}
    ) == [dt.datetime(2024, 3, 16, 10, 30), dt.datetime(2024, 1, 1, 23, 59), None]
    assert eval1(
        df,
        {
            "$dateDiff": {
                "startDate": {"$literal": dt.datetime(2024, 3, 14)},
                "endDate": "$ts",
                "unit": "day",
            }
        },
    )[0] == 1


def test_arrays(df):
    assert eval1(df, {"$size": "$arr"}) == [3, 1, 0]
    assert eval1(df, {"$arrayElemAt": ["$arr", 0]}) == [1, 4, None]
    assert eval1(df, {"$arrayElemAt": ["$arr", -1]}) == [3, 4, None]
    assert eval1(df, {"$concatArrays": ["$arr", [99]]}) == [
        [1, 2, 3, 99],
        [4, 99],
        [99],
    ]
    assert eval1(df, {"$in": [2, "$arr"]}) == [True, False, False]
    assert eval1(df, {"$reverseArray": "$arr"}) == [[3, 2, 1], [4], []]
    assert eval1(df, {"$slice": ["$arr", 2]}) == [[1, 2], [4], []]
    assert eval1(
        df,
        {
            "$filter": {
                "input": "$arr",
                "as": "v",
                "cond": {"$gt": ["$$v", 1]},
            }
        },
    ) == [[2, 3], [4], []]
    assert eval1(
        df, {"$map": {"input": "$arr", "as": "v", "in": {"$multiply": ["$$v", 10]}}}
    ) == [[10, 20, 30], [40], []]
    assert eval1(
        df,
        {
            "$reduce": {
                "input": "$arr",
                "initialValue": 0,
                "in": {"$add": ["$$value", "$$this"]},
            }
        },
    ) == [6, 4, 0]
    assert eval1(df, {"$sum": "$arr"}) == [6.0, 4.0, 0.0]
    assert eval1(df, {"$max": "$arr"}) == [3, 4, None]


def test_type_conversion(df):
    assert eval1(df, {"$toString": "$id"}) == ["1", "2", "3"]
    assert eval1(df, {"$toInt": "$x"}) == [10, -4, None]
    assert eval1(
        df, {"$convert": {"input": "$s", "to": "int", "onError": -1}}
    ) == [-1, -1, None]


def test_let(df):
    expr = {
        "$let": {
            "vars": {"двa": 2},
            "in": {"$multiply": ["$id", "$$двa"]},
        }
    }
    assert eval1(df, expr) == [2, 4, 6]


def test_unknown_op_raises(df):
    with pytest.raises(MQLTranslationError):
        translate_expr({"$frobnicate": 1})


def test_struct_literal(df):
    rows = df.select(
        translate_expr({"a": "$id", "b": {"$multiply": ["$id", 2]}}).alias("o")
    ).collect()
    assert rows[0]["o"]["a"] == 1 and rows[0]["o"]["b"] == 2
