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


# --------------------------------------------------- round-2 operator sweep


def test_inverse_and_hyperbolic_trig(spark):
    import math

    df = spark.range(1).select(F.lit(0.5).alias("x"))
    row = (
        df.select(
            *[
                translate_expr({op: "$x"}).alias(op[1:])
                for op in (
                    "$asin", "$acos", "$atan", "$sinh", "$cosh", "$tanh",
                    "$asinh", "$atanh",
                )
            ],
            translate_expr({"$acosh": {"$add": ["$x", 1]}}).alias("acosh"),
        )
        .head()
        .asDict()
    )
    assert row["asin"] == pytest.approx(math.asin(0.5))
    assert row["acos"] == pytest.approx(math.acos(0.5))
    assert row["atan"] == pytest.approx(math.atan(0.5))
    assert row["sinh"] == pytest.approx(math.sinh(0.5))
    assert row["cosh"] == pytest.approx(math.cosh(0.5))
    assert row["tanh"] == pytest.approx(math.tanh(0.5))
    assert row["asinh"] == pytest.approx(math.asinh(0.5))
    assert row["atanh"] == pytest.approx(math.atanh(0.5))
    assert row["acosh"] == pytest.approx(math.acosh(1.5))


def test_date_from_parts_and_to_parts(spark):
    import datetime as dt

    df = spark.range(1)
    row = df.select(
        translate_expr(
            {
                "$dateFromParts": {
                    "year": 2024, "month": 2, "day": 29,
                    "hour": 12, "minute": 30, "second": 5,
                    "millisecond": 250,
                }
            }
        ).alias("ts"),
    ).head()
    assert row["ts"] == dt.datetime(2024, 2, 29, 12, 30, 5, 250000)
    parts = df.select(
        translate_expr({"$dateToParts": {"date": F.lit(row["ts"])}}).alias("p")
    ).head()["p"]
    assert (parts["year"], parts["month"], parts["day"]) == (2024, 2, 29)
    assert (parts["hour"], parts["minute"], parts["second"]) == (12, 30, 5)
    assert parts["millisecond"] == 250


def test_date_from_parts_iso_week_form(spark):
    import datetime as dt

    df = spark.range(1)
    cases = [
        ({"isoWeekYear": 2021, "isoWeek": 1, "isoDayOfWeek": 1}, (2021, 1, 1)),
        ({"isoWeekYear": 2020, "isoWeek": 53, "isoDayOfWeek": 5}, (2020, 53, 5)),
        ({"isoWeekYear": 2024, "isoWeek": 20, "isoDayOfWeek": 7}, (2024, 20, 7)),
        ({"isoWeekYear": 2016}, (2016, 1, 1)),  # defaults: week 1, Monday
    ]
    for spec, iso in cases:
        got = df.select(
            translate_expr({"$dateFromParts": spec}).alias("ts")
        ).head()["ts"]
        assert got.date() == dt.date.fromisocalendar(*iso), spec
    # time parts compose with the ISO form
    got = df.select(
        translate_expr(
            {
                "$dateFromParts": {
                    "isoWeekYear": 2021, "isoWeek": 2, "isoDayOfWeek": 3,
                    "hour": 6, "minute": 15,
                }
            }
        ).alias("ts")
    ).head()["ts"]
    assert got == dt.datetime(2021, 1, 13, 6, 15)
    # out-of-range isoWeek carries into the next year (day arithmetic)
    got = df.select(
        translate_expr(
            {"$dateFromParts": {"isoWeekYear": 2021, "isoWeek": 60}}
        ).alias("ts")
    ).head()["ts"]
    assert got.date() == dt.date.fromisocalendar(2021, 52, 1) + dt.timedelta(weeks=8)


def test_week_sunday_start_vs_iso_week(spark):
    """MQL $week counts Sunday-start weeks with week 0 before the first
    Sunday (strftime %U); $isoWeek is ISO-8601. They differ exactly at
    year boundaries."""
    import datetime as dt

    cases = ["2024-01-01", "2024-01-07", "2024-01-08", "2021-01-02",
             "2021-01-03", "2020-12-31", "2023-12-31", "2026-08-13"]
    df = spark.createDataFrame([(c,) for c in cases], "d string").withColumn(
        "d", F.to_date("d")
    )
    rows = df.select(
        "d",
        translate_expr({"$week": "$d"}).alias("w"),
        translate_expr({"$isoWeek": "$d"}).alias("iw"),
    ).collect()
    for r in rows:
        want_u = int(r["d"].strftime("%U"))
        assert r["w"] == want_u, (r["d"], r["w"], want_u)
        assert r["iw"] == r["d"].isocalendar()[1]


def test_date_from_string_formats_and_onerror(spark):
    import datetime as dt

    df = spark.range(1)
    row = df.select(
        translate_expr(
            {"$dateFromString": {"dateString": F.lit("2023-07-04 10:20:30")}}
        ).alias("a"),
        translate_expr(
            {
                "$dateFromString": {
                    "dateString": F.lit("04/07/2023"),
                    "format": "%d/%m/%Y",
                }
            }
        ).alias("b"),
        translate_expr(
            {
                "$dateFromString": {
                    "dateString": F.lit("not a date"),
                    "onError": F.lit(dt.datetime(1970, 1, 1)),
                }
            }
        ).alias("c"),
    ).head()
    assert row["a"] == dt.datetime(2023, 7, 4, 10, 20, 30)
    assert row["b"] == dt.datetime(2023, 7, 4)
    assert row["c"] == dt.datetime(1970, 1, 1)


def test_iso_day_of_week_and_week_year(spark):
    import datetime as dt

    df = spark.range(1)
    row = df.select(
        translate_expr(
            {"$isoDayOfWeek": F.lit(dt.date(2024, 1, 1))}  # a Monday
        ).alias("mon"),
        translate_expr(
            {"$isoDayOfWeek": F.lit(dt.date(2024, 1, 7))}  # a Sunday
        ).alias("sun"),
        # 2021-01-01 (Friday) belongs to ISO week 53 of 2020
        translate_expr({"$isoWeekYear": F.lit(dt.date(2021, 1, 1))}).alias("wy"),
    ).head()
    assert row["mon"] == 1 and row["sun"] == 7
    assert row["wy"] == 2020


def test_regex_find_and_find_all(spark):
    df = spark.range(1).select(F.lit("a1 b22 c333").alias("s"))
    row = df.select(
        translate_expr(
            {"$regexFind": {"input": "$s", "regex": r"[a-z](\d+)"}}
        ).alias("first"),
        translate_expr(
            {"$regexFindAll": {"input": "$s", "regex": r"[a-z]\d+"}}
        ).alias("all"),
        translate_expr(
            {"$regexFind": {"input": "$s", "regex": r"zzz"}}
        ).alias("none"),
        translate_expr(
            {"$regexFind": {"input": "$s", "regex": r"B22", "options": "i"}}
        ).alias("ci"),
    ).head()
    assert row["first"] == "a1"
    assert row["all"] == ["a1", "b22", "c333"]
    assert row["none"] is None
    assert row["ci"] == "b22"


def test_first_last_max_min_n(spark):
    df = spark.range(1).select(
        F.array(F.lit(5), F.lit(1), F.lit(None), F.lit(3)).alias("a")
    )
    row = df.select(
        translate_expr({"$firstN": {"input": "$a", "n": 2}}).alias("f"),
        translate_expr({"$lastN": {"input": "$a", "n": 2}}).alias("l"),
        translate_expr({"$maxN": {"input": "$a", "n": 2}}).alias("mx"),
        translate_expr({"$minN": {"input": "$a", "n": 2}}).alias("mn"),
    ).head()
    assert row["f"] == [5, 1]
    assert row["l"] == [None, 3]
    assert row["mx"] == [5, 3]
    assert row["mn"] == [1, 3]


def test_set_and_unset_field(spark):
    df = spark.range(1).select(
        F.struct(F.lit(1).alias("a"), F.lit("x").alias("b")).alias("doc")
    )
    row = df.select(
        translate_expr(
            {"$setField": {"input": "$doc", "field": "a", "value": 99}}
        ).alias("set"),
        translate_expr(
            {"$unsetField": {"input": "$doc", "field": "b"}}
        ).alias("unset"),
    ).head()
    assert row["set"].asDict() == {"a": 99, "b": "x"}
    assert row["unset"].asDict() == {"a": 1}


def test_to_object_id_hex_roundtrip(spark):
    hex_id = "5f0b1c2d3e4f5a6b7c8d9e0f"
    df = spark.range(1).select(F.lit(hex_id).alias("h"))
    row = df.select(
        translate_expr({"$toObjectId": "$h"}).alias("oid"),
        F.hex(translate_expr({"$toObjectId": "$h"})).alias("back"),
    ).head()
    assert isinstance(row["oid"], (bytes, bytearray)) and len(row["oid"]) == 12
    assert row["back"].lower() == hex_id


def test_to_uuid_canonical_and_malformed(spark):
    uid = "867dee52-c331-484e-92d1-c56479b8e67e"
    df = spark.range(1).select(F.lit(uid).alias("u"))
    row = df.select(
        translate_expr({"$toUUID": "$u"}).alias("b"),
        F.hex(translate_expr({"$toUUID": "$u"})).alias("back"),
        translate_expr({"$toUUID": {"$literal": "not-a-uuid"}}).alias("bad"),
    ).head()
    assert isinstance(row["b"], (bytes, bytearray)) and len(row["b"]) == 16
    assert row["back"].lower() == uid.replace("-", "")
    assert row["bad"] is None


def test_function_python_callable(spark):
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    df = spark.createDataFrame([(1, 2.0), (3, 4.0)], ["x", "y"])
    out = aggregate(
        df,
        [
            {
                "$project": {
                    "combo": {
                        "$function": {
                            "body": lambda a, b: a * 10 + b,
                            "args": ["$x", "$y"],
                            "lang": "python",
                            "returnType": "double",
                        }
                    }
                }
            }
        ],
    )
    assert sorted(r["combo"] for r in out.collect()) == [12.0, 34.0]
    # vectorized form gets the Series directly
    out2 = aggregate(
        df,
        [
            {
                "$project": {
                    "v": {
                        "$function": {
                            "body": lambda s: s * 2,
                            "args": ["$x"],
                            "lang": "python",
                            "returnType": "bigint",
                            "vectorized": True,
                        }
                    }
                }
            }
        ],
    )
    assert sorted(r["v"] for r in out2.collect()) == [2, 6]
    with pytest.raises(MQLTranslationError):
        aggregate(df, [{"$project": {"z": {"$function": {"body": "js code", "args": []}}}}])


def test_bson_size(spark):
    from mongo_arrow_spark.bson_codec import encode_document

    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "xy"}), (2, {"a": 99, "b": "longer-string"})],
        "id long, doc struct<a:long, b:string>",
    )
    rows = df.select(
        "id", translate_expr({"$bsonSize": "$doc"}).alias("sz")
    ).collect()
    want = {
        1: len(encode_document({"a": 1, "b": "xy"})),
        2: len(encode_document({"a": 99, "b": "longer-string"})),
    }
    assert {r["id"]: r["sz"] for r in rows} == want


def test_ts_second_and_increment(spark, tmp_path):
    """BSON internal timestamps round-trip from a .bson dump into the
    struct<time,inc> carrier that $tsSecond/$tsIncrement read."""
    from mongo_arrow_spark.bson_codec import Timestamp, encode_document
    from mongo_arrow_spark.sources import register

    p = tmp_path / "oplog.bson"
    with open(p, "wb") as fh:
        fh.write(encode_document({"i": 1, "ts": Timestamp(1700000000, 7)}))
        fh.write(encode_document({"i": 2, "ts": Timestamp(1700000001, 1)}))
    register(spark)
    df = spark.read.format("documents").load(str(p))
    out = df.select(
        "i",
        translate_expr({"$tsSecond": "$ts"}).alias("s"),
        translate_expr({"$tsIncrement": "$ts"}).alias("inc"),
    ).orderBy("i")
    got = [(r["s"], r["inc"]) for r in out.collect()]
    assert got == [(1700000000, 7), (1700000001, 1)]


def test_bitwise_ops(spark):
    df = spark.createDataFrame(
        [(0b1100, 0b1010), (255, 15), (None, 3)], "a int, b int"
    )
    got = df.select(
        translate_expr({"$bitAnd": ["$a", "$b"]}).alias("and_"),
        translate_expr({"$bitOr": ["$a", "$b"]}).alias("or_"),
        translate_expr({"$bitXor": ["$a", "$b", 1]}).alias("xor_"),
        translate_expr({"$bitNot": "$a"}).alias("not_"),
    ).collect()
    assert [tuple(r) for r in got] == [
        (0b1000, 0b1110, 0b0111, ~0b1100),
        (15, 255, 241, ~255),
        (None, None, None, None),
    ]
    with pytest.raises(MQLTranslationError):
        translate_expr({"$bitNot": ["$a", "$b"]})


def test_index_of_cp_ranges(spark):
    df = spark.createDataFrame([("cafeteria",), ("vanilla",)], "s string")
    def ev(expr):
        return [r[0] for r in df.select(translate_expr(expr)).collect()]
    assert ev({"$indexOfCP": ["$s", "a"]}) == [1, 1]
    assert ev({"$indexOfCP": ["$s", "a", 5]}) == [8, 6]
    # occurrence must fit wholly inside [start, end)
    assert ev({"$indexOfCP": ["$s", "teria", 0, 8]}) == [-1, -1]
    assert ev({"$indexOfCP": ["$s", "teria", 0, 9]}) == [4, -1]
    assert ev({"$indexOfCP": ["$s", "zzz"]}) == [-1, -1]
    assert ev({"$indexOfCP": [None, "a"]}) == [None, None]


def test_index_of_bytes_multibyte(spark):
    # é is 2 bytes in UTF-8: byte indexes differ from code-point indexes
    df = spark.createDataFrame([("café-tea",)], "s string")
    def ev(expr):
        return [r[0] for r in df.select(translate_expr(expr)).collect()]
    assert ev({"$indexOfBytes": ["$s", "tea"]}) == [6]
    assert ev({"$indexOfCP": ["$s", "tea"]}) == [5]
    assert ev({"$indexOfBytes": ["$s", "é"]}) == [3]
    # byte-range start lands on the boundary after é (byte 5)
    assert ev({"$indexOfBytes": ["$s", "tea", 5]}) == [6]
    assert ev({"$indexOfBytes": ["$s", "tea", 7]}) == [-1]
    assert ev({"$indexOfBytes": ["$s", "tea", 0, 8]}) == [-1]
    assert ev({"$indexOfBytes": ["$s", "tea", 0, 9]}) == [6]


def test_array_std_dev_expressions(spark):
    df = spark.createDataFrame(
        [(1, [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]), (2, [3.0]), (3, [])],
        "id long, arr array<double>",
    )
    rows = df.orderBy("id").select(
        translate_expr({"$stdDevPop": "$arr"}).alias("p"),
        translate_expr({"$stdDevSamp": "$arr"}).alias("s"),
    ).collect()
    assert rows[0]["p"] == pytest.approx(2.0)
    assert rows[0]["s"] == pytest.approx(2.138089935299395)
    assert rows[1]["p"] == 0.0 and rows[1]["s"] is None
    assert rows[2]["p"] is None and rows[2]["s"] is None


def test_array_median_percentile_expressions(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [7.0, None, 5.0]), (3, [])],
        "id long, arr array<double>",
    )
    rows = df.orderBy("id").select(
        translate_expr({"$median": {"input": "$arr", "method": "approximate"}})
        .alias("m"),
        translate_expr(
            {"$percentile": {"input": "$arr", "p": [0.25, 0.5, 0.95],
                             "method": "approximate"}}
        ).alias("pct"),
    ).collect()
    # nearest rank: smallest value with >= p*n members <= it
    assert rows[0]["m"] == 2.0 and rows[0]["pct"] == [1.0, 2.0, 4.0]
    assert rows[1]["m"] == 5.0 and rows[1]["pct"] == [5.0, 5.0, 7.0]
    assert rows[2]["m"] is None and rows[2]["pct"] is None
    with pytest.raises(MQLTranslationError):
        translate_expr({"$percentile": {"input": "$arr", "p": [1.5],
                                        "method": "approximate"}})


def test_convert_on_null_vs_on_error_routing(spark):
    df = spark.createDataFrame([("12",), ("oops",), (None,)], "s string")
    out = df.select(
        translate_expr({"$convert": {"input": "$s", "to": "int",
                                     "onNull": -1}}).alias("a"),
        translate_expr({"$convert": {"input": "$s", "to": "int",
                                     "onError": -2, "onNull": -1}}).alias("b"),
    ).collect()
    # parse failure without onError stays null — it must NOT borrow onNull
    assert [r["a"] for r in out] == [12, None, -1]
    assert [r["b"] for r in out] == [12, -2, -1]


def test_date_trunc_bin_size(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 15, 10, 47, 23),)], "ts timestamp"
    )
    def ev(args):
        return df.select(translate_expr({"$dateTrunc": args})).first()[0]
    # fixed-width bins anchored at 2000-01-01
    assert ev({"date": "$ts", "unit": "minute", "binSize": 15}) == \
        dt.datetime(2024, 3, 15, 10, 45)
    assert ev({"date": "$ts", "unit": "hour", "binSize": 6}) == \
        dt.datetime(2024, 3, 15, 6, 0)
    assert ev({"date": "$ts", "unit": "day", "binSize": 10}) == \
        dt.datetime(2024, 3, 15, 0, 0)  # 8840 days since anchor, exact bin edge
    assert ev({"date": "$ts", "unit": "day", "binSize": 7}) == \
        dt.datetime(2024, 3, 9, 0, 0)  # 8840 = 7*1262 + 6
    # week: server default start is Sunday (2024-03-15 is a Friday)
    assert ev({"date": "$ts", "unit": "week"}) == dt.datetime(2024, 3, 10)
    assert ev({"date": "$ts", "unit": "week", "startOfWeek": "monday"}) == \
        dt.datetime(2024, 3, 11)
    assert ev({"date": "$ts", "unit": "week", "binSize": 2,
               "startOfWeek": "monday"}) == dt.datetime(2024, 3, 4)
    # month-counted bins
    assert ev({"date": "$ts", "unit": "quarter", "binSize": 1}) == \
        dt.datetime(2024, 1, 1)
    assert ev({"date": "$ts", "unit": "month", "binSize": 5}) == \
        dt.datetime(2024, 3, 1)  # 290 months since 2000-01, exact bin edge
    assert ev({"date": "$ts", "unit": "month", "binSize": 7}) == \
        dt.datetime(2023, 12, 1)  # 290 = 7*41 + 3 -> bin 287 -> 2023-12
    assert ev({"date": "$ts", "unit": "year", "binSize": 3}) == \
        dt.datetime(2024, 1, 1)  # 24 years -> bin 8
    # pre-anchor dates floor correctly (sign-safe modulus)
    early = spark.createDataFrame([(dt.datetime(1999, 12, 31, 23, 0),)],
                                  "ts timestamp")
    got = early.select(translate_expr(
        {"$dateTrunc": {"date": "$ts", "unit": "day", "binSize": 10}}
    )).first()[0]
    assert got == dt.datetime(1999, 12, 22)
    with pytest.raises(MQLTranslationError):
        translate_expr({"$dateTrunc": {"date": "$ts", "unit": "day",
                                       "binSize": 0}})


def test_array_elem_at_runtime_negative_index(spark):
    from mongo_arrow_spark.mql import apply_pipeline

    df = spark.createDataFrame([([10, 20, 30], -1), ([10, 20, 30], 1)],
                               "arr array<int>, i int")
    out = apply_pipeline(
        df, [{"$addFields": {"v": {"$arrayElemAt": ["$arr", "$i"]}}}]
    ).collect()
    assert [r["v"] for r in out] == [30, 20]


def test_to_bool_try_cast(spark):
    from mongo_arrow_spark.mql import apply_pipeline

    df = spark.createDataFrame(
        [(0, "true", "junk"), (2, "false", "1")], "n int, s string, t string"
    )
    out = apply_pipeline(
        df,
        [{"$addFields": {"bn": {"$toBool": "$n"}, "bs": {"$toBool": "$s"},
                         "bt": {"$toBool": "$t"}}}],
    ).collect()
    assert [r["bn"] for r in out] == [False, True]
    assert [r["bs"] for r in out] == [True, False]
    assert [r["bt"] for r in out] == [None, True]  # unparseable -> null, no ANSI crash


def test_convert_format_bindata_string(spark):
    """$convert format (8.0): binData ↔ string via base64/base64url/hex/
    utf8/uuid; malformed input yields null without onError and routes to
    onError when given."""
    from mongo_arrow_spark.mql import translate_expr

    df = spark.createDataFrame([(b"\xfb\xef\xbe", "hi!")], "b binary, s string")

    def one(expr):
        return df.select(translate_expr(expr).alias("x")).first()["x"]

    assert one({"$convert": {"input": "$b", "to": "string",
                             "format": "base64"}}) == "++++"
    assert one({"$convert": {"input": "$b", "to": "string",
                             "format": "base64url"}}) == "----"
    assert one({"$convert": {"input": "$b", "to": "string",
                             "format": "hex"}}) == "fbefbe"
    assert one({"$convert": {"input": "$s", "to": "binData",
                             "format": "utf8"}}) == bytearray(b"hi!")
    # round-trips
    rt = {"$convert": {"input": {"$convert": {"input": "$b", "to": "string",
                                              "format": "base64url"}},
                       "to": "binData", "format": "base64url"}}
    assert one(rt) == bytearray(b"\xfb\xef\xbe")
    u = "123e4567-e89b-12d3-a456-426614174000"
    rt_uuid = {"$convert": {"input": {"$literal": u}, "to": "binData",
                            "format": "uuid"}}
    assert one({"$convert": {"input": rt_uuid, "to": "string",
                             "format": "uuid"}}) == u
    # malformed hex: null by default, onError fallback when present
    assert one({"$convert": {"input": {"$literal": "zz"}, "to": "binData",
                             "format": "hex"}}) is None
    # onError value unifies with the binary branch type
    assert one({"$convert": {"input": {"$literal": "zz"}, "to": "binData",
                             "format": "hex",
                             "onError": {"$literal": "bad"}}}) == bytearray(b"bad")
    import pytest as _pytest

    from mongo_arrow_spark.errors import MQLTranslationError

    with _pytest.raises(MQLTranslationError, match="format"):
        translate_expr({"$convert": {"input": "$b", "to": "int",
                                     "format": "hex"}})
