"""flatten/nest round-trip tests (reference dotted-path model)."""

from pyspark.sql import functions as F

from mongo_arrow_spark.operators.documents_util import flatten, nest


def test_flatten_nest_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, {"b": 2.0, "c": {"d": "x"}}, [1, 2])],
        "a long, o struct<b:double,c:struct<d:string>>, arr array<int>",
    )
    flat = flatten(df)
    assert set(flat.columns) == {"a", "o.b", "o.c.d", "arr"}
    row = flat.first()
    assert row["o.b"] == 2.0 and row["o.c.d"] == "x"
    back = nest(flat)
    # simpleString ignores nullability flags (struct() reconstruction
    # marks fields non-nullable where the source allowed nulls)
    assert back.schema.simpleString() == df.schema.simpleString()
    assert back.first() == df.first()


def test_flatten_on_corpus_shape(spark, tables):
    # flatten is identity on already-flat tables
    flat = flatten(tables["orders"])
    assert flat.columns == tables["orders"].columns
    assert flat.count() == tables["orders"].count()
