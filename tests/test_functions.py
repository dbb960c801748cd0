"""BSON-type codec function tests."""

import datetime as dt

from pyspark.sql import functions as F

from mongo_arrow_spark import functions as bf


def test_objectid_roundtrip(spark):
    oid = "65a1b2c3d4e5f6a7b8c9d0e1"
    df = spark.createDataFrame([(oid,)], "h string")
    out = df.select(
        bf.objectid_hex(bf.objectid_from_hex(F.col("h"))).alias("rt"),
        bf.objectid_timestamp(bf.objectid_from_hex(F.col("h"))).alias("ts"),
    ).first()
    assert out["rt"] == oid
    assert out["ts"] == dt.datetime.utcfromtimestamp(0x65A1B2C3)


def test_objectid_generate_sorts(spark):
    df = spark.range(5).select(bf.objectid_generate("id").alias("oid"), "id")
    rows = df.orderBy("oid").collect()
    assert [r["id"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(len(r["oid"]) == 12 for r in rows)


def test_binary_subtype_carrier(spark):
    df = spark.createDataFrame([(b"payload",)], "b binary")
    tagged = df.select(bf.binary_with_subtype("b", 10).alias("t"))
    out = tagged.select(
        bf.binary_subtype("t").alias("st"), bf.binary_payload("t").alias("p")
    ).first()
    assert out["st"] == 10
    assert bytes(out["p"]) == b"payload"


def test_decimal128(spark):
    df = spark.createDataFrame([(1.5,)], "x double")
    out = df.select(bf.decimal128("x").alias("d"))
    assert out.schema["d"].dataType.simpleString() == "decimal(38,6)"
